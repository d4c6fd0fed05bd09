"""Probe Mosaic tpu.dynamic_gather support + throughput (round 3).

jax 0.9.0 lowers jnp.take_along_axis on 2D arrays inside Pallas kernels to
tpu.dynamic_gather (lowering.py:2464-2524) for BOTH axes, with
table/idx/out all the same shape. If the lane-gather (axis=1) is fast,
a per-ray-independent traversal kernel becomes possible: each ray fetches
its own node's fields from 128-node "pages" via lane gathers.

Probes:
  P1  axis=1 (lane gather) correctness at (8,128), (16,128), (32,128)
  P2  axis=0 (sublane gather) correctness at (8,128), (64,128), (512,128)
  P3  throughput: K dependent lane-gathers in a fori_loop (ns/gather)
  P4  page-select loop: gather a field from P pages with select chains
      (the >128-entry table pattern), ns/iteration for P in 1..8
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def run(kern, out_shape, *args, scratch=()):
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=list(scratch),
    )(*args)


def probe_correct():
    for shape, axis in [((8, 128), 1), ((16, 128), 1), ((32, 128), 1),
                        ((8, 128), 0), ((64, 128), 0), ((512, 128), 0)]:
        tbl = np.arange(shape[0] * shape[1], dtype=np.float32).reshape(shape)
        rng = np.random.RandomState(0)
        idx = rng.randint(0, shape[axis], shape).astype(np.int32)

        def kern(t_ref, i_ref, o_ref, axis=axis):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=axis)

        try:
            out = run(kern, jax.ShapeDtypeStruct(shape, jnp.float32),
                      jnp.asarray(tbl), jnp.asarray(idx))
            ref = np.take_along_axis(tbl, idx, axis=axis)
            ok = np.array_equal(np.asarray(out), ref)
            print(f"  take_along_axis axis={axis} {shape}: "
                  f"{'OK' if ok else 'WRONG VALUES'}")
        except Exception as e:
            msg = str(e).split("\n")[0][:100]
            print(f"  take_along_axis axis={axis} {shape}: FAIL {msg}")


def probe_i32():
    shape = (8, 128)
    tbl = np.arange(1024, dtype=np.int32).reshape(shape)
    idx = np.random.RandomState(1).randint(0, 128, shape).astype(np.int32)

    def kern(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    try:
        out = run(kern, jax.ShapeDtypeStruct(shape, jnp.int32),
                  jnp.asarray(tbl), jnp.asarray(idx))
        ok = np.array_equal(np.asarray(out),
                            np.take_along_axis(tbl, idx, axis=1))
        print(f"  i32 lane gather (8,128): {'OK' if ok else 'WRONG'}")
    except Exception as e:
        print(f"  i32 lane gather: FAIL {str(e).splitlines()[0][:100]}")


def bench(fn, *args, iters=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def probe_throughput():
    # K dependent lane-gathers: out feeds the next index
    K = 2048
    shape = (8, 128)

    def kern(t_ref, i_ref, o_ref):
        tbl = t_ref[:]

        def body(_, idx):
            v = jnp.take_along_axis(tbl, idx, axis=1)
            return (v + 1) & 127

        o_ref[:] = jax.lax.fori_loop(0, K, body, i_ref[:])

    tbl = jnp.asarray(np.random.RandomState(0).randint(0, 128, shape),
                      jnp.int32)
    idx = jnp.zeros(shape, jnp.int32)
    f = jax.jit(lambda t, i: run(kern, jax.ShapeDtypeStruct(shape,
                                                            jnp.int32),
                                 t, i))
    dt = bench(f, tbl, idx)
    print(f"  dependent lane-gather chain: {dt / K * 1e9:.1f} ns/gather")

    # independent: gather 56 fields from the same index per iteration
    F = 56

    def kern2(t_ref, i_ref, o_ref):
        def body(_, carry):
            idx = carry
            acc = jnp.zeros(shape, jnp.float32)
            for f_ in range(F):
                acc = acc + jnp.take_along_axis(t_ref[f_], idx, axis=1)
            return ((idx + acc.astype(jnp.int32)) & 127)

        o_ref[:] = jax.lax.fori_loop(0, 256, body, i_ref[:])

    tblf = jnp.asarray(np.random.RandomState(0).rand(F, 8, 128),
                       jnp.float32)
    f2 = jax.jit(lambda t, i: run(kern2,
                                  jax.ShapeDtypeStruct(shape, jnp.int32),
                                  t, i))
    dt = bench(f2, tblf, idx)
    print(f"  56-field gather block: {dt / 256 * 1e9:.0f} ns/iter "
          f"({dt / 256 / F * 1e9:.2f} ns/field-gather, 1024 rays)")


def probe_pages():
    # page-select: value = select over P pages of lane-gathers
    for P in (1, 2, 4, 8):
        shape = (8, 128)
        F = 28  # packed-field count

        def kern(t_ref, i_ref, o_ref, P=P):
            def body(_, carry):
                idx = carry
                lo = idx & 127
                hi = idx >> 7
                acc = jnp.zeros(shape, jnp.float32)
                for f_ in range(F):
                    v = jnp.zeros(shape, jnp.float32)
                    for p in range(P):
                        g = jnp.take_along_axis(t_ref[f_, p], lo, axis=1)
                        v = jnp.where(hi == p, g, v)
                    acc = acc + v
                return ((idx + acc.astype(jnp.int32)) & (P * 128 - 1))

            o_ref[:] = jax.lax.fori_loop(0, 256, body, i_ref[:])

        tblf = jnp.asarray(np.random.RandomState(0).rand(F, P, 8, 128),
                           jnp.float32)
        idx = jnp.zeros(shape, jnp.int32)
        f = jax.jit(lambda t, i, k=kern: run(
            k, jax.ShapeDtypeStruct(shape, jnp.int32), t, i))
        dt = bench(f, tblf, idx)
        print(f"  P={P} pages x {F} fields: {dt / 256 * 1e9:.0f} ns/iter "
              f"(1024 rays)")


if __name__ == "__main__":
    print("== correctness")
    probe_correct()
    probe_i32()
    if jax.default_backend() == "tpu":
        print("== throughput")
        probe_throughput()
        print("== page loops")
        probe_pages()
