#!/usr/bin/env python
"""Feature probes for the pair kernel's Mosaic constructs (device-only
faults don't reproduce in interpret mode)."""
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def run(name, kernel, out_shape, scratch=()):
    try:
        r = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            scratch_shapes=list(scratch),
        )(jnp.arange(128 * 16, dtype=jnp.float32).reshape(16, 128) / 7.0)
        jax.block_until_ready(r)
        print(f"{name}: OK  {float(jnp.asarray(r).ravel()[0]):.3f}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}")


f32 = jnp.float32
O = jax.ShapeDtypeStruct((16, 128), jnp.float32)


def k_dot(x_ref, o_ref):
    row = x_ref[0:1, :]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) % 8
           == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // 16
           ).astype(jnp.float32)
    mask = (jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1) // 8
            == jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0)
            ).astype(jnp.float32)
    lhs = jnp.where(mask > 0.5, jnp.broadcast_to(row, (16, 128)), 0.0)
    o_ref[:] = jax.lax.dot_general(
        lhs, sel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def k_dynroll(x_ref, o_ref):
    i = jax.lax.bitcast_convert_type(x_ref[:], jnp.int32)
    s = (i[0, 0] % 8) + 1   # dynamic shift 1..8
    o_ref[:] = jax.lax.bitcast_convert_type(
        pltpu.roll(i, s, axis=1), jnp.float32)


def k_dynstore(x_ref, o_ref, scr):
    idx = jax.lax.bitcast_convert_type(x_ref[:], jnp.int32)[0, 1] % 8
    scr[pl.ds(idx, 1), :] = x_ref[0:1, :] * 2.0
    o_ref[:] = jnp.broadcast_to(scr[pl.ds(idx, 1), :], (16, 128))


def k_dynstore_odd(x_ref, o_ref, scr):
    # scratch with a sublane count that's not a multiple of 8
    idx = jax.lax.bitcast_convert_type(x_ref[:], jnp.int32)[0, 1] % 34
    scr[pl.ds(idx, 1), :] = x_ref[0:1, :] * 2.0
    o_ref[:] = jnp.broadcast_to(scr[pl.ds(idx, 1), :], (16, 128))


def k_smem_dyn(x_ref, o_ref, sm):
    idx = jax.lax.bitcast_convert_type(x_ref[:], jnp.int32)[0, 1] % 34
    sm[idx] = jnp.int32(7)
    o_ref[:] = x_ref[:] + sm[idx].astype(jnp.float32)


def k_nested(x_ref, o_ref):
    def body(c):
        i, acc = c

        def inner(_):
            def wcond(s):
                return s[0] < 3

            def wbody(s):
                return (s[0] + 1, s[1] + x_ref[:])

            return jax.lax.while_loop(wcond, wbody, (0, acc))[1]

        def other(_):
            return acc + 1.0

        acc = jax.lax.cond(i % 2 == 0, inner, other, None)
        return (i + 1, acc)

    def cond(c):
        return c[0] < 4

    o_ref[:] = jax.lax.while_loop(cond, body,
                                  (0, jnp.zeros((16, 128), f32)))[1]


def k_argmin_lane(x_ref, o_ref):
    kr = x_ref[0:1, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    minv = jnp.min(kr, axis=1, keepdims=True)
    lane = jnp.min(jnp.where(kr <= minv, iota, 128))
    o_ref[:] = jnp.full((16, 128), lane.astype(jnp.float32))


def main():
    run("dot_broadcast", k_dot, O)
    run("dyn_roll", k_dynroll, O)
    run("dyn_store8", k_dynstore, O,
        [pltpu.VMEM((8, 128), jnp.float32)])
    run("dyn_store34", k_dynstore_odd, O,
        [pltpu.VMEM((34, 128), jnp.float32)])
    run("smem_dyn34", k_smem_dyn, O, [pltpu.SMEM((34,), jnp.int32)])
    run("nested_while_in_cond", k_nested, O)
    run("argmin_lane", k_argmin_lane, O)


if __name__ == "__main__":
    main()
