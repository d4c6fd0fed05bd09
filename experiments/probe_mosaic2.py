#!/usr/bin/env python
"""Round 2 probes: the pair kernel's constructs inside loops/conds."""
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")


def run(name, kernel, scratch=()):
    try:
        r = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
            scratch_shapes=list(scratch),
        )(jnp.arange(128 * 16, dtype=jnp.float32).reshape(16, 128) / 7.0)
        jax.block_until_ready(r)
        print(f"{name}: OK  {float(jnp.asarray(r).ravel()[0]):.3f}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}")


def _sel():
    return (jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) % 8
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // 16
            ).astype(jnp.float32)


def k_dot_in_loop(x_ref, o_ref):
    sel = _sel()

    def body(i, acc):
        row = x_ref[0:1, :] + acc[0:1, :]
        lhs = jnp.broadcast_to(row, (16, 128))
        return acc + jax.lax.dot_general(
            lhs, sel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) * 1e-6
    o_ref[:] = jax.lax.fori_loop(0, 50, body, jnp.zeros((16, 128)))


def k_dynroll_in_loop(x_ref, o_ref):
    def body(i, acc):
        s = (i % 8) + 1
        return acc + jax.lax.bitcast_convert_type(
            pltpu.roll(jax.lax.bitcast_convert_type(x_ref[:], jnp.int32),
                       s, axis=1), jnp.float32) * 0.0
    o_ref[:] = jax.lax.fori_loop(0, 50, body, jnp.zeros((16, 128)))


def k_dynstore_in_while(x_ref, o_ref, scr, sm):
    def cond(c):
        return c[0] > 0

    def body(c):
        sp, acc = c
        row = scr[pl.ds(sp - 1, 1), :]
        sm[sp - 1] = sm[sp - 1] - 1
        rem = sm[sp - 1]
        scr[pl.ds(sp - 1, 1), :] = row + 1.0
        sp2 = jnp.where(rem > 0, sp, sp - 1)
        return (sp2, acc + jnp.broadcast_to(row, (16, 128)))

    scr[0:1, :] = x_ref[0:1, :]
    scr[1:2, :] = x_ref[1:2, :]
    sm[0] = jnp.int32(2)
    sm[1] = jnp.int32(3)
    _, out = jax.lax.while_loop(cond, body,
                                (jnp.int32(2),
                                 jnp.zeros((16, 128), jnp.float32)))
    o_ref[:] = out


def k_stack_machine(x_ref, o_ref, kst, nst, sm):
    """Mini pop/push machine: conds with ref writes inside, dynamic
    stores, dyn roll code extraction — the pair kernel's skeleton."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    INFV = jnp.float32(3.4e38)
    kst[0:1, :] = jnp.where(iota == 0, 0.0, INFV)
    nst[0:1, :] = jax.lax.bitcast_convert_type(
        jnp.where(iota == 120, jnp.int32(1), 0), jnp.float32)
    sm[0] = jnp.int32(1)

    def cond(c):
        return (c[0] > 0) & (c[1] < 64)

    def body(c):
        sp, it, acc = c
        kr = kst[pl.ds(sp - 1, 1), :]
        nr = nst[pl.ds(sp - 1, 1), :]
        minv = jnp.min(kr, axis=1, keepdims=True)
        lane = jnp.min(jnp.where(kr <= minv, iota, 128))
        cslot = lane // 16
        nri = jax.lax.bitcast_convert_type(nr, jnp.int32)
        code = pltpu.roll(nri, 8 - cslot, axis=1)[0, 0]
        rem = sm[sp - 1] - 1
        kst[pl.ds(sp - 1, 1), :] = jnp.where(iota == lane, INFV, kr)
        sm[sp - 1] = rem
        sp = jnp.where(rem > 0, sp, sp - 1)

        def do_push(acc, sp=sp, code=code):
            krow = jnp.where((iota % 16 == 0) & (iota < 32 * code),
                             x_ref[0:1, :1] * 0.0 + iota.astype(
                                 jnp.float32), INFV)
            nhit = jnp.sum((krow < INFV).astype(jnp.int32))
            push = (nhit > 0) & (code < 3)
            idx = jnp.where(push, sp, 7)
            kst[pl.ds(idx, 1), :] = krow
            nst[pl.ds(idx, 1), :] = jax.lax.bitcast_convert_type(
                jnp.where(iota == 120, code + 1,
                          jnp.where(iota == 121, -(code + 1), 0)),
                jnp.float32)
            sm[idx] = nhit
            return (acc + 1.0, jnp.where(push, sp + 1, sp))

        def do_leaf(acc, sp=sp, code=code):
            def lc(s):
                return jnp.logical_not(s[0]) & (s[2] < 4)

            def lb(s):
                _, cc, k, a = s
                return (cc <= -2, cc - 1, k + 1, a + 2.0)

            _, _, _, acc2 = jax.lax.while_loop(
                lc, lb, (jnp.bool_(False), code, 0, acc))
            return (acc2, sp)

        acc, sp = jax.lax.cond(code > 0, do_push, do_leaf, acc)
        return (sp, it + 1, acc)

    _, _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(1), jnp.int32(0),
                     jnp.zeros((16, 128), jnp.float32)))
    o_ref[:] = acc


def main():
    run("dot_in_loop", k_dot_in_loop)
    run("dynroll_in_loop", k_dynroll_in_loop)
    run("dynstore_in_while", k_dynstore_in_while,
        [pltpu.VMEM((8, 128), jnp.float32), pltpu.SMEM((8,), jnp.int32)])
    run("stack_machine", k_stack_machine,
        [pltpu.VMEM((8, 128), jnp.float32),
         pltpu.VMEM((8, 128), jnp.float32),
         pltpu.SMEM((8,), jnp.int32)])


if __name__ == "__main__":
    main()


def k_dynstore8_in_while(x_ref, o_ref, scr, sm):
    """Same machine but with (8,128)-tile-aligned dynamic stores."""
    def cond(c):
        return c[0] > 0

    def body(c):
        sp, acc = c
        ent = scr[pl.ds((sp - 1) * 8, 8), :]
        sm[sp - 1] = sm[sp - 1] - 1
        rem = sm[sp - 1]
        scr[pl.ds((sp - 1) * 8, 8), :] = ent + 1.0
        sp2 = jnp.where(rem > 0, sp, sp - 1)
        return (sp2, acc + jnp.broadcast_to(ent[0:1], (16, 128)))

    scr[0:8, :] = jnp.broadcast_to(x_ref[0:1, :], (8, 128))
    scr[8:16, :] = jnp.broadcast_to(x_ref[1:2, :], (8, 128))
    sm[0] = jnp.int32(2)
    sm[1] = jnp.int32(3)
    _, out = jax.lax.while_loop(cond, body,
                                (jnp.int32(2),
                                 jnp.zeros((16, 128), jnp.float32)))
    o_ref[:] = out


def main2():
    run("dynstore8_in_while", k_dynstore8_in_while,
        [pltpu.VMEM((64, 128), jnp.float32), pltpu.SMEM((8,), jnp.int32)])


if __name__ == "__main__":
    main2()
