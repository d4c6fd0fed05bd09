#!/usr/bin/env python
"""Map the row-gather cliff and test cliff-avoiding Tri-table layouts.

Round-3 study: row gathers run at ~2.5 ns/row while the table stays under
~28K rows AND ~11 MB, else 10.4-13.6 ns/row — and hall's 43K-row Tri8
table pays the slow rate on EVERY dual-queue leaf iteration (the single
biggest ao/bounces line item). gather_rows' 2-shard select won 2.16x in
isolation but measured 20% SLOWER composed into the tiled loop (the
(B, C) select materializes intermediates that break XLA's
gather->transpose fusion). This probe measures, on-device:

  1. the cliff surface: plain-gather ns/row over (rows, cols) grids
     holding bytes constant (is the cliff row-driven or byte-driven?);
  2. shard-select variants: (B, C)-select (core.tiles.gather_rows) vs
     per-shard transpose-then-(C, R, 128)-select (fusion-preserving?);
  3. the same variants COMPOSED into the real tiled dual-queue loop on
     hall ao/bounces (the number that actually matters).

Usage: python experiments/probe_tri_gather.py [--part cliff|shard|loop]
"""
import sys
sys.path.insert(0, "/root/repo")
import argparse
import time

import numpy as np


def timed(fn, *args, iters=20, inner=1):
    """Median of 3 blocks; fn must return an array; forces a tiny host
    fetch (block_until_ready returns early on some remote programs)."""
    import jax
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    ts = []
    for _b in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return ts[1] / inner


def part_cliff():
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(0)
    print(f"{'rows':>8} {'cols':>5} {'MB':>7} {'ns/row':>7}")
    # hold bytes near 19.3 MB (hall Tri8) and near 9.7 MB (half) while
    # varying rows; plus the known-fast anchor (24000, 112)
    for rows, cols in [(43256, 112), (21628, 112), (21628, 224),
                       (10814, 448), (10814, 224), (24000, 112),
                       (28000, 112), (32768, 112), (16384, 112),
                       (5407, 448), (43256, 56), (86512, 56),
                       (131072, 112), (262144, 112), (1048576, 16)]:
        # scale the batch so the 8 unrolled (B, cols) gather temps stay
        # under ~2 GB total (the 448-col configs OOM'd at B=1M: XLA keeps
        # all 8 remat'd gather outputs live)
        B = min(1 << 20, (1 << 26) // cols)
        tbl = jax.random.normal(key, (rows, cols), jnp.float32)
        idx = jax.random.randint(key, (B,), 0, rows, jnp.int32)

        # K-repeat chain inside one jit: single-op timings are buried by
        # the ~30 ms tunnel fetch (ROADMAP round-3 measurement note)
        @jax.jit
        def run(t, ix):
            acc = jnp.zeros((B,), jnp.float32)
            for k in range(8):
                rows_ = t[(ix + k) % t.shape[0]]
                acc = acc + rows_[:, 0] + rows_[:, -1]
            return acc

        dt = timed(run, tbl, idx, iters=5, inner=8)
        print(f"{rows:>8} {cols:>5} {rows*cols*4/1e6:>7.1f} "
              f"{dt/B*1e9:>7.2f}")


def _gather_shard_rows(table, idx_flat, nsh):
    """core.tiles.gather_rows with a forced shard count ((B, C) select)."""
    import jax.numpy as jnp
    n = table.shape[0]
    s = -(-n // nsh)
    out = None
    for i in range(nsh):
        loc = jnp.clip(idx_flat - i * s, 0, min(s, n - i * s) - 1)
        g = table[i * s:min((i + 1) * s, n)][loc]
        out = g if out is None else jnp.where(
            (idx_flat >= i * s)[:, None], g, out)
    return out


def _gather_shard_cmaj(table, idx, nsh):
    """Per-shard gather + transpose to (C, R, 128), THEN select — each
    shard keeps its own gather->transpose fusion; the select runs on
    component-major full-tile arrays."""
    import jax.numpy as jnp
    r = idx.shape[0]
    n, c = table.shape
    s = -(-n // nsh)
    idx_flat = idx.reshape(r * 128)
    out = None
    for i in range(nsh):
        loc = jnp.clip(idx_flat - i * s, 0, min(s, n - i * s) - 1)
        g = table[i * s:min((i + 1) * s, n)][loc]
        comp = g.T.reshape(c, r, 128)
        if out is None:
            out = comp
        else:
            m = (idx >= i * s)[None]
            out = jnp.where(m, comp, out)
    return out


def part_shard():
    import jax
    import jax.numpy as jnp
    B = 1 << 20
    R = B // 128
    key = jax.random.PRNGKey(0)
    rows, cols = 43256, 112
    tbl = jax.random.normal(key, (rows, cols), jnp.float32)
    idx2 = jax.random.randint(key, (R, 128), 0, rows, jnp.int32)

    def plain(t, ix):
        g = t[ix.reshape(R * 128)]
        return g.T.reshape(cols, R, 128)

    def srows(t, ix, nsh=2):
        g = _gather_shard_rows(t, ix.reshape(R * 128), nsh)
        return g.T.reshape(cols, R, 128)

    def scmaj(t, ix, nsh=2):
        return _gather_shard_cmaj(t, ix, nsh)

    for name, fn in [("plain", plain), ("shard2-rows", srows),
                     ("shard2-cmaj", scmaj),
                     ("shard3-rows", lambda t, ix: srows(t, ix, 3)),
                     ("shard3-cmaj", lambda t, ix: scmaj(t, ix, 3))]:
        @jax.jit
        def run(t, ix, f=fn):
            acc = jnp.zeros((R, 128), jnp.float32)
            for k in range(8):
                comp = f(t, (ix + k) % rows)
                acc = acc + comp[0] + comp[-1]
            return acc

        dt = timed(run, tbl, idx2, iters=5, inner=8)
        print(f"{name:>12} {dt/B*1e9:>7.2f} ns/row")


def part_loop():
    """The composed number: tiled dual-queue on hall ao/bounces with the
    leaf gather swapped between plain / shard-rows / shard-cmaj."""
    import jax
    import jax.numpy as jnp
    from rodent_tpu.accel import build_bvh
    from rodent_tpu.traversal.api import bvh_to_device, make_rays
    from rodent_tpu.traversal import tiled
    from rodent_tpu.traversal import pallas_packet as pp
    from rodent_tpu.traversal.sorting import sort_rays
    from rodent_tpu.utils.testscenes import (hall_primary_rays, make_hall,
                                             secondary_rays_from_trace)

    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    dev = bvh_to_device(bvh)
    print(f"nodes={bvh.num_nodes} packets={bvh.num_packets} "
          f"tri_mb={bvh.num_packets*112*4/1e6:.1f}")

    side = 1024
    org, dirs = hall_primary_rays(side, side)
    n = len(org)
    prim = make_rays(jnp.asarray(org), jnp.asarray(dirs),
                     jnp.zeros(n, jnp.float32),
                     jnp.full(n, 3.402823466e38, jnp.float32))
    hit_un = pp.traverse_packet(dev, prim)
    t = np.asarray(hit_un["t"])
    pid = np.asarray(hit_un["prim_id"])

    for kind in ("ao", "bounces"):
        any_hit = kind == "ao"
        o2, d2, tmin2, tmax2 = secondary_rays_from_trace(
            kind, org, dirs, t, pid, verts, idx.reshape(-1, 4))
        rays2 = make_rays(jnp.asarray(o2), jnp.asarray(d2),
                          jnp.asarray(tmin2), jnp.asarray(tmax2))
        rays2, _ = sort_rays(rays2, verts.min(0), verts.max(0))
        for mode in ("plain", "shard-rows", "shard-cmaj"):
            tiled._LEAF_GATHER = mode  # probe hook (see tiled.gather_cols)
            try:
                fn = jax.jit(lambda r, ah=any_hit: tiled.traverse_tiled(
                    dev, r, any_hit=ah, compact_stages=5))
                out = fn(rays2)
                _ = np.asarray(out["t"][:8])
                ts = []
                for _b in range(3):
                    t0 = time.perf_counter()
                    for _ in range(2):
                        out = fn(rays2)
                    _ = np.asarray(out["t"][:8])
                    ts.append(n * 2 / (time.perf_counter() - t0) / 1e6)
                ts.sort()
                print(f"{kind:>8} {mode:>11} {ts[1]:>7.2f} Mrays/s "
                      f"(min {ts[0]:.2f} max {ts[-1]:.2f})")
            finally:
                tiled._LEAF_GATHER = "plain"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="cliff,shard,loop")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("backend:", jax.default_backend())
    for p in args.part.split(","):
        print(f"== {p} ==")
        {"cliff": part_cliff, "shard": part_shard,
         "loop": part_loop}[p]()
