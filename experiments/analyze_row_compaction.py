"""Row-granularity staged compaction: what would it save? (numpy sim)

The tiled lockstep loop pays max-trips x full width; mean utilization is
0.31-0.43 (measured counters). Per-RAY compaction is unaffordable (~78
state arrays x 1D gathers), but 128-ray ROW granularity costs only
row-gathers (~2.5 ns/row x 78 arrays). This sim answers whether rows die
together under the production cone sort: per-ray trips ~ node+leaf pops
(sequential dual-queue approx), rows of 128 sorted rays, compare
  full width:   max_trips x R rows
  ideal mean:   sum_t live_rays(t) / 128
  row-compact:  sum_t live_rows(t)   (+ stage-granularity variants)
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from rodent_tpu.accel import build_bvh
from rodent_tpu.traversal.api import make_rays
from rodent_tpu.traversal.sorting import ray_sort_keys
from rodent_tpu.utils.testscenes import (make_hall, hall_primary_rays,
                                         hall_secondary_rays)
from experiments.analyze_incoherent import np_traverse_counts

N_RAYS = 1 << 18   # sample (sim is O(rays x trips))

verts, idx = make_hall(260_000)
bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
lo, hi = verts.min(0), verts.max(0)

org, dirs = hall_primary_rays(512, 512)
n = len(org)
tmin = np.zeros(n, np.float32)
tmax = np.full(n, 3.4e38, np.float32)
res = np_traverse_counts(bvh, org, dirs, tmin, tmax)
t = res["t"]
pid = res["hit_prim"]
t = np.where(pid >= 0, t, 1.0)
hp = org + dirs * t[:, None]
i4 = idx.reshape(-1, 4)
tri = np.maximum(pid, 0)
v0, v1, v2 = verts[i4[tri, 0]], verts[i4[tri, 1]], verts[i4[tri, 2]]
fn = np.cross(v0 - v1, v2 - v0)
fn = np.where((fn * dirs).sum(1, keepdims=True) > 0, -fn, fn)

for kind in ("primary", "ao", "bounces"):
    if kind == "primary":
        o2, d2, tn2, tx2, ah = org, dirs, tmin, tmax, False
    else:
        o2, d2, tx2 = hall_secondary_rays(kind, hp, fn)
        tn2 = np.full(n, 1e-3, np.float32)
        ah = kind == "ao"
    r2 = np_traverse_counts(bvh, o2.astype(np.float32),
                            d2.astype(np.float32), tn2,
                            tx2.astype(np.float32), any_hit=ah)
    trips = r2["node_pops"] + r2["leaf_pops"]   # sequential approx

    keys = np.asarray(ray_sort_keys(jnp.asarray(o2, jnp.float32),
                                    jnp.asarray(d2, jnp.float32),
                                    lo, hi))
    order = np.argsort(keys, kind="stable")
    tr = trips[order]
    R = len(tr) // 128
    rows = tr[:R * 128].reshape(R, 128)
    row_trips = rows.max(axis=1)
    T = int(row_trips.max())
    # live counts per trip
    ts = np.arange(1, T + 1)[:, None]
    live_rays = (rows[None, :, :] >= ts.reshape(-1, 1, 1)).sum((1, 2))
    live_rows = (row_trips[None, :] >= ts).sum(1)

    full = T * R
    ideal = live_rays.sum() / 128.0
    rowc = live_rows.sum()
    # staged halving: width can only shrink to R/2^k at trips where
    # live_rows fits; work(t) = current stage width
    width = R
    staged = 0
    for tcur in range(T):
        while width // 2 >= max(live_rows[tcur], 1) and width > R // 32:
            width //= 2
        staged += width
    print(f"{kind:8s}: T={T:4d} full={full/R:7.1f} "
          f"row-compact={rowc/R:7.1f} ({full/rowc:4.2f}x) "
          f"staged/2={staged/R:7.1f} ({full/staged:4.2f}x) "
          f"ideal-mean={ideal/R:7.1f} ({full/ideal:4.2f}x)",
          flush=True)
