"""Simulate the BFS pair-queue traversal design (round 3) in numpy.

Design under evaluation (the per-ray incoherent path):
  - work queue of (ray, code) pairs, initialized to (ray, root)
  - per round: leaf pairs are intersected first (t_best scatter-min),
    then node pairs expand children pruned by [tmin, min(tmax, t_best)]
  - any-hit: a hit sets ray_done; pairs of done rays are dropped at the
    start of every round
  - no per-ray stack, no ordering — pruning is lazy via t_best

Outputs, per distribution (ao / bounces / primary):
  total node-pair and leaf-pair pops per ray (vs the ordered-DFS floor
  from analyze_incoherent), round count, per-round queue sizes (the
  compaction volumes), and the closest-hit overvisit factor.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from rodent_tpu.accel import build_bvh
from rodent_tpu.utils.testscenes import (make_hall, hall_primary_rays,
                                         hall_secondary_rays)
from analyze_incoherent import np_traverse_counts


def bfs_sim(bvh, org, dirs, tmin, tmax, any_hit, max_rounds=256):
    B = len(org)
    with np.errstate(divide="ignore"):
        inv_d = np.where(dirs != 0, 1.0 / dirs,
                         np.copysign(np.float32(3.4e38), dirs))
    bounds, child = bvh.bounds, bvh.child
    v0, e1, e2, nrm = bvh.tri_v0, bvh.tri_e1, bvh.tri_e2, bvh.tri_n
    pid, m = bvh.prim_id, bvh.packet

    t_best = tmax.astype(np.float64).copy()
    done = np.zeros(B, bool)

    q_ray = np.arange(B, dtype=np.int64)
    q_code = np.ones(B, np.int64)  # root

    node_pops = 0
    leaf_pops = 0
    rounds = 0
    round_sizes = []

    while len(q_ray) and rounds < max_rounds:
        rounds += 1
        keep = ~done[q_ray]
        q_ray, q_code = q_ray[keep], q_code[keep]
        if not len(q_ray):
            break
        round_sizes.append(len(q_ray))

        is_leaf = q_code < 0
        # ---- leaves first: update t_best this round ----
        lf_r, lf_c = q_ray[is_leaf], q_code[is_leaf]
        cont_r = np.empty(0, np.int64)
        cont_c = np.empty(0, np.int64)
        if len(lf_r):
            pk = (~lf_c)
            leaf_pops += len(lf_r)
            o = org[lf_r][:, None, :]
            d = dirs[lf_r][:, None, :]
            c = v0[pk] - o
            r = np.cross(d, c)
            det = (nrm[pk] * d).sum(-1)
            absd = np.abs(det)
            sign = np.where(det < 0, -1.0, 1.0)
            uu = (r * e2[pk]).sum(-1) * sign
            vv = (r * e1[pk]).sum(-1) * sign
            tt = (c * nrm[pk]).sum(-1) * sign
            ok = ((uu >= 0) & (vv >= 0) & (uu + vv <= absd) & (absd != 0)
                  & (tt >= absd * tmin[lf_r][:, None])
                  & (tt <= absd * t_best[lf_r][:, None]) & (pid[pk] != -1))
            tv = np.where(ok, tt / np.where(absd == 0, 1, absd), np.inf)
            best = tv.min(1)
            upd = np.isfinite(best)
            np.minimum.at(t_best, lf_r[upd], best[upd])
            if any_hit:
                done[lf_r[upd]] = True
            # multi-packet leaves continue to the next packet
            is_last = pid[pk, m - 1] < 0
            cm = ~is_last
            cont_r, cont_c = lf_r[cm], lf_c[cm] - 1

        # ---- nodes: expand ----
        nd_r, nd_c = q_ray[~is_leaf], q_code[~is_leaf]
        new_r = np.empty(0, np.int64)
        new_c = np.empty(0, np.int64)
        if len(nd_r):
            node_pops += len(nd_r)
            nd = nd_c - 1
            b = bounds[nd]
            o = org[nd_r][:, :, None]
            iv = inv_d[nd_r][:, :, None]
            t0 = (b[:, 0::2] - o) * iv
            t1 = (b[:, 1::2] - o) * iv
            ent = np.maximum(np.minimum(t0, t1).max(1), tmin[nd_r][:, None])
            ext = np.minimum(np.maximum(t0, t1).min(1),
                             t_best[nd_r][:, None])
            ch = child[nd]
            hit = (ent <= ext) & (ch != 0)
            ri = np.repeat(nd_r, bvh.arity).reshape(-1, bvh.arity)
            new_r = ri[hit]
            new_c = ch[hit]

        q_ray = np.concatenate([cont_r, new_r])
        q_code = np.concatenate([cont_c, new_c])

    return {"node_pops": node_pops, "leaf_pops": leaf_pops,
            "rounds": rounds, "round_sizes": np.asarray(round_sizes),
            "t": t_best, "hit_any": done}


def main():
    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    print(f"hall bvh: {bvh.num_nodes} nodes, {bvh.num_packets} packets")

    SAMPLE = 32768
    org, dirs = hall_primary_rays(1024, 1024)
    rng = np.random.RandomState(3)
    sel = rng.choice(len(org), SAMPLE, replace=False)
    t0 = time.time()
    full = np_traverse_counts(
        bvh, org[sel], dirs[sel], np.zeros(SAMPLE, np.float32),
        np.full(SAMPLE, 3.4e38, np.float32))
    print(f"primary DFS reference {time.time()-t0:.1f}s")
    t = np.where(full["hit"], full["t"], 1.0)
    hp = org[sel] + dirs[sel] * t[:, None]
    nrm = -dirs[sel]

    cases = []
    for kind, any_hit in (("ao", True), ("bounces", False)):
        o2, d2, tmax2 = hall_secondary_rays(kind, hp, nrm)
        cases.append((kind, any_hit, o2, d2,
                      np.full(SAMPLE, 1e-3, np.float32), tmax2))
    cases.append(("primary", False, org[sel], dirs[sel],
                  np.zeros(SAMPLE, np.float32),
                  np.full(SAMPLE, 3.4e38, np.float32)))

    for kind, any_hit, o2, d2, tmin2, tmax2 in cases:
        t0 = time.time()
        dfs = np_traverse_counts(bvh, o2, d2, tmin2, tmax2,
                                 any_hit=any_hit)
        bfs = bfs_sim(bvh, o2, d2, tmin2, tmax2, any_hit)
        dt = time.time() - t0
        dn = dfs["node_pops"].sum() / SAMPLE
        dl = dfs["leaf_pops"].sum() / SAMPLE
        bn = bfs["node_pops"] / SAMPLE
        bl = bfs["leaf_pops"] / SAMPLE
        rs = bfs["round_sizes"]
        # closest-hit result parity
        tol_ok = np.allclose(
            np.where(np.isfinite(bfs["t"]), bfs["t"], 0),
            np.where(dfs["t"] < 3.3e38, dfs["t"], 0), rtol=1e-5, atol=1e-5)
        print(f"\n== {kind} (any_hit={any_hit})  [{dt:.0f}s]")
        print(f"  DFS pops/ray: node {dn:6.2f} leaf {dl:6.2f} "
              f"total {dn+dl:6.2f}")
        print(f"  BFS pops/ray: node {bn:6.2f} leaf {bl:6.2f} "
              f"total {bn+bl:6.2f}  (overvisit x{(bn+bl)/(dn+dl):.2f})")
        print(f"  rounds {bfs['rounds']}, queue sizes: "
              f"max {rs.max()} mean {rs.mean():.0f} "
              f"total pairs {rs.sum()} ({rs.sum()/SAMPLE:.1f}/ray)")
        print(f"  t parity vs DFS: {tol_ok}")


if __name__ == "__main__":
    main()
