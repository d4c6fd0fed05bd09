"""Lockstep per-tile simulation for the per-ray-independent kernel design.

Simulates the exact kernel structure under consideration: tiles of T
cone-sorted rays advance in lockstep, each ray with its own stack
(ordered traversal, closest-hit pruning or any-hit). Records per
iteration:
  - active-lane fraction (utilization)
  - distinct node codes + the node PAGE window (code//128 span)
  - distinct leaf codes + the leaf page window
  - per-tile trip count (max pops)
This decides whether page-windowed lane-gather fetches are viable for
node and tri tables (page = 128 consecutive DFS-ordered entries).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from rodent_tpu.accel import build_bvh
from rodent_tpu.utils.testscenes import (make_hall, hall_primary_rays,
                                         hall_secondary_rays)
from analyze_incoherent import np_traverse_counts, sort_key_np


def lockstep_sim(bvh, org, dirs, tmin, tmax, any_hit, tile=1024,
                 max_iters=512):
    """Lockstep-per-tile sim. Returns per-tile trip counts and
    per-iteration page stats aggregated over tiles."""
    B = len(org)
    A = bvh.arity
    child = bvh.child
    bounds = bvh.bounds
    with np.errstate(divide="ignore"):
        inv_d = np.where(dirs != 0, 1.0 / dirs,
                         np.copysign(np.float32(3.4e38), dirs))
    v0, e1, e2, nrm = bvh.tri_v0, bvh.tri_e1, bvh.tri_e2, bvh.tri_n
    pid = bvh.prim_id
    m = bvh.packet

    n_tiles = B // tile
    trips = []
    node_pages_per_iter = []   # distinct node pages among active lanes
    node_span_per_iter = []    # pmax - pmin + 1
    leaf_pages_per_iter = []
    leaf_span_per_iter = []
    util = []

    for ti in range(n_tiles):
        sl = slice(ti * tile, (ti + 1) * tile)
        o, d, iv = org[sl], dirs[sl], inv_d[sl]
        tn, tx = tmin[sl], tmax[sl]
        S = 64
        stack = np.zeros((tile, S), np.int64)
        stack[:, 0] = 1
        sptr = np.ones(tile, np.int32)
        t_cur = tx.copy()
        hitp = np.full(tile, -1, np.int32)
        it = 0
        while (sptr > 0).any() and it < max_iters:
            it += 1
            live = sptr > 0
            li = np.nonzero(live)[0]
            util.append(live.mean())
            top = sptr[li] - 1
            code = stack[li, top]
            sptr[li] = top
            is_node = code > 0
            is_leaf = code < 0

            nd = (code[is_node] - 1)
            if len(nd):
                pg = np.unique(nd // 128)
                node_pages_per_iter.append(len(pg))
                node_span_per_iter.append(pg.max() - pg.min() + 1)
            pk = (~code[is_leaf])
            if len(pk):
                pg = np.unique(pk // 128)
                leaf_pages_per_iter.append(len(pg))
                leaf_span_per_iter.append(pg.max() - pg.min() + 1)

            tli = li[is_node]
            if len(tli):
                b = bounds[nd]
                oo = o[tli][:, :, None]
                ivv = iv[tli][:, :, None]
                t0 = (b[:, 0::2] - oo) * ivv
                t1 = (b[:, 1::2] - oo) * ivv
                ent = np.maximum(np.minimum(t0, t1).max(1),
                                 tn[tli][:, None])
                ext = np.minimum(np.maximum(t0, t1).min(1),
                                 t_cur[tli][:, None])
                ch = child[nd]
                hit = (ent <= ext) & (ch != 0)
                key = np.where(hit, ent, np.inf)
                order = np.argsort(-key, axis=1, kind="stable")
                ch_s = np.take_along_axis(ch, order, 1)
                hit_s = np.take_along_axis(hit, order, 1)
                cnt = sptr[tli].copy()
                for c in range(A):
                    h = hit_s[:, c]
                    stack[tli[h], cnt[h]] = ch_s[:, c][h]
                    cnt[h] += 1
                sptr[tli] = cnt

            lf = li[is_leaf]
            if len(lf):
                c = v0[pk] - o[lf][:, None, :]
                dd = d[lf][:, None, :]
                r = np.cross(dd, c)
                det = (nrm[pk] * dd).sum(-1)
                absd = np.abs(det)
                sign = np.where(det < 0, -1.0, 1.0)
                uu = (r * e2[pk]).sum(-1) * sign
                vv = (r * e1[pk]).sum(-1) * sign
                tt = (c * nrm[pk]).sum(-1) * sign
                ok = ((uu >= 0) & (vv >= 0) & (uu + vv <= absd)
                      & (absd != 0)
                      & (tt >= absd * tn[lf][:, None])
                      & (tt <= absd * t_cur[lf][:, None])
                      & (pid[pk] != -1))
                tv = np.where(ok, tt / np.where(absd == 0, 1, absd),
                              np.inf)
                best = tv.min(1)
                upd = np.isfinite(best)
                t_cur[lf[upd]] = best[upd]
                hitp[lf[upd]] = 1
                is_last = pid[pk, m - 1] < 0
                contm = ~is_last
                ci = lf[contm]
                stack[ci, sptr[ci]] = code[is_leaf][contm] - 1
                sptr[ci] += 1
                if any_hit:
                    done = lf[hitp[lf] >= 0]
                    sptr[done] = 0
        trips.append(it)

    def st(name, x):
        x = np.asarray(x)
        if not len(x):
            print(f"    {name}: (none)")
            return
        print(f"    {name}: mean {x.mean():7.2f} p50 "
              f"{np.percentile(x, 50):6.1f} p90 "
              f"{np.percentile(x, 90):6.1f} max {x.max():7.0f}")

    print(f"  tile={tile}: trips mean {np.mean(trips):.1f} "
          f"max {np.max(trips)}, util mean {np.mean(util):.2f}")
    st("node pages active/iter", node_pages_per_iter)
    st("node page span/iter", node_span_per_iter)
    st("leaf pages active/iter", leaf_pages_per_iter)
    st("leaf page span/iter", leaf_span_per_iter)


def main():
    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    npages_n = -(-bvh.num_nodes // 128)
    npages_t = -(-bvh.num_packets // 128)
    print(f"hall: {bvh.num_nodes} nodes ({npages_n} pages), "
          f"{bvh.num_packets} packets ({npages_t} pages)")
    lo, hi = verts.min(0), verts.max(0)

    SAMPLE = 16384
    org, dirs = hall_primary_rays(1024, 1024)
    rng = np.random.RandomState(3)
    sel = rng.choice(len(org), SAMPLE, replace=False)
    full = np_traverse_counts(
        bvh, org[sel], dirs[sel], np.zeros(SAMPLE, np.float32),
        np.full(SAMPLE, 3.4e38, np.float32))
    t = np.where(full["hit"], full["t"], 1.0)
    hp = org[sel] + dirs[sel] * t[:, None]
    nrm = -dirs[sel]

    for kind, any_hit in (("ao", True), ("bounces", False)):
        o2, d2, tmax2 = hall_secondary_rays(kind, hp, nrm)
        tmin2 = np.full(SAMPLE, 1e-3, np.float32)
        key = sort_key_np(o2, d2, lo, hi)
        perm = np.argsort(key, kind="stable")
        print(f"\n== {kind}")
        for tile in (1024, 2048):
            lockstep_sim(bvh, o2[perm], d2[perm], tmin2, tmax2[perm],
                         any_hit, tile=tile)

    # primary for reference
    print("\n== primary (sorted)")
    po, pd = org[sel], dirs[sel]
    key = sort_key_np(po, pd, lo, hi)
    perm = np.argsort(key, kind="stable")
    lockstep_sim(bvh, po[perm], pd[perm], np.zeros(SAMPLE, np.float32),
                 np.full(SAMPLE, 3.4e38, np.float32), False, tile=1024)


if __name__ == "__main__":
    main()
