"""Ground-truth analysis of the incoherent traversal workloads (round 3).

Questions this answers (hall-260K, ao + bounces distributions):
  1. Per-ray node/leaf visit counts (mean/p50/p90/max): the cost floor of
     a per-ray-independent kernel, and the lockstep-tail shape.
  2. Per-tile visited-node UNION sizes after the cone sort, vs tile size:
     the packet kernel's cost (pops/tile ~ union size).
  3. Treelet dispersion: for a depth-D cut of the tree, how many distinct
     treelets does a ray enter, and how large are per-(tile=treelet-bin)
     unions then? The treelet-binned two-phase design's cost model.

Pure numpy (vectorized lockstep over a ray sample); no TPU needed.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from rodent_tpu.accel import build_bvh
from rodent_tpu.utils.testscenes import (make_hall, hall_primary_rays,
                                         hall_secondary_rays)


def np_traverse_counts(bvh, org, dirs, tmin, tmax, any_hit=False,
                       record_visits=False, max_iters=4096):
    """Vectorized numpy per-ray traversal (ordered, closest-hit pruning).
    Returns dict with per-ray node_pops, leaf_pops, and optionally the
    full (ray, node) visit pair list."""
    B = len(org)
    A = bvh.arity
    child = bvh.child            # (N, A) i32
    bounds = bvh.bounds          # (N, 6, A)
    inv_d = np.where(dirs != 0, 1.0 / np.where(dirs == 0, 1, dirs),
                     np.float32(3.4e38)) * np.where(dirs < 0, 1, 1)
    with np.errstate(divide="ignore"):
        inv_d = np.where(dirs != 0, 1.0 / dirs,
                         np.copysign(np.float32(3.4e38), dirs))

    S = 64
    stack = np.zeros((B, S), np.int64)
    stack[:, 0] = 1
    sptr = np.ones(B, np.int32)
    t_cur = tmax.copy()
    hit_prim = np.full(B, -1, np.int32)
    node_pops = np.zeros(B, np.int64)
    leaf_pops = np.zeros(B, np.int64)
    visits_r = []
    visits_n = []

    # leaf tri data flattened per packet lane
    P = bvh.num_packets
    m = bvh.packet
    v0 = bvh.tri_v0   # (P, M, 3)
    e1, e2, nrm = bvh.tri_e1, bvh.tri_e2, bvh.tri_n
    pid = bvh.prim_id

    it = 0
    while True:
        live = sptr > 0
        if not live.any() or it >= max_iters:
            break
        it += 1
        li = np.nonzero(live)[0]
        top = sptr[li] - 1
        code = stack[li, top]
        sptr[li] = top

        is_node = code > 0
        is_leaf = code < 0

        # ---- nodes ----
        ni = li[is_node]
        if len(ni):
            nd = (code[is_node] - 1).astype(np.int64)
            node_pops[ni] += 1
            if record_visits:
                visits_r.append(ni)
                visits_n.append(nd)
            b = bounds[nd]                     # (K, 6, A)
            o = org[ni][:, :, None]
            iv = inv_d[ni][:, :, None]
            t0 = (b[:, 0::2] - o) * iv         # (K, 3, A)
            t1 = (b[:, 1::2] - o) * iv
            ent = np.maximum(np.minimum(t0, t1).max(1), tmin[ni][:, None])
            ext = np.minimum(np.maximum(t0, t1).min(1),
                             t_cur[ni][:, None])
            ch = child[nd]                     # (K, A)
            hit = (ent <= ext) & (ch != 0)
            key = np.where(hit, ent, np.inf)
            order = np.argsort(-key, axis=1, kind="stable")  # far first
            ch_s = np.take_along_axis(ch, order, 1)
            hit_s = np.take_along_axis(hit, order, 1)
            # push far-to-near so near ends on top
            cnt = sptr[ni].copy()
            for c in range(bvh.arity):
                h = hit_s[:, c]
                stack[ni[h], cnt[h]] = ch_s[:, c][h]
                cnt[h] += 1
            sptr[ni] = cnt

        # ---- leaves ----
        lf = li[is_leaf]
        if len(lf):
            pk = (~code[is_leaf]).astype(np.int64)
            leaf_pops[lf] += 1
            o = org[lf][:, None, :]
            d = dirs[lf][:, None, :]
            c = v0[pk] - o                     # (K, M, 3)
            r = np.cross(d, c)
            det = (nrm[pk] * d).sum(-1)
            absd = np.abs(det)
            sign = np.where(det < 0, -1.0, 1.0)
            uu = (r * e2[pk]).sum(-1) * sign
            vv = (r * e1[pk]).sum(-1) * sign
            tt = (c * nrm[pk]).sum(-1) * sign
            ok = ((uu >= 0) & (vv >= 0) & (uu + vv <= absd) & (absd != 0)
                  & (tt >= absd * tmin[lf][:, None])
                  & (tt <= absd * t_cur[lf][:, None]) & (pid[pk] != -1))
            tv = np.where(ok, tt / np.where(absd == 0, 1, absd), np.inf)
            best = tv.min(1)
            upd = np.isfinite(best)
            t_cur[lf[upd]] = best[upd]
            hit_prim[lf[upd]] = 1
            # multi-packet continuation
            is_last = pid[pk, m - 1] < 0
            contm = ~is_last
            ci = lf[contm]
            stack[ci, sptr[ci]] = code[is_leaf][contm] - 1
            sptr[ci] += 1
            if any_hit:
                done = lf[hit_prim[lf] >= 0]
                sptr[done] = 0

    return {"node_pops": node_pops, "leaf_pops": leaf_pops,
            "hit": hit_prim >= 0, "hit_prim": hit_prim, "t": t_cur,
            "visits": (np.concatenate(visits_r) if visits_r else None,
                       np.concatenate(visits_n) if visits_n else None)}


def stats(name, x):
    q = np.percentile(x, [50, 90, 99])
    print(f"  {name}: mean {x.mean():7.1f}  p50 {q[0]:6.0f}  "
          f"p90 {q[1]:6.0f}  p99 {q[2]:6.0f}  max {x.max():6.0f}")


def sort_key_np(org, dirs, lo, hi):
    """Mirror of sorting.ray_sort_keys in numpy."""
    def morton10(x):
        x = x.astype(np.uint32) & 0x3FF
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x
    q = []
    for i in range(3):
        t = (org[:, i] - lo[i]) / max(hi[i] - lo[i], 1e-30)
        q.append(np.clip(t * 8.0, 0, 7).astype(np.uint32))
    org_m = ((morton10(q[0]) | (morton10(q[1]) << 1)
              | (morton10(q[2]) << 2)) & np.uint32(0x1FF))
    n = dirs / np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True),
                          1e-30)
    qd = [np.clip((n[:, i] * 0.5 + 0.5) * 128, 0, 127).astype(np.uint32)
          for i in range(3)]
    dir_m = (morton10(qd[0]) | (morton10(qd[1]) << 1)
             | (morton10(qd[2]) << 2))
    oct_ = ((dirs[:, 0] > 0).astype(np.uint32)
            | ((dirs[:, 1] > 0).astype(np.uint32) << 1)
            | ((dirs[:, 2] > 0).astype(np.uint32) << 2))
    return (org_m << np.uint32(23)) | (oct_ << np.uint32(20)) \
        | (dir_m >> np.uint32(1))


def treelet_cut(bvh, max_nodes=64):
    """Greedy top-down cut: BFS from root, split until every treelet root
    subtree has <= max_nodes nodes (or is a leaf). Returns for each node
    its treelet id (or -1), list of treelet roots."""
    child = bvh.child
    N = len(child)
    # subtree node counts
    cnt = np.ones(N, np.int64)
    order = []  # topological via DFS
    stackv = [0]
    seen = np.zeros(N, bool)
    while stackv:
        n = stackv.pop()
        order.append(n)
        for c in child[n]:
            if c > 0:
                stackv.append(c - 1)
    for n in reversed(order):
        for c in child[n]:
            if c > 0:
                cnt[n] += cnt[c - 1]
    roots = []
    frontier = [0]
    while frontier:
        n = frontier.pop()
        if cnt[n] <= max_nodes:
            roots.append(n)
        else:
            for c in child[n]:
                if c > 0:
                    frontier.append(c - 1)
            # node n itself belongs to the "top tree"
    return roots, cnt


def main():
    verts, idx = make_hall(260_000)
    bvh = build_bvh(verts, idx, arity=8, packet=8, leaf_threshold=12)
    print(f"hall bvh: {bvh.num_nodes} nodes, {bvh.num_packets} packets")
    lo, hi = verts.min(0), verts.max(0)

    org, dirs = hall_primary_rays(1024, 1024)
    t0 = time.time()
    prim = np_traverse_counts(
        bvh, org[:32768], dirs[:32768],
        np.zeros(32768, np.float32), np.full(32768, 3.4e38, np.float32))
    print(f"primary sample traverse {time.time()-t0:.1f}s "
          f"hit_frac {prim['hit'].mean():.3f}")

    # full primary hits for secondary-ray generation (reuse bench.py's
    # approach but numpy)
    n_all = len(org)
    SAMPLE = 32768
    rng = np.random.RandomState(3)
    sel = rng.choice(n_all, SAMPLE, replace=False)
    full = np_traverse_counts(
        bvh, org[sel], dirs[sel], np.zeros(SAMPLE, np.float32),
        np.full(SAMPLE, 3.4e38, np.float32))
    t = np.where(full["hit"], full["t"], 1.0)
    hp = org[sel] + dirs[sel] * t[:, None]
    i4 = idx.reshape(-1, 4)
    # face normals from nearest tri — approximate with up-normal where
    # missing; for count statistics the exact normal hardly matters
    d_in = dirs[sel]
    nrm = -d_in  # reflect-ish fallback: hemisphere around -incoming
    for kind, any_hit in (("ao", True), ("bounces", False)):
        o2, d2, tmax2 = hall_secondary_rays(kind, hp, nrm)
        tmin2 = np.full(SAMPLE, 1e-3, np.float32)
        res = np_traverse_counts(bvh, o2, d2, tmin2, tmax2,
                                 any_hit=any_hit, record_visits=True)
        print(f"\n== {kind} (any_hit={any_hit}) hit_frac "
              f"{res['hit'].mean():.3f}")
        stats("node_pops", res["node_pops"])
        stats("leaf_pops", res["leaf_pops"])
        tot = res["node_pops"] + res["leaf_pops"]
        stats("total_pops", tot)

        # tile unions after cone sort
        key = sort_key_np(o2, d2, lo, hi)
        perm = np.argsort(key, kind="stable")
        inv = np.empty_like(perm)
        inv[perm] = np.arange(SAMPLE)
        vr, vn = res["visits"]
        vr_sorted_pos = inv[vr]          # position of each visit's ray
        for tile in (512, 1024, 2048, 4096):
            tid = vr_sorted_pos // tile
            pair = tid.astype(np.int64) * bvh.num_nodes + vn
            uniq = np.unique(pair)
            n_tiles = -(-SAMPLE // tile)
            print(f"  tile={tile:5d}: mean node-union/tile = "
                  f"{len(uniq)/n_tiles:8.1f}  (pops floor)")

        # lockstep tail: iterations = max pops within tile
        for tile in (1024, 4096):
            tp = tot[perm]
            n_tiles = SAMPLE // tile
            mx = tp[:n_tiles * tile].reshape(n_tiles, tile).max(1)
            mn = tp[:n_tiles * tile].reshape(n_tiles, tile).mean(1)
            print(f"  tile={tile:5d}: per-tile max pops mean "
                  f"{mx.mean():7.1f} vs mean pops {mn.mean():7.1f} "
                  f"(tail x{mx.mean()/max(mn.mean(),1e-9):.1f})")

        # treelet dispersion
        for tl_max in (32, 64, 128, 256):
            roots, cnt = treelet_cut(bvh, tl_max)
            root_set = np.zeros(bvh.num_nodes, np.int64) - 1
            for i, r in enumerate(roots):
                root_set[r] = i
            # map every node to its treelet (walk up? easier: BFS down)
            tl_of = np.full(bvh.num_nodes, -1, np.int64)
            stackv = [(0, -1)]
            while stackv:
                n, cur = stackv.pop()
                if root_set[n] >= 0:
                    cur = root_set[n]
                tl_of[n] = cur
                for c in bvh.child[n]:
                    if c > 0:
                        stackv.append((c - 1, cur))
            vt = tl_of[vn]
            in_top = (vt < 0).sum() / len(vn)
            pr = np.unique(vr.astype(np.int64) * (len(roots) + 1)
                           + (vt + 1))
            pairs_per_ray = len(pr) / SAMPLE
            print(f"  treelet<= {tl_max:4d}: {len(roots):5d} treelets, "
                  f"visits in top-tree {100*in_top:4.1f}%, "
                  f"treelets/ray {pairs_per_ray:5.2f}")


if __name__ == "__main__":
    main()
