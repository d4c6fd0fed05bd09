"""Pair-layout packet traversal — kernel v3.

v2 (pallas_packet) broadcasts each child's bounds to the whole tile by
extracting ~56 scalars per node pop from the loaded row; measured, those
vector->scalar transfers dominate per-pop time (the ~360 ns fixed floor
at small tiles) and their instruction count swamps the scalar core's
issue bandwidth at large ones. v3 removes almost all of them:

- (ray, child) lane pairing: a VPU lane holds one (ray, slot) pair —
  lane j = (ray j%16, slot j//16) — so ONE instruction sequence
  slab-tests 16 rays against all 8 children (same lane work as v2's
  8 sequential child passes, ~8x fewer instructions, zero per-bound
  extracts).
- MXU broadcast: bounds and triangle fields expand from the compact
  node/tri row to per-lane vectors with one small f32 matmul against a
  constant 0/1 selection matrix (exact: one term per output element),
  instead of 48-112 scalar extracts. rhs[l, j] = (l%8 == j//16).
  Triangle prim/geom ids are stored as plain floats (exact below 2^24)
  so they can ride the same matmul — bitcast int payloads would be
  denormal-flushed.
- Vector stack: a stack entry is one *node's worth* of children — the
  keys row (tile-min entry distance at lanes 16c; +inf for missed and
  empty slots, which miss for free via their inverted bounds) plus the
  raw node row (child codes at lanes 48+c). A pop consumes the nearest
  remaining child (2 scalar extracts: argmin lane, code via dynamic
  roll) and strips that lane in place. Near-ordered traversal comes out
  for free, and seeding the stack with arbitrary subtree roots is
  trivial (used by the binned incoherent-ray scheduler).

Requires arity == 8 and packet == 8 (the flagship configuration);
other shapes keep using pallas_packet / tiled. Hit semantics identical
to traversal.api.traverse (ordered slab test + sign-trick
Moller-Trumbore, src/traversal/intersection.impala:164-208), including
tie-breaks (lowest packet, then lowest lane).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TILE_RAYS = 2048         # rays per stream tile (pair rows = TILE_RAYS/16)
STREAMS = 4              # independent tile-streams per kernel instance:
                         # the per-pop cost is mostly latency (MXU round
                         # trip + dependent VPU chain), so S streams with
                         # separate stacks overlap their chains — phase-
                         # split body issues all S chains before reading
                         # any reduction
GROUP = 16               # rays per lane-block; 128 / GROUP = 8 slots
_F32_MAX = 3.402823466e38


def _selection_matrix():
    """rhs[l, j] = 1.0 iff l % 8 == j // 16, so (row * mask_k) @ rhs
    puts row[8k + j//16] into out[k, j]."""
    l = np.arange(128)[:, None]
    j = np.arange(128)[None, :]
    return ((l % 8) == (j // GROUP)).astype(np.float32)


def _row_masks(rows):
    """mask[k, l] = 1.0 iff l // 8 == k (selects field group k)."""
    k = np.arange(rows)[:, None]
    l = np.arange(128)[None, :]
    return ((l // 8) == k).astype(np.float32)


def pair_ok(dev):
    return "pair_nodes" in dev


def pair_device(bvh):
    """bvh -> device dict with the pair layouts added (this used to be
    bvh_to_device(pair=True) while the kernel was a production
    candidate; the opt-in moved here with the experiment — the pair
    tables roughly double device memory, e.g. +551 MB at 4.3M tris)."""
    from rodent_tpu.traversal.api import bvh_to_device
    dev = dict(bvh_to_device(bvh))
    pn, pt = pack_tables(np.asarray(dev["nodes"]), np.asarray(dev["tris"]))
    dev["pair_nodes"] = jnp.asarray(pn)
    dev["pair_tris"] = jnp.asarray(pt)
    return dev


def pack_tables(nodes, tris):
    """Pair-layout tables from bvh_to_device's flat rows.

    pair_nodes: lane 8k + c = bound k of child c (k < 6, empty slots
    zeroed — anything non-finite would poison the broadcast matmul via
    0*inf = NaN); lanes 48..55 = slot-valid flags (1.0/0.0, broadcast
    row k=6); lanes 120..127 = child codes (int32 bitcast, outside the
    broadcast field range so their bit patterns never meet arithmetic).
    pair_tris: lane 8f + t = field f of tri t — f 0..11 the float
    geometry, f=12 prim id as float (-1 invalid), f=13 geom id as float;
    lane 112 = 1.0 when this packet ends its leaf (the sign-bit flag of
    the compact layout, converter.cpp:252-258, moved out of the id)."""
    nodes = np.asarray(nodes)
    a = nodes.shape[1] // 7
    assert a == 8, "pair kernel requires arity 8"
    out_n = np.zeros((nodes.shape[0], 128), np.float32)
    codes = nodes[:, 6 * a:7 * a].view(np.int32)
    valid = codes != 0
    for k in range(6):
        b = nodes[:, k * a:(k + 1) * a]
        out_n[:, 8 * k:8 * k + 8] = np.where(valid, b, 0.0)
    out_n[:, 48:56] = valid.astype(np.float32)
    out_n[:, 120:128] = nodes[:, 6 * a:7 * a]

    tris = np.asarray(tris)
    m = tris.shape[1] // 14
    assert m == 8, "pair kernel requires Tri8 packets"
    out_t = np.zeros((tris.shape[0], 128), np.float32)
    for f in range(12):
        out_t[:, 8 * f:8 * f + 8] = tris[:, f * m:(f + 1) * m]
    pid = tris[:, 12 * m:13 * m].view(np.int32)
    gid = tris[:, 13 * m:14 * m].view(np.int32)
    invalid = pid == -1
    out_t[:, 96:104] = np.where(invalid, -1.0,
                                (pid & 0x7FFFFFFF).astype(np.float32))
    out_t[:, 104:112] = gid.astype(np.float32)
    out_t[:, 112] = (pid[:, m - 1] < 0).astype(np.float32)
    return out_n, out_t


def _kernel(*refs, any_hit, stack_size, streams, count_pops,
            ablate=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = streams
    if count_pops:
        (rays_ref, nodes_ref, tris_ref, sel_ref, nmask_ref, tmask_ref,
         t_ref, u_ref, v_ref, prim_ref, geom_ref, cout_ref) = refs[:12]
        rest = refs[12:]
        csm_ref = rest[2 * S]
    else:
        (rays_ref, nodes_ref, tris_ref, sel_ref, nmask_ref, tmask_ref,
         t_ref, u_ref, v_ref, prim_ref, geom_ref) = refs[:11]
        rest = refs[11:]
    # one stack/count ref PER STREAM: a single shared ref would make
    # every stream's dynamic-index load order against every other
    # stream's store (no alias analysis on dynamic indices), chaining
    # the S supposedly-independent latency chains through memory fences
    stk_refs = rest[:S]
    cnt_refs = rest[S:2 * S]
    P = rays_ref.shape[1] // S           # pair rows per stream
    ray_s = []
    for s in range(S):
        lo = s * P
        ray_s.append({
            "inv_d": [rays_ref[i, lo:lo + P] for i in range(3)],
            "org": [rays_ref[3 + i, lo:lo + P] for i in range(3)],
            "dir": [rays_ref[6 + i, lo:lo + P] for i in range(3)],
            "tmin": rays_ref[9, lo:lo + P],
            "tmax": rays_ref[10, lo:lo + P],
        })

    sel = sel_ref[:]
    nmask = nmask_ref[:]
    tmask = tmask_ref[:]

    iota128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    block_start = (iota128 % GROUP) == 0
    INFV = jnp.float32(_F32_MAX)
    rowio = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

    def broadcast(row, mask):
        # select, don't multiply: a NaN/inf lane anywhere in the row
        # would otherwise poison every output via 0 * inf = NaN
        lhs = jnp.where(mask > 0.5, jnp.broadcast_to(row, mask.shape),
                        0.0)
        if "nomatmul" in ablate:   # ablation: wrong values, same shapes
            return lhs
        if "fastmatmul" in ablate:  # ablation: one bf16 pass (lossy)
            return jax.lax.dot_general(
                lhs, sel, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
        return jax.lax.dot_general(
            lhs, sel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    num_nodes = nodes_ref.shape[0]
    num_packets = tris_ref.shape[0]

    def node_step(s, code, t_cur):
        # clamp: harmless for valid codes, keeps a speculatively-executed
        # branch (or a corrupted pop) in bounds on hardware
        r = ray_s[s]
        org, inv_d = r["org"], r["inv_d"]
        nr = nodes_ref[pl.ds(jnp.clip(code - 1, 0, num_nodes - 1), 1), :]
        b = broadcast(nr, nmask)             # rows 0..5 = bounds
        tx0 = (b[0:1] - org[0]) * inv_d[0]
        tx1 = (b[1:2] - org[0]) * inv_d[0]
        ty0 = (b[2:3] - org[1]) * inv_d[1]
        ty1 = (b[3:4] - org[1]) * inv_d[1]
        tz0 = (b[4:5] - org[2]) * inv_d[2]
        tz1 = (b[5:6] - org[2]) * inv_d[2]
        ent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                      jnp.minimum(ty0, ty1)),
                          jnp.maximum(jnp.minimum(tz0, tz1), r["tmin"]))
        ext = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                      jnp.maximum(ty0, ty1)),
                          jnp.minimum(jnp.maximum(tz0, tz1), t_cur))
        key = jnp.where((ent <= ext) & (b[6:7] > 0.5), ent, INFV)
        # per-slot tile-min: sublane reduce, then an in-block roll tree
        # (block starts stay uncontaminated; other lanes masked after)
        krow = jnp.min(key, axis=0, keepdims=True)
        for sh in (8, 4, 2, 1):
            krow = jnp.minimum(krow, pltpu.roll(krow, 128 - sh, axis=1))
        krow = jnp.where(block_start, krow, INFV)
        return krow, nr

    def leaf_fold(s, code, carry):
        r = ray_s[s]
        org, dirv = r["org"], r["dir"]
        t_cur, u_b, v_b, p_b, g_b = carry
        tr = tris_ref[pl.ds(jnp.clip(~code, 0, num_packets - 1), 1), :]
        f = broadcast(tr, tmask)             # (16, 128)
        cx = f[0:1] - org[0]
        cy = f[1:2] - org[1]
        cz = f[2:3] - org[2]
        e1x, e1y, e1z = f[3:4], f[4:5], f[5:6]
        e2x, e2y, e2z = f[6:7], f[7:8], f[8:9]
        nx, ny, nz = f[9:10], f[10:11], f[11:12]
        pid_f = f[12:13]
        gid_f = f[13:14]

        rx = dirv[1] * cz - dirv[2] * cy
        ry = dirv[2] * cx - dirv[0] * cz
        rz = dirv[0] * cy - dirv[1] * cx
        det = nx * dirv[0] + ny * dirv[1] + nz * dirv[2]
        abs_det = jnp.abs(det)
        sign = jnp.where(det < 0, jnp.float32(-1.0), jnp.float32(1.0))
        uu = (rx * e2x + ry * e2y + rz * e2z) * sign
        vv = (rx * e1x + ry * e1y + rz * e1z) * sign
        tt = (cx * nx + cy * ny + cz * nz) * sign
        ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= abs_det)
              & (abs_det != 0.0)
              & (tt >= abs_det * r["tmin"]) & (tt <= abs_det * t_cur)
              & (pid_f >= 0.0))
        inv_det = 1.0 / jnp.where(abs_det != 0.0, abs_det, 1.0)
        tv = jnp.where(ok, tt * inv_det, INFV)
        pu = uu * inv_det
        pv = vv * inv_det
        pp = pid_f
        pg = gid_f
        # fold the 8 tri lanes of each ray; rolls by multiples of 16 wrap
        # mod 128 so lane j always pulls the SAME ray (j%16); strict <
        # keeps the lower slot on ties = the scalar kernels' lane order
        for sh in (128 - GROUP, 128 - 2 * GROUP, 128 - 4 * GROUP):
            rt = pltpu.roll(tv, sh, axis=1)
            take = rt < tv
            tv = jnp.where(take, rt, tv)
            pu = jnp.where(take, pltpu.roll(pu, sh, axis=1), pu)
            pv = jnp.where(take, pltpu.roll(pv, sh, axis=1), pv)
            pp = jnp.where(take, pltpu.roll(pp, sh, axis=1), pp)
            pg = jnp.where(take, pltpu.roll(pg, sh, axis=1), pg)
        upd = tv < t_cur
        t_cur = jnp.where(upd, tv, t_cur)
        u_b = jnp.where(upd, pu, u_b)
        v_b = jnp.where(upd, pv, v_b)
        p_b = jnp.where(upd, pp, p_b)
        g_b = jnp.where(upd, pg, g_b)
        is_last = tr[0, 112] > 0.5
        return (t_cur, u_b, v_b, p_b, g_b), is_last

    # stack entries are (8,128) tiles — Mosaic faults on sub-tile
    # dynamic VMEM stores inside while loops (measured; see
    # experiments/probe_mosaic2.py) — row 0 = keys, row 1 = node row.
    # Stream s owns entries [s*stack_size, (s+1)*stack_size).
    def make_entry(krow, nrow):
        return jnp.where(rowio == 0, jnp.broadcast_to(krow, (8, 128)),
                         jnp.where(rowio == 1,
                                   jnp.broadcast_to(nrow, (8, 128)), 0.0))

    root_entry = make_entry(
        jnp.where(iota128 == 0, jnp.float32(0.0), INFV),
        jax.lax.bitcast_convert_type(
            jnp.where(iota128 == 120, jnp.int32(1), jnp.int32(0)),
            jnp.float32))
    for s in range(S):
        stk_refs[s][0:8, :] = root_entry
        cnt_refs[s][0] = jnp.int32(1)
    if count_pops:
        csm_ref[0] = jnp.int32(0)

    # carry: (it, sp[0..S), done[0..S) if any_hit, then S x 5 hit arrays)
    init = [jnp.int32(0)] + [jnp.int32(1)] * S
    if any_hit:
        init += [jnp.bool_(False)] * S
    for s in range(S):
        tmax = ray_s[s]["tmax"]
        init += [tmax, jnp.zeros_like(tmax), jnp.zeros_like(tmax),
                 jnp.full(tmax.shape, -1.0, jnp.float32),
                 jnp.full(tmax.shape, -1.0, jnp.float32)]
    init = tuple(init)
    hit0 = 1 + S + (S if any_hit else 0)

    # hard iteration bound: a desynced stack must terminate, not hang
    # the chip (watchdogs kill the whole TPU worker)
    max_iters = jnp.int32(4 * num_nodes + 4 * num_packets + 1024)

    def stream_alive(c, s):
        a = c[1 + s] > 0
        if any_hit:
            a = a & jnp.logical_not(c[1 + S + s])
        return a

    def cond(c):
        alive = stream_alive(c, 0)
        for s in range(1, S):
            alive = alive | stream_alive(c, s)
        return alive & (c[0] < max_iters)

    # The body is STRAIGHT-LINE (no lax.cond / nested while): Mosaic only
    # software-pipelines within a block, so every branch was a scheduling
    # barrier that serialized the S streams (measured: ns/pop flat in S).
    # Node and leaf work are both computed each iteration and selected by
    # the popped code's sign; multi-packet leaf chains continue via a
    # synthetic single-child stack entry.
    def body(c):
        it = c[0]
        sps = list(c[1:1 + S])
        dones = list(c[1 + S:1 + 2 * S]) if any_hit else [None] * S
        carries = [list(c[hit0 + 5 * s: hit0 + 5 * s + 5])
                   for s in range(S)]

        for s in range(S):
            stk_ref = stk_refs[s]
            cnt_ref = cnt_refs[s]
            sp = sps[s]
            alive = sp > 0
            if any_hit:
                alive = alive & jnp.logical_not(dones[s])
            top = jnp.maximum(sp, 1) - 1

            # ---- pop-consume the nearest remaining child ----
            ent = stk_ref[pl.ds(top * 8, 8), :]
            kr = ent[0:1]
            nr = ent[1:2]
            if "nosort" in ablate:
                # first valid lane instead of nearest (1 fewer reduce)
                lane = jnp.min(jnp.where(kr < INFV, iota128, 128))
            else:
                minv = jnp.min(kr, axis=1, keepdims=True)
                lane = jnp.min(jnp.where(kr <= minv, iota128, 128))
            cslot = jnp.minimum(lane // GROUP, 7)
            nri = jax.lax.bitcast_convert_type(nr, jnp.int32)
            code = pltpu.roll(nri, 8 - cslot, axis=1)[0, 0]
            code = jnp.where(alive, code, 0)
            if count_pops:
                csm_ref[0] = csm_ref[0] + (code != 0).astype(jnp.int32)
            rem = cnt_ref[top] - 1
            kr2 = jnp.where(alive & (iota128 == lane), INFV, kr)
            if "nostrip" not in ablate:
                stk_ref[pl.ds(top * 8, 8), :] = jnp.where(
                    rowio == 0, jnp.broadcast_to(kr2, (8, 128)), ent)
            cnt_ref[top] = jnp.where(alive, rem, rem + 1)
            sp = jnp.where(alive & (rem <= 0), sp - 1, sp)

            # ---- node path (masked out unless code > 0) ----
            t_cur = carries[s][0]
            if "nonode" in ablate:
                krow, nrow = jnp.full((1, 128), INFV), nr
            else:
                krow, nrow = node_step(s, jnp.maximum(code, 1), t_cur)
                krow = jnp.where(code > 0, krow, INFV)

            # ---- leaf path (selected only when code < 0) ----
            is_leaf = code < 0
            if "noleaf" in ablate:
                is_last = jnp.bool_(True)
            else:
                lcarry, is_last = leaf_fold(s, jnp.minimum(code, -1),
                                            tuple(carries[s]))
                for k in range(5):
                    carries[s][k] = jnp.where(is_leaf, lcarry[k],
                                              carries[s][k])

            # ---- one push: node children or the leaf continuation ----
            nhit = jnp.sum((krow < INFV).astype(jnp.int32))
            node_push = (code > 0) & (nhit > 0)
            cont_push = is_leaf & jnp.logical_not(is_last)
            do = node_push | cont_push
            cont_nrow = jax.lax.bitcast_convert_type(
                jnp.where(iota128 == 120, code - 1, jnp.int32(0)),
                jnp.float32)
            cont_krow = jnp.where(iota128 == 0, jnp.float32(0.0), INFV)
            ekrow = jnp.where(node_push, krow, cont_krow)
            enrow = jnp.where(node_push, nrow, cont_nrow)
            idx = jnp.where(do, sp, stack_size - 1)
            stk_ref[pl.ds(idx * 8, 8), :] = make_entry(ekrow, enrow)
            cnt_ref[idx] = jnp.where(node_push, nhit, 1)
            sps[s] = jnp.where(do, sp + 1, sp)

            if any_hit:
                r = ray_s[s]
                done_now = jnp.min(
                    jnp.where(r["tmax"] < r["tmin"], 1,
                              (carries[s][3] >= 0.0).astype(jnp.int32))
                ) > 0
                dones[s] = dones[s] | done_now

        out = [it + 1] + sps
        if any_hit:
            out += dones
        for s in range(S):
            out += carries[s]
        return tuple(out)

    fin = jax.lax.while_loop(cond, body, init)
    for s in range(S):
        t_b, u_b, v_b, p_b, g_b = fin[hit0 + 5 * s: hit0 + 5 * s + 5]
        lo = s * P
        t_ref[lo:lo + P, :] = t_b
        u_ref[lo:lo + P, :] = u_b
        v_ref[lo:lo + P, :] = v_b
        prim_ref[lo:lo + P, :] = p_b
        geom_ref[lo:lo + P, :] = g_b
    if count_pops:
        cout_ref[:] = jnp.full((8, 128), csm_ref[0], jnp.int32)


def _pair_tile(x):
    """(N,) ray component -> (N/16, 128) pair rows: lane 16c + r = ray r
    of the row's 16-ray group, replicated across the 8 slots c."""
    n = x.shape[0]
    g = x.reshape(n // GROUP, 1, GROUP)
    return jnp.broadcast_to(g, (n // GROUP, 128 // GROUP, GROUP)).reshape(
        n // GROUP, 128)


def _unpair(x, n):
    return x[:, :GROUP].reshape(-1)[:n]


def traverse_pair(dev, rays, any_hit=False, tile_rays=TILE_RAYS,
                  streams=STREAMS, interpret=False, count_pops=False,
                  ablate=()):
    """Pair-kernel traversal; same contract as api.traverse. The device
    dict must carry pair tables (bvh_to_device adds them for
    arity=8/Tri8 BVHs)."""
    B = rays["org"].shape[0]
    comp = [rays["inv_dir"][:, i] for i in range(3)]
    comp += [rays["org"][:, i] for i in range(3)]
    comp += [rays["dir"][:, i] for i in range(3)]
    comp += [rays["tmin"], rays["tmax"]]
    outs = _run(dev, comp, B, any_hit, tile_rays, streams, interpret,
                count_pops, ablate)
    t, u, v, p, g = outs[:5]
    t = jnp.where(p < 0, rays["tmax"], t)
    res = {"t": t, "u": u, "v": v, "prim_id": p, "geom_id": g}
    if count_pops:
        res["pops"] = outs[5]
    return res


def traverse_pair_components(dev, org, dirv, inv_d, inv_o, tmin, tmax,
                             any_hit=False, tile_rays=TILE_RAYS,
                             streams=STREAMS, interpret=False):
    """Component-tuple variant (integrator-facing): (R, 128) tiles in,
    hit dict of (R, 128) arrays out."""
    shape = tmin.shape
    comp = [c.reshape(-1) for c in inv_d]
    comp += [c.reshape(-1) for c in org]
    comp += [c.reshape(-1) for c in dirv]
    comp += [tmin.reshape(-1), tmax.reshape(-1)]
    B = comp[0].shape[0]
    outs = _run(dev, comp, B, any_hit, tile_rays, streams, interpret,
                False)
    t, u, v, p, g = [o.reshape(shape) for o in outs[:5]]
    t = jnp.where(p < 0, tmax, t)
    return {"t": t, "u": u, "v": v, "prim_id": p, "geom_id": g}


def _run(dev, comp, B, any_hit, tile_rays, streams, interpret,
         count_pops, ablate=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from rodent_tpu.traversal.api import BvhMeta

    interpret = interpret or jax.default_backend() != "tpu"
    pair_nodes = dev["pair_nodes"]
    pair_tris = dev["pair_tris"]
    meta = dev.get("meta")
    stack_size = (max(meta.shared_stack + 2, 16)
                  if isinstance(meta, BvhMeta) else 64)

    block_rays = tile_rays * streams
    nt = -(-B // block_rays)
    pad = nt * block_rays - B

    def prep(x, fill):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return _pair_tile(x)

    rows = [prep(c, -1.0 if i == 10 else 0.0) for i, c in enumerate(comp)]
    packed = jnp.stack(rows)                 # (11, nt*S*P, 128)
    P = block_rays // GROUP                  # pair rows per grid step

    kern = functools.partial(_kernel, any_hit=any_hit,
                             stack_size=stack_size, streams=streams,
                             count_pops=count_pops, ablate=tuple(ablate))

    out_shapes = [jax.ShapeDtypeStruct((nt * P, 128), jnp.float32)
                  for _ in range(5)]
    out_specs = [pl.BlockSpec((P, 128), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 5
    if count_pops:
        out_shapes.append(jax.ShapeDtypeStruct((nt * 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    def full(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    sel = jnp.asarray(_selection_matrix())
    nmask = jnp.asarray(_row_masks(8))
    tmask = jnp.asarray(_row_masks(16))

    outs = pl.pallas_call(
        kern,
        grid=(nt,),
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec((11, P, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  full(pair_nodes), full(pair_tris),
                  full(sel), full(nmask), full(tmask)],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((stack_size * 8, 128), jnp.float32)
                        for _ in range(streams)]
        + [pltpu.SMEM((stack_size,), jnp.int32)
           for _ in range(streams)]
        + ([pltpu.SMEM((1,), jnp.int32)] if count_pops else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(packed, pair_nodes, pair_tris, sel, nmask, tmask)

    t = _unpair(outs[0], B)
    u = _unpair(outs[1], B)
    v = _unpair(outs[2], B)
    p = _unpair(outs[3], B)
    g = _unpair(outs[4], B)
    pi = jnp.where(p < 0, jnp.int32(-1), p.astype(jnp.int32))
    gi = jnp.where(p < 0, jnp.int32(-1), g.astype(jnp.int32))
    res = [t, u, v, pi, gi]
    if count_pops:
        res.append(outs[5][::8, 0])
    return res
