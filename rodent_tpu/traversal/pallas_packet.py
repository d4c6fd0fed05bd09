"""Pallas shared-stack packet traversal — the VMEM-resident fast path.

The reference's packet kernel maps one ray per SIMD lane with a stack
shared by the packet (cpu_traverse_hybrid_helper,
src/traversal/mapping_cpu.impala:259-384). The TPU generalization: one
Pallas grid step owns a TILE of TR*128 rays and ONE traversal stack in
SMEM; the whole BVH lives in VMEM (v5e has ~128 MB VMEM with
vmem_limit_bytes raised — measured), so a node visit is a scalar-indexed
row load + full-tile VPU slab tests, with zero HBM gathers in the loop:

  pop code (scalar, SMEM)
    node: load row, test 8 children against the tile, reduce per child
          (any-hit + min entry), push hit children sorted near-first
    leaf: load Tri4 packet row, Moller-Trumbote 4 lanes vs the tile,
          fold best hits; push next packet code unless last

Shared-stack trade-off (same as the reference's packet mode): the tile
visits the UNION of its rays' node sets, so coherence matters — pair with
traversal.sorting for incoherent loads. Child ordering uses the tile-min
entry distance as the scalar sort key (sorting network, scalar regs).

Semantics identical to traversal.api.traverse / tiled.traverse_components
(cross-checked in tests via interpret mode on CPU and on-device vs the
XLA path).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .api import _SORT_NETWORKS

TILE_ROWS = 16           # rays per tile = TILE_ROWS * 128
# measured on the hall-260K primary workload (1M cone-sorted rays, v5e,
# Tri8 leaf packets + SBVH lt=12): rows 16: 50.7 | 32: 55.4 | 48: 49.1 |
# 64: 49.5 Mrays/s. Cost model (fit from the sweep): per-pop =
# ~600 ns fixed + ~18.6 ns x rows; pops/tile 44/62/78/92. The fixed part
# is the pop's own code (scalar+small-vector VLIW packing), NOT extracts,
# sort, branches, or overlappable latency — all probed individually
# (experiments/probe_*.py, ablate_packet.py; see ROADMAP).
# Round-2 kernel history on this workload: 24.5 (round-1 kernel, SBVH
# tree) -> 30.0 (Tri8 leaf packets, leaf_threshold 12) -> 36.2 (one
# shared cross-lane key reduction instead of 8 per-child full reduces)
# -> 36.8 (octant-pure tile specialization) -> 49.5 (cone-aware ray
# sort) -> 55.4 (tile_rows 64 -> 32 re-sweep under the new sort)
# -> 58.2 harness / 65.1 bench.py (org9-major sort key; also ao 1.8 ->
# 2.8 with any-hit done-ray deactivation, bounces 2.75 -> 3.3).
# Rejected by measurement: pops>1 sequential AND phased (out-of-order
# expansion/stash overhead), direct scalar VMEM reads (no effect),
# row-frustum node tests (push-set inflation; re-measured under the
# cone sort: rows=16 primary 32.1 vs 48.9 — pops 44 -> 103 still
# drowns the ~5x op saving), deferred hit attributes (XLA gather
# post-pass ~290 ms), SAME-tile stream interleaving (v3; chains do not
# overlap).
# Round 3: CROSS-tile interleaving (multi=N independent tiles per grid
# step, one fused loop — _kernel_multi) packs the ~600 ns fixed part
# (scalar/small-vector issue) against the other tile's full-tile vector
# work. Round 4's controlled interleaved sweep (median-of-5 blocks,
# results_tpu_r4.txt) OVERTURNED the round-3 single-run "+16% primary"
# claim: on primary, 32x1 / 24x1 / 40x1 / 32x2 tie at the top and 16x2
# costs ~5%, so primary callers pass rows=32, multi=1 (bench.py races
# 32x1 vs 24x1). On ao/bounces 16x2 IS the measured winner (2.68/3.19
# vs 32x1's 2.52/2.68) and narrow-deep tiles (4xN, 8xN) lose to
# pop-count inflation at every depth. Module defaults stay 16x2 — the
# incoherent-distribution winner — and coherent paths override.
STACK = 64
POPS = 1        # stack entries retired per loop iteration (see _kernel)
SCALAR_READS = False  # direct scalar VMEM loads (1 row/line) vs row loads
FRUSTUM = False  # row-frustum node tests (conservative, ~5x fewer ops)
LEAF_CHAIN = 1   # Tri packets consumed per leaf pop (chained leaves)
MULTI = 2        # independent tiles per grid step (interleaved pop chains)
PREFETCH = True  # exact next-pop DMA prefetch in the HBM modes (below)
CARRY_TOP = False  # round-5 body: next pop in the while carry (_kernel_ct).
# Measured (measure_ct.py, results_tpu_r5.txt): ct-fold 32x1 71.2 vs
# legacy 32x1 67.0 (+6%), tie at 24x1 — primary/coherent callers pass
# carry_top=True, rows=32. Default stays False because carry_top demotes
# multi, and 16x2 legacy remains the measured ao/bounces winner.
SELECT = "fold"  # carry-top child selection: "fold" (min-fold) | "sort"
# ("sort" = exact near-order pushes: measured no better — slot-order
# sibling pushes inflate pops within noise)
FMA_SLAB = True  # carry-top slab form: b*inv + inv_org (clamped inv).
# A/B flat: Mosaic/LLO fuses mul+add either way (results_tpu_r5.txt)
_F32_MAX = 3.402823466e38  # python float: jnp scalars would be captured consts
# FMA-slab inv_dir clamp (carry-top body): safe_rcp's +-FLT_MAX would let
# b*inv overflow to inf and the fused slab form produce inf + (-inf) =
# NaN for axis-parallel rays; +-2^62 keeps every product finite for
# |bound| < 3e20 while still dwarfing any real t interval, so slab
# accept/reject decisions match the unfused form (ULP-level t
# differences only at grazing boundaries).
_INV_CAP = float(2.0 ** 62)


def _pf_helpers(pref_ref, tris_ref, tri_buf, tri_sem,
                nodes_ref, node_buf, node_sem,
                node_rpl, tris_hbm, nodes_hbm, tri_lpr=1):
    """Exact next-pop DMA prefetch for the HBM modes (fixes the blocking
    `start(); wait()` serialization of tris_hbm / nodes_hbm pops).

    Every pop can compute precisely which stack entry pops next — a
    leaf's continuation packet, the first pushed child, or the stack
    peek — so the next row's DMA STARTS before the current row's
    intersection math and is WAITED only at the next pop: the ~1-2 us
    HBM latency hides behind the tile-wide vector tests instead of
    serializing with them (the role warp parallelism plays for the
    reference's GPU fetches, /root/reference/src/traversal/
    mapping_gpu.impala:18-70). Because the prediction is exact, each
    table keeps at most ONE outstanding copy: one DMA semaphore + a
    2-line VMEM buffer suffice. A mismatched pending copy (possible
    only after an any-hit early exit) is drained before reuse, and
    pf_drain retires anything still in flight at loop exit, so every
    started copy is waited exactly once.

    pref_ref (SMEM, 4 scalars): [0] pending tri code (negative leaf
    ref; 0 = none), [1] tri buffer slot holding the current row,
    [2] pending node line + 1 (0 = none), [3] node slot of the current
    line.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    zero = jnp.int32(0)

    def tri_cp(row, slot):
        # one async copy per Tri row, even multi-line (Tri16 = 2 lines)
        return pltpu.make_async_copy(
            tris_ref.at[pl.ds(row * tri_lpr, tri_lpr)],
            tri_buf.at[pl.ds(slot * tri_lpr, tri_lpr)], tri_sem)

    def node_cp(line, slot):
        return pltpu.make_async_copy(nodes_ref.at[pl.ds(line, 1)],
                                     node_buf.at[pl.ds(slot, 1)],
                                     node_sem)

    def pf_init():
        for i in range(4):
            pref_ref[i] = zero

    def pf_predict(nxt):
        """Issue prefetches for the exact next pop `nxt` (0 = none)."""
        if tris_hbm:
            want = jnp.where(nxt < 0, nxt, zero)
            pend = pref_ref[0]
            fresh = pend != want

            @pl.when((pend != 0) & fresh)
            def _():
                tri_cp(zero, zero).wait()  # drain a stale prefetch

            @pl.when((want != 0) & fresh)
            def _():
                tri_cp(~want, 1 - pref_ref[1]).start()
            pref_ref[0] = want
        if nodes_hbm:
            want = jnp.where(nxt > 0, (nxt - 1) // node_rpl + 1, zero)
            pend = pref_ref[2]
            fresh = pend != want

            @pl.when((pend != 0) & fresh)
            def _():
                node_cp(zero, zero).wait()

            @pl.when((want != 0) & fresh)
            def _():
                node_cp(want - 1, 1 - pref_ref[3]).start()
            pref_ref[2] = want

    def pf_tri_row(code):
        """Tri row for the current pop; returns its buffer slot."""
        cur = pref_ref[1]
        pend = pref_ref[0]
        hit = pend == code
        slot = jnp.where(hit, 1 - cur, cur)

        @pl.when((pend != 0) & jnp.logical_not(hit))
        def _():
            tri_cp(zero, zero).wait()

        @pl.when(jnp.logical_not(hit))
        def _():
            tri_cp(~code, cur).start()
        tri_cp(zero, zero).wait()
        pref_ref[0] = zero
        pref_ref[1] = slot
        return slot

    def pf_node_row(code):
        """Node line for the current pop; returns its buffer slot."""
        line = (code - 1) // node_rpl
        cur = pref_ref[3]
        pend = pref_ref[2]
        hit = pend == line + 1
        slot = jnp.where(hit, 1 - cur, cur)

        @pl.when((pend != 0) & jnp.logical_not(hit))
        def _():
            node_cp(zero, zero).wait()

        @pl.when(jnp.logical_not(hit))
        def _():
            node_cp(line, cur).start()
        node_cp(zero, zero).wait()
        pref_ref[2] = zero
        pref_ref[3] = slot
        return slot

    def pf_drain():
        if tris_hbm:
            @pl.when(pref_ref[0] != 0)
            def _():
                tri_cp(zero, zero).wait()
        if nodes_hbm:
            @pl.when(pref_ref[2] != 0)
            def _():
                node_cp(zero, zero).wait()

    return pf_init, pf_predict, pf_tri_row, pf_node_row, pf_drain


def _next_top(childs, peek):
    """The entry the next pop will retire: pushes put the first nonzero
    child on top; an empty push set exposes the pre-push stack peek."""
    nxt = peek
    for c in reversed(range(len(childs))):
        nxt = jnp.where(childs[c] != 0, childs[c], nxt)
    return nxt


# ---- per-pop math shared by _kernel and _kernel_multi ----
# Pure value-level functions (no refs): both kernel bodies trace the
# SAME ops through these, so the tile math cannot drift between the
# single-tile and multi-tile kernels (the control-flow/DMA structure
# around them legitimately differs and stays per-kernel).

def _slab_parts(rd, arity, pos, org, inv_d, tmin, t_cur, pure, io=None):
    """Per-child slab tests of one node row against the whole tile.
    Returns the per-child (1, 128) sublane-reduced min-entry keys
    (+inf where no ray hits the child). pure=True uses the per-tile
    scalar near/far select (the reference's ordered_bbox trick,
    intersection.impala:194-202, lifted to tile granularity).

    io != None switches to the reference's fused form b*inv + inv_org
    (intersection.impala:194-196): one FMA per bound instead of
    sub + mul — 6 fewer (R, 128) ops per child. The caller must pass
    inv_d CLAMPED to +-2^62 (see _INV_CAP) and io = -(org * inv_d):
    with the clamp no product overflows to inf for sane scene
    coordinates, so the fused form cannot produce (inf - inf) = NaN —
    the hazard that made api._node_test choose the unfused form under
    safe_rcp's +-FLT_MAX."""
    parts = []
    for c in range(arity):
        if io is not None:
            if pure:
                bs = [jnp.where(pos[k], rd((2 * k) * arity + c),
                                rd((2 * k + 1) * arity + c))
                      for k in range(3)]
                bf = [jnp.where(pos[k], rd((2 * k + 1) * arity + c),
                                rd((2 * k) * arity + c))
                      for k in range(3)]
                ent = jnp.maximum(
                    jnp.maximum(bs[0] * inv_d[0] + io[0],
                                bs[1] * inv_d[1] + io[1]),
                    jnp.maximum(bs[2] * inv_d[2] + io[2], tmin))
                ext = jnp.minimum(
                    jnp.minimum(bf[0] * inv_d[0] + io[0],
                                bf[1] * inv_d[1] + io[1]),
                    jnp.minimum(bf[2] * inv_d[2] + io[2], t_cur))
            else:
                tx0 = rd(0 * arity + c) * inv_d[0] + io[0]
                tx1 = rd(1 * arity + c) * inv_d[0] + io[0]
                ty0 = rd(2 * arity + c) * inv_d[1] + io[1]
                ty1 = rd(3 * arity + c) * inv_d[1] + io[1]
                tz0 = rd(4 * arity + c) * inv_d[2] + io[2]
                tz1 = rd(5 * arity + c) * inv_d[2] + io[2]
                ent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                              jnp.minimum(ty0, ty1)),
                                  jnp.maximum(jnp.minimum(tz0, tz1), tmin))
                ext = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                              jnp.maximum(ty0, ty1)),
                                  jnp.minimum(jnp.maximum(tz0, tz1),
                                              t_cur))
            parts.append(jnp.min(jnp.where(ent <= ext, ent, _F32_MAX),
                                 axis=0, keepdims=True))
            continue
        # (bound - org) * inv_dir: NaN-free for axis-aligned rays
        # (see api._node_test)
        if pure:
            bs = [jnp.where(pos[k], rd((2 * k) * arity + c),
                            rd((2 * k + 1) * arity + c))
                  for k in range(3)]
            bf = [jnp.where(pos[k], rd((2 * k + 1) * arity + c),
                            rd((2 * k) * arity + c))
                  for k in range(3)]
            ent = jnp.maximum(
                jnp.maximum((bs[0] - org[0]) * inv_d[0],
                            (bs[1] - org[1]) * inv_d[1]),
                jnp.maximum((bs[2] - org[2]) * inv_d[2], tmin))
            ext = jnp.minimum(
                jnp.minimum((bf[0] - org[0]) * inv_d[0],
                            (bf[1] - org[1]) * inv_d[1]),
                jnp.minimum((bf[2] - org[2]) * inv_d[2], t_cur))
        else:
            tx0 = (rd(0 * arity + c) - org[0]) * inv_d[0]
            tx1 = (rd(1 * arity + c) - org[0]) * inv_d[0]
            ty0 = (rd(2 * arity + c) - org[1]) * inv_d[1]
            ty1 = (rd(3 * arity + c) - org[1]) * inv_d[1]
            tz0 = (rd(4 * arity + c) - org[2]) * inv_d[2]
            tz1 = (rd(5 * arity + c) - org[2]) * inv_d[2]
            ent = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                          jnp.minimum(ty0, ty1)),
                              jnp.maximum(jnp.minimum(tz0, tz1), tmin))
            ext = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.minimum(jnp.maximum(tz0, tz1), t_cur))
        # sublane-only partial reduce (cheap); the expensive cross-lane
        # phase is shared across all children in _finalize_children
        parts.append(jnp.min(jnp.where(ent <= ext, ent, _F32_MAX),
                             axis=0, keepdims=True))
    return parts


def _finalize_children(parts, childs, arity, sort):
    """One cross-lane reduction for all `arity` children ((A, 128) ->
    (A,) tile-min entry distances), invalid-child masking, and the
    near-ordered sort network (sort=False for any-hit: order is
    irrelevant once any hit terminates the ray)."""
    keys8 = jnp.min(jnp.concatenate(parts, axis=0), axis=1)
    keys = []
    childs = list(childs)
    for c in range(arity):
        key = keys8[c]
        valid = (childs[c] != 0) & (key < _F32_MAX)
        keys.append(jnp.where(valid, key, _F32_MAX))
        childs[c] = jnp.where(valid, childs[c], 0)
    if sort:
        _sort_children(keys, childs, arity)
    return childs


def _sort_children(keys, childs, arity):
    """In-place branchless sort network over (key, child) scalars."""
    for i, j in _SORT_NETWORKS[arity]:
        swap = keys[i] > keys[j]
        keys[i], keys[j] = (jnp.where(swap, keys[j], keys[i]),
                            jnp.where(swap, keys[i], keys[j]))
        childs[i], childs[j] = (jnp.where(swap, childs[j], childs[i]),
                                jnp.where(swap, childs[i], childs[j]))


def _mt_lanes(rd, rdi, m, org, dirv, tmin, t_test, carry):
    """The tile-wide Möller–Trumbore loop over one Tri packet's m lanes:
    sign-trick division deferral exactly as intersection.impala:164-192
    (uu/vv/tt are compared in the det-scaled domain; one reciprocal per
    accepted lane). Returns (carry', is_last) where is_last is the
    sentinel sign bit of the final lane (Tri4 sentinel convention,
    mapping_cpu.impala:3-10)."""
    t_cur, u_b, v_b, p_b, g_b = carry
    is_last = jnp.int32(0)
    for lane in range(m):
        v0 = [rd(k * m + lane) for k in range(3)]
        e1 = [rd((3 + k) * m + lane) for k in range(3)]
        e2 = [rd((6 + k) * m + lane) for k in range(3)]
        nn = [rd((9 + k) * m + lane) for k in range(3)]
        pid = rdi(12 * m + lane)
        gid = rdi(13 * m + lane)
        cx, cy, cz = v0[0] - org[0], v0[1] - org[1], v0[2] - org[2]
        rx = dirv[1] * cz - dirv[2] * cy
        ry = dirv[2] * cx - dirv[0] * cz
        rz = dirv[0] * cy - dirv[1] * cx
        det = nn[0] * dirv[0] + nn[1] * dirv[1] + nn[2] * dirv[2]
        abs_det = jnp.abs(det)
        sign = jnp.where(det < 0, jnp.float32(-1.0), jnp.float32(1.0))
        uu = (rx * e2[0] + ry * e2[1] + rz * e2[2]) * sign
        vv = (rx * e1[0] + ry * e1[1] + rz * e1[2]) * sign
        tt = (cx * nn[0] + cy * nn[1] + cz * nn[2]) * sign
        ok = ((uu >= 0.0) & (vv >= 0.0) & (uu + vv <= abs_det)
              & (abs_det != 0.0)
              & (tt >= abs_det * tmin) & (tt <= abs_det * t_test)
              & (pid != -1))
        inv_det = 1.0 / jnp.where(abs_det != 0.0, abs_det, 1.0)
        tv = tt * inv_det
        upd = ok & (tv < t_cur)
        t_cur = jnp.where(upd, tv, t_cur)
        u_b = jnp.where(upd, uu * inv_det, u_b)
        v_b = jnp.where(upd, vv * inv_det, v_b)
        p_b = jnp.where(upd, pid & 0x7FFFFFFF, p_b)
        g_b = jnp.where(upd, gid, g_b)
        if lane == m - 1:
            is_last = pid < 0
    return (t_cur, u_b, v_b, p_b, g_b), is_last


def _kernel(rays_ref, nodes_ref, tris_ref,
            t_ref, u_ref, v_ref, prim_ref, geom_ref,
            *rest, arity, m, any_hit, stack_size,
            node_rpl=2, tri_rpl=2, tri_lpr=1, pops=1, scalar_reads=False,
            count_pops=False, ablate=(), frustum=False, tris_hbm=False,
            nodes_hbm=False, leaf_chain=1, prefetch=False):
    rest = list(rest)
    if prefetch:
        # exact next-pop prefetch state (SMEM): [0] pending tri code
        # (negative leaf ref; 0 = none), [1] tri buffer slot holding the
        # current row, [2] pending node line + 1 (0 = none), [3] node
        # buffer slot holding the current line. See _pf_helpers.
        pref_ref = rest.pop()
    if nodes_hbm:
        # giga-scene mode (>12M tris: the node table itself exceeds
        # VMEM): nodes_ref lives in HBM; node pops DMA one packed line
        # (2 rows) into this VMEM line, like the leaf path below
        node_buf, node_sem = rest[-2:]
        rest = rest[:-2]
    if tris_hbm:
        # big-scene mode: tris_ref lives in HBM (ANY); leaf pops DMA one
        # Tri row into this VMEM line (+ its completion semaphore)
        tri_buf, tri_sem = rest[-2:]
        rest = rest[:-2]
    if count_pops:
        cnt_ref, stack_ref, cnt_sm = rest
    else:
        (stack_ref,) = rest
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if prefetch:
        pf_init, pf_predict, pf_tri_row, pf_node_row, pf_drain = \
            _pf_helpers(pref_ref, tris_ref,
                        tri_buf if tris_hbm else None,
                        tri_sem if tris_hbm else None,
                        nodes_ref,
                        node_buf if nodes_hbm else None,
                        node_sem if nodes_hbm else None,
                        node_rpl, tris_hbm, nodes_hbm, tri_lpr)

    def load_row(ref, idx, rpl, lpr=1):
        """Returns (f32_reader, i32_reader) closures for lane j of row
        idx. scalar_reads=True (requires 1 row/line) issues direct scalar
        VMEM loads — avoiding the vector-load + per-lane extract, which
        costs a vector->scalar transfer per field; otherwise loads the
        whole line once (rpl rows/line; dynamic lane offsets cannot
        lower, dynamic rotate can). lpr > 1: the row spans lpr
        consecutive lines (Tri16); lane j lives at [j//128, j%128]."""
        if lpr > 1:
            row = ref[pl.ds(idx * lpr, lpr), :]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            return ((lambda j: row[j // 128, j % 128]),
                    (lambda j: row_i[j // 128, j % 128]))
        if scalar_reads and rpl == 1:
            def rd(j):
                return ref[idx, j]

            def rdi(j):
                # Mosaic has no scalar bitcast: reinterpret via a (1, 1)
                # slice bitcast
                v = jax.lax.bitcast_convert_type(ref[pl.ds(idx, 1),
                                                     pl.ds(j, 1)],
                                                 jnp.int32)
                return v[0, 0]
            return rd, rdi
        if rpl == 1:
            row = ref[pl.ds(idx, 1), :]
        else:
            row = ref[pl.ds(idx // 2, 1), :]
            row = pltpu.roll(row, -(idx % 2) * 64, axis=1)
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
        return (lambda j: row[0, j]), (lambda j: row_i[0, j])

    inv_d = [rays_ref[i] for i in range(3)]        # (TR, 128) each
    org = [rays_ref[3 + i] for i in range(3)]
    dirv = [rays_ref[6 + i] for i in range(3)]
    tmin = rays_ref[9]
    tmax = rays_ref[10]

    stack_ref[0] = jnp.int32(1)  # root (1-based node ref)
    if prefetch:
        pf_init()
    if count_pops:
        cnt_sm[0] = jnp.int32(0)
        cnt_sm[1] = jnp.int32(0)

    # per-tile octant purity: after the Morton+octant sort almost every
    # tile shares direction signs on every axis, so the near/far bound of
    # each slab is a per-tile SCALAR select instead of per-ray vector
    # min/max (the reference's ordered_bbox trick, intersection.impala
    # :194-202, lifted to tile granularity)
    pos = [jnp.min((inv_d[k] >= 0.0).astype(jnp.int32)) == 1
           for k in range(3)]
    neg = [jnp.min((inv_d[k] < 0.0).astype(jnp.int32)) == 1
           for k in range(3)]
    tile_pure = (pos[0] | neg[0]) & (pos[1] | neg[1]) & (pos[2] | neg[2])

    # ---- row-frustum precompute (pure tiles) ----
    # The kernel is vector-ISSUE-bound (measured: ~3.5 ns per (R,128)
    # op; a full per-ray x per-child slab test is ~176 ops = ~620 ns of
    # the ~1.5 us/pop). The frustum path tests each child against 128-ray
    # ROW INTERVALS instead (child dim in lanes), which is conservative
    # (a superset of the per-ray any-hit push set, so hits stay exact —
    # leaves do the exact test) but ~5x fewer vector ops. Sign-mirrored
    # coordinates make all three axes positive-direction:
    #   org' = sign*org, inv' = |inv_d|, bounds' = sign-swapped.
    if frustum:
        o2 = [jnp.where(pos[k], org[k], -org[k]) for k in range(3)]
        i2 = [jnp.abs(inv_d[k]) for k in range(3)]
        o2_lo = [jnp.min(o2[k], axis=1, keepdims=True) for k in range(3)]
        o2_hi = [jnp.max(o2[k], axis=1, keepdims=True) for k in range(3)]
        i2_lo = [jnp.min(i2[k], axis=1, keepdims=True) for k in range(3)]
        i2_hi = [jnp.max(i2[k], axis=1, keepdims=True) for k in range(3)]
        tmin_row = jnp.min(tmin, axis=1, keepdims=True)

    def node_step_frustum(code, t_cur):
        """Conservative child test: (row-frustum x child) interval slab
        test, lanes = children. Returns childs (scalar list) with the
        same contract as node_step."""
        if node_rpl == 1:
            row = nodes_ref[pl.ds(code - 1, 1), :]
        else:
            row = nodes_ref[pl.ds((code - 1) // 2, 1), :]
            row = pltpu.roll(row, -((code - 1) % 2) * 64, axis=1)
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
        t_ub = jnp.max(t_cur, axis=1, keepdims=True)       # (R, 1)
        ent = None
        ext = None
        for k in range(3):
            lo = pltpu.roll(row, (128 - 16 * k) % 128, axis=1)  # lanes 0-7
            hi = pltpu.roll(row, 128 - 16 * k - 8, axis=1)
            b_n = jnp.where(pos[k], lo, -hi)               # (1, 128)
            b_f = jnp.where(pos[k], hi, -lo)
            a = b_n - o2_hi[k]                             # (R, 128)
            e_k = a * jnp.where(a >= 0.0, i2_lo[k], i2_hi[k])
            b = b_f - o2_lo[k]
            x_k = b * jnp.where(b >= 0.0, i2_hi[k], i2_lo[k])
            ent = e_k if ent is None else jnp.maximum(ent, e_k)
            ext = x_k if ext is None else jnp.minimum(ext, x_k)
        ent = jnp.maximum(ent, tmin_row)
        ext = jnp.minimum(ext, t_ub)
        # per-child key: min over row-frusta of the conservative entry
        keys8v = jnp.min(jnp.where(ent <= ext, ent, _F32_MAX),
                         axis=0, keepdims=True)            # (1, 128)
        keys = []
        childs = []
        for c in range(arity):
            key = keys8v[0, c]
            child = row_i[0, 6 * arity + c]
            valid = (child != 0) & (key < _F32_MAX)
            keys.append(jnp.where(valid, key, _F32_MAX))
            childs.append(jnp.where(valid, child, 0))
        if not any_hit and "nosort" not in ablate:
            _sort_children(keys, childs, arity)
        return childs

    def load_node_row(code):
        """Node-row readers; DMA from HBM in giga-scene mode."""
        if nodes_hbm:
            if prefetch:
                slot = pf_node_row(code)
            else:
                cp = pltpu.make_async_copy(
                    nodes_ref.at[pl.ds((code - 1) // node_rpl, 1)],
                    node_buf.at[pl.ds(0, 1)], node_sem)
                cp.start()
                cp.wait()
                slot = 0
            row = node_buf[pl.ds(slot, 1), :]
            if node_rpl == 2:
                row = pltpu.roll(row, -((code - 1) % 2) * 64, axis=1)
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            return (lambda j: row[0, j]), (lambda j: row_i[0, j])
        return load_row(nodes_ref, code - 1, node_rpl)

    def node_step(code, t_cur, pure, peek=None):
        # rows are packed two-per-128-lane line (VMEM pads the last dim
        # to 128 lanes, so 56-wide rows would waste 2.3x VMEM)
        rd, rdi = load_node_row(code)
        if "nonodetest" in ablate:  # ablation: skip the vector slab
            # tests — push every child unsorted (correct hits, inflated
            # pop count; ns/pop isolates the slab-test vector cost)
            return [rdi(6 * arity + c) for c in range(arity)]
        parts = _slab_parts(rd, arity, pos, org, inv_d, tmin, t_cur, pure)
        childs = _finalize_children(
            parts, [rdi(6 * arity + c) for c in range(arity)], arity,
            sort=not any_hit and "nosort" not in ablate)
        if prefetch:
            # the next pop is now exactly known: start its row's DMA so
            # the HBM latency overlaps the scalar push work + next pop
            pf_predict(_next_top(childs, peek))
        # near-sorted child list; pushes happen in body() after all popped
        # entries are processed so the per-entry reductions overlap
        return childs

    def node_vec(code, t_cur, pure):
        """Issue-only phase of node_step for the phased (pops>1) body:
        same slab tests, but returns the un-reduced per-child key parts
        (A, 128) plus the raw int row — reduction, extraction, sorting
        and pushing happen in phase 2 so several pops' latency chains
        overlap."""
        if node_rpl == 1:
            row = nodes_ref[pl.ds(code - 1, 1), :]
        else:
            row = nodes_ref[pl.ds((code - 1) // 2, 1), :]
            row = pltpu.roll(row, -((code - 1) % 2) * 64, axis=1)
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)

        def rd(j):
            return row[0, j]
        parts = _slab_parts(rd, arity, pos, org, inv_d, tmin, t_cur, pure)
        return jnp.concatenate(parts, axis=0), row_i

    def _leaf_one(code, carry, t_test=None, peek=None):
        t_cur, u_b, v_b, p_b, g_b = carry
        if t_test is None:
            t_test = t_cur
        if tris_hbm:
            if prefetch:
                slot = pf_tri_row(code)
            else:
                # DMA the Tri row HBM -> VMEM line (tri_rpl forced to 1);
                # blocking wait — the ~1-2 us latency replaces the XLA
                # path's per-ray row gathers, amortized over the whole
                # tile
                cp = pltpu.make_async_copy(
                    tris_ref.at[pl.ds((~code) * tri_lpr, tri_lpr)],
                    tri_buf.at[pl.ds(0, tri_lpr)], tri_sem)
                cp.start()
                cp.wait()
                slot = 0
            row = tri_buf[pl.ds(slot * tri_lpr, tri_lpr), :]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            rd, rdi = ((lambda j: row[j // 128, j % 128]),
                       (lambda j: row_i[j // 128, j % 128]))
        else:
            rd, rdi = load_row(tris_ref, ~code, tri_rpl, tri_lpr)
        if prefetch:
            # continuation is metadata-only: the next pop is known BEFORE
            # the lane tests, so its DMA flies during the MT math below
            cont_e = jnp.where(rdi(12 * m + m - 1) < 0, jnp.int32(0),
                               code - 1)
            pf_predict(jnp.where(cont_e != 0, cont_e, peek))
        if "noleaftest" in ablate:  # ablation: skip the vector MT tests
            # (wrong hits: misses everything; same pop schedule only for
            # workloads whose t_cur pruning doesn't change the node walk)
            cont_code = jnp.where(rdi(12 * m + m - 1) < 0, jnp.int32(0),
                                  code - 1)
            return carry, cont_code
        carry, is_last = _mt_lanes(rd, rdi, m, org, dirv, tmin, t_test,
                                   (t_cur, u_b, v_b, p_b, g_b))
        # continue multi-packet leaves: next packet's code is code-1
        cont_code = jnp.where(is_last, jnp.int32(0), code - 1)
        return carry, cont_code

    def leaf_step(code, carry, t_test=None, peek=None):
        """Consumes up to leaf_chain consecutive Tri packets of one leaf
        per pop: each chained packet saves the fixed per-pop overhead
        (~600 ns) that re-popping the continuation would cost; chains
        longer than leaf_chain still continue via the pushed code."""
        carry, cont = _leaf_one(code, carry, t_test, peek)
        for _ in range(leaf_chain - 1):
            carry, cont = jax.lax.cond(
                cont < 0,
                lambda args: _leaf_one(args[1], args[0], t_test, peek),
                lambda args: args,
                (carry, cont))
        return carry, cont

    def cond(c):
        sptr = c[0]
        if any_hit:
            return (sptr > 0) & jnp.logical_not(c[1])
        return sptr > 0

    zero = jnp.int32(0)

    def body(c):
        if any_hit:
            sptr, _, t_cur, u_b, v_b, p_b, g_b = c
        else:
            sptr, t_cur, u_b, v_b, p_b, g_b = c

        # pop up to `pops` entries up-front: their slab tests and the
        # vector->scalar key reductions are independent, so the hardware
        # overlaps them — the per-pop serial chain (test -> reduce ->
        # push -> next pop) is the measured bottleneck, not VPU capacity
        codes = []
        for _ in range(pops):
            valid = sptr > 0
            top = jnp.where(valid, sptr - 1, zero)
            code = jnp.where(valid, stack_ref[top], zero)
            codes.append(code)
            sptr = jnp.where(valid, top, sptr)
        if count_pops:
            # counter 0: ALL retired entries; counter 1: LEAF pops alone
            # (each is one Tri-row fetch; in tris_hbm mode, one HBM DMA) —
            # the node/leaf split is the attribution the big-scene
            # transport levers need. Both sum over every popped code so
            # pops>1 counts exactly (ADVICE r4 low).
            one, zro = jnp.int32(1), jnp.int32(0)
            for code in codes:
                cnt_sm[0] = cnt_sm[0] + jnp.where(code != 0, one, zro)
                cnt_sm[1] = cnt_sm[1] + jnp.where(code < 0, one, zro)

        # done-ray deactivation (any-hit): a ray that already has its
        # hit is tested at t=-inf from here on, so it stops contributing
        # to child push sets and the tile's node union collapses as rays
        # complete — the XLA paths' per-ray sptr=0 early-out in tile
        # form. Reported hits are untouched (updates test t_cur).
        if any_hit:
            t_test = jnp.where(p_b >= 0, jnp.float32(-_F32_MAX), t_cur)
        else:
            t_test = t_cur

        carry = (t_cur, u_b, v_b, p_b, g_b)
        no_push = [zero] * arity

        # stack peek below the popped entry: the next pop when the
        # current one pushes nothing (prefetch prediction input)
        peek = (jnp.where(sptr > 0, stack_ref[jnp.maximum(sptr - 1, zero)],
                          zero) if prefetch else None)

        if pops > 1:
            # PHASED expansion: per-pop cost is dominated by the ~600 ns
            # latency of the pop's dependent chain (row load -> slab ops
            # -> cross-lane reduce -> key extracts), not by VPU issue
            # (measured, ROADMAP round-2 session-2). The entries popped
            # together are already independent, so phase 1 ISSUES every
            # entry's vector work (stashing un-reduced (A,128) key parts)
            # and phase 2 does all reductions/extractions/sorts/pushes —
            # the latency chains fly concurrently instead of back-to-back.
            # Leaf folds use the pre-iteration carry and min-merge after
            # (first-wins on ties via strict <, identical to sequential).
            inf_parts = jnp.full((arity, 128), _F32_MAX, jnp.float32)
            zrow = jnp.zeros((1, 128), jnp.int32)
            stash = []
            for code in codes:
                def ph_node(_, code=code):
                    def pb(_):
                        return node_vec(code, t_test, True)

                    def mb(_):
                        return node_vec(code, t_test, False)

                    parts8, row_i = jax.lax.cond(tile_pure, pb, mb, None)
                    return carry + (parts8, row_i, zero)

                def ph_other(_, code=code):
                    def lb(_):
                        c2, cont = leaf_step(code, carry, t_test)
                        return c2 + (inf_parts, zrow, cont)

                    def sk(_):
                        return carry + (inf_parts, zrow, zero)
                    return jax.lax.cond(code < 0, lb, sk, None)

                stash.append(jax.lax.cond(code > 0, ph_node, ph_other,
                                          None))
            merged = stash[0][:5]
            for s_ in stash[1:]:
                sel = s_[0] < merged[0]
                merged = tuple(jnp.where(sel, s_[k], merged[k])
                               for k in range(5))
            carry = merged
            all_pushes = []
            for i, code in enumerate(codes):
                parts8, row_i, cont = stash[i][5], stash[i][6], stash[i][7]
                keys2 = jnp.min(parts8, axis=1, keepdims=True)  # (A, 1)
                keys = []
                childs = []
                for cx in range(arity):
                    key = keys2[cx, 0]
                    child = row_i[0, 6 * arity + cx]
                    ok = (child != 0) & (key < _F32_MAX)
                    keys.append(jnp.where(ok, key, _F32_MAX))
                    childs.append(jnp.where(ok, child, 0))
                if not any_hit and "nosort" not in ablate:
                    _sort_children(keys, childs, arity)
                childs[0] = jnp.where(code < 0, cont, childs[0])
                all_pushes.append(tuple(childs))
            for pushes in reversed(all_pushes):
                for r in range(arity - 1, -1, -1):
                    ok = pushes[r] != 0
                    stack_ref[jnp.where(ok, sptr,
                                        stack_size - 1)] = pushes[r]
                    sptr = sptr + jnp.where(ok, 1, 0)
            t2, u2, v2, p2, g2 = carry
            if any_hit:
                all_done = jnp.min(jnp.where(
                    tmax < tmin, 1,
                    (p2 >= 0).astype(jnp.int32))) > 0
                return (sptr, all_done, t2, u2, v2, p2, g2)
            return (sptr, t2, u2, v2, p2, g2)

        all_pushes = []
        for code in codes:
            def do_node(_, carry=carry, code=code):
                if "nopure" in ablate:
                    # ablation: drop the pure/mixed inner cond entirely
                    # (unordered slab test for every tile) — tests whether
                    # the nested big-branch cond costs more in spills than
                    # the ordered test saves in flops
                    return carry + tuple(node_step(code, t_test, False))

                def pure_body(_):
                    if frustum:
                        return node_step_frustum(code, t_test)
                    return node_step(code, t_test, True, peek)

                def mixed_body(_):
                    return node_step(code, t_test, False, peek)

                childs = jax.lax.cond(tile_pure, pure_body, mixed_body,
                                      None)
                return carry + tuple(childs)

            def do_other(_, carry=carry, code=code):
                def do_leaf(_):
                    c2, cont = leaf_step(code, carry, t_test, peek)
                    return c2 + (cont,) + tuple(no_push[1:])

                def do_skip(_):
                    return carry + tuple(no_push)

                if pops == 1:
                    # a popped code is never 0 when pops == 1 (the loop
                    # cond guarantees sptr > 0): skip the nested branch
                    return do_leaf(None)
                return jax.lax.cond(code < 0, do_leaf, do_skip, None)

            out = jax.lax.cond(code > 0, do_node, do_other, None)
            carry = out[:5]
            all_pushes.append(out[5:])

        # entry 0 was nearest: push later entries' children first so
        # entry 0's children end on top (slot stack_size-1 is a write-back
        # trash slot for masked pushes; stack_size is sized past the
        # tree's worst case in _call_kernel, so live entries never
        # reach it)
        for pushes in reversed(all_pushes):
            for r in range(arity - 1, -1, -1):
                ok = pushes[r] != 0
                stack_ref[jnp.where(ok, sptr, stack_size - 1)] = pushes[r]
                sptr = sptr + jnp.where(ok, 1, 0)

        t2, u2, v2, p2, g2 = carry
        if any_hit:
            all_done = jnp.min(jnp.where(tmax < tmin, 1,
                                         (p2 >= 0).astype(jnp.int32))) > 0
            return (sptr, all_done, t2, u2, v2, p2, g2)
        return (sptr, t2, u2, v2, p2, g2)

    init_hits = (tmax,
                 jnp.zeros_like(tmax),
                 jnp.zeros_like(tmax),
                 jnp.full(tmax.shape, -1, jnp.int32),
                 jnp.full(tmax.shape, -1, jnp.int32))
    # skip entirely-dead tiles cheaply: root still pops, tests all miss
    if any_hit:
        init = (jnp.int32(1), jnp.bool_(False)) + init_hits
    else:
        init = (jnp.int32(1),) + init_hits
    out = jax.lax.while_loop(cond, body, init)
    if prefetch:
        # an any-hit early exit can leave a predicted copy in flight:
        # retire it so every started DMA is waited exactly once
        pf_drain()
    t_b, u_b, v_b, p_b, g_b = out[-5:]
    t_ref[:] = t_b
    u_ref[:] = u_b
    v_ref[:] = v_b
    prim_ref[:] = p_b
    geom_ref[:] = g_b
    if count_pops:
        # row 0 of each tile block = total pops (the historical contract,
        # consumers read cnt[::8, 0]); row 1 = leaf pops
        cnt_ref[0:1] = jnp.full((1, 128), cnt_sm[0], jnp.int32)
        cnt_ref[1:2] = jnp.full((1, 128), cnt_sm[1], jnp.int32)
        cnt_ref[2:8] = jnp.full((6, 128), cnt_sm[0], jnp.int32)


def _kernel_ct(rays_ref, nodes_ref, tris_ref,
               t_ref, u_ref, v_ref, prim_ref, geom_ref,
               *rest, arity, m, any_hit, stack_size,
               node_rpl=2, tri_rpl=2, tri_lpr=1, count_pops=False,
               select="fold", fma_slab=True, tris_hbm=False,
               nodes_hbm=False, prefetch=False):
    """Carry-top body (round 5): the next pop's code rides in the
    while_loop CARRY instead of SMEM — the reference's top-in-registers
    stack trick (src/traversal/stack.impala:25-50) at tile granularity.

    vs _kernel (measured motivation: per-pop ~600 ns of scalar/small-
    vector ISSUE that multi-tile interleaving could not hide):
    - pop: no SMEM load on the critical path — the carried code feeds
      the row load directly; the stack peek (needed only when a pop
      pushes nothing) is read once at body start from the PRE-push
      sptr, off the chain.
    - push: the nearest child never round-trips through SMEM; it
      becomes the next carried code. Siblings go to SMEM as before.
    - select="fold": replace the arity-8 Batcher sort network (19
      compare-swaps x 4 scalar selects on the chain) with a single
      min-fold (7 x 2 selects) picking the nearest child; siblings are
      pushed in slot order (pop inflation vs extract savings is the
      measured trade — VERDICT r4 item 1b). select="sort" keeps exact
      near-order pushes.
    - fma_slab: fused b*inv + inv_org slab (see _slab_parts).

    Hit semantics identical to _kernel (parity-tested); supports the
    HBM modes + exact next-pop prefetch (prediction is free here: the
    next code IS the carry)."""
    rest = list(rest)
    if prefetch:
        pref_ref = rest.pop()
    if nodes_hbm:
        node_buf, node_sem = rest[-2:]
        rest = rest[:-2]
    if tris_hbm:
        tri_buf, tri_sem = rest[-2:]
        rest = rest[:-2]
    if count_pops:
        cnt_ref, stack_ref, cnt_sm = rest
    else:
        (stack_ref,) = rest
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if prefetch:
        pf_init, pf_predict, pf_tri_row, pf_node_row, pf_drain = \
            _pf_helpers(pref_ref, tris_ref,
                        tri_buf if tris_hbm else None,
                        tri_sem if tris_hbm else None,
                        nodes_ref,
                        node_buf if nodes_hbm else None,
                        node_sem if nodes_hbm else None,
                        node_rpl, tris_hbm, nodes_hbm, tri_lpr)

    def load_row(ref, idx, rpl, lpr=1):
        if lpr > 1:
            row = ref[pl.ds(idx * lpr, lpr), :]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            return ((lambda j: row[j // 128, j % 128]),
                    (lambda j: row_i[j // 128, j % 128]))
        if rpl == 1:
            row = ref[pl.ds(idx, 1), :]
        else:
            row = ref[pl.ds(idx // 2, 1), :]
            row = pltpu.roll(row, -(idx % 2) * 64, axis=1)
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
        return (lambda j: row[0, j]), (lambda j: row_i[0, j])

    inv_raw = [rays_ref[i] for i in range(3)]      # (TR, 128) each
    org = [rays_ref[3 + i] for i in range(3)]
    dirv = [rays_ref[6 + i] for i in range(3)]
    tmin = rays_ref[9]
    tmax = rays_ref[10]
    if fma_slab:
        inv_d = [jnp.clip(v, -_INV_CAP, _INV_CAP) for v in inv_raw]
        io = [-(org[k] * inv_d[k]) for k in range(3)]
    else:
        inv_d = inv_raw
        io = None

    if prefetch:
        pf_init()
    if count_pops:
        cnt_sm[0] = jnp.int32(0)
        cnt_sm[1] = jnp.int32(0)

    pos = [jnp.min((inv_raw[k] >= 0.0).astype(jnp.int32)) == 1
           for k in range(3)]
    neg = [jnp.min((inv_raw[k] < 0.0).astype(jnp.int32)) == 1
           for k in range(3)]
    tile_pure = (pos[0] | neg[0]) & (pos[1] | neg[1]) & (pos[2] | neg[2])

    zero = jnp.int32(0)

    def load_node_row(code):
        if nodes_hbm:
            if prefetch:
                slot = pf_node_row(code)
            else:
                cp = pltpu.make_async_copy(
                    nodes_ref.at[pl.ds((code - 1) // node_rpl, 1)],
                    node_buf.at[pl.ds(0, 1)], node_sem)
                cp.start()
                cp.wait()
                slot = 0
            row = node_buf[pl.ds(slot, 1), :]
            if node_rpl == 2:
                row = pltpu.roll(row, -((code - 1) % 2) * 64, axis=1)
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            return (lambda j: row[0, j]), (lambda j: row_i[0, j])
        return load_row(nodes_ref, code - 1, node_rpl)

    def cond(c):
        if any_hit:
            return (c[0] != 0) & jnp.logical_not(c[2])
        return c[0] != 0

    def body(c):
        if any_hit:
            code, sptr, _, t_cur, u_b, v_b, p_b, g_b = c
        else:
            code, sptr, t_cur, u_b, v_b, p_b, g_b = c
        if count_pops:
            cnt_sm[0] = cnt_sm[0] + jnp.int32(1)
            cnt_sm[1] = cnt_sm[1] + jnp.where(code < 0, jnp.int32(1),
                                              zero)
        # stack peek: the next pop when this one pushes nothing — read
        # from the PRE-push sptr at body start, off the serial chain
        can = sptr > 0
        peek = stack_ref[jnp.maximum(sptr - 1, zero)]
        fallback = jnp.where(can, peek, zero)

        if any_hit:
            t_test = jnp.where(p_b >= 0, jnp.float32(-_F32_MAX), t_cur)
        else:
            t_test = t_cur
        carry = (t_cur, u_b, v_b, p_b, g_b)

        def do_node(_):
            rd, rdi = load_node_row(code)

            def pure_body(_):
                return _slab_parts(rd, arity, pos, org, inv_d, tmin,
                                   t_test, True, io=io)

            def mixed_body(_):
                return _slab_parts(rd, arity, pos, org, inv_d, tmin,
                                   t_test, False, io=io)

            parts = jax.lax.cond(tile_pure, pure_body, mixed_body, None)
            keys8 = jnp.min(jnp.concatenate(parts, axis=0), axis=1)
            keys = []
            childs = []
            for cx in range(arity):
                key = keys8[cx]
                child = rdi(6 * arity + cx)
                ok = (child != 0) & (key < _F32_MAX)
                keys.append(jnp.where(ok, key, _F32_MAX))
                childs.append(jnp.where(ok, child, 0))
            if any_hit:
                # order is irrelevant once any hit terminates: next =
                # first valid child, siblings pushed by code inequality
                best = zero
                for cx in reversed(range(arity)):
                    best = jnp.where(childs[cx] != 0, childs[cx], best)
            elif select == "sort":
                _sort_children(keys, childs, arity)
                best = childs[0]
            else:
                bk = keys[0]
                best = childs[0]
                for cx in range(1, arity):
                    sw = keys[cx] < bk
                    bk = jnp.where(sw, keys[cx], bk)
                    best = jnp.where(sw, childs[cx], best)
            if prefetch:
                pf_predict(jnp.where(best != 0, best, fallback))
            return carry + (best,) + tuple(childs)

        def do_leaf(_):
            t_c, u_c, v_c, p_c, g_c = carry
            if tris_hbm:
                if prefetch:
                    slot = pf_tri_row(code)
                else:
                    cp = pltpu.make_async_copy(
                        tris_ref.at[pl.ds((~code) * tri_lpr, tri_lpr)],
                        tri_buf.at[pl.ds(0, tri_lpr)], tri_sem)
                    cp.start()
                    cp.wait()
                    slot = 0
                row = tri_buf[pl.ds(slot * tri_lpr, tri_lpr), :]
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                rd, rdi = ((lambda j: row[j // 128, j % 128]),
                           (lambda j: row_i[j // 128, j % 128]))
            else:
                rd, rdi = load_row(tris_ref, ~code, tri_rpl, tri_lpr)
            cont = jnp.where(rdi(12 * m + m - 1) < 0, zero, code - 1)
            if prefetch:
                # continuation is metadata-only: the next pop is known
                # BEFORE the MT math, so its DMA flies during it
                pf_predict(jnp.where(cont != 0, cont, fallback))
            c2, _ = _mt_lanes(rd, rdi, m, org, dirv, tmin, t_test,
                              (t_c, u_c, v_c, p_c, g_c))
            return c2 + (cont,) + (zero,) * arity

        out = jax.lax.cond(code > 0, do_node, do_leaf, None)
        carry = out[:5]
        best = out[5]
        childs = out[6:]
        # push siblings far-to-near (codes are unique per node, so best
        # matches at most one slot — under select="sort" that is slot 0
        # and the nearest sibling ends on top); nothing pushes when
        # best == 0
        for cx in reversed(range(arity)):
            ok = (childs[cx] != 0) & (childs[cx] != best)
            stack_ref[jnp.where(ok, sptr, stack_size - 1)] = childs[cx]
            sptr = sptr + jnp.where(ok, 1, 0)
        pop_needed = best == 0
        next_code = jnp.where(pop_needed, fallback, best)
        sptr = sptr - jnp.where(pop_needed & can, 1, 0)

        t2, u2, v2, p2, g2 = carry
        if any_hit:
            all_done = jnp.min(jnp.where(tmax < tmin, 1,
                                         (p2 >= 0).astype(jnp.int32))) > 0
            return (next_code, sptr, all_done, t2, u2, v2, p2, g2)
        return (next_code, sptr, t2, u2, v2, p2, g2)

    init_hits = (tmax,
                 jnp.zeros_like(tmax),
                 jnp.zeros_like(tmax),
                 jnp.full(tmax.shape, -1, jnp.int32),
                 jnp.full(tmax.shape, -1, jnp.int32))
    if any_hit:
        init = (jnp.int32(1), zero, jnp.bool_(False)) + init_hits
    else:
        init = (jnp.int32(1), zero) + init_hits
    out = jax.lax.while_loop(cond, body, init)
    if prefetch:
        pf_drain()
    t_b, u_b, v_b, p_b, g_b = out[-5:]
    t_ref[:] = t_b
    u_ref[:] = u_b
    v_ref[:] = v_b
    prim_ref[:] = p_b
    geom_ref[:] = g_b
    if count_pops:
        cnt_ref[0:1] = jnp.full((1, 128), cnt_sm[0], jnp.int32)
        cnt_ref[1:2] = jnp.full((1, 128), cnt_sm[1], jnp.int32)
        cnt_ref[2:8] = jnp.full((6, 128), cnt_sm[0], jnp.int32)


def _kernel_multi(rays_ref, nodes_ref, tris_ref,
                  t_ref, u_ref, v_ref, prim_ref, geom_ref,
                  *rest, arity, m, any_hit, stack_size, tile_rows,
                  n_way, node_rpl=2, tri_rpl=2, tri_lpr=1,
                  tris_hbm=False, nodes_hbm=False, leaf_chain=1,
                  prefetch=False):
    """n_way independent ray tiles per grid step, one fused loop.

    The single-tile kernel's per-pop cost is ~600 ns of poorly-packed
    scalar + small-vector work plus ~18.6 ns x rows of full-tile vector
    issue (measured; see the cost model at the top of this file). The two
    tiles' pop chains are fully independent — separate SMEM stacks,
    separate carries — so the VLIW scheduler can pack tile A's scalar
    phase against tile B's vector phase inside one loop body: per-trip
    cost approaches max(scalar, vector) instead of their sum. Tiles are
    paired adjacently, so after the cone sort the two pop counts are
    similar and the max-trips tail is small.

    Production config only (pops=1, vector row loads); semantics
    identical to _kernel over each sub-tile."""
    rest = list(rest)
    if prefetch:
        pref_refs = rest[-n_way:]
        rest = rest[:-n_way]
    else:
        pref_refs = [None] * n_way
    if nodes_hbm:
        node_scratch = rest[-2 * n_way:]
        rest = rest[:-2 * n_way]
    else:
        node_scratch = [None, None] * n_way
    if tris_hbm:
        hbm_scratch = rest[-2 * n_way:]
        rest = rest[:-2 * n_way]
    else:
        hbm_scratch = [None, None] * n_way
    stacks = rest
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def load_row(ref, idx, rpl, lpr=1):
        if lpr > 1:
            row = ref[pl.ds(idx * lpr, lpr), :]
            row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
            return ((lambda j: row[j // 128, j % 128]),
                    (lambda j: row_i[j // 128, j % 128]))
        if rpl == 1:
            row = ref[pl.ds(idx, 1), :]
        else:
            row = ref[pl.ds(idx // 2, 1), :]
            row = pltpu.roll(row, -(idx % 2) * 64, axis=1)
        row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
        return (lambda j: row[0, j]), (lambda j: row_i[0, j])

    zero = jnp.int32(0)

    def make_tile(lo, stack_ref, tri_buf, tri_sem, node_buf, node_sem,
                  pref_ref):
        """Builds (cond_one, body_one, init, writeback, drain) for the
        tile in rows [lo, lo + tile_rows)."""
        sl = pl.ds(lo, tile_rows)
        inv_d = [rays_ref[i, sl] for i in range(3)]
        org = [rays_ref[3 + i, sl] for i in range(3)]
        dirv = [rays_ref[6 + i, sl] for i in range(3)]
        tmin = rays_ref[9, sl]
        tmax = rays_ref[10, sl]
        stack_ref[0] = jnp.int32(1)
        if prefetch:
            pf_init, pf_predict, pf_tri_row, pf_node_row, pf_drain = \
                _pf_helpers(pref_ref, tris_ref, tri_buf, tri_sem,
                            nodes_ref, node_buf, node_sem,
                            node_rpl, tris_hbm, nodes_hbm, tri_lpr)
            pf_init()
        else:
            pf_drain = None

        pos = [jnp.min((inv_d[k] >= 0.0).astype(jnp.int32)) == 1
               for k in range(3)]
        neg = [jnp.min((inv_d[k] < 0.0).astype(jnp.int32)) == 1
               for k in range(3)]
        tile_pure = ((pos[0] | neg[0]) & (pos[1] | neg[1])
                     & (pos[2] | neg[2]))

        def node_step(code, t_cur, pure, peek):
            if nodes_hbm:
                if prefetch:
                    slot = pf_node_row(code)
                else:
                    cp = pltpu.make_async_copy(
                        nodes_ref.at[pl.ds((code - 1) // node_rpl, 1)],
                        node_buf.at[pl.ds(0, 1)], node_sem)
                    cp.start()
                    cp.wait()
                    slot = 0
                row = node_buf[pl.ds(slot, 1), :]
                if node_rpl == 2:
                    row = pltpu.roll(row, -((code - 1) % 2) * 64, axis=1)
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                rd, rdi = (lambda j: row[0, j]), (lambda j: row_i[0, j])
            else:
                rd, rdi = load_row(nodes_ref, code - 1, node_rpl)
            parts = _slab_parts(rd, arity, pos, org, inv_d, tmin, t_cur,
                                pure)
            childs = _finalize_children(
                parts, [rdi(6 * arity + c) for c in range(arity)], arity,
                sort=not any_hit)
            if prefetch:
                pf_predict(_next_top(childs, peek))
            return childs

        def _leaf_one(code, carry, t_test, peek):
            t_cur, u_b, v_b, p_b, g_b = carry
            if tris_hbm:
                if prefetch:
                    slot = pf_tri_row(code)
                else:
                    cp = pltpu.make_async_copy(
                        tris_ref.at[pl.ds((~code) * tri_lpr, tri_lpr)],
                        tri_buf.at[pl.ds(0, tri_lpr)], tri_sem)
                    cp.start()
                    cp.wait()
                    slot = 0
                row = tri_buf[pl.ds(slot * tri_lpr, tri_lpr), :]
                row_i = jax.lax.bitcast_convert_type(row, jnp.int32)
                rd, rdi = ((lambda j: row[j // 128, j % 128]),
                           (lambda j: row_i[j // 128, j % 128]))
            else:
                rd, rdi = load_row(tris_ref, ~code, tri_rpl, tri_lpr)
            if prefetch:
                cont_e = jnp.where(rdi(12 * m + m - 1) < 0, jnp.int32(0),
                                   code - 1)
                pf_predict(jnp.where(cont_e != 0, cont_e, peek))
            carry, is_last = _mt_lanes(rd, rdi, m, org, dirv, tmin, t_test,
                                       (t_cur, u_b, v_b, p_b, g_b))
            cont_code = jnp.where(is_last, jnp.int32(0), code - 1)
            return carry, cont_code

        def leaf_step(code, carry, t_test, peek):
            carry, cont = _leaf_one(code, carry, t_test, peek)
            for _ in range(leaf_chain - 1):
                carry, cont = jax.lax.cond(
                    cont < 0,
                    lambda args: _leaf_one(args[1], args[0], t_test, peek),
                    lambda args: args,
                    (carry, cont))
            return carry, cont

        no_push = [zero] * arity

        def body_one(c):
            if any_hit:
                sptr, done, t_cur, u_b, v_b, p_b, g_b = c
                valid = (sptr > 0) & jnp.logical_not(done)
            else:
                sptr, t_cur, u_b, v_b, p_b, g_b = c
                valid = sptr > 0
            top = jnp.where(valid, sptr - 1, zero)
            code = jnp.where(valid, stack_ref[top], zero)
            sptr = jnp.where(valid, top, sptr)
            if any_hit:
                t_test = jnp.where(p_b >= 0, jnp.float32(-_F32_MAX),
                                   t_cur)
            else:
                t_test = t_cur
            carry = (t_cur, u_b, v_b, p_b, g_b)
            peek = (jnp.where(sptr > 0,
                              stack_ref[jnp.maximum(sptr - 1, zero)],
                              zero) if prefetch else None)

            def do_node(_):
                def pure_body(_):
                    return node_step(code, t_test, True, peek)

                def mixed_body(_):
                    return node_step(code, t_test, False, peek)

                childs = jax.lax.cond(tile_pure, pure_body, mixed_body,
                                      None)
                return carry + tuple(childs)

            def do_other(_):
                def do_leaf(_):
                    c2, cont = leaf_step(code, carry, t_test, peek)
                    return c2 + (cont,) + tuple(no_push[1:])

                def do_skip(_):
                    return carry + tuple(no_push)

                return jax.lax.cond(code < 0, do_leaf, do_skip, None)

            out = jax.lax.cond(code > 0, do_node, do_other, None)
            carry = out[:5]
            pushes = out[5:]
            for rr in range(arity - 1, -1, -1):
                ok = pushes[rr] != 0
                stack_ref[jnp.where(ok, sptr, stack_size - 1)] = pushes[rr]
                sptr = sptr + jnp.where(ok, 1, 0)
            t2, u2, v2, p2, g2 = carry
            if any_hit:
                all_done = jnp.min(jnp.where(
                    tmax < tmin, 1,
                    (p2 >= 0).astype(jnp.int32))) > 0
                return (sptr, all_done, t2, u2, v2, p2, g2)
            return (sptr, t2, u2, v2, p2, g2)

        def cond_one(c):
            if any_hit:
                return (c[0] > 0) & jnp.logical_not(c[1])
            return c[0] > 0

        init_hits = (tmax,
                     jnp.zeros_like(tmax),
                     jnp.zeros_like(tmax),
                     jnp.full(tmax.shape, -1, jnp.int32),
                     jnp.full(tmax.shape, -1, jnp.int32))
        if any_hit:
            init = (jnp.int32(1), jnp.bool_(False)) + init_hits
        else:
            init = (jnp.int32(1),) + init_hits

        def writeback(c):
            t_b, u_b, v_b, p_b, g_b = c[-5:]
            t_ref[sl] = t_b
            u_ref[sl] = u_b
            v_ref[sl] = v_b
            prim_ref[sl] = p_b
            geom_ref[sl] = g_b

        return cond_one, body_one, init, writeback, pf_drain

    tiles = [make_tile(k * tile_rows, stacks[k], hbm_scratch[2 * k],
                       hbm_scratch[2 * k + 1], node_scratch[2 * k],
                       node_scratch[2 * k + 1], pref_refs[k])
             for k in range(n_way)]
    na = len(tiles[0][2])

    def cond(c):
        out = None
        for k, (cond_k, _b, _i, _w, _d) in enumerate(tiles):
            ck = cond_k(c[k * na:(k + 1) * na])
            out = ck if out is None else (out | ck)
        return out

    def body(c):
        out = ()
        for k, (_c, body_k, _i, _w, _d) in enumerate(tiles):
            out = out + body_k(c[k * na:(k + 1) * na])
        return out

    init = ()
    for _c, _b, init_k, _w, _d in tiles:
        init = init + init_k
    out = jax.lax.while_loop(cond, body, init)
    for _c, _b, _i, _w, drain_k in tiles:
        # a tile whose rays (or any-hit early exit) finished before the
        # fused loop ended can leave a predicted copy in flight
        if drain_k is not None:
            drain_k()
    for k, (_c, _b, _i, wb_k, _d) in enumerate(tiles):
        wb_k(out[k * na:(k + 1) * na])


def traverse_packet_components(dev, org, dirv, inv_d, inv_o, tmin, tmax,
                               any_hit=False, tile_rows=TILE_ROWS,
                               interpret=False, pops=POPS,
                               scalar_reads=SCALAR_READS,
                               frustum=FRUSTUM, tris_hbm=False,
                               nodes_hbm=False,
                               leaf_chain=LEAF_CHAIN, multi=MULTI,
                               prefetch=PREFETCH, carry_top=CARRY_TOP,
                               select=SELECT, fma_slab=FMA_SLAB):
    """Component-level packet traversal: Vec3 tuples of (R, 128) arrays in,
    hit dict of (R, 128) arrays out (integrator-facing; dead rays =
    tmax < tmin)."""
    R = tmin.shape[0]
    nt = -(-R // tile_rows)
    if multi > 1 and nt % multi:
        nt += multi - nt % multi
    pad = nt * tile_rows - R

    def prep(x, fill=0.0):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad, 128), fill, x.dtype)])
        return x

    comp = [prep(c) for c in inv_d]
    comp += [prep(c) for c in org] + [prep(c) for c in dirv]
    comp += [prep(tmin), prep(tmax, fill=-1.0)]
    packed = jnp.stack(comp)
    outs = _call_kernel(dev, packed, nt, tile_rows, any_hit, interpret,
                        pops, scalar_reads, frustum=frustum,
                        tris_hbm=tris_hbm, nodes_hbm=nodes_hbm,
                        leaf_chain=leaf_chain, multi=multi,
                        prefetch=prefetch, carry_top=carry_top,
                        select=select, fma_slab=fma_slab)
    t, u, v, p, g = [o[:R] for o in outs[:5]]
    t = jnp.where(p < 0, tmax, t)
    return {"t": t, "u": u, "v": v, "prim_id": p, "geom_id": g}


def traverse_packet(dev, rays, any_hit=False, tile_rows=TILE_ROWS,
                    interpret=False, pops=POPS,
                    scalar_reads=SCALAR_READS, ablate=(),
                    frustum=FRUSTUM, tris_hbm=False, nodes_hbm=False,
                    leaf_chain=LEAF_CHAIN, multi=MULTI,
                    prefetch=PREFETCH, carry_top=CARRY_TOP,
                    select=SELECT, fma_slab=FMA_SLAB):
    """Packet-kernel traversal; same contract as api.traverse.
    Requires the node table to fit in VMEM (~100 MB with the raised
    limit). tris_hbm=True keeps the (much larger) triangle table in HBM
    and DMAs one Tri row per leaf pop — the San-Miguel-class mode: a
    4M-tri scene has ~30 MB of nodes (VMEM-resident) but ~400 MB of
    Tri8 packets."""
    B = rays["org"].shape[0]
    packed, nt = pack_rays(rays, tile_rows, multi)
    tile = tile_rows * 128

    outs = _call_kernel(dev, packed, nt, tile_rows, any_hit, interpret,
                        pops, scalar_reads, ablate=ablate,
                        frustum=frustum, tris_hbm=tris_hbm,
                        nodes_hbm=nodes_hbm, leaf_chain=leaf_chain,
                        multi=multi, prefetch=prefetch,
                        carry_top=carry_top, select=select,
                        fma_slab=fma_slab)
    t, u, v, p, g = [o.reshape(nt * tile)[:B] for o in outs[:5]]
    t = jnp.where(p < 0, rays["tmax"], t)
    return {"t": t, "u": u, "v": v, "prim_id": p, "geom_id": g}


def pack_rays(rays, tile_rows, multi=1):
    """Pads a ray batch to whole tiles (and a multiple of `multi` tiles)
    and packs the 11 per-ray components into the kernel's
    (11, nt*tile_rows, 128) layout. Padding rays carry tmax=-1 so the
    kernel body treats them as immediately dead. Returns (packed, nt)."""
    B = rays["org"].shape[0]
    tile = tile_rows * 128
    nt = -(-B // tile)
    if multi > 1 and nt % multi:
        nt += multi - nt % multi
    pad = nt * tile - B

    def prep(x, fill=0.0):
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])
        return x

    comp = [prep(rays["inv_dir"][:, i]) for i in range(3)]
    comp += [prep(rays["org"][:, i]) for i in range(3)]
    comp += [prep(rays["dir"][:, i]) for i in range(3)]
    comp += [prep(rays["tmin"]), prep(rays["tmax"], fill=-1.0)]
    return jnp.stack(comp).reshape(11, nt * tile_rows, 128), nt


def _pack_rows(table, force_single=False):
    """Packs (N, C) rows into 128-lane VMEM lines: C<=64 -> two rows per
    line (avoids the 128-lane padding waste); C<=128 or force_single ->
    one padded row per line; C>128 -> ceil(C/128) consecutive lines per
    row (Tri16 packets: 14*16 = 224 floats = 2 lines, fetched by ONE
    async copy in the HBM modes). Returns (packed, rows_per_line,
    lines_per_row)."""
    n, c = table.shape
    if c <= 64 and not force_single:
        padded = jnp.zeros((n + (n % 2), 64), table.dtype)
        padded = padded.at[:n, :c].set(table)
        return padded.reshape(-1, 128), 2, 1
    if c <= 128:
        padded = jnp.zeros((n, 128), table.dtype)
        return padded.at[:, :c].set(table), 1, 1
    lpr = -(-c // 128)
    padded = jnp.zeros((n, lpr * 128), table.dtype)
    padded = padded.at[:, :c].set(table)
    return padded.reshape(n * lpr, 128), 1, lpr


def _call_kernel(dev, packed, nt, tile_rows, any_hit, interpret,
                 pops=POPS, scalar_reads=SCALAR_READS, count_pops=False,
                 ablate=(), frustum=FRUSTUM, tris_hbm=False,
                 nodes_hbm=False, leaf_chain=LEAF_CHAIN, multi=MULTI,
                 prefetch=PREFETCH, carry_top=CARRY_TOP, select=SELECT,
                 fma_slab=FMA_SLAB):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if carry_top and (frustum or scalar_reads or pops > 1 or ablate
                      or leaf_chain > 1):
        # diagnostic/rejected options live in the legacy body only
        carry_top = False
    if nodes_hbm and not carry_top:
        # giga-scene mode supports the production bodies only
        assert not (frustum or scalar_reads or pops > 1 or count_pops), \
            "nodes_hbm supports the production kernel body only"
    # diagnostic options (pop counters, ablations, frustum tests, scalar
    # loads, pops>1) exist in the single-tile bodies only — demote multi
    # so they are honored instead of silently dropped (callers pad nt to
    # a multiple of multi, which stays valid for multi=1)
    if count_pops or ablate or frustum or scalar_reads or pops > 1 \
            or carry_top:
        multi = 1
    # next-pop prefetch applies to the HBM modes' production bodies only
    prefetch = bool(prefetch and (tris_hbm or nodes_hbm)
                    and (carry_top or (pops == 1 and not count_pops))
                    and not ablate and not frustum
                    and not scalar_reads)
    if carry_top and count_pops:
        prefetch = False
    # no Mosaic off-TPU: fall back to the interpreter automatically so the
    # packet path stays testable on the CPU suite
    interpret = interpret or jax.default_backend() != "tpu"
    if interpret:
        scalar_reads = False  # interpreter path: keep vector loads
    nodes2, node_rpl, node_lpr = _pack_rows(dev["nodes"],
                                            force_single=scalar_reads)
    assert node_lpr == 1, "node rows must fit one VMEM line"
    tris2, tri_rpl, tri_lpr = _pack_rows(
        dev["tris"], force_single=scalar_reads or tris_hbm)
    if tri_lpr > 1:
        # multi-line Tri rows (packet > 9): the scalar-read diagnostic
        # has no multi-line form
        scalar_reads = False

    arity = dev["nodes"].shape[1] // 7
    m = dev["tris"].shape[1] // 14
    # size the SMEM stack past the tree's worst case (+1 trash slot for
    # masked pushes) — ADVICE r1: the fixed 64-entry stack could silently
    # corrupt SMEM on deep/unbalanced trees. Scalar SMEM is cheap; the
    # pop/push code does not scale with stack size.
    from .api import BvhMeta
    meta = dev.get("meta")
    stack_size = (max(meta.shared_stack + 2, 16)
                  if isinstance(meta, BvhMeta) else STACK)
    node_spec = (pl.BlockSpec(memory_space=pl.ANY) if nodes_hbm
                 else pl.BlockSpec(nodes2.shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM))
    # prefetch double-buffers the DMA landing lines (2 rows per table)
    buf_rows = 2 if prefetch else 1
    if multi > 1:
        assert nt % multi == 0
        kern = functools.partial(
            _kernel_multi, arity=arity, m=m, any_hit=any_hit,
            stack_size=stack_size, tile_rows=tile_rows, n_way=multi,
            node_rpl=node_rpl, tri_rpl=tri_rpl, tri_lpr=tri_lpr,
            tris_hbm=tris_hbm, nodes_hbm=nodes_hbm,
            leaf_chain=leaf_chain, prefetch=prefetch)
        blk = multi * tile_rows
        return pl.pallas_call(
            kern,
            grid=(nt // multi,),
            out_shape=[
                jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.float32),
                jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.float32),
                jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.float32),
                jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.int32),
                jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.int32),
            ],
            in_specs=[pl.BlockSpec((11, blk, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
                      node_spec,
                      (pl.BlockSpec(memory_space=pl.ANY) if tris_hbm
                       else pl.BlockSpec(tris2.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))],
            out_specs=[pl.BlockSpec((blk, 128), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)] * 5,
            scratch_shapes=([pltpu.SMEM((stack_size,), jnp.int32)]
                            * multi
                            + ([pltpu.VMEM((buf_rows * tri_lpr, 128),
                                           jnp.float32),
                                pltpu.SemaphoreType.DMA(())] * multi
                               if tris_hbm else [])
                            + ([pltpu.VMEM((buf_rows, 128), jnp.float32),
                                pltpu.SemaphoreType.DMA(())] * multi
                               if nodes_hbm else [])
                            + ([pltpu.SMEM((4,), jnp.int32)] * multi
                               if prefetch else [])),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(packed, nodes2, tris2)
    if carry_top:
        kern = functools.partial(_kernel_ct, arity=arity, m=m,
                                 any_hit=any_hit, stack_size=stack_size,
                                 node_rpl=node_rpl, tri_rpl=tri_rpl,
                                 tri_lpr=tri_lpr,
                                 count_pops=count_pops, select=select,
                                 fma_slab=fma_slab, tris_hbm=tris_hbm,
                                 nodes_hbm=nodes_hbm, prefetch=prefetch)
    else:
        kern = functools.partial(_kernel, arity=arity, m=m,
                                 any_hit=any_hit, stack_size=stack_size,
                                 node_rpl=node_rpl, tri_rpl=tri_rpl,
                                 tri_lpr=tri_lpr,
                                 pops=pops, scalar_reads=scalar_reads,
                                 count_pops=count_pops,
                                 ablate=tuple(ablate),
                                 frustum=frustum, tris_hbm=tris_hbm,
                                 nodes_hbm=nodes_hbm,
                                 leaf_chain=leaf_chain,
                                 prefetch=prefetch)
    out_shapes = [
        jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.float32),
        jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.int32),
        jax.ShapeDtypeStruct((nt * tile_rows, 128), jnp.int32),
    ]
    if count_pops:
        out_shapes.append(jax.ShapeDtypeStruct((nt * 8, 128), jnp.int32))
    tile_spec = pl.BlockSpec((1, tile_rows, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    rays_spec = pl.BlockSpec((11, tile_rows, 128), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [out_spec] * 5
    if count_pops:
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kern,
        grid=(nt,),
        out_shape=out_shapes,
        in_specs=[rays_spec,
                  node_spec,
                  (pl.BlockSpec(memory_space=pl.ANY) if tris_hbm else
                   pl.BlockSpec(tris2.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM))],
        out_specs=out_specs,
        scratch_shapes=([pltpu.SMEM((stack_size,), jnp.int32)]
                        + ([pltpu.SMEM((2,), jnp.int32)] if count_pops
                           else [])
                        + ([pltpu.VMEM((buf_rows * tri_lpr, 128),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA(())] if tris_hbm
                           else [])
                        + ([pltpu.VMEM((buf_rows, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(())] if nodes_hbm
                           else [])
                        + ([pltpu.SMEM((4,), jnp.int32)] if prefetch
                           else [])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(packed, nodes2, tris2)
