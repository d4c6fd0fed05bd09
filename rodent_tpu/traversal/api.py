"""BVH traversal over ray megabatches — the TPU replacement for the
reference's single/packet/hybrid kernels.

Design (vs src/traversal/mapping_cpu.impala:138-384): rodent specializes
three SIMD mappings (single ray over child slots / ray packet over lanes /
hybrid switch). On TPU there is no per-lane divergence to manage inside a
warp — the natural mapping is one *megabatch* of rays advanced in lockstep
by a jax.lax.while_loop: every iteration, each live ray pops one entry off
its traversal stack and processes either one wide node (slab tests across
the N child slots, vectorized over the batch) or one Tri4 packet. Rays
idle once their stack empties; the loop ends when all stacks are empty.
Child ordering uses a small sort by entry distance — the data-parallel
equivalent of the reference's sorting-network stack sort
(src/traversal/stack.impala:59-123).

TPU layout rule (measured on v5e): XLA gathers of FLAT rows (B,) x (N, R)
run at HBM speed (~0.03 ms for 64K x 256B), while gathers with a
multi-dim trailing shape like (N, 6, 8) or (N, 4, 3) are ~150x slower
(4-6 ms). So nodes and triangle packets are packed into single flat
64-float rows (children bitcast into float lanes) and every per-ray fetch
is ONE flat gather followed by cheap slices:

  node row  (arity 8): [xmin*8 | xmax*8 | ymin*8 | ymax*8 | zmin*8 |
                        zmax*8 | child*8 (i32 bitcast) | pad*8]
  tri row   (Tri4):    [v0x*4 | v0y*4 | v0z*4 | e1x..e1z*4 | e2x..e2z*4 |
                        nx..nz*4 | prim*4 (i32) | geom*4 (i32) | pad*8]

The same function doubles as the "pure-XLA reference traversal" oracle
(SURVEY.md §4: the Embree-device role) — a brute-force all-triangles
intersector is also provided for small scenes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import empty_hit, make_rays

STACK_DEPTH = 64  # matches src/traversal/stack.impala:53 (Stack of 64)


def _bitcast_f32(x):
    return jax.lax.bitcast_convert_type(x, jnp.float32)


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def bvh_to_device(bvh):
    """WideBvh (numpy) -> dict of flat-row jnp arrays for traverse()."""
    a = bvh.arity
    nn = bvh.num_nodes
    nodes = np.zeros((nn, 7 * a), np.float32)
    nodes[:, 0:6 * a] = bvh.bounds.reshape(nn, 6 * a)
    nodes[:, 6 * a:7 * a] = bvh.child.view(np.float32)

    m = bvh.packet
    np_ = bvh.num_packets
    tris = np.zeros((np_, 14 * m), np.float32)
    # (P, M, 3) -> [x*M | y*M | z*M] per vector
    for i, arr in enumerate((bvh.tri_v0, bvh.tri_e1, bvh.tri_e2, bvh.tri_n)):
        tris[:, i * 3 * m:(i + 1) * 3 * m] = (
            arr.transpose(0, 2, 1).reshape(np_, 3 * m))
    tris[:, 12 * m:13 * m] = bvh.prim_id.view(np.float32)
    tris[:, 13 * m:14 * m] = bvh.geom_id.view(np.float32)

    # arity/packet stay derivable from the static row widths (7A, 14M)
    # so they never become traced values under jit
    return {
        "nodes": jnp.asarray(nodes),
        "tris": jnp.asarray(tris),
    }


def _round_up(x, m):
    return (x + m - 1) // m * m


def _node_test(dev, rays, nidx, t_cur):
    """Gathers one node row per ray and slab-tests all child slots.
    Returns (children (B, A) i32, entry (B, A), hit mask (B, A))."""
    a = dev["nodes"].shape[1] // 7
    row = dev["nodes"][nidx]  # (B, 7A?) single flat gather
    ix = rays["inv_dir"][:, 0:1]
    iy = rays["inv_dir"][:, 1:2]
    iz = rays["inv_dir"][:, 2:3]
    ox = rays["inv_org"][:, 0:1]
    oy = rays["inv_org"][:, 1:2]
    oz = rays["inv_org"][:, 2:3]
    tx0 = row[:, 0 * a:1 * a] * ix + ox
    tx1 = row[:, 1 * a:2 * a] * ix + ox
    ty0 = row[:, 2 * a:3 * a] * iy + oy
    ty1 = row[:, 3 * a:4 * a] * iy + oy
    tz0 = row[:, 4 * a:5 * a] * iz + oz
    tz1 = row[:, 5 * a:6 * a] * iz + oz
    entry = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.maximum(jnp.minimum(tz0, tz1),
                                    rays["tmin"][:, None]))
    exit_ = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.minimum(jnp.maximum(tz0, tz1),
                                    t_cur[:, None]))
    children = _bitcast_i32(row[:, 6 * a:7 * a])
    hit = (entry <= exit_) & (children != 0)
    return children, entry, hit


def _leaf_test(dev, rays, pidx, t_cur):
    """Gathers one tri-packet row per ray and intersects its M lanes with
    the sign-trick Moller-Trumbore (intersection.impala:164-192).
    Returns per-lane (hit, t, u, v, prim, geom) plus the packet's is_last
    flag."""
    m = dev["tris"].shape[1] // 14
    row = dev["tris"][pidx]  # (B, 14M?) single flat gather

    def v3(base):
        return (row[:, base:base + m], row[:, base + m:base + 2 * m],
                row[:, base + 2 * m:base + 3 * m])

    v0x, v0y, v0z = v3(0)
    e1x, e1y, e1z = v3(3 * m)
    e2x, e2y, e2z = v3(6 * m)
    nx, ny, nz = v3(9 * m)
    pid = _bitcast_i32(row[:, 12 * m:13 * m])
    gid = _bitcast_i32(row[:, 13 * m:14 * m])

    ox = rays["org"][:, 0:1]
    oy = rays["org"][:, 1:2]
    oz = rays["org"][:, 2:3]
    dx = rays["dir"][:, 0:1]
    dy = rays["dir"][:, 1:2]
    dz = rays["dir"][:, 2:3]

    cx, cy, cz = v0x - ox, v0y - oy, v0z - oz
    rx = dy * cz - dz * cy
    ry = dz * cx - dx * cz
    rz = dx * cy - dy * cx
    det = nx * dx + ny * dy + nz * dz
    abs_det = jnp.abs(det)
    sign = jnp.where(det < 0, jnp.float32(-1.0), jnp.float32(1.0))

    u = (rx * e2x + ry * e2y + rz * e2z) * sign
    v = (rx * e1x + ry * e1y + rz * e1z) * sign
    t = (cx * nx + cy * ny + cz * nz) * sign

    mask = (u >= 0.0) & (v >= 0.0) & (u + v <= abs_det)
    mask &= abs_det != 0.0
    mask &= (t >= abs_det * rays["tmin"][:, None])
    mask &= (t <= abs_det * t_cur[:, None])
    mask &= pid != -1

    inv_det = 1.0 / jnp.where(abs_det != 0.0, abs_det, 1.0)
    is_last = pid[:, m - 1] < 0
    return (mask, t * inv_det, u * inv_det, v * inv_det,
            pid & 0x7FFFFFFF, gid, is_last)


def traverse(dev, rays, any_hit=False):
    """Closest-hit (any_hit=False) or first-hit/occlusion (any_hit=True)
    traversal. rays: dict from make_rays with (B,)-batched fields.
    Returns hit dict {t, u, v, prim_id, geom_id} — prim_id == -1 on miss,
    t == original tmax on miss (empty_hit semantics)."""
    B = rays["org"].shape[0]
    m = dev["tris"].shape[1] // 14

    stack = jnp.zeros((B, STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(1)  # root node ref (1-based)
    sptr = jnp.ones((B,), jnp.int32)

    hit0 = empty_hit(rays["tmax"])
    barange = jnp.arange(B)

    def cond(state):
        return jnp.any(state["sptr"] > 0)

    def body(state):
        stack, sptr = state["stack"], state["sptr"]
        t_cur = state["t"]
        active = sptr > 0
        top = jnp.maximum(sptr - 1, 0)
        code = jnp.where(active, jnp.take_along_axis(
            stack, top[:, None], axis=1)[:, 0], 0)
        sptr = jnp.where(active, sptr - 1, sptr)

        is_node = code > 0
        is_leaf = code < 0

        # ---- wide node step ----
        nidx = jnp.where(is_node, code - 1, 0)
        children, entry, chit = _node_test(dev, rays, nidx, t_cur)
        chit &= is_node[:, None]

        if any_hit:
            sorted_children, sorted_hit = children, chit
        else:
            # near children popped first: sort ascending by entry, push
            # farthest deepest
            key = jnp.where(chit, entry, jnp.inf)
            order = jnp.argsort(key, axis=1)
            sorted_children = jnp.take_along_axis(children, order, 1)
            sorted_hit = jnp.take_along_axis(chit, order, 1)

        k = jnp.sum(sorted_hit, axis=1).astype(jnp.int32)  # hits per ray
        # push positions: the rank-r hit goes to sptr + k-1-r so the
        # nearest (first) hit ends up on top of the stack
        rank = jnp.cumsum(sorted_hit, axis=1).astype(jnp.int32) - 1
        pos = sptr[:, None] + k[:, None] - 1 - rank
        pos = jnp.where(sorted_hit, pos, STACK_DEPTH)  # OOB index -> drop
        stack = stack.at[barange[:, None], pos].set(
            sorted_children, mode="drop")
        sptr = sptr + jnp.where(is_node, k, 0)

        # ---- leaf (tri packet) step ----
        pidx = jnp.where(is_leaf, ~code, 0)
        lhit, lt, lu, lv, lprim, lgeom, is_last = _leaf_test(
            dev, rays, pidx, t_cur)
        lhit &= is_leaf[:, None]
        t_masked = jnp.where(lhit, lt, jnp.inf)
        lane = jnp.argmin(t_masked, axis=1)
        lane_oh = lane[:, None] == jnp.arange(m)[None, :]
        upd = jnp.any(lhit, axis=1)

        def pick(x):
            return jnp.sum(jnp.where(lane_oh, x, 0), axis=1)

        t_cur = jnp.where(upd, pick(lt), t_cur)
        new = {
            "t": t_cur,
            "u": jnp.where(upd, pick(lu), state["u"]),
            "v": jnp.where(upd, pick(lv), state["v"]),
            "prim_id": jnp.where(upd, pick(lprim), state["prim_id"]),
            "geom_id": jnp.where(upd, pick(lgeom), state["geom_id"]),
        }

        # continue multi-packet leaves: next packet's code is code-1
        cont = is_leaf & ~is_last
        stack = stack.at[barange, jnp.where(cont, sptr, STACK_DEPTH)].set(
            code - 1, mode="drop")
        sptr = sptr + cont.astype(jnp.int32)

        if any_hit:
            # stop this ray as soon as anything is hit
            sptr = jnp.where(new["prim_id"] >= 0, 0, sptr)

        return {"stack": stack, "sptr": sptr, **new}

    state = {"stack": stack, "sptr": sptr, **hit0}
    state = jax.lax.while_loop(cond, body, state)
    return {k: state[k] for k in ("t", "u", "v", "prim_id", "geom_id")}


def occluded(dev, rays):
    """Any-hit query; returns a bool mask (True = blocked)."""
    hit = traverse(dev, rays, any_hit=True)
    return hit["prim_id"] >= 0


def intersect_bruteforce(dev, rays, any_hit=False):
    """O(B x T) all-triangles oracle (the 'Embree role' from SURVEY.md §4).
    Closest hit with lowest-t; ties broken by lowest packet/lane index."""
    P = dev["tris"].shape[0]
    m = dev["tris"].shape[1] // 14
    B = rays["org"].shape[0]

    def scan_packet(carry, row):
        t_best, u_b, v_b, p_b, g_b = carry
        # reuse _leaf_test with a 1-row table indexed at 0
        lhit, lt, lu, lv, lprim, lgeom, _ = _leaf_test(
            {"tris": row[None]}, rays, jnp.zeros(B, jnp.int32), t_best)
        t_masked = jnp.where(lhit, lt, jnp.inf)
        lane = jnp.argmin(t_masked, axis=1)
        lane_oh = lane[:, None] == jnp.arange(m)[None, :]
        upd = jnp.any(lhit, axis=1) & (
            jnp.min(t_masked, axis=1) < t_best)

        def pick(x):
            return jnp.sum(jnp.where(lane_oh, x, 0), axis=1)

        return ((jnp.where(upd, pick(lt), t_best),
                 jnp.where(upd, pick(lu), u_b),
                 jnp.where(upd, pick(lv), v_b),
                 jnp.where(upd, pick(lprim), p_b),
                 jnp.where(upd, pick(lgeom), g_b)), None)

    init = (rays["tmax"], jnp.zeros(B, jnp.float32),
            jnp.zeros(B, jnp.float32), jnp.full(B, -1, jnp.int32),
            jnp.full(B, -1, jnp.int32))
    (t, u, v, p, g), _ = jax.lax.scan(scan_packet, init, dev["tris"])
    return {"t": t, "u": u, "v": v, "prim_id": p, "geom_id": g}


__all__ = ["make_rays", "traverse", "occluded", "bvh_to_device",
           "intersect_bruteforce", "STACK_DEPTH"]
