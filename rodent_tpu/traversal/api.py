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
Child ordering uses an argsort by entry distance — the data-parallel
equivalent of the reference's sorting-network stack sort
(src/traversal/stack.impala:59-123).

The same function doubles as the "pure-XLA reference traversal" oracle
(SURVEY.md §4: the Embree-device role) — a brute-force all-triangles
intersector is also provided for small scenes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .primitives import (empty_hit, intersect_ray_box_soa, intersect_ray_tri,
                         make_rays)

STACK_DEPTH = 64  # matches src/traversal/stack.impala:53 (Stack of 64)


def bvh_to_device(bvh):
    """WideBvh (numpy) -> dict of jnp arrays used by traverse/occluded."""
    return {
        "bounds": jnp.asarray(bvh.bounds),     # (Nn, 6, A)
        "child": jnp.asarray(bvh.child),       # (Nn, A)
        "tri_v0": jnp.asarray(bvh.tri_v0),     # (Np, M, 3)
        "tri_e1": jnp.asarray(bvh.tri_e1),
        "tri_e2": jnp.asarray(bvh.tri_e2),
        "tri_n": jnp.asarray(bvh.tri_n),
        "prim_id": jnp.asarray(bvh.prim_id),   # (Np, M)
        "geom_id": jnp.asarray(bvh.geom_id),
    }


def _leaf_step(dev, rays, pidx, t_cur, tmin, active):
    """Intersects one Tri4 packet per ray. Returns per-ray best-lane
    (hit, t, u, v, prim, geom) and the is_last flag of the packet."""
    v0 = dev["tri_v0"][pidx]          # (B, M, 3)
    e1 = dev["tri_e1"][pidx]
    e2 = dev["tri_e2"][pidx]
    n = dev["tri_n"][pidx]
    pid = dev["prim_id"][pidx]        # (B, M)
    gid = dev["geom_id"][pidx]

    hit, t, u, v = intersect_ray_tri(
        rays["org"][:, None], rays["dir"][:, None],
        tmin[:, None], t_cur[:, None], v0, e1, e2, n)
    hit &= (pid != -1) & active[:, None]

    t_masked = jnp.where(hit, t, jnp.inf)
    lane = jnp.argmin(t_masked, axis=1)
    b = jnp.arange(t.shape[0])
    best_hit = jnp.take_along_axis(hit, lane[:, None], 1)[:, 0]
    best = {
        "hit": best_hit,
        "t": t[b, lane],
        "u": u[b, lane],
        "v": v[b, lane],
        "prim": pid[b, lane] & 0x7FFFFFFF,
        "geom": gid[b, lane],
    }
    is_last = pid[:, -1] < 0
    return best, is_last


def traverse(dev, rays, any_hit=False):
    """Closest-hit (any_hit=False) or first-hit/occlusion (any_hit=True)
    traversal. rays: dict from make_rays with (B,)-batched fields.
    Returns hit dict {t, u, v, prim_id, geom_id} — prim_id == -1 on miss,
    t == original tmax on miss (empty_hit semantics)."""
    B = rays["org"].shape[0]
    arity = dev["child"].shape[1]

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
        code = jnp.where(active, stack[barange, top], 0)
        sptr = jnp.where(active, sptr - 1, sptr)

        is_node = code > 0
        is_leaf = code < 0

        # ---- wide node step ----
        nidx = jnp.where(is_node, code - 1, 0)
        bounds = dev["bounds"][nidx]                  # (B, 6, A)
        children = dev["child"][nidx]                 # (B, A)
        entry, exit_ = intersect_ray_box_soa(
            rays["inv_dir"], rays["inv_org"], rays["tmin"], t_cur, bounds)
        chit = (entry <= exit_) & (children != 0) & is_node[:, None]

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
        best, is_last = _leaf_step(dev, rays, pidx, t_cur, rays["tmin"],
                                   is_leaf)
        upd = best["hit"]
        t_cur = jnp.where(upd, best["t"], t_cur)
        new = {
            "t": t_cur,
            "u": jnp.where(upd, best["u"], state["u"]),
            "v": jnp.where(upd, best["v"], state["v"]),
            "prim_id": jnp.where(upd, best["prim"], state["prim_id"]),
            "geom_id": jnp.where(upd, best["geom"], state["geom_id"]),
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
    v0 = dev["tri_v0"]  # (P, M, 3)
    P, M, _ = v0.shape
    org = rays["org"][:, None, None]
    dir = rays["dir"][:, None, None]
    tmin = rays["tmin"][:, None, None]
    tmax = rays["tmax"][:, None, None]
    hit, t, u, v = intersect_ray_tri(org, dir, tmin, tmax,
                                     v0[None], dev["tri_e1"][None],
                                     dev["tri_e2"][None], dev["tri_n"][None])
    valid = dev["prim_id"][None] != -1
    hit &= valid
    t_m = jnp.where(hit, t, jnp.inf).reshape(t.shape[0], -1)
    flat = jnp.argmin(t_m, axis=1)
    b = jnp.arange(t.shape[0])
    anyh = hit.reshape(t.shape[0], -1)[b, flat]
    pi, li = flat // M, flat % M
    return {
        "t": jnp.where(anyh, t[b, pi, li], rays["tmax"]),
        "u": jnp.where(anyh, u[b, pi, li], 0.0),
        "v": jnp.where(anyh, v[b, pi, li], 0.0),
        "prim_id": jnp.where(anyh, dev["prim_id"][pi, li] & 0x7FFFFFFF, -1),
        "geom_id": jnp.where(anyh, dev["geom_id"][pi, li], -1),
    }


__all__ = ["make_rays", "traverse", "occluded", "bvh_to_device",
           "intersect_bruteforce", "STACK_DEPTH"]
