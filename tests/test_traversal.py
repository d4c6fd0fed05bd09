"""BVH build + traversal tests: the batched XLA traversal must agree with
the brute-force all-triangles oracle (the reference's Embree-device role,
SURVEY.md §4) on closest-hit distance for random and structured scenes."""
import numpy as np
import jax.numpy as jnp
import pytest

from rodent_tpu.accel import build_bvh, WideBvh
from rodent_tpu.io import formats, obj
from rodent_tpu.traversal.api import (bvh_to_device, intersect_bruteforce,
                                      make_rays, occluded, traverse)

REF = "/root/reference/testing"


def random_tri_soup(n, seed=0):
    r = np.random.RandomState(seed)
    base = r.randn(n, 3).astype(np.float32) * 2.0
    v0 = base
    v1 = base + r.randn(n, 3).astype(np.float32) * 0.5
    v2 = base + r.randn(n, 3).astype(np.float32) * 0.5
    verts = np.concatenate([v0, v1, v2]).astype(np.float32)
    idx = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n,
                    r.randint(0, 5, n)], axis=1).astype(np.int32)
    return verts, idx.reshape(-1)


def random_rays(n, seed=1, tmin=0.0, tmax=1e30):
    r = np.random.RandomState(seed)
    org = r.randn(n, 3).astype(np.float32) * 3.0
    d = r.randn(n, 3).astype(np.float32)
    return make_rays(org, d, np.full(n, tmin, np.float32),
                     np.full(n, tmax, np.float32))


def check_match(bvh, rays, atol=1e-3):
    dev = bvh_to_device(bvh)
    got = traverse(dev, rays)
    want = intersect_bruteforce(dev, rays)
    got_t = np.asarray(got["t"])
    want_t = np.asarray(want["t"])
    np.testing.assert_allclose(got_t, want_t, atol=atol, rtol=1e-4)
    # same hit/miss classification
    np.testing.assert_array_equal(np.asarray(got["prim_id"]) >= 0,
                                  np.asarray(want["prim_id"]) >= 0)
    return got, want


def test_bvh_invariants_random():
    verts, idx = random_tri_soup(300)
    bvh = build_bvh(verts, idx, arity=8)
    assert bvh.arity == 8
    # every original tri appears at least once among valid lanes (SBVH
    # spatial splits may duplicate references, bvh.h:497-539)
    pid = bvh.prim_id.reshape(-1)
    valid = pid != -1
    real = pid[valid] & 0x7FFFFFFF
    assert set(real.tolist()) == set(range(300))
    # child encoding: inner refs in range, leaf refs in range
    ch = bvh.child.reshape(-1)
    inner = ch[ch > 0]
    leaf = ch[ch < 0]
    assert (inner - 1 < bvh.num_nodes).all()
    assert ((~leaf) < bvh.num_packets).all()
    # empty slots have inverted (inf) bounds
    empty = bvh.child == 0
    assert (bvh.bounds[:, 0, :][empty] == np.inf).all()


@pytest.mark.parametrize("arity", [2, 4, 8])
def test_traversal_matches_bruteforce_random(arity):
    verts, idx = random_tri_soup(257, seed=3)
    bvh = build_bvh(verts, idx, arity=arity, packet=4)
    rays = random_rays(512, seed=7)
    check_match(bvh, rays)


def test_traversal_cornell_primary():
    mesh, _, _ = obj.load_scene_mesh(f"{REF}/cornell_box.obj")
    bvh = build_bvh(mesh.vertices, mesh.indices, arity=8)
    # primary rays from the reference camera (--eye 0 1 2.7 --dir 0 0 -1)
    W = H = 32
    xs = (np.arange(W) + 0.5) / W * 2 - 1
    ys = 1 - (np.arange(H) + 0.5) / H * 2
    kx, ky = np.meshgrid(xs, ys)
    w = np.tan(np.radians(60.0) / 2)
    d = np.stack([kx * w, ky * w, -np.ones_like(kx)], axis=-1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    org = np.tile(np.asarray([[0.0, 1.0, 2.7]], np.float32), (W * H, 1))
    rays = make_rays(org, d.astype(np.float32),
                     np.zeros(W * H, np.float32),
                     np.full(W * H, 1e30, np.float32))
    got, want = check_match(bvh, rays)
    # everything should hit inside the box
    assert (np.asarray(got["prim_id"]) >= 0).all()
    # geom ids = material ids, in range
    g = np.asarray(got["geom_id"])
    assert g.min() >= 1 and g.max() <= 8


def test_tmin_tmax_respected():
    verts, idx = random_tri_soup(64, seed=5)
    bvh = build_bvh(verts, idx)
    dev = bvh_to_device(bvh)
    rays_near = random_rays(128, seed=9, tmin=0.0, tmax=0.5)
    got = traverse(dev, rays_near)
    t = np.asarray(got["t"])
    hit = np.asarray(got["prim_id"]) >= 0
    assert (t[hit] <= 0.5).all()
    # miss t stays at tmax
    np.testing.assert_allclose(t[~hit], 0.5, atol=0)


def test_occluded_agrees_with_closest():
    verts, idx = random_tri_soup(200, seed=11)
    bvh = build_bvh(verts, idx)
    dev = bvh_to_device(bvh)
    rays = random_rays(256, seed=13, tmax=2.0)
    blocked = np.asarray(occluded(dev, rays))
    closest = np.asarray(traverse(dev, rays)["prim_id"]) >= 0
    np.testing.assert_array_equal(blocked, closest)


def test_bvh_survives_file_roundtrip(tmp_path):
    verts, idx = random_tri_soup(100, seed=17)
    bvh = build_bvh(verts, idx, arity=8)
    p = tmp_path / "s.bvh"
    formats.write_bvh(p, bvh.to_block())
    back = WideBvh.from_block(formats.read_bvh(p, formats.BVH8_TRI4))
    rays = random_rays(128, seed=19)
    a = traverse(bvh_to_device(bvh), rays)
    b = traverse(bvh_to_device(back), rays)
    np.testing.assert_array_equal(np.asarray(a["t"]), np.asarray(b["t"]))
    np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                  np.asarray(b["prim_id"]))


def test_single_triangle_uv():
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2, 0], np.int32)
    bvh = build_bvh(verts, idx)
    dev = bvh_to_device(bvh)
    org = np.asarray([[0.25, 0.25, 1.0], [0.6, 0.3, -2.0], [2.0, 2.0, 1.0]],
                     np.float32)
    d = np.asarray([[0, 0, -1], [0, 0, 1], [0, 0, -1]], np.float32)
    rays = make_rays(org, d, np.zeros(3, np.float32),
                     np.full(3, 1e30, np.float32))
    hit = traverse(dev, rays)
    t = np.asarray(hit["t"])
    np.testing.assert_allclose(t[:2], [1.0, 2.0], atol=1e-6)
    assert np.asarray(hit["prim_id"])[2] == -1
    # barycentric convention: u along v0->v1, v along v0->v2
    np.testing.assert_allclose(np.asarray(hit["u"])[0], 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit["v"])[0], 0.25, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hit["u"])[1], 0.6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit["v"])[1], 0.3, atol=1e-5)


def test_tiled_matches_api():
    """The tile-layout production traversal must agree exactly with the
    reference-layout api.traverse on hits and distances."""
    from rodent_tpu.traversal.tiled import occluded_tiled, traverse_tiled
    verts, idx = random_tri_soup(257, seed=23)
    bvh = build_bvh(verts, idx, arity=8)
    dev = bvh_to_device(bvh)
    # 300 rays: not a multiple of 128, exercises tile padding
    rays = random_rays(300, seed=29)
    a = traverse(dev, rays)
    b = traverse_tiled(dev, rays)
    np.testing.assert_array_equal(np.asarray(a["t"]), np.asarray(b["t"]))
    np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                  np.asarray(b["prim_id"]))
    np.testing.assert_array_equal(np.asarray(a["geom_id"]),
                                  np.asarray(b["geom_id"]))
    np.testing.assert_array_equal(np.asarray(a["u"]), np.asarray(b["u"]))
    rays2 = random_rays(256, seed=31, tmax=2.0)
    blocked_a = np.asarray(occluded(dev, rays2))
    blocked_b = np.asarray(occluded_tiled(dev, rays2))
    np.testing.assert_array_equal(blocked_a, blocked_b)


def test_dense_matches_api():
    """The dense small-scene engine (traversal.dense: brute-force every
    Tri packet, no BVH walk) must agree with api.traverse: identical
    prim/geom ids (same closest hit on tie-free scenes) and t/u/v equal
    to float ULPs (XLA contracts the mul+add chains into FMAs
    differently between the two program shapes). Covers dead slots
    (tmax < tmin), tile padding (ray count not a multiple of 128), and
    any-hit occlusion."""
    from rodent_tpu.traversal.dense import traverse_dense
    verts, idx = random_tri_soup(100, seed=61)   # 13 Tri8 packets
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=67)             # exercises padding
    rays["tmax"] = rays["tmax"].at[::5].set(-1.0)  # dead slots
    a = traverse(dev, rays)
    b = traverse_dense(dev, rays)
    for k in ("prim_id", "geom_id"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    for k in ("t", "u", "v"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-5, atol=1e-6)
    rays2 = random_rays(256, seed=71, tmax=2.0)
    blocked_a = np.asarray(occluded(dev, rays2))
    blocked_b = np.asarray(
        traverse_dense(dev, rays2, any_hit=True)["prim_id"]) >= 0
    np.testing.assert_array_equal(blocked_a, blocked_b)


def test_tiled_staged_compaction_matches():
    """compact_stages > 0 (staged-halving row compaction with hit
    scatter-back) must be exactly equal to the single-stage loop: the
    cascade only re-partitions which while_loop iteration serves a ray,
    never the traversal math."""
    from rodent_tpu.traversal.tiled import traverse_tiled
    verts, idx = random_tri_soup(300, seed=47)
    bvh = build_bvh(verts, idx, arity=8)
    dev = bvh_to_device(bvh)
    # 1500 rays -> 12 rows: several halvings incl. a non-power-of-two
    # tail row; mixed live/dead from the start (some tmax < tmin)
    rays = random_rays(1500, seed=53)
    rays["tmax"] = rays["tmax"].at[::7].set(-1.0)
    for any_hit in (False, True):
        base = traverse_tiled(dev, rays, any_hit=any_hit)
        got = traverse_tiled(dev, rays, any_hit=any_hit, compact_stages=6)
        if any_hit:
            np.testing.assert_array_equal(
                np.asarray(base["prim_id"]) >= 0,
                np.asarray(got["prim_id"]) >= 0)
        else:
            for k in ("t", "u", "v", "prim_id", "geom_id"):
                np.testing.assert_array_equal(np.asarray(base[k]),
                                              np.asarray(got[k]))


def test_octant_sort_preserves_results():
    from rodent_tpu.traversal.sorting import sort_rays
    verts, idx = random_tri_soup(200, seed=41)
    bvh = build_bvh(verts, idx)
    dev = bvh_to_device(bvh)
    rays = random_rays(512, seed=43)
    base = traverse(dev, rays)
    lo = verts.min(0)
    hi = verts.max(0)
    sorted_rays, perm = sort_rays(rays, lo, hi)
    inv = np.argsort(np.asarray(perm))
    got = traverse(dev, sorted_rays)
    np.testing.assert_array_equal(np.asarray(got["t"])[inv],
                                  np.asarray(base["t"]))
    np.testing.assert_array_equal(np.asarray(got["prim_id"])[inv],
                                  np.asarray(base["prim_id"]))
    # sorted keys are non-decreasing, and octants group contiguously
    # WITHIN each coarse origin cell (org9-major key: cell, then octant,
    # then direction cone)
    from rodent_tpu.traversal.sorting import ray_octant, ray_sort_keys
    keys = np.asarray(ray_sort_keys(sorted_rays["org"],
                                    sorted_rays["dir"], lo, hi))
    assert (np.diff(keys.astype(np.int64)) >= 0).all()
    cells = keys >> 23
    octs = np.asarray(ray_octant(sorted_rays["dir"]))
    same_cell = np.diff(cells) == 0
    assert (np.diff(octs)[same_cell] >= 0).all()


def test_packet_kernel_matches_api():
    """The Pallas shared-stack packet kernel (interpret mode on CPU) must
    agree exactly with api.traverse, including any-hit."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)  # non-multiple of tile size
    a = traverse(dev, rays)
    b = traverse_packet(dev, rays, tile_rows=16)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-5, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                  np.asarray(b["prim_id"]))
    rays2 = random_rays(256, seed=51, tmax=2.0)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    ga = np.asarray(traverse_packet(dev, rays2, any_hit=True,
                                    tile_rows=16)["prim_id"]) >= 0
    np.testing.assert_array_equal(wa, ga)


def test_packet_kernel_carry_top_matches_api():
    """The round-5 carry-top body (_kernel_ct: next pop rides the
    while carry, stack.impala:25-50 trick; min-fold child select; fused
    FMA slab) must agree exactly with api.traverse in every mode
    combination, including any-hit and the HBM/giga DMA paths."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)
    rays2 = random_rays(256, seed=51, tmax=2.0)
    a = traverse(dev, rays)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    for kw in ({"select": "fold"},
               {"select": "sort"},
               {"select": "fold", "fma_slab": False},
               {"select": "fold", "tris_hbm": True},
               {"select": "fold", "tris_hbm": True, "nodes_hbm": True},
               {"select": "fold", "tris_hbm": True, "nodes_hbm": True,
                "prefetch": True}):
        b = traverse_packet(dev, rays, tile_rows=4, carry_top=True, **kw)
        np.testing.assert_allclose(np.asarray(a["t"]),
                                   np.asarray(b["t"]),
                                   atol=1e-5, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                      np.asarray(b["prim_id"]))
        ga = np.asarray(traverse_packet(dev, rays2, any_hit=True,
                                        tile_rows=4, carry_top=True,
                                        **kw)["prim_id"]) >= 0
        np.testing.assert_array_equal(wa, ga)
    # pop counters work in the carry-top body too (counted harness path)
    from rodent_tpu.traversal import pallas_packet as pp
    packed, nt = pp.pack_rays(rays, 4)
    outs = pp._call_kernel(dev, packed, nt, 4, False, False,
                           count_pops=True, carry_top=True)
    cnt = np.asarray(outs[5])
    assert int(cnt[::8, 0].sum()) > 0          # total pops counted
    assert int(cnt[1::8, 0].sum()) > 0         # leaf pops counted


def test_packet_kernel_tri16_matches_api():
    """Tri16 leaf packets (14*16 = 224 floats = TWO VMEM lines per row,
    fetched by one async copy in the HBM modes — the big-scene leaf-DMA
    halving, VERDICT r4 item 3) must agree exactly with api.traverse in
    every kernel body, including any-hit and prefetch."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=16, leaf_threshold=32)
    assert bvh.tri_v0.shape[1] == 16
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)
    rays2 = random_rays(256, seed=51, tmax=2.0)
    a = traverse(dev, rays)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    for kw in ({},                                      # VMEM, legacy
               {"tris_hbm": True, "prefetch": True},    # legacy + DMA
               {"carry_top": True, "tris_hbm": True, "prefetch": True},
               {"multi": 2, "tris_hbm": True, "prefetch": True}):
        b = traverse_packet(dev, rays, tile_rows=4, **kw)
        np.testing.assert_allclose(np.asarray(a["t"]),
                                   np.asarray(b["t"]),
                                   atol=1e-5, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                      np.asarray(b["prim_id"]))
        ga = np.asarray(traverse_packet(dev, rays2, any_hit=True,
                                        tile_rows=4,
                                        **kw)["prim_id"]) >= 0
        np.testing.assert_array_equal(wa, ga)


def test_tiled_waterfall_hooks_preserve_results():
    """The waterfall diagnostics (fixed_iters schedule pinning and the
    result-preserving ablations) must not change hits: 'leafalways' and
    'nosort' are semantically neutral; fixed_iters >= the free-running
    trip count drains completely."""
    from rodent_tpu.traversal.tiled import traverse_tiled
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)
    a = traverse(dev, rays)
    cnt = traverse_tiled(dev, rays, debug_counters=True)
    trips = int(cnt["counters"]["iters"])
    # leafalways drains at least as fast as the gated loop, so pinning
    # the schedule past the free-running trip count still drains fully;
    # nosort changes the pop ORDER (more trips possible) so it runs free
    for kw in (dict(ablate=("leafalways",), fixed_iters=trips + 8,
                    debug_counters=True),
               dict(ablate=("nosort",), debug_counters=True)):
        b = traverse_tiled(dev, rays, **kw)
        np.testing.assert_allclose(np.asarray(a["t"]),
                                   np.asarray(b["t"]),
                                   atol=1e-5, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                      np.asarray(b["prim_id"]))
    # sequential sub-batches (lockstep-tail bound at chunk granularity)
    # must be hit-exact, with and without staged compaction inside each
    # chunk; needs >= 8 rows per chunk, so a bigger batch (R = 32 rows)
    rays4k = random_rays(4096, seed=53)
    a4 = traverse(dev, rays4k)
    for kw in (dict(sub_batches=2),
               dict(sub_batches=4, compact_stages=3)):
        b = traverse_tiled(dev, rays4k, **kw)
        np.testing.assert_allclose(np.asarray(a4["t"]),
                                   np.asarray(b["t"]),
                                   atol=1e-5, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a4["prim_id"]),
                                      np.asarray(b["prim_id"]))


def test_packet_kernel_multi_matches_api():
    """The multi-tile kernel (n independent tiles per grid step with
    interleaved pop chains — the VLIW-packing variant) must agree exactly
    with api.traverse, including any-hit and with tris_hbm."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)  # non-multiple of the 2-tile block
    a = traverse(dev, rays)
    for kw in ({"multi": 2, "tile_rows": 1},
               {"multi": 4, "tile_rows": 2},
               {"multi": 2, "tile_rows": 2, "tris_hbm": True}):
        b = traverse_packet(dev, rays, **kw)
        np.testing.assert_allclose(np.asarray(a["t"]),
                                   np.asarray(b["t"]),
                                   atol=1e-5, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                      np.asarray(b["prim_id"]))
    rays2 = random_rays(256, seed=51, tmax=2.0)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    ga = np.asarray(traverse_packet(dev, rays2, any_hit=True, multi=2,
                                    tile_rows=1)["prim_id"]) >= 0
    np.testing.assert_array_equal(wa, ga)


def test_packet_kernel_diagnostics_demote_multi():
    """Diagnostic options exist only in the single-tile kernel body; under
    the default multi=2 they must be honored (by demoting to multi=1),
    never silently dropped: an ablated run must actually ablate and a
    counted run must return pop counts."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(256, seed=49)
    base = np.asarray(traverse_packet(dev, rays, multi=2,
                                      tile_rows=2)["prim_id"])
    assert (base >= 0).any()
    abl = np.asarray(traverse_packet(dev, rays, multi=2, tile_rows=2,
                                     ablate=("noleaftest",))["prim_id"])
    # noleaftest skips every triangle test: nothing can hit
    assert not (abl >= 0).any()


def test_packet_kernel_tris_hbm_matches_api():
    """The big-scene mode (triangle table in HBM, one DMA per leaf pop)
    must agree exactly with api.traverse — same walk, different triangle
    row transport."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)
    a = traverse(dev, rays)
    b = traverse_packet(dev, rays, tile_rows=2, tris_hbm=True)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-5, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                  np.asarray(b["prim_id"]))
    rays2 = random_rays(256, seed=51, tmax=2.0)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    ga = np.asarray(traverse_packet(dev, rays2, any_hit=True, tile_rows=2,
                                    tris_hbm=True)["prim_id"]) >= 0
    np.testing.assert_array_equal(wa, ga)


def test_packet_kernel_nodes_hbm_matches_api():
    """The giga-scene mode (node table ALSO in HBM — for >12M-tri scenes
    whose node table exceeds VMEM — one DMA per node pop) must agree
    exactly with api.traverse, alone and combined with tris_hbm, in both
    the single-tile and multi-tile kernel bodies."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)
    a = traverse(dev, rays)
    for kw in ({"multi": 1}, {"multi": 1, "tris_hbm": True},
               {"multi": 2, "tris_hbm": True}):
        b = traverse_packet(dev, rays, tile_rows=2, nodes_hbm=True, **kw)
        np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                                   atol=1e-5, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                      np.asarray(b["prim_id"]))
    rays2 = random_rays(256, seed=51, tmax=2.0)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    ga = np.asarray(traverse_packet(dev, rays2, any_hit=True, tile_rows=2,
                                    nodes_hbm=True, tris_hbm=True,
                                    multi=2)["prim_id"]) >= 0
    np.testing.assert_array_equal(wa, ga)


def test_packet_kernel_prefetch_off_matches_on():
    """The HBM modes' exact next-pop DMA prefetch (double-buffered lines,
    prediction = leaf continuation / first pushed child / stack peek) is
    a pure transport change: hits must be identical with it disabled, in
    both kernel bodies, including the any-hit early exit that leaves a
    predicted copy in flight (drained at loop exit)."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = bvh_to_device(bvh)
    rays = random_rays(300, seed=49)
    for kw in ({"multi": 1, "tris_hbm": True},
               {"multi": 2, "tris_hbm": True, "nodes_hbm": True}):
        a = traverse_packet(dev, rays, tile_rows=2, prefetch=False, **kw)
        b = traverse_packet(dev, rays, tile_rows=2, prefetch=True, **kw)
        np.testing.assert_array_equal(np.asarray(a["t"]),
                                      np.asarray(b["t"]))
        np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                      np.asarray(b["prim_id"]))
    rays2 = random_rays(256, seed=51, tmax=2.0)
    wa = np.asarray(traverse_packet(dev, rays2, any_hit=True, tile_rows=2,
                                    tris_hbm=True, nodes_hbm=True,
                                    prefetch=False)["prim_id"]) >= 0
    ga = np.asarray(traverse_packet(dev, rays2, any_hit=True, tile_rows=2,
                                    tris_hbm=True, nodes_hbm=True,
                                    prefetch=True)["prim_id"]) >= 0
    np.testing.assert_array_equal(wa, ga)


def chain_bvh(depth, arity=4):
    """Hand-built adversarial BVH: a depth-long chain where every node has
    one inner child and one single-tri leaf, and ALL boxes overlap — a ray
    down the axis pushes both children at every level, so shared-stack
    usage grows linearly with depth (~depth+1 entries). Round-1 kernels
    fixed the stack at 32/64 and silently dropped pushes here."""
    n = depth
    bounds = np.zeros((n, 6, arity), np.float32)
    bounds[:, 0::2, :] = np.inf   # mins of empty slots
    bounds[:, 1::2, :] = -np.inf  # maxs of empty slots
    child = np.zeros((n, arity), np.int32)
    for i in range(n):
        for s in range(2 if i < n - 1 else 1):
            bounds[i, :, s] = [-100, 100, -100, 100, -100, 100]
        if i < n - 1:
            child[i, 0] = i + 2        # inner ref to node i+1
            child[i, 1] = ~i           # leaf packet i
        else:
            child[i, 0] = ~i
    m = 4
    v0 = np.zeros((n, m, 3), np.float32)
    v1 = np.zeros((n, m, 3), np.float32)
    v2 = np.zeros((n, m, 3), np.float32)
    pid = np.full((n, m), -1, np.int32)
    gid = np.zeros((n, m), np.int32)
    for i in range(n):
        z = -(i + 1.0)
        v0[i, 0] = (-10, -10, z)
        v1[i, 0] = (20, -10, z)
        v2[i, 0] = (-10, 20, z)
        pid[i, 0] = i
    e1 = v0 - v1
    e2 = v2 - v0
    nrm = np.cross(e1, e2)
    return WideBvh(arity=arity, packet=m, bounds=bounds, child=child,
                   tri_v0=v0, tri_e1=e1, tri_e2=e2, tri_n=nrm,
                   prim_id=pid, geom_id=gid)


def test_stack_needs_exact_on_chain():
    from rodent_tpu.traversal.api import compute_stack_needs
    bvh = chain_bvh(60)
    shared, node = compute_stack_needs(bvh.child)
    # chain: S(i) = S(i+1) + 1 with S(last) = 1 -> 60; node-only stack
    # holds a single inner child at a time -> 1
    assert shared == 60
    assert node == 1


def test_deep_tree_no_silent_stack_overflow():
    """Adversarial deep BVH (stack need ~60 > the old fixed 32/64): all
    three traversal paths must still produce brute-force-correct hits
    because stacks are now sized from BvhMeta at trace time."""
    from rodent_tpu.traversal.pallas_packet import traverse_packet
    from rodent_tpu.traversal.tiled import traverse_tiled
    bvh = chain_bvh(60)
    dev = bvh_to_device(bvh)
    assert dev["meta"].shared_stack == 60
    n_rays = 64
    r = np.random.RandomState(61)
    org = np.stack([r.uniform(-5, 5, n_rays), r.uniform(-5, 5, n_rays),
                    np.full(n_rays, 1.0)], axis=1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n_rays, 1))
    rays = make_rays(org, d, np.zeros(n_rays, np.float32),
                     np.full(n_rays, 1e30, np.float32))
    want = intersect_bruteforce(dev, rays)
    # every ray must find the NEAREST (first) triangle at t == 2.0
    np.testing.assert_allclose(np.asarray(want["t"]), 2.0, atol=1e-6)
    for fn in (traverse, traverse_tiled,
               lambda dv, rs: traverse_packet(dv, rs, tile_rows=1),
               # HBM modes on the chain: every node pushes (inner, leaf)
               # so node/leaf pops interleave — adversarial for the
               # next-pop prefetch's peek prediction
               lambda dv, rs: traverse_packet(dv, rs, tile_rows=1,
                                              tris_hbm=True),
               lambda dv, rs: traverse_packet(dv, rs, tile_rows=1,
                                              tris_hbm=True,
                                              nodes_hbm=True)):
        got = fn(dev, rays)
        np.testing.assert_allclose(np.asarray(got["t"]),
                                   np.asarray(want["t"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got["prim_id"]),
                                      np.asarray(want["prim_id"]))


def test_axis_aligned_rays_negative_origin():
    """Zero direction components + negative origins: the old
    bound*inv_dir + inv_org slab form produced (inf - inf) = NaN and
    silently missed everything (safe_rcp yields +-FLT_MAX for d == 0)."""
    verts = np.asarray([[-4, -4, -1], [4, -4, -1], [-4, 4, -1]], np.float32)
    idx = np.asarray([0, 1, 2, 0], np.int32)
    bvh = build_bvh(verts, idx)
    dev = bvh_to_device(bvh)
    org = np.asarray([[-3.0, -3.0, 1.0], [-2.0, 3.9, 1.0]], np.float32)
    d = np.asarray([[0.0, 0.0, -1.0]] * 2, np.float32)
    rays = make_rays(org, d, np.zeros(2, np.float32),
                     np.full(2, 1e30, np.float32))
    hit = traverse(dev, rays)
    np.testing.assert_allclose(np.asarray(hit["t"])[0], 2.0, atol=1e-6)
    assert np.asarray(hit["prim_id"])[0] == 0


def test_sbvh_spatial_splits_on_skinny_diagonals():
    """Long thin diagonal triangles are the SBVH motivation (Stich et al.
    2009): spatial splits must fire (duplicated refs) and hits must stay
    brute-force-correct. Also checks the fast binned tier agrees."""
    r = np.random.RandomState(71)
    n = 400
    base = r.randn(n, 3).astype(np.float32) * 3.0
    along = r.randn(n, 3).astype(np.float32)
    along /= np.linalg.norm(along, axis=1, keepdims=True)
    v0 = base
    v1 = base + along * 8.0  # long edge
    v2 = base + r.randn(n, 3).astype(np.float32) * 0.05  # skinny
    verts = np.concatenate([v0, v1, v2]).astype(np.float32)
    idx = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n,
                    np.zeros(n)], axis=1).astype(np.int32).reshape(-1)
    sb = build_bvh(verts, idx, arity=8, quality=1)
    fast = build_bvh(verts, idx, arity=8, quality=0)
    dup = int((sb.prim_id.reshape(-1) != -1).sum()) - n
    assert dup > 0, "expected spatial splits to duplicate refs"
    rays = random_rays(512, seed=73)
    check_match(sb, rays)
    a = traverse(bvh_to_device(sb), rays)
    b = traverse(bvh_to_device(fast), rays)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-3, rtol=1e-4)


def test_coincident_degenerate_cluster_builds_and_traverses():
    """>64 coincident zero-area triangles used to drive the DP wide
    collapse into a fixed point (every subtree cost 0 -> the expansion
    returned the node itself -> infinite emit loop) in BOTH builder
    tiers. The guard forces binary expansion; hits must still match the
    brute-force oracle (degenerate tris never intersect: det == 0)."""
    verts = np.zeros((303, 3), np.float32)
    verts[300:] = [[0, 0, 0], [4, 0, 0], [0, 4, 0]]
    idx = np.concatenate(
        [np.stack([np.arange(100) * 3, np.arange(100) * 3 + 1,
                   np.arange(100) * 3 + 2, np.zeros(100, int)], 1),
         [[300, 301, 302, 0]]]).astype(np.int32).reshape(-1)
    for use_native in (True, False):
        bvh = build_bvh(verts, idx, arity=8, packet=8,
                        use_native=use_native, quality=0)
        rays = random_rays(256, seed=91)
        check_match(bvh, rays)


def test_pack_rays_pads_to_tiles():
    """pack_rays pads a non-tile-multiple batch with dead rays (tmax=-1)
    and rounds the tile count up to a multiple of `multi` (the shared
    packer used by traverse_packet and the counted-pop harnesses)."""
    from rodent_tpu.traversal.pallas_packet import pack_rays
    r = np.random.RandomState(7)
    n = 1000  # not a multiple of rows*128
    org = r.randn(n, 3).astype(np.float32)
    d = r.randn(n, 3).astype(np.float32)
    rays = make_rays(org, d, np.zeros(n, np.float32),
                     np.full(n, 9.0, np.float32))
    packed, nt = pack_rays(rays, tile_rows=4, multi=3)
    assert nt % 3 == 0 and nt * 4 * 128 >= n
    assert packed.shape == (11, nt * 4, 128)
    flat_tmax = np.asarray(packed[10]).reshape(-1)
    np.testing.assert_array_equal(flat_tmax[:n], 9.0)
    np.testing.assert_array_equal(flat_tmax[n:], -1.0)
    # real components land unchanged: inv_dir is components 0..2
    np.testing.assert_array_equal(
        np.asarray(packed[3]).reshape(-1)[:n], org[:, 0])
