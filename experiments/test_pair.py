"""Parity checks for the retired pair-layout kernel experiment
(experiments/pallas_pair.py). Run standalone:

  python experiments/test_pair.py

These lived in tests/test_traversal.py while the kernel was a
production candidate; the kernel was retired (ROADMAP round-2: serial
floor) and moved to experiments/, so its checks moved with it and no
longer run in CI."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rodent_tpu.accel import build_bvh                     # noqa: E402
from rodent_tpu.traversal.api import make_rays, traverse   # noqa: E402
from experiments.pallas_pair import pair_device, traverse_pair  # noqa: E402


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


def test_pair_kernel_matches_api():
    """The pair-layout kernel (v3, interpret mode on CPU) must agree
    exactly with api.traverse — hits, uv, ids, and any-hit occlusion —
    including its MXU-broadcast and vector-stack machinery."""
    verts, idx = random_tri_soup(257, seed=47)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = pair_device(bvh)
    rays = random_rays(300, seed=49)  # non-multiple of tile size
    a = traverse(dev, rays)
    b = traverse_pair(dev, rays, tile_rays=256)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-5, rtol=1e-6)
    for k in ("u", "v"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                  np.asarray(b["prim_id"]))
    np.testing.assert_array_equal(np.asarray(a["geom_id"]),
                                  np.asarray(b["geom_id"]))
    rays2 = random_rays(256, seed=51, tmax=2.0)
    wa = np.asarray(traverse(dev, rays2, any_hit=True)["prim_id"]) >= 0
    ga = np.asarray(traverse_pair(dev, rays2, any_hit=True,
                                  tile_rays=256)["prim_id"]) >= 0
    np.testing.assert_array_equal(wa, ga)


def test_pair_kernel_deep_tree():
    """Multi-packet leaf chains + a deep unbalanced subtree: the vector
    stack must hold one entry per pending node, and leaf chains walk
    packet by packet until the end flag."""
    r = np.random.RandomState(83)
    # clustered soup makes deep subtrees + >8-tri leaves after DP merge
    base = np.repeat(r.randn(40, 3) * 5.0, 20, axis=0).astype(np.float32)
    verts = np.concatenate([
        base, base + r.randn(800, 3).astype(np.float32) * 0.02,
        base + r.randn(800, 3).astype(np.float32) * 0.02])
    idx = np.stack([np.arange(800), np.arange(800) + 800,
                    np.arange(800) + 1600,
                    np.zeros(800)], 1).astype(np.int32).reshape(-1)
    bvh = build_bvh(verts, idx, arity=8, packet=8)
    dev = pair_device(bvh)
    rays = random_rays(512, seed=85)
    a = traverse(dev, rays)
    b = traverse_pair(dev, rays, tile_rays=512)
    np.testing.assert_allclose(np.asarray(a["t"]), np.asarray(b["t"]),
                               atol=1e-5, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a["prim_id"]),
                                  np.asarray(b["prim_id"]))


if __name__ == "__main__":
    test_pair_kernel_matches_api()
    print("pair kernel parity: ok")
    test_pair_kernel_deep_tree()
    print("pair kernel deep tree: ok")
