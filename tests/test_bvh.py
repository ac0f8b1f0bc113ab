"""BVH build + traversal tests.

The load-bearing test is hit parity: the stackless flattened traversal must
return exactly the same nearest hit as the brute-force intersector for random
scenes and random rays, for every ray octant.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_odin_tpu.ops import bvh as bvh_mod
from raytracer_odin_tpu.ops import traverse
from raytracer_odin_tpu.ops.geometry import aabb_of_triangles
from raytracer_odin_tpu.models.scene import DeviceBVH, DeviceScene
from raytracer_odin_tpu.models import build as build_mod
from raytracer_odin_tpu.models.scene import HostScene, HostMaterial

from tests.conftest import random_triangles


def make_scene(p, u, v):
    """Minimal DeviceScene with just geometry + BVH for traversal tests."""
    host = HostScene()
    n = p.shape[0]
    ng = np.cross(u, v)
    ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    host.p, host.u, host.v, host.ng = p, u, v, ng.astype(np.float32)
    host.n1 = host.n2 = host.n3 = ng.astype(np.float32)
    host.tex1 = host.tex2 = host.tex3 = np.zeros((n, 2), np.float32)
    host.tan1 = host.tan2 = host.tan3 = np.zeros((n, 4), np.float32)
    host.mat_index = np.zeros(n, np.int32)
    host.materials = [HostMaterial()]
    return build_mod.finish_scene(host)


def check_parity(scene, o, d):
    tb, ib, ub, vb = traverse.cast_rays_brute(scene, jnp.asarray(o), jnp.asarray(d))
    tv, iv, uv, vv = traverse.cast_rays_bvh(scene, jnp.asarray(o), jnp.asarray(d))
    tb, ib = np.asarray(tb), np.asarray(ib)
    tv, iv = np.asarray(tv), np.asarray(iv)
    hit_b = ib >= 0
    hit_v = iv >= 0
    assert np.array_equal(hit_b, hit_v), "hit/miss mismatch"
    # The same triangle, or an equal-t duplicate; compare by distance.
    assert np.allclose(tb[hit_b], tv[hit_b], rtol=1e-5, atol=1e-5)
    same = ib == iv
    # allow different index only at exactly equal t (shared edges)
    diff = hit_b & ~same
    assert np.allclose(tb[diff], tv[diff], rtol=1e-4, atol=1e-4)


def test_traversal_parity_random():
    rng = np.random.default_rng(0)
    p, u, v = random_triangles(rng, 300)
    scene = make_scene(p, u, v)
    o = rng.uniform(-8, 8, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    check_parity(scene, o, d)


def test_traversal_parity_axis_rays():
    """Axis-aligned rays hit the NaN slab-test edge cases and all octants."""
    rng = np.random.default_rng(1)
    p, u, v = random_triangles(rng, 100)
    scene = make_scene(p, u, v)
    dirs = []
    for sx in (-1.0, 1.0):
        for axis in range(3):
            e = np.zeros(3, np.float32)
            e[axis] = sx
            dirs += [e] * 20
    d = np.stack(dirs)
    o = rng.uniform(-8, 8, (d.shape[0], 3)).astype(np.float32)
    check_parity(scene, o, d)


def test_traversal_all_octants():
    rng = np.random.default_rng(2)
    p, u, v = random_triangles(rng, 200)
    scene = make_scene(p, u, v)
    for ox in range(8):
        sign = np.array(
            [-1 if ox & 1 else 1, -1 if ox & 2 else 1, -1 if ox & 4 else 1],
            np.float32,
        )
        d = np.abs(rng.normal(size=(64, 3))).astype(np.float32) * sign
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = rng.uniform(-8, 8, (64, 3)).astype(np.float32)
        check_parity(scene, o, d)


def test_single_and_few_triangles():
    rng = np.random.default_rng(3)
    for n in (1, 2, 4, 5):
        p, u, v = random_triangles(rng, n)
        scene = make_scene(p, u, v)
        o = rng.uniform(-8, 8, (64, 3)).astype(np.float32)
        d = rng.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        check_parity(scene, o, d)


def test_builder_native_python_equivalence():
    from raytracer_odin_tpu.io import native
    if native.load() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(4)
    p, u, v = random_triangles(rng, 120)
    lo, hi = aabb_of_triangles(p, u, v)
    nat = bvh_mod.build_flat_bvh(lo, hi)
    perm, nodes = bvh_mod._build_py(lo.astype(np.float32), hi.astype(np.float32), bvh_mod.LEAF_SIZE)
    flo, fhi, ffirst, fcount, fhit, fmiss = bvh_mod._flatten_py(nodes)
    assert nat.num_nodes == flo.shape[0]
    assert np.array_equal(nat.perm, perm)
    assert np.allclose(nat.lo, flo)
    assert np.allclose(nat.hi, fhi)
    assert np.array_equal(nat.first, ffirst)
    assert np.array_equal(nat.count, fcount)
    assert np.array_equal(nat.hit_link, fhit)
    assert np.array_equal(nat.miss_link, fmiss)


def test_bvh_structure_invariants():
    rng = np.random.default_rng(5)
    p, u, v = random_triangles(rng, 200)
    lo, hi = aabb_of_triangles(p, u, v)
    f = bvh_mod.build_flat_bvh(lo, hi)
    B = f.num_nodes
    # every triangle appears exactly once across leaves
    covered = np.zeros(200, bool)
    for i in range(B):
        c = f.count[i]
        if c > 0:
            assert c <= bvh_mod.LEAF_SIZE
            sl = f.perm[f.first[i] : f.first[i] + c]
            assert not covered[sl].any()
            covered[sl] = True
    assert covered.all()
    # node boxes contain their leaf triangles
    for i in range(B):
        c = f.count[i]
        if c > 0:
            sl = f.perm[f.first[i] : f.first[i] + c]
            assert np.all(f.lo[i] <= lo[sl] + 1e-4)
            assert np.all(f.hi[i] >= hi[sl] - 1e-4)
    # per octant: the always-hit walk (node -> hit_link) visits every node
    # exactly once and terminates at the sentinel B — the defining property
    # of a DFS order with skip links
    for oct_ in range(8):
        seen = set()
        node = 0
        while node < B:
            assert node not in seen
            seen.add(node)
            node = int(f.hit_link[oct_, node])
        assert node == B
        assert len(seen) == B
        # miss links always point forward in visit order or to the sentinel
        assert np.all(f.miss_link[oct_] <= B)


def test_empty_bvh():
    f = bvh_mod.build_flat_bvh(np.zeros((0, 3)), np.zeros((0, 3)))
    assert f.num_nodes == 1 and f.count[0] == 0
