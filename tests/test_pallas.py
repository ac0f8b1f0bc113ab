"""Pallas intersector tests (interpreter mode on CPU): parity with the
reference-semantics intersectors, culling conservativeness, tiling."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_odin_tpu.ops import culling, traverse
from raytracer_odin_tpu.ops import pallas_intersect as pi
from tests.conftest import random_triangles
from tests.test_bvh import make_scene


def rays(rng, n, spread=8):
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("culled", [False, True])
def test_pallas_matches_brute(culled):
    rng = np.random.default_rng(0)
    p, u, v = random_triangles(rng, 150)
    scene = make_scene(p, u, v)
    o, d = rays(rng, 600)
    tb, ib, ub, vb = traverse.cast_rays_brute(scene, o, d)
    tp, ip, _, _ = traverse.cast_rays_pallas(scene, o, d, culled=culled)
    tb, ib = np.asarray(tb), np.asarray(ib)
    tp, ip = np.asarray(tp), np.asarray(ip)
    assert np.array_equal(ib >= 0, ip >= 0)
    hit = ib >= 0
    assert np.allclose(tb[hit], tp[hit], rtol=1e-4, atol=1e-4)
    same = ib == ip
    # index can differ only at exactly-equal t (shared edges)
    assert np.allclose(tb[hit & ~same], tp[hit & ~same], rtol=1e-4, atol=1e-4)
    # The kernel returns only the hit decision; barycentrics are recomputed
    # at shade time from the shade_row's triangle geometry
    # (integrator._point_material) — validate that the row carries the
    # right geometry by recomputing them here and comparing against the
    # brute intersector's analytic barycentrics.
    row = np.asarray(scene.shade_row)[np.maximum(ip, 0)]
    spec = dict(scene.row_spec)
    pp = row[:, spec["tri_p"]:spec["tri_p"] + 3]
    uu = row[:, spec["tri_u"]:spec["tri_u"] + 3]
    vv = row[:, spec["tri_v"]:spec["tri_v"] + 3]
    oo = np.asarray(o) + np.asarray(d) * traverse.RAY_EPS
    pv = np.cross(np.asarray(d), vv)
    det = np.sum(uu * pv, axis=-1)
    tvec = oo - pp
    with np.errstate(divide="ignore", invalid="ignore"):
        bu2 = np.sum(tvec * pv, axis=-1) / det
        qv = np.cross(tvec, uu)
        bv2 = np.sum(np.asarray(d) * qv, axis=-1) / det
    ok = same & hit
    assert np.allclose(np.asarray(ub)[ok], bu2[ok], rtol=1e-3, atol=1e-4)
    assert np.allclose(np.asarray(vb)[ok], bv2[ok], rtol=1e-3, atol=1e-4)


def test_pallas_sorted_matches_unsorted():
    """Coherence sorting must not change any result, and dead lanes must
    come back as misses."""
    rng = np.random.default_rng(7)
    p, u, v = random_triangles(rng, 120)
    scene = make_scene(p, u, v)
    o, d = rays(rng, 700)
    alive = jnp.asarray(rng.random(700) < 0.7)
    t0, i0, u0, v0 = traverse.cast_rays_pallas(scene, o, d, culled=True, sort=False)
    t1, i1, u1, v1 = traverse.cast_rays_pallas(
        scene, o, d, culled=True, sort=True, alive=alive
    )
    live = np.asarray(alive)
    assert np.array_equal(np.asarray(i0)[live], np.asarray(i1)[live])
    assert np.allclose(np.asarray(t0)[live], np.asarray(t1)[live], rtol=1e-5, atol=1e-5)
    # dead lanes: degenerate rays -> misses
    assert np.all(np.asarray(i1)[~live] == -1)


def test_pallas_tiled_image_path():
    """[H, W] ray grids go through the tile permutation; results must land
    back at the right pixels."""
    rng = np.random.default_rng(1)
    p, u, v = random_triangles(rng, 60)
    scene = make_scene(p, u, v)
    h, w = 32, 64  # divisible by 16x32 tiles
    o = jnp.asarray(rng.uniform(-8, 8, (h, w, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(h, w, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tb, ib, _, _ = traverse.cast_rays_brute(scene, o, d)
    tp, ip, _, _ = traverse.cast_rays_pallas(scene, o, d, culled=True)
    assert np.array_equal(np.asarray(ib) >= 0, np.asarray(ip) >= 0)
    hit = np.asarray(ib) >= 0
    assert np.allclose(np.asarray(tb)[hit], np.asarray(tp)[hit], rtol=1e-4, atol=1e-4)


def test_cull_clusters_conservative():
    """Per-ray AABB hits must be a subset of the bundle-level cull result."""
    from raytracer_odin_tpu.ops.geometry import aabb_of_triangles, intersect_aabb

    rng = np.random.default_rng(2)
    p, u, v = random_triangles(rng, 256)
    scene = make_scene(p, u, v)
    n = pi.RB  # one block
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o_lo, o_hi, d_lo, d_hi = culling.block_bounds(jnp.asarray(o), jnp.asarray(d))
    mask, _near = culling.cull_clusters(
        o_lo, o_hi, d_lo, d_hi, scene.cluster_lo, scene.cluster_hi
    )
    mask = np.asarray(mask)[0]
    # per-ray ground truth
    clo = np.asarray(scene.cluster_lo)
    chi = np.asarray(scene.cluster_hi)
    inv = 1.0 / d
    _, per_ray = jax.jit(intersect_aabb)(
        jnp.asarray(o)[:, None], jnp.asarray(inv)[:, None],
        jnp.asarray(clo)[None], jnp.asarray(chi)[None],
        jnp.full((n, 1), 3e38),
    )
    truly_hit = np.asarray(per_ray).any(axis=0)
    assert np.all(mask | ~truly_hit), "bundle cull dropped a hittable cluster"


def test_build_lists():
    mask = jnp.asarray([[True, False, True, False], [False, False, False, True]])
    counts, lists = culling.build_lists(mask)
    assert counts.tolist() == [2, 1]
    assert lists[0, :2].tolist() == [0, 2]
    assert lists[1, 0].tolist() == 3


def test_axis_aligned_rays_pallas():
    rng = np.random.default_rng(3)
    p, u, v = random_triangles(rng, 80)
    scene = make_scene(p, u, v)
    dirs = []
    for sx in (-1.0, 1.0):
        for axis in range(3):
            e = np.zeros(3, np.float32)
            e[axis] = sx
            dirs += [e] * 12
    d = jnp.asarray(np.stack(dirs))
    o = jnp.asarray(rng.uniform(-8, 8, (d.shape[0], 3)), jnp.float32)
    tb, ib, _, _ = traverse.cast_rays_brute(scene, o, d)
    tp, ip, _, _ = traverse.cast_rays_pallas(scene, o, d, culled=True)
    assert np.array_equal(np.asarray(ib) >= 0, np.asarray(ip) >= 0)
    hit = np.asarray(ib) >= 0
    assert np.allclose(np.asarray(tb)[hit], np.asarray(tp)[hit], rtol=1e-4, atol=1e-4)


def test_cluster_mask_kernel_matches_xla():
    """The Pallas mask kernel bit-for-bit matches the XLA reference
    formulation (culling.ray_cluster_masks), including axis-parallel rays
    and dead (far) lanes."""
    rng = np.random.default_rng(7)
    p, u, v = random_triangles(rng, 200)  # several clusters
    scene = make_scene(p, u, v)
    c = scene.cluster_lo.shape[0]
    c_pad = -(-c // 32) * 32
    aabb8 = np.zeros((c_pad, 8), np.float32)
    aabb8[:, 0:3] = pi.BIG
    aabb8[:, 3:6] = -pi.BIG
    aabb8[:c, 0:3] = np.asarray(scene.cluster_lo)
    aabb8[:c, 3:6] = np.asarray(scene.cluster_hi)

    n = 70
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[5] = [1.0, 0.0, 0.0]   # axis-parallel
    d[6] = [0.0, -1.0, 0.0]
    o[7] = pi.BIG            # dead far lane
    d[7] = [1.0, 0.0, 0.0]

    want = np.asarray(
        culling.ray_cluster_masks(
            jnp.asarray(o), jnp.asarray(d), scene.cluster_lo, scene.cluster_hi
        )
    )
    got = np.asarray(pi.cluster_masks(jnp.asarray(aabb8), jnp.asarray(o), jnp.asarray(d)))
    w = want.shape[1]
    assert np.array_equal(got[:, :w], want), (got[:5], want[:5])
    # dead lane: no REAL cluster bits (padding-cluster bits are never
    # consumed — unpack_mask stops at C — and may legitimately be set:
    # the swapped slab test treats inverted padding boxes as unbounded)
    real_bits = (1 << c) - 1
    assert int(got[7, 0]) & real_bits == 0
    # with n_clusters passed, pad bits are zeroed — the contract
    # _lex_sort_keys' header fold and dead-lane compaction depend on
    trimmed = np.asarray(
        pi.cluster_masks(jnp.asarray(aabb8), jnp.asarray(o), jnp.asarray(d), c)
    )
    assert np.array_equal(trimmed[:, :w] & real_bits, got[:, :w] & real_bits)
    used_last = c - (w - 1) * 32
    for col in range(w):
        hi_mask = ~((1 << (used_last if col == w - 1 else 32)) - 1)
        assert (trimmed[:, col] & hi_mask == 0).all()


def test_cluster_mask_kernel_many_words():
    """Mask kernel beyond the 8-row/256-bit sublane minimum (large scenes
    or RT_TPU_MAX_EXACT > 256 run 13+ words): bit-for-bit parity with the
    XLA reference over 410 clusters = 13 words."""
    rng = np.random.default_rng(23)
    c = 410  # 13 words, beyond the 8-row minimum out block
    lo = rng.uniform(-8, 8, (c, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.2, 3.0, (c, 3)).astype(np.float32)
    c_pad = -(-c // 32) * 32
    aabb8 = np.zeros((c_pad, 8), np.float32)
    aabb8[:, 0:3] = pi.BIG
    aabb8[:, 3:6] = -pi.BIG
    aabb8[:c, 0:3] = lo
    aabb8[:c, 3:6] = hi

    n = 80
    o = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    want = np.asarray(
        culling.ray_cluster_masks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(lo), jnp.asarray(hi)
        )
    )
    assert want.shape[1] == 13
    got = np.asarray(
        pi.cluster_masks(jnp.asarray(aabb8), jnp.asarray(o), jnp.asarray(d), c)
    )
    assert got.shape[1] >= 13
    # Compare real cluster bits only: the XLA reference leaves pad bits
    # (>= c) set — inverted padding boxes test as unbounded — while the
    # kernel with n_clusters zeroes them (the _lex_sort_keys contract).
    used_last = c - 12 * 32
    gotu = got[:, :13].view(np.uint32) if got.dtype == np.int32 else got
    wantu = want.view(np.uint32)
    for w in range(13):
        real = np.uint32((1 << (used_last if w == 12 else 32)) - 1)
        assert np.array_equal(gotu[:, w] & real, wantu[:, w] & real), w
    # trimmed kernel: no bits above the real clusters in the last word
    assert (gotu[:, 12] & ~np.uint32((1 << used_last) - 1) == 0).all()


def test_two_phase_matches_single_phase(monkeypatch):
    """t-bounded two-phase culling (TWO_PHASE_K) returns the same hits as
    the single-sweep exact path: identical hit/miss and t; index may differ
    only where t ties exactly (shared edges — same rule as between
    intersectors)."""
    rng = np.random.default_rng(11)
    p, u, v = random_triangles(rng, 300)
    scene = make_scene(p, u, v)
    n = 2 * pi.RB
    o, d = rays(rng, n)
    # presorted contract: RB-aligned lane count, any order is legal
    g, n_super, aabb8 = traverse.exact_cull_layout(scene)
    o_off = o + d * traverse.RAY_EPS
    rows, _, _ = pi.pack_rays(o_off, d)
    words = pi.cluster_masks_rows(aabb8, rows, n_super)

    t0, i0, u0, v0 = traverse.cast_presorted(scene, o, d, words=words)
    monkeypatch.setattr(traverse, "TWO_PHASE_K", 2)
    t1, i1, u1, v1 = traverse.cast_presorted(scene, o, d, words=words)

    t0, t1 = np.asarray(t0), np.asarray(t1)
    i0, i1 = np.asarray(i0), np.asarray(i1)
    assert np.array_equal(i0 >= 0, i1 >= 0)
    hit = i0 >= 0
    assert np.allclose(t0[hit], t1[hit], rtol=1e-6, atol=1e-6)
    same = i0 == i1
    # index flips only at exact-t ties
    assert np.allclose(t0[hit & ~same], t1[hit & ~same], rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(u0)[hit & same], np.asarray(u1)[hit & same],
                       rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(v0)[hit & same], np.asarray(v1)[hit & same],
                       rtol=1e-4, atol=1e-5)
