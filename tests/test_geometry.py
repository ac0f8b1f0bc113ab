"""Geometry primitive tests against analytic cases."""

import jax.numpy as jnp
import numpy as np

from raytracer_odin_tpu.ops import geometry


def A(*xs):
    return jnp.asarray(xs, jnp.float32)


def test_triangle_hit_center():
    # unit right triangle in z=2 plane
    p, u, v = A(0, 0, 2), A(1, 0, 0), A(0, 1, 0)
    o, d = A(0.25, 0.25, 0), A(0, 0, 1)
    t, bu, bv, ok = geometry.intersect_triangle(o, d, p, u, v)
    assert bool(ok) and abs(float(t) - 2) < 1e-6
    assert abs(float(bu) - 0.25) < 1e-6 and abs(float(bv) - 0.25) < 1e-6


def test_triangle_miss_outside():
    p, u, v = A(0, 0, 2), A(1, 0, 0), A(0, 1, 0)
    for oxy in [(0.8, 0.8), (-0.1, 0.5), (0.5, -0.1)]:
        o = A(oxy[0], oxy[1], 0)
        _, _, _, ok = geometry.intersect_triangle(o, A(0, 0, 1), p, u, v)
        assert not bool(ok)


def test_triangle_behind_has_negative_t():
    p, u, v = A(0, 0, -2), A(1, 0, 0), A(0, 1, 0)
    t, _, _, ok = geometry.intersect_triangle(A(0.2, 0.2, 0), A(0, 0, 1), p, u, v)
    assert bool(ok) and float(t) < 0  # caller filters on t>0


def test_triangle_parallel_degenerate():
    p, u, v = A(0, 0, 2), A(1, 0, 0), A(0, 1, 0)
    t, _, _, ok = geometry.intersect_triangle(A(0, 0, 0), A(1, 0, 0), p, u, v)
    # parallel ray: det=0 -> inf/nan; comparisons must reject
    assert not bool(ok) or not np.isfinite(float(t))


def test_aabb_basic():
    o = A(0, 0, 0)
    inv = 1.0 / A(0, 0, 1)
    t, hit = geometry.intersect_aabb(o, inv, A(-1, -1, 2), A(1, 1, 3), jnp.float32(1e30))
    assert bool(hit) and abs(float(t) - 2) < 1e-6


def test_aabb_inside_starts_at_zero():
    o = A(0, 0, 0)
    inv = 1.0 / A(0, 0, 1)
    t, hit = geometry.intersect_aabb(o, inv, A(-1, -1, -1), A(1, 1, 1), jnp.float32(1e30))
    assert bool(hit) and float(t) == 0.0


def test_aabb_behind_misses():
    o = A(0, 0, 5)
    inv = 1.0 / A(0, 0, 1)
    _, hit = geometry.intersect_aabb(o, inv, A(-1, -1, 2), A(1, 1, 3), jnp.float32(1e30))
    assert not bool(hit)


def test_aabb_pruned_by_max_t():
    o = A(0, 0, 0)
    inv = 1.0 / A(0, 0, 1)
    _, hit = geometry.intersect_aabb(o, inv, A(-1, -1, 2), A(1, 1, 3), jnp.float32(1.0))
    assert not bool(hit)


def test_aabb_axis_parallel_on_boundary():
    # ray along +z exactly on the x-boundary plane of the box
    o = A(1, 0, 0)
    inv = 1.0 / A(0, 0, 1)
    t, hit = geometry.intersect_aabb(o, inv, A(-1, -1, 2), A(1, 1, 3), jnp.float32(1e30))
    # 0 * inf NaN handling must not crash; boundary hit either way is fine
    assert t.dtype == jnp.float32


def test_triangle_batch_shapes():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    o = jnp.zeros((10, 3))
    d = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    t, bu, bv, ok = geometry.intersect_triangle(o, d, p, u, v)
    assert t.shape == (10,)
