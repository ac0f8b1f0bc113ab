"""Ray-primitive intersection tests, vectorized over ray batches.

Reference semantics (raytracer.odin:105-209):
  * ray-AABB: slab test returning entry distance, with hits behind the ray
    rejected (`t2 < 0`) and entry clamped to 0.
  * ray-triangle: solve [u v -d] x = o - p for (u, v, t) — implemented here
    in the algebraically identical Cramer/Moller-Trumbore form; reject when
    u < 0, v < 0 or u + v > 1; `inside` = dot(ng, d) > 0.

All functions broadcast over leading batch axes; the last axis is xyz.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_odin_tpu.utils.math3d import dot

RAY_EPS = 1e-3  # origin offset, raytracer.odin:418
BIG = jnp.float32(3.0e38)


def intersect_aabb(o, inv_d, lo, hi, max_t):
    """Slab test (check_intersect_ray_aabb, raytracer.odin:119-134).

    Args:
      o: ray origins [..., 3]
      inv_d: 1 / ray directions [..., 3] (precomputed; IEEE inf on zeros)
      lo, hi: box corners [..., 3]
      max_t: current best hit distance [...] — used to prune boxes fully
        behind the best hit (pruning only affects traversal cost, never the
        final hit, same as the reference's conservative max_dist check).

    Returns (t_entry, hit_mask).
    """
    t1 = (lo - o) * inv_d
    t2 = (hi - o) * inv_d
    # NaNs from 0 * inf (ray parallel and on the slab boundary): treat the
    # pair as (-inf, +inf) so the other axes decide, matching the reference's
    # f32 division semantics closely enough for closed boxes.
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    t_near = jnp.max(jnp.where(jnp.isnan(tmin), -BIG, tmin), axis=-1)
    t_far = jnp.min(jnp.where(jnp.isnan(tmax), BIG, tmax), axis=-1)
    hit = (t_near <= t_far) & (t_far >= 0) & (jnp.maximum(t_near, 0.0) <= max_t)
    return jnp.maximum(t_near, 0.0), hit


def intersect_triangle(o, d, p, u, v):
    """Moller-Trumbore solve of o + t*d = p + bu*u + bv*v
    (intersect_ray_triangle, raytracer.odin:136-150).

    Returns (t, bu, bv, valid) where valid reflects only the barycentric
    test; callers apply their own t predicates (`t > 0` for nearest-hit,
    `t >= 0` for the light-pdf sum, shading.odin:55).
    """
    pvec = jnp.cross(d, v)
    det = dot(u, pvec)
    inv_det = 1.0 / det  # inf/NaN on degenerate; comparisons reject below
    tvec = o - p
    bu = dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, u)
    bv = dot(d, qvec) * inv_det
    t = dot(v, qvec) * inv_det
    valid = (bu >= 0) & (bv >= 0) & (bu + bv <= 1)
    return t, bu, bv, valid


def aabb_of_triangles(p, u, v):
    """Per-triangle AABB (aabb_of_triangle, raytracer.odin:197-204).
    Host-side numpy or jnp."""
    import numpy as np

    pts = np.stack([p, p + u, p + v], axis=1)
    return pts.min(axis=1), pts.max(axis=1)
