"""Sub-linear many-light pdf sums: Morton-clustered lights + a Pallas
cluster-sum kernel.

The reference keeps the summed-light-pdf walk tractable for many lights
with a dedicated light BVH (shading.odin:62-94). The dense TPU replacement
(ops/shading.light_pdf_sum) is exact but O(L) per lane per bounce; at city
scale (thousands of emitters) that dominates shading. This module is the
TPU-native analogue of the light BVH:

  * host side: lights are sorted by the Morton code of their centroid and
    grouped into LEAF_L-sized clusters with AABBs (models/build.py) — the
    flattened, two-level equivalent of the reference's light-BVH spatial
    hierarchy;
  * device side: each RB-ray block conservatively culls light clusters by
    slab test in dense XLA (ops/culling.cull_clusters: any t >= 0 entry
    counts, matching the pdf walk's "every emissive triangle hit along the
    ray" rule), and the Pallas kernel sums fac * t^2/|ng.d| over only the
    listed clusters.

Extra clusters admitted by the conservative bundle cull contribute exactly
zero (their triangles miss), so the culled sum equals the dense sum up to
fp association and the kernel's Newton-refined reciprocal (~1e-7
relative); tests/test_lightcull.py checks both scale and parity.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_odin_tpu.ops import culling
from raytracer_odin_tpu.ops import pallas_intersect as pi
from raytracer_odin_tpu.ops.geometry import BIG, RAY_EPS

LEAF_L = 32  # lights per cluster (finer than the 64-triangle clusters:
             # emitters are sparse, tight boxes cull better)

# Dense O(L) sweep below this light count; the culled path above it.
def threshold() -> int:
    return int(os.environ.get("RT_TPU_LIGHT_CULL_MIN", "512"))


def morton_order(centroids: np.ndarray) -> np.ndarray:
    """Sort order by 30-bit Morton code of normalized centroids."""
    if len(centroids) == 0:
        return np.zeros(0, np.int64)
    lo = centroids.min(axis=0)
    # uniform scale: per-axis normalization would let a geometrically thin
    # axis (e.g. near-constant height) contribute pure noise bits that
    # destroy locality on the real axes
    span = max(float((centroids.max(axis=0) - lo).max()), 1e-20)
    q = np.clip(((centroids - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return np.argsort(code, kind="stable")


def pack_light_rows(p, u, v, ng, fac) -> np.ndarray:
    """[Lpad, 16] f32 rows (Morton-ordered input): p(3) u(3) v(3) ng(3)
    fac(1) valid(1) pad(2); padded with invalid rows to a LEAF_L multiple."""
    n = len(p)
    npad = max(-(-n // LEAF_L) * LEAF_L, LEAF_L)
    rows = np.zeros((npad, 16), np.float32)
    if n:
        rows[:n, 0:3] = p
        rows[:n, 3:6] = u
        rows[:n, 6:9] = v
        rows[:n, 9:12] = ng
        rows[:n, 12] = fac
        rows[:n, 13] = 1.0
    return rows


def light_cluster_aabbs(rows: np.ndarray):
    """Per-cluster AABBs over the packed rows ([C,3] lo, [C,3] hi);
    padding clusters collapse to (BIG, -BIG)."""
    npad = rows.shape[0]
    c = npad // LEAF_L
    p = rows[:, 0:3].reshape(c, LEAF_L, 3)
    u = rows[:, 3:6].reshape(c, LEAF_L, 3)
    v = rows[:, 6:9].reshape(c, LEAF_L, 3)
    valid = rows[:, 13].reshape(c, LEAF_L, 1) > 0.5
    corners = np.stack([p, p + u, p + v], axis=2)  # [c, LEAF_L, 3, 3]
    big = np.broadcast_to(np.float32(BIG), corners.shape)
    lo = np.where(valid[..., None], corners, big).min(axis=(1, 2))
    hi = np.where(valid[..., None], corners, -big).max(axis=(1, 2))
    return lo.astype(np.float32), hi.astype(np.float32)


def _kernel(counts_ref, lists_ref, rays_ref, lt_ref, out_ref, *,
            n_clusters: int):
    """Per ray block: sum fac * t^2/|ng.d| over every valid light triangle
    hit (t >= 0) in the block's cluster list. Branch-free sweep like the
    intersect kernel (ops/pallas_intersect._culled_kernel)."""
    b = pl.program_id(0)
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]

    count = counts_ref[b]
    overflow = count < 0
    n = jnp.where(overflow, n_clusters, count)

    def body(k, acc):
        cid = jnp.where(
            overflow, k, lists_ref[b, jnp.minimum(k, lists_ref.shape[1] - 1)]
        )
        base = cid * LEAF_L

        def col(j):
            return lt_ref[pl.ds(base, LEAF_L), j:j + 1]  # (LEAF_L, 1)

        px, py, pz = col(0), col(1), col(2)
        ux, uy, uz = col(3), col(4), col(5)
        vx, vy, vz = col(6), col(7), col(8)
        ngx, ngy, ngz = col(9), col(10), col(11)
        fac = col(12)
        valid = col(13)

        pvx = dy * vz - dz * vy
        pvy = dz * vx - dx * vz
        pvz = dx * vy - dy * vx
        det = ux * pvx + uy * pvy + uz * pvz
        inv = pi._rcp(det)
        tx = ox - px
        ty = oy - py
        tz = oz - pz
        bu = (tx * pvx + ty * pvy + tz * pvz) * inv
        qx = ty * uz - tz * uy
        qy = tz * ux - tx * uz
        qz = tx * uy - ty * ux
        bv = (dx * qx + dy * qy + dz * qz) * inv
        t = (vx * qx + vy * qy + vz * qz) * inv

        ok = (bu >= 0) & (bv >= 0) & (bu + bv <= 1) & (t >= 0) & (valid > 0.5)
        # true division: |ng.d| == 0 must give +inf (kept, kills the path
        # via the value/pdf cutoff exactly like the dense path/reference)
        w = t * t / jnp.abs(ngx * dx + ngy * dy + ngz * dz)
        contrib = jnp.where(ok, fac * w, 0.0)
        contrib = jnp.where(jnp.isnan(contrib), 0.0, contrib)
        return acc + jnp.sum(contrib, axis=0, keepdims=True)

    acc = jax.lax.fori_loop(0, n, body, jnp.zeros((1, pi.RB), jnp.float32))
    out_ref[:] = jnp.concatenate(
        [acc] + [jnp.zeros((7, pi.RB), jnp.float32)], axis=0
    )


def _culled_call(counts, lists, rays, light_rows):
    npad = rays.shape[1]
    n_clusters = light_rows.shape[0] // LEAF_L
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npad // pi.RB,),
        in_specs=[
            pl.BlockSpec((8, pi.RB), lambda b, c, l: (0, b)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, pi.RB), lambda b, c, l: (0, b)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_clusters=n_clusters),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        interpret=pi._interpret(),
    )(counts, lists, rays, light_rows)


def light_pdf_sum_culled(scene, o, d, cap: int = 128):
    """Culled equivalent of ops/shading.light_pdf_sum (same semantics:
    RAY_EPS offset, t >= 0 hits, fac * t^2/|ng.d|, NaN guard, / L)."""
    n_lights = int(scene.light_p.shape[0])
    o = o + d * RAY_EPS
    batch_shape = o.shape[:-1]
    o2 = o.reshape(-1, 3)
    d2 = d.reshape(-1, 3)
    n = o2.shape[0]
    npad = ((n + pi.RB - 1) // pi.RB) * pi.RB
    o_p = jnp.pad(o2, ((0, npad - n), (0, 0)), constant_values=BIG)
    d_p = jnp.pad(d2, ((0, npad - n), (0, 0)))
    o_lo, o_hi, d_lo, d_hi = culling.block_bounds(o_p, d_p)
    mask, near = culling.cull_clusters(
        o_lo, o_hi, d_lo, d_hi, scene.light_cluster_lo, scene.light_cluster_hi
    )
    counts, lists = culling.build_lists(mask, cap=cap)
    rays, _, _ = pi.pack_rays(o2, d2)
    # Scalar-prefetch lists live in SMEM (~1 MB): chunk ray blocks exactly
    # like pallas_intersect.intersect_culled — at 1080p the unchunked
    # counts+lists (4050 blocks x (cap+1) i32) are ~2 MB and crash the
    # device, which a small render never exercises.
    nb = npad // pi.RB
    max_blocks = max(
        64, pi.SMEM_BUDGET_BYTES // (4 * (pi._smem_cols(cap) + 1))
    )
    if nb <= max_blocks:
        out = _culled_call(counts, lists, rays, scene.light_rows)
    else:
        n_chunks = -(-nb // max_blocks)
        per = -(-nb // n_chunks)
        pieces = []
        for s in range(0, nb, per):
            e = min(nb, s + per)
            pieces.append(
                _culled_call(
                    counts[s:e], lists[s:e],
                    jax.lax.slice_in_dim(
                        rays, s * pi.RB, e * pi.RB, axis=1
                    ),
                    scene.light_rows,
                )
            )
        out = jnp.concatenate(pieces, axis=1)
    total = out[0, :n].reshape(batch_shape)
    return total / n_lights
