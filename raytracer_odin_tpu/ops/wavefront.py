"""Persistent wavefront pool with stream compaction.

The batched trace (ops/integrator.py) advances every pixel's path in
lockstep, so by the late bounces most lanes are dead but still occupy VPU
slots (measured alive fractions on the demo scene: 1.0, 0.81, 0.54, 0.38,
0.26, 0.18, 0.12, 0.085 — mean path length 3.37 of depth 8). This module is
the north-star wavefront form (BASELINE.json): a fixed pool of P lanes over
an HBM-resident work queue of (sample, pixel) items. Each iteration:

  refill:  dead lanes take the next queue items (rank via cumsum of the dead
           mask — stream compaction without dynamic shapes) and emit camera
           rays;
  cast:    coherence-sorted bundle-culled intersect (dead lanes degenerate);
  shade:   shared eval_bounce logic; radiance/throughput update; kill rule;
  flush:   lanes whose path just finished scatter their radiance into the
           per-pixel Sample_Stats accumulators.

Total work is ~(items * mean_path_length) / P iterations instead of
depth iterations at full width.

RNG uses the exact same per-(sample, bounce, pixel) counter chain as the
batched path — base -> sample -> tag -> pixel — so the pool consumes the
identical sample set; the paths are just scheduled differently (results
agree to ~1 ULP: different XLA programs fuse/FMA differently).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops import texture, traverse
from raytracer_odin_tpu.ops.integrator import TraceOptions, eval_bounce
from raytracer_odin_tpu.utils import prng
from raytracer_odin_tpu.utils.math3d import normalize

JITTER_TAG = prng.JITTER_TAG  # shared with render/runtime.sample_pass

# Per-lane uniforms addressed by (sample, tag, stream id) counters — the
# same prng.uniforms the batched integrator uses, which is what makes the
# pool consume the identical sample set as the batched path.
_lane_uniforms = prng.uniforms


def _camera_rays(cam_pos, cam_basis, fov_x, width, height, pixel, jitter):
    """Per-lane camera ray for flat pixel ids (row-major image order;
    matches render/runtime.generate_rays)."""
    r = (pixel // width).astype(jnp.float32)
    c = (pixel % width).astype(jnp.float32)
    py = (height - 1.0) - r
    aspect = width / height
    tan_fx = jnp.tan(fov_x / 2.0)
    tan_fy = tan_fx / aspect
    x = c + jitter[:, 0]
    y = py + jitter[:, 1]
    ndc_x = x / (width / 2.0) - 1.0
    ndc_y = y / (height / 2.0) - 1.0
    v = jnp.stack([ndc_x * tan_fx, ndc_y * tan_fy, jnp.ones_like(ndc_x)], axis=-1)
    # HIGHEST precision: see runtime.generate_rays — TPU's default bf16
    # matmul would quantize ray directions (and break pool/batch parity).
    d = normalize(
        jnp.matmul(v, cam_basis.T, precision=jax.lax.Precision.HIGHEST),
        eps=1e-20,
    )
    o = jnp.broadcast_to(cam_pos, d.shape)
    return o, d


class PoolStats(NamedTuple):
    """Flat [N, 3]/[N] accumulator slices updated by the pool."""

    first: jax.Array
    last: jax.Array
    total: jax.Array
    total_sq: jax.Array


def render_pool_step(scene, pstats: PoolStats, base_key, sample_start,
                     *, width: int, height: int, fov_x: float, samples: int,
                     pool_size: int, opts: TraceOptions):
    """Render `samples` spp for the full image through a pool of
    `pool_size` lanes; returns (updated PoolStats, rays_cast int32 scalar —
    live path segments, same accounting as the batched trace).
    `sample_start` is the global spp offset (traced)."""
    n_pixels = width * height
    total_items = samples * n_pixels
    P = pool_size
    has_lights = scene.light_p.shape[0] > 0
    env_tex = scene.env_tex
    opts_fov = fov_x

    def cond(state):
        (next_item, alive, *_rest) = state
        return (next_item < total_items) | jnp.any(alive)

    def body(state):
        (next_item, alive, lane_bounce, lane_sample, lane_pixel,
         o, d, throughput, radiance, rays, pstats) = state

        # ---- refill: dead lanes pull queue items -------------------------
        dead = ~alive
        ranks = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
        item = next_item + ranks
        take = dead & (item < total_items)
        new_sample = item // n_pixels
        new_pixel = item % n_pixels

        lane_sample = jnp.where(take, new_sample, lane_sample)
        lane_pixel = jnp.where(take, new_pixel, lane_pixel)
        lane_bounce = jnp.where(take, 0, lane_bounce)

        jitter = _lane_uniforms(
            base_key,
            sample_start + lane_sample,
            jnp.full((P,), JITTER_TAG, jnp.int32),
            lane_pixel,
            2,
        )
        cam_o, cam_d = _camera_rays(
            scene.cam_pos, scene.cam_basis, opts_fov, width, height,
            lane_pixel, jitter,
        )
        o = jnp.where(take[:, None], cam_o, o)
        d = jnp.where(take[:, None], cam_d, d)
        throughput = jnp.where(take[:, None], 1.0, throughput)
        radiance = jnp.where(take[:, None], 0.0, radiance)
        alive = alive | take
        next_item = next_item + jnp.sum(take.astype(jnp.int32))

        # ---- cast + shade -------------------------------------------------
        rays = rays + jnp.sum(alive.astype(jnp.int32))
        t, tri_idx, _bu, _bv = traverse.cast_rays(
            scene, o, d,
            intersector=opts.intersector,
            brute_chunk=opts.brute_chunk,
            brute_max_tris=opts.brute_max_tris,
            sort=opts.sort_rays,
            alive=alive,
        )
        hit = (tri_idx >= 0) & alive
        missed = (~(tri_idx >= 0)) & alive

        if env_tex >= 0:
            env = texture.sample_env(scene, d, env_tex)
            radiance = radiance + jnp.where(
                missed[:, None], throughput * env, 0.0
            )

        uniforms = _lane_uniforms(
            base_key, sample_start + lane_sample, lane_bounce, lane_pixel, 6
        )
        ev = eval_bounce(scene, o, d, t, tri_idx, uniforms, opts,
                         has_lights)
        radiance = radiance + jnp.where(
            hit[:, None], throughput * ev["material"]["emission"], 0.0
        )
        depth_ok = lane_bounce < opts.depth - 1
        cont = ev["cont"] & hit & depth_ok
        throughput = jnp.where(
            cont[:, None], throughput * ev["value"] / ev["pdf"][:, None],
            throughput,
        )
        o = jnp.where(hit[:, None], ev["material"]["pos"], o)
        d = jnp.where(cont[:, None], ev["new_d"], d)
        lane_bounce = lane_bounce + alive.astype(jnp.int32)

        # ---- flush completed paths ----------------------------------------
        died = alive & ~cont
        alive = cont

        pix = jnp.where(died, lane_pixel, 0)
        contrib = jnp.where(died[:, None], radiance, 0.0)
        total = pstats.total.at[pix].add(contrib)
        total_sq = pstats.total_sq.at[pix].add(contrib * contrib)
        # first/last boundary samples, written via scatter-ADD of
        # (value - old). Why this is exact and race-free:
        #  * "first" is sample 0 of a pixel, "last" is sample spp-1 — each
        #    exists once per pixel per render, and a lane dies exactly once
        #    per path, so at most ONE lane in this wave carries a given
        #    pixel's boundary sample (is_first/is_last true).
        #  * for that lane, old + (value - old) = value: the add IS an
        #    assignment; no other wave ever touches that (pixel, slot)
        #    again, so the value persists.
        #  * all non-carrying lanes are redirected to pixel 0 with a ZERO
        #    addend (jnp.where masks both value and old), so their
        #    accumulated contribution to pixel 0 is exactly 0 even though
        #    many of them collide there.
        # An assignment-scatter (.at[].set) would be wrong here: colliding
        # dummy lanes at pixel 0 would overwrite its real value with
        # garbage, while colliding ZERO-adds are harmless.
        is_first = died & (sample_start + lane_sample == 0)
        first = pstats.first.at[jnp.where(is_first, lane_pixel, 0)].add(
            jnp.where(is_first[:, None], radiance - pstats.first[jnp.where(is_first, lane_pixel, 0)], 0.0)
        )
        is_last = died & (lane_sample == samples - 1)
        last_pix = jnp.where(is_last, lane_pixel, 0)
        last = pstats.last.at[last_pix].add(
            jnp.where(is_last[:, None], radiance - pstats.last[last_pix], 0.0)
        )
        pstats = PoolStats(first=first, last=last, total=total, total_sq=total_sq)

        return (next_item, alive, lane_bounce, lane_sample, lane_pixel,
                o, d, throughput, radiance, rays, pstats)

    init = (
        jnp.int32(0),
        jnp.zeros((P,), bool),
        jnp.zeros((P,), jnp.int32),
        jnp.zeros((P,), jnp.int32),
        jnp.zeros((P,), jnp.int32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (P, 1)),
        jnp.ones((P, 3), jnp.float32),
        jnp.zeros((P, 3), jnp.float32),
        jnp.zeros((), jnp.int32),
        pstats,
    )
    state = jax.lax.while_loop(cond, body, init)
    return state[-1], state[-2]
