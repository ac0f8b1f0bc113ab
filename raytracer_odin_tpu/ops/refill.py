"""Cross-sample lane refill: the sorted-ring wavefront scheduler.

The dead-lane-compacted trace (integrator._trace_compacted) slices the
wavefront narrower each bounce, so one sample of depth D still pays D
per-bounce passes, the late ones at small widths where per-pass fixed
costs dominate (trace-measured: the compacted step runs ~1.4x above the
lane-volume-linear prediction). This module removes the per-sample bounce
structure entirely: ONE wavefront of ~constant width processes a whole
step's (pixel x sample) work queue, and lanes freed by dead paths are
topped up with the NEXT sample's camera rays inside the same device step.

This is the persistent wavefront pool's idea (ops/wavefront.py — itself
the classic GPU stream-compaction form) re-executed in the TPU-native
idiom measured fastest in rounds 2-3: no scatters (the pool's flush
scatter-adds serialize at ~40 ns/row), no data-dependent while_loop
(XLA cannot pipeline across waves), no dynamic shapes. Instead:

  * the per-bounce lexicographic coherence sort (dead | octant | exact
    cluster-mask words) already moves dead lanes to a contiguous tail —
    retiring them is a STATIC tail slice, and refilling is a concat;
  * the iteration count and every width are STATIC, planned on the host
    from the same 1-spp alive-count probe that calibrates compaction
    (plan_refill); fluctuation is absorbed by the same margin + overflow
    accounting (overflow => the caller re-renders uncompacted — never a
    biased image);
  * each (pixel, sample) item retires exactly once, so image order is
    restored by ONE merge sort at the end of the step, scatter-free.

RNG is the identical per-(sample, bounce, pixel) counter chain as the
batched trace (prng.uniforms; per-lane sample/bounce/pixel exactly like
the pool), so the refill scheduler consumes the same sample set — results
match the batched path up to XLA fusion/reassociation rounding.

Reference analogue: the work queue IS the reference's atomic tile/sample
counter (raytracer.odin:550-560) — its threads pull (tile, sample-chunk)
items as they finish paths; here lanes pull (pixel, sample) items as
their paths die, with the sort playing the role of the queue.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops import traverse
from raytracer_odin_tpu.ops.geometry import BIG, RAY_EPS
from raytracer_odin_tpu.ops.integrator import TraceOptions, _shade_vertex
from raytracer_odin_tpu.ops.wavefront import _camera_rays
from raytracer_odin_tpu.utils import prng


class RefillPlan(NamedTuple):
    """Static per-iteration schedule (host-planned; see plan_refill).

    fresh[k]: lanes appended before iteration k's sort (multiple of RB).
    keep[k]:  width after iteration k's sort slice (multiple of RB); the
              tail [keep[k], N_k + fresh[k]) must be dead lanes (checked
              on device via the overflow counter).
    """

    fresh: tuple
    keep: tuple


def plan_refill(counts, n_pixels: int, n_samples: int, depth: int,
                rb: int, margin: float, width: int | None = None
                ) -> RefillPlan:
    """Plan static refill/keep widths from measured per-bounce alive counts.

    counts: alive lanes entering bounce b (length >= depth) for one full
    sample — the same probe auto_lane_schedule uses. The plan evolves the
    expected wavefront composition with the measured conditional survival
    rates (a fluid model): each iteration refills the predicted free lanes
    (keeping `margin` + 2*rb of headroom so live lanes are ~never cut) and
    keeps alive_pred * margin + 2*rb lanes after the sort. Drain runs
    `depth` iterations past the last refill — by then every lane has had
    its full bounce budget and is deterministically dead.

    width: steady-state wavefront width (default: n_pixels padded to rb).
    """
    c = [max(float(x), 0.0) for x in counts[:depth]]
    surv = [
        (c[b + 1] / c[b]) if b + 1 < depth and c[b] > 0 else 0.0
        for b in range(depth)
    ]
    n0 = n_pixels
    w = width if width is not None else -(-n0 // rb) * rb
    w = -(-w // rb) * rb
    total = n_samples * n0

    def up(x):
        return -(-int(x) // rb) * rb

    a = [0.0] * depth  # expected alive entering the iteration, by bounce
    cursor = 0
    since_refill = 0
    n = 0  # current physical width
    fresh_plan = []
    keep_plan = []
    for _ in range(2 * n_samples * (depth + 4) + 2 * depth + 8):  # bound
        alive_pred = sum(a)
        remaining = total - cursor
        # Safe width for the carried lanes alone (margin + 2 blocks slack,
        # like auto_lane_schedule); fresh lanes are a deterministic count
        # and need no margin of their own.
        base = max(rb, up(alive_pred * margin + 2 * rb))
        if remaining > 0:
            r = min(up(remaining), max(0, (w - base) // rb * rb))
            if r == 0:
                r = rb  # guaranteed progress; width exceeds w temporarily
        else:
            r = 0
        valid = min(r, remaining)
        # A lane refilled at iteration j has its last possible cast (bounce
        # depth-1) at iteration j + depth - 1; one iteration later it is
        # deterministically dead.
        if r == 0 and since_refill >= depth - 1:
            break
        m = n + r
        if m == 0:
            break
        keep = min(m, base + r)
        fresh_plan.append(r)
        keep_plan.append(keep)
        cursor += r
        since_refill = 0 if valid > 0 else since_refill + 1
        n = keep
        a = [float(valid)] + [a[b] * surv[b] for b in range(depth - 1)]
    return RefillPlan(fresh=tuple(fresh_plan), keep=tuple(keep_plan))


def refill_applies(opts: TraceOptions) -> bool:
    """Refill needs the Pallas sorted-cast path and no per-lane
    instrumentation, exactly like dead-lane compaction."""
    if opts.depth < 1 or opts.want_aux or opts.log_paths or not opts.sort_rays:
        return False
    if opts.intersector == "pallas":
        return True
    return opts.intersector == "auto" and jax.default_backend() != "cpu"


def trace_refill(scene, base_key, sample_start, opts: TraceOptions,
                 plan: RefillPlan, width: int, height: int, fov_x: float,
                 n_samples: int):
    """Render `n_samples` full-image samples through one refilled wavefront.

    Returns (radiance [H*W, n_samples, 3] with samples ascending per pixel,
    rays_cast i32, overflow i32). Physics is _shade_vertex — shared with the
    batched and compacted traces — on the identical counter-addressed
    sample set; only the scheduling differs (see module docstring).
    """
    from raytracer_odin_tpu.ops import pallas_intersect as pi

    n0 = width * height
    total = n_samples * n0
    depth = opts.depth
    has_lights = scene.light_p.shape[0] > 0
    _g, n_super, aabb8 = traverse.exact_cull_layout(scene)

    far_o = jnp.asarray([BIG, 0.0, 0.0], jnp.float32)
    unit_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    # Wavefront columns (all [N]); N == 0 before the first iteration.
    cols = None  # (ox, oy, oz, dx, dy, dz, t0, t1, t2, r0, r1, r2, gid, bnc)
    alive = None
    cursor = 0
    rays = jnp.zeros((), jnp.int32)
    overflow = jnp.zeros((), jnp.int32)
    retired_gid = []
    retired_rad = []

    for r_k, keep in zip(plan.fresh, plan.keep):
        # ---- append fresh camera rays (the queue pull) -------------------
        if r_k:
            gid_f = cursor + jnp.arange(r_k, dtype=jnp.int32)
            valid = gid_f < total
            gid_c = jnp.minimum(gid_f, total - 1)
            sample_f = sample_start + gid_c // n0
            pixel_f = gid_c % n0
            jitter = prng.uniforms(
                base_key, sample_f, prng.JITTER_TAG, pixel_f, 2
            )
            of, df = _camera_rays(
                scene.cam_pos, scene.cam_basis, fov_x, width, height,
                pixel_f, jitter,
            )
            ones_f = jnp.ones((r_k,), jnp.float32)
            zeros_f = jnp.zeros((r_k,), jnp.float32)
            fresh_cols = (
                of[:, 0], of[:, 1], of[:, 2], df[:, 0], df[:, 1], df[:, 2],
                ones_f, ones_f, ones_f, zeros_f, zeros_f, zeros_f,
                gid_f, jnp.zeros((r_k,), jnp.int32),
            )
            if cols is None:
                cols = fresh_cols
                alive = valid
            else:
                cols = tuple(
                    jnp.concatenate([a_, b_]) for a_, b_ in zip(cols, fresh_cols)
                )
                alive = jnp.concatenate([alive, valid])
            cursor += r_k

        (ocx, ocy, ocz, dcx, dcy, dcz,
         t0, t1, t2, r0, r1, r2, gid, bnc) = cols

        # ---- exact masks + coherence sort (dead lanes last) ---------------
        o_dead_x = jnp.where(alive, ocx, far_o[0])
        o_dead_y = jnp.where(alive, ocy, far_o[1])
        o_dead_z = jnp.where(alive, ocz, far_o[2])
        d_dead_x = jnp.where(alive, dcx, unit_x[0])
        d_dead_y = jnp.where(alive, dcy, unit_x[1])
        d_dead_z = jnp.where(alive, dcz, unit_x[2])
        octant = (
            (d_dead_x < 0).astype(jnp.int32)
            + 2 * (d_dead_y < 0).astype(jnp.int32)
            + 4 * (d_dead_z < 0).astype(jnp.int32)
        )
        zcol = jnp.zeros_like(ocx)
        rays_pre = jnp.stack(
            [o_dead_x + d_dead_x * RAY_EPS,
             o_dead_y + d_dead_y * RAY_EPS,
             o_dead_z + d_dead_z * RAY_EPS,
             d_dead_x, d_dead_y, d_dead_z, zcol, zcol], axis=0,
        )
        words_p = pi.cluster_masks_rows(aabb8, rays_pre, n_super)
        keys, word_slots = traverse._lex_sort_keys(
            alive, octant,
            [words_p[i] for i in range(words_p.shape[0])], n_super,
        )
        payload = (
            o_dead_x, o_dead_y, o_dead_z, d_dead_x, d_dead_y, d_dead_z,
            t0, t1, t2, r0, r1, r2, gid, bnc,
        )
        sorted_ops = jax.lax.sort(
            tuple(keys) + payload, num_keys=len(keys)
        )
        s_words = jnp.stack(
            [sorted_ops[i][:keep] for i in word_slots], axis=0
        )
        vals = sorted_ops[len(keys):]

        n_alive = jnp.sum(alive.astype(jnp.int32))
        overflow = overflow + jnp.maximum(0, n_alive - keep)

        # ---- retire the (dead) tail ---------------------------------------
        retired_gid.append(vals[12][keep:])
        retired_rad.append(
            jnp.stack([vals[9][keep:], vals[10][keep:], vals[11][keep:]],
                      axis=-1)
        )

        sox, soy, soz = (v[:keep] for v in vals[0:3])
        sdx, sdy, sdz = (v[:keep] for v in vals[3:6])
        thr = jnp.stack([v[:keep] for v in vals[6:9]], axis=-1)
        rad = jnp.stack([v[:keep] for v in vals[9:12]], axis=-1)
        gid = vals[12][:keep]
        bnc = vals[13][:keep]
        alive = jnp.arange(keep, dtype=jnp.int32) < n_alive
        rays = rays + jnp.minimum(n_alive, keep)

        # ---- cast + shade (shared physics) --------------------------------
        zs = jnp.zeros_like(sox)
        rays_sorted = jnp.stack(
            [sox + sdx * RAY_EPS, soy + sdy * RAY_EPS, soz + sdz * RAY_EPS,
             sdx, sdy, sdz, zs, zs], axis=0,
        )
        t, tri_idx, _bu, _bv = traverse.cast_presorted_rows(
            scene, rays_sorted, words=s_words
        )
        o2 = jnp.stack([sox, soy, soz], axis=-1)
        d2 = jnp.stack([sdx, sdy, sdz], axis=-1)
        sample_l = sample_start + gid // n0
        pixel_l = gid % n0
        uniforms = prng.uniforms(base_key, sample_l, bnc, pixel_l, 6)
        o2, d2, thr2, rad2, cont, _ev, _h, _m = _shade_vertex(
            scene, o2, d2, t, tri_idx, alive, uniforms, opts,
            has_lights, thr, rad,
        )
        alive = cont & (bnc < depth - 1)
        bnc = bnc + 1
        cols = (
            o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2],
            thr2[:, 0], thr2[:, 1], thr2[:, 2],
            rad2[:, 0], rad2[:, 1], rad2[:, 2], gid, bnc,
        )

    # ---- final retire-all (plan guarantees deterministic death) ----------
    overflow = overflow + jnp.sum(alive.astype(jnp.int32))
    retired_gid.append(cols[12])
    retired_rad.append(jnp.stack([cols[9], cols[10], cols[11]], axis=-1))

    all_gid = jnp.concatenate(retired_gid)
    all_rad = jnp.concatenate(retired_rad, axis=0)
    # Merge key (pixel, sample): invalid ids (never issued) sort past the
    # end and are sliced off. Each valid id retires exactly once.
    key = jnp.where(
        all_gid < total,
        (all_gid % n0) * n_samples + all_gid // n0,
        jnp.int32(total),
    )
    _, m0, m1, m2 = jax.lax.sort(
        (key, all_rad[:, 0], all_rad[:, 1], all_rad[:, 2]), num_keys=1
    )
    radiance = jnp.stack([m0, m1, m2], axis=-1)[:total].reshape(
        n0, n_samples, 3
    )
    return radiance, rays, overflow
