"""Render runtime: camera ray generation, the jitted per-step sample loop,
and the host driver (trials / continuous mode / interrupts).

Replaces the reference's thread pool + atomic tile counter
(render_scene/render_task, raytracer.odin:525-665). The TPU work
decomposition is: one jitted device step computes `samples_per_step` full-
image samples and folds them into the HBM-resident Stats accumulator; the
host loop repeats steps until the target spp (or an interrupt in continuous
mode), checking the interrupt flag only between device steps — the
cooperative-interruption analogue of raytracer.odin:554.
"""

from __future__ import annotations

import dataclasses
import signal
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_odin_tpu import config as config_mod
from raytracer_odin_tpu.config import RenderConfig
from raytracer_odin_tpu.ops import probes
from raytracer_odin_tpu.ops.integrator import (
    TraceOptions, _compaction_applies, trace,
)
from raytracer_odin_tpu.render import accum
from raytracer_odin_tpu.utils.math3d import norm_l1, normalize


# ---------------------------------------------------------------------------
# Interrupt flag (async_interrupt / is_interrupted, main.odin:20-25).
# ---------------------------------------------------------------------------

class InterruptFlag:
    def __init__(self):
        self._flag = False
        self._prev = None

    def install(self):
        def handler(signum, frame):
            self._flag = True
        self._prev = signal.signal(signal.SIGINT, handler)
        return self

    def uninstall(self):
        if self._prev is not None:
            signal.signal(signal.SIGINT, self._prev)

    def set(self):
        self._flag = True

    def __bool__(self):
        return self._flag


# ---------------------------------------------------------------------------
# Camera ray generation (raytracer.odin:528-538, 577-586).
# ---------------------------------------------------------------------------

def generate_rays(cam_pos, cam_basis, fov_x: float, width: int, height: int,
                  jitter, row_offset=0, n_rows: int | None = None):
    """Camera rays with per-pixel jitter for rows [row_offset,
    row_offset + n_rows) of a height-`height` image.

    jitter: [n_rows, W, 2] uniforms in [0, 1). Image row r corresponds to
    reference pixel py = height - 1 - r (the reference renders with y up and
    flips on store, main.odin:95; we bake the flip into ray-gen so
    accumulators are already in image order). `row_offset` may be a traced
    value (sharded rendering passes the shard's first row).

    Returns (o [n_rows, W, 3], d [n_rows, W, 3]).
    """
    if n_rows is None:
        n_rows = height
    aspect = width / height
    tan_fx = jnp.tan(fov_x / 2.0)
    tan_fy = tan_fx / aspect

    r = row_offset + jnp.arange(n_rows, dtype=jnp.float32)[:, None]
    px = jnp.arange(width, dtype=jnp.float32)[None, :]
    py = (height - 1.0) - r  # image row -> reference pixel y

    x = px + jitter[..., 0]
    y = py + jitter[..., 1]
    ndc_x = x / (width / 2.0) - 1.0
    ndc_y = y / (height / 2.0) - 1.0
    v = jnp.stack(
        [ndc_x * tan_fx, ndc_y * jnp.broadcast_to(tan_fy, ndc_x.shape), jnp.ones_like(ndc_x)],
        axis=-1,
    )
    # HIGHEST precision: TPU matmuls default to bf16 multiplies, which
    # would quantize every camera ray direction (and wreck same-seed
    # CPU-vs-TPU parity from the first cast). The 3x3 basis rotation is
    # tiny; full f32 costs nothing.
    d = normalize(
        jnp.matmul(v, cam_basis.T, precision=jax.lax.Precision.HIGHEST),
        eps=1e-20,
    )
    o = jnp.broadcast_to(cam_pos, d.shape)
    return o, d


def sample_pass(scene, base_key, sample, fov_x: float, width: int,
                height: int, opts: TraceOptions, row_offset=0,
                n_rows: int | None = None):
    """One full sample for rows [row_offset, row_offset + n_rows): jittered
    ray-gen + wavefront trace. Per-pixel counter-based streams
    (prng.uniforms under `base_key`, addressed by this `sample` index) make
    the result independent of how rows are sharded across chips."""
    from raytracer_odin_tpu.utils import prng

    if n_rows is None:
        n_rows = height
    rows = row_offset + jnp.arange(n_rows, dtype=jnp.int32)[:, None]
    cols = jnp.arange(width, dtype=jnp.int32)[None, :]
    stream_ids = rows * width + cols

    jitter = prng.uniforms(base_key, sample, prng.JITTER_TAG, stream_ids, 2)
    o, d = generate_rays(
        scene.cam_pos, scene.cam_basis, fov_x, width, height, jitter,
        row_offset=row_offset, n_rows=n_rows,
    )
    # Row-contiguous windows have affine stream ids (row_offset*W + lane):
    # the promise lets the compacted trace drop the stream sort column.
    return trace(scene, o, d, (base_key, sample), opts,
                 stream_ids=stream_ids, stream_base=row_offset * width)


# ---------------------------------------------------------------------------
# Jitted render step.
# ---------------------------------------------------------------------------

def sample_layer_values(radiance, aux, debug: bool):
    """Stack one sample's per-layer values: [L_act, ..., 3] with L_act = 1
    (beauty only) or 1 + len(probes) (beauty first, then every registered
    debug probe in registry order — ops/probes.py; the builtin set keeps
    the config.LAYER_* indices)."""
    if not debug:
        return radiance[None]
    vals = [radiance]
    for p in probes.active():
        vals.append(p.display_value(aux[p.name]))
    return jnp.stack(vals, axis=0)


def make_render_step(cfg: RenderConfig, fov_x: float,
                     lane_schedule=None, refill_plan=None) -> Callable:
    """Build the jitted step: (scene, stats, base_key, sample_start) ->
    (stats, rays_info). Computes cfg.samples_per_step full-image samples
    sequentially (preserving first/last ordering) and folds them into
    stats; `rays_info` is int32[2] = (path segments actually cast,
    compaction overflow lanes — zero unless a lane_schedule undershoots;
    see TraceOptions.lane_schedule)."""
    if cfg.wavefront_pool:
        return make_pool_render_step(cfg, fov_x)
    if refill_plan is not None:
        return make_refill_render_step(cfg, fov_x, refill_plan)
    schedule = cfg.compact_schedule or lane_schedule
    opts = TraceOptions(
        depth=cfg.ray_depth,
        intersector=cfg.intersector,
        brute_chunk=cfg.brute_chunk,
        brute_max_tris=cfg.brute_max_tris,
        light_chunk=cfg.light_chunk,
        want_aux=cfg.debug_features,
        lane_schedule=tuple(schedule) if schedule else None,
    )
    H, W = cfg.height, cfg.width

    @partial(jax.jit, donate_argnums=(1,))
    def step(scene, stats, base_key, sample_start):
        # Unrolled over the (static, small) samples_per_step: a lax.scan
        # here forces whole-stats carry copies every iteration (~25 MB x 5
        # fields at 1080p, trace-measured ~25 ms/step); unrolled, the stats
        # update aliases in place via donation.
        rays = jnp.zeros((), jnp.int32)
        over = jnp.zeros((), jnp.int32)
        for k in range(cfg.samples_per_step):
            radiance, aux = sample_pass(
                scene, base_key, sample_start + k, fov_x, W, H, opts
            )
            vals = sample_layer_values(radiance, aux, cfg.debug_features)
            stats = accum.update_layers(stats, vals)
            rays = rays + aux["rays_cast"]
            over = over + aux["overflow"]
        return stats, jnp.stack([rays, over])

    return step


def auto_lane_schedule(scene, cfg: RenderConfig, fov_x: float,
                       margin: Optional[float] = None):
    """Measure the per-bounce alive schedule with one uncompacted 1-spp
    sample and turn it into static lane budgets for
    TraceOptions.lane_schedule: budget[b-1] = alive entering bounce b times
    a safety margin plus two ray blocks of slack, rounded up to a ray-block
    multiple. Alive counts concentrate tightly around their mean over
    millions of lanes (binomial: sd/mean ~ 1/sqrt(N)), so the margin makes
    overflow a ~never event while keeping ~all of the dead-lane savings."""
    import numpy as np

    from raytracer_odin_tpu.ops.pallas_intersect import RB

    margin = cfg.compact_margin if margin is None else margin
    opts = TraceOptions(
        depth=cfg.ray_depth,
        intersector=cfg.intersector,
        brute_chunk=cfg.brute_chunk,
        brute_max_tris=cfg.brute_max_tris,
        light_chunk=cfg.light_chunk,
        want_aux=False,
    )

    @jax.jit
    def counts_fn(base_key):
        _, aux = sample_pass(
            scene, base_key, jnp.int32(0), fov_x, cfg.width, cfg.height, opts
        )
        return aux["alive_counts"]

    counts = np.asarray(counts_fn(jax.random.PRNGKey(cfg.seed)))
    n0p = -(-(cfg.height * cfg.width) // RB) * RB
    sched = []
    for c in counts[1:]:
        s = int(c * margin) + 2 * RB
        sched.append(min(n0p, -(-s // RB) * RB))
    return tuple(sched)


def auto_refill_plan(scene, cfg: RenderConfig, fov_x: float):
    """Plan the cross-sample refill schedule (ops/refill.py) from the same
    1-spp alive-count probe auto_lane_schedule uses."""
    import numpy as np

    from raytracer_odin_tpu.ops import refill
    from raytracer_odin_tpu.ops.pallas_intersect import RB

    opts = TraceOptions(
        depth=cfg.ray_depth,
        intersector=cfg.intersector,
        brute_chunk=cfg.brute_chunk,
        brute_max_tris=cfg.brute_max_tris,
        light_chunk=cfg.light_chunk,
        want_aux=False,
    )

    @jax.jit
    def counts_fn(base_key):
        _, aux = sample_pass(
            scene, base_key, jnp.int32(0), fov_x, cfg.width, cfg.height, opts
        )
        return aux["alive_counts"]

    counts = np.asarray(counts_fn(jax.random.PRNGKey(cfg.seed)))
    return refill.plan_refill(
        counts, cfg.width * cfg.height, cfg.samples_per_step,
        cfg.ray_depth, RB, cfg.compact_margin,
    )


def make_refill_render_step(cfg: RenderConfig, fov_x: float,
                            plan) -> Callable:
    """Jitted step for the cross-sample refill scheduler (ops/refill.py):
    one ~constant-width wavefront processes all samples_per_step samples,
    refilling freed lanes with the next sample's camera rays. Beauty layer
    only (refill, like compaction, needs debug_features=False); the stats
    fold reproduces accum.update_layers semantics for the S sequential
    samples (first = sample 0 when count was 0, last = sample S-1)."""
    if cfg.debug_features:
        raise ValueError("refill scheduler requires debug_features=False")
    from raytracer_odin_tpu.ops import refill

    opts = TraceOptions(
        depth=cfg.ray_depth,
        intersector=cfg.intersector,
        brute_chunk=cfg.brute_chunk,
        brute_max_tris=cfg.brute_max_tris,
        light_chunk=cfg.light_chunk,
        want_aux=False,
    )
    H, W = cfg.height, cfg.width
    S = cfg.samples_per_step

    @partial(jax.jit, donate_argnums=(1,))
    def step(scene, stats, base_key, sample_start):
        rad, rays, over = refill.trace_refill(
            scene, base_key, sample_start, opts, plan, W, H, fov_x, S
        )
        r = rad.reshape(H, W, S, 3)
        is_first = (stats.count[0] == 0)[..., None]
        new_stats = accum.Stats(
            first=stats.first.at[0].set(
                jnp.where(is_first, r[:, :, 0], stats.first[0])
            ),
            last=stats.last.at[0].set(r[:, :, S - 1]),
            total=stats.total.at[0].add(r.sum(axis=2)),
            total_sq=stats.total_sq.at[0].add((r * r).sum(axis=2)),
            count=stats.count.at[0].add(float(S)),
        )
        return new_stats, jnp.stack([rays, over])

    return step


def make_pool_render_step(cfg: RenderConfig, fov_x: float) -> Callable:
    """Persistent-wavefront step (ops/wavefront.py): same signature and
    accumulator semantics as the batched step, beauty layer only."""
    if cfg.debug_features:
        raise ValueError("wavefront_pool requires debug_features=False")
    from raytracer_odin_tpu.ops import wavefront

    opts = TraceOptions(
        depth=cfg.ray_depth,
        intersector=cfg.intersector,
        brute_chunk=cfg.brute_chunk,
        brute_max_tris=cfg.brute_max_tris,
        light_chunk=cfg.light_chunk,
        want_aux=False,
    )
    H, W = cfg.height, cfg.width
    n = H * W
    pool = max(1024, int(n * cfg.pool_fraction))
    # round to ray-block multiples for the Pallas intersector
    from raytracer_odin_tpu.ops.pallas_intersect import RB

    pool = ((pool + RB - 1) // RB) * RB

    @partial(jax.jit, donate_argnums=(1,))
    def step(scene, stats, base_key, sample_start):
        ps = wavefront.PoolStats(
            first=stats.first[0].reshape(n, 3),
            last=stats.last[0].reshape(n, 3),
            total=stats.total[0].reshape(n, 3),
            total_sq=stats.total_sq[0].reshape(n, 3),
        )
        ps, rays = wavefront.render_pool_step(
            scene, ps, base_key, sample_start,
            width=W, height=H, fov_x=fov_x,
            samples=cfg.samples_per_step, pool_size=pool, opts=opts,
        )
        return accum.Stats(
            first=stats.first.at[0].set(ps.first.reshape(H, W, 3)),
            last=stats.last.at[0].set(ps.last.reshape(H, W, 3)),
            total=stats.total.at[0].set(ps.total.reshape(H, W, 3)),
            total_sq=stats.total_sq.at[0].set(ps.total_sq.reshape(H, W, 3)),
            count=stats.count.at[0].add(float(cfg.samples_per_step)),
        ), rays

    return step


# ---------------------------------------------------------------------------
# Host driver.
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RenderResult:
    stats: accum.Stats
    samples_done: int
    trial_seconds: list
    # Measured path segments actually cast, summed over all trials (same
    # accounting as bench.py: live lanes only, not depth * pixels).
    rays_cast: int = 0


def render_scene(
    scene,
    cfg: RenderConfig,
    fov_x: float,
    trials: int = 1,
    interrupt: Optional[InterruptFlag] = None,
    on_step: Optional[Callable] = None,
    step_fn: Optional[Callable] = None,
    initial_stats: Optional[accum.Stats] = None,
    initial_samples: int = 0,
    verbose: bool = False,
    make_stats: Optional[Callable] = None,
    converge_se: float = 0.0,
    converge_check_every: int = 16,
) -> RenderResult:
    """Full render with trials/benchmark support (render_scene,
    raytracer.odin:602-665). In continuous mode (cfg.continuous) the loop
    runs until interrupted; on_step(stats, samples_done) is called after
    every device step (preview/checkpoint hook). `make_stats` overrides the
    fresh-accumulator factory (sharded renders allocate padded rows).

    converge_se > 0 adds a convergence stop to continuous mode: every
    `converge_check_every` steps the MEDIAN per-pixel standard error of the
    beauty mean (sqrt(sample variance / count), median over pixels and
    channels) is computed on device; the render stops once it drops below
    the threshold. The median — not the mean — is deliberate: one-sample-MIS
    firefly samples have heavy-tailed variance, so the mean SE can jump by
    an order of magnitude when a firefly lands and never converges, while
    the median tracks typical-pixel noise and declines ~1/sqrt(n) (see
    mean_standard_error)."""
    step = step_fn
    if step is None:
        from raytracer_odin_tpu.ops import refill as refill_mod

        lane_schedule = None
        refill_plan = None
        probe_opts = TraceOptions(
            depth=cfg.ray_depth, intersector=cfg.intersector,
        )
        if (
            cfg.compact == "refill"
            and not cfg.wavefront_pool
            and not cfg.debug_features
            and refill_mod.refill_applies(probe_opts)
        ):
            refill_plan = auto_refill_plan(scene, cfg, fov_x)
        elif (
            cfg.compact == "auto"
            and cfg.compact_schedule is None
            and not cfg.wavefront_pool
            and not cfg.debug_features
            and cfg.ray_depth > 1
            # Skip the 1-spp calibration pass when trace() would fall back
            # to the uncompacted path anyway (e.g. CPU auto intersector).
            and _compaction_applies(probe_opts)
        ):
            lane_schedule = auto_lane_schedule(scene, cfg, fov_x)
        step = make_render_step(
            cfg, fov_x, lane_schedule=lane_schedule, refill_plan=refill_plan
        )
    if make_stats is None:
        make_stats = lambda: accum.init_stats(  # noqa: E731
            cfg.num_layers, cfg.height, cfg.width
        )
    timings = []
    result_stats = None
    samples_done = 0
    rays_total = None  # device-side accumulator; read once at the end

    target = cfg.samples if not cfg.continuous else None
    for trial in range(trials):
        stats = (
            initial_stats
            if (initial_stats is not None and trial == 0)
            else make_stats()
        )
        samples_done = initial_samples if trial == 0 else 0
        base_key = jax.random.PRNGKey(cfg.seed)
        start = time.perf_counter()
        while target is None or samples_done < target:
            if interrupt:
                break
            stats, step_rays = step(
                scene, stats, base_key, jnp.int32(samples_done)
            )
            # float32 to avoid int32 overflow over long continuous renders;
            # stays on device so the loop never syncs. Shape-normalized to
            # [rays, overflow] (pool/mesh steps return a scalar: no
            # compaction there, overflow 0).
            step_rays = jnp.atleast_1d(step_rays).astype(jnp.float32)
            if step_rays.shape[0] == 1:
                step_rays = jnp.concatenate(
                    [step_rays, jnp.zeros((1,), jnp.float32)]
                )
            rays_total = (
                step_rays if rays_total is None else rays_total + step_rays
            )
            samples_done += cfg.samples_per_step
            if on_step is not None:
                on_step(stats, samples_done)
            if (
                converge_se > 0.0
                and cfg.continuous
                and (samples_done // cfg.samples_per_step)
                % converge_check_every == 0
            ):
                se = float(mean_standard_error(
                    accum.crop(stats, cfg.height, cfg.width)
                ))
                if verbose:
                    print(
                        f"{samples_done} spp, median standard error {se:.2e}"
                        f" (target {converge_se:.1e})"
                    )
                if se < converge_se:
                    if verbose:
                        print(f"Converged at {samples_done} spp")
                    break
        jax.block_until_ready(stats.count)
        elapsed = time.perf_counter() - start
        timings.append(elapsed)
        if verbose:
            print(f"Trial {trial} >>> Rendered in {elapsed*1000:.2f}ms")
        result_stats = stats
        if interrupt:
            break

    if verbose and trials > 1:
        print_perf_summary(timings)

    rays = 0
    overflow = 0
    if rays_total is not None:
        arr = np.asarray(rays_total)
        rays = int(arr[0])
        overflow = int(arr[1]) if arr.shape[0] > 1 else 0
    if overflow > 0:
        # A compaction slice truncated live lanes: the render is invalid
        # (energy dropped). Re-render uncompacted — correct by
        # construction; with calibrated schedules this path is ~never hit.
        print(
            f"WARNING: lane-schedule overflow ({overflow} lanes); "
            "re-rendering uncompacted"
        )
        return render_scene(
            scene, cfg.replace(compact="off", compact_schedule=None), fov_x,
            trials=trials, interrupt=interrupt, on_step=on_step,
            initial_stats=None, initial_samples=0, verbose=verbose,
            make_stats=make_stats, converge_se=converge_se,
            converge_check_every=converge_check_every,
        )
    return RenderResult(
        stats=result_stats,
        samples_done=samples_done,
        trial_seconds=timings,
        rays_cast=rays,
    )


@jax.jit
def mean_standard_error(stats: accum.Stats):
    """MEDIAN per-pixel standard error of the beauty-layer mean: the
    convergence statistic for continuous mode (consumes the variance the
    reference only visualizes, output.odin:41-44).

    Median, not mean: one-sample-MIS firefly samples have heavy-tailed
    (practically unbounded) variance, so the mean SE can JUMP when a
    firefly lands (observed: 3.0e-2 -> 4.0e-1 at 2.7k spp on the demo
    scene) and never converges; the median tracks typical-pixel noise and
    declines ~1/sqrt(n) as a stopping rule should."""
    n = jnp.maximum(stats.count[0], 1.0)[..., None]
    mean = stats.total[0] / n
    var = jnp.maximum(stats.total_sq[0] / n - mean * mean, 0.0)
    return jnp.median(jnp.sqrt(var / n))


def print_perf_summary(timings_s: list) -> None:
    """Mean +/- Bessel-corrected std, best/median/worst
    (raytracer.odin:648-664)."""
    n = len(timings_s)
    ts = sorted(timings_s)
    mean = sum(ts) / n
    var = sum(t * t for t in ts) / n - mean * mean
    std = (var * n / max(n - 1, 1)) ** 0.5 if n > 1 else float("inf")
    median = (ts[n // 2] + ts[(n + 1) // 2 if (n + 1) // 2 < n else n - 1]) / 2
    print(">>>>>>>>> Performance Summary <<<<<<<<<")
    print(f"Trials: {n}")
    print(f"Time: {mean*1000:.02f}±{std*1000:.02f}ms")
    print(
        f"Best: {ts[0]*1000:.02f}ms, Median: {median*1000:.02f}ms, "
        f"Worst: {ts[-1]*1000:.02f}ms"
    )
    print(">>>>>>>>> Performance Summary <<<<<<<<<")
