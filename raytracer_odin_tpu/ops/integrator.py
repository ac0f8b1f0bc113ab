"""Wavefront path-tracing integrator.

The reference's recursive `raytrace` (raytracer.odin:432-518) has tail shape

    exitance = emission + (value / pdf) * raytrace(next_ray, depth - 1)

so it maps exactly onto an iterative fixed-depth loop with a running
throughput product and accumulated radiance — the classic wavefront form
(ray-gen -> intersect -> shade -> scatter) driven by `lax.scan` with masked
lanes. Per bounce, for every live lane:

  1. nearest-hit cast (ops/traverse; RAY_EPS offset semantics included)
  2. miss -> radiance += throughput * equirect env lookup, lane dies
     (raytracer.odin:437-446)
  3. hit  -> evaluate Point_Material (textures, optional normal mapping,
     inside flip; raytracer.odin:448-488), radiance += throughput * emission
  4. sample one direction from the cosine/light/VNDF mixture, compute the
     combined pdf and BRDF value (shading.odin)
  5. lane continues iff ||value||_1 / pdf > 1e-5 (raytracer.odin:495,
     NaN compares false -> dead, same as the reference's comparison);
     throughput *= value / pdf

All lanes advance in lockstep; dead lanes are masked. Randomness is
counter-based: every (sample key, bounce) pair yields an independent uniform
block, so results are independent of batching/sharding.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops import probes, shading, texture, traverse
from raytracer_odin_tpu.utils import prng
from raytracer_odin_tpu.utils.math3d import dot, norm_l1, normalize


# Re-sort cadence experiment (VERDICT r3 item 1b): sort/compact only every
# N-th bounce of the compacted trace; intermediate bounces cast in the stale
# lane order (reusing the previous permutation) with no slicing. N == 1 is
# the shipped per-bounce sort. EXPERIMENTAL, measured 1.74x SLOWER at N=2
# (16.31 vs 28.39 Mrays/s on the demo bench: stale-order unions blow past
# the sweep budget and the skipped bounce forfeits its compaction slice —
# ARCHITECTURE.md journal); kept for re-measurement, not for use.
SORT_EVERY = int(_os.environ.get("RT_TPU_SORT_EVERY", "1"))

# Columnar wavefront state experiment (VERDICT r4 item 1b, r5): carry all
# per-lane 3-vector state as separate component columns and shade through
# ops/shading_cols.py. The ISOLATED shade chain measures 3.14x faster
# columnar (tools/layout_probe.py) — but the full compacted step measured
# 23.12 vs 28.37 Mrays/s on the demo bench (1.23x SLOWER): the
# row<->column boundaries the isolated probe has none of (v3c.stack for
# the consolidated material-row gather and the row-form light-pdf sweep,
# splat back after) materialize relayout passes per bounce that eat the
# fusion win. EXPERIMENTAL, default off; kept for re-measurement.
COLS = int(_os.environ.get("RT_TPU_COLS", "0"))


class TraceOptions(NamedTuple):
    depth: int = 8
    intersector: str = "auto"
    brute_chunk: int = 512
    brute_max_tris: int = 512
    light_chunk: int = 256
    want_aux: bool = False
    # Re-bucket secondary-bounce rays into coherent bundles before casting
    # (Pallas path only; the first bounce keeps image-tile order).
    sort_rays: bool = True
    # Record per-bounce (o, d, t, alive, anomaly ratios) for every lane —
    # the device-side ray log (Cast_Info, main.odin:42-47): because the RNG
    # is a pure per-(pixel, sample, bounce) counter chain, re-tracing a
    # pixel window with its true stream ids reproduces the full render's
    # actual sampled paths exactly. Use on small windows only.
    log_paths: bool = False
    # Dead-lane compaction (Pallas path): static lane budgets for bounces
    # 1..depth-1. The per-bounce coherence sort already places dead lanes
    # last (the dead bit is the top sort key); with a schedule, the sorted
    # wavefront is SLICED to schedule[b-1] lanes before the cast/shade of
    # bounce b and the (dead) tail retires its radiance — so sorts, mask
    # kernels, gathers, and shading all shrink with the measured alive
    # fraction instead of paying for ~44% dead lanes (reference analogue:
    # recursion simply ends for dead paths, raytracer.odin:495-496).
    # Retired lanes are merged scatter-free at the end (each lane retires
    # exactly once; one sort by lane id restores image order). If more
    # lanes are alive than a slice allows, the excess is COUNTED in
    # aux["overflow"] (device scalar) and the render is invalid — callers
    # check once at the end and re-render uncompacted (runtime.render_scene
    # does this automatically); with calibrated schedules
    # (runtime.auto_lane_schedule) overflow is a ~never event, not a bias.
    # Requires depth > 1, the Pallas intersector, sort_rays, and neither
    # want_aux nor log_paths (trace() falls back silently otherwise).
    lane_schedule: tuple = None


def _point_material(scene, o, d, t, tri_idx):
    """Evaluate the hit-point material (raytracer.odin:448-488).

    All per-triangle data (attributes + inlined material + triangle
    geometry) arrives in one contiguous row-gather (scene.shade_row) — the
    dominant cost of this stage on TPU is gathers, so it is exactly one per
    hit plus the texture taps. The row layout is scene-specialized
    (models/build.py): blocks the scene cannot use are not packed, and the
    corresponding math (texcoord interpolation, tangent-space normal
    mapping, per-kind texture gathers) compiles out entirely — the TPU
    analogue of the reference's compile-time `when` gating
    (main.odin:17-18).

    The hit position is o + d*t — exact for the `cast_ray` convention
    (RAY_EPS pushed into the origin and re-added to t,
    raytracer.odin:416-430) — instead of the reference's barycentric
    interpolation p + bu*u + bv*v; the two agree to float rounding.

    Barycentrics are recomputed HERE from the row's triangle geometry (the
    Pallas sweep kernel returns only the hit decision; selecting u/v
    in-kernel cost two sublane reduces per cluster test). The arithmetic is
    the kernel's Moller-Trumbore on the RAY_EPS-offset origin with exact
    division — the same values up to float-association ULPs.

    Returns dict with pos, normal (possibly normal-mapped, not yet
    inside-flipped), ng, color, emission, metallic, roughness, inside.
    """
    from raytracer_odin_tpu.ops.geometry import RAY_EPS

    ti = jnp.maximum(tri_idx, 0)
    spec = dict(scene.row_spec)
    kinds = scene.tex_kinds

    row = scene.shade_row[ti]  # [..., RW] single gather

    def blk(name, width):
        s = spec[name]
        return row[..., s:s + width]

    # Moller-Trumbore on 3-wide row slices + fused cross/dot — per-column
    # scalar extracts (row[..., s]) each materialize their own relayout
    # fusion (trace-measured ~2 ms/step EACH at 1080p); the k-wide
    # slice -> elementwise -> last-axis-sum shape fuses like the
    # interpolations below.
    oo = o + d * RAY_EPS
    u3 = blk("tri_u", 3)
    v3 = blk("tri_v", 3)
    pv = jnp.cross(d, v3)
    det = jnp.sum(u3 * pv, axis=-1)
    # Winners always have det != 0 (the kernel's inside test rejected
    # non-finite barycentrics); the guard keeps MISS lanes (index clamped
    # to 0) at benign zero barycentrics instead of NaN texcoords.
    inv = jnp.where(det != 0, 1.0 / det, 0.0)
    tv = oo - blk("tri_p", 3)
    bu = jnp.sum(tv * pv, axis=-1) * inv
    qv = jnp.cross(tv, u3)
    bv = jnp.sum(d * qv, axis=-1) * inv

    w0 = (1.0 - bu - bv)[..., None]
    w1 = bu[..., None]
    w2 = bv[..., None]

    def vblk(name, i, k):
        # i-th k-wide vertex attribute of a 3-vertex block: a direct lane
        # sub-slice. Interpolations combine these immediately so the slices
        # fuse into the weighted sum — a [..., 3, k] reshape between slice
        # and sum forces XLA to materialize each slice as its own relayout
        # pass (trace-measured ~18 ms/step at 1080p across the bounces).
        s = spec[name] + i * k
        return row[..., s:s + k]

    pos = o + d * t[..., None]

    if "texids" in spec:
        texcoords = (
            vblk("tex", 0, 2) * w0 + vblk("tex", 1, 2) * w1
            + vblk("tex", 2, 2) * w2
        )
        mtex = blk("texids", 4).astype(jnp.int32)
    else:
        texcoords = jnp.zeros(ti.shape + (2,), jnp.float32)
        mtex = None

    ones = jnp.ones(ti.shape + (4,), jnp.float32)
    mr = texture.sample(scene, mtex[..., 2], texcoords) if kinds[2] else ones
    col_tex = (
        texture.sample(scene, mtex[..., 0], texcoords, srgb=True)
        if kinds[0] else ones
    )
    emi_tex = (
        texture.sample(scene, mtex[..., 1], texcoords, srgb=True)
        if kinds[1] else ones
    )

    n_interp = (
        vblk("n", 0, 3) * w0 + vblk("n", 1, 3) * w1 + vblk("n", 2, 3) * w2
    )
    n_smooth = normalize(n_interp, eps=1e-20)

    if kinds[3]:
        # Normal mapping branch (raytracer.odin:458-470): the interpolated
        # tangent4 is normalized as a 4-vector (faithful to the reference,
        # including the resulting non-orthonormal basis).
        tan4 = (
            vblk("tan", 0, 4) * w0 + vblk("tan", 1, 4) * w1
            + vblk("tan", 2, 4) * w2
        )
        tan4 = tan4 / jnp.maximum(
            jnp.sqrt(jnp.sum(tan4 * tan4, axis=-1, keepdims=True)), 1e-20
        )
        local_x = tan4[..., :3]
        local_z = n_smooth
        local_y = jnp.cross(local_z, local_x) * tan4[..., 3:4]
        nrm_sample = texture.sample(
            scene, mtex[..., 3], texcoords, default=(0.5, 1.0, 0.5, 0.0)
        )[..., :3]
        local_n = nrm_sample * 2.0 - 1.0
        n_mapped = normalize(
            local_x * local_n[..., 0:1]
            + local_y * local_n[..., 1:2]
            + local_z * local_n[..., 2:3],
            eps=1e-20,
        )
        has_nmap = mtex[..., 3] >= 0
        normal = jnp.where(has_nmap[..., None], n_mapped, n_smooth)
    else:
        normal = n_smooth

    ng = blk("ng", 3)
    inside = dot(ng, d) > 0

    return {
        "pos": pos,
        "normal": normal,
        "ng": ng,
        "inside": inside,
        "texcoords": texcoords,
        "color": blk("color", 3) * col_tex[..., :3],
        "emission": blk("emission", 3) * emi_tex[..., :3],
        "roughness": jnp.maximum(blk("roughness", 1)[..., 0] * mr[..., 1], 0.03),
        "metallic": blk("metallic", 1)[..., 0] * mr[..., 2],
    }


# Counter-based per-lane uniforms: pure functions of (base key, sample,
# tag, stream id, draw index), so renders are invariant under any batching
# or sharding of the lanes — the TPU analogue of the reference's per-task
# reseeding (raytracer.odin:552), at per-pixel granularity. The per-lane
# draw is the PCG4D hash; see utils/prng.py.
lane_uniforms = prng.uniforms


def eval_bounce(scene, o, d, t, tri_idx, uniforms, opts: TraceOptions,
                has_lights: bool):
    """Shared per-vertex shading logic (used by the batched trace and the
    persistent wavefront pool): material evaluation, mixture sampling, pdf,
    BRDF value and the continuation rule.

    Returns dict: hit_valid-independent fields are garbage on misses and
    must be masked by the caller (`hit`).
    """
    m = _point_material(scene, o, d, t, tri_idx)
    flip = m["inside"][..., None]
    normal = jnp.where(flip, -m["normal"], m["normal"])

    new_d = shading.sample_direction(
        scene, m["pos"], normal, m["roughness"], d, uniforms, has_lights
    )
    pdf = shading.mixture_pdf(
        scene, m["pos"], normal, m["roughness"], d, new_d, has_lights,
        light_chunk=opts.light_chunk,
    )
    value = shading.shade(
        m["color"], normal, m["metallic"], m["roughness"], d, new_d
    )
    # Continuation rule (raytracer.odin:495): NaN compares false.
    cont = norm_l1(value) / pdf > 1e-5
    return {
        "material": m,
        "normal": normal,
        "new_d": new_d,
        "pdf": pdf,
        "value": value,
        "cont": cont,
    }


def _shade_vertex(scene, o, d, t, tri_idx, alive, uniforms, opts,
                  has_lights, throughput, radiance):
    """One path vertex after the cast: env contribution on miss, emission
    on hit, mixture sample + continuation rule, throughput update. Shared
    by the batched trace and the compacted trace so the physics cannot
    diverge between them.

    Returns (new_o, new_d, throughput, radiance, alive, ev, hit, missed);
    new_o/new_d are garbage on dead lanes (masked by `alive`)."""
    hit = (tri_idx >= 0) & alive
    missed = (~(tri_idx >= 0)) & alive

    if scene.env_tex >= 0:
        env = texture.sample_env(scene, d, scene.env_tex)
        radiance = radiance + jnp.where(
            missed[..., None], throughput * env, 0.0
        )

    ev = eval_bounce(scene, o, d, t, tri_idx, uniforms, opts, has_lights)
    radiance = radiance + jnp.where(
        hit[..., None], throughput * ev["material"]["emission"], 0.0
    )
    cont = ev["cont"] & hit
    ratio = ev["value"] / ev["pdf"][..., None]
    throughput = jnp.where(cont[..., None], throughput * ratio, throughput)
    return (ev["material"]["pos"], ev["new_d"], throughput, radiance, cont,
            ev, hit, missed)


def _shade_vertex_cols(scene, o, d, t, tri_idx, alive, uniforms, opts,
                       has_lights, throughput, radiance):
    """Columnar `_shade_vertex`: o/d/throughput/radiance are (x, y, z)
    column tuples, uniforms a 6-tuple of columns. Same operations in the
    same order (env on miss, emission with the pre-update throughput, the
    value/pdf continuation rule) — the shade math runs through
    ops/shading_cols.py because [N, 3] operands cap these fusions at a
    fraction of HBM bandwidth (tools/layout_probe.py: columnar 3.14x).

    The consolidated material row keeps its tuned [N, k] row-slice form
    (gather-bound, not layout-bound): o/d are stacked once for
    `_point_material` and its [N, 3] outputs are split back into columns
    at this boundary.

    Returns (pos, new_d, throughput, radiance, cont) as column tuples;
    pos/new_d are garbage on dead lanes (masked by the caller).
    """
    from raytracer_odin_tpu.ops import shading_cols
    from raytracer_odin_tpu.utils import vec3c as v3c

    hit = (tri_idx >= 0) & alive
    missed = (~(tri_idx >= 0)) & alive

    if scene.env_tex >= 0:
        env = texture.sample_env_cols(scene, d, scene.env_tex)
        radiance = tuple(
            radiance[c] + jnp.where(missed, throughput[c] * env[c], 0.0)
            for c in range(3)
        )

    m = _point_material(scene, v3c.stack(o), v3c.stack(d), t, tri_idx)
    flip = m["inside"]
    n3 = m["normal"]
    normal = tuple(
        jnp.where(flip, -n3[..., c], n3[..., c]) for c in range(3)
    )
    pos = (o[0] + d[0] * t, o[1] + d[1] * t, o[2] + d[2] * t)
    color = v3c.splat(m["color"])
    emission = v3c.splat(m["emission"])
    rough = m["roughness"]
    metal = m["metallic"]

    new_d = shading_cols.sample_direction(
        scene, pos, normal, rough, d, uniforms, has_lights
    )
    pdf = shading_cols.mixture_pdf(
        scene, pos, normal, rough, d, new_d, has_lights,
        light_chunk=opts.light_chunk,
    )
    value = shading_cols.shade(color, normal, metal, rough, d, new_d)

    radiance = tuple(
        radiance[c] + jnp.where(hit, throughput[c] * emission[c], 0.0)
        for c in range(3)
    )
    # Continuation rule (raytracer.odin:495): NaN compares false.
    cont = (v3c.norm_l1(value) / pdf > 1e-5) & hit
    throughput = tuple(
        jnp.where(cont, throughput[c] * (value[c] / pdf), throughput[c])
        for c in range(3)
    )
    return pos, new_d, throughput, radiance, cont


def trace(scene, o, d, rng, opts: TraceOptions, stream_ids=None,
          stream_base=None):
    """Trace radiance for a batch of rays.

    Args:
      scene: DeviceScene.
      o, d: [..., 3] ray origins/directions (d normalized).
      rng: (base_key, sample) — the scalar base PRNG key and this batch's
        sample index (traced i32 ok). Draw addressing is
        prng.uniforms(base_key, sample, bounce, stream_id), shared
        verbatim with the wavefront pool so both paths consume identical
        sample sets.
      opts: static trace options.
      stream_ids: [...] int32 unique per-lane stream ids (e.g. the global
        pixel index). Defaults to the flattened lane position.
      stream_base: optional scalar promise that
        ``stream_ids.ravel() == stream_base + arange(n_lanes)`` (true for
        full frames and row-contiguous tile shards). The compacted path
        then recomputes stream ids from the carried lane id instead of
        paying a sort-payload column for them (TPU lax.sort cost is
        proportional to total operand columns).

    Returns (radiance [..., 3], aux dict). aux always carries "rays_cast"
    (int32 scalar: live path segments actually cast); the AOV entries are
    present only when opts.want_aux.
    """
    batch_shape = o.shape[:-1]
    if stream_ids is None:
        n_lanes = 1
        for s in batch_shape:
            n_lanes *= s
        stream_ids = jnp.arange(n_lanes, dtype=jnp.int32).reshape(batch_shape)

    if opts.lane_schedule is not None and _compaction_applies(opts):
        return _trace_compacted(
            scene, o, d, rng, opts, stream_ids, stream_base=stream_base
        )

    has_lights = scene.light_p.shape[0] > 0
    env_tex = scene.env_tex

    def bounce(state, b, sort=False):
        o, d, throughput, radiance, alive, rays, aux = state

        # Measured ray accounting: one path segment per live lane per cast
        # (dead lanes ride the kernels masked but are not credited).
        alive_n = jnp.sum(alive.astype(jnp.int32))
        rays = rays + alive_n

        t, tri_idx, _bu, _bv = traverse.cast_rays(
            scene, o, d,
            intersector=opts.intersector,
            brute_chunk=opts.brute_chunk,
            brute_max_tris=opts.brute_max_tris,
            sort=sort,
            alive=alive,
        )

        base_key, sample = rng
        uniforms = prng.uniforms(base_key, sample, b, stream_ids, 6)

        new_o, new_d, throughput, radiance, cont, ev, hit, missed = (
            _shade_vertex(scene, o, d, t, tri_idx, alive, uniforms,
                          opts, has_lights, throughput, radiance)
        )
        m = ev["material"]
        normal = ev["normal"]
        pdf = ev["pdf"]

        ylog = None
        if opts.log_paths:
            # One Cast_Info per lane per bounce (main.odin:42-47), plus the
            # anomaly ratios the reference color-codes
            # (raytracer.odin:502-515).
            ylog = {
                "o": o,
                "d": d,
                "t": jnp.where(hit, t, jnp.inf),
                "alive": alive,
                "hit": hit,
                "value_over_pdf": norm_l1(ev["value"]) / pdf,
                "throughput_l1": norm_l1(
                    jnp.where(cont[..., None], throughput, 0.0)
                ),
            }

        if opts.want_aux:
            # Registered debug probes (ops/probes.py — the debug_rc_set
            # analogue, main.odin:104-124): each folds its per-vertex value
            # into its accumulator. "_virgin" marks lanes that have not yet
            # had a live vertex (drives the first/first_hit reductions).
            ctx = probes.ProbeCtx(
                bounce=b, o=o, d=d, t=t, hit=hit, missed=missed,
                alive=alive, material=m, normal=normal, pdf=pdf,
                value=ev["value"], new_d=new_d, throughput=throughput,
                radiance=radiance,
            )
            first = aux["_virgin"]
            aux = dict(aux)
            for p in probes.active():
                if p.reduce != "final":
                    aux[p.name] = p.fold(aux[p.name], ctx, first)
            aux["_virgin"] = first & ~alive

        alive = cont
        o = new_o
        d = new_d
        return (o, d, throughput, radiance, alive, rays, aux), (ylog, alive_n)

    aux0 = {}
    if opts.want_aux:
        aux0 = {
            p.name: p.init(batch_shape)
            for p in probes.active()
            if p.reduce != "final"
        }
        aux0["_virgin"] = jnp.ones(batch_shape, bool)

    init = (
        o,
        d,
        jnp.ones(batch_shape + (3,), jnp.float32),
        jnp.zeros(batch_shape + (3,), jnp.float32),
        jnp.ones(batch_shape, bool),
        jnp.zeros((), jnp.int32),
        aux0,
    )
    if opts.depth <= 0:
        aux = dict(
            aux0, rays_cast=init[5], overflow=jnp.zeros((), jnp.int32),
            alive_counts=jnp.zeros((0,), jnp.int32),
        )
        if opts.want_aux:
            aux.pop("_virgin", None)
            fctx = probes.ProbeCtx(radiance=init[3])
            for p in probes.active():
                if p.reduce == "final":
                    aux[p.name] = jnp.asarray(p.fn(fctx), jnp.float32)
        return init[3], aux
    # First bounce: camera rays are already tile-coherent; later bounces are
    # re-bucketed (sort_rays) since scattered directions destroy coherence.
    state, (ylog0, alive0_n) = bounce(init, 0, sort=False)
    ylogs = None
    alive_ns = None
    if opts.depth > 1:
        (o, d, throughput, radiance, alive, rays, aux), (ylogs, alive_ns) = (
            jax.lax.scan(
                lambda s, b: bounce(s, b, sort=opts.sort_rays),
                state,
                jnp.arange(1, opts.depth),
            )
        )
    else:
        (o, d, throughput, radiance, alive, rays, aux) = state
    alive_counts = (
        alive0_n[None]
        if alive_ns is None
        else jnp.concatenate([alive0_n[None], alive_ns])
    )
    aux = dict(aux, rays_cast=rays, overflow=jnp.zeros((), jnp.int32),
               alive_counts=alive_counts)
    if opts.want_aux:
        aux.pop("_virgin", None)
        fctx = probes.ProbeCtx(radiance=radiance)
        for p in probes.active():
            if p.reduce == "final":
                aux[p.name] = jnp.asarray(p.fn(fctx), jnp.float32)
    if opts.log_paths:
        if ylogs is None:
            aux["ray_log"] = jax.tree_util.tree_map(
                lambda a: a[None], ylog0
            )
        else:
            aux["ray_log"] = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a[None], b], axis=0),
                ylog0, ylogs,
            )
    return radiance, aux


def _compaction_applies(opts: TraceOptions) -> bool:
    """Static check: dead-lane compaction needs the Pallas sorted-cast path
    and no per-lane instrumentation (AOVs accumulate at bounce 0 only in
    the compacted layout; ray logs need full-width lanes every bounce)."""
    if opts.depth <= 1 or opts.want_aux or opts.log_paths or not opts.sort_rays:
        return False
    if opts.intersector == "pallas":
        return True
    return opts.intersector == "auto" and jax.default_backend() != "cpu"


def _trace_compacted(scene, o, d, rng, opts: TraceOptions, stream_ids,
                     stream_base=None):
    """Dead-lane-compacted wavefront (TraceOptions.lane_schedule).

    Identical physics to `trace` (shared `_shade_vertex`/`eval_bounce`) and
    the identical sample set (counter-addressed RNG rides the carried
    stream ids), re-scheduled so every per-bounce stage runs at the static
    lane budget schedule[b-1] instead of full width:

      bounce 0   tiled full-width cast + shade (camera rays, image order)
      bounce b   exact masks -> lexicographic (dead|octant, masks) sort of
                 the FULL state (rays, throughput, radiance, stream, lane
                 id) -> slice to schedule[b-1] lanes (alive lanes are a
                 sorted prefix; the tail is dead and retires its radiance)
                 -> presorted cast (no unsort) -> shade in sorted order
      merge      every lane retires exactly once, so one concat + one sort
                 by lane id rebuilds the image order scatter-free.

    The reference analogue: recursion simply *ends* for dead paths
    (raytracer.odin:495-496); here the batched wavefront stops paying for
    them too, instead of masking. Overflow (more alive lanes than a slice)
    is counted in aux["overflow"]; a nonzero count invalidates the render
    and callers re-run uncompacted (see TraceOptions.lane_schedule).
    """
    if COLS:
        return _trace_compacted_cols(
            scene, o, d, rng, opts, stream_ids, stream_base=stream_base
        )
    from raytracer_odin_tpu.ops import pallas_intersect as pi
    from raytracer_odin_tpu.ops.geometry import BIG, RAY_EPS

    base_key, sample = rng
    has_lights = scene.light_p.shape[0] > 0
    batch_shape = o.shape[:-1]
    n0 = 1
    for s in batch_shape:
        n0 *= s
    rb = pi.RB
    n0p = -(-n0 // rb) * rb
    depth = opts.depth
    schedule = opts.lane_schedule

    # ---- bounce 0: full width, image order (camera rays are coherent) ----
    alive = jnp.ones(batch_shape, bool)
    rays = jnp.asarray(n0, jnp.int32)
    alive_counts = [rays]
    t, tri_idx, _bu, _bv = traverse.cast_rays(
        scene, o, d, intersector="pallas", sort=False
    )
    uniforms = prng.uniforms(base_key, sample, 0, stream_ids, 6)
    throughput = jnp.ones(batch_shape + (3,), jnp.float32)
    radiance = jnp.zeros(batch_shape + (3,), jnp.float32)
    o, d, throughput, radiance, alive, _ev, _hit, _missed = _shade_vertex(
        scene, o, d, t, tri_idx, alive, uniforms, opts, has_lights,
        throughput, radiance,
    )

    # Flatten and pad once to an RB multiple. Padding lanes are dead and
    # get merge ids >= n0, so the final merge sorts them past the image.
    def flat(x):
        return x.reshape((n0,) + x.shape[len(batch_shape):])

    o2, d2 = flat(o), flat(d)
    thr, rad = flat(throughput), flat(radiance)
    alive = flat(alive)
    # With an affine stream promise the per-lane stream id is a pure
    # function of the carried lane id (stream_base + iota), so it rides the
    # sorts for free instead of costing a payload column per bounce.
    affine = stream_base is not None
    stream = None if affine else flat(stream_ids)
    iota = jnp.arange(n0p, dtype=jnp.int32)
    pad = n0p - n0
    if pad:
        o2 = jnp.pad(o2, ((0, pad), (0, 0)))
        d2 = jnp.pad(d2, ((0, pad), (0, 0)))
        thr = jnp.pad(thr, ((0, pad), (0, 0)))
        rad = jnp.pad(rad, ((0, pad), (0, 0)))
        alive = jnp.pad(alive, (0, pad))  # False
        if not affine:
            stream = jnp.pad(stream, (0, pad))

    # Exact per-ray masks at any scene size: bits cover super-clusters of
    # g_exact clusters (traverse.exact_cull_layout; g_exact == 1 for small
    # scenes), expanded + interval-refined in cast_presorted.
    _g_exact, n_super, aabb8 = traverse.exact_cull_layout(scene)

    retired_iota = []
    retired_rad = []
    overflow = jnp.zeros((), jnp.int32)
    width = n0p
    if affine:
        stream = jnp.asarray(stream_base, jnp.int32) + iota

    far_o = jnp.asarray([BIG, 0.0, 0.0], jnp.float32)
    unit_x = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    # MEASURED (r3c, real v5e): moving the state through the permutation as
    # sort PAYLOAD COLUMNS is the cheapest form, by a wide margin. The
    # consolidated-table alternative — sort (keys, position) only, then one
    # [N, 13] row-gather — collapsed the sort bucket 85.7 -> 26.6 ms/step
    # but the gather cost 126.8 ms/step: XLA laid the table out
    # column-major ({0,1}: rows minor, so the kernel-row transposes were
    # free) and each gathered row then touched 13 separate (8,128) tiles.
    # Sort columns move at ~0.65 ns/element; big-array row gathers at
    # ~15.6 ns/row. Payload-in-sort IS the TPU-native permutation mover
    # for wide per-lane state (see also the r2 5-separate-arrays negative
    # result in ARCHITECTURE.md).
    for b in range(1, depth):
        # Dead lanes become degenerate far rays: empty masks, dead-last sort.
        o_dead = jnp.where(alive[:, None], o2, far_o)
        d_dead = jnp.where(alive[:, None], d2, unit_x)

        if (b - 1) % SORT_EVERY != 0:
            # Skip-sort bounce (RT_TPU_SORT_EVERY > 1, a measured
            # experiment): cast/shade in the PREVIOUS bounce's lane order.
            # No compaction (no slice, no retirement) — the permutation is
            # reused, the sort bill halves, and the exact-mask lists pay
            # whatever coherence decay one unsorted scatter causes.
            ox_, oy_, oz_ = o_dead[:, 0], o_dead[:, 1], o_dead[:, 2]
            dx_, dy_, dz_ = d_dead[:, 0], d_dead[:, 1], d_dead[:, 2]
            zc = jnp.zeros_like(ox_)
            rays_pre = jnp.stack(
                [ox_ + dx_ * RAY_EPS, oy_ + dy_ * RAY_EPS,
                 oz_ + dz_ * RAY_EPS, dx_, dy_, dz_, zc, zc], axis=0,
            )
            words_p = pi.cluster_masks_rows(aabb8, rays_pre, n_super)
            n_alive = jnp.sum(alive.astype(jnp.int32))
            alive_counts.append(n_alive)
            rays = rays + n_alive
            t, tri_idx, _bu, _bv = traverse.cast_presorted_rows(
                scene, rays_pre, words=words_p
            )
            uniforms = prng.uniforms(base_key, sample, b, stream, 6)
            o2, d2, thr, rad, alive, _ev, _h, _m = _shade_vertex(
                scene, o2, d2, t, tri_idx, alive, uniforms, opts,
                has_lights, thr, rad,
            )
            continue

        s_width = schedule[b - 1] if b - 1 < len(schedule) else schedule[-1]
        s_width = max(rb, min(width, (int(s_width) // rb) * rb))
        octant = traverse._ray_octant(d_dead)
        ocx, ocy, ocz = o_dead[:, 0], o_dead[:, 1], o_dead[:, 2]
        dcx, dcy, dcz = d_dead[:, 0], d_dead[:, 1], d_dead[:, 2]
        payload = (
            ocx, ocy, ocz, dcx, dcy, dcz,
            thr[:, 0], thr[:, 1], thr[:, 2],
            rad[:, 0], rad[:, 1], rad[:, 2],
            iota,
        ) + (() if affine else (stream,))
        # Mask-kernel rows straight from the payload columns (one axis-0
        # stack; the lane-major [N, 3] -> [8, N] transpose pack_rays would
        # pay costs a full-width relayout per bounce).
        zcol = jnp.zeros_like(ocx)
        rays_pre = jnp.stack(
            [ocx + dcx * RAY_EPS, ocy + dcy * RAY_EPS, ocz + dcz * RAY_EPS,
             dcx, dcy, dcz, zcol, zcol], axis=0,
        )
        words_p = pi.cluster_masks_rows(aabb8, rays_pre, n_super)
        keys, word_slots = traverse._lex_sort_keys(
            alive, octant, [words_p[i] for i in range(words_p.shape[0])],
            n_super,
        )
        sorted_ops = jax.lax.sort(
            tuple(keys) + payload, num_keys=len(keys)
        )
        s_words = jnp.stack(
            [sorted_ops[i][:s_width] for i in word_slots], axis=0
        )
        vals = sorted_ops[len(keys):]

        n_alive = jnp.sum(alive.astype(jnp.int32))
        alive_counts.append(n_alive)
        overflow = overflow + jnp.maximum(0, n_alive - s_width)

        # The tail is dead (or overflow, which poisons the render): its
        # radiance is final — retire it for the scatter-free merge.
        retired_iota.append(vals[12][s_width:])
        retired_rad.append(
            jnp.stack(
                [vals[9][s_width:], vals[10][s_width:], vals[11][s_width:]],
                axis=-1,
            )
        )

        sox, soy, soz = (v[:s_width] for v in vals[0:3])
        sdx, sdy, sdz = (v[:s_width] for v in vals[3:6])
        o2 = jnp.stack([sox, soy, soz], axis=-1)
        d2 = jnp.stack([sdx, sdy, sdz], axis=-1)
        thr = jnp.stack([v[:s_width] for v in vals[6:9]], axis=-1)
        rad = jnp.stack([v[:s_width] for v in vals[9:12]], axis=-1)
        iota = vals[12][:s_width]
        stream = (
            jnp.asarray(stream_base, jnp.int32) + iota
            if affine else vals[13][:s_width]
        )
        alive = jnp.arange(s_width, dtype=jnp.int32) < n_alive
        width = s_width

        # Cast count: alive lanes are a sorted prefix, so the post-slice
        # count is min(n_alive, s_width) exactly — no full-width reduce.
        rays = rays + jnp.minimum(n_alive, s_width)
        # Sweep-kernel rows from the sorted columns (RAY_EPS-offset; same
        # cast_ray semantics as cast_presorted, raytracer.odin:416-430).
        zs = jnp.zeros_like(sox)
        rays_sorted = jnp.stack(
            [sox + sdx * RAY_EPS, soy + sdy * RAY_EPS, soz + sdz * RAY_EPS,
             sdx, sdy, sdz, zs, zs], axis=0,
        )
        t, tri_idx, _bu, _bv = traverse.cast_presorted_rows(
            scene, rays_sorted, words=s_words
        )
        uniforms = prng.uniforms(base_key, sample, b, stream, 6)
        o2, d2, thr, rad, alive, _ev, _h, _m = _shade_vertex(
            scene, o2, d2, t, tri_idx, alive, uniforms, opts,
            has_lights, thr, rad,
        )

    # ---- scatter-free merge: each lane id appears exactly once ----
    retired_iota.append(iota)
    retired_rad.append(rad)
    all_iota = jnp.concatenate(retired_iota)
    all_rad = jnp.concatenate(retired_rad, axis=0)
    _, r0, r1, r2 = jax.lax.sort(
        (all_iota, all_rad[:, 0], all_rad[:, 1], all_rad[:, 2]), num_keys=1
    )
    radiance = jnp.stack([r0, r1, r2], axis=-1)[:n0].reshape(
        batch_shape + (3,)
    )
    aux = {
        "rays_cast": rays,
        "overflow": overflow,
        "alive_counts": jnp.stack(alive_counts),
    }
    return radiance, aux


def _trace_compacted_cols(scene, o, d, rng, opts: TraceOptions, stream_ids,
                     stream_base=None):
    """Dead-lane-compacted wavefront (TraceOptions.lane_schedule).

    Identical physics to `trace` — the shade stage runs through
    `_shade_vertex_cols` / ops/shading_cols.py, an op-for-op columnar
    mirror of `_shade_vertex` / ops/shading.py (parity pinned by
    tests/test_shading_cols.py) — and the identical sample set
    (counter-addressed RNG rides the carried stream ids), re-scheduled so
    every per-bounce stage runs at the static lane budget schedule[b-1]
    instead of full width:

      bounce 0   tiled full-width cast + shade (camera rays, image order)
      bounce b   exact masks -> lexicographic (dead|octant, masks) sort of
                 the FULL state (rays, throughput, radiance, stream, lane
                 id) -> slice to schedule[b-1] lanes (alive lanes are a
                 sorted prefix; the tail is dead and retires its radiance)
                 -> presorted cast (no unsort) -> shade in sorted order
      merge      every lane retires exactly once, so one concat + one sort
                 by lane id rebuilds the image order scatter-free.

    The reference analogue: recursion simply *ends* for dead paths
    (raytracer.odin:495-496); here the batched wavefront stops paying for
    them too, instead of masking. Overflow (more alive lanes than a slice)
    is counted in aux["overflow"]; a nonzero count invalidates the render
    and callers re-run uncompacted (see TraceOptions.lane_schedule).
    """
    from raytracer_odin_tpu.ops import pallas_intersect as pi
    from raytracer_odin_tpu.ops.geometry import BIG, RAY_EPS

    base_key, sample = rng
    has_lights = scene.light_p.shape[0] > 0
    batch_shape = o.shape[:-1]
    n0 = 1
    for s in batch_shape:
        n0 *= s
    rb = pi.RB
    n0p = -(-n0 // rb) * rb
    depth = opts.depth
    schedule = opts.lane_schedule

    # ---- bounce 0: full width, image order (camera rays are coherent) ----
    # The cast takes the camera rays in their native [N, 3] form; the state
    # is then flattened, padded to an RB multiple and SPLIT INTO COLUMNS
    # once — from here on no [N, 3] per-lane state exists on this path
    # (columns sort, cast and shade at full lane efficiency; see
    # utils/vec3c.py). Padding lanes are dead (tri_idx -1) and get merge
    # ids >= n0, so the final merge sorts them past the image.
    rays = jnp.asarray(n0, jnp.int32)
    alive_counts = [rays]
    t, tri_idx, _bu, _bv = traverse.cast_rays(
        scene, o, d, intersector="pallas", sort=False
    )
    pad = n0p - n0
    iota = jnp.arange(n0p, dtype=jnp.int32)

    def flatpad(x, fill=0):
        x = x.reshape((n0,) + x.shape[len(batch_shape):])
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, widths, constant_values=fill)
        return x

    # With an affine stream promise the per-lane stream id is a pure
    # function of the carried lane id (stream_base + iota), so it rides the
    # sorts for free instead of costing a payload column per bounce.
    affine = stream_base is not None
    if affine:
        stream = jnp.asarray(stream_base, jnp.int32) + iota
    else:
        stream = flatpad(stream_ids)
    of, df = flatpad(o), flatpad(d)
    o2 = (of[:, 0], of[:, 1], of[:, 2])
    d2 = (df[:, 0], df[:, 1], df[:, 2])
    t = flatpad(t)
    tri_idx = flatpad(tri_idx, fill=-1)
    alive = iota < n0
    ones = jnp.ones((n0p,), jnp.float32)
    zeros = jnp.zeros((n0p,), jnp.float32)
    thr = (ones, ones, ones)
    rad = (zeros, zeros, zeros)
    uniforms = prng.uniforms_cols(base_key, sample, 0, stream, 6)
    o2, d2, thr, rad, alive = _shade_vertex_cols(
        scene, o2, d2, t, tri_idx, alive, uniforms, opts, has_lights,
        thr, rad,
    )

    # Exact per-ray masks at any scene size: bits cover super-clusters of
    # g_exact clusters (traverse.exact_cull_layout; g_exact == 1 for small
    # scenes), expanded + interval-refined in cast_presorted.
    _g_exact, n_super, aabb8 = traverse.exact_cull_layout(scene)

    retired_iota = []
    # Retired radiance rides as three SEPARATE [tail] channel columns.
    # Stacking each tail to [tail, 3] and re-slicing columns at the merge
    # (the r4 form) materialized a relayout pass per bounce AND made the
    # final merge sort consume strided slices of [N, 3] concats — trace-
    # measured 21.5 ms/step for a 4-column merge whose standalone cost is
    # ~9 ms. Columns in, columns out: [N, 3] never exists on this path.
    retired_r, retired_g, retired_b = [], [], []
    overflow = jnp.zeros((), jnp.int32)
    width = n0p

    # MEASURED (r3c, real v5e): moving the state through the permutation as
    # sort PAYLOAD COLUMNS is the cheapest form, by a wide margin. The
    # consolidated-table alternative — sort (keys, position) only, then one
    # [N, 13] row-gather — collapsed the sort bucket 85.7 -> 26.6 ms/step
    # but the gather cost 126.8 ms/step: XLA laid the table out
    # column-major ({0,1}: rows minor, so the kernel-row transposes were
    # free) and each gathered row then touched 13 separate (8,128) tiles.
    # Sort columns move at ~0.65 ns/element; big-array row gathers at
    # ~15.6 ns/row. Payload-in-sort IS the TPU-native permutation mover
    # for wide per-lane state (see also the r2 5-separate-arrays negative
    # result in ARCHITECTURE.md).
    for b in range(1, depth):
        # Dead lanes become degenerate far rays: empty masks, dead-last
        # sort (far_o = [BIG, 0, 0], unit_x direction — columnar).
        ocx = jnp.where(alive, o2[0], BIG)
        ocy = jnp.where(alive, o2[1], 0.0)
        ocz = jnp.where(alive, o2[2], 0.0)
        dcx = jnp.where(alive, d2[0], 1.0)
        dcy = jnp.where(alive, d2[1], 0.0)
        dcz = jnp.where(alive, d2[2], 0.0)

        if (b - 1) % SORT_EVERY != 0:
            # Skip-sort bounce (RT_TPU_SORT_EVERY > 1, a measured
            # experiment): cast/shade in the PREVIOUS bounce's lane order.
            # No compaction (no slice, no retirement) — the permutation is
            # reused, the sort bill halves, and the exact-mask lists pay
            # whatever coherence decay one unsorted scatter causes.
            zc = jnp.zeros_like(ocx)
            rays_pre = jnp.stack(
                [ocx + dcx * RAY_EPS, ocy + dcy * RAY_EPS,
                 ocz + dcz * RAY_EPS, dcx, dcy, dcz, zc, zc], axis=0,
            )
            words_p = pi.cluster_masks_rows(aabb8, rays_pre, n_super)
            n_alive = jnp.sum(alive.astype(jnp.int32))
            alive_counts.append(n_alive)
            rays = rays + n_alive
            t, tri_idx, _bu, _bv = traverse.cast_presorted_rows(
                scene, rays_pre, words=words_p
            )
            uniforms = prng.uniforms_cols(base_key, sample, b, stream, 6)
            o2, d2, thr, rad, alive = _shade_vertex_cols(
                scene, o2, d2, t, tri_idx, alive, uniforms, opts,
                has_lights, thr, rad,
            )
            continue

        s_width = schedule[b - 1] if b - 1 < len(schedule) else schedule[-1]
        s_width = max(rb, min(width, (int(s_width) // rb) * rb))
        octant = (
            (dcx < 0).astype(jnp.int32)
            + 2 * (dcy < 0).astype(jnp.int32)
            + 4 * (dcz < 0).astype(jnp.int32)
        )
        payload = (
            ocx, ocy, ocz, dcx, dcy, dcz,
            thr[0], thr[1], thr[2],
            rad[0], rad[1], rad[2],
            iota,
        ) + (() if affine else (stream,))
        # Mask-kernel rows straight from the payload columns (one axis-0
        # stack; the lane-major [N, 3] -> [8, N] transpose pack_rays would
        # pay costs a full-width relayout per bounce).
        zcol = jnp.zeros_like(ocx)
        rays_pre = jnp.stack(
            [ocx + dcx * RAY_EPS, ocy + dcy * RAY_EPS, ocz + dcz * RAY_EPS,
             dcx, dcy, dcz, zcol, zcol], axis=0,
        )
        words_p = pi.cluster_masks_rows(aabb8, rays_pre, n_super)
        keys, word_slots = traverse._lex_sort_keys(
            alive, octant, [words_p[i] for i in range(words_p.shape[0])],
            n_super,
        )
        sorted_ops = jax.lax.sort(
            tuple(keys) + payload, num_keys=len(keys)
        )
        s_words = jnp.stack(
            [sorted_ops[i][:s_width] for i in word_slots], axis=0
        )
        vals = sorted_ops[len(keys):]

        n_alive = jnp.sum(alive.astype(jnp.int32))
        alive_counts.append(n_alive)
        overflow = overflow + jnp.maximum(0, n_alive - s_width)

        # The tail is dead (or overflow, which poisons the render): its
        # radiance is final — retire it for the scatter-free merge.
        retired_iota.append(vals[12][s_width:])
        retired_r.append(vals[9][s_width:])
        retired_g.append(vals[10][s_width:])
        retired_b.append(vals[11][s_width:])

        sox, soy, soz = (v[:s_width] for v in vals[0:3])
        sdx, sdy, sdz = (v[:s_width] for v in vals[3:6])
        o2 = (sox, soy, soz)
        d2 = (sdx, sdy, sdz)
        thr = tuple(v[:s_width] for v in vals[6:9])
        rad = tuple(v[:s_width] for v in vals[9:12])
        iota = vals[12][:s_width]
        stream = (
            jnp.asarray(stream_base, jnp.int32) + iota
            if affine else vals[13][:s_width]
        )
        alive = jnp.arange(s_width, dtype=jnp.int32) < n_alive
        width = s_width

        # Cast count: alive lanes are a sorted prefix, so the post-slice
        # count is min(n_alive, s_width) exactly — no full-width reduce.
        rays = rays + jnp.minimum(n_alive, s_width)
        # Sweep-kernel rows from the sorted columns (RAY_EPS-offset; same
        # cast_ray semantics as cast_presorted, raytracer.odin:416-430).
        zs = jnp.zeros_like(sox)
        rays_sorted = jnp.stack(
            [sox + sdx * RAY_EPS, soy + sdy * RAY_EPS, soz + sdz * RAY_EPS,
             sdx, sdy, sdz, zs, zs], axis=0,
        )
        t, tri_idx, _bu, _bv = traverse.cast_presorted_rows(
            scene, rays_sorted, words=s_words
        )
        uniforms = prng.uniforms_cols(base_key, sample, b, stream, 6)
        o2, d2, thr, rad, alive = _shade_vertex_cols(
            scene, o2, d2, t, tri_idx, alive, uniforms, opts,
            has_lights, thr, rad,
        )

    # ---- scatter-free merge: each lane id appears exactly once ----
    retired_iota.append(iota)
    retired_r.append(rad[0])
    retired_g.append(rad[1])
    retired_b.append(rad[2])
    all_iota = jnp.concatenate(retired_iota)
    _, r0, r1, r2 = jax.lax.sort(
        (all_iota, jnp.concatenate(retired_r), jnp.concatenate(retired_g),
         jnp.concatenate(retired_b)), num_keys=1
    )
    radiance = jnp.stack([r0, r1, r2], axis=-1)[:n0].reshape(
        batch_shape + (3,)
    )
    aux = {
        "rays_cast": rays,
        "overflow": overflow,
        "alive_counts": jnp.stack(alive_counts),
    }
    return radiance, aux
