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

from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops import shading, texture, traverse
from raytracer_odin_tpu.utils import prng
from raytracer_odin_tpu.utils.math3d import dot, norm_l1, normalize


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


def _point_material(scene, o, d, t, tri_idx, bu, bv):
    """Evaluate the hit-point material (raytracer.odin:448-488).

    All per-triangle data (attributes + inlined material) arrives in one
    contiguous row-gather (scene.shade_row) — the dominant cost of this
    stage on TPU is gathers, so it is exactly one per hit plus the texture
    taps. The row layout is scene-specialized (models/build.py): blocks the
    scene cannot use are not packed, and the corresponding math (texcoord
    interpolation, tangent-space normal mapping, per-kind texture gathers)
    compiles out entirely — the TPU analogue of the reference's
    compile-time `when` gating (main.odin:17-18).

    The hit position is o + d*t — exact for the `cast_ray` convention
    (RAY_EPS pushed into the origin and re-added to t,
    raytracer.odin:416-430) — instead of the reference's barycentric
    interpolation p + bu*u + bv*v; the two agree to float rounding.

    Returns dict with pos, normal (possibly normal-mapped, not yet
    inside-flipped), ng, color, emission, metallic, roughness, inside.
    """
    ti = jnp.maximum(tri_idx, 0)
    w0 = (1.0 - bu - bv)[..., None]
    w1 = bu[..., None]
    w2 = bv[..., None]
    spec = dict(scene.row_spec)
    kinds = scene.tex_kinds

    row = scene.shade_row[ti]  # [..., RW] single gather

    def blk(name, width):
        s = spec[name]
        return row[..., s:s + width]

    pos = o + d * t[..., None]

    if "texids" in spec:
        tex = blk("tex", 6).reshape(ti.shape + (3, 2))
        texcoords = (
            tex[..., 0, :] * w0 + tex[..., 1, :] * w1 + tex[..., 2, :] * w2
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

    tri_n = blk("n", 9).reshape(ti.shape + (3, 3))
    n_interp = (
        tri_n[..., 0, :] * w0 + tri_n[..., 1, :] * w1 + tri_n[..., 2, :] * w2
    )
    n_smooth = normalize(n_interp, eps=1e-20)

    if kinds[3]:
        # Normal mapping branch (raytracer.odin:458-470): the interpolated
        # tangent4 is normalized as a 4-vector (faithful to the reference,
        # including the resulting non-orthonormal basis).
        tri_tan = blk("tan", 12).reshape(ti.shape + (3, 4))
        tan4 = (
            tri_tan[..., 0, :] * w0 + tri_tan[..., 1, :] * w1
            + tri_tan[..., 2, :] * w2
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


def eval_bounce(scene, o, d, t, tri_idx, bu, bv, uniforms, opts: TraceOptions,
                has_lights: bool):
    """Shared per-vertex shading logic (used by the batched trace and the
    persistent wavefront pool): material evaluation, mixture sampling, pdf,
    BRDF value and the continuation rule.

    Returns dict: hit_valid-independent fields are garbage on misses and
    must be masked by the caller (`hit`).
    """
    m = _point_material(scene, o, d, t, tri_idx, bu, bv)
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


def trace(scene, o, d, rng, opts: TraceOptions, stream_ids=None):
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
    has_lights = scene.light_p.shape[0] > 0
    env_tex = scene.env_tex

    def bounce(state, b, sort=False):
        o, d, throughput, radiance, alive, rays, aux = state

        # Measured ray accounting: one path segment per live lane per cast
        # (dead lanes ride the kernels masked but are not credited).
        rays = rays + jnp.sum(alive.astype(jnp.int32))

        t, tri_idx, bu, bv = traverse.cast_rays(
            scene, o, d,
            intersector=opts.intersector,
            brute_chunk=opts.brute_chunk,
            brute_max_tris=opts.brute_max_tris,
            sort=sort,
            alive=alive,
        )
        hit = (tri_idx >= 0) & alive
        missed = (~(tri_idx >= 0)) & alive

        if env_tex >= 0:
            env = texture.sample_env(scene, d, env_tex)
            radiance = radiance + jnp.where(
                missed[..., None], throughput * env, 0.0
            )

        base_key, sample = rng
        uniforms = prng.uniforms(base_key, sample, b, stream_ids, 6)

        ev = eval_bounce(scene, o, d, t, tri_idx, bu, bv, uniforms, opts,
                         has_lights)
        m = ev["material"]
        normal = ev["normal"]
        pdf = ev["pdf"]

        radiance = radiance + jnp.where(
            hit[..., None], throughput * m["emission"], 0.0
        )

        cont = ev["cont"] & hit
        ratio = ev["value"] / pdf[..., None]
        throughput = jnp.where(
            cont[..., None], throughput * ratio, throughput
        )
        new_d = ev["new_d"]

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
            first = aux["bounces"] == 0
            upd = first & alive
            aux = dict(aux)
            aux["first_t"] = jnp.where(upd & hit, t, aux["first_t"])
            aux["first_normal"] = jnp.where(
                (upd & hit)[..., None], normal, aux["first_normal"]
            )
            aux["albedo"] = jnp.where((upd & hit)[..., None], m["color"], aux["albedo"])
            aux["first_emission"] = jnp.where(
                (upd & hit)[..., None], m["emission"], aux["first_emission"]
            )
            aux["first_uv"] = jnp.where(
                (upd & hit)[..., None], m["texcoords"], aux["first_uv"]
            )
            aux["first_pdf"] = jnp.where(upd & hit, pdf, aux["first_pdf"])
            aux["prim_miss"] = jnp.where(upd, missed, aux["prim_miss"])
            aux["bounces"] = aux["bounces"] + alive.astype(jnp.int32)

        alive = cont
        o = m["pos"]
        d = new_d
        return (o, d, throughput, radiance, alive, rays, aux), ylog

    aux0 = {}
    if opts.want_aux:
        aux0 = {
            "first_t": jnp.zeros(batch_shape, jnp.float32),
            "first_normal": jnp.zeros(batch_shape + (3,), jnp.float32),
            "albedo": jnp.zeros(batch_shape + (3,), jnp.float32),
            "first_emission": jnp.zeros(batch_shape + (3,), jnp.float32),
            "first_uv": jnp.zeros(batch_shape + (2,), jnp.float32),
            "first_pdf": jnp.zeros(batch_shape, jnp.float32),
            "prim_miss": jnp.zeros(batch_shape, bool),
            "bounces": jnp.zeros(batch_shape, jnp.int32),
        }

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
        return init[3], dict(aux0, rays_cast=init[5])
    # First bounce: camera rays are already tile-coherent; later bounces are
    # re-bucketed (sort_rays) since scattered directions destroy coherence.
    state, ylog0 = bounce(init, 0, sort=False)
    ylogs = None
    if opts.depth > 1:
        (o, d, throughput, radiance, alive, rays, aux), ylogs = jax.lax.scan(
            lambda s, b: bounce(s, b, sort=opts.sort_rays),
            state,
            jnp.arange(1, opts.depth),
        )
    else:
        (o, d, throughput, radiance, alive, rays, aux) = state
    aux = dict(aux, rays_cast=rays)
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
