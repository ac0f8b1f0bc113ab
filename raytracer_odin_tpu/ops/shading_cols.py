"""Columnar (structure-of-columns) forms of the sampling + BRDF stage.

Function-for-function mirror of ops/shading.py (same reference citations,
same operation order) with every 3-vector carried as (x, y, z) component
columns — see utils/vec3c.py for why: [N, 3] operands cap shade-stage
fusions at a fraction of HBM bandwidth on TPU; the columnar forms measure
3.14x faster on the representative chain (tools/layout_probe.py).

The compacted wavefront (ops/integrator._trace_compacted) shades through
this module; the batched/debug path and the CPU oracle keep the [..., 3]
forms in ops/shading.py. Parity between the two is pinned by
tests/test_shading_cols.py at float-ULP tolerance (the only permitted
difference is jnp.sum's 3-element reduction order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.utils import vec3c as v3
from raytracer_odin_tpu.utils.math3d import sq

PI = jnp.pi
TAU = 2.0 * jnp.pi


def sphere_uniform(u1, u2):
    """shading.sphere_uniform (shading.odin:9-15), columnar."""
    phi = TAU * u1
    z = 2.0 * u2 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - sq(z), 0.0))
    return (jnp.sin(phi) * r, jnp.cos(phi) * r, z)


def cosine_weighted(n, u1, u2):
    """normalize(sphere_uniform() + n) (shading.odin:32-35)."""
    return v3.normalize(v3.add(sphere_uniform(u1, u2), n), eps=1e-20)


def cosine_weighted_pdf(n, omega):
    """max(dot(n, omega)/pi, 0) (shading.odin:37-39)."""
    return jnp.maximum(v3.dot(n, omega) / PI, 0.0)


def _light_columns(scene, idx):
    """Sampled light's (p, u, v) rows as columns. Delegates to the row-form
    one-hot contraction (shading._small_table_lookup, HIGHEST precision —
    see the energy-bias note there) and splits at the boundary: the row
    einsum is ONE [N, L]x[L, 3] MXU contraction per table, where the
    per-component "...l,l->..." split lowered to nine [N, L] VPU
    multiply-reduce sweeps — trace-measured +114 ms/step of reduce time at
    demo's light count (r5 columnar profile). The [N, 3] boundary is three
    sub-ms splats."""
    from raytracer_odin_tpu.ops import shading

    return tuple(
        v3.splat(shading._small_table_lookup(t, idx))
        for t in (scene.light_p, scene.light_u, scene.light_v)
    )


def surface_sample(scene, origin, u_idx, u1, u2):
    """shading.surface_sample (shading.odin:41-50), columnar."""
    n_lights = scene.light_p.shape[0]
    idx = jnp.minimum((u_idx * n_lights).astype(jnp.int32), n_lights - 1)
    u = u1
    v = u2
    flip = u + v > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    lp, lu, lv = _light_columns(scene, idx)
    world = v3.add(lp, v3.add(v3.scale(lu, u), v3.scale(lv, v)))
    return v3.normalize(v3.sub(world, origin), eps=1e-20)


def light_pdf_sum(scene, o, d, chunk: int = 256):
    """shading.light_pdf_sum (shading.odin:52-100) on column inputs.

    Delegates to the row-form chunked sweep at a stack boundary. An
    unrolled per-light pure-column sweep was built and trace-measured
    SLOWER (+~96 ms/step of elementwise fusion at demo's 14 lights, r5
    columnar profile): per-light the chain re-reads the six o/d columns
    from HBM, where the row sweep's [N, chunk] broadcasts amortize one
    read of o/d across the whole light list. The two [N, 3] stacks are
    sub-ms."""
    n_lights = scene.light_p.shape[0]
    if n_lights == 0:
        return jnp.zeros(o[0].shape, jnp.float32)
    from raytracer_odin_tpu.ops import shading

    return shading.light_pdf_sum(
        scene, v3.stack(o), v3.stack(d), chunk=chunk
    )


def vndf_sample(n, omega, alpha, u1, u2):
    """shading.vndf_sample (Heitz VNDF, shading.odin:102-122), columnar."""
    rot = v3.quat_from_z_to(n)
    V = v3.quat_rotate(v3.quat_conj(rot), omega)
    Vh = v3.normalize((alpha * V[0], alpha * V[1], V[2]), eps=1e-20)
    lensq = jnp.hypot(Vh[0], Vh[1])
    safe_len = jnp.where(lensq == 0, 1.0, lensq)
    zero = jnp.zeros_like(safe_len)
    degen = lensq == 0
    T1 = (
        jnp.where(degen, 1.0, -Vh[1] / safe_len),
        jnp.where(degen, 0.0, Vh[0] / safe_len),
        zero,
    )
    T2 = v3.cross(Vh, T1)
    r = jnp.sqrt(u1)
    phi = TAU * u2
    t1 = r * jnp.sin(phi)
    t2 = r * jnp.cos(phi)
    s = 0.5 * (1.0 + Vh[2])
    t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - sq(t1), 0.0)) + s * t2
    t3 = jnp.sqrt(jnp.maximum(0.0, 1.0 - sq(t1) - sq(t2)))
    Nh = v3.add(v3.add(v3.scale(T1, t1), v3.scale(T2, t2)), v3.scale(Vh, t3))
    Ne = v3.normalize(
        (alpha * Nh[0], alpha * Nh[1], jnp.maximum(0.0, Nh[2])), eps=1e-20
    )
    return v3.quat_rotate(rot, Ne)


def vndf_pdf(n, omega, alpha, L):
    """shading.vndf_pdf (shading.odin:124-137), columnar."""
    Ne = v3.normalize(v3.add(omega, L), eps=1e-20)
    rot = v3.quat_from_z_to(n)
    V = v3.quat_rotate(v3.quat_conj(rot), omega)
    N = v3.quat_rotate(v3.quat_conj(rot), Ne)
    alpha2 = sq(alpha)
    lam = (
        -1.0 + jnp.sqrt(1.0 + alpha2 * (sq(V[0]) + sq(V[1])) / sq(V[2]))
    ) * 0.5
    G1 = 1.0 / (1.0 + lam)
    D = 1.0 / (
        PI * alpha2 * sq(sq(N[0] / alpha) + sq(N[1] / alpha) + sq(N[2]))
    )
    normal = G1 * jnp.maximum(0.0, v3.dot(V, N)) * D / V[2]
    return normal / (4.0 * v3.dot(L, Ne))


def sample_direction(scene, mat_pos, mat_normal, mat_roughness, in_d,
                     uniforms, has_lights: bool):
    """shading.sample_direction (shading.odin:139-151), columnar.

    uniforms: 6-tuple of [N] columns (strategy t, a, b, light idx, a2, b2).
    """
    t = uniforms[0]
    d_cos = cosine_weighted(mat_normal, uniforms[1], uniforms[2])
    if has_lights:
        d_light = surface_sample(
            scene, mat_pos, uniforms[3], uniforms[4], uniforms[5]
        )
    else:
        d_light = d_cos
    nh = vndf_sample(
        mat_normal, v3.neg(in_d), sq(mat_roughness), uniforms[4], uniforms[5]
    )
    d_vndf = v3.sub(in_d, v3.scale(nh, 2.0 * v3.dot(nh, in_d)))

    use_cos = t <= 0.33333
    use_light = (~use_cos) & (t < 0.666666) & has_lights
    return v3.where(use_cos, d_cos, v3.where(use_light, d_light, d_vndf))


def mixture_pdf(scene, mat_pos, mat_normal, mat_roughness, in_d, out_d,
                has_lights: bool, light_chunk: int = 256):
    """shading.mixture_pdf (shading.odin:153-162), columnar."""
    p_cos = cosine_weighted_pdf(mat_normal, out_d)
    p_vndf = vndf_pdf(mat_normal, v3.neg(in_d), sq(mat_roughness), out_d)
    if has_lights:
        from raytracer_odin_tpu.ops import light_cull

        n_lights = int(scene.light_p.shape[0])
        if (
            n_lights >= light_cull.threshold()
            and jax.default_backend() != "cpu"
        ):
            p_light = light_cull.light_pdf_sum_culled(
                scene, v3.stack(mat_pos), v3.stack(out_d)
            )
        else:
            p_light = light_pdf_sum(scene, mat_pos, out_d, chunk=light_chunk)
        return (p_cos + p_light + p_vndf) / 3.0
    return (p_cos + p_vndf * 2.0) / 3.0


def shade(mat_color, mat_normal, mat_metallic, mat_roughness, in_d, out_d):
    """shading.shade (Cook-Torrance GGX + Lambert, shading.odin:164-204),
    columnar; returns BRDF x cos(theta) as 3 columns."""
    alpha = sq(mat_roughness)
    alpha2 = sq(alpha)

    L = out_d
    V = v3.neg(in_d)
    H = v3.normalize(v3.add(L, V), eps=1e-20)
    N = mat_normal

    cosine = v3.dot(L, N)

    f0, f90 = 0.04, 1.0
    fb = 1.0 - v3.dot(H, L)
    fresnel_base = fb * fb * fb * fb * fb
    fresnel_diff_spec = f0 + (f90 - f0) * fresnel_base

    hn = v3.dot(H, N)
    distribution = (
        alpha2
        * (hn >= 0).astype(alpha2.dtype)
        / (PI * sq((alpha2 - 1.0) * sq(hn) + 1.0))
    )

    def smith_g(x):
        c = v3.dot(N, x)
        return 2.0 * jnp.maximum(c, 0.0) / (
            c + jnp.sqrt(alpha2 + (1.0 - alpha2) * sq(c))
        )

    geometry = smith_g(L) * smith_g(V)
    cook_torrance = distribution * geometry / (4.0 * v3.dot(V, N))

    lamb = jnp.maximum(cosine, 0.0) / PI

    out = []
    for c in range(3):
        fresnel_metallic = mat_color[c] + (f90 - mat_color[c]) * fresnel_base
        diffuse = mat_color[c] * lamb
        metallic_term = cook_torrance * fresnel_metallic
        dielectric = diffuse + (cook_torrance - diffuse) * fresnel_diff_spec
        out.append(dielectric + (metallic_term - dielectric) * mat_metallic)
    return tuple(out)
