"""Sampling strategies + BRDF, vectorized (shading.odin).

One-sample MIS mixture with weights 1/3 cosine-hemisphere, 1/3 emissive-
surface, 1/3 GGX-VNDF (shading.odin:139-151); when the scene has no emissive
surfaces the light branch is skipped and VNDF absorbs its probability mass
(VNDF pdf weighted x2, shading.odin:160-161).

The combined pdf is the arithmetic mean of the three strategy pdfs
(shading.odin:153-162); the light pdf sums over *all* emissive triangles
intersected along the ray, converting area -> solid angle with
t^2 / |cos(theta)| (shading.odin:52-60). On TPU that second tree walk
becomes a chunked brute-force sweep over the light list — perfectly regular
VPU work (see light_pdf_sum).

The BRDF is glTF metallic-roughness Cook-Torrance GGX + Lambert
(shading.odin:164-204), reproduced term by term including its quirks
(step() in the NDF, division by 4*dot(V, N) without clamping).

All randomness comes in as explicit uniform arrays, so the same code runs
under jit/pallas and in tests with controlled streams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops.geometry import RAY_EPS, intersect_triangle
from raytracer_odin_tpu.utils.math3d import (
    dot,
    normalize,
    quat_conj,
    quat_from_z_to,
    quat_rotate,
    sq,
)

PI = jnp.pi
TAU = 2.0 * jnp.pi


# ---------------------------------------------------------------------------
# Primitive samplers.
# ---------------------------------------------------------------------------

def sphere_uniform(u1, u2):
    """Uniform direction on the unit sphere (shading.odin:9-15):
    phi = tau*u1, z = 2*u2 - 1, (x, y) = (sin, cos)(phi) * sqrt(1 - z^2)."""
    phi = TAU * u1
    z = 2.0 * u2 - 1.0
    r = jnp.sqrt(jnp.maximum(1.0 - sq(z), 0.0))
    return jnp.stack([jnp.sin(phi) * r, jnp.cos(phi) * r, z], axis=-1)


def cosine_weighted(n, u1, u2):
    """normalize(sphere_uniform() + n) (shading.odin:32-35)."""
    return normalize(sphere_uniform(u1, u2) + n, eps=1e-20)


def cosine_weighted_pdf(n, omega):
    """max(dot(n, omega)/pi, 0) (shading.odin:37-39)."""
    return jnp.maximum(dot(n, omega) / PI, 0.0)


def _small_table_lookup(table, idx, max_rows: int = 32):
    """Row lookup that avoids TPU gathers for small tables: a [lanes]-sized
    gather costs a flat ~4 ms at 2M lanes regardless of table size, while a
    one-hot contraction is pure MXU/VPU work."""
    n = table.shape[0]
    if n > max_rows:
        return table[idx]
    onehot = (
        idx[..., None] == jnp.arange(n, dtype=idx.dtype)
    ).astype(table.dtype)
    # HIGHEST precision is load-bearing: TPU matmuls default to bf16
    # multiplies, which quantized the looked-up light geometry — sampled
    # light points then disagreed with the exact-geometry pdf, a
    # sampling/pdf mismatch measured as a +11% energy bias on cornell
    # (light panel 0.01 below the ceiling; bf16 moved the plane ~0.002).
    return jnp.einsum(
        "...l,lk->...k", onehot, table,
        precision=jax.lax.Precision.HIGHEST,
    )


def surface_sample(scene, origin, u_idx, u1, u2):
    """Pick a uniform emissive triangle and a uniform point on it
    (shading.odin:41-50); returns the normalized direction from origin."""
    n_lights = scene.light_p.shape[0]
    idx = jnp.minimum((u_idx * n_lights).astype(jnp.int32), n_lights - 1)
    u = u1
    v = u2
    flip = u + v > 1.0
    u = jnp.where(flip, 1.0 - u, u)
    v = jnp.where(flip, 1.0 - v, v)
    world = (
        _small_table_lookup(scene.light_p, idx)
        + u[..., None] * _small_table_lookup(scene.light_u, idx)
        + v[..., None] * _small_table_lookup(scene.light_v, idx)
    )
    return normalize(world - origin, eps=1e-20)


def light_pdf_sum(scene, o, d, chunk: int = 256):
    """Sum of per-triangle solid-angle pdfs over ALL emissive triangles hit
    along the ray (surface_sampling_pdf_trigs_sum + bvh walk,
    shading.odin:52-100), divided by the light count.

    Matches the reference: origin offset by RAY_EPS, hits counted when
    t >= 0, weight = t^2/|dot(ng, d)|, factor 2/|cross(u, v)|.
    """
    n_lights = scene.light_p.shape[0]
    if n_lights == 0:
        return jnp.zeros(o.shape[:-1], jnp.float32)
    o = o + d * RAY_EPS
    batch_shape = o.shape[:-1]

    chunk = min(chunk, n_lights)
    n_chunks = (n_lights + chunk - 1) // chunk
    pad = n_chunks * chunk - n_lights

    lp = jnp.pad(scene.light_p, ((0, pad), (0, 0)))
    lu = jnp.pad(scene.light_u, ((0, pad), (0, 0)))
    lv = jnp.pad(scene.light_v, ((0, pad), (0, 0)))
    lng = jnp.pad(scene.light_ng, ((0, pad), (0, 0)))
    lfac = jnp.pad(scene.light_pdf_factor, (0, pad))
    lmask = jnp.pad(jnp.ones(n_lights, bool), (0, pad))

    def body(acc, ck):
        p, u, v, ng, fac, mask = ck
        t, _, _, ok = intersect_triangle(o[..., None, :], d[..., None, :], p, u, v)
        ok = ok & mask & (t >= 0)
        w = sq(t) / jnp.abs(dot(jnp.broadcast_to(ng, t.shape + (3,)), d[..., None, :]))
        contrib = jnp.where(ok, fac * w, 0.0)
        # Guard NaN (degenerate parallel hits); +inf is kept — it kills the
        # path via the value/pdf cutoff exactly like the reference would.
        contrib = jnp.where(jnp.isnan(contrib), 0.0, contrib)
        return acc + jnp.sum(contrib, axis=-1), None

    chunks = (
        lp.reshape(n_chunks, chunk, 3),
        lu.reshape(n_chunks, chunk, 3),
        lv.reshape(n_chunks, chunk, 3),
        lng.reshape(n_chunks, chunk, 3),
        lfac.reshape(n_chunks, chunk),
        lmask.reshape(n_chunks, chunk),
    )
    total, _ = jax.lax.scan(body, jnp.zeros(batch_shape, jnp.float32), chunks)
    return total / n_lights


def vndf_sample(n, omega, alpha, u1, u2):
    """Heitz VNDF sampling of the GGX half-vector (shading.odin:102-122).
    `omega` is the view direction (-in_ray.d), alpha = roughness^2."""
    rot = quat_from_z_to(n)
    V = quat_rotate(quat_conj(rot), omega)
    Vh = normalize(
        jnp.stack([alpha * V[..., 0], alpha * V[..., 1], V[..., 2]], axis=-1),
        eps=1e-20,
    )
    lensq = jnp.hypot(Vh[..., 0], Vh[..., 1])
    safe_len = jnp.where(lensq == 0, 1.0, lensq)
    T1 = jnp.where(
        (lensq == 0)[..., None],
        jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], n.dtype), Vh.shape),
        jnp.stack(
            [-Vh[..., 1] / safe_len, Vh[..., 0] / safe_len, jnp.zeros_like(safe_len)],
            axis=-1,
        ),
    )
    T2 = jnp.cross(Vh, T1)
    r = jnp.sqrt(u1)
    phi = TAU * u2
    t1 = r * jnp.sin(phi)
    t2 = r * jnp.cos(phi)
    s = 0.5 * (1.0 + Vh[..., 2])
    t2 = (1.0 - s) * jnp.sqrt(jnp.maximum(1.0 - sq(t1), 0.0)) + s * t2
    Nh = (
        t1[..., None] * T1
        + t2[..., None] * T2
        + jnp.sqrt(jnp.maximum(0.0, 1.0 - sq(t1) - sq(t2)))[..., None] * Vh
    )
    Ne = normalize(
        jnp.stack(
            [
                alpha * Nh[..., 0],
                alpha * Nh[..., 1],
                jnp.maximum(0.0, Nh[..., 2]),
            ],
            axis=-1,
        ),
        eps=1e-20,
    )
    return quat_rotate(rot, Ne)


def vndf_pdf(n, omega, alpha, L):
    """VNDF pdf of reflecting `omega` to L (shading.odin:124-137)."""
    Ne = normalize(omega + L, eps=1e-20)
    rot = quat_from_z_to(n)
    V = quat_rotate(quat_conj(rot), omega)
    N = quat_rotate(quat_conj(rot), Ne)
    alpha2 = sq(alpha)
    lam = (
        -1.0
        + jnp.sqrt(1.0 + alpha2 * (sq(V[..., 0]) + sq(V[..., 1])) / sq(V[..., 2]))
    ) * 0.5
    G1 = 1.0 / (1.0 + lam)
    D = 1.0 / (
        PI
        * alpha2
        * sq(sq(N[..., 0] / alpha) + sq(N[..., 1] / alpha) + sq(N[..., 2]))
    )
    normal = G1 * jnp.maximum(0.0, dot(V, N)) * D / V[..., 2]
    return normal / (4.0 * dot(L, Ne))


# ---------------------------------------------------------------------------
# Mixture sample / pdf / shade over Point_Material fields.
# ---------------------------------------------------------------------------

def sample_direction(scene, mat_pos, mat_normal, mat_roughness, in_d, uniforms,
                     has_lights: bool):
    """One bounce direction from the 1/3-1/3-1/3 mixture (shading.odin:139-151).

    uniforms: [..., 6] — (strategy t, a, b, light index, a2, b2). All three
    candidate directions are computed branchlessly and selected by t.
    """
    t = uniforms[..., 0]
    d_cos = cosine_weighted(mat_normal, uniforms[..., 1], uniforms[..., 2])
    if has_lights:
        d_light = surface_sample(
            scene, mat_pos, uniforms[..., 3], uniforms[..., 4], uniforms[..., 5]
        )
    else:
        d_light = d_cos
    nh = vndf_sample(mat_normal, -in_d, sq(mat_roughness), uniforms[..., 4], uniforms[..., 5])
    d_vndf = in_d - 2.0 * dot(nh, in_d)[..., None] * nh

    use_cos = t <= 0.33333
    use_light = (~use_cos) & (t < 0.666666) & has_lights
    out = jnp.where(
        use_cos[..., None], d_cos, jnp.where(use_light[..., None], d_light, d_vndf)
    )
    return out


def mixture_pdf(scene, mat_pos, mat_normal, mat_roughness, in_d, out_d,
                has_lights: bool, light_chunk: int = 256):
    """(cos_pdf + light_pdf + vndf_pdf * (1|2)) / 3 (shading.odin:153-162)."""
    p_cos = cosine_weighted_pdf(mat_normal, out_d)
    p_vndf = vndf_pdf(mat_normal, -in_d, sq(mat_roughness), out_d)
    if has_lights:
        import jax as _jax

        from raytracer_odin_tpu.ops import light_cull

        n_lights = int(scene.light_p.shape[0])
        if (
            n_lights >= light_cull.threshold()
            and _jax.default_backend() != "cpu"
        ):
            # Many-light scenes: cluster-culled Pallas pdf sum, cost
            # sublinear in L (ops/light_cull.py) — the TPU analogue of
            # the reference's light BVH (shading.odin:62-94).
            p_light = light_cull.light_pdf_sum_culled(scene, mat_pos, out_d)
        else:
            p_light = light_pdf_sum(scene, mat_pos, out_d, chunk=light_chunk)
        return (p_cos + p_light + p_vndf) / 3.0
    return (p_cos + p_vndf * 2.0) / 3.0


def shade(mat_color, mat_normal, mat_metallic, mat_roughness, in_d, out_d):
    """Cook-Torrance GGX + Lambert, returns BRDF x cos(theta)
    (shade, shading.odin:164-204). Every term mirrors the reference,
    including step() gating the NDF and the unclamped 4*dot(V, N) divisor."""
    alpha = sq(mat_roughness)
    alpha2 = sq(alpha)

    L = out_d
    V = -in_d
    H = normalize(L + V, eps=1e-20)
    N = mat_normal

    cosine = dot(L, N)

    f0, f90 = 0.04, 1.0
    fb = 1.0 - dot(H, L)
    fresnel_base = fb * fb * fb * fb * fb  # pow(x, 5) safe for negative x
    fresnel_diff_spec = f0 + (f90 - f0) * fresnel_base
    fresnel_metallic = mat_color + (f90 - mat_color) * fresnel_base[..., None]

    hn = dot(H, N)
    distribution = (
        alpha2
        * (hn >= 0).astype(alpha2.dtype)  # math.step(0, dot(H, N))
        / (PI * sq((alpha2 - 1.0) * sq(hn) + 1.0))
    )

    def smith_g(x):
        c = dot(N, x)
        return 2.0 * jnp.maximum(c, 0.0) / (
            c + jnp.sqrt(alpha2 + (1.0 - alpha2) * sq(c))
        )

    geometry = smith_g(L) * smith_g(V)
    cook_torrance = distribution * geometry / (4.0 * dot(V, N))
    specular = cook_torrance[..., None]

    diffuse = mat_color * jnp.maximum(cosine, 0.0)[..., None] / PI

    metallic_term = specular * fresnel_metallic
    dielectric = diffuse + (specular - diffuse) * fresnel_diff_spec[..., None]

    return dielectric + (metallic_term - dielectric) * mat_metallic[..., None]
