"""Sampling-strategy and BRDF tests: pdf normalization by Monte Carlo,
sample/pdf consistency, BRDF properties, light-pdf parity with the oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_odin_tpu.ops import shading
from raytracer_odin_tpu.utils.math3d import dot, normalize


def mc_directions(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_sphere_uniform_is_uniform():
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (20000, 2))
    d = np.asarray(shading.sphere_uniform(u[:, 0], u[:, 1]))
    assert np.allclose(np.linalg.norm(d, axis=-1), 1, atol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.02
    # z uniform in [-1, 1]
    assert abs(np.mean(d[:, 2] > 0.5) - 0.25) < 0.02


def test_cosine_pdf_integrates_to_one():
    """MC over uniform sphere directions: E[pdf] * 4pi == 1."""
    n = np.array([0.0, 0.0, 1.0], np.float32)
    d = mc_directions(200000, 1)
    pdf = np.asarray(
        shading.cosine_weighted_pdf(jnp.asarray(n), jnp.asarray(d))
    )
    integral = pdf.mean() * 4 * np.pi
    assert abs(integral - 1.0) < 0.02


def test_cosine_sample_matches_pdf():
    """Histogram of cos(theta) of samples vs analytic CDF."""
    key = jax.random.PRNGKey(2)
    u = jax.random.uniform(key, (100000, 2))
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    d = np.asarray(shading.cosine_weighted(n, u[:, 0], u[:, 1]))
    ct = d[:, 2]
    assert (ct >= -1e-6).all()
    # P(cos > x) = 1 - x^2 under cosine weighting
    for x in (0.3, 0.6, 0.9):
        assert abs(np.mean(ct > x) - (1 - x * x)) < 0.01


def test_vndf_pdf_integrates_to_one():
    """For fixed view dir, the reflected-direction pdf integrates to 1
    over the sphere (VNDF is normalized over visible normals)."""
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    wo = normalize(jnp.asarray([0.3, -0.2, 0.9], jnp.float32))
    for alpha in (0.1, 0.35, 0.8):
        d = mc_directions(400000, 3)
        pdf = np.asarray(
            shading.vndf_pdf(n, wo, jnp.float32(alpha), jnp.asarray(d))
        )
        pdf = np.where(np.isfinite(pdf), pdf, 0)
        pdf = np.maximum(pdf, 0)
        integral = pdf.mean() * 4 * np.pi
        assert abs(integral - 1.0) < 0.05, (alpha, integral)


def test_vndf_sample_consistent_with_pdf():
    """Chi2-style check: fraction of reflected samples in a cone vs pdf
    integral over that cone."""
    key = jax.random.PRNGKey(4)
    N = 200000
    n = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    wo = normalize(jnp.asarray([0.4, 0.1, 0.9], jnp.float32))
    alpha = jnp.float32(0.3)
    u = jax.random.uniform(key, (N, 2))
    nh = np.asarray(shading.vndf_sample(n, wo, alpha, u[:, 0], u[:, 1]))
    in_d = -np.asarray(wo)
    refl = in_d[None] - 2 * (nh * in_d).sum(-1, keepdims=True) * nh
    refl /= np.linalg.norm(refl, axis=-1, keepdims=True)
    # estimate pdf by histogram against analytic pdf in several cones
    axis = np.asarray(normalize(jnp.asarray([0.4, 0.1, 0.9])))
    for cos_cone in (0.9, 0.95):
        frac = np.mean((refl @ axis) > cos_cone)
        d = mc_directions(400000, 5)
        mask = d @ axis > cos_cone
        pdf = np.asarray(shading.vndf_pdf(n, wo, alpha, jnp.asarray(d)))
        pdf = np.where(np.isfinite(pdf) & (pdf > 0), pdf, 0)
        integral = (pdf * mask).mean() * 4 * np.pi
        assert abs(frac - integral) < 0.03, (cos_cone, frac, integral)


def test_shade_nonnegative_above_surface():
    rng = np.random.default_rng(6)
    N = 1000
    n = np.repeat([[0.0, 0.0, 1.0]], N, 0).astype(np.float32)
    out_d = mc_directions(N, 7)
    out_d[:, 2] = np.abs(out_d[:, 2])
    in_d = mc_directions(N, 8)
    in_d[:, 2] = -np.abs(in_d[:, 2])
    val = np.asarray(
        shading.shade(
            jnp.full((N, 3), 0.7),
            jnp.asarray(n),
            jnp.zeros(N),
            jnp.full(N, 0.5),
            jnp.asarray(in_d),
            jnp.asarray(out_d),
        )
    )
    assert np.isfinite(val).all()
    assert (val > -1e-5).all()


def test_lambert_limit():
    """metallic=0, roughness=1: dominated by diffuse; check diffuse term
    value at normal incidence ~ color/pi * cos + small specular."""
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    in_d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    out_d = normalize(jnp.asarray([[0.3, 0.0, 0.95]], jnp.float32))
    val = np.asarray(
        shading.shade(
            jnp.asarray([[0.8, 0.8, 0.8]]),
            n,
            jnp.zeros(1),
            jnp.ones(1),
            in_d,
            out_d,
        )
    )[0]
    cos = float(out_d[0, 2])
    diffuse = 0.8 * cos / np.pi
    assert np.all(np.abs(val - diffuse) < 0.05 * diffuse + 0.02)


def test_light_pdf_matches_oracle(cube_scene):
    from raytracer_odin_tpu.oracle import cpu_reference as oracle

    host, scene = cube_scene
    sc = oracle.OracleScene(scene)
    rng = np.random.default_rng(9)
    o = rng.uniform(-2, 2, (128, 3)).astype(np.float32)
    d = mc_directions(128, 10)
    ours = np.asarray(
        shading.light_pdf_sum(scene, jnp.asarray(o), jnp.asarray(d))
    )
    want = oracle.light_pdf(sc, o, d)
    both_finite = np.isfinite(ours) & np.isfinite(want)
    assert np.allclose(ours[both_finite], want[both_finite], rtol=2e-3, atol=1e-5)
    assert np.array_equal(np.isfinite(ours), np.isfinite(want))


def test_mixture_sample_distribution(cube_scene):
    """Strategy selection proportions: ~1/3 cosine, ~1/3 light, ~1/3 vndf."""
    host, scene = cube_scene
    key = jax.random.PRNGKey(11)
    N = 30000
    uni = jax.random.uniform(key, (N, 6))
    pos = jnp.zeros((N, 3))
    nrm = jnp.repeat(jnp.asarray([[0.0, 1.0, 0.0]]), N, axis=0)
    in_d = jnp.repeat(normalize(jnp.asarray([[0.5, -0.8, 0.0]])), N, axis=0)
    d = np.asarray(
        shading.sample_direction(scene, pos, nrm, jnp.full(N, 0.2), in_d, uni, True)
    )
    assert np.allclose(np.linalg.norm(d, axis=-1), 1, atol=1e-4)
    # light quad is above (y=3): light-sampled dirs have y>0 from origin
    t = np.asarray(uni[:, 0])
    light_sel = (t > 0.33333) & (t < 0.666666)
    assert (d[light_sel][:, 1] > 0).mean() > 0.99
