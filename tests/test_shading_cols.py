"""Columnar shade-stage parity: ops/shading_cols.py must agree with
ops/shading.py (the batched/oracle forms) to float-ULP tolerance on every
mirrored function — the compacted TPU wavefront shades through the
columnar forms, so this is what keeps its physics pinned to the batched
path (and transitively to the reference, shading.odin:9-204)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_odin_tpu.ops import shading, shading_cols
from raytracer_odin_tpu.utils import prng, vec3c as v3c

from test_integrator import single_quad_scene


N = 257  # deliberately not a lane multiple


def _cols(a):
    return tuple(a[..., c] for c in range(a.shape[-1]))


@pytest.fixture(scope="module")
def rng_arrays():
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 8)
    unit = lambda k: np.asarray(  # noqa: E731
        jax.random.normal(k, (N, 3), jnp.float32)
        / jnp.linalg.norm(jax.random.normal(k, (N, 3), jnp.float32), axis=-1,
                          keepdims=True)
    )
    return {
        "n": unit(ks[0]),
        "d": unit(ks[1]),
        "out": unit(ks[2]),
        "pos": np.asarray(jax.random.normal(ks[3], (N, 3), jnp.float32)),
        "u": np.asarray(jax.random.uniform(ks[4], (N, 6), jnp.float32)),
        "rough": np.asarray(
            jax.random.uniform(ks[5], (N,), jnp.float32, 0.03, 1.0)
        ),
        "metal": np.asarray(jax.random.uniform(ks[6], (N,), jnp.float32)),
        "color": np.asarray(jax.random.uniform(ks[7], (N, 3), jnp.float32)),
    }


def assert_cols_close(cols, arr, tol=3e-6):
    got = np.stack([np.asarray(c) for c in cols], axis=-1)
    want = np.asarray(arr)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_sphere_cosine_parity(rng_arrays):
    r = rng_arrays
    u1, u2 = r["u"][:, 0], r["u"][:, 1]
    assert_cols_close(
        shading_cols.sphere_uniform(u1, u2), shading.sphere_uniform(u1, u2)
    )
    assert_cols_close(
        shading_cols.cosine_weighted(_cols(r["n"]), u1, u2),
        shading.cosine_weighted(r["n"], u1, u2),
    )
    np.testing.assert_allclose(
        np.asarray(shading_cols.cosine_weighted_pdf(_cols(r["n"]), _cols(r["out"]))),
        np.asarray(shading.cosine_weighted_pdf(r["n"], r["out"])),
        rtol=3e-6, atol=3e-6,
    )


def test_vndf_parity(rng_arrays):
    r = rng_arrays
    alpha = r["rough"] ** 2
    got = shading_cols.vndf_sample(
        _cols(r["n"]), _cols(-r["d"]), alpha, r["u"][:, 4], r["u"][:, 5]
    )
    want = shading.vndf_sample(r["n"], -r["d"], alpha, r["u"][:, 4], r["u"][:, 5])
    # The VNDF frame construction amplifies reduction-order ULPs on
    # near-degenerate half-vectors (~0.4% of lanes at ~2e-4); the sampled
    # direction and its pdf stay mutually consistent (both columnar), so
    # the estimator is unchanged.
    assert_cols_close(got, want, tol=5e-4)
    np.testing.assert_allclose(
        np.asarray(shading_cols.vndf_pdf(
            _cols(r["n"]), _cols(-r["d"]), alpha, _cols(r["out"])
        )),
        np.asarray(shading.vndf_pdf(r["n"], -r["d"], alpha, r["out"])),
        rtol=2e-5, atol=2e-5,
    )


def test_shade_parity(rng_arrays):
    r = rng_arrays
    got = shading_cols.shade(
        _cols(r["color"]), _cols(r["n"]), r["metal"], r["rough"],
        _cols(r["d"]), _cols(r["out"]),
    )
    want = shading.shade(
        r["color"], r["n"], r["metal"], r["rough"], r["d"], r["out"]
    )
    assert_cols_close(got, want, tol=1e-5)


def test_mixture_and_lights_parity(rng_arrays):
    """surface_sample / light_pdf_sum / sample_direction / mixture_pdf on a
    real scene with emissive geometry (exercises the unrolled light sweep
    and the one-hot light lookup)."""
    r = rng_arrays
    scene = single_quad_scene(
        color=(0.5, 0.5, 0.5), emission=(2.0, 1.0, 0.5), metallic=0.0
    )
    assert scene.light_p.shape[0] >= 1

    got = shading_cols.surface_sample(
        scene, _cols(r["pos"]), r["u"][:, 3], r["u"][:, 4], r["u"][:, 5]
    )
    want = shading.surface_sample(
        scene, r["pos"], r["u"][:, 3], r["u"][:, 4], r["u"][:, 5]
    )
    assert_cols_close(got, want)

    np.testing.assert_allclose(
        np.asarray(shading_cols.light_pdf_sum(
            scene, _cols(r["pos"]), _cols(r["out"])
        )),
        np.asarray(shading.light_pdf_sum(scene, r["pos"], r["out"])),
        rtol=2e-5, atol=2e-5,
    )

    u_cols = tuple(r["u"][:, i] for i in range(6))
    got_d = shading_cols.sample_direction(
        scene, _cols(r["pos"]), _cols(r["n"]), r["rough"], _cols(r["d"]),
        u_cols, True,
    )
    want_d = shading.sample_direction(
        scene, r["pos"], r["n"], r["rough"], r["d"], r["u"], True
    )
    assert_cols_close(got_d, want_d)

    np.testing.assert_allclose(
        np.asarray(shading_cols.mixture_pdf(
            scene, _cols(r["pos"]), _cols(r["n"]), r["rough"],
            _cols(r["d"]), got_d, True,
        )),
        np.asarray(shading.mixture_pdf(
            scene, r["pos"], r["n"], r["rough"], r["d"], want_d, True
        )),
        rtol=2e-5, atol=2e-5,
    )


def test_uniforms_cols_bitwise():
    """prng.uniforms_cols is the stack-free form of prng.uniforms: same
    draws bit for bit (same counters, same hash)."""
    key = jax.random.PRNGKey(3)
    sids = jnp.arange(100, dtype=jnp.int32)
    want = np.asarray(prng.uniforms(key, 5, 2, sids, 6))
    got = np.stack(
        [np.asarray(c) for c in prng.uniforms_cols(key, 5, 2, sids, 6)],
        axis=-1,
    )
    np.testing.assert_array_equal(got, want)


def test_vec3c_roundtrip():
    a = np.arange(12, dtype=np.float32).reshape(4, 3)
    np.testing.assert_array_equal(np.asarray(v3c.stack(v3c.splat(a))), a)
