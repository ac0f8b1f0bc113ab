"""Accumulator statistics and output view modes."""

import numpy as np
import jax.numpy as jnp

from raytracer_odin_tpu.render import accum, output


def make_stats():
    s = accum.init_stats(1, 2, 2)
    c1 = jnp.asarray(np.full((2, 2, 3), 0.5, np.float32))
    c2 = jnp.asarray(np.full((2, 2, 3), 1.0, np.float32))
    s = accum.update_layer(s, 0, c1)
    s = accum.update_layer(s, 0, c2)
    return s


def test_stats_fields():
    s = make_stats()
    assert np.allclose(s.count[0], 2)
    assert np.allclose(s.first[0], 0.5)
    assert np.allclose(s.last[0], 1.0)
    assert np.allclose(s.total[0], 1.5)
    assert np.allclose(s.total_sq[0], 0.25 + 1.0)


def test_aces_identity_points():
    x = np.asarray([0.0, 1e6])
    y = output.tone_map_aces(x)
    assert y[0] == 0
    assert abs(y[1] - 1.0) < 1e-3  # saturates to ~1


def test_mean_mode():
    s = make_stats()
    img = output.layer_to_rgb(s, 0, "mean")
    want = round(output.tone_map_aces(np.asarray([0.75]))[0] ** (1 / 2.2) * 255)
    assert np.all(img == want)


def test_variance_mode():
    s = make_stats()
    img = output.layer_to_rgb(s, 0, "variance")
    # var = E[x^2] - E[x]^2 = 0.625 - 0.5625 = 0.0625
    want = round(output.tone_map_aces(np.asarray([0.0625]))[0] ** (1 / 2.2) * 255)
    assert np.all(img == want)


def test_first_last_count_modes():
    s = make_stats()
    f = output.layer_to_rgb(s, 0, "first")
    l = output.layer_to_rgb(s, 0, "last")
    c = output.layer_to_rgb(s, 0, "count")
    assert f[0, 0, 0] < l[0, 0, 0]
    assert c[0, 0, 0] >= c[0, 0, 1] >= c[0, 0, 2]


def test_naninf_mode():
    s = make_stats()
    s = accum.Stats(
        first=s.first,
        last=s.last,
        total=s.total.at[0, 0, 0, 0].set(jnp.nan).at[0, 1, 1, 1].set(jnp.inf),
        total_sq=s.total_sq,
        count=s.count,
    )
    img = output.layer_to_rgb(s, 0, "naninf")
    assert img[0, 0, 0] == 255  # NaN flagged in red
    assert img[1, 1, 1] == 255  # Inf flagged in green
    assert img[0, 1, 0] < 128   # ordinary pixel dim


def test_hash_mode_deterministic():
    s = make_stats()
    a = output.layer_to_rgb(s, 0, "hash")
    b = output.layer_to_rgb(s, 0, "hash")
    assert np.array_equal(a, b)


def test_weight_mode_stub():
    s = make_stats()
    img = output.layer_to_rgb(s, 0, "weight")
    assert np.all(img == 0)
