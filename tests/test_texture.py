"""Texture atlas sampling vs an independent scalar reference."""

import numpy as np
import jax.numpy as jnp

from raytracer_odin_tpu.models.scene import HostTexture
from raytracer_odin_tpu.ops import texture


class AtlasScene:
    def __init__(self, textures):
        a = texture.build_atlas(textures)
        self.tex_texels = jnp.asarray(a["tex_texels"])
        self.tex_texels_srgb = jnp.asarray(
            texture.srgb_decode_pool(a["tex_texels"])
        )
        self.tex_offset = jnp.asarray(a["tex_offset"])
        self.tex_width = jnp.asarray(a["tex_width"])
        self.tex_height = jnp.asarray(a["tex_height"])
        self.env_tex = 0


def scalar_sample(data, uv, srgb=False):
    """Direct scalar port of texture_sample (textures.odin:106-135)."""
    h, w, c = data.shape
    dims = np.array([w, h])
    pix = np.asarray(uv) * dims
    lo = np.floor(pix)
    hi = np.ceil(pix)
    t = pix - lo
    c00 = (lo.astype(int)) % dims
    c11 = (hi.astype(int)) % dims

    def idx(cx, cy):
        px = np.ones(4, np.float32)
        px[:c] = data[cy, cx]
        if srgb:
            px[:3] = np.power(np.maximum(px[:3], 0), 2.2)
        return px

    p00 = idx(c00[0], c00[1])
    p01 = idx(c00[0], c11[1])
    p10 = idx(c11[0], c00[1])
    p11 = idx(c11[0], c11[1])
    lerp = lambda a, b, s: a + (b - a) * s
    return lerp(lerp(p00, p01, t[1]), lerp(p10, p11, t[1]), t[0])


def test_bilinear_matches_scalar_reference():
    rng = np.random.default_rng(0)
    data = rng.random((7, 5, 3)).astype(np.float32)
    sc = AtlasScene([HostTexture(data, False)])
    uvs = rng.random((50, 2)).astype(np.float32) * 1.4 - 0.2  # incl. wrap
    for srgb in (False, True):
        got = np.asarray(
            texture.sample(sc, jnp.zeros(50, jnp.int32), jnp.asarray(uvs), srgb=srgb)
        )
        want = np.stack([scalar_sample(data, uv, srgb) for uv in uvs])
        assert np.allclose(got, want, atol=2e-5), np.abs(got - want).max()


def test_integral_coordinates_no_interp():
    """floor == ceil at integral pixel coords (the reference's quirk)."""
    data = np.arange(12, dtype=np.float32).reshape(2, 2, 3) / 12
    sc = AtlasScene([HostTexture(data, False)])
    got = np.asarray(
        texture.sample(sc, jnp.zeros(1, jnp.int32), jnp.asarray([[0.5, 0.5]]))
    )
    # pixel coords exactly (1,1) -> texel (1,1), no blending
    assert np.allclose(got[0, :3], data[1, 1], atol=1e-6)


def test_missing_channels_default_one():
    data = np.full((4, 4, 1), 0.25, np.float32)  # grayscale
    sc = AtlasScene([HostTexture(data, False)])
    got = np.asarray(
        texture.sample(sc, jnp.zeros(1, jnp.int32), jnp.asarray([[0.3, 0.7]]))
    )
    assert np.allclose(got[0], [0.25, 1, 1, 1], atol=1e-6)


def test_absent_sampler_returns_default():
    sc = AtlasScene([HostTexture(np.ones((2, 2, 3), np.float32), False)])
    got = np.asarray(
        texture.sample(
            sc,
            jnp.full(3, -1, jnp.int32),
            jnp.zeros((3, 2)),
            default=(0.5, 1.0, 0.5, 0.0),
        )
    )
    assert np.allclose(got, [0.5, 1.0, 0.5, 0.0])


def test_multi_texture_atlas_offsets():
    rng = np.random.default_rng(1)
    t0 = rng.random((3, 4, 3)).astype(np.float32)
    t1 = rng.random((6, 2, 3)).astype(np.float32)
    sc = AtlasScene([HostTexture(t0, False), HostTexture(t1, False)])
    uv = jnp.asarray([[0.1, 0.9], [0.1, 0.9]])
    got = np.asarray(texture.sample(sc, jnp.asarray([0, 1], jnp.int32), uv))
    assert np.allclose(got[0], scalar_sample(t0, [0.1, 0.9]), atol=2e-5)
    assert np.allclose(got[1], scalar_sample(t1, [0.1, 0.9]), atol=2e-5)


def test_env_equirect_orientation():
    """+x maps to u=0.5; +y maps to v=0 (top); -y to v=1 (bottom)."""
    h, w = 8, 16
    data = np.zeros((h, w, 3), np.float32)
    data[0, :, :] = [1, 0, 0]       # top row red
    data[-1, :, :] = [0, 1, 0]      # bottom row green
    data[h // 2, w // 2, :] = [0, 0, 1]
    sc = AtlasScene([HostTexture(data, True)])
    # exactly +/-1 y wraps (v=1 -> row 0, reference %% semantics); probe just
    # off the poles instead
    # floor/ceil bilinear means only integral pixel coords avoid blending:
    # up: py~0.3 (70% top row); down: py=7.0 exactly (pure bottom row)
    up_d = np.asarray([[0.148, 0.989, 0.0]])
    dn_d = np.asarray([[0.3827, -0.9239, 0.0]])
    up = np.asarray(texture.sample_env(sc, jnp.asarray(up_d), 0))
    down = np.asarray(texture.sample_env(sc, jnp.asarray(dn_d), 0))
    assert up[0, 0] > 0.5 and up[0, 1] < 0.5      # red at top
    assert down[0, 1] > 0.5 and down[0, 0] < 0.5  # green at bottom


def test_env_absent_black():
    sc = AtlasScene([HostTexture(np.ones((2, 2, 3), np.float32), False)])
    got = np.asarray(texture.sample_env(sc, jnp.asarray([[0.0, 0.0, 1.0]]), -1))
    assert np.allclose(got, 0.0)
