"""Device texture atlas + bilinear sampling.

Replaces `texture_sample` / `texture_index` (textures.odin:79-135) with a
flat-atlas gather kernel. All textures live in one [P, 4] float32 texel pool
(LDR values already /255 at load, missing channels defaulted to 1 like
textures.odin:85); per-texture records give (offset, width, height).

Sampling semantics reproduced exactly:
  * pixel_coords = uv * dims; c00 = floor, c11 = **ceil** (not floor+1;
    integral coordinates interpolate between equal texels),
    wrapped with floor-mod (textures.odin:114-123)
  * sRGB decode pow(2.2) applied per-texel *before* the bilinear lerp
    (textures.odin:99-101, 125-134)
  * absent sampler (tex id < 0) returns the caller's default
    (textures.odin:110-112)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def build_atlas(textures) -> dict:
    """Pack decoded HostTextures into the flat pool.

    Rows are *quad-packed*: each texel row holds its full bilinear
    footprint [p00, p10, p01, p11] (neighbors wrapped at build time), so a
    bilinear sample costs ONE row-gather instead of four — on TPU every
    2M-lane gather has a flat ~4 ms cost regardless of row width. The
    reference's floor/ceil semantics are preserved: at integral pixel
    coords the lerp weight is 0, so the (wrapped) +1 neighbors carry no
    weight, exactly like floor==ceil did.

    Returns numpy arrays for DeviceScene: texels [P, 16],
    offset/width/height [K].
    """
    texels = []
    offsets, widths, heights = [], [], []
    off = 0
    for t in textures:
        h, w, c = t.data.shape
        rgba = np.ones((h, w, 4), np.float32)
        rgba[..., :c] = t.data[..., :4]
        xp = np.roll(rgba, -1, axis=1)   # (x+1) % w
        yp = np.roll(rgba, -1, axis=0)   # (y+1) % h
        xyp = np.roll(xp, -1, axis=0)
        quad = np.concatenate([rgba, xp, yp, xyp], axis=-1)  # [h, w, 16]
        texels.append(quad.reshape(-1, 16))
        offsets.append(off)
        widths.append(w)
        heights.append(h)
        off += h * w
    if not texels:
        texels = [np.ones((1, 16), np.float32)]
        offsets, widths, heights = [0], [1], [1]
    return {
        "tex_texels": np.concatenate(texels, axis=0),
        "tex_offset": np.array(offsets, np.int32),
        "tex_width": np.array(widths, np.int32),
        "tex_height": np.array(heights, np.int32),
    }


_SRGB_COLS = [c for q in range(4) for c in (4 * q, 4 * q + 1, 4 * q + 2)]


def srgb_decode_pool(texels: np.ndarray) -> np.ndarray:
    """Host-side pow(2.2) decode of a quad-packed pool's rgb columns
    (alpha columns pass through). Pre-decoding preserves the reference's
    semantics exactly — it decodes per texel *before* the bilinear lerp
    (textures.odin:99-101, 125-134), so decoding at build time and lerping
    decoded texels is the same computation, hoisted out of the per-sample
    hot path (the in-loop version cost 12 pow() transcendentals per sRGB
    tap per lane per bounce)."""
    out = np.array(texels, np.float32, copy=True)
    cols = out[:, _SRGB_COLS]
    out[:, _SRGB_COLS] = np.power(np.maximum(cols, 0.0), np.float32(2.2))
    return out


def sample(scene, tex_id, uv, srgb: bool = False, default=(1.0, 1.0, 1.0, 1.0)):
    """Bilinear sample; tex_id [...], uv [..., 2] -> [..., 4].

    tex_id < 0 yields `default` (a per-call constant, matching the
    reference's per-sampler default argument). srgb=True reads the
    pre-decoded pool (srgb_decode_pool; scene.tex_texels_srgb)."""
    tid = jnp.maximum(tex_id, 0)
    w = scene.tex_width[tid]
    h = scene.tex_height[tid]
    off = scene.tex_offset[tid]

    dims = jnp.stack([w, h], axis=-1).astype(jnp.float32)
    pix = uv * dims
    lo = jnp.floor(pix)
    t = pix - lo

    dims_i = jnp.stack([w, h], axis=-1)
    c00 = jnp.mod(lo.astype(jnp.int32), dims_i)

    # One quad-row gather delivers the whole bilinear footprint.
    pool = scene.tex_texels_srgb if srgb else scene.tex_texels
    quad = pool[off + c00[..., 1] * w + c00[..., 0]]  # [..., 16]
    p00 = quad[..., 0:4]
    p10 = quad[..., 4:8]
    p01 = quad[..., 8:12]
    p11 = quad[..., 12:16]

    ty = t[..., 1:2]
    tx = t[..., 0:1]
    out = (p00 + (p01 - p00) * ty) * (1 - tx) + (p10 + (p11 - p10) * ty) * tx

    default_arr = jnp.asarray(default, dtype=out.dtype)
    return jnp.where((tex_id >= 0)[..., None], out, default_arr)


def sample_env_cols(scene, d, env_tex_id):
    """Columnar `sample_env`: d is a (dx, dy, dz) column tuple, returns
    (r, g, b) columns. The equirect mapping runs on pure columns; only the
    2-wide uv stack and the quad-row gather keep array form."""
    u = 0.5 + jnp.arctan2(d[2], d[0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(d[1], -1.0, 1.0)) / jnp.pi
    uv = jnp.stack([u, v], axis=-1)
    tex_id = jnp.full(d[0].shape, env_tex_id, jnp.int32)
    out = sample(scene, tex_id, uv, srgb=False, default=(0.0, 0.0, 0.0, 0.0))
    return (out[..., 0], out[..., 1], out[..., 2])


def sample_env(scene, d, env_tex_id):
    """Equirectangular environment lookup on ray miss
    (raytracer.odin:437-446): u = 0.5 + atan2(d.z, d.x)/tau,
    v = 0.5 - asin(d.y)/pi; default black when no env map."""
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    uv = jnp.stack([u, v], axis=-1)
    tex_id = jnp.full(d.shape[:-1], env_tex_id, jnp.int32)
    return sample(scene, tex_id, uv, srgb=False, default=(0.0, 0.0, 0.0, 0.0))[..., :3]
