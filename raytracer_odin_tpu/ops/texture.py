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
    """Pack decoded HostTextures into the flat pool. Returns numpy arrays
    for DeviceScene: texels [P, 4], offset/width/height [K]."""
    texels = []
    offsets, widths, heights = [], [], []
    off = 0
    for t in textures:
        h, w, c = t.data.shape
        rgba = np.ones((h, w, 4), np.float32)
        rgba[..., :c] = t.data[..., :4]
        texels.append(rgba.reshape(-1, 4))
        offsets.append(off)
        widths.append(w)
        heights.append(h)
        off += h * w
    if not texels:
        texels = [np.ones((1, 4), np.float32)]
        offsets, widths, heights = [0], [1], [1]
    return {
        "tex_texels": np.concatenate(texels, axis=0),
        "tex_offset": np.array(offsets, np.int32),
        "tex_width": np.array(widths, np.int32),
        "tex_height": np.array(heights, np.int32),
    }


def sample(scene, tex_id, uv, srgb: bool = False, default=(1.0, 1.0, 1.0, 1.0)):
    """Bilinear sample; tex_id [...], uv [..., 2] -> [..., 4].

    tex_id < 0 yields `default` (a per-call constant, matching the
    reference's per-sampler default argument)."""
    tid = jnp.maximum(tex_id, 0)
    w = scene.tex_width[tid]
    h = scene.tex_height[tid]
    off = scene.tex_offset[tid]

    dims = jnp.stack([w, h], axis=-1).astype(jnp.float32)
    pix = uv * dims
    lo = jnp.floor(pix)
    hi = jnp.ceil(pix)
    t = pix - lo

    dims_i = jnp.stack([w, h], axis=-1)
    c00 = jnp.mod(lo.astype(jnp.int32), dims_i)
    c11 = jnp.mod(hi.astype(jnp.int32), dims_i)

    def fetch(cx, cy):
        idx = off + cy * w + cx
        px = scene.tex_texels[idx]
        if srgb:
            rgb = jnp.power(jnp.maximum(px[..., :3], 0.0), 2.2)
            px = jnp.concatenate([rgb, px[..., 3:]], axis=-1)
        return px

    p00 = fetch(c00[..., 0], c00[..., 1])
    p01 = fetch(c00[..., 0], c11[..., 1])
    p10 = fetch(c11[..., 0], c00[..., 1])
    p11 = fetch(c11[..., 0], c11[..., 1])

    ty = t[..., 1:2]
    tx = t[..., 0:1]
    out = (p00 + (p01 - p00) * ty) * (1 - tx) + (p10 + (p11 - p10) * ty) * tx

    default_arr = jnp.asarray(default, dtype=out.dtype)
    return jnp.where((tex_id >= 0)[..., None], out, default_arr)


def sample_env(scene, d, env_tex_id):
    """Equirectangular environment lookup on ray miss
    (raytracer.odin:437-446): u = 0.5 + atan2(d.z, d.x)/tau,
    v = 0.5 - asin(d.y)/pi; default black when no env map."""
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    uv = jnp.stack([u, v], axis=-1)
    tex_id = jnp.full(d.shape[:-1], env_tex_id, jnp.int32)
    return sample(scene, tex_id, uv, srgb=False, default=(0.0, 0.0, 0.0, 0.0))[..., :3]
