"""Bisect cfg4's same-seed CPU-vs-TPU decorrelation (VERDICT r3 item 3).

Dumps, for the current jax backend, per-stage arrays of the env-map path:
  A. sample-0 camera ray directions (generate_rays output)
  B. env radiance of a FIXED direction grid (host-constant directions, so
     any diff is purely texture.sample_env: equirect atan2/asin + the HDR
     quad gather + bilinear)
  B2. the equirect (u, v) of that grid before the gather
  C. depth-1 same-seed render (primary env + emission only; no mixture
     sampling influence on radiance)

Run once per backend:
  bash tools/tpu_run.sh tools/bisect_cfg4.py /tmp/b4_tpu.txt dump tpu
  JAX_PLATFORMS=cpu python tools/bisect_cfg4.py dump cpu
then: python tools/bisect_cfg4.py compare
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import load_scene

OUT = Path("out/rmse/bisect4")
W, H, DEPTH, SPP = 1024, 768, 8, 8


def fixed_dir_grid(n=512):
    """Host-constant unit directions covering the sphere (float32, identical
    bits on every backend)."""
    rng = np.random.default_rng(123)
    d = rng.normal(size=(n * n // 64, 3)).astype(np.float32)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def dump(tag: str):
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.ops import texture
    from raytracer_odin_tpu.render import runtime
    from raytracer_odin_tpu.utils import prng

    OUT.mkdir(parents=True, exist_ok=True)
    host, scene = load_scene("envmap")
    fov = host.cam.fov_x * (W / H)

    # A: sample-0 camera rays
    key = jax.random.PRNGKey(0)
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    sids = rows * W + cols
    jitter = prng.uniforms(key, jnp.int32(0), prng.JITTER_TAG, sids, 2)
    o, d = runtime.generate_rays(
        scene.cam_pos, scene.cam_basis, fov, W, H, jitter
    )
    np.save(OUT / f"dirs_{tag}.npy", np.asarray(d))
    np.save(OUT / f"jitter_{tag}.npy", np.asarray(jitter))

    # B/B2: env radiance + uv of the fixed grid
    g = jnp.asarray(fixed_dir_grid())
    env = jax.jit(lambda dd: texture.sample_env(scene, dd, scene.env_tex))(g)
    np.save(OUT / f"env_{tag}.npy", np.asarray(env))
    u = 0.5 + jnp.arctan2(g[..., 2], g[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(g[..., 1], -1.0, 1.0)) / jnp.pi
    np.save(OUT / f"uv_{tag}.npy", np.asarray(jnp.stack([u, v], -1)))

    # C: depth-1 same-seed render
    for depth, name in ((1, "d1"), (2, "d2")):
        cfg = RenderConfig(
            width=W, height=H, ray_depth=depth, samples=SPP,
            samples_per_step=min(SPP, 4), debug_features=False,
        )
        res = runtime.render_scene(scene, cfg, fov)
        n = np.asarray(res.stats.count[0])[..., None]
        np.save(OUT / f"render_{name}_{tag}.npy",
                np.asarray(res.stats.total[0]) / n)
    print("dumped", tag)


def compare():
    def load(pair):
        return (np.load(OUT / f"{pair}_cpu.npy").astype(np.float64),
                np.load(OUT / f"{pair}_tpu.npy").astype(np.float64))

    for name in ("jitter", "dirs", "uv", "env", "render_d1", "render_d2"):
        a, b = load(name)
        d = np.abs(a - b)
        flat = d.reshape(-1, d.shape[-1]) if d.ndim > 1 else d[:, None]
        frac_gt = float((d > 1e-3).mean())
        print(f"{name:10s} max {d.max():.3e}  mean {d.mean():.3e}  "
              f"frac>1e-3 {frac_gt:.2e}  bitwise_equal {bool((a == b).all())}")
    # uv -> texel flip analysis
    uv_c, uv_t = load("uv")
    host, scene = load_scene("envmap")
    tw = int(np.asarray(scene.tex_width)[int(scene.env_tex)])
    th = int(np.asarray(scene.tex_height)[int(scene.env_tex)])
    dims = np.array([tw, th], np.float64)
    fc = np.floor(uv_c * dims)
    ft = np.floor(uv_t * dims)
    flips = (fc != ft).any(-1)
    print(f"env texel floor flips: {flips.mean():.2e} of grid "
          f"(tex {tw}x{th})")
    env_c, env_t = load("env")
    d = np.abs(env_c - env_t).max(-1)
    print(f"env diff on flipped texels: max {d[flips].max() if flips.any() else 0:.3e}; "
          f"on unflipped: max {d[~flips].max():.3e}")


if __name__ == "__main__":
    if sys.argv[1] == "dump":
        dump(sys.argv[2])
    else:
        compare()
