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
sys.path.insert(0, str(Path(__file__).parent.parent))
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


def _first_bounce(scene, fov):
    """Rebuild the render's exact first path vertex for sample 0: camera
    rays -> primary cast -> shade/sample -> bounce rays -> bounce cast.
    Uses the same counter-RNG addressing as runtime.render_scene, so both
    backends consume bitwise-identical uniforms."""
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.ops import integrator, traverse
    from raytracer_odin_tpu.render import runtime
    from raytracer_odin_tpu.utils import prng

    key = jax.random.PRNGKey(0)
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    sids = (rows * W + cols).reshape(-1)
    jitter = prng.uniforms(key, jnp.int32(0), prng.JITTER_TAG,
                           sids.reshape(H, W), 2)
    o, d = runtime.generate_rays(scene.cam_pos, scene.cam_basis, fov, W, H,
                                 jitter)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)

    t0, idx0, _, _ = traverse.cast_rays(scene, o, d)
    opts = integrator.TraceOptions(depth=2)
    has_lights = scene.light_p.shape[0] > 0
    uniforms = prng.uniforms(key, jnp.int32(0), jnp.int32(0), sids, 6)
    alive = jnp.ones(o.shape[0], bool)
    thr = jnp.ones((o.shape[0], 3), jnp.float32)
    rad = jnp.zeros((o.shape[0], 3), jnp.float32)
    o1, d1, _thr, _rad, cont, _ev, _hit, _missed = integrator._shade_vertex(
        scene, o, d, t0, idx0, alive, uniforms, opts, has_lights, thr, rad
    )
    t1, idx1, _, _ = traverse.cast_rays(scene, o1, d1, alive=cont)
    return dict(t0=t0, idx0=idx0, o1=o1, d1=d1, cont=cont, t1=t1, idx1=idx1,
                thr=_thr, rad=_rad)


def stages(tag: str):
    OUT.mkdir(parents=True, exist_ok=True)
    host, scene = load_scene("envmap")
    fov = host.cam.fov_x * (W / H)
    s = _first_bounce(scene, fov)
    for k, v in s.items():
        np.save(OUT / f"st_{k}_{tag}.npy", np.asarray(v))
    print("stages dumped", tag)


def stages_cross(tag: str, other: str):
    """Cast the OTHER backend's bounce rays with THIS backend's intersector:
    flips here are pure intersector-implementation order effects (identical
    input bits), separating them from input-ulp-induced flips."""
    import jax.numpy as jnp

    from raytracer_odin_tpu.ops import traverse

    host, scene = load_scene("envmap")
    o1 = jnp.asarray(np.load(OUT / f"st_o1_{other}.npy"))
    d1 = jnp.asarray(np.load(OUT / f"st_d1_{other}.npy"))
    cont = jnp.asarray(np.load(OUT / f"st_cont_{other}.npy"))
    t1, idx1, _, _ = traverse.cast_rays(scene, o1, d1, alive=cont)
    np.save(OUT / f"st_idx1_cross_{tag}.npy", np.asarray(idx1))
    np.save(OUT / f"st_t1_cross_{tag}.npy", np.asarray(t1))
    print("cross dumped", tag, "on", other, "rays")


def compare_stages():
    L = lambda n: np.load(OUT / f"st_{n}.npy")
    idx0c, idx0t = L("idx0_cpu"), L("idx0_tpu")
    t0c, t0t = L("t0_cpu"), L("t0_tpu")
    flip0 = idx0c != idx0t
    print(f"primary idx flips: {flip0.mean():.3e}  "
          f"(t0 diff on agreeing lanes: "
          f"max {np.abs(t0c - t0t)[~flip0 & (idx0c >= 0)].max():.3e})")

    d1c, d1t = L("d1_cpu"), L("d1_tpu")
    cc, ct = L("cont_cpu"), L("cont_tpu")
    both = cc & ct & ~flip0
    dd = np.abs(d1c - d1t).max(-1)
    print(f"cont flips: {(cc != ct).mean():.3e}; bounce-dir diff on "
          f"agreeing alive lanes: max {dd[both].max():.3e} "
          f"mean {dd[both].mean():.3e} p99 {np.quantile(dd[both], 0.99):.3e}")

    idx1c, idx1t = L("idx1_cpu"), L("idx1_tpu")
    flip1 = (idx1c != idx1t) & both
    hm1 = ((idx1c >= 0) != (idx1t >= 0)) & both
    print(f"bounce idx flips (agreeing-input lanes): "
          f"{flip1[both].mean():.3e}; of which hit<->miss: "
          f"{hm1[both].mean():.3e}")

    # Same input bits, two intersectors: implementation-order flips only.
    try:
        xc = L("idx1_cross_tpu")  # cpu rays through tpu intersector
        fx = (xc != idx1c) & cc
        fxhm = ((xc >= 0) != (idx1c >= 0)) & cc
        print(f"cross (cpu rays, tpu-vs-cpu intersector) idx flips: "
              f"{fx[cc].mean():.3e}; hit<->miss: {fxhm[cc].mean():.3e}")
    except FileNotFoundError:
        print("cross dump missing")

    # Tie bounce-level flips to the d2 pixel diff set.
    rc = np.load(OUT / "render_d2_cpu.npy").astype(np.float64)
    rt = np.load(OUT / "render_d2_tpu.npy").astype(np.float64)
    bad = (np.abs(rc - rt) > 1e-3).any(-1).reshape(-1)
    anyflip = flip0 | flip1 | (cc != ct)
    print(f"d2 pixels>1e-3: {bad.mean():.3e}; sample-0 flip pixels: "
          f"{anyflip.mean():.3e}; P(flip lane is a bad pixel): "
          f"{bad[anyflip].mean():.3f}; P(bad | no flip): "
          f"{bad[~anyflip].mean():.3e}")


def decompose():
    """Attribute the depth-2 contribution diff per lane (sample 0).

    contrib = rad1 + cont * thr1 * env(d1) on bounce-miss lanes (the envmap
    scene has no emissive geometry, so vertex-2 radiance is env-only).
    Decomposes |contrib_cpu - contrib_tpu| into: flip lanes (any of
    idx0/cont/idx1 differs) vs no-flip lanes, and on no-flip lanes into the
    Delta(thr) and Delta(env) terms. env is evaluated on ONE backend (cpu)
    for both direction sets so the env term here is pure direction-ULP
    amplification; the per-backend env arithmetic ULP rides in via rad1."""
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.ops import texture

    host, scene = load_scene("envmap")
    L = lambda n: np.load(OUT / f"st_{n}.npy")
    thr_c, thr_t = L("thr_cpu").astype(np.float64), L("thr_tpu").astype(np.float64)
    rad_c, rad_t = L("rad_cpu").astype(np.float64), L("rad_tpu").astype(np.float64)
    cc, ct = L("cont_cpu"), L("cont_tpu")
    idx0c, idx0t = L("idx0_cpu"), L("idx0_tpu")
    idx1c, idx1t = L("idx1_cpu"), L("idx1_tpu")
    d1c, d1t = L("d1_cpu"), L("d1_tpu")

    f = jax.jit(lambda dd: texture.sample_env(scene, dd, scene.env_tex))
    env_c = np.asarray(f(jnp.asarray(d1c))).astype(np.float64)
    env_t = np.asarray(f(jnp.asarray(d1t))).astype(np.float64)

    miss_c = cc & (idx1c < 0)
    miss_t = ct & (idx1t < 0)
    contrib_c = rad_c + np.where(miss_c[:, None], thr_c * env_c, 0.0)
    contrib_t = rad_t + np.where(miss_t[:, None], thr_t * env_t, 0.0)
    dch = np.abs(contrib_c - contrib_t).max(-1)

    flip = (idx0c != idx0t) | (cc != ct) | (cc & ct & (idx1c != idx1t))
    thr_d = np.abs(thr_c - thr_t).max(-1)
    big = dch > 8e-3  # one bad sample is enough for pixel>1e-3 at 8 spp

    print(f"sample-0 depth-2 contribution: frac|d|>8e-3 {big.mean():.3e} "
          f"(d2 render pixel bad frac was ~8.7e-3/chan)")
    print(f"  flip lanes: {flip.mean():.3e}; share of big set: "
          f"{flip[big].mean():.3f}")
    nb = big & ~flip
    # on no-flip big lanes, which term dominates?
    term_thr = np.abs((thr_c - thr_t) * env_c).max(-1)
    term_env = np.abs(thr_t * (env_c - env_t)).max(-1)
    term_rad = np.abs(rad_c - rad_t).max(-1)
    dom = np.argmax(np.stack([term_rad, term_thr, term_env]), 0)
    for i, nmtag in enumerate(["rad1 (vertex-1 arith)",
                               "thr ulp x env magnitude",
                               "env(d1) direction ulp"]):
        sel = nb & (dom == i)
        print(f"  no-flip big lanes dominated by {nmtag}: "
              f"{sel.sum()} ({sel.mean():.3e})")
    q = lambda x: np.percentile(x, [50, 99, 99.99])
    print(f"  thr diff (all cont lanes): p50/p99/p99.99 "
          f"{q(thr_d[cc & ct])} max {thr_d[cc & ct].max():.3e}")
    rel_thr = thr_d / np.maximum(np.abs(thr_c).max(-1), 1e-12)
    print(f"  thr REL diff: p50/p99/p99.99 {q(rel_thr[cc & ct])} "
          f"max {rel_thr[cc & ct].max():.3e}")


def amplify():
    """Quantify HDR-contrast amplification: evaluate the env map at BOTH
    backends' bounce directions on ONE backend (CPU). Any diff here is
    caused purely by the ULP-level direction differences — if it predicts
    the d2 bad-pixel set, the mechanism is input-ULP x env-contrast
    amplification, not a backend env-sampling bug."""
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.ops import texture

    host, scene = load_scene("envmap")
    d1c = jnp.asarray(np.load(OUT / "st_d1_cpu.npy"))
    d1t = jnp.asarray(np.load(OUT / "st_d1_tpu.npy"))
    cc = np.load(OUT / "st_cont_cpu.npy")
    ct = np.load(OUT / "st_cont_tpu.npy")
    f = jax.jit(lambda dd: texture.sample_env(scene, dd, scene.env_tex))
    ec = np.asarray(f(d1c)).astype(np.float64)
    et = np.asarray(f(d1t)).astype(np.float64)
    both = cc & ct
    d = np.abs(ec - et).max(-1)
    print(f"env(d1_cpu) vs env(d1_tpu), SAME (cpu) sampler, alive lanes: "
          f"max {d[both].max():.3e} mean {d[both].mean():.3e} "
          f"frac>1e-3 {(d[both] > 1e-3).mean():.3e} "
          f"frac>8e-3 (=1e-3 after /8spp) {(d[both] > 8e-3).mean():.3e}")
    # texel floor flips induced by the direction ULPs
    tw = int(np.asarray(scene.tex_width)[int(scene.env_tex)])
    th = int(np.asarray(scene.tex_height)[int(scene.env_tex)])
    for name, dd in (("cpu", d1c), ("tpu", d1t)):
        u = 0.5 + np.arctan2(np.asarray(dd)[..., 2], np.asarray(dd)[..., 0]) / (2 * np.pi)
        v = 0.5 - np.arcsin(np.clip(np.asarray(dd)[..., 1], -1, 1)) / np.pi
        globals()[f"_fl_{name}"] = np.stack(
            [np.floor(u * tw), np.floor(v * th)], -1)
    flips = (globals()["_fl_cpu"] != globals()["_fl_tpu"]).any(-1) & both
    print(f"bounce-dir texel flips (alive): {flips.mean():.3e}; "
          f"env diff on flipped: max {d[flips].max() if flips.any() else 0:.3e} "
          f"mean {d[flips].mean() if flips.any() else 0:.3e}")
    # Does direction-induced env diff predict the d2 bad pixels?
    rc = np.load(OUT / "render_d2_cpu.npy").astype(np.float64)
    rt = np.load(OUT / "render_d2_tpu.npy").astype(np.float64)
    bad = (np.abs(rc - rt) > 1e-3).any(-1).reshape(-1)
    # sample-0 predicted contribution diff (throughput <= 1): env diff / spp
    pred = (d / SPP > 1e-3) & both
    print(f"d2 bad frac {bad.mean():.3e}; sample-0 env-amp predicted frac "
          f"{pred.mean():.3e}; P(bad | predicted) {bad[pred].mean():.3f}; "
          f"P(bad | not predicted) {bad[~pred].mean():.3e}")


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
    elif sys.argv[1] == "stages":
        stages(sys.argv[2])
    elif sys.argv[1] == "cross":
        stages_cross(sys.argv[2], sys.argv[3])
    elif sys.argv[1] == "compare-stages":
        compare_stages()
    elif sys.argv[1] == "amplify":
        amplify()
    elif sys.argv[1] == "decompose":
        decompose()
    else:
        compare()
