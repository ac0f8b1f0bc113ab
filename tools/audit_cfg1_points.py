"""Point-wise bounce-integral audit over several cfg1 shading points —
extends tools/audit_cfg1_bias.py (which cleared the unoccluded floor /
roughness-1.0 point) to partial-shadow floor points and the roughness-0.6
cube faces, with analytic f64 cube occlusion in the ground-truth L.

For each point: f64 quadrature of integral(shade * L) vs each side's
own-sampler Monte-Carlo estimate (N=4M) with the reference kill rule.
Run: JAX_PLATFORMS=cpu python tools/audit_cfg1_points.py
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
import jax
import jax.numpy as jnp
from rmse_common import load_scene

from raytracer_odin_tpu.ops import shading
from raytracer_odin_tpu.oracle import cpu_reference as orc
from raytracer_odin_tpu.utils import prng

host, scene = load_scene("cube")
osc = orc.OracleScene(scene)
CAM = np.array([2.5, 1.8, 2.5])
LY, LE = 3.0, 12.0


def ray_box(o, d, lo, hi):
    """Slab test in f64: t of entry if the ray hits the box, else inf."""
    inv = np.where(np.abs(d) > 1e-30, 1.0 / d, 1e30)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tn = np.minimum(t0, t1).max(-1)
    tf = np.maximum(t0, t1).min(-1)
    return np.where((tf >= np.maximum(tn, 0)) & (tn < 1e30), tn, np.inf)


BOX_LO = np.array([-0.5, 0.0, -0.5])
BOX_HI = np.array([0.5, 1.0, 0.5])


def L_direct(P, wi):
    """Radiance from direction wi at point P: LE iff the light quad is hit
    and the cube does not occlude first (f64 exact)."""
    up = wi[..., 1] > 1e-9
    t = np.where(up, (LY - P[1]) / np.where(up, wi[..., 1], 1.0), np.inf)
    x = P[0] + t * wi[..., 0]
    z = P[2] + t * wi[..., 2]
    hit = up & (np.abs(x) <= 1.0) & (np.abs(z) <= 1.0)
    # offset off the surface so a P on the cube does not self-occlude
    # (the render's RAY_EPS plays this role)
    tb = ray_box(P[None] + 1e-4 * wi, wi, BOX_LO, BOX_HI)
    return np.where(hit & (tb > t - 1e-9), LE, 0.0)


POINTS = [
    # name, P, N, color, roughness, metallic
    ("cube top (r=0.6)", (0.2, 1.0, 0.2), (0, 1, 0), (0.8, 0.2, 0.2), 0.6, 0.0),
    ("cube +x face (r=0.6)", (0.5, 0.6, 0.1), (1, 0, 0), (0.8, 0.2, 0.2), 0.6, 0.0),
    ("cube +z face grazing", (0.3, 0.15, 0.5), (0, 0, 1), (0.8, 0.2, 0.2), 0.6, 0.0),
]

NS = 4_000_000
ntheta, nphi = 512, 1024


def audit(name, P, N, COLOR, ROUGH, METAL):
    P = np.asarray(P, np.float64)
    N = np.asarray(N, np.float64)
    COLOR = np.asarray(COLOR, np.float64)
    IN_D = P - CAM
    IN_D = IN_D / np.linalg.norm(IN_D)

    # hemisphere grid around N (use full sphere minus masking for
    # simplicity: shade() is zero below the horizon via max(cos, 0), but
    # specular can leak below-horizon? reference shade gates diffuse by
    # max(cosine,0) and G by max; below-horizon L gives G(L)=0 -> 0.)
    th = (np.arange(ntheta) + 0.5) / ntheta * np.pi
    ph = (np.arange(nphi) + 0.5) / nphi * (2 * np.pi)
    T, PH = np.meshgrid(th, ph, indexing="ij")
    wi = np.stack(
        [np.sin(T) * np.cos(PH), np.cos(T), np.sin(T) * np.sin(PH)], -1
    ).reshape(-1, 3)
    w = np.sin(T).reshape(-1) * (np.pi / ntheta) * (2 * np.pi / nphi)

    def impl_shade(out_d):
        out = shading.shade(
            jnp.asarray(np.broadcast_to(COLOR, out_d.shape), jnp.float32),
            jnp.asarray(np.broadcast_to(N, out_d.shape), jnp.float32),
            jnp.asarray(np.full(out_d.shape[:-1], METAL), jnp.float32),
            jnp.asarray(np.full(out_d.shape[:-1], ROUGH), jnp.float32),
            jnp.asarray(np.broadcast_to(IN_D, out_d.shape), jnp.float32),
            jnp.asarray(out_d, jnp.float32),
        )
        return np.asarray(out).astype(np.float64)

    Lw = L_direct(P, wi)
    gt = (impl_shade(wi) * (Lw * w)[:, None]).sum(0)

    # ---- impl own-sampler estimate ----
    key = jax.random.PRNGKey(7)
    sids = jnp.arange(NS, dtype=jnp.int32)
    u = prng.uniforms(key, jnp.int32(0), jnp.int32(0), sids, 6)
    pos = jnp.asarray(np.broadcast_to(P, (NS, 3)), jnp.float32)
    nrm = jnp.asarray(np.broadcast_to(N, (NS, 3)), jnp.float32)
    ind = jnp.asarray(np.broadcast_to(IN_D, (NS, 3)), jnp.float32)
    rough = jnp.asarray(np.full(NS, ROUGH), jnp.float32)

    @jax.jit
    def impl_estimate(u):
        out_d = shading.sample_direction(
            scene, pos, nrm, rough, ind, u, has_lights=True
        )
        pdf = shading.mixture_pdf(scene, pos, nrm, rough, ind, out_d, True)
        val = shading.shade(
            jnp.asarray(COLOR, jnp.float32), nrm,
            jnp.full(NS, METAL, jnp.float32), rough, ind, out_d,
        )
        return out_d, val, pdf

    out_d_i, val_i, pdf_i = impl_estimate(u)
    out_d_i = np.asarray(out_d_i).astype(np.float64)
    pdf64 = np.asarray(pdf_i).astype(np.float64)
    est_i = np.asarray(val_i).astype(np.float64) * (
        L_direct(P, out_d_i) / np.maximum(pdf64, 1e-12)
    )[:, None]
    keep = (np.abs(np.asarray(val_i)).sum(-1) / np.asarray(pdf_i)) > 1e-5
    est_i = np.where(keep[:, None], est_i, 0.0)
    m_i, se_i = est_i.mean(0), est_i.std(0) / np.sqrt(NS)

    # ---- oracle own-sampler estimate ----
    rng = np.random.default_rng(99)
    o_b = np.broadcast_to(P, (NS, 3)).astype(np.float32)
    n_b = np.broadcast_to(N, (NS, 3)).astype(np.float32)
    in_b = np.broadcast_to(IN_D, (NS, 3)).astype(np.float32)
    t = rng.random(NS, np.float32)
    d_cos = orc.cosine_sample(rng, n_b)
    d_light = orc.light_sample(rng, osc, o_b)
    nh = orc.vndf_sample(rng, n_b, -in_b, np.float32(ROUGH**2))
    d_spec = in_b - 2 * orc._dot(nh, in_b)[:, None] * nh
    use_cos = t <= 1 / 3
    use_light = (~use_cos) & (t <= 2 / 3)
    out_d_o = np.where(use_cos[:, None], d_cos,
                       np.where(use_light[:, None], d_light, d_spec))
    out_d_o = orc._normalize(out_d_o).astype(np.float32)
    p_o = (orc.cosine_pdf(n_b, out_d_o) + orc.light_pdf(osc, o_b, out_d_o)
           + orc.vndf_pdf(n_b, -in_b, np.float32(ROUGH**2), out_d_o)) / 3.0
    v_o = orc.shade(np.broadcast_to(COLOR, (NS, 3)).astype(np.float32), n_b,
                    np.full(NS, METAL, np.float32),
                    np.full(NS, ROUGH, np.float32), in_b, out_d_o)
    est_o = v_o.astype(np.float64) * (
        L_direct(P, out_d_o.astype(np.float64))
        / np.maximum(p_o.astype(np.float64), 1e-12)
    )[:, None]
    keep_o = (np.abs(v_o).sum(-1) / p_o) > 1e-5
    est_o = np.where(keep_o[:, None], est_o, 0.0)
    m_o, se_o = est_o.mean(0), est_o.std(0) / np.sqrt(NS)

    r = COLOR / COLOR  # per-channel display normalizer (keep raw)
    print(f"\n== {name} == gt {gt}")
    print(f"  impl  : rel {(m_i - gt) / np.maximum(gt, 1e-12)} "
          f"z {(m_i - gt) / np.maximum(se_i, 1e-15)}")
    print(f"  oracle: rel {(m_o - gt) / np.maximum(gt, 1e-12)} "
          f"z {(m_o - gt) / np.maximum(se_o, 1e-15)}")
    print(f"  impl-oracle rel {(m_i - m_o) / np.maximum(gt, 1e-12)} "
          f"z {(m_i - m_o) / np.sqrt(se_i**2 + se_o**2)}")


for cfg in POINTS:
    audit(*cfg)
