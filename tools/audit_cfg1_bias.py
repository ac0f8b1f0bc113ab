"""Localize cfg1's +0.2% oracle-vs-impl energy shift (A/A null z_max 2.2,
observed z 4.2 — a real difference, concentrated at mid-brightness).

Three audits at a fixed shading point (floor point of the cube scene,
cfg1 materials), everything in float64 off-device:

  A. pointwise `shade` parity (impl vs oracle) on a direction grid
  B. pointwise mixture-pdf parity (incl. the light-pdf sum over the
     actual cfg1 light quad) on the same grid
  C. per-side estimator consistency: E[shade/pdf * L(wi)] by each side's
     OWN sampler at N=4e6 vs an f64 quadrature ground truth of
     integral(shade * L) — L = direct radiance of the emissive quad
     (the depth-2 bounce integral the render actually estimates).

If A and B agree but C differs on one side, that side's sampler does not
realize its claimed pdf. Run: JAX_PLATFORMS=cpu python tools/audit_cfg1_bias.py
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

# Fixed shading point: on the floor, between cube and camera, normal +y.
P = np.array([1.2, 0.0, 1.2], np.float64)
N = np.array([0.0, 1.0, 0.0], np.float64)
# camera at (2.5, 1.8, 2.5) looking at origin-ish; incident dir at P:
IN_D = P - np.array([2.5, 1.8, 2.5])
IN_D /= np.linalg.norm(IN_D)
ROUGH, METAL = 1.0, 0.0         # floor material (white, rough 1.0)
COLOR = np.array([0.8, 0.8, 0.8])
# light quad: y=3, x,z in [-1, 1], emission 12, normal -y (toward floor)
LY, LE = 3.0, 12.0


def L_direct(wi):
    """Radiance arriving at P from direction wi: LE if the ray hits the
    light quad (before anything else — the quad is the only occluder that
    matters from the floor looking up), else 0."""
    up = wi[..., 1] > 1e-9
    t = np.where(up, (LY - P[1]) / np.where(up, wi[..., 1], 1.0), np.inf)
    x = P[0] + t * wi[..., 0]
    z = P[2] + t * wi[..., 2]
    hit = up & (np.abs(x) <= 1.0) & (np.abs(z) <= 1.0)
    # the cube (|x|,|z| <= 0.5, y <= 1) cannot occlude this path from
    # (1.2, 0, 1.2): any wi with t*wi.y <= 1 hitting the cube has x,z > 0.5.
    return np.where(hit, LE, 0.0)


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


def oracle_shade(out_d):
    n = out_d.shape[0]
    out = orc.shade(
        np.broadcast_to(COLOR, (n, 3)).astype(np.float32),
        np.broadcast_to(N, (n, 3)).astype(np.float32),
        np.full(n, METAL, np.float32),
        np.full(n, ROUGH, np.float32),
        np.broadcast_to(IN_D, (n, 3)).astype(np.float32),
        out_d.astype(np.float32),
    )
    return out.astype(np.float64)


def impl_pdf(out_d):
    n = out_d.shape[0]
    pos = jnp.asarray(np.broadcast_to(P, (n, 3)), jnp.float32)
    out = shading.mixture_pdf(
        scene, pos,
        jnp.asarray(np.broadcast_to(N, (n, 3)), jnp.float32),
        jnp.asarray(np.full(n, ROUGH), jnp.float32),
        jnp.asarray(np.broadcast_to(IN_D, (n, 3)), jnp.float32),
        jnp.asarray(out_d, jnp.float32),
        has_lights=True,
    )
    return np.asarray(out).astype(np.float64)


def oracle_pdf(out_d):
    n = out_d.shape[0]
    o_b = np.broadcast_to(P, (n, 3)).astype(np.float32)
    p_cos = orc.cosine_pdf(np.broadcast_to(N, (n, 3)).astype(np.float32),
                           out_d.astype(np.float32))
    p_light = orc.light_pdf(osc, o_b, out_d.astype(np.float32))
    p_vndf = orc.vndf_pdf(
        np.broadcast_to(N, (n, 3)).astype(np.float32),
        np.broadcast_to(-IN_D, (n, 3)).astype(np.float32),
        np.float32(ROUGH**2), out_d.astype(np.float32),
    )
    return ((p_cos + p_light + p_vndf) / 3.0).astype(np.float64)


# ---- A/B: pointwise parity on a hemisphere grid -------------------------
ntheta, nphi = 256, 512
th = (np.arange(ntheta) + 0.5) / ntheta * (np.pi / 2)
ph = (np.arange(nphi) + 0.5) / nphi * (2 * np.pi)
T, PH = np.meshgrid(th, ph, indexing="ij")
wi = np.stack(
    [np.sin(T) * np.cos(PH), np.cos(T), np.sin(T) * np.sin(PH)], -1
).reshape(-1, 3)

sA_i = impl_shade(wi)
sA_o = oracle_shade(wi)
print("A. shade parity: max|diff|", np.abs(sA_i - sA_o).max(),
      "rel", np.abs(sA_i - sA_o).max() / sA_i.max())

pB_i = impl_pdf(wi)
pB_o = oracle_pdf(wi)
rel = np.abs(pB_i - pB_o) / np.maximum(pB_i, 1e-9)
print("B. mixture-pdf parity: max rel diff", rel.max(),
      "   at pdf", pB_i[rel.argmax()], "dir", wi[rel.argmax()])

# quadrature ground truth of the direct-light bounce integral
w = np.sin(T).reshape(-1) * (np.pi / 2 / ntheta) * (2 * np.pi / nphi)
Lw = L_direct(wi)
gt = (sA_i * (Lw * w)[:, None]).sum(0)
print("quadrature integral(shade*L) =", gt)

# ---- C: each side's own-sampler estimate --------------------------------
NS = 4_000_000
# impl sampler: counter-addressed uniforms exactly like eval_bounce
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
        jnp.zeros(NS, jnp.float32), rough, ind, out_d,
    )
    return out_d, val, pdf


out_d_i, val_i, pdf_i = impl_estimate(u)
out_d_i = np.asarray(out_d_i).astype(np.float64)
est_i = np.asarray(val_i).astype(np.float64) * (
    L_direct(out_d_i) / np.maximum(np.asarray(pdf_i).astype(np.float64), 1e-12)
)[:, None]
# reference kill rule: ||value||_1 / pdf > 1e-5 else contribution dropped
keep_i = (np.abs(np.asarray(val_i)).sum(-1) / np.asarray(pdf_i)) > 1e-5
est_i = np.where(keep_i[:, None], est_i, 0.0)
m_i = est_i.mean(0)
se_i = est_i.std(0) / np.sqrt(NS)
print("C. impl   estimate:", m_i, "+-", se_i)
print("   vs quadrature  : rel", (m_i - gt) / gt, " z", (m_i - gt) / se_i)

# oracle sampler (mirrors orc.trace's bounce logic)
rng = np.random.default_rng(99)
o_b = np.broadcast_to(P, (NS, 3)).astype(np.float32)
n_b = np.broadcast_to(N, (NS, 3)).astype(np.float32)
t = rng.random(NS, np.float32)
d_cos = orc.cosine_sample(rng, n_b)
d_light = orc.light_sample(rng, osc, o_b)
d_vndf_h = orc.vndf_sample(rng, n_b, np.broadcast_to(-IN_D, (NS, 3)).astype(np.float32), np.float32(ROUGH**2))
in_b = np.broadcast_to(IN_D, (NS, 3)).astype(np.float32)
d_spec = in_b - 2 * orc._dot(d_vndf_h, in_b)[:, None] * d_vndf_h
use_cos = t <= 1 / 3
use_light = (~use_cos) & (t <= 2 / 3)
out_d_o = np.where(use_cos[:, None], d_cos,
                   np.where(use_light[:, None], d_light, d_spec))
out_d_o = orc._normalize(out_d_o).astype(np.float32)
p_o = (orc.cosine_pdf(n_b, out_d_o) + orc.light_pdf(osc, o_b, out_d_o)
       + orc.vndf_pdf(n_b, np.broadcast_to(-IN_D, (NS, 3)).astype(np.float32),
                      np.float32(ROUGH**2), out_d_o)) / 3.0
v_o = orc.shade(np.broadcast_to(COLOR, (NS, 3)).astype(np.float32), n_b,
                np.zeros(NS, np.float32), np.full(NS, ROUGH, np.float32),
                in_b, out_d_o)
p64 = p_o.astype(np.float64)
est_o = v_o.astype(np.float64) * (L_direct(out_d_o.astype(np.float64))
                                  / np.maximum(p64, 1e-12))[:, None]
keep_o = (np.abs(v_o).sum(-1) / p_o) > 1e-5
est_o = np.where(keep_o[:, None], est_o, 0.0)
m_o = est_o.mean(0)
se_o = est_o.std(0) / np.sqrt(NS)
print("   oracle estimate:", m_o, "+-", se_o)
print("   vs quadrature  : rel", (m_o - gt) / gt, " z", (m_o - gt) / se_o)
print("   impl-vs-oracle rel:", (m_i - m_o) / gt,
      " z", (m_i - m_o) / np.sqrt(se_i**2 + se_o**2))
