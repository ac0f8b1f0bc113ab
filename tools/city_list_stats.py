"""Why is the city chunked-resident sweep 12x the demo's kernel time/ray?

Reproduces, on CPU, exactly the list-building pipeline the compacted
render runs for the city scene (two-level exact masks at g>1 ->
block OR-union -> expand x g -> interval-cull refine -> per-chunk
build_lists at cap=192) for bounce-0 camera rays and REAL bounce-1 rays,
and prints the sweep-work accounting the kernel actually pays:

  sum over (chunk, block) of list_len x RB_SUB lane-cluster tests,

vs the per-ray exact-cluster-mask lower bound, plus the two suspected
pathologies: cap overflow (count == -1 sweeps the ENTIRE chunk) and
per-(chunk, block) zero-occupancy (a block launch whose list is empty).

Run: python tools/city_list_stats.py [scene] [W] [H]
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import sys

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_odin_tpu.io import gltf
from raytracer_odin_tpu.models import assets, build
from raytracer_odin_tpu.ops.integrator import TraceOptions, trace
from raytracer_odin_tpu.ops import culling, traverse
from raytracer_odin_tpu.ops import pallas_intersect as pi
from raytracer_odin_tpu.ops.geometry import RAY_EPS
from raytracer_odin_tpu.render import runtime
from raytracer_odin_tpu.utils import prng

SCENE = sys.argv[1] if len(sys.argv) > 1 else "city"
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
H = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
CAP = 192

info = assets.generate(SCENE, "/tmp/bench_scenes")
host = gltf.read_gltf(info["gltf"])
scene = build.finish_scene(host)
fov_x = host.cam.fov_x * (W / H)

stream_ids = jnp.arange(W * H, dtype=jnp.int32).reshape(H, W)
jit2 = prng.uniforms(jax.random.PRNGKey(0), jnp.int32(0), 99, stream_ids, 2)
o, d = runtime.generate_rays(scene.cam_pos, scene.cam_basis, fov_x, W, H, jit2)
o = np.asarray(o.reshape(-1, 3))
d = np.asarray(d.reshape(-1, 3))

g, n_super, aabb8 = traverse.exact_cull_layout(scene)
C = scene.cluster_lo.shape[0]
lb = pi.list_block(scene.ptri)
chunk_c = max(1, pi.chunk_tris() // pi.LEAF)
n_chunks = -(-C // chunk_c)
print(f"{SCENE}: {scene.tri_p.shape[0]} tris, C={C} clusters, g={g}, "
      f"n_super={n_super}, lb={lb}, chunk_c={chunk_c}, n_chunks={n_chunks}")

lo = np.asarray(scene.cluster_lo)
hi = np.asarray(scene.cluster_hi)
slo = np.asarray(aabb8[:n_super, 0:3])
shi = np.asarray(aabb8[:n_super, 3:6])


def exact_mask(oo, dd, blo, bhi):
    """Slab-test per-ray AABB mask, [N, B], matching _mask_kernel."""
    n = oo.shape[0]
    B = blo.shape[0]
    out = np.zeros((n, B), bool)
    inv = np.where(np.abs(dd) > 1e-20, 1.0 / dd, np.float32(1e30))
    step = 100_000
    for s in range(0, n, step):
        e = min(n, s + step)
        t0 = (blo[None] - oo[s:e, None]) * inv[s:e, None]
        t1 = (bhi[None] - oo[s:e, None]) * inv[s:e, None]
        tn = np.minimum(t0, t1).max(-1)
        tf = np.maximum(t0, t1).min(-1)
        out[s:e] = (tf >= np.maximum(tn, 0.0)) & (tn < 1e30)
    return out


def analyze(tag, o_r, d_r, alive):
    o_eps = (o_r + d_r * RAY_EPS).astype(np.float32)
    d_r = d_r.astype(np.float32)
    # dead lanes: degenerate far rays, empty masks
    o_eps = np.where(alive[:, None], o_eps, np.float32(1e30))
    d_r = np.where(alive[:, None], d_r, np.float32([1, 0, 0]))
    n = o_eps.shape[0]
    npad = -(-n // pi.RB) * pi.RB
    if npad != n:
        pado = np.full((npad - n, 3), 1e30, np.float32)
        padd = np.tile(np.float32([1, 0, 0]), (npad - n, 1))
        o_eps = np.concatenate([o_eps, pado])
        d_r = np.concatenate([d_r, padd])
        alive = np.concatenate([alive, np.zeros(npad - n, bool)])

    smask = exact_mask(o_eps, d_r, slo, shi)  # [N, n_super]
    per_ray_super = smask[alive].sum(-1)
    cmask_exact = exact_mask(o_eps, d_r, lo, hi)  # [N, C] ideal
    per_ray_exact = cmask_exact[alive].sum(-1)
    print(f"\n[{tag}] lanes {n} alive {alive.mean():.3f}")
    print(f"  per-ray super-mask popcount (alive): mean "
          f"{per_ray_super.mean():.2f} p99 {np.percentile(per_ray_super, 99):.0f}")
    print(f"  per-ray EXACT cluster popcount (alive): mean "
          f"{per_ray_exact.mean():.2f} p99 {np.percentile(per_ray_exact, 99):.0f}"
          f"  -> ideal lane-cluster tests/ray {per_ray_exact.mean():.2f}")

    # lex sort by (dead | octant, super words) — same keys as the render
    octant = ((d_r[:, 0] < 0) | ((d_r[:, 1] < 0) << 1)
              | ((d_r[:, 2] < 0) << 2)).astype(np.int64)
    dead = (~alive).astype(np.int64)
    words = np.zeros((n and npad, (n_super + 31) // 32), np.int64)
    for wi in range(words.shape[1]):
        bits = smask[:, wi * 32:(wi + 1) * 32]
        words[:, wi] = (bits << np.arange(bits.shape[1])).sum(-1)
    key = [dead << 3 | octant] + [words[:, i] for i in range(words.shape[1])]
    order = np.lexsort(tuple(reversed(key)))
    smask_s = smask[order]
    o_s, d_s = o_eps[order], d_r[order]
    alive_s = alive[order]

    nb = npad // lb
    bsuper = smask_s.reshape(nb, lb, n_super).any(1)  # [NB, n_super]
    # expand + interval refine (cull_clusters on block bounds)
    cmask = np.repeat(bsuper, g, axis=1)[:, :C]
    ob = o_s.reshape(nb, lb, 3)
    db = d_s.reshape(nb, lb, 3)
    o_lo, o_hi = ob.min(1), ob.max(1)
    d_lo, d_hi = db.min(1), db.max(1)
    imask, _ = culling.cull_clusters(
        jnp.asarray(o_lo), jnp.asarray(o_hi),
        jnp.asarray(d_lo), jnp.asarray(d_hi),
        scene.cluster_lo, scene.cluster_hi,
    )
    bmask = cmask & np.asarray(imask)
    print(f"  block union (post two-level refine): mean {bmask.sum(-1).mean():.1f} "
          f"clusters/block of {C}")

    total_tests = 0
    ideal_tests = per_ray_exact.sum()
    occ_zero = 0
    ovf_blocks = 0
    for a in range(0, C, chunk_c):
        b = min(C, a + chunk_c)
        counts = bmask[:, a:b].sum(-1)
        ovf = counts > CAP
        ovf_blocks += int(ovf.sum())
        occ_zero += int((counts == 0).sum())
        eff = np.where(ovf, b - a, counts)
        total_tests += int(eff.sum()) * lb
    n_pairs = nb * n_chunks
    print(f"  (chunk, block) pairs {n_pairs}: zero-occupancy "
          f"{occ_zero / n_pairs:.3f}, cap-overflow {ovf_blocks / n_pairs:.4f}")
    print(f"  sweep lane-cluster tests: {total_tests / 1e6:.1f}M "
          f"vs per-ray ideal {ideal_tests / 1e6:.1f}M "
          f"-> overwork x{total_tests / max(ideal_tests, 1):.2f}")
    # what if the refine used EXACT per-ray cluster masks instead (26 words)?
    bexact = cmask_exact[order].reshape(nb, lb, C).any(1)
    tests_exact = 0
    for a in range(0, C, chunk_c):
        cnts = bexact[:, a:b if (b := min(C, a + chunk_c)) else 0].sum(-1)
        tests_exact += int(np.minimum(cnts, CAP).sum()) * lb
    print(f"  [alt] exact-cluster-mask block unions: mean "
          f"{bexact.sum(-1).mean():.1f} -> tests {tests_exact / 1e6:.1f}M "
          f"(x{tests_exact / max(ideal_tests, 1):.2f})")


alive0 = np.ones(o.shape[0], bool)
analyze("bounce-0 camera", o, d, alive0)

opts = TraceOptions(depth=2, intersector="bvh", sort_rays=False,
                    log_paths=True)
_, aux = trace(scene, jnp.asarray(o), jnp.asarray(d),
               (jax.random.PRNGKey(0), jnp.int32(0)), opts)
log = aux["ray_log"]
o1 = np.asarray(log["o"][1])
d1 = np.asarray(log["d"][1])
alive1 = np.asarray(log["alive"][1]).astype(bool)
analyze("bounce-1 scattered", o1, d1, alive1)
