"""Quantify exact-mask block-union tightness vs RB on real 1080p bounce-1
rays (demo scene), entirely on CPU. Kernel sweep work per bounce is
sum_blocks(union_popcount) * RB lane-tests; the per-ray popcount sum is the
unreachable lower bound (per-lane control flow doesn't exist on the VPU).
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import numpy as np
import jax
import jax.numpy as jnp

from raytracer_odin_tpu.io import gltf
from raytracer_odin_tpu.models import assets, build
from raytracer_odin_tpu.ops.integrator import TraceOptions, trace
from raytracer_odin_tpu.ops import traverse
from raytracer_odin_tpu.ops.geometry import RAY_EPS
from raytracer_odin_tpu.render import runtime

W, H = 1920, 1080
info = assets.generate("demo", "/tmp/bench_scenes")
host = gltf.read_gltf(info["gltf"])
scene = build.finish_scene(host)
fov_x = host.cam.fov_x * (W / H)

from raytracer_odin_tpu.utils import prng
stream_ids = jnp.arange(W * H, dtype=jnp.int32).reshape(H, W)
jit2 = prng.uniforms(jax.random.PRNGKey(0), jnp.int32(0), 99, stream_ids, 2)
o, d = runtime.generate_rays(scene.cam_pos, scene.cam_basis, fov_x, W, H,
                             jit2)

opts = TraceOptions(depth=2, intersector="bvh", sort_rays=False,
                    log_paths=True)
_, aux = trace(scene, o.reshape(-1, 3), d.reshape(-1, 3),
               (jax.random.PRNGKey(0), jnp.int32(0)), opts)
log = aux["ray_log"]
o1 = np.asarray(log["o"][1]); d1 = np.asarray(log["d"][1])
alive1 = np.asarray(log["alive"][1])
print("bounce-1 alive:", alive1.mean())

# exact per-ray cluster masks, numpy (matches _mask_kernel slab semantics)
lo = np.asarray(scene.cluster_lo); hi = np.asarray(scene.cluster_hi)
C = lo.shape[0]
print("clusters:", C)
oo = (o1 + d1 * RAY_EPS)
inv = 1.0 / d1
N = oo.shape[0]
mask = np.zeros((N, C), bool)
chunk = 200_000
for s in range(0, N, chunk):
    e = min(N, s + chunk)
    t1 = (lo[None] - oo[s:e, None]) * inv[s:e, None]
    t2 = (hi[None] - oo[s:e, None]) * inv[s:e, None]
    tmin = np.nan_to_num(np.minimum(t1, t2), nan=-3e38).max(-1)
    tmax = np.nan_to_num(np.maximum(t1, t2), nan=3e38).min(-1)
    mask[s:e] = (tmin <= tmax) & (tmax >= 0)
mask[~alive1] = False
per_ray = mask.sum(1)
print(f"per-ray mean clusters (alive): {per_ray[alive1].mean():.2f}")

# lex sort: (dead, octant, words...) — emulate with lexsort over word cols
octant = ((d1[:, 0] < 0).astype(int) | ((d1[:, 1] < 0).astype(int) << 1)
          | ((d1[:, 2] < 0).astype(int) << 2))
words = np.zeros((N, (C + 31) // 32), np.uint32)
for c in range(C):
    words[:, c // 32] |= (mask[:, c].astype(np.uint32) << (c % 32))
dead = (~alive1).astype(np.uint32)
keys = [words[:, i] for i in range(words.shape[1] - 1, -1, -1)]
keys += [octant.astype(np.uint32), dead]  # last key = primary
order = np.lexsort(tuple(keys))
sm = mask[order]
sa = alive1[order]

for rb in (512, 256, 128, 64):
    npad = -(-N // rb) * rb
    pad = npad - N
    m = np.concatenate([sm, np.zeros((pad, C), bool)]) if pad else sm
    blocks = m.reshape(-1, rb, C)
    union = blocks.any(1).sum(-1)          # clusters per block
    work = (union * rb).sum()              # lane-cluster tests
    alive_blocks = (union > 0)
    print(f"RB={rb:4d}: mean union (active blocks) "
          f"{union[alive_blocks].mean():6.2f}  "
          f"total lane-cluster tests {work/1e6:8.1f}M  "
          f"vs per-ray ideal {per_ray.sum()/1e6:6.1f}M  "
          f"overwork x{work/max(per_ray.sum(),1):.2f}")
