"""A/B: bounce-compacted step vs cross-sample refill on the real TPU.

Demo scene, 1080p, depth 8 — the headline bench config. Prints one JSON
line per variant: scheduler, samples_per_step, ms/step, ms/sample, Mrays/s
(median window, same accounting as bench.py).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_odin_tpu.utils import compile_cache

compile_cache.enable()

from raytracer_odin_tpu.config import RenderConfig
from raytracer_odin_tpu.io import gltf
from raytracer_odin_tpu.models import assets, build
from raytracer_odin_tpu.render import accum, runtime

W, H, DEPTH = 1920, 1080, 8
SCENE = os.environ.get("RT_AB_SCENE", "demo")


def measure(cfg, scene, fov_x, label):
    if cfg.compact == "refill":
        plan = runtime.auto_refill_plan(scene, cfg, fov_x)
        step = runtime.make_refill_render_step(cfg, fov_x, plan)
        extra = {
            "plan_iters": len(plan.fresh),
            "plan_lane_volume": sum(plan.keep),
            "steady_fresh": max(plan.fresh[1:] or [0]),
        }
    else:
        schedule = runtime.auto_lane_schedule(scene, cfg, fov_x)
        step = runtime.make_render_step(cfg, fov_x, lane_schedule=schedule)
        extra = {}
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    stats, _ = step(scene, accum.init_stats(1, H, W), key, jnp.int32(0))
    jax.block_until_ready(stats.count)
    compile_s = time.perf_counter() - t0
    s = cfg.samples_per_step
    for i in (1, 2):
        stats, _ = step(scene, stats, key, jnp.int32(i * s))
    jax.block_until_ready(stats.count)
    n_windows, steps_per_window = 4, max(1, 4 // s)
    window = []
    rays_dev = None
    k = 3
    for _ in range(n_windows):
        w0 = time.perf_counter()
        for _ in range(steps_per_window):
            stats, ro = step(scene, stats, key, jnp.int32(k * s))
            rays_dev = ro if rays_dev is None else rays_dev + ro
            k += 1
        jax.block_until_ready(stats.count)
        window.append(time.perf_counter() - w0)
    arr = np.asarray(rays_dev)
    rays, over = int(arr[0]), int(arr[1])
    total_s = sum(window)
    n_samples = n_windows * steps_per_window * s
    w_sorted = sorted(window)
    med_w = (w_sorted[1] + w_sorted[2]) / 2
    mrays_med = rays / (total_s * med_w / (total_s / n_windows)) / 1e6 \
        if False else (rays / n_windows) / med_w / 1e6
    print(json.dumps({
        "label": label,
        "scheduler": cfg.compact,
        "spp_per_step": s,
        "compile_s": round(compile_s, 1),
        "ms_per_sample": round(1000 * total_s / n_samples, 1),
        "mrays_median_window": round(mrays_med, 2),
        "mrays_mean": round(rays / total_s / 1e6, 2),
        "overflow": over,
        **extra,
    }), flush=True)


def main():
    info = assets.generate(SCENE, "/tmp/bench_scenes")
    host = gltf.read_gltf(info["gltf"])
    scene = build.finish_scene(host)
    fov_x = host.cam.fov_x * (W / H)
    variants = sys.argv[1:] or ["bounce1", "refill4"]
    for v in variants:
        if v.startswith("bounce"):
            s = int(v[len("bounce"):] or 1)
            cfg = RenderConfig(
                width=W, height=H, ray_depth=DEPTH, samples=1 << 30,
                samples_per_step=s, debug_features=False,
                intersector="pallas", compact="auto",
            )
        else:
            s = int(v[len("refill"):] or 4)
            cfg = RenderConfig(
                width=W, height=H, ray_depth=DEPTH, samples=1 << 30,
                samples_per_step=s, debug_features=False,
                intersector="pallas", compact="refill",
            )
        measure(cfg, scene, fov_x, v)


if __name__ == "__main__":
    main()
