"""Benchmark: demo scene at 1080p on one chip, steady-state throughput.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "Mrays/s",
"vs_baseline": N} where vs_baseline is value / 200 (the BASELINE.json north
star: >= 200 Mrays/sec/chip at 1080p on the demo scene).

Rays are counted as *traced path segments*: W * H * spp * E[path length],
with the expected path length measured once from the integrator's bounce
counter — dead-lane slots are not credited.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.ops.integrator import TraceOptions
    from raytracer_odin_tpu.render import accum, runtime

    W, H, DEPTH = 1920, 1080, 8

    info = assets.generate("demo", "/tmp/bench_scenes")
    host = gltf.read_gltf(info["gltf"])
    scene = build.finish_scene(host)
    fov_x = host.cam.fov_x * (W / H)

    cfg = RenderConfig(
        width=W, height=H, ray_depth=DEPTH, samples=1 << 30,
        samples_per_step=1, debug_features=False, intersector="bvh",
    )
    step = runtime.make_render_step(cfg, fov_x)
    stats = accum.init_stats(1, H, W)
    key = jax.random.PRNGKey(0)

    # Measure mean path length once (small subsampled pass with aux).
    opts = TraceOptions(depth=DEPTH, intersector="bvh", want_aux=True)
    sub = 128
    _, aux = jax.jit(
        lambda s, k: runtime.sample_pass(s, k, fov_x, sub, sub, opts)
    )(scene, key)
    mean_len = float(np.asarray(aux["bounces"], np.float64).mean())

    # Warmup (compile) then timed steps.
    stats = step(scene, stats, key, jnp.int32(0))
    jax.block_until_ready(stats.count)
    n_steps = 4
    t0 = time.perf_counter()
    for i in range(n_steps):
        stats = step(scene, stats, key, jnp.int32(1 + i))
    jax.block_until_ready(stats.count)
    dt = time.perf_counter() - t0

    spp = n_steps * cfg.samples_per_step
    rays = W * H * spp * mean_len
    mrays = rays / dt / 1e6

    print(json.dumps({
        "metric": "demo scene 1080p path tracing throughput (1 chip)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "detail": {
            "mean_path_length": round(mean_len, 3),
            "seconds_per_sample": round(dt / spp, 3),
            "depth": DEPTH,
            "triangles": int(scene.tri_p.shape[0]),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
