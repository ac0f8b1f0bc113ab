"""Bisect the cfg2 (cornell) TPU-vs-oracle variance ratio (VERDICT r2
weak #3): render the 128x96 proxy at 1024 spp on the real TPU with the
intersector and scheduling varied, and print per-pixel sample-variance
summaries. Compare against the matched CPU-JAX render
(out/rmse/cfg2_cornell_cpu_proxy_var.npy) and the oracle.

Run: bash tools/tpu_run.sh tools/bisect_cfg2_var.py /tmp/bisect_cfg2.txt
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import load_scene  # noqa: E402


def render_stats(scene, fov_x, w, h, depth, spp, intersector, compact):
    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.render import runtime

    cfg = RenderConfig(
        width=w, height=h, ray_depth=depth, samples=spp,
        samples_per_step=8, debug_features=False, seed=0,
        intersector=intersector, compact=compact,
    )
    res = runtime.render_scene(scene, cfg, fov_x)
    n = np.asarray(res.stats.count[0])[..., None]
    total = np.asarray(res.stats.total[0], np.float64)
    total_sq = np.asarray(res.stats.total_sq[0], np.float64)
    mean = total / n
    var = np.maximum(total_sq / n - mean**2, 0.0)
    return mean, var


def main():
    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()
    host, scene = load_scene("cornell")
    fov = host.cam.fov_x * (128 / 96)
    variants = [
        ("pallas+compact", "pallas", "auto"),
        ("pallas", "pallas", "off"),
        ("pallas_brute", "pallas_brute", "off"),
        ("xla_brute", "brute", "off"),
    ]
    means = {}
    for name, inter, compact in variants:
        t0 = time.perf_counter()
        mean, var = render_stats(scene, fov, 128, 96, 6, 1024, inter, compact)
        v = var.mean(-1)
        means[name] = mean
        print(
            f"{name}: var mean {v.mean():.4f} median {np.median(v):.4f} "
            f"p90 {np.percentile(v, 90):.4f} "
            f"mean-img {mean.mean():.5f} ({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
        np.save(f"/tmp/bisect_cfg2_{name.replace('+','_')}_var.npy", var)
    base = means["xla_brute"]
    for name in means:
        d = np.sqrt(((means[name] - base) ** 2).mean())
        print(f"mean-image rmse vs xla_brute: {name}: {d:.5f}")


if __name__ == "__main__":
    main()
