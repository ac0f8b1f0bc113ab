"""Validate the matmul-precision fix on the real TPU: the cornell proxy
mean must drop to the CPU/oracle value (~0.3911, was 0.4348 with the bf16
light-table lookup), and same-seed parity vs the existing CPU render must
improve dramatically (camera rays no longer bf16-quantized).

Run: bash tools/tpu_run.sh tools/validate_precision_fix.py /tmp/valfix.txt
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import load_scene  # noqa: E402
from rmse_tpu import render_stats  # noqa: E402


def main():
    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()
    host, scene = load_scene("cornell")
    out = Path("out/rmse")

    t0 = time.perf_counter()
    mean, var = render_stats(
        scene, host.cam.fov_x * (128 / 96), 128, 96, 6, 1024
    )
    v = var.astype(np.float64).mean(-1)
    cpu_m = np.load(out / "cfg2_cornell_cpu_proxy_mean.npy").astype(np.float64)
    cpu_v = np.load(out / "cfg2_cornell_cpu_proxy_var.npy").astype(np.float64)
    print(
        f"proxy: mean-img {mean.mean():.5f} (cpu {cpu_m.mean():.5f}) "
        f"var mean {v.mean():.4f} median {np.median(v):.4f} "
        f"(cpu {cpu_v.mean(-1).mean():.4f}/{np.median(cpu_v.mean(-1)):.4f}) "
        f"({time.perf_counter()-t0:.0f}s)",
        flush=True,
    )
    np.save(out / "cfg2_cornell_tpu_proxy_mean.npy", mean)
    np.save(out / "cfg2_cornell_tpu_proxy_var.npy", var)

    t0 = time.perf_counter()
    mean, var = render_stats(
        scene, host.cam.fov_x * (512 / 512), 512, 512, 6, 16
    )
    a = mean.astype(np.float64)
    b = np.load(out / "cfg2_cornell_cpu_sameseed.npy").astype(np.float64)
    va = var.astype(np.float64)
    vb = np.load(out / "cfg2_cornell_cpu_sameseed_var.npy").astype(np.float64)
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    floor = float(np.sqrt(((va + vb) / 16).mean()))
    z = float((a - b).mean() / (floor / np.sqrt(a.size)))
    print(
        f"same-seed: rmse {rmse:.5f} floor {floor:.4f} ratio {rmse/floor:.3f}"
        f" mean-shift-z {z:.1f} frac>1e-3 {(np.abs(a-b)>1e-3).mean():.4f} "
        f"({time.perf_counter()-t0:.0f}s)",
        flush=True,
    )
    np.save(out / "cfg2_cornell_tpu_sameseed.npy", mean)
    np.save(out / "cfg2_cornell_tpu_sameseed_var.npy", var)


if __name__ == "__main__":
    main()
