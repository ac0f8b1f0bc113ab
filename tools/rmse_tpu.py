"""TPU side of the accuracy harness: renders, for each BASELINE config,
(a) the full-resolution same-seed image at the harness spp and (b) the
proxy-resolution high-spp mean+variance for the oracle comparison.

Run serialized: bash tools/tpu_run.sh tools/rmse_tpu.py /tmp/rmse_tpu.txt
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, TPU_PROXY_SPP, load_scene


def render_stats(scene, fov_x, w, h, depth, spp, seed=0):
    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.render import runtime

    spp_step = min(spp, 8)
    while spp % spp_step:
        spp_step -= 1
    cfg = RenderConfig(
        width=w, height=h, ray_depth=depth, samples=spp,
        samples_per_step=spp_step, debug_features=False, seed=seed,
    )
    res = runtime.render_scene(scene, cfg, fov_x)
    n = np.asarray(res.stats.count[0])[..., None]
    total = np.asarray(res.stats.total[0], np.float64)
    total_sq = np.asarray(res.stats.total_sq[0], np.float64)
    mean = total / n
    var = np.maximum(total_sq / n - mean**2, 0.0)
    return mean.astype(np.float32), var.astype(np.float32)


def main():
    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()
    out = Path(OUT_DIR)
    out.mkdir(parents=True, exist_ok=True)

    for name, scene_name, w, h, depth, _cfg_spp, ss_spp, proxy in CONFIGS:
        host, scene = load_scene(scene_name)
        t0 = time.perf_counter()
        # (a) full-res same-seed render at the harness spp
        mean, var = render_stats(
            scene, host.cam.fov_x * (w / h), w, h, depth, ss_spp
        )
        np.save(out / f"{name}_tpu_sameseed.npy", mean)
        np.save(out / f"{name}_tpu_sameseed_var.npy", var)
        # (b) proxy-res high-spp mean + variance for the oracle comparison
        pw, ph, _pspp = proxy
        pmean, pvar = render_stats(
            scene, host.cam.fov_x * (pw / ph), pw, ph, depth, TPU_PROXY_SPP
        )
        np.save(out / f"{name}_tpu_proxy_mean.npy", pmean)
        np.save(out / f"{name}_tpu_proxy_var.npy", pvar)
        print(
            f"{name}: same-seed {w}x{h}@{ss_spp}spp + proxy {pw}x{ph}"
            f"@{TPU_PROXY_SPP}spp in {time.perf_counter()-t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
