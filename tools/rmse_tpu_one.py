"""Re-render the TPU side of ONE config of the accuracy harness (by name),
optionally only the proxy or only the same-seed half — for recovering a
partially-completed rmse_tpu.py run without paying for all five configs.

Usage: bash tools/tpu_run.sh "tools/rmse_tpu_one.py cfg5_demo proxy" out.txt
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, TPU_PROXY_SPP, load_scene
from rmse_tpu import render_stats


def main():
    want = sys.argv[1]
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    out = Path(OUT_DIR)
    out.mkdir(parents=True, exist_ok=True)
    for name, scene_name, w, h, depth, _cfg_spp, ss_spp, proxy in CONFIGS:
        if name != want:
            continue
        host, scene = load_scene(scene_name)
        t0 = time.perf_counter()
        if which in ("both", "sameseed"):
            mean, var = render_stats(
                scene, host.cam.fov_x * (w / h), w, h, depth, ss_spp
            )
            np.save(out / f"{name}_tpu_sameseed.npy", mean)
            np.save(out / f"{name}_tpu_sameseed_var.npy", var)
        if which in ("both", "proxy"):
            pw, ph, _pspp = proxy
            pmean, pvar = render_stats(
                scene, host.cam.fov_x * (pw / ph), pw, ph, depth,
                TPU_PROXY_SPP,
            )
            np.save(out / f"{name}_tpu_proxy_mean.npy", pmean)
            np.save(out / f"{name}_tpu_proxy_var.npy", pvar)
        print(f"{name} ({which}) in {time.perf_counter()-t0:.1f}s", flush=True)
        return
    raise SystemExit(f"unknown config {want!r}")


if __name__ == "__main__":
    main()
