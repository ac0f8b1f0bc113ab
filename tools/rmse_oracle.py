"""Oracle side of the accuracy harness: the independent numpy reference
renders each config's proxy window to mean+variance. Single-core numpy and
slow (~1.3 Krays/s) — run in the background; pass config names to restrict.

Run: python tools/rmse_oracle.py [cfg1_cube ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, load_scene


def main():
    from raytracer_odin_tpu.oracle import cpu_reference as oracle

    args = sys.argv[1:]
    spp_override = None
    if "--spp" in args:
        i = args.index("--spp")
        spp_override = int(args[i + 1])
        del args[i:i + 2]
    only = set(args)
    out = Path(OUT_DIR)
    out.mkdir(parents=True, exist_ok=True)
    for name, scene_name, _w, _h, depth, _cfg, _ss, proxy in CONFIGS:
        if only and name not in only:
            continue
        pw, ph, pspp = proxy
        if spp_override is not None:
            # Matched-spp runs (e.g. --spp 1024 to equal TPU_PROXY_SPP):
            # variance estimates of a heavy-tailed sampler are tail-starved
            # at low spp (a pixel's estimate misses the rare fireflies it
            # didn't draw), so cross-spp variance ratios are biased; equal
            # spp makes both sides' estimators identically distributed.
            pspp = spp_override
        host, scene = load_scene(scene_name)
        t0 = time.perf_counter()
        mean, var = oracle.render(
            scene, pw, ph, host.cam.fov_x * (pw / ph), depth, pspp,
            seed=12345, return_var=True,
        )
        np.save(out / f"{name}_oracle_mean.npy", mean)
        np.save(out / f"{name}_oracle_var.npy", var)
        np.save(out / f"{name}_oracle_spp.npy", np.int64(pspp))
        print(
            f"{name}: oracle {pw}x{ph}@{pspp}spp in "
            f"{time.perf_counter()-t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
