"""CPU-JAX side of the accuracy harness: same implementation, same seeds,
CPU backend (BVH intersector) — the full-resolution same-seed renders.

Run: JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python tools/rmse_cpu.py
(pure CPU; safe to run alongside TPU work). Optionally pass config names
to restrict (e.g. `python tools/rmse_cpu.py cfg1_cube cfg2_cornell`).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, load_scene


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"

    from rmse_tpu import render_stats

    only = set(sys.argv[1:])
    out = Path(OUT_DIR)
    out.mkdir(parents=True, exist_ok=True)
    for name, scene_name, w, h, depth, _cfg_spp, ss_spp, _proxy in CONFIGS:
        if only and name not in only:
            continue
        host, scene = load_scene(scene_name)
        t0 = time.perf_counter()
        mean, var = render_stats(
            scene, host.cam.fov_x * (w / h), w, h, depth, ss_spp
        )
        np.save(out / f"{name}_cpu_sameseed.npy", mean)
        np.save(out / f"{name}_cpu_sameseed_var.npy", var)
        print(
            f"{name}: cpu same-seed {w}x{h}@{ss_spp}spp in "
            f"{time.perf_counter()-t0:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
