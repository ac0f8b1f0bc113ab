"""Render the five BASELINE.json configs end to end and write a report.

Usage: bash tools/tpu_run.sh tools/render_baselines.py /tmp/baselines.txt
Outputs PNGs + timings to out/baselines/ and prints a JSON report line per
config, including per-pixel RMSE of the TPU render against the same-seed CPU
oracle-render for config 1 (the BASELINE accuracy check).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

OUT = Path("out/baselines")


def main():
    import jax
    import jax.numpy as jnp

    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    from raytracer_odin_tpu.config import RenderConfig
    from raytracer_odin_tpu.io import gltf, images, writers
    from raytracer_odin_tpu.models import assets, build
    from raytracer_odin_tpu.models.scene import HostTexture
    from raytracer_odin_tpu.render import accum, output, runtime

    OUT.mkdir(parents=True, exist_ok=True)
    scene_dir = "/tmp/baseline_scenes"

    configs = [
        # (name, scene, W, H, depth, spp); spp None = continuous mode with
        # a convergence stop (BASELINE config 5: "continuous-accumulation
        # mode to convergence"), bounded by MAX_CONTINUOUS_SPP.
        ("cfg1_cube", "cube", 256, 256, 2, 16),
        ("cfg2_cornell", "cornell", 512, 512, 6, 64),
        ("cfg3_textured", "textured", 800, 600, 8, 128),
        ("cfg4_envmap", "envmap", 1024, 768, 8, 256),
        ("cfg5_demo_1080p", "demo", 1920, 1080, 8, None),
    ]
    # Convergence: stop when the MEDIAN per-pixel standard error of the
    # beauty mean drops below this (the variance layer the reference only
    # visualizes, consumed as a stopping rule; median because firefly
    # samples make the mean SE non-convergent — runtime.py). 1.5e-2 =
    # typical-pixel noise ~1.5% of unit radiance; the demo scene reaches
    # it around 2.5k spp.
    CONVERGE_SE = 1.5e-2
    MAX_CONTINUOUS_SPP = 8192

    for name, scene_name, W, H, depth, spp in configs:
        info = assets.generate(scene_name, scene_dir)
        host = gltf.read_gltf(info["gltf"])
        env = None
        if "env" in info:
            li = images.load_image(info["env"])
            env = HostTexture(li.data, li.is_hdr)
        scene = build.finish_scene(host, env_map=env)
        fov_x = host.cam.fov_x * (W / H)
        continuous = spp is None
        spp_step = 8 if continuous else min(spp, 8)
        while not continuous and spp % spp_step:
            spp_step -= 1
        cfg = RenderConfig(
            width=W, height=H, ray_depth=depth,
            samples=0 if continuous else spp, continuous=continuous,
            samples_per_step=spp_step, debug_features=False,
            intersector="pallas",
        )

        class SppCap:
            """Truthy once the continuous render hits the spp bound."""
            hit = False

            def __bool__(self):
                return self.hit

        cap = SppCap()

        def on_step(_stats, samples_done):
            cap.hit = samples_done >= MAX_CONTINUOUS_SPP

        t0 = time.perf_counter()
        res = runtime.render_scene(
            scene, cfg, fov_x,
            converge_se=CONVERGE_SE if continuous else 0.0,
            interrupt=cap if continuous else None,
            on_step=on_step if continuous else None,
            verbose=continuous,
        )
        dt = time.perf_counter() - t0
        spp_done = res.samples_done
        img = output.layer_to_rgb(res.stats, 0, "mean")
        writers.save_image(OUT / f"{name}.png", img)

        report = {
            "config": name,
            "resolution": f"{W}x{H}",
            "depth": depth,
            "spp": spp_done,
            "seconds": round(dt, 2),
            "spp_per_s": round(spp_done / dt, 3),
        }
        if continuous:
            report["mode"] = "continuous"
            report["converge_se"] = CONVERGE_SE
            report["converged"] = not cap.hit
        if name == "cfg1_cube":
            # RMSE vs the identical-algorithm CPU render at equal spp/seed
            # (TPU-vs-CPU numerical parity: the BASELINE accuracy metric).
            # Run in a subprocess: the CPU backend needs interpret-mode
            # Pallas, selected by process-level backend detection.
            import os
            import subprocess

            helper = (
                "import numpy as np, jax; "
                "jax.config.update('jax_platforms','cpu'); "
                "from raytracer_odin_tpu.config import RenderConfig; "
                "from raytracer_odin_tpu.io import gltf; "
                "from raytracer_odin_tpu.models import assets, build; "
                "from raytracer_odin_tpu.render import runtime; "
                f"info = assets.generate('cube', '{scene_dir}'); "
                "host = gltf.read_gltf(info['gltf']); "
                "scene = build.finish_scene(host); "
                f"cfg = RenderConfig(width={W}, height={H}, ray_depth={depth}, "
                f"samples={spp}, samples_per_step={spp_step}, "
                "debug_features=False); "
                f"res = runtime.render_scene(scene, cfg, {fov_x!r}); "
                "np.save('/tmp/cfg1_cpu.npy', np.asarray(res.stats.total[0]))"
            )
            env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
            r = subprocess.run(
                [sys.executable, "-c", helper], env=env,
                capture_output=True, text=True, timeout=1200,
            )
            if r.returncode == 0:
                a = np.asarray(res.stats.total[0]) / spp
                b = np.load("/tmp/cfg1_cpu.npy") / spp
                report["rmse_vs_cpu_same_seed"] = float(
                    np.sqrt(((a - b) ** 2).mean())
                )
            else:
                report["rmse_vs_cpu_same_seed"] = "cpu render failed"
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
