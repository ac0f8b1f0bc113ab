"""Second independent oracle run for one config (fresh seed series) —
decides whether an oracle-row mean_shift_z is a one-draw fluctuation or a
systematic shift: z is recomputed against the same TPU proxy with a
statistically independent oracle render.

Writes {name}_oracle2_{mean,var,spp}.npy (never touches the primary
triplet) and prints the re-scored row line.

Run: JAX_PLATFORMS=cpu python tools/rmse_oracle_seed2.py cfg1_cube \
        --target 1024 --chunk 64
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, TPU_PROXY_SPP, load_scene


def _atomic_save(path: Path, arr) -> None:
    tmp = path.with_suffix(".tmp.npy")
    np.save(tmp, arr)
    tmp.replace(path)


def score(name, out):
    o = np.load(out / f"{name}_oracle2_mean.npy").astype(np.float64)
    ov = np.load(out / f"{name}_oracle2_var.npy").astype(np.float64)
    ospp = int(np.load(out / f"{name}_oracle2_spp.npy"))
    t = np.load(out / f"{name}_tpu_proxy_mean.npy").astype(np.float64)
    tv = np.load(out / f"{name}_tpu_proxy_var.npy").astype(np.float64)
    diff = t - o
    fl = np.sqrt(ov / ospp + tv / TPU_PROXY_SPP)
    floor = float(np.sqrt((fl**2).mean()))
    rmse = float(np.sqrt((diff**2).mean()))
    z = float(diff.mean() / (floor / np.sqrt(diff.size)))
    print(f"[seed2 @ {ospp} spp] rmse/floor "
          f"{rmse / floor:.3f}  mean_shift {diff.mean():.3e}  "
          f"mean_shift_z {z:.1f}", flush=True)


def main():
    from raytracer_odin_tpu.oracle import cpu_reference as oracle

    args = sys.argv[1:]
    target, chunk = 1024, 64
    if "--target" in args:
        i = args.index("--target")
        target = int(args[i + 1])
        del args[i:i + 2]
    if "--chunk" in args:
        i = args.index("--chunk")
        chunk = int(args[i + 1])
        del args[i:i + 2]
    (name,) = args
    row = [c for c in CONFIGS if c[0] == name][0]
    _, scene_name, _w, _h, depth, _cfg, _ss, (pw, ph, _pspp) = row

    out = Path(OUT_DIR)
    host, scene = load_scene(scene_name)
    fov = host.cam.fov_x * (pw / ph)

    sum_m = np.zeros((ph, pw, 3), np.float64)
    sum_m2 = np.zeros((ph, pw, 3), np.float64)
    done, k = 0, 0
    sppf = out / f"{name}_oracle2_spp.npy"
    if sppf.exists():
        done = int(np.load(sppf))
        k = done // chunk
        assert k * chunk == done
        m0 = np.load(out / f"{name}_oracle2_mean.npy").astype(np.float64)
        v0 = np.load(out / f"{name}_oracle2_var.npy").astype(np.float64)
        sum_m = done * m0
        sum_m2 = done * (v0 + m0 * m0)
        print(f"resuming at {done} spp", flush=True)
    while done < target:
        n_i = min(chunk, target - done)
        t0 = time.perf_counter()
        # 999_xxx series: disjoint from the harness seed (12345), the
        # primary oracle chunks (777_xxx) and the A/A probes (4242+17k).
        m, v = oracle.render(
            scene, pw, ph, fov, depth, n_i,
            seed=999_000 + k, return_var=True,
        )
        sum_m += n_i * m.astype(np.float64)
        sum_m2 += n_i * (v.astype(np.float64) + m.astype(np.float64) ** 2)
        done += n_i
        k += 1
        mean = (sum_m / done).astype(np.float32)
        var = np.maximum(sum_m2 / done - (sum_m / done) ** 2, 0).astype(np.float32)
        _atomic_save(out / f"{name}_oracle2_mean.npy", mean)
        _atomic_save(out / f"{name}_oracle2_var.npy", var)
        _atomic_save(sppf, np.int64(done))
        print(f"{name} seed2: {done}/{target} "
              f"(+{n_i} in {time.perf_counter() - t0:.0f}s)", flush=True)
        score(name, out)


if __name__ == "__main__":
    main()
