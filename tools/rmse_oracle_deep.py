"""Incrementally deepen one config's oracle proxy render.

The single-core numpy oracle needs hours for >=512 spp on the bigger
configs; a run that only saves at the end loses everything to a restart.
This driver renders in independent chunks (fresh seed per chunk), folds
each into running mean / E[x^2] moments, and atomically rewrites the
standard `{name}_oracle_{mean,var,spp}.npy` triplet after every chunk —
tools/rmse_report.py then reads whatever depth has accumulated so far.

Moment folding: for chunks with means m_i, variances v_i and sizes n_i,
E[x] = sum(n_i m_i)/N and E[x^2] = sum(n_i (v_i + m_i^2))/N, so the
combined per-sample variance is E[x^2] - E[x]^2 (the same population
estimator oracle.render uses internally).

RESUME SEMANTICS: by default existing oracle files are REPLACED, not
folded into — chunk seeds are derived from the chunk index, so folding a
prior run in would double-count its samples. With --resume, the saved
(mean, var, spp) triplet is converted back to running moments
(sum n_i m_i = mean * spp; sum n_i (v_i + m_i^2) = (var + mean^2) * spp)
and chunk indexing continues at k = spp // chunk — valid ONLY when the
prior run used the SAME --chunk size (chunk seeds 777_000 + k must not
repeat), which the k*chunk == spp check enforces.

Run:  python tools/rmse_oracle_deep.py cfg5_demo --target 512 --chunk 32
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, load_scene


def _atomic_save(path: Path, arr) -> None:
    tmp = path.with_suffix(".tmp.npy")
    np.save(tmp, arr)
    tmp.replace(path)


def main():
    from raytracer_odin_tpu.oracle import cpu_reference as oracle

    args = sys.argv[1:]
    target, chunk = 512, 32
    if "--target" in args:
        i = args.index("--target")
        target = int(args[i + 1])
        del args[i:i + 2]
    if "--chunk" in args:
        i = args.index("--chunk")
        chunk = int(args[i + 1])
        del args[i:i + 2]
    resume = "--resume" in args
    if resume:
        args.remove("--resume")
    (name,) = args
    row = [c for c in CONFIGS if c[0] == name][0]
    _, scene_name, _w, _h, depth, _cfg, _ss, (pw, ph, _pspp) = row

    out = Path(OUT_DIR)
    host, scene = load_scene(scene_name)
    fov = host.cam.fov_x * (pw / ph)

    sum_m = np.zeros((ph, pw, 3), np.float64)   # sum of n_i * m_i
    sum_m2 = np.zeros((ph, pw, 3), np.float64)  # sum of n_i * (v_i + m_i^2)
    done = 0
    k = 0
    if resume and (out / f"{name}_oracle_spp.npy").exists():
        done = int(np.load(out / f"{name}_oracle_spp.npy"))
        k = done // chunk
        assert k * chunk == done, (
            f"--resume needs the prior run's --chunk: {done} spp is not a "
            f"multiple of {chunk}"
        )
        m0 = np.load(out / f"{name}_oracle_mean.npy").astype(np.float64)
        v0 = np.load(out / f"{name}_oracle_var.npy").astype(np.float64)
        assert m0.shape == (ph, pw, 3), "proxy resolution changed; no resume"
        sum_m = done * m0
        sum_m2 = done * (v0 + m0 * m0)
        print(f"{name}: resuming at {done} spp (k={k})", flush=True)
    while done < target:
        n_i = min(chunk, target - done)
        t0 = time.perf_counter()
        # Chunk seeds must be distinct from each other AND from the base
        # harness seed (12345) so no sample set is reused.
        m, v = oracle.render(
            scene, pw, ph, fov, depth, n_i,
            seed=777_000 + k, return_var=True,
        )
        m = m.astype(np.float64)
        v = v.astype(np.float64)
        sum_m += n_i * m
        sum_m2 += n_i * (v + m * m)
        done += n_i
        k += 1
        mean = (sum_m / done).astype(np.float32)
        var = np.maximum(sum_m2 / done - (sum_m / done) ** 2, 0.0).astype(
            np.float32
        )
        _atomic_save(out / f"{name}_oracle_mean.npy", mean)
        _atomic_save(out / f"{name}_oracle_var.npy", var)
        _atomic_save(out / f"{name}_oracle_spp.npy", np.int64(done))
        print(
            f"{name}: {done}/{target} spp "
            f"(+{n_i} in {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
