"""Render K independent small oracle draws of one config and save the
per-draw image means/vars — the empirical draw-noise estimator for the
oracle mean-shift z gate.

Why: the image-mean z test needs the per-draw standard error of the
ORACLE side. The claimed SE sqrt(mean(var)/N/spp) underestimates true
draw noise on firefly scenes (ARCHITECTURE.md "Low-spp skew bias"), and a
single extra full-depth draw on a 1-core host is infeasible (cfg5:
~142 s/spp). But the variance of a mean of n iid samples is EXACTLY
var/n at any n — skew breaks Gaussianity of low-spp draws, not the 1/n
variance scaling — so K cheap independent draws at `chunk` spp measure
c = Var[draw mean] * chunk with K-1 dof, and the 512-spp draw's true SE
is sqrt(c / 512). The draws also fold into the pooled oracle mean
(rmse_report.py consumes the saved file), deepening it past the primary
triplet.

Seeds: 555_000 + k — disjoint from the primary triplet (777_000 + k,
rmse_oracle_deep.py), the seed2 series and the harness base seed, so the
draws are independent of every other artifact.

Run: JAX_PLATFORMS=cpu python tools/rmse_oracle_draws.py cfg5_demo \
        --draws 8 --chunk 8
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
    draws, chunk = 8, 8
    if "--draws" in args:
        i = args.index("--draws")
        draws = int(args[i + 1])
        del args[i:i + 2]
    if "--chunk" in args:
        i = args.index("--chunk")
        chunk = int(args[i + 1])
        del args[i:i + 2]
    # Independent series: a different seed base + file suffix renders a
    # SECOND independent draw set (e.g. --seed-base 888000 --suffix _b
    # for the equal-spp oracle draw pooled from 16x32-spp chunks). The
    # default 555000 series must never be reused with another chunk size:
    # chunk seeds are seed_base + k, so same-base sets share samples.
    seed_base = 555_000
    if "--seed-base" in args:
        i = args.index("--seed-base")
        seed_base = int(args[i + 1])
        del args[i:i + 2]
    suffix = ""
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        del args[i:i + 2]
    (name,) = args
    row = [c for c in CONFIGS if c[0] == name][0]
    _, scene_name, _w, _h, depth, _cfg, _ss, (pw, ph, _pspp) = row

    out = Path(OUT_DIR)
    path = out / f"{name}_oracle_draws{suffix}.npz"
    host, scene = load_scene(scene_name)
    fov = host.cam.fov_x * (pw / ph)

    means, vars_ = [], []
    # Resume: keep finished draws (each is ~20 min on a 1-core host).
    if path.exists():
        prev = np.load(path)
        if int(prev["chunk"]) == chunk:
            means = list(prev["means"])
            vars_ = list(prev["vars"])
            print(f"{name}: resuming with {len(means)} draws", flush=True)

    k = len(means)
    while k < draws:
        t0 = time.perf_counter()
        m, v = oracle.render(
            scene, pw, ph, fov, depth, chunk,
            seed=seed_base + k, return_var=True,
        )
        means.append(m.astype(np.float32))
        vars_.append(v.astype(np.float32))
        k += 1
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, means=np.stack(means), vars=np.stack(vars_),
                 chunk=np.int64(chunk))
        tmp.replace(path)
        print(f"{name}: draw {k}/{draws} ({chunk} spp) in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    im = np.stack([m.mean() for m in means])
    c_hat = im.var(ddof=1) * chunk
    print(f"image means: {im}")
    print(f"empirical c = Var[draw mean]*chunk = {c_hat:.3e} "
          f"-> SE at 512 spp = {np.sqrt(c_hat / 512):.3e}")


if __name__ == "__main__":
    main()
