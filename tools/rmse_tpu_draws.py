"""Render K independent TPU proxy draws of one config — the DEVICE-side
empirical draw-noise estimator, the mirror of tools/rmse_oracle_draws.py.

Purpose (VERDICT r4 item 3): the oracle mean-shift gate must compare the
two implementations on equal statistical footing. The claimed SE
sqrt(mean(var)/N/spp) underestimates image-mean draw noise ~15-20x on
firefly scenes (measured: cfg5's 8 oracle draws give empirical
c = Var[draw mean]*spp with SE(512) = 4.0e-4 vs claimed 2.4e-5), so the
report's z must use EMPIRICAL per-draw noise on BOTH sides:

    z_emp = (mean_tpu - mean_oracle) / sqrt(se_tpu^2 + se_oracle^2)

with se = sqrt(c_hat / spp) per side. This tool measures the TPU side's
c_hat from K independent draws at `chunk` spp each (seeds disjoint from
every oracle series and the harness base seed) and saves the same npz
format rmse_report.py consumes for the oracle draws. On TPU a 128x72
proxy draw at 512 spp is ~2 s, so K = 16 is cheap.

It also measures the VARIANCE-ESTIMATE spp dependence: the per-pixel
sample variance of a heavy-tailed estimator grows with spp (rare bright
paths enter the estimate late), so a var-map ratio between sides rendered
at different spp is expected > 1 with zero implementation difference.
The probe renders the SAME implementation at a few spp and prints the
ratio curve (report.jsonl's variance_ratio mechanism).

Run: bash tools/tpu_run.sh "tools/rmse_tpu_draws.py cfg5_demo --draws 16 \
        --chunk 512" /tmp/tpu_draws.txt
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, load_scene  # noqa: E402
from rmse_tpu import render_stats  # noqa: E402

# Disjoint from the oracle draw bases (555000, 888000), the primary
# triplet (777000+), seed2 and the harness seed.
SEED_BASE = 444_000


def main():
    from raytracer_odin_tpu.utils import compile_cache

    compile_cache.enable()

    args = sys.argv[1:]
    draws, chunk = 16, 512
    if "--draws" in args:
        i = args.index("--draws")
        draws = int(args[i + 1])
        del args[i:i + 2]
    if "--chunk" in args:
        i = args.index("--chunk")
        chunk = int(args[i + 1])
        del args[i:i + 2]
    var_sweep = "--no-var-sweep" not in args
    if not var_sweep:
        args.remove("--no-var-sweep")
    (name,) = args
    row = [c for c in CONFIGS if c[0] == name][0]
    _, scene_name, _w, _h, depth, _cfg, _ss, (pw, ph, _pspp) = row

    out = Path(OUT_DIR)
    path = out / f"{name}_tpu_draws.npz"
    host, scene = load_scene(scene_name)
    fov = host.cam.fov_x * (pw / ph)

    means, vars_ = [], []
    if path.exists():
        prev = np.load(path)
        if int(prev["chunk"]) == chunk:
            means = list(prev["means"])
            vars_ = list(prev["vars"])
            print(f"{name}: resuming with {len(means)} draws", flush=True)

    k = len(means)
    while k < draws:
        t0 = time.perf_counter()
        m, v = render_stats(
            scene, fov, pw, ph, depth, chunk, seed=SEED_BASE + k
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
          f"-> SE at {chunk} spp = {np.sqrt(c_hat / chunk):.3e}")

    if var_sweep:
        # Same implementation, growing spp: any var-map growth is pure
        # estimator-spp dependence (heavy tails entering late), NOT an
        # implementation difference.
        print("variance-estimate spp dependence (same impl, fresh seeds):")
        base = None
        for spp in (128, 512, 1024, 4096):
            _m, v = render_stats(
                scene, fov, pw, ph, depth, spp, seed=SEED_BASE + 1000 + spp
            )
            lum = float(v.mean())
            if base is None:
                base = lum
            print(f"  spp {spp:5d}: mean var {lum:.5e} "
                  f"(x{lum / base:.3f} of spp-128)", flush=True)


if __name__ == "__main__":
    main()
