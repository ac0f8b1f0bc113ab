"""Combine the rmse_{tpu,cpu,oracle}.py outputs into the accuracy report.

Writes out/rmse/report.jsonl (one line per config) and prints it. See
tools/rmse_common.py for what each column means and why the oracle
comparison is judged against the Monte-Carlo noise floor.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from rmse_common import CONFIGS, OUT_DIR, TPU_PROXY_SPP


def main():
    out = Path(OUT_DIR)
    lines = []
    for name, _scene, w, h, depth, cfg_spp, ss_spp, proxy in CONFIGS:
        rec = {"config": name, "resolution": f"{w}x{h}", "depth": depth,
               "config_spp": cfg_spp}

        t = out / f"{name}_tpu_sameseed.npy"
        c = out / f"{name}_cpu_sameseed.npy"
        if t.exists() and c.exists():
            a = np.load(t).astype(np.float64)
            b = np.load(c).astype(np.float64)
            d2 = (a - b) ** 2
            rec["same_seed_spp"] = ss_spp
            rec["same_seed_rmse"] = float(np.sqrt(d2.mean()))
            rec["same_seed_p99_abs"] = float(
                np.percentile(np.abs(a - b), 99)
            )
            rec["same_seed_frac_gt_1e3"] = float(
                (np.abs(a - b) > 1e-3).mean()
            )
            # Gate (see rmse_common.py): a flipped hit decision decorrelates
            # that path like an independent draw, so the difference is
            # bounded by the independent-render noise floor; a ratio above
            # ~1.2 would indicate systematic bias beyond path divergence.
            tv = out / f"{name}_tpu_sameseed_var.npy"
            cv = out / f"{name}_cpu_sameseed_var.npy"
            if tv.exists() and cv.exists():
                var_t = np.load(tv).astype(np.float64)
                var_c = np.load(cv).astype(np.float64)
                indep_floor = float(
                    np.sqrt(((var_t + var_c) / ss_spp).mean())
                )
                rec["same_seed_indep_floor"] = indep_floor
                rec["same_seed_over_indep_floor"] = round(
                    rec["same_seed_rmse"] / max(indep_floor, 1e-12), 3
                )
                # Mean-shift z: the image-wide mean of (a - b) averages the
                # per-pixel noise down by sqrt(Npix), so a systematic energy
                # bias far smaller than the per-pixel floor is still many
                # sigma here. This is the test that catches a brightness
                # bias hiding under a large per-pixel floor (it flagged the
                # 10.6% cornell TPU excess the floor-ratio gate passed).
                n_px = d2.size
                mean_se = indep_floor / np.sqrt(n_px)
                rec["same_seed_mean_shift"] = float((a - b).mean())
                rec["same_seed_mean_shift_z"] = round(
                    float((a - b).mean() / max(mean_se, 1e-12)), 1
                )
                rec["same_seed_pass"] = bool(
                    rec["same_seed_over_indep_floor"] < 1.2
                    and abs(rec["same_seed_mean_shift_z"]) < 6.0
                )

        om = out / f"{name}_oracle_mean.npy"
        tm = out / f"{name}_tpu_proxy_mean.npy"
        if om.exists() and tm.exists():
            o_mean = np.load(om).astype(np.float64)
            o_var = np.load(out / f"{name}_oracle_var.npy").astype(np.float64)
            o_spp = int(np.load(out / f"{name}_oracle_spp.npy"))
            # Second independent oracle draw (tools/rmse_oracle_seed2.py):
            # pool the means AND measure the image-mean noise empirically.
            # The variance-map floor provably understates image-mean noise
            # for skewed estimators (cfg1 true-null o1-vs-o2 landed at
            # z=2.0 on the claimed floor); |mean(o1-o2)|/sqrt(2) is an
            # assumption-free draw of the per-run sigma.
            emp_mean_se = None
            o2m = out / f"{name}_oracle2_mean.npy"
            if o2m.exists():
                o2_mean = np.load(o2m).astype(np.float64)
                o2_var = np.load(
                    out / f"{name}_oracle2_var.npy"
                ).astype(np.float64)
                o2_spp = int(np.load(out / f"{name}_oracle2_spp.npy"))
                if o2_mean.shape == o_mean.shape:
                    rec["oracle_two_draws"] = {
                        "spp": [o_spp, o2_spp],
                        "true_null_mean_diff": float((o_mean - o2_mean).mean()),
                    }
                    emp_mean_se = float(
                        abs((o_mean - o2_mean).mean()) / np.sqrt(2.0)
                    )
                    w1, w2 = o_spp, o2_spp
                    o_mean = (w1 * o_mean + w2 * o2_mean) / (w1 + w2)
                    o_var = (w1 * o_var + w2 * o2_var) / (w1 + w2)
                    o_spp = w1 + w2
            t_mean = np.load(tm).astype(np.float64)
            t_var = np.load(out / f"{name}_tpu_proxy_var.npy").astype(np.float64)
            if t_mean.shape != o_mean.shape:
                # One side is stale (e.g. rendered before a proxy-resolution
                # bump): no comparison rather than a wrong one.
                rec["oracle_stale_shapes"] = (
                    f"tpu {t_mean.shape} vs oracle {o_mean.shape}"
                )
                lines.append(rec)
                continue
            diff = t_mean - o_mean
            rmse = float(np.sqrt((diff**2).mean()))
            # Monte-Carlo noise floor of the comparison itself.
            floor_map = np.sqrt(o_var / o_spp + t_var / TPU_PROXY_SPP)
            floor = float(np.sqrt((floor_map**2).mean()))
            z = diff / np.maximum(floor_map, 1e-9)
            pw, ph, pspp = proxy
            rec["oracle_proxy"] = f"{pw}x{ph}"
            rec["oracle_spp"] = o_spp
            rec["tpu_proxy_spp"] = TPU_PROXY_SPP
            rec["converged_rmse"] = rmse
            rec["noise_floor_rmse"] = floor
            rec["rmse_over_floor"] = round(rmse / max(floor, 1e-12), 3)
            rec["frac_z_gt4"] = float((np.abs(z) > 4).mean())
            # Image-wide energy-bias test (see same_seed_mean_shift_z).
            # Denominator: the claimed floor, widened to the empirically
            # measured per-draw image-mean sigma when two independent
            # oracle draws exist (the claimed floor understates it for
            # skewed estimators — see ARCHITECTURE.md).
            mean_se = floor / np.sqrt(diff.size)
            if emp_mean_se is not None:
                rec["oracle_mean_se_claimed"] = float(mean_se)
                rec["oracle_mean_se_empirical"] = emp_mean_se
                mean_se = max(mean_se, emp_mean_se)
            rec["oracle_mean_shift_z"] = round(
                float(diff.mean() / max(mean_se, 1e-12)), 1
            )
            # Equal-footing empirical z (VERDICT r4 item 3). K independent
            # draws per side (tools/rmse_oracle_draws.py /
            # tools/rmse_tpu_draws.py) measure each implementation's TRUE
            # image-mean draw noise: c = Var[draw mean] * spp is exact at
            # any spp (skew breaks Gaussianity, not 1/n variance scaling),
            # so se(side) = sqrt(c_pooled / spp_total) with the image mean
            # pooled over the primary render AND every draw. The claimed
            # variance-map SE underestimates this ~15-20x on firefly
            # scenes, which is what inflated cfg5's z to 17 — the
            # per-pixel maps stay primary-only (floor/frac_z/variance
            # ratio are unchanged); only the image-mean test pools.
            def _pool_side(primary_im, primary_spp, draw_files):
                ims, spps = [primary_im], [float(primary_spp)]
                c_num = c_dof = 0.0
                for f in draw_files:
                    if not f.exists():
                        continue
                    dz = np.load(f)
                    im = dz["means"].astype(np.float64).mean(axis=(1, 2, 3))
                    ch = float(dz["chunk"])
                    if len(im) >= 4:
                        c_num += im.var(ddof=1) * ch * (len(im) - 1)
                        c_dof += len(im) - 1
                    ims.extend(im)
                    spps.extend([ch] * len(im))
                w = np.asarray(spps)
                pooled_im = float((w * np.asarray(ims)).sum() / w.sum())
                c_hat = c_num / c_dof if c_dof else None
                return pooled_im, float(w.sum()), c_hat

            o_im, o_spp_t, c_o = _pool_side(
                float(o_mean.mean()), o_spp,
                [out / f"{name}_oracle_draws.npz",
                 out / f"{name}_oracle_draws_b.npz"],
            )
            t_im, t_spp_t, c_t = _pool_side(
                float(t_mean.mean()), TPU_PROXY_SPP,
                [out / f"{name}_tpu_draws.npz"],
            )
            z_emp = None
            if c_o is not None and c_t is not None:
                se_o = np.sqrt(c_o / o_spp_t)
                se_t = np.sqrt(c_t / t_spp_t)
                z_emp = float(
                    (t_im - o_im) / max(np.sqrt(se_o**2 + se_t**2), 1e-12)
                )
                rec["oracle_emp"] = {
                    "oracle_spp_pooled": o_spp_t,
                    "tpu_spp_pooled": t_spp_t,
                    "se_oracle": float(se_o),
                    "se_tpu": float(se_t),
                    "mean_diff": float(t_im - o_im),
                    "mean_shift_z_emp": round(z_emp, 2),
                }
            # Firefly check: does the device path carry extra variance?
            lum_t = t_var.mean(-1)
            lum_o = o_var.mean(-1)
            rec["variance_ratio_tpu_over_oracle"] = float(
                lum_t.mean() / max(lum_o.mean(), 1e-12)
            )
            # Gate thresholds. The z machinery assumes Gaussian estimator
            # noise; on scenes with mirror-metallic fireflies (rare bright
            # specular paths) the low-spp side's image mean is heavily
            # right-skewed — the typical run undershoots — so |z| of
            # several sigma arises with ZERO true difference. Measured
            # directly by the A/A probe (tools/aa_skew_probe.py: our own
            # implementation on both sides at cfg5's depths reads
            # mean_shift_z 4.2 and +1.7% shift). Where an A/A null
            # distribution has been rendered at a matching reference spp,
            # the gate widens to 1.3x the null's envelope — anything inside
            # it is indistinguishable from the metric's own skew bias.
            z_lim, fr_lim, fz_lim = 6.0, 1.5, 0.005
            # The A/A-null envelope only ever WIDENS these limits (the
            # claimed-SE z statistic is right-skew-biased under the null,
            # so |z| of several sigma can arise with zero true
            # difference). A row that passes the STRICT default limits has
            # passed a sufficient test — the envelope is consulted only as
            # a fallback, so a null rendered at a since-deepened oracle
            # spp can never silently gate a row (VERDICT r4 item 3: no
            # stale nulls in the gate path).
            needs_envelope = not (
                abs(rec["oracle_mean_shift_z"]) < z_lim
                and rec["rmse_over_floor"] < fr_lim
                and rec["frac_z_gt4"] < fz_lim
            )
            nf = out / f"{name}_aa_null.json"
            if nf.exists() and needs_envelope:
                null = json.loads(nf.read_text())
                ratio = null["low_spp"] / max(o_spp, 1)
                if 1 / 1.5 <= ratio <= 1.5:
                    z_lim = max(z_lim, 1.3 * max(
                        abs(z_) for z_ in null["mean_shift_z"]
                    ))
                    fr_lim = max(fr_lim, 1.15 * max(null["rmse_over_floor"]))
                    fz_lim = max(fz_lim, 1.5 * max(null["frac_z_gt4"]))
                    rec["aa_null"] = {
                        "n": null["n"], "low_spp": null["low_spp"],
                        "z_max": max(abs(z_) for z_ in null["mean_shift_z"]),
                        "z_limit": round(z_lim, 1),
                    }
                else:
                    rec["aa_null_stale"] = (
                        f"null at {null['low_spp']} spp vs oracle {o_spp}"
                    )
            # Agreement verdict: means indistinguishable from sampling noise
            # — per-pixel (rmse/floor, z outliers) AND image-wide. The
            # image-wide test is the equal-footing empirical z (< 3) when
            # both sides have measured draw noise; otherwise the claimed-SE
            # z under the A/A-calibrated skew envelope.
            if z_emp is not None:
                mean_test = abs(z_emp) < 3.0
                rec["mean_test"] = "empirical_two_sample"
            else:
                mean_test = abs(rec["oracle_mean_shift_z"]) < z_lim
                rec["mean_test"] = "claimed_se_aa_envelope"
            rec["distribution_agrees"] = bool(
                rec["rmse_over_floor"] < fr_lim
                and rec["frac_z_gt4"] < fz_lim
                and mean_test
            )
        lines.append(rec)

    rp = out / "report.jsonl"
    with open(rp, "w") as f:
        for rec in lines:
            f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
    print(f"\nwrote {rp}")


if __name__ == "__main__":
    main()
