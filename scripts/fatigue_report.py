#!/usr/bin/env python3
"""Mental-fatigue analysis reports over real & synthetic NPZ sets.

Covers the reference's "mental fatigue" script family with subcommands:

- ``bandpower`` (basic_plot.py): per-NPZ Welch PSD mean±SEM figure, band-power
  CSV + figure, cross-file summary CSV.
- ``indices`` (ratio_plot.py): band powers + TBR/TABR/ABR/θα per channel CSVs,
  region-grouped bar figures, frontal-θ/parietal-α workload scalar.
- ``ttest`` (t_test.py .. t_test_v4.py): per-posture 4-group (RN/RW/SN/SW)
  Welch-TBR bars with per-channel Welch t-tests and stars;
  ``--scaling none|p95|median`` selects the v1/v2/v3 display variants and
  ``--export-csv`` adds the v4 stats CSV.
- ``paired`` (timeGAN/mental_fatigue_t_test_v3.py): count-matched paired
  t-tests real-vs-synthetic per condition → plots_tbr/ + CSV.

Layout expected: ``--root`` containing ``real/`` and ``synthetic/`` NPZ dirs
(each file named like posture{p}_{no_exo|with_exo}*.npz).
"""

import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _load(fpath):
    z = np.load(fpath, allow_pickle=True)
    X = z["X"].astype(np.float32)
    fs = float(z["fs"]) if "fs" in z.files else 128.0
    if "ch_names" in z.files:
        ch_names = [str(c) for c in z["ch_names"].tolist()]
    else:
        ch_names = [f"Ch{i+1}" for i in range(X.shape[-1])]
    return X, fs, ch_names


def _iter_npzs(root):
    for subset in ("real", "synthetic"):
        d = Path(root) / subset
        if not d.is_dir():
            continue
        for fp in sorted(d.glob("*.npz")):
            yield subset, fp


def cmd_bandpower(args):
    from eegsynth.analysis.bandpower import band_powers, compute_psd_per_channel
    from eegsynth.analysis.plots import bandpower_bar_plot, psd_mean_plot

    out = Path(args.out)
    summary = []
    for subset, fp in _iter_npzs(args.root):
        X, fs, ch_names = _load(fp)
        od = out / subset
        od.mkdir(parents=True, exist_ok=True)
        f, psd_mean, psd_sem = compute_psd_per_channel(X, fs)
        bp = band_powers(f, psd_mean)
        base = od / fp.stem
        with open(f"{base}_bandpowers.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["channel"] + list(bp.keys()))
            for ci, ch in enumerate(ch_names):
                w.writerow([ch] + [bp[b][ci] for b in bp])
        psd_mean_plot(f, psd_mean, psd_sem, f"{subset} | {fp.name} | Mean PSD",
                      f"{base}_PSD_mean.png")
        bandpower_bar_plot(bp, ch_names, f"{subset} | {fp.name} | Band powers",
                           f"{base}_bandpowers.png")
        summary.append({"subset": subset, "file": fp.name, "fs": fs,
                        "n_epochs": X.shape[0],
                        **{f"mean_{b}": float(np.mean(v)) for b, v in bp.items()}})
        print(f"[bandpower] {subset}/{fp.name}")
    if summary:
        with open(out / "bandpower_summary.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(summary[0].keys()))
            w.writeheader()
            w.writerows(summary)


def cmd_indices(args):
    from eegsynth.analysis.bandpower import band_powers, compute_psd_per_channel
    from eegsynth.analysis.fatigue import fatigue_indices, global_indices, workload_ratio
    from eegsynth.analysis.plots import grouped_bar_plot, psd_mean_plot, scalar_bar

    out = Path(args.out)
    for subset, fp in _iter_npzs(args.root):
        X, fs, ch_names = _load(fp)
        od = out / subset
        od.mkdir(parents=True, exist_ok=True)
        f, psd_mean, psd_sem = compute_psd_per_channel(X, fs)
        bp = band_powers(f, psd_mean)
        idx = fatigue_indices(bp)
        wl = workload_ratio(bp, ch_names)
        base = od / fp.stem

        with open(f"{base}_bandpowers.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["channel"] + list(bp.keys()))
            for ci, ch in enumerate(ch_names):
                w.writerow([ch] + [bp[b][ci] for b in bp])
        with open(f"{base}_indices_per_channel.csv", "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["channel"] + list(idx.keys()))
            for ci, ch in enumerate(ch_names):
                w.writerow([ch] + [idx[k][ci] for k in idx])
        summary = {"file": fp.name, "fs": fs, "n_epochs": X.shape[0],
                   "n_samples_per_epoch": X.shape[1], "n_channels": X.shape[2],
                   "Workload (thetaF/alphaPO)": wl, **global_indices(bp)}
        with open(f"{base}_indices_summary.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(summary.keys()))
            w.writeheader()
            w.writerow(summary)

        psd_mean_plot(f, psd_mean, psd_sem,
                      f"{subset.capitalize()} | {fp.name} | Mean PSD",
                      f"{base}_PSD_mean.png")
        grouped_bar_plot(ch_names, idx["TABR ((Theta+Alpha)/Beta)"],
                         "TABR ((Theta+Alpha)/Beta)",
                         f"{subset.capitalize()} | {fp.name} | Mental Fatigue (TABR)",
                         f"{base}_MF_TABR.png")
        grouped_bar_plot(ch_names, idx["TBR (Theta/Beta)"], "TBR (Theta/Beta)",
                         f"{subset.capitalize()} | {fp.name} | TBR", f"{base}_TBR.png")
        grouped_bar_plot(ch_names, idx["ABR (Alpha/Beta)"], "ABR (Alpha/Beta)",
                         f"{subset.capitalize()} | {fp.name} | ABR", f"{base}_ABR.png")
        grouped_bar_plot(ch_names, idx["Theta/Alpha"], "Theta/Alpha",
                         f"{subset.capitalize()} | {fp.name} | Theta/Alpha",
                         f"{base}_ThetaAlpha.png")
        grouped_bar_plot(ch_names, bp["Alpha"], "Alpha Power (integrated PSD)",
                         f"{subset.capitalize()} | {fp.name} | Alpha power (context)",
                         f"{base}_Alpha.png")
        scalar_bar(wl, "θf/αp",
                   f"{subset.capitalize()} | {fp.name} | Workload (Frontal θ / ParOcc α)",
                   f"{base}_Workload_thetaF_over_alphaPO.png")
        print(f"[indices] {subset}/{fp.name} workload={wl:.4f}")


def cmd_ttest(args):
    from eegsynth.analysis.fatigue import tbr_matrix
    from eegsynth.analysis.ttests import four_group_report, scan_files

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    buckets = scan_files(args.root)
    if not buckets:
        raise SystemExit(f"No posture NPZs under {args.root}/(real|synthetic)")
    for posture in sorted(buckets):
        groups = {}
        ch_names = None
        for code, paths in buckets[posture].items():
            mats = []
            for fp in paths:
                X, fs, ch = _load(fp)
                ch_names = ch_names or ch
                mats.append(tbr_matrix(X, fs))
            groups[code] = np.concatenate(mats, 0) if mats else None
        if ch_names is None:
            continue
        export = (out / f"posture{posture}_stats.csv") if args.export_csv else None
        four_group_report(groups, ch_names, posture,
                          out / f"posture{posture}_tbr_4group.png",
                          scaling=args.scaling, export_csv=export)
        print(f"[ttest] posture {posture} → {out}/posture{posture}_tbr_4group.png")


def cmd_paired(args):
    from eegsynth.analysis.fatigue import tbr_matrix
    from eegsynth.analysis.ttests import paired_ttest_real_vs_fake, scan_files

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    buckets = scan_files(args.root)
    rows = []
    for posture in sorted(buckets):
        for cond, (rcode, scode) in (("no_exo", ("RN", "SN")),
                                     ("with_exo", ("RW", "SW"))):
            rp, sp = buckets[posture][rcode], buckets[posture][scode]
            if not rp or not sp:
                continue
            Xr, fs, ch_names = _load(rp[0])
            Xs, _, _ = _load(sp[0])
            tr, ts = tbr_matrix(Xr, fs), tbr_matrix(Xs, fs)
            t, p = paired_ttest_real_vs_fake(tr, ts)
            for ci, ch in enumerate(ch_names):
                rows.append({"posture": posture, "condition": cond, "channel": ch,
                             "t": t[ci], "p": p[ci],
                             "mean_real": float(np.nanmean(tr[:, ci])),
                             "mean_synth": float(np.nanmean(ts[:, ci]))})
            print(f"[paired] posture {posture} {cond}: "
                  f"{np.sum(p < 0.05)}/{len(ch_names)} channels p<0.05")
    if rows:
        with open(out / "paired_ttests.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)


def cmd_participants(args):
    """Participant-paired pipeline from raw trial CSVs + synthetic runs
    (timeGAN/mental_fatigue_t_test.py / _v2)."""
    from eegsynth import EPOC_CHANNELS
    from eegsynth.analysis.participant_fatigue import (
        aggregate_fake, aggregate_real, collect_real,
    )
    from eegsynth.analysis.ttests import sig_stars

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    per_part = collect_real(Path(args.data_root))
    r_means, r_sds, r_pvals, counts = aggregate_real(per_part)
    s_means, s_sds, s_pvals = aggregate_fake(args.synth_dir, args.real_dir,
                                             inverse_scale=args.inverse_scale,
                                             real_counts=counts)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    for p in range(1, 10):
        # a posture counts as present if EITHER condition has finite means on
        # either side (a with_exo-only posture must still be plotted)
        have_real = any(np.isfinite(r_means[p][c]).any()
                        for c in ("no_exo", "with_exo"))
        have_syn = any(np.isfinite(s_means[p][c]).any()
                       for c in ("no_exo", "with_exo"))
        if not (have_real or have_syn):
            continue
        C = len(EPOC_CHANNELS)
        x = np.arange(C)
        width = 0.2
        plt.figure(figsize=(14, 6))
        bars = (("RN", r_means[p]["no_exo"], r_sds[p]["no_exo"]),
                ("RW", r_means[p]["with_exo"], r_sds[p]["with_exo"]),
                ("SN", s_means[p]["no_exo"], s_sds[p]["no_exo"]),
                ("SW", s_means[p]["with_exo"], s_sds[p]["with_exo"]))
        for gi, (g, mu, sd) in enumerate(bars):
            plt.bar(x + (gi - 1.5) * width, np.nan_to_num(mu), width,
                    yerr=np.nan_to_num(sd), capsize=2, label=g)
        finite = [np.nanmax(mu) for _, mu, _ in bars if np.isfinite(mu).any()]
        ymax = max(finite) if finite else 1.0
        for ci in range(C):
            sr, ss = sig_stars(r_pvals[p][ci]), sig_stars(s_pvals[p][ci])
            if sr:
                plt.text(ci - width, ymax * 1.02, sr, ha="center", fontsize=9)
            if ss:
                plt.text(ci + width, ymax * 1.02, ss, ha="center", fontsize=9,
                         color="C3")
        plt.xticks(x, EPOC_CHANNELS, rotation=45, ha="right")
        plt.ylabel("TBR (Theta/Beta)")
        plt.title(f"Posture {p}: participant-paired TBR "
                  f"(paired n={counts[p]['paired']})")
        plt.legend()
        plt.tight_layout()
        plt.savefig(out / f"posture{p}_participant_tbr.png", dpi=200)
        plt.close()
        for ci, ch in enumerate(EPOC_CHANNELS):
            rows.append({"posture": p, "channel": ch,
                         "real_no_exo": r_means[p]["no_exo"][ci],
                         "real_with_exo": r_means[p]["with_exo"][ci],
                         "synth_no_exo": s_means[p]["no_exo"][ci],
                         "synth_with_exo": s_means[p]["with_exo"][ci],
                         "p_real_paired": r_pvals[p][ci],
                         "p_synth_paired": s_pvals[p][ci],
                         "n_paired_participants": counts[p]["paired"]})
        print(f"[participants] posture {p}: paired n={counts[p]['paired']}")
    if rows:
        with open(out / "participant_ttests.csv", "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("participants")
    p.add_argument("--data-root", type=str, required=True,
                   help="raw CSV tree containing protocol_outputs_*")
    p.add_argument("--synth-dir", type=str, required=True,
                   help="timegan_runs root with posture*_*/synthetic.npz")
    p.add_argument("--real-dir", type=str, default=None,
                   help="preprocessed NPZs (for v2 inverse scaling / remap)")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--inverse-scale", action="store_true",
                   help="v2: invert min-max scaling + clamp to real range")
    p.set_defaults(fn=cmd_participants)
    for name, fn in (("bandpower", cmd_bandpower), ("indices", cmd_indices),
                     ("ttest", cmd_ttest), ("paired", cmd_paired)):
        p = sub.add_parser(name)
        p.add_argument("--root", type=str, required=True,
                       help="dir containing real/ and synthetic/ NPZ sets")
        p.add_argument("--out", type=str, required=True)
        if name == "ttest":
            p.add_argument("--scaling", type=str, default="none",
                           choices=["none", "p95", "median"])
            p.add_argument("--export-csv", action="store_true")
        p.set_defaults(fn=fn)
    args = ap.parse_args()

    # Analysis is a float64 host batch job (scipy-parity p-values); f64 is
    # emulated and slow on TPU. Pin jax_platforms BEFORE backend init:
    # jax.devices("cpu") alone still initializes every registered platform,
    # which would attach the remote TPU tunnel (single-tenant) for no reason.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    with jax.default_device(jax.devices("cpu")[0]):
        args.fn(args)


if __name__ == "__main__":
    main()
