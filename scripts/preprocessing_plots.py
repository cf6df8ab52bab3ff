#!/usr/bin/env python3
"""Per-stage preprocessing figures for one raw CSV — timeGAN/preprocessing_plots.py
capability as a proper CLI (the reference is edit-the-constants).

Stages: raw → notch → band-pass 1–45 → resample 128 Hz → Hampel → 6 s epoch →
band powers; plus the labeling visuals (timeline / tracks / epoch grid / card).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--csv", type=str, required=True, help="one raw trial CSV")
    ap.add_argument("--out", type=str, default="./prep_stage_plots")
    ap.add_argument("--channel", type=int, default=0)
    ap.add_argument("--fs", type=float, default=128.0, help="fallback fs")
    ap.add_argument("--low_cut", type=float, default=1.0)
    ap.add_argument("--high_cut", type=float, default=45.0)
    ap.add_argument("--target_fs", type=float, default=128.0)
    ap.add_argument("--epoch_sec", type=float, default=6.0)
    args = ap.parse_args()

    import jax
    # CPU-only f64 job: pin platforms before backend init so the remote TPU
    # tunnel (single-tenant) is never attached.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]

    import pandas as pd
    from scipy.signal import resample

    from eegsynth.data.filters import design_filters, detect_line_freq, estimate_fs
    from eegsynth.data.preprocess import find_time_col, match_epoc_columns
    from eegsynth.ops.filtering import filtfilt
    from eegsynth.viz.prep_stages import (
        hampel, label_figures, make_default_btr_segments,
        parse_labels_from_filename, plot_bandpowers, plot_psd, plot_signal,
        plot_spectrogram,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    df = pd.read_csv(args.csv, engine="python")
    ch_cols = match_epoc_columns(list(df.columns))
    if not ch_cols:
        raise SystemExit("No EPOC+ EEG columns found.")
    ch_name = ch_cols[args.channel]
    time_col = find_time_col(list(df.columns))
    fs = (estimate_fs(pd.to_numeric(df[time_col], errors="coerce").dropna().values,
                      args.fs) if time_col else args.fs)
    sig_raw = df[ch_cols].apply(pd.to_numeric, errors="coerce").values[:, args.channel]
    sig_raw = np.nan_to_num(sig_raw.astype(np.float64))
    meta = parse_labels_from_filename(args.csv)

    with jax.default_device(cpu):
        plot_signal(sig_raw, fs, f"Raw – {ch_name}", out / "1_raw_signal.png")
        plot_spectrogram(sig_raw, fs, "Raw Spectrogram", out / "1_raw_spec.png")

        notch_hz = detect_line_freq(sig_raw, fs)
        (b_bp, a_bp), (b_n, a_n) = design_filters(fs, args.low_cut, args.high_cut,
                                                  notch_hz, 30.0)
        sig_notch = np.asarray(filtfilt(b_n, a_n, sig_raw))
        plot_signal(sig_notch, fs, f"After Notch ({int(notch_hz)} Hz) – {ch_name}",
                    out / "2_notch_signal.png")
        plot_spectrogram(sig_notch, fs, "Notched Spectrogram", out / "2_notch_spec.png")
        plot_psd(sig_notch, fs, "PSD After Notch", out / "2_notch_psd.png")

        sig_bp = np.asarray(filtfilt(b_bp, a_bp, sig_notch))
        plot_signal(sig_bp, fs, "After Bandpass (1–45 Hz)", out / "3_bandpass_signal.png")
        plot_spectrogram(sig_bp, fs, "Bandpass Spectrogram", out / "3_bandpass_spec.png")
        plot_psd(sig_bp, fs, "PSD After Bandpass", out / "3_bandpass_psd.png")

        n_rs = int(round(len(sig_bp) * args.target_fs / fs))
        sig_rs = resample(sig_bp, n_rs)
        plot_signal(sig_rs, args.target_fs, "After Resampling (128 Hz)",
                    out / "4_resampled_signal.png")
        plot_spectrogram(sig_rs, args.target_fs, "Resampled Spectrogram",
                         out / "4_resampled_spec.png")
        plot_psd(sig_rs, args.target_fs, "PSD After Resampling",
                 out / "4_resampled_psd.png")

        sig_art = hampel(sig_rs, k=11, t0=5.0)
        plot_signal(sig_art, args.target_fs, "After Artifact (Hampel)",
                    out / "5_artifact_signal.png")
        plot_spectrogram(sig_art, args.target_fs, "Artifact-attenuated Spectrogram",
                         out / "5_artifact_spec.png")
        plot_psd(sig_art, args.target_fs, "PSD After Artifact",
                 out / "5_artifact_psd.png")

        ep_len = int(args.epoch_sec * args.target_fs)
        if len(sig_art) < ep_len:
            raise SystemExit("Not enough samples for a 6 s epoch.")
        sig_ep = sig_art[:ep_len]
        plot_signal(sig_ep, args.target_fs, "Epoch (6 s)", out / "6_epoch_signal.png")
        plot_spectrogram(sig_ep, args.target_fs, "Epoch Spectrogram",
                         out / "6_epoch_spec.png")
        plot_psd(sig_ep, args.target_fs, "PSD (Epoch)", out / "6_epoch_psd.png")

        plot_bandpowers(sig_ep, args.target_fs, "Band Powers (Epoch)",
                        out / "7_features_bandpower.png")
        plot_spectrogram(sig_ep, args.target_fs, "Features Stage Spectrogram",
                         out / "7_features_spec.png")

        segments = make_default_btr_segments(len(sig_raw) / fs)
        label_figures(sig_raw, fs, meta, segments, out, epoch_sec=args.epoch_sec,
                      target_fs=args.target_fs, n_resampled=len(sig_rs))
    print("All figures (including labeling) saved to", out)


if __name__ == "__main__":
    main()
