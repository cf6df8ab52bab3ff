#!/usr/bin/env python3
"""Preprocess Emotiv EPOC+ EEG CSVs into fixed-length 6 s epochs per
posture×condition — CLI parity with timeGAN/pre-processing.py:25-41."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--root", type=str, default="./6s_window",
                    help="Folder containing protocol_outputs_{1..4}")
    ap.add_argument("--out", type=str, default="./preprocessed")
    ap.add_argument("--fs", type=float, default=128.0,
                    help="Fallback sampling rate for filtering (Hz)")
    ap.add_argument("--epoch_sec", type=float, default=6.0)
    ap.add_argument("--overlap", type=float, default=0.0)
    ap.add_argument("--low_cut", type=float, default=1.0)
    ap.add_argument("--high_cut", type=float, default=45.0)
    ap.add_argument("--notch_q", type=float, default=30.0)
    ap.add_argument("--min_channels", type=int, default=10)
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--epoch_fs_target", type=float, default=128.0,
                    help="Target Hz used to compute the fixed epoch length")
    args = ap.parse_args()

    import jax
    # CPU-only f64 job: pin platforms before backend init so the remote TPU
    # tunnel (single-tenant) is never attached.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)  # float64 host-side filtering
    cpu = jax.devices("cpu")[0]

    from eegsynth.data.preprocess import run_preprocess
    with jax.default_device(cpu):
        run_preprocess(args.root, args.out, fs=args.fs, epoch_sec=args.epoch_sec,
                       overlap=args.overlap, low_cut=args.low_cut,
                       high_cut=args.high_cut, notch_q=args.notch_q,
                       min_channels=args.min_channels,
                       epoch_fs_target=args.epoch_fs_target, dry_run=args.dry_run)


if __name__ == "__main__":
    main()
