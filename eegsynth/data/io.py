"""NPZ bucket contracts — byte-compatible with the reference pipeline.

A "bucket" is one (posture, condition) NPZ with keys (pre-processing.py:213-225):
``X`` (N, T, C) float32 in [0,1], ``participant``/``trial`` int32 per window,
``posture`` int32, ``condition`` str, ``fs`` float32, ``ch_names`` object array,
``scale_min``/``scale_range`` float32 (C,), ``epoch_len_samples`` int32.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np


@dataclasses.dataclass
class Bucket:
    X: np.ndarray                      # (N, T, C) float32 scaled to [0, 1]
    participant: np.ndarray            # (N,) int32
    trial: np.ndarray                  # (N,) int32
    posture: int
    condition: str
    fs: float
    ch_names: list[str]
    scale_min: np.ndarray              # (C,) float32
    scale_range: np.ndarray            # (C,) float32
    epoch_len_samples: int

    @property
    def shape(self):
        return self.X.shape


def save_bucket(path: Path | str, bucket: Bucket) -> None:
    np.savez_compressed(
        path,
        X=bucket.X.astype(np.float32),
        participant=bucket.participant.astype(np.int32),
        trial=bucket.trial.astype(np.int32),
        posture=np.int32(bucket.posture),
        condition=str(bucket.condition),
        fs=np.float32(bucket.fs),
        ch_names=np.array(bucket.ch_names, dtype=object),
        scale_min=bucket.scale_min.astype(np.float32),
        scale_range=bucket.scale_range.astype(np.float32),
        epoch_len_samples=np.int32(bucket.epoch_len_samples),
    )


def load_bucket(path: Path | str) -> Bucket:
    data = np.load(path, allow_pickle=True)
    X = data["X"].astype(np.float32)
    N = X.shape[0]

    def opt(key, default):
        return data[key] if key in data.files else default

    return Bucket(
        X=X,
        participant=np.asarray(opt("participant", np.full(N, -1)), dtype=np.int32),
        trial=np.asarray(opt("trial", np.full(N, -1)), dtype=np.int32),
        posture=int(opt("posture", -1)),
        condition=str(opt("condition", "")),
        fs=float(opt("fs", 128.0)),
        ch_names=[str(c) for c in opt("ch_names", [])],
        scale_min=np.asarray(opt("scale_min", np.zeros(X.shape[-1])), dtype=np.float32),
        scale_range=np.asarray(opt("scale_range", np.ones(X.shape[-1])), dtype=np.float32),
        epoch_len_samples=int(opt("epoch_len_samples", X.shape[1])),
    )


def load_X(path: Path | str) -> np.ndarray:
    """Just the windows array (synthetic NPZs carry only ``X``,
    train_timegan.py:420)."""
    return np.load(path)["X"].astype(np.float32)


def write_prep_index(out_dir: Path | str, rows: list[dict]) -> Path:
    """prep_index.csv with the reference's column set (pre-processing.py:228-236)."""
    import csv

    out = Path(out_dir) / "prep_index.csv"
    cols = ["posture", "condition", "n_epochs", "seq_len", "n_channels", "fs_hz", "file"]
    rows = sorted(rows, key=lambda r: (r["posture"], r["condition"]))
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)
    return out


def bucket_paths(data_dir: Path | str):
    """Sorted posture*_*.npz bucket files (train_timegan.py:464)."""
    return sorted(Path(data_dir).glob("posture*_*.npz"))
