"""Bucket-set assembly + balanced batch sampling for the CGAN family."""

from __future__ import annotations

from glob import glob
from pathlib import Path
from typing import Dict

import numpy as np

NUM_POSTURES = 9


def load_condition_dataset(data_dir: str, condition: str):
    """All 9 posture buckets of one condition, (N,C,T) + posture labels 1..9,
    shuffled; per-posture scaler meta retained for inverse scaling at generation
    (CGAN/cgan.py:115-138)."""
    files = sorted(glob(str(Path(data_dir) / f"posture*_{condition}.npz")))
    if not files:
        raise SystemExit(f"No files found like posture*_{condition}.npz in {data_dir}")
    Xs, ys = [], []
    meta: Dict[int, dict] = {}
    for fp in files:
        z = np.load(fp, allow_pickle=True)
        X = z["X"].astype(np.float32).transpose(0, 2, 1)   # (N, C, T)
        posture = int(z["posture"])
        Xs.append(X)
        ys.append(np.full((X.shape[0],), posture, dtype=np.int64))
        meta[posture] = {"file": fp,
                         "scale_min": z["scale_min"].astype(np.float32),
                         "scale_range": z["scale_range"].astype(np.float32),
                         "ch_names": z["ch_names"], "fs": float(z["fs"])}
    X_all = np.concatenate(Xs, axis=0)
    y_all = np.concatenate(ys, axis=0)
    perm = np.random.permutation(X_all.shape[0])
    return X_all[perm], y_all[perm], meta


def load_posture_both_conditions(data_dir: str, posture: int):
    """Both condition buckets of one posture, labels {0: no_exo, 1: with_exo}
    (cgan_v2.py:81-101)."""
    files = {0: Path(data_dir) / f"posture{posture}_no_exo.npz",
             1: Path(data_dir) / f"posture{posture}_with_exo.npz"}
    Xs, ys = [], []
    meta = {}
    for cond, fp in files.items():
        if not fp.exists():
            raise SystemExit(f"Missing file: {fp}")
        z = np.load(fp, allow_pickle=True)
        X = z["X"].astype(np.float32).transpose(0, 2, 1)
        Xs.append(X)
        ys.append(np.full((X.shape[0],), cond, dtype=np.int64))
        if not meta:
            meta = dict(ch_names=z["ch_names"], fs=float(z["fs"]),
                        scale_min=z["scale_min"].astype(np.float32),
                        scale_range=z["scale_range"].astype(np.float32))
    X = np.concatenate(Xs, 0)
    y = np.concatenate(ys, 0)
    perm = np.random.permutation(len(y))
    return X[perm], y[perm], meta


def build_label_table(y: np.ndarray, num_classes: int, label_base: int = 0):
    """Padded per-class index table for on-device balanced sampling.

    Returns (table (K, max_count) int32 — row k lists indices of class
    label_base+k, wrapped to fill —, counts (K,) int32). Replaces the host-side
    dict of index arrays (cgan.py:140-148) so sampling stays inside jit.
    """
    idx_lists = [np.where(y == label_base + k)[0] for k in range(num_classes)]
    counts = np.array([len(i) for i in idx_lists], dtype=np.int32)
    if (counts == 0).any():
        missing = [label_base + k for k in range(num_classes) if counts[k] == 0]
        raise SystemExit(f"No samples for classes {missing}")
    m = int(counts.max())
    table = np.zeros((num_classes, m), dtype=np.int32)
    for k, il in enumerate(idx_lists):
        table[k, :] = np.resize(il, m)
    return table, counts
