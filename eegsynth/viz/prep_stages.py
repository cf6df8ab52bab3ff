"""Preprocessing-stage and labeling figures.

Rebuild of timeGAN/preprocessing_plots.py: per-stage (raw → notch → band-pass →
resample 128 Hz → Hampel artifact filter → 6 s epoch → band powers) signal /
spectrogram / PSD figures for one channel, plus the labeling visuals (timeline
with baseline/task/recovery bands, label tracks, epoch grid, label card) from
filename metadata and an optional marker column.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def hampel(x: np.ndarray, k: int = 11, t0: float = 5.0) -> np.ndarray:
    """Sliding-median/MAD outlier replacement (preprocessing_plots.py:80-86),
    vectorized via a strided window view instead of the per-sample loop."""
    n = len(x)
    # NaN-pad + nanmedian reproduces the reference's TRUNCATED windows at the
    # boundaries (x[max(i-k,0):min(i+k+1,n)]) — edge-replication would compute
    # different med/MAD for the first/last k samples
    pad = np.pad(x.astype(np.float64), (k, k), mode="constant",
                 constant_values=np.nan)
    win = np.lib.stride_tricks.sliding_window_view(pad, 2 * k + 1)  # (n, 2k+1)
    med = np.nanmedian(win, axis=1)
    mad = np.nanmedian(np.abs(win - med[:, None]), axis=1)
    mad = np.where(mad == 0, 1e-6, mad)
    out = x.copy()
    bad = np.abs(x - med) > t0 * 1.4826 * mad
    out[bad] = med[bad]
    return out


def parse_labels_from_filename(path) -> dict:
    """Posture / task / condition / state / trial from the long Emotiv export
    name (preprocessing_plots.py:117-142)."""
    name = Path(path).stem.lower()
    m = re.search(r"posture[-_\s]*([0-9]+)", name)
    posture = f"Posture {m.group(1)}" if m else "Posture ?"
    cond = ("with exo" if "with exo" in name or "withexo" in name
            else ("no exo" if "no exo" in name or "noexo" in name else "?"))
    m = re.search(r"trial[-_\s]*([0-9]+)", name)
    trial = f"Trial {m.group(1)}" if m else "Trial ?"
    state = ("fatigue" if "fatigue" in name
             else ("stress" if "stress" in name
                   else ("cognitive load" if "cognitive load" in name
                         or "cognitiveload" in name else "?")))
    # task: keyword scan over dash-separated chunks (preprocessing_plots.py
    # :131-141) — a blind positional token would grab the trial number
    task = "?"
    for b in Path(path).stem.replace("_", " ").split("-"):
        if any(k in b.lower() for k in ("lifting", "overhead", "squat",
                                        "kneel", "reach", "twist", "walk",
                                        "standing")):
            task = b.strip()
            break
    return {"posture": posture, "condition": cond, "trial": trial,
            "state": state, "task": task}


def plot_signal(x, fs, title, out_fp):
    plt = _plt()
    t = np.arange(len(x)) / fs
    plt.figure(figsize=(10, 3))
    plt.plot(t, x)
    plt.xlabel("Time (s)")
    plt.ylabel("Amplitude")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(out_fp, dpi=200)
    plt.close()


def plot_spectrogram(x, fs, title, out_fp):
    plt = _plt()
    from scipy.signal import spectrogram as sspec
    f, t, S = sspec(x, fs=fs, nperseg=min(256, max(16, len(x) // 8)))
    plt.figure(figsize=(10, 3))
    plt.pcolormesh(t, f, 10 * np.log10(S + 1e-12), shading="gouraud")
    plt.ylabel("Hz")
    plt.xlabel("Time (s)")
    plt.title(title)
    plt.colorbar(label="dB")
    plt.tight_layout()
    plt.savefig(out_fp, dpi=200)
    plt.close()


def plot_psd(x, fs, title, out_fp):
    plt = _plt()
    from eegsynth.ops.spectral import welch_psd
    f, p = welch_psd(np.asarray(x, np.float64), fs=fs,
                     nperseg=min(int(fs * 2), len(x)))
    plt.figure(figsize=(8, 3))
    plt.semilogy(np.asarray(f), np.asarray(p))
    plt.xlabel("Frequency (Hz)")
    plt.ylabel("PSD")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(out_fp, dpi=200)
    plt.close()


def plot_bandpowers(x, fs, title, out_fp):
    plt = _plt()
    from eegsynth.analysis.bandpower import BANDS
    from eegsynth.ops.spectral import welch_psd, trapezoid
    f, p = welch_psd(np.asarray(x, np.float64), fs=fs,
                     nperseg=min(int(fs), len(x)))
    f, p = np.asarray(f), np.asarray(p)
    powers = []
    for name, (lo, hi) in BANDS.items():
        m = (f >= lo) & (f <= hi)
        powers.append(float(trapezoid(p[m], f[m])) if m.any() else 0.0)
    plt.figure(figsize=(6, 4))
    plt.bar(list(BANDS.keys()), powers)
    plt.ylabel("Band power")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(out_fp, dpi=200)
    plt.close()


def make_default_btr_segments(total_sec: float):
    """Illustrative 30% baseline / 50% task / 20% recovery split when no
    markers exist (preprocessing_plots.py:163-166)."""
    b, t = total_sec * 0.30, total_sec * 0.50
    return [(0.0, b, "baseline"), (b, b + t, "task"),
            (b + t, total_sec, "recovery")]


LABEL_COLORS = {"baseline": "#4caf50", "task": "#2196f3", "recovery": "#ff9800",
                "with exo": "#6a1b9a", "no exo": "#00897b"}


def label_figures(sig_raw, fs, meta, segments, out_dir, epoch_sec=6.0,
                  target_fs=128.0, n_resampled=None):
    """Timeline / tracks / epoch-grid / label-card figures
    (preprocessing_plots.py:232-309)."""
    plt = _plt()
    from matplotlib.patches import Rectangle

    out_dir = Path(out_dir)
    colors = LABEL_COLORS

    t = np.arange(len(sig_raw)) / fs
    fig, ax = plt.subplots(figsize=(12, 3))
    for (t0, t1, lab) in segments:
        ax.axvspan(t0, t1, color=colors.get(lab, "#cccccc"), alpha=0.35)
    ax.plot(t, (sig_raw - np.median(sig_raw)) / (np.std(sig_raw) + 1e-6),
            lw=0.8, color="k")
    ax.set_xlabel("Time (s)")
    ax.set_title("Labels Timeline (Baseline/Task/Recovery)")
    handles = [Rectangle((0, 0), 1, 1, color=colors[k], alpha=0.35)
               for k in ("baseline", "task", "recovery")]
    ax.legend(handles, ["Baseline", "Task", "Recovery"], loc="upper right",
              frameon=False)
    plt.tight_layout()
    plt.savefig(out_dir / "8_labels_timeline.png", dpi=200)
    plt.close()

    end = segments[-1][1]
    fig, ax = plt.subplots(figsize=(12, 2.8))
    ax.set_xlim(0, end)
    ax.set_ylim(0, 3)
    ax.set_yticks([0.5, 1.5, 2.5])
    ax.set_yticklabels(["Posture", "Condition", "State"])
    ax.add_patch(Rectangle((0, 0.1), end, 0.8, color="#9e9e9e", alpha=0.35))
    ax.text(0.2, 0.5, meta["posture"], va="center", ha="left")
    ax.add_patch(Rectangle((0, 1.1), end, 0.8,
                           color=colors.get(meta["condition"], "#cccccc"), alpha=0.35))
    ax.text(0.2, 1.5, meta["condition"], va="center", ha="left")
    for (t0, t1, lab) in segments:
        ax.add_patch(Rectangle((t0, 2.1), t1 - t0, 0.8,
                               color=colors.get(lab, "#cccccc"), alpha=0.35))
        ax.text((t0 + t1) / 2, 2.5, lab, va="center", ha="center", fontsize=9)
    ax.set_xlabel("Time (s)")
    plt.tight_layout()
    plt.savefig(out_dir / "8_labels_tracks.png", dpi=200)
    plt.close()

    if n_resampled is not None:
        total_sec_rs = n_resampled / target_fs
        n_ep = max(1, int(np.floor(total_sec_rs / epoch_sec)))

        def state_at(tsec):
            for (a, b, s) in segments:
                if a <= tsec < b:
                    return s
            return segments[-1][2]

        states = [state_at(i * epoch_sec) for i in range(n_ep)]
        fig, ax = plt.subplots(figsize=(max(6, n_ep * 0.6), 1.8))
        for i, s in enumerate(states):
            ax.add_patch(Rectangle((i, 0), 1, 1, color=colors.get(s, "#cccccc"),
                                   alpha=0.8, lw=0))
            ax.text(i + 0.5, 0.5, f"E{i+1}", ha="center", va="center",
                    fontsize=8, color="k")
        ax.set_xlim(0, n_ep)
        ax.set_ylim(0, 1)
        ax.set_yticks([])
        ax.set_xticks(np.arange(n_ep) + 0.5)
        ax.set_xticklabels(states, rotation=45, ha="right", fontsize=8)
        ax.set_title("Epoch Grid (6 s each) – State per Epoch")
        plt.tight_layout()
        plt.savefig(out_dir / "8_labels_epoch_grid.png", dpi=200)
        plt.close()

    fig, ax = plt.subplots(figsize=(4.2, 2.8))
    ax.axis("off")
    txt = (f"{meta['posture']}\nTask: {meta['task']}\n"
           f"Condition: {meta['condition']}\nState (from name): {meta['state']}\n"
           f"{meta['trial']}")
    ax.text(0.02, 0.95, "LABEL CARD", fontsize=11, weight="bold", va="top")
    ax.text(0.02, 0.85, txt, fontsize=10, va="top")
    plt.tight_layout()
    plt.savefig(out_dir / "8_labels_card.png", dpi=200)
    plt.close()
