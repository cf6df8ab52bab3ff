"""Analysis figure helpers (region-grouped bars, PSD ribbons, scalar bars).

Parity: mental fatigue/ratio_plot.py:170-199 grouped_bar_plot /
scalar_bar and basic_plot.py PSD mean±SEM figures.
"""

from __future__ import annotations

import numpy as np

from eegsynth.analysis.bandpower import order_channels_grouped


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def grouped_bar_plot(ch_names, values, y_label, title, out_path):
    plt = _plt()
    ordered_names, idxs, boundaries = order_channels_grouped(list(ch_names))
    vals = [values[i] for i in idxs]
    x = np.arange(len(ordered_names))
    plt.figure(figsize=(12, 6))
    plt.bar(x, vals)
    plt.xticks(x, ordered_names, rotation=45, ha="right")
    plt.ylabel(y_label)
    plt.title(title)
    ymax = max(vals) if len(vals) else 1.0
    for region, start, end in boundaries:
        if start > 0:
            plt.axvline(start - 0.5, linestyle="--", alpha=0.5)
        plt.text((start + end - 1) / 2.0, ymax * 1.05, region,
                 ha="center", va="bottom", fontsize=10)
    plt.tight_layout()
    plt.savefig(out_path, dpi=200)
    plt.close()


def scalar_bar(value, label, title, out_path):
    plt = _plt()
    plt.figure(figsize=(5, 5))
    plt.bar([label], [value])
    plt.ylabel(label)
    plt.title(title)
    plt.tight_layout()
    plt.savefig(out_path, dpi=200)
    plt.close()


def psd_mean_plot(f, psd_mean, psd_sem, title, out_path):
    """Channel-mean PSD with ±SEM ribbon (ratio_plot.py:286-294)."""
    plt = _plt()
    ch_mean = psd_mean.mean(axis=0)
    ch_sem = psd_sem.mean(axis=0)
    plt.figure(figsize=(8, 5))
    plt.plot(f, ch_mean, label="Mean PSD (across channels)")
    plt.fill_between(f, ch_mean - ch_sem, ch_mean + ch_sem, alpha=0.3)
    plt.xlabel("Frequency (Hz)")
    plt.ylabel("PSD")
    plt.title(title)
    plt.tight_layout()
    plt.savefig(out_path, dpi=200)
    plt.close()


def bandpower_bar_plot(bp: dict, ch_names, title, out_path):
    """Per-band grouped bars (basic_plot.py bandpower figure)."""
    plt = _plt()
    bands = list(bp.keys())
    C = len(ch_names)
    x = np.arange(C)
    width = 0.8 / len(bands)
    plt.figure(figsize=(14, 6))
    for bi, band in enumerate(bands):
        plt.bar(x + (bi - len(bands) / 2 + 0.5) * width, bp[band], width, label=band)
    plt.xticks(x, ch_names, rotation=45, ha="right")
    plt.ylabel("Band power (trapezoid PSD)")
    plt.title(title)
    plt.legend()
    plt.tight_layout()
    plt.savefig(out_path, dpi=200)
    plt.close()
