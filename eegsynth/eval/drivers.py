"""Evaluation drivers: pair loading, per-group + global metric CSVs, PCA/t-SNE.

Artifact contract parity:
- timeGAN/evaluation.py → metrics_per_posture.csv, metrics_global.csv,
  pca_global.png, tsne_global.png (per-posture pairs merge both conditions).
- timeGAN/evaluate_18.py → metrics_per_posture_condition.csv + the same global
  set, with synthetic-file preference synthetic_long.npz → synthetic.npz →
  first *.npz and a --tsne_max stratified subsample.
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

from eegsynth.eval.classifiers import (
    discriminative_score, discriminative_scores_batch, predictive_score,
    predictive_scores_batch,
)
from eegsynth.eval.stats import statistical_similarity

METRIC_COLS = ["disc_acc", "disc_auc", "rmse_tstr", "r2_tstr", "rmse_trts",
               "r2_trts", "psd_diff", "acf_diff", "coh_diff",
               "n_real", "n_fake", "seq_len", "n_ch"]


def find_synth_npz(run_dir: Path) -> Path | None:
    """synthetic_long.npz → synthetic.npz → first *.npz (evaluate_18.py:148-156)."""
    for name in ("synthetic_long.npz", "synthetic.npz"):
        c = run_dir / name
        if c.exists():
            return c
    all_npz = sorted(run_dir.glob("*.npz"))
    return all_npz[0] if all_npz else None


def load_posture_pairs(real_dir: Path, synth_dir: Path) -> dict:
    """posture → (real, fake), conditions concatenated and count-balanced per
    condition (evaluation.py:137-161)."""
    pairs = {}
    for p in range(1, 10):
        real_list, fake_list = [], []
        for cond in ("with_exo", "no_exo"):
            rfp = Path(real_dir) / f"posture{p}_{cond}.npz"
            sfp = Path(synth_dir) / f"posture{p}_{cond}" / "synthetic.npz"
            if rfp.exists() and sfp.exists():
                r = np.load(rfp)["X"].astype(np.float32)
                f = np.load(sfp)["X"].astype(np.float32)
                m = min(len(r), len(f))
                if m > 0:
                    real_list.append(r[:m])
                    fake_list.append(f[:m])
        if real_list and fake_list:
            pairs[p] = (np.concatenate(real_list), np.concatenate(fake_list))
    return pairs


def load_pairs_by_condition(real_dir: Path, synth_dir: Path) -> dict:
    """(posture, cond) → (real, fake) truncated to min N (evaluate_18.py:158-175)."""
    pairs = {}
    for p in range(1, 10):
        for cond in ("with_exo", "no_exo"):
            rfp = Path(real_dir) / f"posture{p}_{cond}.npz"
            sfp = find_synth_npz(Path(synth_dir) / f"posture{p}_{cond}")
            if rfp.exists() and sfp and sfp.exists():
                r = np.load(rfp)["X"].astype(np.float32)
                f = np.load(sfp)["X"].astype(np.float32)
                m = min(len(r), len(f))
                if m > 0:
                    pairs[(p, cond)] = (r[:m], f[:m])
    return pairs


def _metric_dict(real: np.ndarray, fake: np.ndarray, disc: tuple,
                 tstr: tuple, trts: tuple, fs: float) -> dict:
    """Assemble one METRIC_COLS row from scorer results + the (golden-parity)
    statistical similarity of the corpus — shared by evaluate_pair and the
    batched driver so the two can't drift."""
    psd_diff, acf_diff, coh_diff = statistical_similarity(real, fake, fs=fs)
    return {"disc_acc": disc[0], "disc_auc": disc[1],
            "rmse_tstr": tstr[0], "r2_tstr": tstr[1],
            "rmse_trts": trts[0], "r2_trts": trts[1],
            "psd_diff": psd_diff, "acf_diff": acf_diff, "coh_diff": coh_diff,
            "n_real": len(real), "n_fake": len(fake),
            "seq_len": real.shape[1], "n_ch": real.shape[2]}


def evaluate_pair(real: np.ndarray, fake: np.ndarray, fs: float = 128.0) -> dict:
    """The full metric row for one real/fake corpus (evaluation.py:187-207)."""
    Xr_in, yr = real[:, :-1, :], real[:, -1, :]
    Xf_in, yf = fake[:, :-1, :], fake[:, -1, :]
    return _metric_dict(real, fake,
                        discriminative_score(real, fake),
                        predictive_score(Xf_in, yf, Xr_in, yr),
                        predictive_score(Xr_in, yr, Xf_in, yf), fs)


def write_csv(path: Path, rows: list[dict], lead_cols: list[str]) -> None:
    cols = lead_cols + METRIC_COLS
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)


def scatter_by_posture(path: Path, emb: np.ndarray, labels: np.ndarray,
                       domain: np.ndarray, title: str) -> None:
    """Color-by-posture, marker-by-domain scatter (evaluation.py:243-267)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(7, 5))
    for pid in np.unique(labels):
        m_real = (labels == pid) & (domain == 1)
        m_fake = (labels == pid) & (domain == 0)
        plt.scatter(emb[m_real, 0], emb[m_real, 1], s=10, alpha=0.65, label=f"P{pid} real")
        plt.scatter(emb[m_fake, 0], emb[m_fake, 1], s=10, alpha=0.65, marker="x",
                    label=f"P{pid} gen")
    plt.title(title)
    plt.legend(bbox_to_anchor=(1.02, 1), loc="upper left", fontsize="small")
    plt.tight_layout()
    plt.savefig(path, dpi=160)
    plt.close()


def pca_tsne_plots(out: Path, R: np.ndarray, F: np.ndarray, labels: np.ndarray,
                   domain: np.ndarray, tsne_max: int | None = None) -> None:
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    X_all = np.concatenate([R, F], axis=0).reshape(len(R) + len(F), -1)
    pc = PCA(n_components=2, random_state=0).fit_transform(X_all)
    scatter_by_posture(out / "pca_global.png", pc, labels, domain,
                       "PCA: posture clusters (real vs generated)")
    try:
        X_ts, lab_ts, dom_ts = X_all, labels, domain
        if tsne_max is not None and len(X_all) > tsne_max:
            idx = np.random.RandomState(0).permutation(len(X_all))[:tsne_max]
            X_ts, lab_ts, dom_ts = X_all[idx], labels[idx], domain[idx]
        ts2 = TSNE(n_components=2, perplexity=30, init="pca",
                   random_state=0).fit_transform(X_ts)
        scatter_by_posture(out / "tsne_global.png", ts2, lab_ts, dom_ts,
                           "t-SNE: posture clusters (real vs generated)")
    except Exception as e:  # reference guards t-SNE the same way
        print(f"t-SNE skipped: {e}")


def run_timegan_eval(real_dir, synth_dir, out, fs: float = 128.0,
                     by_condition: bool = False, tsne_max: int | None = None,
                     mesh=None) -> dict:
    """Shared driver for both reference eval entry points. ``mesh`` shards
    the batched scorer stacks over its devices (independent scorers — no
    collectives; see classifiers._run_grouped)."""
    out = Path(out)
    out.mkdir(parents=True, exist_ok=True)
    if by_condition:
        pairs = load_pairs_by_condition(Path(real_dir), Path(synth_dir))
        lead = ["posture", "condition"]
        per_csv = "metrics_per_posture_condition.csv"
    else:
        pairs = load_posture_pairs(Path(real_dir), Path(synth_dir))
        lead = ["posture"]
        per_csv = "metrics_per_posture.csv"
    if not pairs:
        raise SystemExit("No matching real/synthetic pairs found.")

    # Mixed sequence lengths (e.g. generate_long_synth --gen_seconds with
    # per-bucket estimated fs: round(6·128.17)=769) break the global concat.
    # The reference's evaluate_18 crashes on such input. Per-bucket stats
    # truncate each pair to ITS OWN min T (one short/corrupt synthetic file
    # must not shorten every other pair's evaluation window); only the
    # cross-bucket global concat enforces the global min. Offending pairs are
    # named so a bad input is visible, not silently absorbed.
    t_pair = {k: min(r.shape[1], f.shape[1]) for k, (r, f) in pairs.items()}
    t_min = min(t_pair.values())
    if any(a.shape[1] != t_min for pair in pairs.values() for a in pair):
        t_max = max(max(r.shape[1], f.shape[1]) for r, f in pairs.values())
        offenders = sorted(str(k) for k, (r, f) in pairs.items()
                           if min(r.shape[1], f.shape[1]) < t_max)
        print(f"[eval] WARN: mixed sequence lengths across pairs "
              f"(min T={t_min} from {offenders}) — per-bucket stats use each "
              f"pair's own min T; the global concat truncates to T={t_min}",
              flush=True)
        pairs = {k: (r[:, :t_pair[k]], f[:, :t_pair[k]])
                 for k, (r, f) in pairs.items()}

    keys = sorted(pairs.keys())
    real_labels, fake_labels = [], []
    for keyid in keys:
        posture = keyid[0] if by_condition else keyid
        real_labels += [posture] * len(pairs[keyid][0])
        fake_labels += [posture] * len(pairs[keyid][1])
    R = np.concatenate([pairs[k][0][:, :t_min] for k in keys])
    F = np.concatenate([pairs[k][1][:, :t_min] for k in keys])

    # Batched scorer pass: every pair's discriminative classifier (and the
    # global one) trains in a handful of vmapped dispatches instead of one
    # dispatch per pair — the per-pair protocol (splits, seeds, padding) is
    # byte-identical to evaluate_pair's (classifiers.discriminative_scores_
    # batch); only the device work is fused. Through the remote TPU tunnel
    # this is the difference between ~6 round-trips per pair and ~6 total.
    corpora = [pairs[k] for k in keys] + [(R, F)]
    print(f"[eval] training {len(corpora)} discriminative scorers "
          "(vmapped groups; first run may compile for minutes)...", flush=True)
    disc = discriminative_scores_batch(corpora, mesh=mesh)
    pred_tasks = []
    for real, fake in corpora:
        Xr_in, yr = real[:, :-1, :], real[:, -1, :]
        Xf_in, yf = fake[:, :-1, :], fake[:, -1, :]
        pred_tasks.append((Xf_in, yf, Xr_in, yr))   # TSTR
        pred_tasks.append((Xr_in, yr, Xf_in, yf))   # TRTS
    print(f"[eval] training {len(pred_tasks)} predictive scorers "
          "(TSTR+TRTS)...", flush=True)
    pred = predictive_scores_batch(pred_tasks, mesh=mesh)

    def metric_row(i: int) -> dict:
        return _metric_dict(*corpora[i], disc[i], pred[2 * i],
                            pred[2 * i + 1], fs)

    rows = []
    for i, keyid in enumerate(keys):
        row = metric_row(i)
        if by_condition:
            row = {"posture": keyid[0], "condition": keyid[1], **row}
        else:
            row = {"posture": keyid, **row}
        rows.append(row)
        print(f"[eval] {keyid}: disc_acc={row['disc_acc']:.4f} "
              f"psd={row['psd_diff']:.2e} acf={row['acf_diff']:.4f} "
              f"coh={row['coh_diff']:.4f}", flush=True)

    write_csv(out / per_csv, rows, lead)

    g = metric_row(len(keys))
    write_csv(out / "metrics_global.csv", [g], [])
    # labels/domain ordered all-real-then-all-fake to match [R; F] row order.
    # (The reference builds these interleaved per pair while concatenating
    # real-then-fake — evaluation.py:209-238 — so its global scatter colors/
    # markers are misaligned after the first pair; fixed here, like the v3
    # per-posture split fix.)
    labels = np.array(real_labels + fake_labels)
    domain = np.array([1] * len(R) + [0] * len(F))
    pca_tsne_plots(out, R, F, labels, domain, tsne_max)
    print(f"Wrote {out / per_csv} and {out / 'metrics_global.csv'}", flush=True)
    return {"rows": rows, "global": g}
