"""Eval-driver tests: pair loaders, synthetic-file preference, CSV artifact
contract of run_timegan_eval (evaluation.py:165-271, evaluate_18.py:148-301)."""

import csv

import numpy as np
import pytest

from eegsynth.eval.drivers import (
    evaluate_pair, find_synth_npz, load_pairs_by_condition, load_posture_pairs,
    run_timegan_eval,
)


def _save(fp, X, **extra):
    fp.parent.mkdir(parents=True, exist_ok=True)
    np.savez(fp, X=X.astype(np.float32), **extra)


def test_find_synth_npz_preference(tmp_path, rng):
    X = rng.normal(size=(2, 8, 3))
    run = tmp_path / "run"
    _save(run / "aaa_other.npz", X)
    assert find_synth_npz(run).name == "aaa_other.npz"   # fallback: first *.npz
    _save(run / "synthetic.npz", X)
    assert find_synth_npz(run).name == "synthetic.npz"
    _save(run / "synthetic_long.npz", X)
    assert find_synth_npz(run).name == "synthetic_long.npz"
    assert find_synth_npz(tmp_path / "empty") is None


def test_load_pairs_by_condition_truncates(tmp_path, rng):
    real_dir, synth_dir = tmp_path / "real", tmp_path / "runs"
    _save(real_dir / "posture1_no_exo.npz", rng.normal(size=(10, 8, 3)))
    _save(synth_dir / "posture1_no_exo" / "synthetic.npz",
          rng.normal(size=(7, 8, 3)))
    pairs = load_pairs_by_condition(real_dir, synth_dir)
    assert set(pairs) == {(1, "no_exo")}
    r, f = pairs[(1, "no_exo")]
    assert len(r) == len(f) == 7  # truncated to min N (evaluate_18.py:170)


def test_load_posture_pairs_merges_conditions(tmp_path, rng):
    real_dir, synth_dir = tmp_path / "real", tmp_path / "runs"
    for cond, n_r, n_f in (("no_exo", 6, 4), ("with_exo", 5, 9)):
        _save(real_dir / f"posture2_{cond}.npz", rng.normal(size=(n_r, 8, 3)))
        _save(synth_dir / f"posture2_{cond}" / "synthetic.npz",
              rng.normal(size=(n_f, 8, 3)))
    pairs = load_posture_pairs(real_dir, synth_dir)
    r, f = pairs[2]
    # per-condition balancing: min(6,4)+min(5,9) = 4+5 = 9 each
    assert len(r) == len(f) == 9


def test_evaluate_pair_metric_row(rng):
    real = rng.normal(0.5, 0.1, size=(12, 16, 3)).astype(np.float32)
    fake = rng.normal(0.5, 0.1, size=(12, 16, 3)).astype(np.float32)
    row = evaluate_pair(real, fake, fs=128.0)
    for k in ("disc_acc", "disc_auc", "rmse_tstr", "r2_tstr", "rmse_trts",
              "r2_trts", "psd_diff", "acf_diff", "coh_diff"):
        assert np.isfinite(row[k]), k
    assert 0.0 <= row["disc_acc"] <= 1.0
    assert row["n_real"] == row["n_fake"] == 12
    assert row["seq_len"] == 16 and row["n_ch"] == 3


def test_run_timegan_eval_artifacts(tmp_path, rng):
    real_dir = tmp_path / "preprocessed"
    synth_dir = tmp_path / "runs"
    out = tmp_path / "eval_out"
    for p in (1, 2):
        X = rng.normal(0.5, 0.1, size=(10, 16, 3))
        _save(real_dir / f"posture{p}_no_exo.npz", X, fs=128.0)
        _save(synth_dir / f"posture{p}_no_exo" / "synthetic.npz",
              X + rng.normal(0, 0.05, size=X.shape))
    res = run_timegan_eval(real_dir, synth_dir, out, by_condition=True,
                           tsne_max=40)
    per = out / "metrics_per_posture_condition.csv"
    assert per.exists() and (out / "metrics_global.csv").exists()
    assert (out / "pca_global.png").exists()
    with open(per) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["posture"] == "1" and rows[0]["condition"] == "no_exo"
    assert float(rows[0]["psd_diff"]) >= 0.0
    assert len(res["rows"]) == 2 and np.isfinite(res["global"]["coh_diff"])


def test_batched_scores_match_single(rng):
    """The batched scorer APIs (one vmapped dispatch per padded-shape group)
    reproduce the single-pair protocol results — same host RNG/splits/padding
    per pair, only the device work is fused."""
    from eegsynth.eval.classifiers import (
        discriminative_score, discriminative_scores_batch,
        predictive_score, predictive_scores_batch,
    )
    r1 = rng.normal(size=(12, 16, 3)).astype(np.float32)
    f1 = rng.normal(size=(14, 16, 3)).astype(np.float32) + 1.0
    r2 = rng.normal(size=(80, 16, 3)).astype(np.float32)  # different pad group
    f2 = rng.normal(size=(80, 16, 3)).astype(np.float32)
    # r3/r4 pad to the same shapes as r1's task → a group of 3, which the
    # task-dim pow-2 padding rounds to 4 (the 4th lane repeats task 0)
    r3 = rng.normal(size=(13, 16, 3)).astype(np.float32)
    f3 = rng.normal(size=(13, 16, 3)).astype(np.float32)
    r4 = rng.normal(size=(11, 16, 3)).astype(np.float32)
    f4 = rng.normal(size=(11, 16, 3)).astype(np.float32) - 1.0

    quad = [(r1, f1), (r2, f2), (r3, f3), (r4, f4)]
    batch = discriminative_scores_batch(quad, epochs=5)
    for (acc, auc), (real, fake) in zip(batch, quad):
        acc1, auc1 = discriminative_score(real, fake, epochs=5)
        assert np.isclose(acc, acc1)
        assert np.isclose(auc, auc1, rtol=1e-5) or (np.isnan(auc) and np.isnan(auc1))

    tasks = [(f1[:, :-1], f1[:, -1], r1[:, :-1], r1[:, -1]),
             (r2[:, :-1], r2[:, -1], f2[:, :-1], f2[:, -1])]
    for got, t in zip(predictive_scores_batch(tasks, epochs=5), tasks):
        np.testing.assert_allclose(got, predictive_score(*t, epochs=5), rtol=1e-4)


def test_batched_scores_mesh_equivalence(rng):
    """Sharding the scorer task axis over an 8-device mesh returns the same
    scores as the unsharded path (independent lanes, no collectives)."""
    import jax
    from eegsynth.eval.classifiers import (
        discriminative_scores_batch, predictive_scores_batch,
    )
    from eegsynth.train.sharding import data_mesh

    mesh = data_mesh(jax.devices()[:8])
    pairs = [(rng.normal(size=(20, 12, 3)).astype(np.float32),
              rng.normal(size=(20, 12, 3)).astype(np.float32) + s)
             for s in (0.0, 0.5, 1.0)]
    base = discriminative_scores_batch(pairs, epochs=4)
    shard = discriminative_scores_batch(pairs, epochs=4, mesh=mesh)
    for (a0, u0), (a1, u1) in zip(base, shard):
        assert np.isclose(a0, a1)
        assert np.isclose(u0, u1, rtol=1e-5) or (np.isnan(u0) and np.isnan(u1))

    tasks = [(r[:, :-1], r[:, -1], f[:, :-1], f[:, -1]) for r, f in pairs]
    for got, exp in zip(predictive_scores_batch(tasks, epochs=4, mesh=mesh),
                        predictive_scores_batch(tasks, epochs=4)):
        np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_run_timegan_eval_mixed_seq_lengths(tmp_path, rng):
    """Synthetic corpora of different T (gen_seconds x per-bucket estimated fs
    rounds to 769 for some buckets) must evaluate by truncating to the common
    min T instead of crashing the global concat (the reference's evaluate_18
    crashes on such input; found by the round-3 pipeline hardware run)."""
    real_dir = tmp_path / "preprocessed"
    synth_dir = tmp_path / "runs"
    out = tmp_path / "eval_out"
    for p, t_f in ((1, 17), (2, 16)):       # one fake corpus a sample longer
        X = rng.normal(0.5, 0.1, size=(10, 16, 3))
        _save(real_dir / f"posture{p}_no_exo.npz", X, fs=128.0)
        _save(synth_dir / f"posture{p}_no_exo" / "synthetic.npz",
              rng.normal(0.5, 0.1, size=(10, t_f, 3)))
    res = run_timegan_eval(real_dir, synth_dir, out, by_condition=True,
                           tsne_max=40)
    assert res["global"]["seq_len"] == 16
    assert np.isfinite(res["global"]["coh_diff"])


def test_run_timegan_eval_short_pair_does_not_shorten_others(tmp_path, rng):
    """One short/corrupt synthetic corpus must not shrink the evaluation
    window of the other well-formed pairs: per-bucket stats use each pair's
    OWN min T; only the global concat truncates to the global min
    (round-3 advisor finding)."""
    real_dir = tmp_path / "preprocessed"
    synth_dir = tmp_path / "runs"
    out = tmp_path / "eval_out"
    for p, t_f in ((1, 16), (2, 12)):       # posture2's synthetic is short
        X = rng.normal(0.5, 0.1, size=(10, 16, 3))
        _save(real_dir / f"posture{p}_no_exo.npz", X, fs=128.0)
        _save(synth_dir / f"posture{p}_no_exo" / "synthetic.npz",
              rng.normal(0.5, 0.1, size=(10, t_f, 3)))
    res = run_timegan_eval(real_dir, synth_dir, out, by_condition=True,
                           tsne_max=40)
    by_posture = {row["posture"]: row for row in res["rows"]}
    assert by_posture[1]["seq_len"] == 16    # full window kept
    assert by_posture[2]["seq_len"] == 12    # its own min, not global max
    assert res["global"]["seq_len"] == 12    # concat needs the global min
    assert np.isfinite(res["global"]["coh_diff"])

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
