"""CLI-contract smoke tests for the reference-parity entry points
(SURVEY.md §5 config/flag system). Each script's main() is executed with a
patched argv on tiny data — exercising argument parsing, run-dir scanning,
checkpoint-meta rebuild, and artifact writing end-to-end."""

import importlib.util
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_script(name):
    spec = importlib.util.spec_from_file_location(name, REPO / "scripts" / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """One tiny trained TimeGAN run + its real bucket (shared by CLI tests)."""
    from eegsynth.train.timegan import train_single_npz

    root = tmp_path_factory.mktemp("cli")
    real_dir = root / "preprocessed"
    runs_dir = root / "runs"
    real_dir.mkdir()
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (8, 32, 3)).astype(np.float32)
    fp = real_dir / "posture1_no_exo.npz"
    np.savez_compressed(fp, X=X, fs=np.float32(128.0),
                        scale_min=np.full(3, 0.25, np.float32),
                        scale_range=np.full(3, 2.0, np.float32))
    train_single_npz(fp, runs_dir / "posture1_no_exo", ae_epochs=1,
                     sup_epochs=1, gan_steps=2, chunk=2, batch_size=4,
                     acf_max_lag=8)
    return real_dir, runs_dir


def test_preprocess_parser_defaults():
    """Flag defaults must match the reference CLI (pre-processing.py:25-41)."""
    mod = _load_script("preprocess")
    import argparse
    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def grab(self, *a, **k):
        captured["args"] = orig(self, [])
        raise SystemExit(0)  # stop before any work

    argparse.ArgumentParser.parse_args = grab
    try:
        with pytest.raises(SystemExit):
            mod.main()
    finally:
        argparse.ArgumentParser.parse_args = orig
    a = captured["args"]
    assert (a.fs, a.epoch_sec, a.overlap) == (128.0, 6.0, 0.0)
    assert (a.low_cut, a.high_cut, a.notch_q) == (1.0, 45.0, 30.0)
    assert a.min_channels == 10 and a.epoch_fs_target == 128.0
    assert a.dry_run is False


def test_generate_long_synth_cli(tiny_run, monkeypatch):
    real_dir, runs_dir = tiny_run
    mod = _load_script("generate_long_synth")
    monkeypatch.setattr(sys, "argv", [
        "generate_long_synth.py", "--runs_dir", str(runs_dir),
        "--real_dir", str(real_dir), "--gen_len", "48", "--n", "5",
        "--denorm", "--batch", "3", "--time_chunk", "16"])
    mod.main()
    out = np.load(runs_dir / "posture1_no_exo" / "synthetic_long.npz")["X"]
    assert out.shape == (5, 48, 3)          # arbitrary-T synthesis
    assert np.isfinite(out).all()
    # denorm with scale_min=0.25, scale_range=2.0: sigmoid-free decode output
    # in roughly [0,1] maps into [0.25, 2.25]-ish; just assert it left [0,1]
    assert out.max() > 1.0 or out.min() < 0.0 or out.mean() > 0.6


def test_generate_long_synth_prefer_latest(tiny_run, monkeypatch):
    real_dir, runs_dir = tiny_run
    mod = _load_script("generate_long_synth")
    monkeypatch.setattr(sys, "argv", [
        "generate_long_synth.py", "--runs_dir", str(runs_dir),
        "--real_dir", str(real_dir), "--prefer_latest",
        "--out_suffix", "synthetic_latest.npz"])
    mod.main()
    out = np.load(runs_dir / "posture1_no_exo" / "synthetic_latest.npz")["X"]
    assert out.shape == (8, 32, 3)          # defaults: N_real, T_train


def test_check_shape_cli(tiny_run):
    real_dir, _ = tiny_run
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_shape.py"),
         str(real_dir / "posture1_no_exo.npz")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "X" in r.stdout and "(8, 32, 3)" in r.stdout


@pytest.fixture()
def viz_tree(tmp_path):
    """Real bucket + shape-matched synthetic run dir (no training needed)."""
    rng = np.random.default_rng(1)
    real_dir = tmp_path / "preprocessed"
    runs_dir = tmp_path / "runs"
    real_dir.mkdir()
    (runs_dir / "posture1_no_exo").mkdir(parents=True)
    X = rng.uniform(0, 1, (12, 32, 3)).astype(np.float32)
    np.savez_compressed(real_dir / "posture1_no_exo.npz", X=X,
                        fs=np.float32(128.0),
                        ch_names=np.array(["AF3", "F7", "F3"]))
    np.savez_compressed(runs_dir / "posture1_no_exo" / "synthetic.npz",
                        X=X + rng.normal(0, 0.05, X.shape).astype(np.float32))
    return real_dir, runs_dir


def test_visualization_cli(viz_tree, tmp_path, monkeypatch):
    real_dir, runs_dir = viz_tree
    mod = _load_script("visualization")
    out = tmp_path / "figs"
    monkeypatch.setattr(sys, "argv", [
        "visualization.py", "--real_dir", str(real_dir),
        "--synth_dir", str(runs_dir), "--out", str(out),
        "--tsne_perplexity", "3", "--color_scheme", "18"])
    mod.main()
    assert (out / "pca_combined.png").exists()
    assert (out / "tsne_combined.png").exists()


def test_plot_real_vs_synth_cli(viz_tree, tmp_path, monkeypatch):
    real_dir, runs_dir = viz_tree
    mod = _load_script("plot_real_vs_synth")
    out = tmp_path / "traces"
    monkeypatch.setattr(sys, "argv", [
        "plot_real_vs_synth.py", "--real_dir", str(real_dir),
        "--synth_dir", str(runs_dir), "--out", str(out),
        "--n_samples", "2", "--smooth", "3"])
    mod.main()
    assert (out / "samples_posture1_no_exo.png").exists()
    assert (out / "summary_posture1_no_exo.png").exists()


def test_missing_runs_dir_exits(tmp_path, monkeypatch):
    mod = _load_script("generate_long_synth")
    monkeypatch.setattr(sys, "argv", [
        "generate_long_synth.py", "--runs_dir", str(tmp_path / "none"),
        "--real_dir", str(tmp_path)])
    with pytest.raises(SystemExit):
        mod.main()


def test_generate_long_synth_without_real_npz(tiny_run, monkeypatch):
    """Checkpoint meta (x_dim/layers) alone rebuilds the model: a converted or
    copied checkpoint generates on a machine without the real NPZ, provided
    --n and a horizon are given (train/timegan.py meta contract)."""
    _, runs_dir = tiny_run
    mod = _load_script("generate_long_synth")
    monkeypatch.setattr(sys, "argv", [
        "generate_long_synth.py", "--runs_dir", str(runs_dir),
        "--real_dir", str(runs_dir / "no_such_dir"), "--gen_len", "16",
        "--n", "3", "--out_suffix", "synthetic_nometa.npz"])
    mod.main()
    out = np.load(runs_dir / "posture1_no_exo" / "synthetic_nometa.npz")["X"]
    assert out.shape == (3, 16, 3)          # x_dim from checkpoint meta
    assert np.isfinite(out).all()


def test_generate_long_synth_without_real_npz_needs_n(tiny_run, monkeypatch,
                                                      capsys):
    """Missing real NPZ and no --n → clear SKIP, no crash, no artifact."""
    _, runs_dir = tiny_run
    mod = _load_script("generate_long_synth")
    monkeypatch.setattr(sys, "argv", [
        "generate_long_synth.py", "--runs_dir", str(runs_dir),
        "--real_dir", str(runs_dir / "no_such_dir"), "--gen_len", "16",
        "--out_suffix", "synthetic_skip.npz"])
    mod.main()
    assert "[SKIP]" in capsys.readouterr().out
    assert not (runs_dir / "posture1_no_exo" / "synthetic_skip.npz").exists()


def test_cgan_cli_reference_flag_surface(monkeypatch):
    """Every reference cgan.py/cgan_v2.py flag parses (CLI-surface parity):
    --ema/--use-diffaugment/--amp-d are accepted no-ops (store_true default
    True in the reference too), --loss validates, --gp-weight is accepted."""
    mod = _load_script("train_cgan")
    monkeypatch.setattr(sys, "argv", [
        "train_cgan.py", "--loss", "hinge", "--gp-weight", "5.0", "--ema",
        "--use-diffaugment", "--amp-d", "--d-steps", "2", "--no-ema"])
    a = mod.get_args()
    assert a.loss == "hinge" and a.gp_weight == 5.0 and a.d_steps == 2
    assert a.no_ema  # disable path still works alongside the no-op enable
    # all three advertised losses parse (and all three are implemented here,
    # unlike the reference where only hinge exists)
    for loss in ("hinge", "bce", "wgan-gp"):
        monkeypatch.setattr(sys, "argv", ["train_cgan.py", "--loss", loss])
        assert mod.get_args().loss == loss
    # unset flags parse to None so --config gan_loss/gp_weight keys can take
    # effect (flags override config, config overrides defaults)
    monkeypatch.setattr(sys, "argv", ["train_cgan.py"])
    a = mod.get_args()
    assert a.loss is None and a.gp_weight is None


def test_cgan_cli_hp_flags_match_trainer_fields(monkeypatch):
    """Every HP_FLAGS key must be a real CGANHParams field with the same type
    — main() forwards them as train_one_condition(**hp), so a mismatched name
    would only crash at training time. Also drives the round-2 loss-shaping
    flags (--amp-weight/--coh-pairs, used by the transformer sweep)."""
    import dataclasses

    from eegsynth.train.cgan import CGANHParams

    mod = _load_script("train_cgan")
    fields = {f.name: f for f in dataclasses.fields(CGANHParams)}
    for key, typ in mod.HP_FLAGS.items():
        assert key in fields, f"HP_FLAGS {key!r} is not a CGANHParams field"
        assert isinstance(getattr(CGANHParams(), key), typ), key
    monkeypatch.setattr(sys, "argv", [
        "train_cgan.py", "--amp-weight", "0.5", "--coh-pairs", "8"])
    a = mod.get_args()
    assert a.amp_weight == 0.5 and a.coh_pairs == 8


def test_visualization_cgan_cli(tmp_path, monkeypatch):
    """CGAN 36-cluster viz (visualization_36_clusters_zoom.py contract):
    pca_36/tsne_36 with the paired legend + fresh-embedding zoom pairs under
    zooms/, synthesized from a per-posture generator checkpoint."""
    import jax
    from eegsynth.train import checkpoint as ckpt_io
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, generator_init, generator_meta,
    )

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "prep"
    data_dir.mkdir()
    for cond in ("no_exo", "with_exo"):
        X = rng.uniform(0, 1, (6, 768, 14)).astype(np.float32)
        np.savez_compressed(
            data_dir / f"posture1_{cond}.npz", X=X, fs=np.float32(128.0),
            ch_names=np.array([f"ch{i}" for i in range(14)]),
            scale_min=np.zeros(14, np.float32),
            scale_range=np.ones(14, np.float32))

    hp = CGANHParams(variant="v2")
    cfg = build_cfg(hp, num_classes=2)
    G, bn = generator_init(jax.random.key(0), cfg)
    run_dir = tmp_path / "runs" / "posture1"
    run_dir.mkdir(parents=True)
    ckpt_io.save_checkpoint(run_dir / "CGAN_generator_posture1_best.npz",
                            {"model": G, "bn": bn},
                            generator_meta(hp, 2, "posture1"))

    mod = _load_script("visualization_cgan")
    out = tmp_path / "viz"
    monkeypatch.setattr(sys, "argv", [
        "visualization_cgan.py", "--data-dir", str(data_dir),
        "--runs-root", str(tmp_path / "runs"), "--out", str(out),
        "--postures", "1", "--tsne-perplexity", "3", "--platform", "cpu"])
    mod.main()
    assert (out / "pca_36.png").exists()
    assert (out / "tsne_36.png").exists()
    for cond in ("no_exo", "with_exo"):
        assert (out / "zooms" / f"zoom_p1_{cond}_pca.png").exists()
        assert (out / "zooms" / f"zoom_p1_{cond}_tsne.png").exists()

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
