"""End-to-end test of scripts/pipeline.py: the one-command orchestrator must
chain train → synth → eval → fatigue → viz on a tiny two-bucket corpus, skip
completed stages on re-run, and write a machine-readable manifest.

Stages run as real subprocesses (the pipeline's own execution model), pinned
to the CPU backend via --platform cpu / the stages' own host pinning."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
PIPELINE = REPO / "scripts" / "pipeline.py"


def _run(args, timeout=1200):
    r = subprocess.run([sys.executable, "-u", str(PIPELINE)] + args,
                       cwd=REPO, capture_output=True, text=True, timeout=timeout)
    if r.returncode != 0:
        raise AssertionError(f"pipeline failed:\nSTDOUT:\n{r.stdout}\nSTDERR:\n{r.stderr}")
    return r


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("pipe")
    data = root / "prep"
    data.mkdir()
    rng = np.random.default_rng(0)
    for cond in ("no_exo", "with_exo"):
        X = rng.uniform(0, 1, (16, 128, 3)).astype(np.float32)
        np.savez_compressed(
            data / f"posture1_{cond}.npz", X=X, fs=np.float32(128.0),
            ch_names=np.array(["AF3", "F7", "F3"]),
            scale_min=np.zeros(3, np.float32),
            scale_range=np.ones(3, np.float32))
    cfg = root / "tiny.json"
    cfg.write_text(json.dumps({"ae_epochs": 1, "sup_epochs": 1, "gan_steps": 2,
                               "chunk": 2, "batch_size": 4, "acf_max_lag": 8}))
    return root, data, cfg


@pytest.fixture(scope="module")
def completed_run(corpus):
    root, data, cfg = corpus
    work = root / "work"
    _run(["--data_dir", str(data), "--work_dir", str(work),
          "--config", str(cfg), "--platform", "cpu",
          "--gen_len", "128", "--n", "6",
          "--stage-arg", "eval:--tsne_max=40",
          "--stage-arg", "viz:--tsne_perplexity=5"])
    return work


def test_all_stage_artifacts(completed_run):
    work = completed_run
    # train (vmapped default): per-bucket reference artifact set
    for stem in ("posture1_no_exo", "posture1_with_exo"):
        run = work / "timegan_runs" / stem
        assert (run / "train_log.csv").exists()
        assert (run / "ckpt_latest.npz").exists()
        assert (run / "synthetic.npz").exists()
        # synth stage: arbitrary-length generation with the requested n
        long = np.load(run / "synthetic_long.npz")["X"]
        assert long.shape == (6, 128, 3) and np.isfinite(long).all()
    assert (work / "eval_out" / "metrics_global.csv").exists()
    assert (work / "eval_out" / "metrics_per_posture_condition.csv").exists()
    assert (work / "fatigue" / "posture1_tbr_4group.png").exists()
    assert (work / "fatigue" / "posture1_stats.csv").exists()
    assert (work / "figures" / "pca_combined.png").exists()


def test_manifest(completed_run):
    m = json.loads((completed_run / "pipeline_manifest.json").read_text())
    assert [s for s, v in m["stages"].items() if v["status"] == "ok"] == [
        "train", "synth", "eval", "fatigue", "viz"]
    assert all(v["seconds"] > 0 for v in m["stages"].values())
    # the global eval row is surfaced for downstream tooling
    assert 0.0 <= m["eval_global"]["disc_acc"] <= 1.0
    assert np.isfinite(m["eval_global"]["psd_diff"])
    assert m["total_seconds"] > 0


def test_fatigue_view_symlinks(completed_run):
    view = completed_run / "fatigue_view"
    for sub, name in (("real", "posture1_no_exo.npz"),
                      ("synthetic", "posture1_with_exo.npz")):
        fp = view / sub / name
        assert fp.is_symlink() and np.load(fp)["X"].ndim == 3
    # synthetic link prefers the synth stage's long output
    tgt = (view / "synthetic" / "posture1_no_exo.npz").resolve()
    assert tgt.name == "synthetic_long.npz"


def test_rerun_skips_completed_stages(corpus, completed_run):
    root, data, cfg = corpus
    r = _run(["--data_dir", str(data), "--work_dir", str(completed_run),
              "--config", str(cfg), "--platform", "cpu", "--gen_len", "128"])
    m = json.loads((completed_run / "pipeline_manifest.json").read_text())
    assert all(v["status"] == "skipped" for v in m["stages"].values())
    assert r.stdout.count("SKIP") == 5


def test_dry_run_and_bad_stage(corpus, tmp_path):
    root, data, cfg = corpus
    r = _run(["--data_dir", str(data), "--work_dir", str(tmp_path / "w"),
              "--dry_run"])
    assert "train" in r.stdout and "eval" in r.stdout
    assert not (tmp_path / "w" / "pipeline_manifest.json").exists()
    bad = subprocess.run(
        [sys.executable, str(PIPELINE), "--data_dir", str(data),
         "--work_dir", str(tmp_path / "w"), "--stages", "nosuch"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert bad.returncode != 0 and "Unknown stage" in bad.stderr


def test_relative_paths_resolve_against_caller_cwd(corpus, tmp_path):
    """Stage subprocesses run with cwd=REPO, so relative --work_dir/--data_dir
    must be resolved against the CALLER's cwd up front (regression: outputs
    previously split between the caller's tree and the repo tree)."""
    root, data, cfg = corpus
    import shutil
    shutil.copytree(data, tmp_path / "data")
    r = subprocess.run(
        [sys.executable, str(PIPELINE), "--data_dir", "data",
         "--work_dir", "w", "--dry_run"],
        cwd=tmp_path, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert f"work_dir={tmp_path / 'w'}" in r.stdout

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
