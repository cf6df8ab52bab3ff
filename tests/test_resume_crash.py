"""Crash → auto-resume recovery: resumed trajectories equal uninterrupted ones.

The remote TPU runtime can kill its worker mid-run (CLAUDE.md watchdog).
Recovery stack under test:
- ``train_all_buckets(ckpt_every=..., resume=True)`` — full stacked-state
  checkpoints + deterministic continuation (the GAN key schedule is a pure
  function of (seed, completed chunks), eegsynth/train/timegan_multi.py);
- fault injection (eegsynth/train/faults.py);
- the process-level supervisor (scripts/supervise.py) relaunching the trainer
  CLI with --resume.

The strong property proved here: a run crashed mid-GAN-phase and resumed
from its last state checkpoint produces BIT-IDENTICAL train_log.csv,
checkpoints, and synthetic.npz to a never-interrupted run.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from eegsynth.train.faults import ENV_VAR

REPO = Path(__file__).resolve().parent.parent


def _mk_data(tmp_path, rng):
    data = tmp_path / "prep"
    data.mkdir()
    for name, n in (("posture1_no_exo", 6), ("posture2_no_exo", 5)):
        np.savez_compressed(data / f"{name}.npz",
                            X=rng.uniform(0, 1, (n, 32, 3)).astype(np.float32),
                            fs=np.float32(128.0))
    return data


KW = dict(ae_epochs=1, sup_epochs=1, gan_steps=6, chunk=2, batch_size=4,
          acf_max_lag=8)


def _artifacts(root):
    out = {}
    for b in ("posture1_no_exo", "posture2_no_exo"):
        out[f"{b}/log"] = (root / b / "train_log.csv").read_text()
        out[f"{b}/synth"] = np.load(root / b / "synthetic.npz")["X"]
        with np.load(root / b / "ckpt_latest.npz") as z:
            out[f"{b}/ckpt"] = {k: z[k] for k in z.files if k != "__meta__"}
    return out


def _assert_equal(a, b):
    for k in a:
        if k.endswith("/log"):
            assert a[k] == b[k], f"{k} differs"
        elif k.endswith("/synth"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        else:
            assert a[k].keys() == b[k].keys()
            for leaf in a[k]:
                np.testing.assert_array_equal(a[k][leaf], b[k][leaf],
                                              err_msg=f"{k}:{leaf}")


def test_multi_resume_bit_identical(tmp_path, rng, monkeypatch):
    """In-process: crash at step 4 (state saved at 2 and 4), resume, compare
    every artifact bit-for-bit against the uninterrupted control."""
    from eegsynth.train.timegan_multi import train_all_buckets

    data = _mk_data(tmp_path, rng)
    train_all_buckets(data, tmp_path / "ctrl", **KW)

    token = tmp_path / "crash_token"
    monkeypatch.setenv(ENV_VAR, f"4:{token}")
    with pytest.raises(RuntimeError, match="worker process crashed"):
        train_all_buckets(data, tmp_path / "wrk", ckpt_every=2, **KW)
    assert token.exists()
    assert (tmp_path / "wrk" / "_multi_state.npz").exists()
    # token present → fault disabled; resume completes the remaining chunk
    train_all_buckets(data, tmp_path / "wrk", ckpt_every=2, resume=True, **KW)

    _assert_equal(_artifacts(tmp_path / "ctrl"), _artifacts(tmp_path / "wrk"))


def test_multi_resume_config_mismatch_rejected(tmp_path, rng, monkeypatch):
    from eegsynth.train.timegan_multi import train_all_buckets

    data = _mk_data(tmp_path, rng)
    token = tmp_path / "tok"
    monkeypatch.setenv(ENV_VAR, f"2:{token}")
    with pytest.raises(RuntimeError):
        train_all_buckets(data, tmp_path / "wrk", ckpt_every=2, **KW)
    monkeypatch.delenv(ENV_VAR)
    with pytest.raises(ValueError, match="does not match this run"):
        train_all_buckets(data, tmp_path / "wrk", ckpt_every=2, resume=True,
                          **{**KW, "seed": 1234})


def test_supervised_cli_recovers_end_to_end(tmp_path, rng):
    """The full stack through subprocesses: supervise.py launches the trainer
    CLI, the injected fault kills attempt 1, the relaunch (--resume appended)
    completes, and the artifacts equal an uninterrupted control run."""
    data = _mk_data(tmp_path, rng)

    # control through the SAME CLI (identical process config: x64 off, etc.)
    trainer = [sys.executable, "-u", str(REPO / "scripts" / "train_timegan.py"),
               "--platform", "cpu", "--data_dir", str(data),
               "--parallel_buckets", "--ckpt_every", "2"] + \
        sum([[f"--{k}", str(v)] for k, v in KW.items()], [])
    env0 = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    rc = subprocess.run(trainer + ["--out_dir", str(tmp_path / "ctrl")],
                        cwd=REPO, env=env0, capture_output=True, text=True,
                        timeout=1200)
    assert rc.returncode == 0, rc.stdout[-3000:] + rc.stderr[-2000:]

    token = tmp_path / "tok_cli"
    env = {**env0, ENV_VAR: f"4:{token}"}
    cmd = [sys.executable, str(REPO / "scripts" / "supervise.py"),
           "--retries", "2", "--backoff", "0", "--"] + \
        trainer + ["--out_dir", str(tmp_path / "wrk")]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "injected fault" in r.stdout
    assert "[supervise] recovered after 1 retry" in r.stdout
    assert "resuming GAN phase from step 4" in r.stdout
    _assert_equal(_artifacts(tmp_path / "ctrl"), _artifacts(tmp_path / "wrk"))


# integration tier: full trainer loops + subprocess drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
