"""Vmapped multi-bucket TimeGAN trainer: end-to-end on tiny buckets."""

import numpy as np
import pytest

from eegsynth.train.timegan_multi import train_all_buckets


def test_train_all_buckets_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "prep"
    data.mkdir()
    sizes = {"posture1_no_exo": 6, "posture1_with_exo": 9, "posture2_no_exo": 4}
    for name, n in sizes.items():
        np.savez_compressed(data / f"{name}.npz",
                            X=rng.uniform(0, 1, (n, 32, 3)).astype(np.float32),
                            fs=np.float32(128.0))
    out = tmp_path / "runs"
    res = train_all_buckets(data, out, ae_epochs=1, sup_epochs=1, gan_steps=4,
                            chunk=2, batch_size=4, acf_max_lag=8)
    assert res["n_buckets"] == 3
    for name, n in sizes.items():
        d = out / name
        assert (d / "ckpt_best.npz").exists()
        assert (d / "ckpt_latest.npz").exists()
        synth = np.load(d / "synthetic.npz")["X"]
        assert synth.shape == (n, 32, 3)
        assert np.isfinite(synth).all()
        rows = (d / "train_log.csv").read_text().strip().split("\n")
        assert len(rows) == 5
        vals = np.array([r.split(",")[2:] for r in rows[1:]], dtype=float)
        assert np.isfinite(vals).all()
    # buckets trained independently: logs differ across buckets
    l1 = (out / "posture1_no_exo" / "train_log.csv").read_text()
    l2 = (out / "posture1_with_exo" / "train_log.csv").read_text()
    assert l1 != l2


def test_train_all_buckets_sharded_over_mesh(tmp_path):
    """Bucket axis sharded across the 8 virtual devices (with padding 3→8)."""
    import jax
    from eegsynth.train.sharding import data_mesh

    rng = np.random.default_rng(1)
    data = tmp_path / "prep"
    data.mkdir()
    for name, n in (("posture1_no_exo", 5), ("posture1_with_exo", 7),
                    ("posture2_no_exo", 6)):
        np.savez_compressed(data / f"{name}.npz",
                            X=rng.uniform(0, 1, (n, 32, 3)).astype(np.float32),
                            fs=np.float32(128.0))
    out = tmp_path / "runs"
    mesh = data_mesh(jax.devices()[:8])
    res = train_all_buckets(data, out, mesh=mesh, ae_epochs=1, sup_epochs=1,
                            gan_steps=2, chunk=2, batch_size=4, acf_max_lag=8)
    assert res["n_buckets"] == 3 and res["n_padded"] == 5
    for name in ("posture1_no_exo", "posture1_with_exo", "posture2_no_exo"):
        assert (out / name / "synthetic.npz").exists()
    assert not (out / "posture2_no_exo.1").exists()


def test_sub_stack_grouping_is_semantics_neutral(tmp_path):
    """max_stack splits the GAN phase into sequential sub-stack dispatches
    (round-3 workaround for the remote runtime's nb>=8 worker crash); every
    bucket's RNG stream is keyed by its global index, so the grouping feeds
    every bucket identical batches/noise — trajectories must track within
    f32 reduction-order noise (vmap width changes XLA fusion order, so
    bit-identity is not expected)."""
    rng = np.random.default_rng(3)
    data = tmp_path / "prep"
    data.mkdir()
    for i, n in enumerate((6, 9, 4, 7, 5)):
        np.savez_compressed(data / f"posture{i+1}_no_exo.npz",
                            X=rng.uniform(0, 1, (n, 32, 3)).astype(np.float32),
                            fs=np.float32(128.0))
    kw = dict(ae_epochs=1, sup_epochs=1, gan_steps=4, chunk=2, batch_size=4,
              acf_max_lag=8)
    train_all_buckets(data, tmp_path / "whole", max_stack=99, **kw)
    train_all_buckets(data, tmp_path / "split", max_stack=2, **kw)
    def vals(root, name):
        rows = (root / name / "train_log.csv").read_text().strip().split("\n")[1:]
        return np.array([r.split(",")[2:] for r in rows], dtype=float)

    for i in range(5):
        name = f"posture{i+1}_no_exo"
        np.testing.assert_allclose(vals(tmp_path / "split", name),
                                   vals(tmp_path / "whole", name),
                                   rtol=1e-3, atol=1e-5, err_msg=name)
        sa = np.load(tmp_path / "whole" / name / "synthetic.npz")["X"]
        sb = np.load(tmp_path / "split" / name / "synthetic.npz")["X"]
        np.testing.assert_allclose(sb, sa, rtol=1e-2, atol=1e-3)


def test_dispatch_budget_caps_chunk_equivalently(tmp_path):
    """dispatch_budget caps per-dispatch GAN steps (the round-4 root-cause
    fix for the runtime's per-dispatch execution-time watchdog — see
    timegan_multi.py docstring). A budget that caps chunk 4 -> 1 must produce
    the SAME trajectories as explicitly setting chunk=1: the cap only moves
    chunk boundaries, and boundaries fully determine the RNG stream."""
    rng = np.random.default_rng(5)
    data = tmp_path / "prep"
    data.mkdir()
    for i, n in enumerate((6, 4, 5)):
        np.savez_compressed(data / f"posture{i+1}_no_exo.npz",
                            X=rng.uniform(0, 1, (n, 32, 3)).astype(np.float32),
                            fs=np.float32(128.0))
    kw = dict(ae_epochs=1, sup_epochs=1, gan_steps=4, batch_size=4,
              acf_max_lag=8)
    # scale = (4/64)*(32/768)*3 = 0.0078; budget=0 -> int(0/..)=0 -> max(1,)
    train_all_buckets(data, tmp_path / "capped", chunk=4, dispatch_budget=0,
                      **kw)
    train_all_buckets(data, tmp_path / "explicit", chunk=1, **kw)

    def vals(root, name):
        rows = (root / name / "train_log.csv").read_text().strip().split("\n")[1:]
        return np.array([r.split(",")[2:] for r in rows], dtype=float)

    for i in range(3):
        name = f"posture{i+1}_no_exo"
        np.testing.assert_array_equal(vals(tmp_path / "capped", name),
                                      vals(tmp_path / "explicit", name),
                                      err_msg=name)


# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
