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
