"""Vmapped per-posture CGAN training: artifacts, per-posture best tracking,
and loadability of the saved generators (v2 contract, posture leading axis)."""

import numpy as np
import jax
import pytest


@pytest.fixture
def posture_data(tmp_path, rng):
    data = tmp_path / "prep"
    data.mkdir()
    for p in (1, 2):
        for cond, n in (("no_exo", 6), ("with_exo", 4)):  # asymmetric N → padding
            np.savez_compressed(
                data / f"posture{p}_{cond}.npz",
                X=rng.uniform(0, 1, (n, 768, 14)).astype(np.float32),
                posture=np.int32(p), condition=cond, fs=np.float32(128.0),
                ch_names=np.array([f"ch{i}" for i in range(14)], dtype=object),
                scale_min=np.zeros(14, np.float32),
                scale_range=np.ones(14, np.float32))
    return data


def test_parallel_postures_end_to_end(tmp_path, posture_data):
    from eegsynth.train.cgan import generate_batch, load_generator
    from eegsynth.train.cgan_multi import train_all_postures

    res = train_all_postures(posture_data, tmp_path / "runs", postures=[1, 2],
                             epochs=2, prewarm=1, batch_size=4, save_every=3,
                             print_every=10, arch="transformer", tf_dim=32,
                             tf_depth=1, tf_heads=2, tf_patch=8,
                             log=lambda *a: None)
    assert np.all(np.isfinite(res["best_g"])) and res["best_g"].shape == (2,)

    for p in (1, 2):
        d = tmp_path / "runs" / f"posture{p}"
        rows = (d / "metrics.csv").read_text().strip().split("\n")
        assert len(rows) == 4                     # header + 3 epochs
        assert (d / f"CGAN_generator_posture{p}_last.npz").exists()
        # the best checkpoint must rebuild (arch from meta) and generate
        G, bn, cfg, meta = load_generator(
            d / f"CGAN_generator_posture{p}_best.npz")
        assert meta["arch"] == "transformer" and cfg.num_classes == 2
        x = generate_batch(G, bn, cfg, jax.random.key(0), 2, 1)
        assert x.shape == (2, 14, 768)
        assert np.isfinite(np.asarray(x)).all()

    # per-posture models must differ (independent streams via fold_in)
    G1 = np.load(tmp_path / "runs/posture1/CGAN_generator_posture1_last.npz")
    G2 = np.load(tmp_path / "runs/posture2/CGAN_generator_posture2_last.npz")
    key = [k for k in G1.files if k.endswith("['tok']")][0]
    assert not np.allclose(G1[key], G2[key])


def test_parallel_postures_mesh_sharded(tmp_path, posture_data):
    """Posture axis sharded over an 8-device mesh: 2 postures pad to 8
    replicas; only real posture artifacts are written; best is unpadded."""
    from eegsynth.train.cgan_multi import train_all_postures
    from eegsynth.train.sharding import data_mesh

    res = train_all_postures(posture_data, tmp_path / "runs", postures=[1, 2],
                             mesh=data_mesh(jax.devices()[:8]),
                             epochs=1, prewarm=0, batch_size=8, save_every=2,
                             print_every=10, arch="transformer", tf_dim=32,
                             tf_depth=1, tf_heads=2, tf_patch=8,
                             log=lambda *a: None)
    assert res["best_g"].shape == (2,) and np.all(np.isfinite(res["best_g"]))
    assert sorted(d.name for d in (tmp_path / "runs").iterdir()) == \
        ["posture1", "posture2"]

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
