"""Orbax checkpoint backend (SURVEY.md §5: "keep resume; add periodic orbax
checkpoints") — same flat-payload contract as the NPZ backend, selected by a
``*.orbax`` path, with optional async (overlapped) saves."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from eegsynth.models.timegan import TimeGANConfig, timegan_init
from eegsynth.train.checkpoint import (
    find_checkpoint, is_orbax_path, load_checkpoint, load_meta,
    save_checkpoint, wait_for_saves,
)


def _tree_allclose(a, b):
    return jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda x, y: np.allclose(np.asarray(x), np.asarray(y)), a, b))


def test_orbax_roundtrip_with_optimizer_state(tmp_path):
    cfg = TimeGANConfig(x_dim=3, z_dim=8, h_dim=12)
    params = timegan_init(jax.random.key(0), cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)  # NamedTuple leaves exercise keystr paths
    path = tmp_path / "ckpt_latest.orbax"
    save_checkpoint(path, {"model": params, "optG": opt_state},
                    {"npz": "x.npz", "z_dim": 8, "h_dim": 12, "step": 3})
    assert path.is_dir()  # orbax checkpoints are directories
    trees, meta = load_checkpoint(path, {"model": params, "optG": opt_state})
    assert meta == {"npz": "x.npz", "z_dim": 8, "h_dim": 12, "step": 3}
    assert _tree_allclose(trees["model"], params)
    assert _tree_allclose(trees["optG"], opt_state)


def test_orbax_meta_only_and_lenient(tmp_path):
    tree = {"a": jnp.ones((2, 3)), "b": jnp.zeros(4)}
    path = tmp_path / "c.orbax"
    save_checkpoint(path, {"model": tree}, {"x": 1})
    assert load_meta(path) == {"x": 1}
    bigger = {"a": jnp.ones((2, 3)), "b": jnp.zeros(4), "extra": jnp.full(2, 7.0)}
    with pytest.raises(KeyError):
        load_checkpoint(path, {"model": bigger})
    trees, _ = load_checkpoint(path, {"model": bigger}, strict=False)
    np.testing.assert_array_equal(np.asarray(trees["model"]["extra"]),
                                  np.full(2, 7.0))  # template kept
    np.testing.assert_array_equal(np.asarray(trees["model"]["a"]), np.ones((2, 3)))


def test_orbax_overwrite_latest_semantics(tmp_path):
    path = tmp_path / "ckpt_latest.orbax"
    save_checkpoint(path, {"model": {"w": jnp.zeros(3)}}, {"step": 500})
    save_checkpoint(path, {"model": {"w": jnp.ones(3)}}, {"step": 1000})
    trees, meta = load_checkpoint(path, {"model": {"w": jnp.zeros(3)}})
    assert meta["step"] == 1000
    np.testing.assert_array_equal(np.asarray(trees["model"]["w"]), np.ones(3))


def test_orbax_async_save(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3)}
    path = tmp_path / "ckpt_async.orbax"
    save_checkpoint(path, {"model": tree}, {"step": 1}, async_save=True)
    wait_for_saves()
    trees, meta = load_checkpoint(path, {"model": tree})
    assert meta["step"] == 1
    assert _tree_allclose(trees["model"], tree)
    # async on the NPZ backend is a contract error, not a silent sync save
    with pytest.raises(ValueError, match="async_save requires"):
        save_checkpoint(tmp_path / "x.npz", {"model": tree}, {}, async_save=True)


def test_find_checkpoint_both_formats(tmp_path):
    assert find_checkpoint(tmp_path, "ckpt_best") is None
    save_checkpoint(tmp_path / "ckpt_best.orbax", {"m": {"w": jnp.zeros(2)}}, {})
    assert find_checkpoint(tmp_path, "ckpt_best").suffix == ".orbax"
    save_checkpoint(tmp_path / "ckpt_best.npz", {"m": {"w": jnp.zeros(2)}}, {})
    assert find_checkpoint(tmp_path, "ckpt_best").suffix == ".npz"  # npz preferred
    assert is_orbax_path("a/ckpt_best.orbax") and not is_orbax_path("a/b.npz")


@pytest.mark.slow
def test_train_orbax_end_to_end_and_resume(tmp_path):
    from eegsynth.train.timegan import train_single_npz

    rng = np.random.default_rng(0)
    fp = tmp_path / "posture1_no_exo.npz"
    np.savez_compressed(fp, X=rng.uniform(0, 1, (6, 16, 2)).astype(np.float32),
                        fs=np.float32(128.0))
    out = tmp_path / "run"
    with pytest.raises(ValueError, match="async_ckpt requires"):
        train_single_npz(fp, out, ckpt_format="npz", async_ckpt=True)
    with pytest.raises(ValueError, match="ckpt_format"):
        train_single_npz(fp, out, ckpt_format="pickle")

    train_single_npz(fp, out, ae_epochs=1, sup_epochs=1, gan_steps=2, chunk=2,
                     batch_size=4, acf_max_lag=4, ckpt_format="orbax",
                     async_ckpt=True)
    assert (out / "ckpt_latest.orbax").is_dir()
    assert (out / "ckpt_best.orbax").is_dir()
    assert not (out / "ckpt_latest.npz").exists()
    assert np.isfinite(np.load(out / "synthetic.npz")["X"]).all()

    # resume picks up the orbax checkpoint and appends GAN steps 3-4
    res = train_single_npz(fp, out, resume=True, ae_epochs=1, sup_epochs=1,
                           gan_steps=4, chunk=2, batch_size=4, acf_max_lag=4,
                           ckpt_format="orbax")
    rows = (out / "train_log.csv").read_text().strip().split("\n")
    assert rows[-1].startswith("4,GAN") and len(rows) == 5
    assert res["best_step"] >= 1

    # generate_long_synth-style rebuild from the orbax checkpoint
    meta = load_meta(out / "ckpt_best.orbax")
    cfg = TimeGANConfig(x_dim=meta["x_dim"], z_dim=meta["z_dim"],
                        h_dim=meta["h_dim"])
    template = timegan_init(jax.random.key(0), cfg)
    trees, _ = load_checkpoint(out / "ckpt_best.orbax", {"model": template})
    from eegsynth.train.timegan import synthesize
    x = synthesize(trees["model"], cfg, jax.random.key(1), n=3, seq_len=16)
    assert x.shape == (3, 16, 2) and np.isfinite(np.asarray(x)).all()


@pytest.mark.slow
def test_cgan_orbax_fullstate_resume(tmp_path):
    """Only the full-state resume checkpoint switches to orbax; every
    generator artifact keeps its reference-contract NPZ name."""
    from eegsynth.train.cgan import train_one_condition

    rng = np.random.default_rng(1)
    data_dir = tmp_path / "prep"
    data_dir.mkdir()
    for p in range(1, 10):
        np.savez_compressed(
            data_dir / f"posture{p}_no_exo.npz",
            X=rng.uniform(0, 1, (6, 768, 14)).astype(np.float32),
            posture=np.int32(p), condition="no_exo", fs=np.float32(128.0),
            ch_names=np.array([f"ch{i}" for i in range(14)], dtype=object),
            scale_min=np.zeros(14, np.float32),
            scale_range=np.ones(14, np.float32))
    tiny = dict(arch="transformer", tf_dim=32, tf_depth=1, tf_heads=2,
                tf_patch=8, batch_size=8, save_every=2, print_every=10,
                use_diffaugment=False, r1_gamma=0.0)

    run_dir = tmp_path / "runs" / "no_exo"
    with pytest.raises(ValueError, match="async_ckpt requires"):
        train_one_condition(data_dir, tmp_path / "bad", "no_exo", epochs=1,
                            ckpt_format="npz", async_ckpt=True, **tiny)
    train_one_condition(data_dir, tmp_path / "runs", "no_exo", epochs=2,
                        ckpt_format="orbax", async_ckpt=True,
                        log=lambda *a: None, **tiny)
    ckpt = run_dir / "checkpoint_epoch2.orbax"
    assert ckpt.is_dir()
    assert (run_dir / "CGAN_generator_no_exo_best.npz").is_file()  # NPZ kept
    rows1 = (run_dir / "metrics.csv").read_text().strip().split("\n")

    res = train_one_condition(data_dir, tmp_path / "runs", "no_exo", epochs=4,
                              ckpt_format="orbax", resume=str(ckpt),
                              log=lambda *a: None, **tiny)
    rows2 = (run_dir / "metrics.csv").read_text().strip().split("\n")
    assert rows2[:3] == rows1
    assert [r.split(",")[0] for r in rows2[3:]] == ["3", "4"]
    assert np.isfinite(res["best_g"])
    assert (run_dir / "checkpoint_epoch4.orbax").is_dir()


def test_find_checkpoint_prefers_newest(tmp_path):
    """When both backend formats exist for one stem (e.g. a run resumed with
    a different --ckpt_format), the most recently written checkpoint wins —
    a fixed preference would silently serve stale weights."""
    import os
    import time

    from eegsynth.train import checkpoint as ckpt_io

    trees = {"model": {"w": np.ones(3, np.float32)}}
    npz = tmp_path / "ckpt_best.npz"
    orb = tmp_path / "ckpt_best.orbax"
    ckpt_io.save_checkpoint(npz, trees, {"v": 1})
    ckpt_io.save_checkpoint(orb, trees, {"v": 2})
    now = time.time()
    os.utime(npz, (now - 100, now - 100))
    os.utime(orb, (now, now))
    assert ckpt_io.find_checkpoint(tmp_path, "ckpt_best") == orb
    os.utime(npz, (now + 100, now + 100))
    assert ckpt_io.find_checkpoint(tmp_path, "ckpt_best") == npz
    assert ckpt_io.find_checkpoint(tmp_path, "nope") is None
