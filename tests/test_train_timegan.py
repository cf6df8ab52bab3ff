"""Tiny end-to-end TimeGAN training (SURVEY.md §4 integration tier)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eegsynth.models.timegan import TimeGANConfig, adaptive_dims, timegan_init
from eegsynth.train.checkpoint import load_checkpoint, save_checkpoint
from eegsynth.train.timegan import _multistep_lr, synthesize, train_single_npz


def _make_bucket(tmp_path, n=10, t=32, c=3):
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (n, t, c)).astype(np.float32)
    fp = tmp_path / "posture1_no_exo.npz"
    np.savez_compressed(fp, X=X, fs=np.float32(128.0))
    return fp, X


def test_adaptive_dims():
    assert adaptive_dims(14, 768) == (28, 56)   # ckpt meta parity
    assert adaptive_dims(14, 900) == (36, 72)
    assert adaptive_dims(3, 100) == (16, 32)


def test_multistep_lr():
    sched = _multistep_lr(1e-3, (4000, 6000), 0.5)
    assert float(sched(0)) == 1e-3
    assert float(sched(3999)) == 1e-3
    assert float(sched(4000)) == 5e-4
    assert float(sched(6000)) == 2.5e-4


def test_checkpoint_roundtrip(tmp_path):
    cfg = TimeGANConfig(x_dim=3, z_dim=16, h_dim=32)
    params = timegan_init(jax.random.key(0), cfg)
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, {"model": params}, {"npz": "x.npz", "z_dim": 16, "h_dim": 32})
    trees, meta = load_checkpoint(path, {"model": params})
    assert meta["z_dim"] == 16
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: np.allclose(a, b), params, trees["model"]))
    assert chex_equal


def test_train_single_npz_end_to_end(tmp_path):
    fp, X = _make_bucket(tmp_path)
    out = tmp_path / "run"
    # ckpt_format="npz" pins the reference-artifact contract (the default is
    # orbax+async — covered by tests/test_checkpoint_orbax.py)
    res = train_single_npz(fp, out, ae_epochs=2, sup_epochs=2, gan_steps=4,
                           chunk=2, batch_size=4, acf_max_lag=8,
                           ckpt_format="npz")
    # artifacts
    assert (out / "train_log.csv").exists()
    assert (out / "ckpt_latest.npz").exists()
    assert (out / "ckpt_best.npz").exists()
    synth = np.load(out / "synthetic.npz")["X"]
    assert synth.shape == X.shape
    assert np.isfinite(synth).all()
    # log rows: header + 4 GAN steps, finite losses
    rows = (out / "train_log.csv").read_text().strip().split("\n")
    assert rows[0].startswith("step,phase,loss_D")
    assert len(rows) == 5
    vals = np.array([r.split(",")[2:] for r in rows[1:]], dtype=np.float64)
    assert np.isfinite(vals).all()
    assert res["best_step"] >= 1
    # best ckpt loads back into the same structure
    from eegsynth.train.checkpoint import load_checkpoint
    trees, meta = load_checkpoint(out / "ckpt_best.npz", {"model": res["params"]})
    assert meta["best"] is True and meta["z_dim"] == res["cfg"].z_dim


def test_train_deterministic_with_seed(tmp_path):
    fp, _ = _make_bucket(tmp_path, n=6, t=16, c=2)
    r1 = train_single_npz(fp, tmp_path / "a", ae_epochs=1, sup_epochs=1,
                          gan_steps=2, chunk=2, batch_size=4, acf_max_lag=4)
    r2 = train_single_npz(fp, tmp_path / "b", ae_epochs=1, sup_epochs=1,
                          gan_steps=2, chunk=2, batch_size=4, acf_max_lag=4)
    la = (tmp_path / "a" / "train_log.csv").read_text()
    lb = (tmp_path / "b" / "train_log.csv").read_text()
    assert la == lb


def test_synthesize_arbitrary_length():
    cfg = TimeGANConfig(x_dim=3, z_dim=16, h_dim=32)
    params = timegan_init(jax.random.key(0), cfg)
    x = synthesize(params, cfg, jax.random.key(1), n=5, seq_len=100)
    assert x.shape == (5, 100, 3)
    assert np.isfinite(np.asarray(x)).all()
    # fused single-scan cascade == composed three-scan path (the fused path is
    # what synthesize now dispatches to; see models.timegan.fused_gen_refine)
    from eegsynth.models.timegan import decode, gen_latent, refine_latent, sample_noise
    z = sample_noise(jax.random.key(1), 5, 100, cfg.z_dim)
    ref = decode(params, refine_latent(params, gen_latent(params, z)))
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=1e-6)


def test_synthesize_microbatched():
    cfg = TimeGANConfig(x_dim=3, z_dim=16, h_dim=32)
    params = timegan_init(jax.random.key(0), cfg)
    x = synthesize(params, cfg, jax.random.key(1), n=8, seq_len=24, batch=3)
    assert x.shape == (8, 24, 3)       # 3+3+2 pieces, fixed compiled shape
    assert np.isfinite(np.asarray(x)).all()


def test_resume_continues_gan_phase(tmp_path):
    fp, X = _make_bucket(tmp_path, n=6, t=16, c=2)
    out = tmp_path / "run"
    train_single_npz(fp, out, ae_epochs=1, sup_epochs=1, gan_steps=2, chunk=2,
                     batch_size=4, acf_max_lag=4)
    rows1 = (out / "train_log.csv").read_text().strip().split("\n")
    assert len(rows1) == 3  # header + 2
    # resume to 4 steps: skips phases 1-2, appends steps 3-4 to the log
    res = train_single_npz(fp, out, resume=True, ae_epochs=1, sup_epochs=1,
                           gan_steps=4, chunk=2, batch_size=4, acf_max_lag=4)
    rows2 = (out / "train_log.csv").read_text().strip().split("\n")
    assert len(rows2) == 5
    assert rows2[:3] == rows1
    assert rows2[3].startswith("3,GAN") and rows2[4].startswith("4,GAN")
    assert res["best_step"] >= 1


def test_cli_config_and_flag_overrides(tmp_path, monkeypatch):
    """scripts/train_timegan.py: config JSON values load; flags override."""
    import importlib.util
    import json as _json
    spec = importlib.util.spec_from_file_location(
        "train_timegan_cli", "scripts/train_timegan.py")
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(_json.dumps({"gan_steps": 7, "lr_g": 0.5, "seed": 9}))
    cfg = cli.load_config(cfg_path)
    assert cfg["gan_steps"] == 7 and cfg["lr_g"] == 0.5

    # missing config → SystemExit (reference main.py:14-15)
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        cli.load_config(tmp_path / "missing.json")


def test_synthesize_time_chunked():
    cfg = TimeGANConfig(x_dim=3, z_dim=16, h_dim=32)
    params = timegan_init(jax.random.key(0), cfg)
    # non-divisible length: 2 full chunks + a 6-step remainder, plus batch split
    x = synthesize(params, cfg, jax.random.key(1), n=5, seq_len=38,
                   batch=3, time_chunk=16)
    assert x.shape == (5, 38, 3)
    assert np.isfinite(np.asarray(x)).all()


def test_multilayer_dropout_engages(tmp_path):
    # layers>1 + dropout>0: the reference's inter-layer GRU dropout must be
    # live in training forwards (stochastic across keys) and absent at
    # inference; layers=1 must be deterministic regardless.
    from eegsynth.models.timegan import encode
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 3)).astype(np.float32))

    cfg2 = TimeGANConfig(x_dim=3, z_dim=8, h_dim=12, num_layers=2, dropout=0.5)
    p2 = timegan_init(jax.random.key(0), cfg2)
    a = encode(p2, x, dropout=0.5, key=jax.random.key(1), train=True)
    b = encode(p2, x, dropout=0.5, key=jax.random.key(2), train=True)
    c = encode(p2, x)                       # inference: deterministic
    d = encode(p2, x)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))

    # end-to-end: a tiny 2-layer run trains with dropout active
    from eegsynth.train.timegan import train_single_npz
    fp = tmp_path / "posture1_no_exo.npz"
    np.savez(fp, X=rng.uniform(0, 1, (6, 24, 3)).astype(np.float32),
             fs=np.float32(128.0))
    res = train_single_npz(fp, tmp_path / "run", ae_epochs=1, sup_epochs=1,
                           gan_steps=2, chunk=2, batch_size=4, layers=2,
                           dropout=0.3, acf_max_lag=4)
    assert np.isfinite(res["best_loss"])


def test_run_logged_phase_matches_eager_loop(capsys):
    # The deferred-log driver must be a pure pipelining change: same params,
    # same RNG stream, and every epoch printed exactly once, in order, across
    # group boundaries (group=3 with 8 epochs exercises full groups + tail).
    from eegsynth.train.timegan import _run_logged_phase

    def epoch_fn(params, opt_state, X, sub):
        bump = jax.random.uniform(sub, ())
        params = params + bump
        return params, opt_state + 1, params * 2.0

    X = jnp.zeros(())
    p0, s0, k0 = jnp.float32(0.0), 0, jax.random.key(7)

    p_ref, s_ref, k_ref = p0, s0, k0
    for _ in range(8):
        k_ref, sub = jax.random.split(k_ref)
        p_ref, s_ref, _ = epoch_fn(p_ref, s_ref, X, sub)

    p, s, k = _run_logged_phase(epoch_fn, p0, s0, X, k0, 8, "T", "loss",
                                group=3)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), rtol=1e-6)
    assert s == s_ref
    np.testing.assert_array_equal(jax.random.key_data(k),
                                  jax.random.key_data(k_ref))

    lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert [l.split()[2].split("/")[0] for l in lines] == [str(i) for i in range(1, 9)]
    # printed losses are the true per-epoch values, not stale buffers
    p_chk, k_chk = p0, k0
    for i, line in enumerate(lines):
        k_chk, sub = jax.random.split(k_chk)
        p_chk = p_chk + jax.random.uniform(sub, ())
        assert float(line.split("=")[-1]) == pytest.approx(float(p_chk) * 2, abs=1e-4)


def test_fused_step_matches_composed_chunk():
    """hp.fused_step=True must reproduce the composed-scan GAN chunk: the
    fused cells compute the same math on the same RNG stream, so logs and
    updated parameters agree to float tolerance."""
    from eegsynth.train.timegan import (
        TimeGANHParams, make_gan_chunk, make_gan_opts,
    )
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(0, 1, (10, 24, 3)).astype(np.float32))
    cfg = TimeGANConfig(x_dim=3, z_dim=16, h_dim=24)
    params = timegan_init(jax.random.key(0), cfg)

    outs = {}
    for fused in (False, True):
        hp = TimeGANHParams(batch_size=4, gan_steps=3, chunk=3, acf_max_lag=4,
                            fused_step=fused)
        optD, optG = make_gan_opts(hp)
        d_state = optD.init(params["discriminator"])
        gser = {k: params[k]
                for k in ("generator", "supervisor", "embedder", "recovery")}
        g_state = optG.init(gser)
        chunk = make_gan_chunk(cfg, hp, optD, optG, None)(4)
        (p, *_), logs = chunk(params, d_state, g_state, params,
                              jnp.float32(np.inf), jnp.int32(0),
                              jax.random.key(7), jnp.int32(0),
                              jnp.arange(1, 4, dtype=jnp.int32), X)
        outs[fused] = (p, np.asarray(logs))

    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][0]),
                    jax.tree_util.tree_leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_r1_surrogate_matches_direct_penalty(monkeypatch):
    """The forward-over-reverse R1 surrogate (the shipped default,
    train/timegan.py:_R1_FWD_OVER_REV) must reproduce the direct
    reverse-over-reverse penalty: same chunk logs (incl. d_loss, which
    contains the R1 term) and same updated parameters after real optimizer
    steps. They compute the identical value/θ-gradient by construction
    (BASELINE.md derivation); this pins the equivalence as a regression test."""
    import eegsynth.train.timegan as tt

    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.uniform(0, 1, (10, 24, 3)).astype(np.float32))
    cfg = TimeGANConfig(x_dim=3, z_dim=16, h_dim=24)
    params = timegan_init(jax.random.key(1), cfg)
    hp = tt.TimeGANHParams(batch_size=4, gan_steps=3, chunk=3, acf_max_lag=4,
                           r1_gamma=1.0)

    outs = {}
    for fwd_over_rev in (False, True):
        monkeypatch.setattr(tt, "_R1_FWD_OVER_REV", fwd_over_rev)
        optD, optG = tt.make_gan_opts(hp)
        d_state = optD.init(params["discriminator"])
        gser = {k: params[k]
                for k in ("generator", "supervisor", "embedder", "recovery")}
        g_state = optG.init(gser)
        chunk = tt.make_gan_chunk(cfg, hp, optD, optG, None)(4)
        (p, *_), logs = chunk(params, d_state, g_state, params,
                              jnp.float32(np.inf), jnp.int32(0),
                              jax.random.key(9), jnp.int32(0),
                              jnp.arange(1, 4, dtype=jnp.int32), X)
        outs[fwd_over_rev] = (p, np.asarray(logs))

    np.testing.assert_allclose(outs[True][1], outs[False][1],
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs[True][0]),
                    jax.tree_util.tree_leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
