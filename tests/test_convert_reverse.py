"""Reverse checkpoint export (eegsynth → reference torch formats).

The strongest interop contract: our trained weights written as
``ckpt_*.pt`` / ``CGAN_generator_*_best.pth`` that the REFERENCE's own
scripts load unmodified (generate_long_synth.py:96-101 strict
load_state_dict; eval_cgan.py:83-94 safe_load_generator). Checks here:
key-set equality with a committed reference checkpoint, bit-exact
round-trip through the forward converter, and output parity through torch
oracles built from the exported state_dicts.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from convert_torch_ckpt import (
    convert_cgan_generator, convert_timegan_model, reverse_cgan_file,
    reverse_cgan_generator, reverse_timegan_file, reverse_timegan_model,
)

REF_CKPT = Path("/root/reference/timeGAN/timegan_runs/posture1_no_exo/ckpt_latest.pt")


@pytest.fixture(scope="module")
def our_run(tmp_path_factory):
    """A random-weight eegsynth TimeGAN run dir (reference dims)."""
    from eegsynth.models.timegan import TimeGANConfig, timegan_init
    from eegsynth.train.checkpoint import save_checkpoint

    root = tmp_path_factory.mktemp("runs") / "posture1_no_exo"
    root.mkdir()
    cfg = TimeGANConfig(x_dim=14, z_dim=28, h_dim=56)
    params = timegan_init(jax.random.key(3), cfg)
    save_checkpoint(root / "ckpt_latest.npz", {"model": params},
                    {"npz": "posture1_no_exo.npz", "z_dim": 28, "h_dim": 56,
                     "x_dim": 14, "step": 123})
    return root, cfg, params


def test_exported_keys_match_reference_checkpoint(our_run):
    """Key-for-key identical to a committed reference state_dict — the
    necessary and sufficient condition for the reference's strict
    load_state_dict to accept the export."""
    import torch
    if not REF_CKPT.exists():
        pytest.skip("reference checkpoint not on disk")
    root, cfg, params = our_run
    out = root / "ckpt_latest.pt"
    reverse_timegan_file(root / "ckpt_latest.npz", out)
    got = torch.load(out, map_location="cpu", weights_only=False)
    ref = torch.load(REF_CKPT, map_location="cpu", weights_only=False)
    assert set(got["model"].keys()) == set(ref["model"].keys())
    for k in ref["model"]:
        assert tuple(got["model"][k].shape) == tuple(ref["model"][k].shape), k
    assert set(got["meta"]) >= {"npz", "z_dim", "h_dim"}
    assert got["step"] == 123


def test_timegan_reverse_roundtrip_bitexact(our_run):
    """reverse → forward conversion returns the original params bit-exactly
    (weight_v is derived on export and dropped on import)."""
    _, _, params = our_run
    sd = reverse_timegan_model(jax.device_get(params))
    back = convert_timegan_model(sd)
    pa, pb = jax.tree_util.tree_leaves(jax.device_get(params)), \
        jax.tree_util.tree_leaves(back)
    assert len(pa) == len(pb)
    for a, b in zip(pa, pb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_timegan_export_torch_synthesis_parity(our_run, rng):
    """The exported state_dict, driven through torch GRU/Linear modules with
    the reference's G→S→R synthesis cascade, matches our fused cascade on the
    same latent inputs (the generate_long_synth.py:117-121 compute path)."""
    import torch
    from eegsynth.models.timegan import fused_gen_refine

    root, cfg, params = our_run
    sd = reverse_timegan_model(jax.device_get(params))

    def gru(net, in_dim, h_dim):
        g = torch.nn.GRU(in_dim, h_dim, batch_first=True)
        with torch.no_grad():
            g.weight_ih_l0.copy_(sd[f"{net}.rnn.rnn.weight_ih_l0"])
            g.weight_hh_l0.copy_(sd[f"{net}.rnn.rnn.weight_hh_l0"])
            g.bias_ih_l0.copy_(sd[f"{net}.rnn.rnn.bias_ih_l0"])
            g.bias_hh_l0.copy_(sd[f"{net}.rnn.rnn.bias_hh_l0"])
        return g

    def lin(prefix):
        w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
        m = torch.nn.Linear(w.shape[1], w.shape[0])
        with torch.no_grad():
            m.weight.copy_(w)
            m.bias.copy_(b)
        return m

    z = rng.uniform(0, 1, (4, 96, 28)).astype(np.float32)
    with torch.no_grad():
        e, _ = gru("generator", 28, 56)(torch.from_numpy(z))
        e = lin("generator.proj")(e)
        h, _ = gru("supervisor", 28, 56)(e)
        h = lin("supervisor.proj")(h)
        xr, _ = gru("recovery", 28, 56)(h)
        x_ref = lin("recovery.out")(xr).numpy()
    _, x_got = fused_gen_refine(params, jnp.asarray(z), with_decode=True)
    np.testing.assert_allclose(np.asarray(x_got), x_ref, atol=5e-5)


def test_cgan_reverse_roundtrip_and_torch_parity(tmp_path, rng):
    """CGAN generator: export → forward-convert round-trip is bit-exact, and
    the exported .pth drives the functional torch Generator oracle to the
    same output as our generate path."""
    import torch
    from test_convert_cgan import _torch_gen_forward
    from eegsynth.models.cgan import generator_apply
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, generator_init, generator_meta,
    )
    from eegsynth.train.checkpoint import save_checkpoint

    hp = CGANHParams()
    cfg = build_cfg(hp, 9)
    G, bn = generator_init(jax.random.key(5), cfg)
    # make BN running stats non-trivial so the export carries real state
    bn = jax.tree_util.tree_map(
        lambda a: a + jnp.asarray(rng.uniform(0.1, 0.5, a.shape), a.dtype), bn)
    root = tmp_path / "no_exo"
    root.mkdir()
    save_checkpoint(root / "CGAN_generator_no_exo_best.npz",
                    {"model": G, "bn": bn}, generator_meta(hp, 9, "no_exo"))

    out = root / "CGAN_generator_no_exo_best.pth"
    reverse_cgan_file(root / "CGAN_generator_no_exo_best.npz", out)
    sd = torch.load(out, map_location="cpu", weights_only=True)

    # round-trip bit-exactness
    p2, bn2, ncls, ndim = convert_cgan_generator(sd)
    assert (ncls, ndim) == (9, cfg.noise_dim)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get((G, bn))),
                    jax.tree_util.tree_leaves((p2, bn2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # output parity vs the functional torch oracle (eval-mode BN)
    z = rng.standard_normal((3, cfg.noise_dim)).astype(np.float32)
    labels = np.array([0, 4, 8])
    x_ref = _torch_gen_forward(sd, torch.from_numpy(z),
                               torch.from_numpy(labels))
    x_got = generator_apply(G, bn, jnp.asarray(z), jnp.asarray(labels), cfg,
                            train=False)[0]
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref), atol=2e-5)


def test_cgan_reverse_refuses_transformer(tmp_path):
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, generator_init, generator_meta,
    )
    from eegsynth.train.checkpoint import save_checkpoint

    hp = CGANHParams(arch="transformer", tf_dim=32, tf_depth=1, tf_heads=2,
                     tf_patch=8)
    cfg = build_cfg(hp, 9)
    G, bn = generator_init(jax.random.key(0), cfg)
    root = tmp_path / "no_exo"
    root.mkdir()
    fp = root / "CGAN_generator_no_exo_best.npz"
    save_checkpoint(fp, {"model": G, "bn": bn}, generator_meta(hp, 9, "no_exo"))
    with pytest.raises(KeyError, match="transformer"):
        reverse_cgan_file(fp, root / "out.pth")

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
