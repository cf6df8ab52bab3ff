"""Vmapped CGAN loss-weight sweep: S weight settings trained in one dispatch.

The reference tunes its CGAN loss weights by hand, one sequential GPU run per
setting (CGAN/cgan.py:34-102 defaults are the end product). Here the SWEEP
axis becomes a vmap axis: the G-step loss weights enter the jitted epoch core
as a traced ``(len(G_WEIGHT_NAMES),)`` vector (train/cgan.py epoch_core), so
ONE executable advances every sweep point simultaneously — one compile, one
device dispatch per chunk, and every point consumes the IDENTICAL RNG stream
(same init, same balanced batches, same noise), isolating the weight effect
from run-to-run variance. Built to tune the transformer arch's weights, which
round 1 shipped with conv-tuned values (QUALITY.md CGAN family section).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eegsynth.data.datasets import build_label_table, load_condition_dataset
from eegsynth.train import checkpoint as ckpt_io
from eegsynth.train.cgan import (
    CGANHParams, G_WEIGHT_NAMES, _make_epoch_core, build_cfg, disc_init,
    generator_init, generator_meta, make_lr, sigma_at,
)

NUM_POSTURES = 9


def _stack(tree, s: int):
    """Replicate a pytree along a new leading sweep axis (identical inits —
    sweep points differ ONLY by their loss-weight vectors)."""
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (s,) + a.shape), tree)


def weight_matrix(hp: CGANHParams, grid: list[dict]) -> np.ndarray:
    """(S, len(G_WEIGHT_NAMES)) f32: hp defaults overridden per sweep point."""
    W = np.zeros((len(grid), len(G_WEIGHT_NAMES)), np.float32)
    for i, overrides in enumerate(grid):
        unknown = set(overrides) - set(G_WEIGHT_NAMES)
        if unknown:
            raise ValueError(f"unsweepable weights {sorted(unknown)}; "
                             f"sweepable: {G_WEIGHT_NAMES}")
        if hp.variant == "v1" and "amp_weight" in overrides:
            # amp_calib_loss only exists on the v2 loss branch
            # (train/cgan.py epoch_core); under v1 the override would pass
            # validation yet produce a bit-identical sweep point.
            raise ValueError("amp_weight only affects variant='v2'; "
                             "overriding it in a v1 sweep is a silent no-op")
        for j, n in enumerate(G_WEIGHT_NAMES):
            W[i, j] = float(overrides.get(n, getattr(hp, n)))
    return W


def _make_sweep_chunk(cfg, hp, optG, optD, steps: int, prewarm: bool):
    """K epochs × S sweep points per dispatch, on-device per-point best."""
    core = _make_epoch_core(cfg, hp, optG, optD, steps, prewarm)
    # X/table/counts/sigma/key shared across sweep points; weights axis 0
    vcore = jax.vmap(core, in_axes=(0, 0, 0, 0, 0, 0,
                                    None, None, None, None, None, 0))

    @jax.jit
    def chunk_fn(G, bn, D, ema, g_state, d_state, best, X, table, counts,
                 sigmas, keys, W):
        def body(carry, xs):
            (G, bn, D, ema, g_state, d_state, best) = carry
            sigma, key = xs
            G, bn, D, ema, g_state, d_state, logs = vcore(
                G, bn, D, ema, g_state, d_state, X, table, counts, sigma, key, W)
            if not prewarm:
                g_loss = logs[:, -1, 8]                       # (S,)
                imp = jnp.logical_and(jnp.isfinite(g_loss), g_loss < best["loss"])
                snap = {"G": ema if hp.ema else G, "bn": bn}
                sel = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        imp.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    snap, {k: best[k] for k in snap})
                best = {"loss": jnp.where(imp, g_loss, best["loss"]), **sel}
            return (G, bn, D, ema, g_state, d_state, best), logs

        carry, logs = jax.lax.scan(
            body, (G, bn, D, ema, g_state, d_state, best), (sigmas, keys))
        return carry, logs                                    # logs (K, S, steps, 10)

    return chunk_fn


def sweep_condition(data_dir, out_root, condition: str, grid: list[dict],
                    log=print, **hparams) -> list[dict]:
    """Train len(grid) v1 models (one per weight setting) simultaneously.

    Writes ``{out_root}/sweep{i}/`` with hparams.json (including the resolved
    weight vector) and best/last generator NPZs loadable by
    ``train.cgan.load_generator``. Returns per-point summaries.
    """
    hp = CGANHParams(**{"variant": "v1", **hparams})
    np.random.seed(hp.seed)
    X_np, y_np, _ = load_condition_dataset(data_dir, condition)
    cfg = build_cfg(hp, NUM_POSTURES)
    W = jnp.asarray(weight_matrix(hp, grid))
    S = len(grid)
    out_root = Path(out_root)

    key = jax.random.key(hp.seed)
    kG, kDg, kDl, key = jax.random.split(key, 4)
    G1, bn1 = generator_init(kG, cfg)
    G, bn = _stack(G1, S), _stack(bn1, S)
    D = _stack({"dg": disc_init(kDg, cfg), "dl": disc_init(kDl, cfg)}, S)
    ema = jax.tree_util.tree_map(lambda a: a, G)

    steps = max(1, X_np.shape[0] // hp.batch_size)
    optG = optax.adam(make_lr(hp, steps, hp.lr_g), b1=hp.beta1, b2=hp.beta2)
    optD = optax.adam(make_lr(hp, steps * max(1, hp.d_steps), hp.lr_d,
                              epoch_offset=hp.prewarm),
                      b1=hp.beta1, b2=hp.beta2)
    g_state = jax.vmap(optG.init)(G)
    d_state = jax.vmap(optD.init)(D)
    best = {"loss": jnp.full((S,), jnp.inf, jnp.float32), "G": ema, "bn": bn}

    table_np, counts_np = build_label_table(y_np, cfg.num_classes, 1)
    X = jnp.asarray(X_np)
    table = jnp.asarray(table_np)
    counts = jnp.asarray(counts_np, dtype=jnp.float32)

    total_epochs = hp.prewarm + hp.epochs
    log(f"[sweep:{condition}] {S} weight settings × {total_epochs} epochs, "
        f"steps/epoch {steps}")
    dirs = []
    for i, overrides in enumerate(grid):
        d = out_root / f"sweep{i}"
        d.mkdir(parents=True, exist_ok=True)
        resolved = dict(zip(G_WEIGHT_NAMES, np.asarray(W[i]).tolist()))
        with open(d / "hparams.json", "w") as f:
            json.dump({**dataclasses.asdict(hp), **resolved,
                       "tag": f"sweep{i}", "sweep_overrides": overrides}, f,
                      indent=2)
        dirs.append(d)

    chunk_fns = {
        False: _make_sweep_chunk(cfg, hp, optG, optD, steps, prewarm=False),
        True: (_make_sweep_chunk(cfg, hp, optG, optD, steps, prewarm=True)
               if hp.prewarm > 0 else None),
    }

    t0 = time.perf_counter()
    ep, last_g = 0, np.full((S,), np.nan)
    while ep < total_epochs:
        prewarm = ep < hp.prewarm
        bound = hp.prewarm if prewarm else total_epochs
        k = min(bound, ep + max(1, hp.epochs_per_dispatch)) - ep
        sigmas = jnp.asarray([sigma_at(hp, total_epochs, e)
                              for e in range(ep, ep + k)], jnp.float32)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, k)
        (G, bn, D, ema, g_state, d_state, best), logs = chunk_fns[prewarm](
            G, bn, D, ema, g_state, d_state, best, X, table, counts,
            sigmas, keys, W)
        logs = np.asarray(logs)
        last_g = logs[-1, :, -1, 8]
        ep += k
        if ep % max(1, hp.print_every) < k or ep >= total_epochs:
            log(f"[sweep:{condition}] Ep {ep}/{total_epochs} | G per point "
                + " ".join(f"{v:.2f}" for v in last_g))

    host = jax.device_get({"best": best, "G": ema if hp.ema else G, "bn": bn})
    results = []
    for i, d in enumerate(dirs):
        tag = f"sweep{i}"
        sl = lambda t: jax.tree_util.tree_map(lambda a: np.asarray(a[i]), t)
        meta = generator_meta(hp, cfg.num_classes, tag)
        if np.isfinite(host["best"]["loss"][i]):
            ckpt_io.save_checkpoint(d / f"CGAN_generator_{tag}_best.npz",
                                    {"model": sl(host["best"]["G"]),
                                     "bn": sl(host["best"]["bn"])}, meta)
        ckpt_io.save_checkpoint(d / f"CGAN_generator_{tag}_last.npz",
                                {"model": sl(host["G"]), "bn": sl(host["bn"])},
                                meta)
        results.append({"dir": str(d), "weights": dict(
            zip(G_WEIGHT_NAMES, np.asarray(W[i]).tolist())),
            "best_g": float(host["best"]["loss"][i]),
            "last_g": float(last_g[i])})
    dt = time.perf_counter() - t0
    log(f"[sweep:{condition}] Done in {dt:.1f}s "
        f"({total_epochs * steps * S / dt:.1f} aggregate steps/s)")
    return results
