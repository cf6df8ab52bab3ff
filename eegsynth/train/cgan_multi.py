"""Train all nine per-posture CGANs simultaneously via vmap.

The reference's v2/v3 flavor trains one condition-conditional model per posture
in a sequential Python loop (`CGAN/cgan_v2.py:370-373`) — embarrassing
parallelism left on the table (SURVEY.md §2.6). Here posture becomes a leading
axis: nine (G, Dg, Dl, EMA, optimizer) stacks advance together, each device
dispatch runs a `lax.scan` of K epochs of the vmapped epoch core from
``eegsynth.train.cgan``, and per-posture best checkpoints are where-selected on
device. Artifacts keep the sequential trainer's per-posture contract
(hparams.json, metrics.csv, best/last/epoch-N generator + best-D saves).

Documented deviations from the sequential per-posture runs (quality-neutral,
same spirit as ``timegan_multi``):
- every posture runs the same static steps/epoch = max over postures of
  N_p // batch (balanced sampling is with replacement anyway);
- per-posture init/noise streams derive from fold_in(seed, posture) instead of
  the reference's identical per-posture seed reset;
- no mid-run resume in this mode (use the sequential trainer for that).
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

from eegsynth.data.datasets import build_label_table, load_posture_both_conditions
from eegsynth.train import checkpoint as ckpt_io
from eegsynth.train.cgan import (
    CGANHParams, METRICS_HEADER_V2, V2_OVERRIDES, _make_epoch_core, build_cfg,
    disc_init, generator_init, generator_meta, make_lr, sigma_at,
)

NUM_POSTURES = 9


def _stack_postures(data_dir, postures):
    """→ stacked X (P, Nmax, C, T), label tables (P, 2, Lmax), counts (P, 2),
    per-posture meta list. Padding rows are never sampled (counts bound the
    balanced sampler's offsets)."""
    Xs, tabs, cnts, metas = [], [], [], []
    for p in postures:
        X, y, meta = load_posture_both_conditions(data_dir, p)
        tab, cnt = build_label_table(y, 2, 0)
        Xs.append(X)
        tabs.append(tab)
        cnts.append(cnt)
        metas.append(meta)
    c, t = Xs[0].shape[1], Xs[0].shape[2]
    n_max = max(x.shape[0] for x in Xs)
    l_max = max(tb.shape[1] for tb in tabs)
    X = np.zeros((len(Xs), n_max, c, t), np.float32)
    tab = np.zeros((len(Xs), 2, l_max), np.int32)
    cnt = np.zeros((len(Xs), 2), np.float32)
    for i, (x, tb, cn) in enumerate(zip(Xs, tabs, cnts)):
        X[i, :x.shape[0]] = x
        tab[i, :, :tb.shape[1]] = tb
        cnt[i] = cn
    n_per = [x.shape[0] for x in Xs]
    return jnp.asarray(X), jnp.asarray(tab), jnp.asarray(cnt), metas, n_per


def _make_multi_chunk(cfg, hp, optG, optD, steps: int, prewarm: bool):
    """K epochs × P postures per dispatch with on-device per-posture best."""
    core = _make_epoch_core(cfg, hp, optG, optD, steps, prewarm)
    vcore = jax.vmap(core, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, 0))

    @jax.jit
    def chunk_fn(G, bn, D, ema, g_state, d_state, best, X, table, counts,
                 sigmas, keys):
        def body(carry, xs):
            (G, bn, D, ema, g_state, d_state, best) = carry
            sigma, key = xs
            G, bn, D, ema, g_state, d_state, logs = vcore(
                G, bn, D, ema, g_state, d_state, X, table, counts, sigma, key)
            if not prewarm:
                g_loss = logs[:, -1, 8]                       # (P,)
                imp = jnp.logical_and(jnp.isfinite(g_loss), g_loss < best["loss"])
                snap = {"G": ema if hp.ema else G, "bn": bn,
                        "dg": D["dg"], "dl": D["dl"]}
                sel = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        imp.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    snap, {k: best[k] for k in snap})
                best = {"loss": jnp.where(imp, g_loss, best["loss"]), **sel}
            return (G, bn, D, ema, g_state, d_state, best), logs

        carry, logs = jax.lax.scan(
            body, (G, bn, D, ema, g_state, d_state, best), (sigmas, keys))
        return carry, logs                                    # logs (K, P, steps, 10)

    return chunk_fn


def train_all_postures(data_dir, runs_root, postures=None, log=print,
                       mesh=None, **hparams) -> dict:
    """Vmapped v2 training: one dispatch advances every posture model.

    With a ``mesh``, the POSTURE axis shards over the mesh's ``data`` axis —
    each device trains its own posture models (padded by repeating the last
    posture up to a mesh-size multiple; padding replicas write no artifacts).
    """
    hp = CGANHParams(**{**V2_OVERRIDES, **hparams, "variant": "v2"})
    postures = list(postures or range(1, NUM_POSTURES + 1))
    cfg = build_cfg(hp, 2)
    runs_root = Path(runs_root)

    X, table, counts, metas, n_per = _stack_postures(data_dir, postures)
    P = len(postures)
    pad_ids = list(postures)
    if mesh is not None:
        pad = (-P) % mesh.devices.size
        if pad:
            X = jnp.concatenate([X] + [X[-1:]] * pad, axis=0)
            table = jnp.concatenate([table] + [table[-1:]] * pad, axis=0)
            counts = jnp.concatenate([counts] + [counts[-1:]] * pad, axis=0)
            pad_ids += [postures[-1]] * pad
    P_all = len(pad_ids)
    steps = max(1, max(n // hp.batch_size for n in n_per))
    total_epochs = hp.prewarm + hp.epochs
    log(f"[multi] {P} postures (+{P_all - P} pad), N={n_per}, "
        f"steps/epoch {steps} (uniform), {total_epochs} epochs")

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(hp.seed), i))(
        jnp.asarray(pad_ids))    # keyed by posture id → subset runs reproduce
    G, bn = jax.vmap(lambda k: generator_init(k, cfg))(keys)
    # D init tags must sit above generator_init's split(key, 8) fan-out:
    # fold_in(k, i) == split(k, n)[i] for threefry, so fold_in(k, 1)/2 would
    # be bit-identical to the generator's own up-block init subkeys.
    D = {"dg": jax.vmap(lambda k: disc_init(jax.random.fold_in(k, 0x5EED0001), cfg))(keys),
         "dl": jax.vmap(lambda k: disc_init(jax.random.fold_in(k, 0x5EED0002), cfg))(keys)}
    ema = jax.tree_util.tree_map(lambda a: a, G)
    optG = optax.adam(make_lr(hp, steps, hp.lr_g), b1=hp.beta1, b2=hp.beta2)
    optD = optax.adam(make_lr(hp, steps * max(1, hp.d_steps), hp.lr_d,
                              epoch_offset=hp.prewarm),
                      b1=hp.beta1, b2=hp.beta2)
    g_state = jax.vmap(optG.init)(G)
    d_state = jax.vmap(optD.init)(D)
    best = {"loss": jnp.full((P_all,), jnp.inf, jnp.float32),
            "G": ema, "bn": bn, "dg": D["dg"], "dl": D["dl"]}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as Pspec
        shard = NamedSharding(mesh, Pspec("data"))
        (X, table, counts, G, bn, D, ema, g_state, d_state, best) = jax.device_put(
            (X, table, counts, G, bn, D, ema, g_state, d_state, best), shard)

    # Multihost: processes share the FS — only the coordinator writes
    # artifacts (same invariant as the sequential trainers).
    from eegsynth.train.sharding import fetch_global, is_coordinator
    write_artifacts = is_coordinator()
    dirs = []
    for p in postures:
        d = runs_root / f"posture{p}"
        if write_artifacts:
            d.mkdir(parents=True, exist_ok=True)
            with open(d / "hparams.json", "w") as f:
                json.dump({**dataclasses.asdict(hp), "tag": f"posture{p}",
                           "parallel_postures": True}, f, indent=2)
            if not (d / "metrics.csv").exists():
                (d / "metrics.csv").write_text(METRICS_HEADER_V2)
        dirs.append(d)

    chunk_fns = {
        False: _make_multi_chunk(cfg, hp, optG, optD, steps, prewarm=False),
        True: (_make_multi_chunk(cfg, hp, optG, optD, steps, prewarm=True)
               if hp.prewarm > 0 else None),
    }

    def save_generator(path, params, bn_state, tag):
        ckpt_io.save_checkpoint(path, {"model": params, "bn": bn_state},
                                generator_meta(hp, 2, tag))

    def slice_p(tree, i):
        return jax.tree_util.tree_map(lambda a: a[i], tree)

    def flush_best():
        # fetch_global is a COLLECTIVE in multihost (posture shards live on
        # other processes) — every process joins; only the coordinator writes
        host = fetch_global(best)                  # one batched pull
        if not write_artifacts:
            return
        for i, (p, d) in enumerate(zip(postures, dirs)):
            if not np.isfinite(host["loss"][i]):
                continue
            tag = f"posture{p}"
            save_generator(d / f"CGAN_generator_{tag}_best.npz",
                           slice_p(host["G"], i), slice_p(host["bn"], i), tag)
            ckpt_io.save_checkpoint(d / f"CGAN_globalD_{tag}_best.npz",
                                    {"model": slice_p(host["dg"], i)}, {"tag": tag})
            ckpt_io.save_checkpoint(d / f"CGAN_localD_{tag}_best.npz",
                                    {"model": slice_p(host["dl"], i)}, {"tag": tag})

    key = jax.random.key(hp.seed + 1)
    t0 = time.perf_counter()
    ep = 0
    while ep < total_epochs:
        prewarm = ep < hp.prewarm
        bound = hp.prewarm if prewarm else total_epochs
        next_save = (ep // hp.save_every + 1) * hp.save_every
        k = min(bound, next_save, ep + max(1, hp.epochs_per_dispatch)) - ep
        sigmas = jnp.asarray([sigma_at(hp, total_epochs, e)
                              for e in range(ep, ep + k)], jnp.float32)
        key, sub = jax.random.split(key)
        ekeys = jax.vmap(lambda kk: jax.random.split(kk, P_all))(
            jax.random.split(sub, k))                       # (k, P_all)
        (G, bn, D, ema, g_state, d_state, best), logs = chunk_fns[prewarm](
            G, bn, D, ema, g_state, d_state, best, X, table, counts, sigmas, ekeys)
        logs = np.asarray(logs)                             # (k, P, steps, 10)
        for i in range(k):
            e = ep + i
            for j, d in enumerate(dirs):
                diag = logs[i, j, :, :8].mean(axis=0)
                gl, dl_ = float(logs[i, j, -1, 8]), float(logs[i, j, -1, 9])
                if write_artifacts:
                    with open(d / "metrics.csv", "a") as f:
                        f.write(f"{e+1},{gl},{dl_},"
                                + ",".join(f"{v}" for v in diag) + "\n")
            if (e + 1) % hp.print_every == 0 or e == 0:
                gl = logs[i, :P, -1, 8]
                log(f"[multi] Ep {e+1}/{total_epochs} | G per posture "
                    + " ".join(f"{v:.2f}" for v in gl))
        ep += k
        if ep % hp.save_every == 0:
            hostG = fetch_global({"G": G, "bn": bn})     # collective first
            if write_artifacts:
                for i, (p, d) in enumerate(zip(postures, dirs)):
                    save_generator(d / f"CGAN_generator_posture{p}_epoch{ep}.npz",
                                   slice_p(hostG["G"], i), slice_p(hostG["bn"], i),
                                   f"posture{p}")
            flush_best()

    flush_best()
    hostG = fetch_global({"G": ema if hp.ema else G, "bn": bn})
    if write_artifacts:
        for i, (p, d) in enumerate(zip(postures, dirs)):
            save_generator(d / f"CGAN_generator_posture{p}_last.npz",
                           slice_p(hostG["G"], i), slice_p(hostG["bn"], i),
                           f"posture{p}")
    dt = time.perf_counter() - t0
    agg = total_epochs * steps * P / dt if dt > 0 else float("nan")
    best_host = np.asarray(fetch_global(best["loss"]))[:P]     # drop mesh pads
    log(f"[multi] Done in {dt:.1f}s — {agg:.1f} aggregate steps/s; "
        f"best G per posture: {np.round(best_host, 3).tolist()}")
    return {"best_g": best_host, "aggregate_steps_per_sec": agg,
            "metas": metas, "cfg": cfg}
