"""Train every (posture, condition) TimeGAN simultaneously via vmap.

The reference trains its 18 bucket models sequentially in a Python for-loop
(train_timegan.py:468-495) — embarrassing parallelism left on the table
(SURVEY.md §2.6). Here the buckets become a leading axis: parameters, optimizer
states, and best-checkpoint tracking are stacked pytrees, every phase step is
``jax.vmap``-ed over that axis, and one device dispatch advances all models at
once. With a mesh, the bucket axis shards across devices (pad buckets to a
multiple of the mesh size).

Semantics deviations from the sequential trainer (documented, quality-neutral):
- batches are sampled uniformly WITH replacement from each bucket's valid
  prefix (buckets have different N; shapes must be static and uniform);
- AE/supervisor phases run a uniform ``epochs × ceil(max_N / batch)`` steps per
  bucket instead of per-bucket epoch boundaries;
- per-bucket init/noise streams derive from ``fold_in(seed, bucket)`` instead of
  the reference's identical per-bucket seed reset.
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eegsynth.data.io import bucket_paths
from eegsynth.losses.timegan import recon_loss
from eegsynth.models.timegan import (
    TimeGANConfig, adaptive_dims, encode, reconstruct, refine_latent, timegan_init,
)
from eegsynth.train import checkpoint as ckpt_io
from eegsynth.train.timegan import (
    TIMEGAN_G_WEIGHT_NAMES, TimeGANHParams, _make_opt, _multistep_lr,
    make_gan_chunk, make_gan_opts, synthesize,
)


def _stack_buckets(files):
    Xs, names, fss = [], [], []
    for fp in files:
        data = np.load(fp)
        Xs.append(data["X"].astype(np.float32))
        names.append(Path(fp).stem)
        fss.append(float(data["fs"]) if "fs" in data.files else 128.0)
    T, C = Xs[0].shape[1], Xs[0].shape[2]
    assert all(x.shape[1:] == (T, C) for x in Xs), "buckets must share (T, C)"
    n_valid = np.array([len(x) for x in Xs], dtype=np.int32)
    n_max = int(n_valid.max())
    X = np.zeros((len(Xs), n_max, T, C), dtype=np.float32)
    for i, x in enumerate(Xs):
        X[i, :len(x)] = x
    return jnp.asarray(X), jnp.asarray(n_valid), names, T, C, fss


def _make_pre_phase(hp, opt, which: str):
    """Step-based vmapped AE / supervisor phase (replacement batches)."""

    def one_step(carry, _):
        params, opt_state, key, X, n_valid = carry
        key, k_idx = jax.random.split(key)
        B = min(hp.batch_size, X.shape[0])
        idx = jnp.floor(jax.random.uniform(k_idx, (B,)) * n_valid).astype(jnp.int32)
        x = X[idx]

        if which == "ae":
            def loss_fn(er):
                p = {**params, **er}
                return recon_loss(x, reconstruct(p, x))
            sub = {"embedder": params["embedder"], "recovery": params["recovery"]}
        else:
            h = jax.lax.stop_gradient(encode(params, x))

            def loss_fn(sup):
                p = {**params, "supervisor": sup}
                h_pred = refine_latent(p, h[:, :-1, :])
                return jnp.mean((h_pred - h[:, 1:, :]) ** 2)
            sub = params["supervisor"]

        loss, grads = jax.value_and_grad(loss_fn)(sub)
        updates, opt_state = opt.update(grads, opt_state, sub)
        sub = optax.apply_updates(sub, updates)
        if which == "ae":
            params = {**params, **sub}
        else:
            params = {**params, "supervisor": sub}
        return (params, opt_state, key, X, n_valid), loss

    def phase(params, opt_state, key, X, n_valid, n_steps):
        carry = (params, opt_state, key, X, n_valid)
        carry, losses = jax.lax.scan(one_step, carry, None, length=n_steps)
        # the evolved key is returned so the driver can chunk the phase into
        # several dispatches with EXACTLY the carried-key stream (the
        # runtime's per-dispatch execution watchdog applies to these scans
        # too at larger-than-reference workloads — see dispatch_budget)
        return carry[0], carry[1], carry[2], losses

    return jax.jit(jax.vmap(phase, in_axes=(0, 0, 0, 0, 0, None)),
                   static_argnums=(5,))


# For threefry, fold_in(k, i) == split(k, n)[i] for ANY n — so phase tags must
# sit far above every split fan-out used anywhere in the program (the widest
# here is split(key, 21) in the CGAN epoch core; inits split ≤8), or the
# "fresh" phase keys would be bit-identical to subkeys already consumed by
# init/steps. 0x5EED0000 + tag is safely out of range of any fan-out index.
_PHASE_TAG_BASE = 0x5EED0000


def _advance_keys(keys, tag: int):
    """Per-bucket key stream for the next phase. fold_in with a distinct
    high tag — NOT ``split(keys)[0]`` (equals the carried key after one phase
    step, replaying the previous phase's batch-index randomness) and NOT a
    small tag (fold_in(k, i) == split(k, n)[i], colliding with init subkeys)."""
    return jax.vmap(lambda k: jax.random.fold_in(k, _PHASE_TAG_BASE + tag))(keys)


def train_all_buckets(data_dir, out_root, mesh=None, log_every: int = 100,
                      profile_dir=None, bucket_weights=None,
                      max_stack: int | None = None,
                      dispatch_budget: int = 2000,
                      ckpt_every: int | None = None,
                      resume: bool = False, **hparams) -> dict:
    """Vmapped multi-bucket training; writes the same per-bucket artifact set
    (train_log.csv, ckpt_latest/ckpt_best, synthetic.npz) as the sequential
    driver. Returns aggregate throughput stats.

    With a ``mesh``, the bucket axis is sharded over the mesh's ``data`` axis
    (buckets are padded by repeating the last one up to a mesh-size multiple;
    padding buckets train but write no artifacts).

    ``bucket_weights``: optional ``{bucket_name: {weight: value}}`` per-bucket
    G-loss weight overrides (weights from TIMEGAN_G_WEIGHT_NAMES — the
    reference tunes ONE global set in timegan_config.json:24-27; per-bucket
    values are a framework extra). The weights enter the GAN chunk as a traced
    (nb, 4) matrix, so every bucket still trains through the one shared
    executable. Buckets not named keep the hp defaults; ``None`` (default)
    bakes the hp floats in as constants (bit-identical to the pre-weights
    trainer).

    ``dispatch_budget``: cap on device work per GAN dispatch, in
    reference-scaled bucket-steps (nb × steps × (B/64) × (T/768) per
    dispatch). ROOT CAUSE (round-4 bisect, scripts/bisect_nb8.py): the
    remote TPU runtime in this environment kills its worker when ONE
    dispatch executes for more than ~55-60 s of device time — round 3's
    "crashes at nb ≥ 8" rule was this watchdog in disguise (at chunk=500,
    nb=7 ≈ 54 s squeaked under it; nb=7 × chunk=650 and nb=2 × chunk=2500
    crash identically, nb=18 × chunk=125 is fine). The fix is to cap the
    per-dispatch step count, NOT to split the bucket stack: all nb buckets
    stay in ONE vmapped executable (measured on the v5e: nb=8 single-stack
    64.3 agg steps/s vs the old 4+4 sub-stacks' 51.7-56.9; nb=18 — the
    reference's full workload — 71.9 agg steps/s at chunk 125). The default
    budget of 2000 keeps a dispatch at ~31 s measured, a ~45% margin under
    the watchdog including the tunnel's ±20% variance. Extra dispatches are
    ~170 µs-170 ms tunnel round-trips each — <1% of wall at the reference
    config. RNG note: chunk boundaries key the per-chunk fold_in stream, so
    a capped run's batch sequence differs from an uncapped one after the
    first boundary — distribution-identical, same per-bucket semantics
    (``hp.chunk`` was already such a knob).

    ``max_stack``: legacy escape hatch — if set, GAN dispatches additionally
    vmap at most this many buckets at once, splitting into
    sequentially-dispatched sub-stacks with identical per-bucket semantics
    (unit-tested). Default ``None`` (no sub-stacking): the round-3
    workaround for the watchdog crash above, superseded by
    ``dispatch_budget``; meshes shard the bucket axis across devices and
    never sub-stack.

    ``ckpt_every``: crash-recovery cadence in GAN steps — at each crossing,
    the FULL stacked training state (params, both optimizer states, best
    tracking, accumulated logs) plus the step counter is written to
    ``out_root/_multi_state.npz``. ``resume=True`` restores it and continues:
    the RNG key schedule is a pure function of (seed, completed chunk count)
    — init → per-phase fold_in tags → one tag-4 advance per GAN chunk — so a
    resumed run's remaining trajectory is IDENTICAL to an uninterrupted run
    with the same chunk schedule (tests/test_resume_crash.py). The reference
    has no recovery story at all (SURVEY.md §5); its 18 sequential runs lose
    everything on a crash. Default off (zero overhead; each save pulls the
    stacked state through the device→host tunnel, seconds per save — pick a
    cadence of thousands of steps). Unsupported with ``mesh``/``max_stack``
    sub-stacks (raises).
    """
    out_root = Path(out_root)
    # fused-scan GAN step is the measured winner for the vmapped trainer
    # (66.3 vs 56.1 aggregate steps/s on v5e, BASELINE.md); numerics-identical,
    # and make_gan_chunk falls back to composed scans where the fused cells
    # don't apply (multi-layer / active dropout)
    hparams.setdefault("fused_step", True)
    hp = TimeGANHParams(**hparams)
    files = bucket_paths(data_dir)
    if not files:
        raise SystemExit(f"No NPZs found in {data_dir}")
    X, n_valid, names, T, C, fss = _stack_buckets(files)
    n_real_buckets = X.shape[0]
    if mesh is not None:
        n_dev = mesh.devices.size
        pad = (-n_real_buckets) % n_dev
        if pad:
            X = jnp.concatenate([X] + [X[-1:]] * pad, axis=0)
            n_valid = jnp.concatenate([n_valid] + [n_valid[-1:]] * pad)
    nb, n_max = X.shape[0], X.shape[1]
    z_dim, h_dim = adaptive_dims(C, T)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim,
                        num_layers=hp.layers, dropout=hp.dropout)
    print(f"==> {nb} buckets | T={T} C={C} z={z_dim} h={h_dim} "
          f"N∈[{int(jnp.min(n_valid))},{n_max}]", flush=True)

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(hp.seed), i))(
        jnp.arange(nb))
    params = jax.vmap(timegan_init, in_axes=(0, None))(keys, cfg)
    keys = _advance_keys(keys, 1)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        shard = NamedSharding(mesh, P("data"))
        X = jax.device_put(X, shard)
        n_valid = jax.device_put(n_valid, shard)
        params = jax.device_put(params, shard)
        keys = jax.device_put(keys, shard)

    steps_per_epoch = -(-n_max // min(hp.batch_size, n_max))
    t_all = time.perf_counter()

    # Per-dispatch device-time cap (see dispatch_budget in the docstring),
    # shared by the pre-phases and the GAN phase. Work per dispatch scales
    # ~linearly in nb, B and T at this geometry (BASELINE.md batch-scaling
    # table), so the budget is expressed in reference-scaled bucket-steps.
    # With a mesh the buckets spread over the devices, so per-device work
    # divides by the mesh size. Pre-phase steps are several times cheaper
    # than GAN steps; reusing the GAN budget for them is conservative (at
    # the reference config they still fit in one dispatch, bit-identical to
    # the unchunked path — chunk boundaries thread the carried keys, so
    # chunking never changes the stream).
    n_dev_eff = 1 if mesh is None else mesh.devices.size
    scale = (min(hp.batch_size, n_max) / 64.0) * (T / 768.0) * nb / n_dev_eff
    chunk_cap = max(1, int(dispatch_budget / max(scale, 1e-9)))

    if (ckpt_every or resume) and (mesh is not None or (
            max_stack is not None and nb > max_stack)):
        raise ValueError("ckpt_every/resume support the default single-stack "
                         "single-process trainer only (no mesh/max_stack)")
    state_path = out_root / "_multi_state.npz"
    resume_from = None  # (done, chunks_done) — trees load after templates exist
    if resume and state_path.exists():
        rmeta = ckpt_io.load_meta(state_path)
        expect = {"names": ",".join(names), "seed": hp.seed,
                  "gan_steps": hp.gan_steps,
                  "chunk_eff": min(hp.chunk, chunk_cap)}
        got = {k: type(v)(rmeta.get(k)) for k, v in expect.items()}
        if got != expect:
            raise ValueError(f"{state_path} does not match this run "
                             f"(saved {got}, expected {expect}) — wrong "
                             "out_root or changed config")
        resume_from = (int(rmeta["done"]), int(rmeta["chunks_done"]))
        print(f"==> resuming GAN phase from step {resume_from[0]} "
              f"({state_path})", flush=True)

    def run_pre_phase(phase_fn, params, state, keys, n_total):
        done, loss_parts = 0, []
        while done < n_total:
            ns = min(chunk_cap, n_total - done)
            params, state, keys, lo = phase_fn(params, state, keys, X,
                                               n_valid, ns)
            loss_parts.append(lo)
            done += ns
        return params, jnp.concatenate(loss_parts, axis=1)

    # Phase 1 + 2 (skipped on resume: the restored state supersedes them;
    # the tag advances are pure key functions and must still happen so the
    # GAN-phase key schedule is the pure (seed, chunk count) function the
    # resume contract relies on)
    if resume_from is None:
        optER = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
        er0 = jax.vmap(lambda p: {"embedder": p["embedder"], "recovery": p["recovery"]})(params)
        state = jax.vmap(optER.init)(er0)
        ae_phase = _make_pre_phase(hp, optER, "ae")
        params, ae_losses = run_pre_phase(ae_phase, params, state, keys,
                                          hp.ae_epochs * steps_per_epoch)
        keys = _advance_keys(keys, 2)
        print(f"[AE] {hp.ae_epochs * steps_per_epoch} steps × {nb} buckets  "
              f"final recon≈{float(jnp.mean(ae_losses[:, -1])):.5f}", flush=True)

        optS = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
        state = jax.vmap(lambda p: optS.init(p["supervisor"]))(params)
        sup_phase = _make_pre_phase(hp, optS, "sup")
        params, sup_losses = run_pre_phase(sup_phase, params, state, keys,
                                           hp.sup_epochs * steps_per_epoch)
        keys = _advance_keys(keys, 3)
        print(f"[SUP] {hp.sup_epochs * steps_per_epoch} steps × {nb} buckets  "
              f"final sup≈{float(jnp.mean(sup_losses[:, -1])):.5f}", flush=True)
    else:
        keys = _advance_keys(_advance_keys(keys, 2), 3)

    # Phase 3: vmapped GAN chunks
    optD, optG = make_gan_opts(hp)
    d_state = jax.vmap(lambda p: optD.init(p["discriminator"]))(params)
    g_state = jax.vmap(lambda p: optG.init(
        {k: p[k] for k in ("generator", "supervisor", "embedder", "recovery")}))(params)

    B_eff = min(hp.batch_size, n_max)
    gw = None
    if bucket_weights:
        unknown = set(bucket_weights) - set(names)
        if unknown:
            raise ValueError(f"bucket_weights for unknown buckets "
                             f"{sorted(unknown)}; have {names}")
        W = np.tile(np.asarray([getattr(hp, n) for n in TIMEGAN_G_WEIGHT_NAMES],
                               np.float32), (nb, 1))
        for bname, overrides in bucket_weights.items():
            bad = set(overrides) - set(TIMEGAN_G_WEIGHT_NAMES)
            if bad:
                raise ValueError(f"unsweepable weights {sorted(bad)}; "
                                 f"sweepable: {TIMEGAN_G_WEIGHT_NAMES}")
            b = names.index(bname)
            for j, n in enumerate(TIMEGAN_G_WEIGHT_NAMES):
                W[b, j] = float(overrides.get(n, W[b, j]))
        gw = jnp.asarray(W)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            gw = jax.device_put(gw, NamedSharding(mesh, P("data")))
        print("==> per-bucket G weights active for "
              f"{sorted(bucket_weights)}", flush=True)
    gan_chunk = make_gan_chunk(cfg, hp, optD, optG, None)(
        B_eff, with_valid_n=True, vmapped=True, with_weights=gw is not None)

    best_params = params
    best_loss = jnp.full((nb,), jnp.inf, jnp.float32)
    best_step = jnp.zeros((nb,), jnp.int32)
    # GAN-phase instance of the shared per-dispatch cap (chunk_cap above)
    chunk_eff = min(hp.chunk, chunk_cap)

    done0, chunks_done, resume_logs = 0, 0, None
    if resume_from is not None:
        done0, chunks_done = resume_from
        templates = {"model": params, "optD": d_state, "optG": g_state,
                     "best": best_params, "best_loss": best_loss,
                     "best_step": best_step,
                     "logs": np.zeros((nb, done0, 8), np.float32)}
        trees, _ = ckpt_io.load_checkpoint(state_path, templates)
        params, d_state, g_state = trees["model"], trees["optD"], trees["optG"]
        best_params, best_loss, best_step = (trees["best"], trees["best_loss"],
                                             trees["best_step"])
        resume_logs = np.asarray(trees["logs"])
        # fast-forward the key schedule: one tag-4 advance per completed chunk
        for _ in range(chunks_done):
            keys = _advance_keys(keys, 4)

    if chunk_eff < hp.chunk:
        print(f"==> per-dispatch GAN steps capped {hp.chunk} → {chunk_eff} "
              f"(dispatch_budget={dispatch_budget} ref bucket-steps; the "
              "runtime kills dispatches over ~55 s of device time)",
              flush=True)
    # legacy sub-stacks (max_stack escape hatch); one group == the default
    if mesh is not None or max_stack is None or nb <= max_stack:
        slices = [slice(0, nb)]
    else:
        # balance group sizes (8 → 4+4, 18 → 6+6+6): equal shapes share ONE
        # compiled executable instead of paying a cold compile per odd tail
        ngroups = -(-nb // max_stack)
        base, rem = divmod(nb, ngroups)
        sizes = [base + (1 if i < rem else 0) for i in range(ngroups)]
        edges = np.concatenate([[0], np.cumsum(sizes)])
        slices = [slice(int(a), int(b)) for a, b in zip(edges[:-1], edges[1:])]
        print(f"==> GAN phase in {len(slices)} sub-stacks {sizes} "
              "(runtime nb limit; semantics unchanged)", flush=True)
    tsl = lambda tree, sl: jax.tree_util.tree_map(lambda a: a[sl], tree)
    groups = [{"params": tsl(params, sl), "d": tsl(d_state, sl),
               "g": tsl(g_state, sl), "bp": tsl(best_params, sl),
               "bl": best_loss[sl], "bs": best_step[sl], "X": X[sl],
               "nv": n_valid[sl].astype(jnp.float32),
               "gw": None if gw is None else gw[sl], "logs": []}
              for sl in slices]
    # Print one chunk behind the dispatch frontier: the pull of chunk k's logs
    # (a tunnel round-trip) overlaps chunk k+1's device work instead of
    # serializing every dispatch. logs hold DEVICE arrays; one batched
    # device_get after the loop fetches them all.
    pending = None  # (step count, device logs) of the last dispatched chunk

    def show(p):
        p_done, p_logs = p
        row = np.concatenate([np.asarray(lg)[:, -1, :] for lg in p_logs])
        print(f"[GAN] step {p_done}/{hp.gan_steps}  mean over {nb} buckets: "
              f"D={row[:, 0].mean():.4f} acc≈{row[:, 1].mean():.2f} "
              f"G={row[:, 2].mean():.4f}", flush=True)

    def save_state(done, chunks):
        out_root.mkdir(parents=True, exist_ok=True)
        g0 = groups[0]  # ckpt_every is gated to the single-group path
        parts = ([resume_logs] if resume_logs is not None else []) + \
            [np.asarray(lg) for lg in g0["logs"]]
        logs_host = (np.concatenate(parts, axis=1) if parts
                     else np.zeros((nb, 0, 8), np.float32))
        ckpt_io.save_checkpoint(
            state_path,
            {"model": g0["params"], "optD": g0["d"], "optG": g0["g"],
             "best": g0["bp"], "best_loss": g0["bl"], "best_step": g0["bs"],
             "logs": logs_host},
            {"names": ",".join(names), "seed": hp.seed,
             "gan_steps": hp.gan_steps, "chunk_eff": chunk_eff,
             "done": int(done), "chunks_done": int(chunks)})
        print(f"[state] saved {state_path.name} @ step {done}", flush=True)

    from eegsynth.train.faults import maybe_inject_crash

    prof = None
    if profile_dir is not None:
        prof = jax.profiler.trace(str(profile_dir))
        prof.__enter__()
    t0 = time.perf_counter()
    done = done0
    while done < hp.gan_steps:
        n_steps = min(chunk_eff, hp.gan_steps - done)
        keys = _advance_keys(keys, 4)  # chained: input differs each chunk
        steps_arr = jnp.arange(1, n_steps + 1, dtype=jnp.int32)
        chunk_logs = []
        for grp, sl in zip(groups, slices):
            extra = (grp["nv"],) if grp["gw"] is None else (grp["nv"], grp["gw"])
            (grp["params"], grp["d"], grp["g"], grp["bp"], grp["bl"],
             grp["bs"], _), logs = gan_chunk(
                grp["params"], grp["d"], grp["g"], grp["bp"], grp["bl"],
                grp["bs"], keys[sl], jnp.int32(done), steps_arr,
                grp["X"], *extra)
            grp["logs"].append(logs)               # (nb_g, n_steps, 8) device
            chunk_logs.append(logs)
        done += n_steps
        chunks_done += 1
        if (ckpt_every and done < hp.gan_steps
                and done // ckpt_every > (done - n_steps) // ckpt_every):
            save_state(done, chunks_done)
        maybe_inject_crash(done)  # no-op unless the test env var is set
        if pending is not None:
            show(pending)
        pending = (done, chunk_logs)
    if pending is not None:
        # barrier: this pull is data-dependent on the whole run, so the clock
        # below stops only after every chunk has executed (timing protocol)
        show(pending)
    # stitch the sub-stacks back into full (nb, ...) stacked trees
    if len(groups) == 1:
        g0 = groups[0]
        params, d_state, g_state = g0["params"], g0["d"], g0["g"]
        best_params, best_loss, best_step = g0["bp"], g0["bl"], g0["bs"]
        all_logs = ([resume_logs] if resume_logs is not None else []) + g0["logs"]
    else:
        cat = lambda key: jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *[g[key] for g in groups])
        params, d_state, g_state = cat("params"), cat("d"), cat("g")
        best_params, best_loss, best_step = cat("bp"), cat("bl"), cat("bs")
        all_logs = [jnp.concatenate([g["logs"][c] for g in groups], axis=0)
                    for c in range(len(groups[0]["logs"]))]
    gan_seconds = time.perf_counter() - t0
    if prof is not None:
        prof.__exit__(None, None, None)
    agg_steps_per_sec = n_real_buckets * (hp.gan_steps - done0) / max(
        gan_seconds, 1e-9)
    total_seconds = time.perf_counter() - t_all
    print(f"[GAN] {nb}×{hp.gan_steps - done0} steps in {gan_seconds:.1f}s → "
          f"{agg_steps_per_sec:.1f} aggregate steps/s", flush=True)

    # Per-bucket artifacts (coordinator only: multihost runs share the FS,
    # and N processes appending/rewriting the same files corrupts them —
    # same gating as the sequential trainers). fetch_global first, on ALL
    # processes: with a mesh the bucket axis is sharded, so indexing device
    # trees at [b] would touch non-addressable shards in multihost.
    from eegsynth.train.sharding import fetch_global, is_coordinator
    host = fetch_global({"model": params, "optG": g_state, "optD": d_state,
                         "best_loss": best_loss, "best_step": best_step,
                         "n_valid": n_valid})
    best_step, best_loss, n_valid = (host["best_step"], host["best_loss"],
                                     host["n_valid"])
    best_host = fetch_global(best_params)
    logs_cat = np.concatenate(jax.device_get(all_logs), axis=1)  # (nb, gan_steps, 8)
    meta_base = {"z_dim": z_dim, "h_dim": h_dim,
                 "x_dim": C, "layers": hp.layers}
    for b, name in enumerate(names if is_coordinator() else []):
        out_dir = out_root / name
        out_dir.mkdir(parents=True, exist_ok=True)
        with open(out_dir / "train_log.csv", "w") as f:
            f.write("step,phase,loss_D,acc_D,loss_G,loss_adv,loss_sup,"
                    "loss_rec,loss_cov,loss_acf\n")
            for s in range(hp.gan_steps):
                f.write(f"{s+1},GAN," + ",".join(repr(float(v))
                        for v in logs_cat[b, s]) + "\n")
        take = lambda tree: jax.tree_util.tree_map(lambda a: a[b], tree)
        ckpt_io.save_checkpoint(out_dir / "ckpt_latest.npz",
                                {"model": take(host["model"]),
                                 "optG": take(host["optG"]),
                                 "optD": take(host["optD"])},
                                {**meta_base, "npz": f"{name}.npz",
                                 "fs": fss[b], "step": hp.gan_steps})
        ckpt_io.save_checkpoint(out_dir / "ckpt_best.npz",
                                {"model": take(best_host),
                                 "optG": take(host["optG"]),
                                 "optD": take(host["optD"])},
                                {**meta_base, "npz": f"{name}.npz", "best": True,
                                 "fs": fss[b], "step": int(best_step[b]),
                                 "best_loss": float(best_loss[b])})
        n_b = int(n_valid[b])
        key_b = jax.random.fold_in(jax.random.key(hp.seed ^ 0x5eed), b)
        X_hat = synthesize(take(host["model"]), cfg, key_b, n_b, T)
        np.savez_compressed(out_dir / "synthetic.npz",
                            X=np.asarray(X_hat, np.float32))
        print(f"[{name}] artifacts written (best@{int(best_step[b])})", flush=True)

    return {"aggregate_steps_per_sec": agg_steps_per_sec,
            "gan_seconds": gan_seconds, "total_seconds": total_seconds,
            "n_buckets": n_real_buckets, "n_padded": nb - n_real_buckets}
