"""Post-hoc GRU discriminative / predictive scores (TSTR / TRTS).

Rebuild of timeGAN/evaluation.py:42-115: a 1-layer GRU(hidden 24) classifier
trained 20 full-batch Adam epochs scores real-vs-fake; a GRU predictor trained
50 epochs regresses the last timestep from the first T−1. Training runs as one
jitted `lax.scan` over epochs on the accelerator; splitting and metrics stay on
host sklearn for bit-parity of the protocol.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import optax
from sklearn.metrics import accuracy_score, mean_squared_error, r2_score, roc_auc_score
from sklearn.model_selection import train_test_split

from eegsynth.nn.gru import gru_apply


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _rnn_head_init(key, input_dim: int, hidden: int, out_dim: int):
    """torch default init: GRU and Linear params ~ U(±1/sqrt(hidden))."""
    ks = jax.random.split(key, 6)
    b = 1.0 / np.sqrt(hidden)
    return {
        "gru": [{
            "w_ih": _uniform(ks[0], (3 * hidden, input_dim), b),
            "w_hh": _uniform(ks[1], (3 * hidden, hidden), b),
            "b_ih": _uniform(ks[2], (3 * hidden,), b),
            "b_hh": _uniform(ks[3], (3 * hidden,), b),
        }],
        "out": {"w": _uniform(ks[4], (out_dim, hidden), b),
                "b": _uniform(ks[5], (out_dim,), b)},
    }


def _forward_last(params, x):
    y = gru_apply(params["gru"][0], x)
    last = y[:, -1, :]
    return last @ params["out"]["w"].T + params["out"]["b"]


def _pad_rows(arrs, floor: int = 64):
    """Zero-pad the batch axis UP to the next power of two (≥ ``floor``);
    returns (*padded, weights). Bucket row counts vary 26–186 (and ~3.3k for
    the global pass), and every distinct shape costs a fresh multi-minute
    remote-tunnel compile of the jitted training scan — pow-2 rounding bounds
    the distinct shapes at log-many (64, 128, 256, …) while capping padded
    compute at 2×. Zero-weight rows contribute exact zeros to the weighted
    losses, so results are unchanged."""
    n = arrs[0].shape[0]
    m = floor
    while m < n:
        m *= 2
    w = np.zeros((m,), np.float32)
    w[:n] = 1.0
    out = []
    for a in arrs:
        p = np.zeros((m,) + a.shape[1:], np.float32)
        p[:n] = a
        out.append(p)
    return (*out, w)


def _train_core(params, X, y, w, epochs: int, lr: float, classify: bool):
    opt = optax.adam(lr)
    state = opt.init(params)
    wc = w[:, None]
    n = jnp.sum(w)

    def loss_fn(p):
        out = _forward_last(p, X)
        if classify:
            prob = jax.nn.sigmoid(out)
            logp = jnp.clip(jnp.log(prob), -100.0, None)
            log1mp = jnp.clip(jnp.log1p(-prob), -100.0, None)
            return -jnp.sum(wc * (y * logp + (1 - y) * log1mp)) / n
        return jnp.sum(wc * (out - y) ** 2) / (n * y.shape[-1])

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, state), None, length=epochs)
    return params, losses


@partial(jax.jit, static_argnames=("epochs", "lr", "classify"))
def _train_infer_many(params, X, y, w, Xq, epochs: int, lr: float, classify: bool):
    """Train a stack of independent scorers and score their test sets in ONE
    dispatch. The reference trains each pair's scorer in its own loop
    (evaluate_18.py:179-233); here every pair whose padded shapes coincide
    rides one vmapped executable — through the remote TPU attachment the eval
    wall is dispatch round-trips, not compute (BASELINE.md evaluate_18 row)."""
    def one(p, x, t, m, xq):
        p2, _ = _train_core(p, x, t, m, epochs, lr, classify)
        return _forward_last(p2, xq)
    return jax.vmap(one)(params, X, y, w, Xq)


def _run_grouped(tasks: list[dict], epochs: int, lr: float, classify: bool,
                 mesh=None):
    """Each task: {params, Xtr, ytr, w, Xte} (already padded). Returns
    per-task host logits/outputs on the padded test rows, in input order.
    Tasks are grouped by their full shape signature; each group costs one
    device dispatch and one host pull.

    ``mesh`` shards the task dimension over the mesh's devices — the scorers
    are independent, so each device trains its slice of the stack with no
    collectives (one scorer per chip on a v5e-8). Equivalence to the
    unsharded path is tested on an 8-device CPU mesh."""
    out: list = [None] * len(tasks)
    groups: dict = {}
    for i, t in enumerate(tasks):
        key = (t["Xtr"].shape, t["ytr"].shape, t["Xte"].shape)
        groups.setdefault(key, []).append(i)
    ndev = int(mesh.devices.size) if mesh is not None else 1
    for idxs in groups.values():
        # the task dim is a compile dimension too: pad it to a power of two
        # (repeating the first task; its extra lanes are discarded) so a
        # different pair count next run reuses the same executable instead of
        # paying a fresh multi-minute remote-tunnel compile. Under a mesh the
        # floor is the device count so the task axis shards evenly.
        g = 1
        while g < max(len(idxs), ndev):
            g *= 2
        padded = idxs + [idxs[0]] * (g - len(idxs))
        P = jax.tree.map(lambda *ls: jnp.stack(ls),
                         *[tasks[i]["params"] for i in padded])
        stack = lambda name: jnp.stack([tasks[i][name] for i in padded])
        args = (P, stack("Xtr"), stack("ytr"), stack("w"), stack("Xte"))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            args = tuple(jax.device_put(a, sh) for a in args)
        res = np.asarray(_train_infer_many(*args, epochs, lr, classify))
        for j, i in enumerate(idxs):
            out[i] = res[j]
    return out


def discriminative_scores_batch(pairs: list[tuple[np.ndarray, np.ndarray]],
                                epochs: int = 20, lr: float = 1e-3,
                                hidden: int = 24, seed: int = 0,
                                mesh=None) -> list[tuple]:
    """Balanced real-vs-fake GRU classifier accuracy + AUC for MANY
    (real, fake) pairs (evaluation.py:72-98 per pair: n=min counts, 70/30
    stratified split, full-batch Adam). The host protocol — permutations,
    split, init — is exactly the single-pair one per pair; only the device
    work is fused (see :func:`_run_grouped`)."""
    tasks, truths = [], []
    for real, fake in pairs:
        n = min(len(real), len(fake))
        idx_r = np.random.RandomState(seed).permutation(len(real))[:n]
        idx_f = np.random.RandomState(seed + 1).permutation(len(fake))[:n]
        X = np.concatenate([real[idx_r], fake[idx_f]], axis=0).astype(np.float32)
        y = np.concatenate([np.ones(n), np.zeros(n)]).astype(np.float32)
        Xtr, Xte, ytr, yte = train_test_split(X, y, test_size=0.3, stratify=y,
                                              random_state=seed)
        params = _rnn_head_init(jax.random.key(seed), X.shape[-1], hidden, 1)
        Xp, yp, w = _pad_rows([Xtr, ytr[:, None]])
        Xq, _ = _pad_rows([Xte])
        tasks.append({"params": params, "Xtr": Xp, "ytr": yp, "w": w, "Xte": Xq})
        truths.append(yte)
    results = []
    for yte, logits in zip(truths,
                       _run_grouped(tasks, epochs, lr, True, mesh=mesh)):
        p = (1.0 / (1.0 + np.exp(-logits[: len(yte)]))).ravel()
        acc = accuracy_score(yte, (p >= 0.5).astype(int))
        try:
            auc = roc_auc_score(yte, p)
        except ValueError:
            auc = float("nan")
        results.append((acc, auc))
    return results


def predictive_scores_batch(tasks_in: list[tuple], epochs: int = 50,
                            lr: float = 1e-3, hidden: int = 24,
                            seed: int = 0, mesh=None) -> list[tuple]:
    """GRU regressor RMSE + R² for MANY (X_train, y_train, X_test, y_test)
    tasks (evaluation.py:100-115); TSTR/TRTS wiring stays with callers."""
    tasks, truths = [], []
    for X_train, y_train, X_test, y_test in tasks_in:
        params = _rnn_head_init(jax.random.key(seed), X_train.shape[-1],
                                hidden, y_train.shape[-1])
        Xp, yp, w = _pad_rows([np.asarray(X_train, np.float32),
                               np.asarray(y_train, np.float32)])
        Xq, _ = _pad_rows([np.asarray(X_test, np.float32)])
        tasks.append({"params": params, "Xtr": Xp, "ytr": yp, "w": w, "Xte": Xq})
        truths.append(np.asarray(y_test))
    results = []
    for y_test, out in zip(truths,
                       _run_grouped(tasks, epochs, lr, False, mesh=mesh)):
        yhat = out[: len(y_test)]
        rmse = float(np.sqrt(mean_squared_error(y_test, yhat)))
        r2 = float(r2_score(y_test, yhat, multioutput="uniform_average"))
        results.append((rmse, r2))
    return results


def discriminative_score(real: np.ndarray, fake: np.ndarray, epochs: int = 20,
                         lr: float = 1e-3, hidden: int = 24, seed: int = 0):
    """Single-pair wrapper over :func:`discriminative_scores_batch`."""
    return discriminative_scores_batch([(real, fake)], epochs=epochs, lr=lr,
                                       hidden=hidden, seed=seed)[0]


def predictive_score(X_train: np.ndarray, y_train: np.ndarray,
                     X_test: np.ndarray, y_test: np.ndarray,
                     epochs: int = 50, lr: float = 1e-3, hidden: int = 24,
                     seed: int = 0):
    """Single-task wrapper over :func:`predictive_scores_batch`."""
    return predictive_scores_batch([(X_train, y_train, X_test, y_test)],
                                   epochs=epochs, lr=lr, hidden=hidden,
                                   seed=seed)[0]
