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


@partial(jax.jit, static_argnames=("epochs", "lr", "classify"))
def _train_full_batch(params, X, y, w, epochs: int, lr: float, classify: bool):
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


@jax.jit
def _infer_last(params, X):
    return _forward_last(params, X)


def discriminative_score(real: np.ndarray, fake: np.ndarray, epochs: int = 20,
                         lr: float = 1e-3, hidden: int = 24, seed: int = 0):
    """Balanced real-vs-fake GRU classifier accuracy + AUC
    (evaluation.py:72-98): n=min counts, 70/30 stratified split, full-batch."""
    n = min(len(real), len(fake))
    idx_r = np.random.RandomState(seed).permutation(len(real))[:n]
    idx_f = np.random.RandomState(seed + 1).permutation(len(fake))[:n]
    X = np.concatenate([real[idx_r], fake[idx_f]], axis=0).astype(np.float32)
    y = np.concatenate([np.ones(n), np.zeros(n)]).astype(np.float32)
    Xtr, Xte, ytr, yte = train_test_split(X, y, test_size=0.3, stratify=y,
                                          random_state=seed)
    params = _rnn_head_init(jax.random.key(seed), X.shape[-1], hidden, 1)
    Xp, yp, w = _pad_rows([Xtr, ytr[:, None]])
    params, _ = _train_full_batch(params, jnp.asarray(Xp), jnp.asarray(yp),
                                  jnp.asarray(w), epochs, lr, True)
    Xq, wq = _pad_rows([Xte])
    logits = np.asarray(_infer_last(params, jnp.asarray(Xq)))[: len(Xte)]
    p = (1.0 / (1.0 + np.exp(-logits))).ravel()
    yhat = (p >= 0.5).astype(int)
    acc = accuracy_score(yte, yhat)
    try:
        auc = roc_auc_score(yte, p)
    except ValueError:
        auc = float("nan")
    return acc, auc


def predictive_score(X_train: np.ndarray, y_train: np.ndarray,
                     X_test: np.ndarray, y_test: np.ndarray,
                     epochs: int = 50, lr: float = 1e-3, hidden: int = 24,
                     seed: int = 0):
    """GRU regressor RMSE + R² — TSTR/TRTS wiring handled by callers
    (evaluation.py:100-115,192-195)."""
    params = _rnn_head_init(jax.random.key(seed), X_train.shape[-1], hidden,
                            y_train.shape[-1])
    Xp, yp, w = _pad_rows([np.asarray(X_train, np.float32),
                           np.asarray(y_train, np.float32)])
    params, _ = _train_full_batch(params, jnp.asarray(Xp), jnp.asarray(yp),
                                  jnp.asarray(w), epochs, lr, False)
    Xq, _ = _pad_rows([np.asarray(X_test, np.float32)])
    yhat = np.asarray(_infer_last(params, jnp.asarray(Xq)))[: len(X_test)]
    rmse = float(np.sqrt(mean_squared_error(y_test, yhat)))
    r2 = float(r2_score(y_test, yhat, multioutput="uniform_average"))
    return rmse, r2
