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


@partial(jax.jit, static_argnames=("epochs", "lr", "classify"))
def _train_full_batch(params, X, y, epochs: int, lr: float, classify: bool):
    opt = optax.adam(lr)
    state = opt.init(params)

    def loss_fn(p):
        out = _forward_last(p, X)
        if classify:
            prob = jax.nn.sigmoid(out)
            logp = jnp.clip(jnp.log(prob), -100.0, None)
            log1mp = jnp.clip(jnp.log1p(-prob), -100.0, None)
            return -jnp.mean(y * logp + (1 - y) * log1mp)
        return jnp.mean((out - y) ** 2)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (params, _), losses = jax.lax.scan(step, (params, state), None, length=epochs)
    return params, losses


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
    params, _ = _train_full_batch(params, jnp.asarray(Xtr),
                                  jnp.asarray(ytr[:, None]), epochs, lr, True)
    p = np.asarray(jax.nn.sigmoid(_forward_last(params, jnp.asarray(Xte)))).ravel()
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
    params, _ = _train_full_batch(params, jnp.asarray(X_train, dtype=jnp.float32),
                                  jnp.asarray(y_train, dtype=jnp.float32),
                                  epochs, lr, False)
    yhat = np.asarray(_forward_last(params, jnp.asarray(X_test, dtype=jnp.float32)))
    rmse = float(np.sqrt(mean_squared_error(y_test, yhat)))
    r2 = float(r2_score(y_test, yhat, multioutput="uniform_average"))
    return rmse, r2
