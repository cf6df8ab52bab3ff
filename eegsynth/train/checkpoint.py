"""Flat-pytree NPZ checkpoints with JSON meta.

Plays the role of the reference's ``torch.save({"step","model","optG","optD",
"meta"})`` payloads (train_timegan.py:58-61) — same logical contract
(ckpt_latest / ckpt_best + meta {npz, z_dim, h_dim[, best]}), stored as a
compressed NPZ of path-flattened arrays so no pickle is involved.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _pull_leaves(leaves: list) -> list[np.ndarray]:
    """Device→host fetch of many arrays with overlapped transfers.

    The remote TPU attachment charges per-array round-trip latency: a ~630-leaf
    train state (157 MB) takes ~45 s with one synchronous ``np.asarray`` per
    leaf but ~17 s via ``jax.device_get`` on the whole list (async copies
    pipeline the latency), with no tracing/compilation involved.
    """
    return jax.device_get(leaves)


def _flatten(tree: Any, prefix: str = "") -> dict[str, Any]:
    """Path-keyed leaves, NOT materialized to host — save_checkpoint pulls
    them in one batched transfer via _pull_leaves."""
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = prefix + jax.tree_util.keystr(path)
        flat[key] = leaf
    return flat


def save_checkpoint(path: Path | str, trees: dict[str, Any], meta: dict) -> None:
    """``trees``: named pytrees (e.g. {"model": params, "optG": ..., "optD": ...}).

    Arrays go into one NPZ under ``<name><treepath>`` keys; ``meta`` plus the
    treedefs' structure are restored by unflattening into a caller-provided
    template (see :func:`load_checkpoint`). Device arrays are fetched with one
    fused transfer (see :func:`_pull_leaves`).
    """
    payload: dict[str, Any] = {}
    for name, tree in trees.items():
        payload.update(_flatten(tree, prefix=name))
    keys = list(payload)
    pulled = _pull_leaves([payload[k] for k in keys])
    payload = dict(zip(keys, pulled))
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8).copy()
    np.savez_compressed(path, **payload)


def load_meta(path: Path | str) -> dict:
    """Read only the JSON meta of a checkpoint (cheap — no tree rebuild)."""
    with np.load(path) as data:
        return json.loads(bytes(data["__meta__"]).decode("utf-8"))


def load_checkpoint(path: Path | str, templates: dict[str, Any],
                    strict: bool = True):
    """Restore named pytrees into the structure of ``templates``.

    Returns (trees, meta). Leaves are matched by flattened path key; dtype
    follows the stored array. ``strict=False`` keeps the template's value for
    missing leaves (with a warning) — the lenient-loading capability of the
    reference's ``safe_load_generator`` key-rename fallback
    (CGAN/eval_cgan.py:83-94).
    """
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
    out = {}
    for name, template in templates.items():
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in paths_and_leaves:
            key = name + jax.tree_util.keystr(p)
            if key not in data.files:
                if strict:
                    raise KeyError(f"checkpoint {path} missing leaf {key}")
                print(f"[ckpt] missing leaf {key}; keeping template value",
                      flush=True)
                leaves.append(np.asarray(leaf))
            else:
                leaves.append(data[key])
        out[name] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out, meta
