"""Flat-pytree checkpoints with JSON meta — NPZ (default) or Orbax backend.

Plays the role of the reference's ``torch.save({"step","model","optG","optD",
"meta"})`` payloads (train_timegan.py:58-61) — same logical contract
(ckpt_latest / ckpt_best + meta {npz, z_dim, h_dim[, best]}), stored as
path-flattened arrays so no pickle is involved.

Backends (selected by path suffix, same API either way):

- ``*.npz`` — one compressed NPZ of the flat arrays + a ``__meta__`` JSON blob.
- ``*.orbax`` — an Orbax checkpoint directory holding the SAME flat payload
  (StandardSave) plus the meta as JSON (SURVEY.md §5: "keep resume; add
  periodic orbax checkpoints"). ``save_checkpoint(..., async_save=True)`` uses
  ``ocp.AsyncCheckpointer``: the device→host pull and serialization overlap
  with subsequent training dispatches — through the remote TPU attachment a
  synchronous pull of a large train state costs many seconds (see
  :func:`_pull_leaves`), so async saves hide exactly the cost that made
  per-step checkpointing untenable. Call :func:`wait_for_saves` before reading
  a checkpoint back or exiting.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any

import jax
import numpy as np

_ORBAX_SUFFIX = ".orbax"
_sync_ckptr = None
_async_ckptr = None


def is_orbax_path(path: Path | str) -> bool:
    return str(path).endswith(_ORBAX_SUFFIX)


def find_checkpoint(run_dir: Path | str, stem: str) -> Path | None:
    """Existing checkpoint named ``stem`` in either backend format. When both
    formats exist (e.g. a run first trained with NPZ checkpoints and then
    resumed with ``--ckpt_format orbax``), the most recently written one wins
    — returning a fixed format would silently serve stale weights."""
    cands = [p for suffix in (".npz", _ORBAX_SUFFIX)
             if (p := Path(run_dir) / (stem + suffix)).exists()]
    if not cands:
        return None
    return max(cands, key=lambda p: p.stat().st_mtime)


def _orbax(async_save: bool):
    """Lazily-built module singletons (each owns threads/resources)."""
    global _sync_ckptr, _async_ckptr
    import orbax.checkpoint as ocp

    if async_save:
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
        return _async_ckptr
    if _sync_ckptr is None:
        _sync_ckptr = ocp.Checkpointer(ocp.CompositeCheckpointHandler())
    return _sync_ckptr


def wait_for_saves() -> None:
    """Block until every in-flight async orbax save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


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


def save_checkpoint(path: Path | str, trees: dict[str, Any], meta: dict,
                    async_save: bool = False) -> None:
    """``trees``: named pytrees (e.g. {"model": params, "optG": ..., "optD": ...}).

    Arrays go under ``<name><treepath>`` keys; ``meta`` plus the treedefs'
    structure are restored by unflattening into a caller-provided template
    (see :func:`load_checkpoint`). NPZ: device arrays are fetched with one
    fused transfer (see :func:`_pull_leaves`). Orbax (``*.orbax`` path): the
    flat payload is handed to orbax as-is — with ``async_save`` the fetch and
    write happen in the background (:func:`wait_for_saves` to join).
    """
    payload: dict[str, Any] = {}
    for name, tree in trees.items():
        payload.update(_flatten(tree, prefix=name))

    if is_orbax_path(path):
        import orbax.checkpoint as ocp

        ckptr = _orbax(async_save)
        if async_save:
            ckptr.wait_until_finished()  # one in-flight save at a time
        ckptr.save(Path(path).resolve(), force=True,
                   args=ocp.args.Composite(payload=ocp.args.StandardSave(payload),
                                           meta=ocp.args.JsonSave(meta)))
        return
    if async_save:
        raise ValueError("async_save requires an orbax checkpoint "
                         f"(*.orbax path), got {path}")
    keys = list(payload)
    pulled = _pull_leaves([payload[k] for k in keys])
    payload = dict(zip(keys, pulled))
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8).copy()
    np.savez_compressed(path, **payload)


class _SilenceTemplatelessRestore(logging.Filter):
    """Drop absl's template-less StandardRestore warning: our payload is a
    flat str→array dict by construction, so topology cannot mismatch."""

    def filter(self, record):
        return "expects a target tree" not in record.getMessage()


def _orbax_restore(path: Path | str, with_payload: bool = True):
    import orbax.checkpoint as ocp

    items = {"meta": ocp.args.JsonRestore()}
    if with_payload:
        items["payload"] = ocp.args.StandardRestore()
    flt = _SilenceTemplatelessRestore()
    logging.getLogger("absl").addFilter(flt)
    try:
        r = _orbax(False).restore(Path(path).resolve(),
                                  args=ocp.args.Composite(**items))
    finally:
        logging.getLogger("absl").removeFilter(flt)
    return (r.get("payload"), r.meta)


def load_meta(path: Path | str) -> dict:
    """Read only the JSON meta of a checkpoint (cheap — no tree rebuild)."""
    if is_orbax_path(path):
        return _orbax_restore(path, with_payload=False)[1]
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
    if is_orbax_path(path):
        payload, meta = _orbax_restore(path)
    else:
        with np.load(path) as data:  # close the zip handle — long-lived
            # servers load many checkpoints and would leak descriptors
            meta = json.loads(bytes(data["__meta__"]).decode("utf-8"))
            payload = {k: data[k] for k in data.files if k != "__meta__"}
    stored_keys = set(payload)
    out = {}
    for name, template in templates.items():
        paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in paths_and_leaves:
            key = name + jax.tree_util.keystr(p)
            if key not in stored_keys:
                if strict:
                    raise KeyError(f"checkpoint {path} missing leaf {key}")
                print(f"[ckpt] missing leaf {key}; keeping template value",
                      flush=True)
                leaves.append(np.asarray(leaf))
            else:
                leaves.append(payload[key])
        out[name] = jax.tree_util.tree_unflatten(treedef, leaves)
    return out, meta
