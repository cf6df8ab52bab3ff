"""Data-parallel sharding over a device mesh.

The reference is strictly single-device (SURVEY.md §2.6) — this module is the
TPU-native replacement: a 1-D ``data`` mesh, batch dimension sharded across ICI,
parameters/optimizer state replicated, gradients combined by XLA's all-reduce
(inserted automatically by GSPMD from the sharding annotations — no hand-written
collectives needed for pure data parallelism).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> Mesh:
    """Join a multi-host TPU slice and return the global data mesh.

    Thin wrapper over ``jax.distributed.initialize`` (SURVEY.md §5: the
    communication backend the reference lacks). On Cloud TPU the three
    arguments auto-detect from the environment; pass them explicitly elsewhere.
    MUST run before anything initializes the local backend (any
    ``jax.devices()`` / array op) — the CLIs order it first.

    Validated by tests/test_multihost.py: two real processes join a localhost
    coordinator (CPU backend, 2 virtual devices each) and run a sharded GAN
    chunk whose losses and updated weights match a single-process run on a
    same-size local mesh — grad all-reduce across the process boundary,
    ``is_coordinator`` write gating, and ``fetch_global`` agreement are all
    asserted. (Real multi-chip DCN hardware is still unavailable here; the
    process-boundary semantics are what the test pins down.) The returned
    mesh spans every chip in the slice; gradient all-reduce rides ICI within
    a host and DCN across, inserted by GSPMD from the same sharding
    annotations as the single-host path. Caveats for a real multi-host run:
    per-host input arrays must be assembled with
    ``jax.experimental.multihost_utils.host_local_array_to_global_array`` (or
    ``jax.make_array_from_process_local_data``) before a global-mesh
    ``with_sharding_constraint`` will accept them, and artifact writes happen
    on the coordinator only (trainers gate on :func:`is_coordinator`).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return data_mesh()


def is_coordinator() -> bool:
    """True on the process that owns artifact writes (always true single-host)."""
    return jax.process_index() == 0


def fetch_global(tree):
    """Pull a (possibly process-sharded) pytree to host as global numpy values.

    Single-process: plain ``jax.device_get``. Multi-process: shards living on
    other hosts are non-addressable, so ``device_get`` would raise — instead
    every process joins a ``process_allgather`` that replicates the global
    value. COLLECTIVE: when ``jax.process_count() > 1`` this must be called on
    ALL processes (call it before any ``is_coordinator()`` write gate, never
    inside one)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree, tiled=True)


def mesh_from_flags(use_mesh: bool, multihost: bool = False) -> Mesh | None:
    """CLI hook: ``--multihost`` joins the slice and spans every chip;
    ``--mesh`` spans the local chips; neither → single-device (None)."""
    if multihost:
        return init_multihost()
    return data_mesh() if use_mesh else None


def batch_sharding(mesh: Mesh | None, axis: str = "data"):
    """NamedSharding that splits the leading (batch) dim, or None off-mesh."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh | None):
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def constrain_batch(x, mesh: Mesh | None, axis: str = "data"):
    """Annotate a batch-major array as sharded over the data axis (no-op
    without a mesh)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(axis)))


def round_batch_to_mesh(batch_size: int, mesh: Mesh | None) -> int:
    """Largest batch ≤ batch_size divisible by the mesh size (≥ mesh size)."""
    if mesh is None:
        return batch_size
    n = mesh.devices.size
    return max(n, (batch_size // n) * n)
