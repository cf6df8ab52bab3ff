"""Runtime configuration: persistent compilation cache + device helpers.

The TPU attachment in this environment compiles remotely; cold compiles of
non-trivial graphs cost seconds-to-minutes and are NOT shared across processes.
A persistent on-disk executable cache makes every entry point (scripts, bench,
tests re-runs) pay each compile once per machine instead of once per process.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.expanduser("~/.cache/jax_eegsynth")


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent; env wins)."""
    if jax.config.jax_compilation_cache_dir:
        return
    platform_cfg = jax.config.jax_platforms or ""
    if platform_cfg.startswith("cpu"):
        return  # CPU compiles are fast; caching only pays on the remote TPU path
    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    # Partition by platform: executables AOT-compiled for one backend/host-flag
    # set must not be loaded by another (XLA warns of possible SIGILL).
    platform = jax.config.jax_platforms or "default"
    cache_dir = os.path.join(cache_dir, platform.replace(",", "_"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def cpu_device():
    """First CPU device — preprocessing runs host-side in float64."""
    return jax.devices("cpu")[0]


def default_mesh(axis_name: str = "data"):
    """1-D mesh over all local devices for data-parallel training."""
    from jax.sharding import Mesh
    import numpy as np

    return Mesh(np.array(jax.devices()), (axis_name,))
