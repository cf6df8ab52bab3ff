"""Two-process DCN (multi-host) execution test.

Spawns two REAL Python processes that join a localhost ``jax.distributed``
coordinator on the CPU backend (2 local virtual devices each → a 4-device
global ``data`` mesh) and run one tiny sharded TimeGAN GAN chunk through
``eegsynth.train.sharding.init_multihost``. Asserts:

- the chunk's losses and the updated discriminator weights match a
  single-process run of the same chunk on a same-size local mesh
  (grad all-reduce equivalence across the process boundary);
- ``is_coordinator()`` gates writes to exactly one process;
- ``fetch_global`` returns identical values on every process.

The reference has no distributed backend at all (SURVEY.md §2.6); this is the
validation the TPU framework's --multihost flag was missing (VERDICT r1 §3).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

N_PROCS = 2
LOCAL_DEVICES = 2          # per process → 4 global
TINY = dict(n=8, t=16, c=4, z=8, h=16, batch=4)

WORKER = r"""
import json, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")   # sitecustomize pins axon otherwise
jax.config.update("jax_num_cpu_devices", {local_devices})

port, pid, out_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from eegsynth.train.sharding import fetch_global, init_multihost, is_coordinator

mesh = init_multihost(coordinator_address=f"localhost:{{port}}",
                      num_processes={n_procs}, process_id=pid)
assert jax.process_count() == {n_procs}, jax.process_count()
assert mesh.devices.size == {n_procs} * {local_devices}, mesh

from run_tiny_chunk import run_tiny_chunk   # shared with the parent process
logs, d_w = run_tiny_chunk(mesh)

logs_g = fetch_global(logs)
d_w_g = fetch_global(d_w)

# every process reports; the coordinator-gated artifact is written once
np.savez(f"{{out_dir}}/proc{{pid}}.npz", logs=np.asarray(logs_g),
         d_w=np.asarray(d_w_g))
if is_coordinator():
    with open(f"{{out_dir}}/coordinator_artifact_{{pid}}.json", "w") as f:
        json.dump({{"process_index": jax.process_index()}}, f)
print(f"worker {{pid}} done", flush=True)
"""

# Shared chunk definition: both the workers and the parent's single-process
# reference import this, so "same math" is true by construction.
RUN_TINY_CHUNK = f"""
import numpy as np
import jax
import jax.numpy as jnp

TINY = {TINY!r}


def run_tiny_chunk(mesh):
    '''One GAN chunk (1 step) of a tiny TimeGAN on the given mesh.
    Returns (logs row, updated discriminator fc weight).'''
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from eegsynth.models.timegan import TimeGANConfig, timegan_init
    from eegsynth.train.timegan import (
        TimeGANHParams, make_gan_chunk, make_gan_opts,
    )

    cfg = TimeGANConfig(x_dim=TINY["c"], z_dim=TINY["z"], h_dim=TINY["h"])
    hp = TimeGANHParams(batch_size=TINY["batch"], gan_steps=1, chunk=1,
                        acf_max_lag=4)
    params = timegan_init(jax.random.key(0), cfg)
    X = jax.random.uniform(jax.random.key(1),
                           (TINY["n"], TINY["t"], TINY["c"]), jnp.float32)
    optD, optG = make_gan_opts(hp, milestones=(2, 3))
    d_state = optD.init(params["discriminator"])
    gser = {{k: params[k]
             for k in ("generator", "supervisor", "embedder", "recovery")}}
    g_state = optG.init(gser)

    def globalize(tree):
        # identical host values on every process -> replicated global arrays
        host = jax.tree.map(np.asarray, jax.device_get(tree))
        return multihost_utils.host_local_array_to_global_array(
            host, mesh, jax.tree.map(lambda _: P(), host))

    if jax.process_count() > 1:
        params, d_state, g_state, X = globalize((params, d_state, g_state, X))

    chunk = make_gan_chunk(cfg, hp, optD, optG, mesh)(hp.batch_size)
    (params, d_state, g_state, *_), logs = chunk(
        params, d_state, g_state, params, jnp.float32(np.inf), jnp.int32(0),
        jax.random.key(2), jnp.int32(0),
        jnp.arange(1, 2, dtype=jnp.int32), X)
    return logs, params["discriminator"]["fc"]["w"]
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_outputs(tmp_path_factory):
    out = tmp_path_factory.mktemp("mh")
    (out / "run_tiny_chunk.py").write_text(RUN_TINY_CHUNK)
    port = _free_port()
    worker = WORKER.format(local_devices=LOCAL_DEVICES, n_procs=N_PROCS)
    (out / "worker.py").write_text(worker)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    # run from the repo root so `import eegsynth` resolves; the worker dir is
    # appended for run_tiny_chunk
    env["PYTHONSTARTUP"] = ""
    procs = []
    for pid in range(N_PROCS):
        procs.append(subprocess.Popen(
            [sys.executable, "-u", "-c",
             f"import sys; sys.path[:0] = [{str(REPO)!r}, {str(out)!r}]; "
             f"exec(open({str(out / 'worker.py')!r}).read())",
             str(port), str(pid), str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outputs = [p.communicate(timeout=900)[0] for p in procs]
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{text[-4000:]}"
    return out


def _single_process_reference():
    """Same chunk on a local 4-device mesh (the conftest provides 8)."""
    import jax

    from eegsynth.train.sharding import data_mesh

    ns = {}
    exec(RUN_TINY_CHUNK, ns)
    mesh = data_mesh(jax.devices()[: N_PROCS * LOCAL_DEVICES])
    logs, d_w = ns["run_tiny_chunk"](mesh)
    return np.asarray(logs), np.asarray(d_w)


def test_multihost_matches_single_process(multihost_outputs):
    out = multihost_outputs
    ref_logs, ref_w = _single_process_reference()
    assert np.isfinite(ref_logs).all()
    for pid in range(N_PROCS):
        got = np.load(out / f"proc{pid}.npz")
        # grad all-reduce across the process boundary == local all-reduce
        np.testing.assert_allclose(got["logs"], ref_logs, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got["d_w"], ref_w, rtol=1e-5, atol=1e-6)


def test_fetch_global_agrees_across_processes(multihost_outputs):
    out = multihost_outputs
    a = np.load(out / "proc0.npz")
    b = np.load(out / "proc1.npz")
    np.testing.assert_array_equal(a["logs"], b["logs"])
    np.testing.assert_array_equal(a["d_w"], b["d_w"])


def test_coordinator_writes_once(multihost_outputs):
    out = multihost_outputs
    artifacts = sorted(out.glob("coordinator_artifact_*.json"))
    assert [p.name for p in artifacts] == ["coordinator_artifact_0.json"]
    assert json.loads(artifacts[0].read_text()) == {"process_index": 0}

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
