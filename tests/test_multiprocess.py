"""Multi-process jax.distributed path (VERDICT r1 next-round #5).

Launches two REAL processes that rendezvous through
``jax.distributed.initialize`` on localhost (CPU backend) and verifies:
  * ``fire.use_distributed`` / ``fire._dist_setup`` bootstrap from both
    explicit JAX_* env vars and SLURM-style vars
    (reference engineer/fire.py:13,26-48);
  * ``metrics._gather`` concatenates metric collections across processes
    before compute (reference @all_gather, metrics.py:37-71).
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)          # one device per process
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
import importlib
fire = importlib.import_module("csmpn_tpu.engineer.fire")
from csmpn_tpu.engineer.metrics import Loss, MetricCollection

assert fire.use_distributed(), "bootstrap env not detected"
dist = fire._dist_setup()
assert dist["world_size"] == 2, dist
rank = dist["rank"]

import numpy as np
coll = MetricCollection({{"loss": Loss()}})
# each process contributes DIFFERENT values; the cross-process mean is
# only correct if _gather concatenated both collections
coll.update(loss=np.full((2,), float(rank + 1)))
out = coll.compute()
np.testing.assert_allclose(out["loss"], 1.5)
print(f"RANK{{rank}}-OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(env_fn, repo):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("SLURM", "JAX_"))}
        env.update(env_fn(rank, port))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER.format(repo=repo)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    return outs


@pytest.mark.parametrize("style", ["jax_env", "slurm"])
def test_two_process_gather(style):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def env_fn(rank, port):
        if style == "jax_env":
            return {
                "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(rank),
            }
        return {   # SLURM-style rank derivation (reference fire.py:26-48)
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "SLURM_NTASKS": "2",
            "SLURM_PROCID": str(rank),
        }

    outs = _launch(env_fn, repo)
    for rank, (rc, out) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}-OK" in out, out
