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

pytestmark = pytest.mark.slow  # multi-minute: mesh/train/CLI integration tier

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


_TRAIN_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)          # one device per process
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, {repo!r})
import importlib
fire = importlib.import_module("csmpn_tpu.engineer.fire")

assert fire.use_distributed(), "bootstrap env not detected"
dist = fire._dist_setup()
rank = dist["rank"]
assert jax.process_count() == 2 and jax.device_count() == 2

import numpy as np
from csmpn_tpu.data.hulls import ConvexHullDataset
from csmpn_tpu.engineer.optim import adam
from csmpn_tpu.engineer.trainer import Trainer
from csmpn_tpu.models.hulls import HullsModel
from csmpn_tpu.parallel.mesh import make_mesh

# per-process DATAROOT: generation is seed-deterministic, so both ranks
# materialize identical splits without racing on one cache file
os.environ["DATAROOT"] = {dataroot!r} + f"/r{{rank}}"
# ... but ONE shared run dir: orbax checkpoint saves are collectives
# (all ranks enter, primary host writes) — regression for the r5
# master-only-save deadlock in Checkpoint.save_last/on_test_end
os.environ["RUNDIR"] = {dataroot!r} + "/runs"
ds = ConvexHullDataset(num_samples=8, num_val_samples=4, batch_size=2)

# each process loads only ITS dataset shard (DistributedSampler equiv.)
shard = (jax.process_index(), jax.process_count())
train_loader = ds.train_loader(seed=0, shard=shard)
assert len(train_loader) == 2, len(train_loader)  # 8 samples -> 4/rank

model = HullsModel(spec=ds.spec, hidden_features=4, num_layers=1)
batch = next(iter(train_loader))
params = model.init(jax.random.PRNGKey(0), batch)
optimizer = adam(lr=1e-3)

trainer = Trainer(max_steps=2, val_check_interval=1,
                  log_interval=10**6, print_interval=1,
                  mesh=make_mesh(), donate=False)
params = trainer.fit(model, params, optimizer, train_loader,
                     val_loader=ds.val_loader(seed=0))

# both checkpoint flavors must exist: best-val (on_test_end) + last
run_dir = {dataroot!r} + "/runs/run"
for alias in ("best_val_loss", "last"):
    assert os.path.isdir(os.path.join(run_dir, alias, "state")), alias
    assert os.path.isfile(os.path.join(run_dir, alias, "meta.json")), alias

# replicated params: every process must hold bit-identical values
leaves = jax.tree.leaves(jax.device_get(params))
checksum = float(sum(np.float64(np.abs(l)).sum() for l in leaves))
assert np.isfinite(checksum)
print(f"PARAMS {{checksum:.12e}}", flush=True)
print(f"RANK{{rank}}-OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(env_fn, repo, worker=None):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("SLURM", "JAX_"))}
        env.update(env_fn(rank, port))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", worker or _WORKER.format(repo=repo)],
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


def test_two_process_hulls_train_step(tmp_path):
    """End-to-end multi-host DP (VERDICT r2 next-round #5): two processes,
    sharded loaders, mesh-sharded batches assembled with
    ``make_array_from_process_local_data``, replicated params, XLA gradient
    all-reduce — after 2 Trainer steps both processes hold bit-identical
    parameters (reference semantics: DDP wrap + DistributedSampler,
    csmpn/md17.py:15-23,141-172)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def env_fn(rank, port):
        return {
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(rank),
        }

    worker = _TRAIN_WORKER.format(repo=repo, dataroot=str(tmp_path))
    outs = _launch(env_fn, repo, worker=worker)
    sums = []
    for rank, (rc, out) in enumerate(outs):
        assert rc == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank}-OK" in out, out
        sums.append([ln for ln in out.splitlines()
                     if ln.startswith("PARAMS ")][0])
    assert sums[0] == sums[1], f"params diverged across processes: {sums}"
