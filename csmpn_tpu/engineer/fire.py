"""Experiment bootstrap (reference `engineer/fire.py`).

Parses config, seeds, and initializes multi-host JAX when launched under a
distributed environment — ``jax.distributed.initialize`` replaces the
reference's NCCL process-group setup (fire.py:13-82, SURVEY.md §5): XLA
compiles the collectives, rendezvous comes from the cluster environment
(TPU pod metadata / SLURM / explicit coordinator env vars).
"""
from __future__ import annotations

import os
from typing import Callable, Dict

import jax

from .config import parse_args, pretty
from .seed import set_seed


def use_distributed() -> bool:
    """Multi-process launch detection (reference fire.py:13: NCCL_SYNC_FILE
    or TORCHELASTIC_RUN_ID; here: an explicit coordinator address, or a
    multi-task SLURM step — SLURM_NTASKS/SLURM_PROCID are the variables the
    reference derives ranks from, fire.py:26-48)."""
    env = os.environ
    if "JAX_COORDINATOR_ADDRESS" in env or "COORDINATOR_ADDRESS" in env:
        return True
    try:
        return int(env.get("SLURM_NTASKS", "1")) > 1
    except ValueError:
        return False


def _dist_setup() -> Dict:
    """jax.distributed bootstrap.  Rank/world size resolution order:
    explicit JAX_* env vars > SLURM step vars (SLURM_PROCID/SLURM_NTASKS,
    mirroring the reference's rank computation at fire.py:26-48) > JAX's
    own cluster auto-detection (TPU pod metadata / SLURM plugin)."""
    env = os.environ
    kwargs = {}
    addr = (env.get("JAX_COORDINATOR_ADDRESS")
            or env.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs["coordinator_address"] = addr
    if "JAX_NUM_PROCESSES" in env:
        kwargs["num_processes"] = int(env["JAX_NUM_PROCESSES"])
    elif "SLURM_NTASKS" in env:
        kwargs["num_processes"] = int(env["SLURM_NTASKS"])
    if "JAX_PROCESS_ID" in env:
        kwargs["process_id"] = int(env["JAX_PROCESS_ID"])
    elif "SLURM_PROCID" in env:
        kwargs["process_id"] = int(env["SLURM_PROCID"])
    jax.distributed.initialize(**kwargs)
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_device_count(),
    }


def fire(function: Callable[[Dict], None]) -> None:
    # Honor JAX_PLATFORMS explicitly: ambient PJRT plugins can re-pin the
    # platform at registration time, silently overriding the env var (a
    # CLI run with JAX_PLATFORMS=cpu would land on the accelerator).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    # Persistent compile cache for task runs: restarting a training run
    # (or retrying after a transient accelerator failure) must not pay
    # the multi-minute recompile again.  On accelerators only — the
    # XLA:CPU AOT cache is broken in this jaxlib (NOTES.md); tests
    # already run cache-less via conftest.
    if plat != "cpu":
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache"))
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    config, name, experiment = parse_args()
    print("\nConfiguration\n---")
    pretty(config)
    seed = config["seed"]
    assert isinstance(seed, int)
    key = set_seed(seed)
    config["prng_key"] = key
    config["run_name"] = name
    config["experiment"] = experiment

    dist_cfg = None
    if use_distributed():
        dist_cfg = _dist_setup()
        print(f"Distributed: {dist_cfg}")
    config["dist"] = dist_cfg

    function(config)
