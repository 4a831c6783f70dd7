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
    return any(k in os.environ for k in (
        "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
        "SLURM_JOB_NUM_NODES_MULTIHOST"))


def _dist_setup() -> Dict:
    kwargs = {}
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if addr:
        kwargs["coordinator_address"] = addr
        if "JAX_NUM_PROCESSES" in os.environ:
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in os.environ:
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_device_count(),
    }


def fire(function: Callable[[Dict], None]) -> None:
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
