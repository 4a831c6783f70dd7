"""Best-metric checkpointing with resume
(reference `engineer/callbacks/checkpoint.py`).

Payload: the (params, opt_state) pytree saved with orbax (tensorstore —
sharded-array-aware, no arbitrary-code deserialization) into a
checkpoint DIRECTORY, plus a small ``meta.json`` sidecar carrying
{metrics, epoch, step}.  Written by process 0 only; improvement
schedules an immediate test pass (reference checkpoint.py:129 via
should_test).

Restore is two-phase because the experiment state does not exist yet
when the callback is constructed: ``Checkpoint(dir=path)`` reads only
``meta.json`` (best metrics / epoch / step), and ``restore(trainer,
state)`` — called by the Trainer once the live state pytree exists —
restores the arrays INTO that structure (orbax needs the target tree to
rebuild optax NamedTuple states).

Legacy pickled single-file checkpoints from earlier rounds are still
readable (gated on the path being a file, not a directory).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(np.asarray, jax.device_get(tree))


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


class Checkpoint:
    def __init__(self, metrics=None, dir: Optional[str] = None):
        self.dir = dir
        self._cached_state = None     # legacy pickle path only
        self._restore_dir = None      # orbax directory to restore from
        self._cached_epoch = None
        self._cached_step = None

        if dir is not None:
            metrics = self.load_checkpoint(dir)
        if isinstance(metrics, str):
            metrics = (metrics,)
        if isinstance(metrics, (list, tuple)):
            metrics = {m: float("inf") for m in metrics}
        self.best_metrics: Dict[str, float] = metrics or {}
        self.save_paths: Dict[str, str] = {}

    def load_checkpoint(self, path: str):
        if os.path.isdir(path):
            with open(os.path.join(path, "meta.json")) as f:
                meta = json.load(f)
            self._restore_dir = path
            self._cached_epoch = meta["epoch"]
            self._cached_step = meta["step"]
            return meta["metrics"]
        # legacy single-file pickle (rounds 1-2)
        import pickle

        with open(path, "rb") as f:
            payload = pickle.load(f)
        self._cached_state = (payload["params"], payload["opt_state"])
        self._cached_epoch = payload["epoch"]
        self._cached_step = payload["step"]
        return payload["metrics"]

    def restore(self, trainer, state):
        if self._restore_dir is not None:
            restored = _ckptr().restore(
                os.path.abspath(os.path.join(self._restore_dir, "state")),
                item={"params": state[0], "opt_state": state[1]})
            state = (restored["params"], restored["opt_state"])
            print(f"Successfully restored state from {self.dir}!")
        elif self._cached_state is not None:
            state = self._cached_state
            print(f"Successfully restored state from {self.dir}!")
        if self._cached_epoch is not None:
            trainer.current_epoch = self._cached_epoch
            print(f"Set current epoch to {self._cached_epoch}.")
        if self._cached_step is not None:
            trainer.global_step = self._cached_step
            print(f"Set global step to {self._cached_step}.")
        self._cached_state = None
        self._restore_dir = None
        self._cached_epoch = None
        self._cached_step = None
        return state

    @property
    def _is_master(self) -> bool:
        return jax.process_index() == 0

    def save_last(self, trainer, state):
        """Write the LATEST (params, opt_state) to ``<dir>/last`` —
        called by the Trainer when a run stops (max_time / max_rss_gb /
        max_steps) so segmented runs resume from where they left off
        rather than from the last best-val improvement."""
        if trainer.logger is None or trainer.logger.dir is None:
            return
        params, opt_state = state
        save_path = os.path.abspath(
            os.path.join(trainer.logger.dir, "last"))
        if self._is_master:
            os.makedirs(trainer.logger.dir, exist_ok=True)
        # orbax ``save`` is a COLLECTIVE under jax.process_count() > 1
        # (it runs sync_global_processes); EVERY rank must enter it or
        # the master deadlocks in the barrier.  The run dir is shared
        # (ConsoleLogger derives it deterministically on every rank);
        # force=True lets orbax replace a previous segment's state.
        _ckptr().save(os.path.join(save_path, "state"),
                      {"params": _to_host(params),
                       "opt_state": _to_host(opt_state)},
                      force=True)
        if not self._is_master:
            return
        with open(os.path.join(save_path, "meta.json"), "w") as f:
            json.dump({"metrics": self.best_metrics,
                       "epoch": trainer.current_epoch,
                       "step": trainer.global_step}, f)
        print(f"Saved latest-state checkpoint to {save_path} "
              f"(step {trainer.global_step}).")

    def on_test_end(self, trainer, state, metrics, *args, **kwargs):
        # metrics arrive AFTER the cross-process gather (metrics.py), so
        # every rank sees identical values and takes the same branch —
        # required because the orbax save below is a collective.
        can_write = (trainer.logger is not None
                     and trainer.logger.dir is not None)
        for m, best in self.best_metrics.items():
            if m not in metrics:
                continue
            value = float(metrics[m])
            if value < best:
                self.best_metrics[m] = value
                if can_write:
                    params, opt_state = state
                    alias = f"best_{m.replace('/', '_')}"
                    # orbax/tensorstore requires absolute paths
                    save_path = os.path.abspath(
                        os.path.join(trainer.logger.dir, alias))
                    if self._is_master:
                        os.makedirs(trainer.logger.dir, exist_ok=True)
                    # collective (see save_last): all ranks enter; orbax
                    # itself only writes from the primary host.
                    _ckptr().save(
                        os.path.join(save_path, "state"),
                        {"params": _to_host(params),
                         "opt_state": _to_host(opt_state)},
                        force=True)
                    if self._is_master:
                        with open(os.path.join(save_path, "meta.json"),
                                  "w") as f:
                            json.dump({"metrics": self.best_metrics,
                                       "epoch": trainer.current_epoch,
                                       "step": trainer.global_step}, f)
                        if m in self.save_paths \
                                and self.save_paths[m] != save_path:
                            stale = self.save_paths[m]
                            if os.path.isdir(stale):
                                shutil.rmtree(stale)
                            elif os.path.exists(stale):
                                os.remove(stale)
                        print(f"Metric {m} improved to {value:.4f}; "
                              f"saved checkpoint to {save_path}. "
                              f"Scheduling test loop.")
                    self.save_paths[m] = save_path
                trainer.should_test = True
