"""Best-metric checkpointing with resume
(reference `engineer/callbacks/checkpoint.py`).

Payload = {params, opt_state, best metrics, epoch, step} as a pickled
numpy-ified pytree; written by process 0 only; improvement schedules an
immediate test pass (reference checkpoint.py:129 via should_test).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(np.asarray, jax.device_get(tree))


class Checkpoint:
    def __init__(self, metrics=None, dir: Optional[str] = None):
        self.dir = dir
        self._cached_state = None
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
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self._cached_state = (payload["params"], payload["opt_state"])
        self._cached_epoch = payload["epoch"]
        self._cached_step = payload["step"]
        return payload["metrics"]

    def restore(self, trainer, state):
        if self._cached_state is not None:
            state = self._cached_state
            print(f"Successfully restored state from {self.dir}!")
        if self._cached_epoch is not None:
            trainer.current_epoch = self._cached_epoch
            print(f"Set current epoch to {self._cached_epoch}.")
        if self._cached_step is not None:
            trainer.global_step = self._cached_step
            print(f"Set global step to {self._cached_step}.")
        self._cached_state = None
        self._cached_epoch = None
        self._cached_step = None
        return state

    @property
    def _is_master(self) -> bool:
        return jax.process_index() == 0

    def on_test_end(self, trainer, state, metrics, *args, **kwargs):
        should_write = (
            self._is_master
            and trainer.logger is not None
            and trainer.logger.dir is not None)
        for m, best in self.best_metrics.items():
            if m not in metrics:
                continue
            value = float(metrics[m])
            if value < best:
                self.best_metrics[m] = value
                if should_write:
                    params, opt_state = state
                    payload = {
                        "params": _to_host(params),
                        "opt_state": _to_host(opt_state),
                        "metrics": self.best_metrics,
                        "epoch": trainer.current_epoch,
                        "step": trainer.global_step,
                    }
                    alias = f"best_{m.replace('/', '_')}"
                    os.makedirs(trainer.logger.dir, exist_ok=True)
                    save_path = os.path.join(trainer.logger.dir, alias)
                    with open(save_path, "wb") as f:
                        pickle.dump(payload, f)
                    if m in self.save_paths \
                            and self.save_paths[m] != save_path:
                        os.remove(self.save_paths[m])
                    self.save_paths[m] = save_path
                    print(f"Metric {m} improved to {value:.4f}; saved "
                          f"checkpoint to {save_path}. Scheduling test "
                          f"loop.")
                trainer.should_test = True
