"""Console + Weights&Biases loggers (reference `engineer/loggers/loggers.py`).

Unlike the reference (whose WANDBLogger has a missing ``import wandb`` and
whose ConsoleLogger has ``dir=None``, silently disabling checkpoints —
loggers.py:1-4, checkpoint.py:81-85), both loggers here have a working save
directory so checkpointing always functions.
"""
from __future__ import annotations

import os
from typing import Dict, Optional


class ConsoleLogger:
    def __init__(self, dir: Optional[str] = None,
                 run_name: str = "run") -> None:
        self.metrics = []
        if dir is None:
            dir = os.path.join(os.environ.get("RUNDIR", "runs"), run_name)
        self.dir = dir

    def log_metrics(self, metrics: Dict, step: int) -> None:
        for m in metrics:
            if m not in self.metrics:
                print(f"Defined metric {m}.")
                self.metrics.append(m)
        print()
        for k, v in metrics.items():
            try:
                print(f"{k}: {float(v):.4f}")
            except (TypeError, ValueError):
                print(f"{k}: {v}")
        print()

    def save_model(self, file: str, alias: str) -> None:
        pass


class WANDBLogger:
    def __init__(self, project: Optional[str] = None,
                 entity: Optional[str] = None, run_name: str = "run"):
        import wandb  # the reference forgot this import (loggers.py:6)

        self._wandb = wandb
        if wandb.run is None:
            wandb.init(project=project, entity=entity, name=run_name)
        self.metrics = set()
        self.dir = wandb.run.dir

    @property
    def initialized(self) -> bool:
        return self._wandb.run is not None

    def log_metrics(self, metrics: Dict, step: int) -> None:
        if not self.initialized:
            return
        for m in metrics:
            if m not in self.metrics:
                self._wandb.define_metric(m, summary="max,min,last")
                self.metrics.add(m)
        self._wandb.log(metrics, step=step)

    def save_model(self, file: str, alias: str) -> None:
        if not self.initialized:
            return
        name = str(self._wandb.run.id) + "-model"
        artifact = self._wandb.Artifact(name, type="model")
        artifact.add_file(file)
        self._wandb.log_artifact(artifact, aliases=[alias])
