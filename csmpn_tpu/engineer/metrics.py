"""Metric collections (reference `engineer/metrics/metrics.py`).

Append-only collections computed at log/val boundaries; under multi-process
JAX the compute step all-gathers collections across hosts
(reference @all_gather, metrics.py:37-71 — here via
``multihost_utils.process_allgather``).
"""
from __future__ import annotations

import warnings
from typing import Dict

import jax
import numpy as np


def _is_distributed() -> bool:
    return jax.process_count() > 1


def _gather(arr: np.ndarray) -> np.ndarray:
    if not _is_distributed():
        return arr
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(arr)
    return np.asarray(out).reshape((-1,) + arr.shape[1:])


class Metric:
    def __init__(self):
        self.collection = []

    def empty(self) -> bool:
        return len(self.collection) == 0

    def update(self, value) -> None:
        self.collection.append(np.asarray(value))

    def reset(self) -> None:
        self.collection.clear()

    def _cat(self) -> np.ndarray:
        cat = np.concatenate(
            [np.atleast_1d(v) for v in self.collection], axis=0)
        return _gather(cat)

    def compute(self):
        raise NotImplementedError


class Loss(Metric):
    def compute(self):
        return self._cat().mean(axis=0)


class Accuracy(Metric):
    def compute(self):
        cat = self._cat()
        return cat.sum(axis=0) / cat.size


class RMSRE(Metric):
    def compute(self):
        return np.sqrt(self._cat().mean(axis=0))


class RRMSE(Metric):
    """Collects (error_squares, target_squares) pairs."""

    def update(self, value):
        err, tgt = value
        self.collection.append((np.asarray(err), np.asarray(tgt)))

    def compute(self):
        errs = _gather(np.concatenate([np.atleast_1d(e)
                                       for e, _ in self.collection]))
        tgts = _gather(np.concatenate([np.atleast_1d(t)
                                       for _, t in self.collection]))
        return np.sqrt(errs.mean(axis=0) / tgts.mean(axis=0))


class BinaryAUROC(Metric):
    """Hand-rolled ROC/AUC (reference metrics.py:170-256), numpy edition."""

    def update(self, value):
        preds, target = value
        self.collection.append((np.asarray(preds), np.asarray(target)))

    @staticmethod
    def _roc(preds: np.ndarray, target: np.ndarray, pos_label: int = 1):
        order = np.argsort(-preds, kind="stable")
        preds, target = preds[order], target[order]
        distinct = np.where(np.diff(preds) != 0)[0]
        threshold_idxs = np.concatenate([distinct, [target.size - 1]])
        target = (target == pos_label).astype(np.int64)
        tps = np.cumsum(target)[threshold_idxs]
        fps = 1 + threshold_idxs - tps
        tps = np.concatenate([[0], tps])
        fps = np.concatenate([[0], fps])
        fpr = fps / fps[-1] if fps[-1] > 0 else np.zeros_like(fps, float)
        tpr = tps / tps[-1] if tps[-1] > 0 else np.zeros_like(tps, float)
        return fpr, tpr

    def compute(self):
        preds = _gather(np.concatenate([p for p, _ in self.collection]))
        target = _gather(np.concatenate([t for _, t in self.collection]))
        fpr, tpr = self._roc(preds, target)
        return np.trapezoid(tpr, fpr)


class LorentzMetric(Metric):
    """AUC + background rejection at fixed signal efficiency
    (reference metrics.py:259-292)."""

    def update(self, value):
        preds, target = value
        self.collection.append((np.asarray(preds), np.asarray(target)))

    def compute(self):
        from sklearn.metrics import roc_auc_score, roc_curve

        preds = _gather(np.concatenate([p for p, _ in self.collection]))
        target = _gather(np.concatenate([t for _, t in self.collection]))
        fpr, tpr, _ = roc_curve(target, preds)
        idx = [int(np.argmin(np.abs(tpr - e))) for e in (0.3, 0.5)]
        auc = roc_auc_score(target, preds)
        return {"auc": auc, "eB_0.3": fpr[idx[0]], "eB_0.5": fpr[idx[1]]}


class MetricCollection:
    def __init__(self, metrics: Dict[str, Metric]):
        self.metrics = metrics

    def empty(self) -> bool:
        return all(m.empty() for m in self.metrics.values())

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            if k not in self.metrics:
                raise ValueError(
                    f"Unknown metric {k}. Did you add it to the model "
                    f"metrics?")
            self.metrics[k].update(v)

    def compute(self) -> Dict[str, np.ndarray]:
        result = {}
        for name, metric in self.metrics.items():
            if metric.empty():
                warnings.warn(f"Metric {name} is empty.")
                continue
            value = metric.compute()
            if isinstance(value, dict):
                result.update(value)
            else:
                result[name] = value
        return result

    def reset(self) -> None:
        for m in self.metrics.values():
            m.reset()

    def keys(self):
        return self.metrics.keys()
