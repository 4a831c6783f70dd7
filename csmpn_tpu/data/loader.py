"""Array-backed simplicial datasets and the batch loader.

TPU-native replacement for the reference's PyG ``InMemoryDataset`` +
``DataLoader`` stack (e.g. hulls.py:48-148, md17.py:79-172): every sample is
pre-padded to the dataset-wide :class:`PaddingSpec` (static XLA shapes), so a
"dataset" is just one :class:`SimplicialBatch` whose leading dimension is the
number of samples, and batching is an index-take.  Collation therefore costs
a slice, not a ragged PyG re-offsetting pass, and every batch of a dataset
has the identical shape — one jit cache entry per model/dataset config.

On-disk format: one ``.npz`` per split with the batch fields verbatim plus
``spec_counts``/``spec_emax`` (the PaddingSpec) and ``feat_*``/``tgt_*``
entries for the feature/target dicts.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .batching import PaddingSpec, SimplicialBatch, collate


class SimplicialArrayDataset:
    """All samples of one split as stacked padded arrays.

    ``arrays`` is a :class:`SimplicialBatch` whose leading dimension is the
    sample count; ``select`` takes a batch by index.
    """

    def __init__(self, arrays: SimplicialBatch, spec: PaddingSpec):
        self.arrays = arrays
        self.spec = spec

    def __len__(self) -> int:
        return int(self.arrays.edge_index.shape[0])

    @classmethod
    def from_samples(cls, samples: List[dict],
                     targets: List[Dict[str, np.ndarray]],
                     spec: PaddingSpec) -> "SimplicialArrayDataset":
        return cls(collate(samples, targets), spec)

    def select(self, idx: Sequence[int]) -> SimplicialBatch:
        idx = np.asarray(idx)
        a = self.arrays
        take = lambda x: np.take(x, idx, axis=0)
        return SimplicialBatch(
            edge_index=take(a.edge_index),
            edge_mask=take(a.edge_mask),
            edge_src_order=take(a.edge_src_order),
            node_mask=take(a.node_mask),
            node_types=take(a.node_types),
            x_ind=take(a.x_ind),
            features={k: take(v) for k, v in a.features.items()},
            targets={k: take(v) for k, v in a.targets.items()},
        )

    # ------------------------------------------------------------- npz cache

    def save(self, path: str) -> None:
        a = self.arrays
        payload = dict(
            edge_index=a.edge_index, edge_mask=a.edge_mask,
            edge_src_order=a.edge_src_order, node_mask=a.node_mask,
            node_types=a.node_types, x_ind=a.x_ind,
            spec_counts=np.asarray(self.spec.counts_max, dtype=np.int64),
            spec_emax=np.int64(self.spec.e_max),
        )
        for k, v in a.features.items():
            payload[f"feat_{k}"] = v
        for k, v in a.targets.items():
            payload[f"tgt_{k}"] = v
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "SimplicialArrayDataset":
        with np.load(path) as z:
            spec = PaddingSpec(tuple(int(c) for c in z["spec_counts"]),
                               int(z["spec_emax"]))
            arrays = SimplicialBatch(
                edge_index=z["edge_index"], edge_mask=z["edge_mask"],
                edge_src_order=z["edge_src_order"],
                node_mask=z["node_mask"], node_types=z["node_types"],
                x_ind=z["x_ind"],
                features={k[5:]: z[k] for k in z.files
                          if k.startswith("feat_")},
                targets={k[4:]: z[k] for k in z.files
                         if k.startswith("tgt_")},
            )
        return cls(arrays, spec)


class Loader:
    """Minibatch iterator over a :class:`SimplicialArrayDataset`.

    The PyG-DataLoader equivalent (reference train/val/test_loader methods):
    per-epoch shuffling for training (deterministic when ``seed`` is given:
    epoch e shuffles with ``seed + e`` — the DistributedSampler.set_epoch
    semantics without the mutable sampler), optional drop_last, and rank
    sharding ``shard=(rank, world)`` replacing DistributedSampler
    (reference md17.py:141-172)."""

    def __init__(self, dataset: SimplicialArrayDataset, batch_size: int,
                 shuffle: bool = False, drop_last: Optional[bool] = None,
                 seed: Optional[int] = None,
                 shard: Optional[Tuple[int, int]] = None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.shard = shard
        self._epoch = 0

    def _shard_len(self) -> int:
        # DistributedSampler semantics: every rank gets EXACTLY
        # ceil(n / world) samples (short ranks wrap around), so all
        # processes run the same number of steps and cross-process
        # collectives (metric allgather, gradient psum) never mismatch.
        n = len(self.dataset)
        _, world = self.shard
        return -(-n // world)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shard is not None:
            rank, world = self.shard
            per = self._shard_len()
            total = per * world
            if total > idx.size:
                idx = np.concatenate([idx, idx[:total - idx.size]])
            idx = idx[rank::world]
        if self.shuffle:
            if self.seed is not None:
                rng = np.random.RandomState(self.seed + self._epoch)
            else:
                rng = np.random.RandomState()
            rng.shuffle(idx)
        return idx

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.shard is not None:
            n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batch_indices(self):
        """Per-batch sample-index arrays for one epoch (advances the
        epoch counter — the shuffle stream is shared with ``__iter__``)."""
        idx = self._indices()
        self._epoch += 1
        n_full = len(idx) // self.batch_size
        for b in range(n_full):
            yield idx[b * self.batch_size:(b + 1) * self.batch_size]
        rem = len(idx) - n_full * self.batch_size
        if rem and not self.drop_last:
            yield idx[n_full * self.batch_size:]

    def __iter__(self):
        for idx in self._batch_indices():
            yield self.dataset.select(idx)

    def index_iter(self):
        """Iterate int32 index arrays instead of materialized batches —
        the device-resident data path (Trainer ``device_data=True``)
        ships these (4 B/sample) and gathers the batch on-device from
        the HBM-resident stacked dataset."""
        for idx in self._batch_indices():
            yield idx.astype(np.int32)


def dataroot() -> str:
    """Reference: ``dataroot = os.environ["DATAROOT"]`` (motion.py:14).
    Here a missing DATAROOT falls back to ``./data`` instead of crashing."""
    return os.environ.get("DATAROOT", "data")
