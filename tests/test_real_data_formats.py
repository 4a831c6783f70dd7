"""Real-file loading paths exercised end-to-end with binaries synthesized
in the REFERENCE's exact on-disk formats (VERDICT r1 missing #2: the real
paths were code-complete but had never executed).

Formats replicated:
  * motion: ``motion.pkl`` = pickle of (edges, X) with X a list of 23+
    (T, 31, 3) float trajectories (reference motion.py:20-31);
  * MD17: ``md17_<mol>.npz`` with keys R (T, N, 3) and z (N,) atomic
    numbers (reference preprocess_md17.py:29-46);
  * NBA: ``all_data.npy`` of shape (seqs, seq_len, 11, 4) — ball + 10
    players, 4 feature columns (reference preprocess_nba.py:88-121).
"""
import os
import pickle

import numpy as np
import pytest


@pytest.fixture()
def dataroot(tmp_path, monkeypatch):
    monkeypatch.setenv("DATAROOT", str(tmp_path))
    return str(tmp_path)


class TestMotionRealFormat:
    N_TRIALS, T, N = 23, 331, 31

    def _write_raw(self, root):
        d = os.path.join(root, "motion")
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(0)
        edges = [(i, i + 1) for i in range(self.N - 1)] + [(6, 8), (1, 3)]
        X = [rng.randn(self.T, self.N, 3).astype(np.float64)
             for _ in range(self.N_TRIALS)]
        with open(os.path.join(d, "motion.pkl"), "wb") as f:
            pickle.dump((edges, X), f)
        return d, X

    def test_raw_class_semantics(self, dataroot):
        from csmpn_tpu.data.motion import Motion

        d, X = self._write_raw(dataroot)
        m = Motion("train", 22, 30, d)
        # 11 train cases x floor(22/11) samples
        assert m.x_0.shape == (22, self.N, 3)
        assert m.v_0.shape == (22, self.N, 3)
        # split.pkl persisted and deterministic across constructions
        assert os.path.exists(os.path.join(d, "split.pkl"))
        m2 = Motion("train", 22, 30, d)
        np.testing.assert_array_equal(m.x_0, m2.x_0)
        # velocity/target semantics vs the raw trajectories: for some
        # sampled frame st of case 20 (first train case),
        # x_0 = X[20][st] (after the last-frame drop), v_0 = frame diff,
        # x_t = X[20][st + 30]
        with open(os.path.join(d, "split.pkl"), "rb") as f:
            split = pickle.load(f)
        st = int(np.asarray(split[0][20])[0])
        np.testing.assert_allclose(m.x_0[0], X[20][:-1][st], rtol=1e-6)
        np.testing.assert_allclose(
            m.v_0[0], (X[20][1:] - X[20][:-1])[st], rtol=1e-6)
        np.testing.assert_allclose(m.x_t[0], X[20][:-1][st + 30],
                                   rtol=1e-6)

    def test_full_dataset_pipeline(self, dataroot):
        from csmpn_tpu.data.motion import MotionDataset

        self._write_raw(dataroot)
        ds = MotionDataset(batch_size=4, num_training_samples=22,
                           num_eval_samples=12)
        batch = next(iter(ds.train_loader()))
        assert batch.batch_size == 4


class TestMD17RealFormat:
    def _write_raw(self, root, mol="ethanol"):
        d = os.path.join(root, "md17")
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(1)
        # 3 heavy atoms (C, O, C) + 6 hydrogens, reference key layout
        z = np.array([6, 1, 1, 8, 1, 1, 6, 1, 1])
        base = rng.randn(len(z), 3)
        t = np.arange(4001)[:, None, None]
        R = base[None] + 0.05 * np.sin(0.01 * t + rng.rand(len(z), 3))
        np.savez(os.path.join(d, f"md17_{mol}.npz"), R=R, z=z)
        return d, R, z

    def test_preprocessor_semantics(self, dataroot):
        from csmpn_tpu.data.md17 import preprocess_raw

        d, R, z = self._write_raw(dataroot)
        assert preprocess_raw(d, "ethanol")
        charges = np.load(os.path.join(d, "ethanol_charges.npy"))
        # hydrogens dropped
        np.testing.assert_array_equal(charges, z[z > 1])
        structure = np.load(os.path.join(d, "ethanol_structure.npy"))
        assert structure.shape == (3, 3)
        train = np.load(os.path.join(d, "ethanol_train.npy"))
        # 20-frame trajectories over heavy atoms only
        assert train.shape[1:] == (20, 3, 3)
        # 5:1:2 split of the 4000 usable frames, gap-20 slicing
        assert train.shape[0] == int((4000 * 5 // 8 - 400) / 20)

    def test_full_dataset_pipeline(self, dataroot):
        from csmpn_tpu.data.md17 import MD17Dataset

        self._write_raw(dataroot)
        ds = MD17Dataset(batch_size=2, molecule_type="ethanol",
                         num_train_samples=8, num_eval_samples=4,
                         dis=10000.0)
        batch = next(iter(ds.train_loader()))
        assert batch.batch_size == 2
        # data-dependent model kwargs derived from the REAL file
        assert ds.model_kwargs["n_vertices"] == 3


class TestNBARealFormat:
    def _write_raw(self, root, seqs=10):
        d = os.path.join(root, "nba")
        os.makedirs(d, exist_ok=True)
        rng = np.random.RandomState(2)
        # (seqs, seq_len, ball + 10 players, 4 features); X in [45, 90]
        data = rng.rand(seqs, 50, 11, 4).astype(np.float32)
        data[..., 0] = 45.0 + data[..., 0] * 45.0
        np.save(os.path.join(d, "all_data.npy"), data)
        return d, data

    def test_preprocessor_semantics(self, dataroot):
        from csmpn_tpu.data.nba import preprocess_raw

        d, data = self._write_raw(dataroot)
        assert preprocess_raw(d, "atk")
        train = np.load(os.path.join(d, "atk", "trajectories_train.npy"))
        val = np.load(os.path.join(d, "atk", "trajectories_val.npy"))
        test = np.load(os.path.join(d, "atk", "trajectories_test.npy"))
        # 60/20/20 play split, attacking players = columns 1:6, xy only
        assert train.shape == (6, 50, 5, 2)
        assert val.shape == (2, 50, 5, 2)
        assert test.shape == (2, 50, 5, 2)
        # court-origin shift on x, raw column 1 (y) kept as column 1
        np.testing.assert_allclose(train[0, :, :, 0],
                                   data[0, :, 1:6, 0] - 45.0, rtol=1e-6)
        np.testing.assert_allclose(train[0, :, :, 1],
                                   data[0, :, 1:6, 1], rtol=1e-6)

    def test_full_dataset_pipeline(self, dataroot):
        from csmpn_tpu.data.nba import NBADataset

        self._write_raw(dataroot)
        ds = NBADataset(batch_size=2, mode="atk")
        batch = next(iter(ds.train_loader()))
        assert batch.batch_size == 2
