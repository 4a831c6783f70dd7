"""End-to-end CLI integration: run each task entry script as a subprocess
with tiny budgets (the reference's run path: sweep config -> entry ->
fire -> Trainer.fit)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute: mesh/train/CLI integration tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_task(module, extra=None, dataroot=None, timeout=540):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["DATAROOT"] = dataroot
    env["RUNDIR"] = os.path.join(dataroot, "runs")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
    cmd = [
        sys.executable, "-m", module,
        "--trainer.module=csmpn_tpu.engineer.Trainer",
        "--trainer.max_steps=6",
        "--trainer.val_check_interval=3",
        "--trainer.print_interval=2",
        "--trainer.log_interval=3",
        "--trainer.limit_val_batches=1",
        "--optimizer.module=csmpn_tpu.engineer.optim.adam",
    ] + extra
    # the CPU override must precede jax import in the subprocess: the task
    # modules import jax at module import time, after env is read
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=timeout)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "Stopping due to max_steps." in proc.stdout
    assert "val/loss" in proc.stdout
    return proc.stdout


@pytest.mark.slow
class TestTaskEntrypoints:
    def test_hulls(self, tmp_path):
        run_task("csmpn_tpu.tasks.hulls", [
            "--dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset",
            "--dataset.num_samples=8", "--dataset.batch_size=4",
            "--dataset.num_val_samples=4",
            "--model.module=csmpn_tpu.models.hulls.HullsModel",
            "--model.hidden_features=4", "--model.num_layers=1",
        ], str(tmp_path))

    def test_motion(self, tmp_path):
        run_task("csmpn_tpu.tasks.motion", [
            "--dataset.module=csmpn_tpu.data.motion.MotionDataset",
            "--dataset.num_training_samples=11", "--dataset.batch_size=4",
            "--dataset.num_eval_samples=6",
            "--model.module=csmpn_tpu.models.motion.MotionModel",
            "--model.num_hidden=4", "--model.num_layers=1",
        ], str(tmp_path))

    def test_md17(self, tmp_path):
        out = run_task("csmpn_tpu.tasks.md17", [
            "--dataset.module=csmpn_tpu.data.md17.MD17Dataset",
            "--dataset.molecule_type=ethanol", "--dataset.dis=10000",
            "--dataset.num_train_samples=8", "--dataset.batch_size=4",
            "--dataset.num_eval_samples=4",
            "--model.module=csmpn_tpu.models.md17.MD17Model",
            "--model.num_hidden=4", "--model.num_layers=1",
        ], str(tmp_path))
        assert "val/ade_loss" in out

    def test_nba(self, tmp_path):
        out = run_task("csmpn_tpu.tasks.nba", timeout=840, extra=[
            "--dataset.module=csmpn_tpu.data.nba.NBADataset",
            "--dataset.mode=atk", "--dataset.max_samples=8",
            "--dataset.batch_size=4",
            "--model.module=csmpn_tpu.models.nba.NBAModel",
            "--model.num_hidden=4", "--model.num_layers=1",
        ], dataroot=str(tmp_path))
        assert "val/fde_loss" in out

    def test_sweep_local_dry_run(self, tmp_path):
        from csmpn_tpu.engineer.sweep import sweep_local

        rc = sweep_local(os.path.join(REPO, "configs", "hulls.yaml"),
                         dry_run=True)
        assert rc == 0
