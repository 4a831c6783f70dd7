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

    def test_hulls_checkpoint_restore_test_only(self, tmp_path):
        """Train -> best-val orbax checkpoint -> a SECOND CLI invocation
        with --trainer.test_only --trainer.checkpoint=<dir> restores and
        runs only the test loop (the evidence-run resume/eval workflow)."""
        import glob

        hulls_args = [
            "--dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset",
            "--dataset.num_samples=8", "--dataset.batch_size=4",
            "--dataset.num_val_samples=4",
            "--model.module=csmpn_tpu.models.hulls.HullsModel",
            "--model.hidden_features=4", "--model.num_layers=1",
        ]
        out = run_task("csmpn_tpu.tasks.hulls", hulls_args, str(tmp_path))
        assert "saved checkpoint" in out
        # the run directory is the flag-derived name (hash-truncated at
        # 96 chars — engineer/config.py get_run_name), so match any run
        ckpts = glob.glob(os.path.join(
            str(tmp_path), "runs", "*", "best_val_loss"))
        assert ckpts, f"no orbax checkpoint written; out: {out[-1500:]}"

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["DATAROOT"] = str(tmp_path)
        env["RUNDIR"] = os.path.join(str(tmp_path), "runs")
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        cmd = [
            sys.executable, "-m", "csmpn_tpu.tasks.hulls",
            "--run_name=ckpt_eval",
            "--trainer.module=csmpn_tpu.engineer.Trainer",
            "--trainer.max_steps=6", "--trainer.test_only=True",
            f"--trainer.checkpoint={ckpts[0]}",
            "--optimizer.module=csmpn_tpu.engineer.optim.adam",
        ] + hulls_args
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=540)
        assert proc.returncode == 0, \
            proc.stdout[-3000:] + proc.stderr[-3000:]
        assert "Successfully restored state" in proc.stdout
        assert "Testing mode." in proc.stdout
        assert "test/loss" in proc.stdout

    def test_hulls_segmented_resume_from_last(self, tmp_path):
        """Segmented-run workflow (max_rss_gb / max_time stops): the first
        invocation stops and writes a latest-state checkpoint
        (<run>/last); a second invocation with --trainer.checkpoint=
        <run>/last resumes at the saved global step and finishes the
        budget — the relaunch loop runs/queue_r5b.sh relies on."""
        import glob

        hulls_args = [
            "--dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset",
            "--dataset.num_samples=8", "--dataset.batch_size=4",
            "--dataset.num_val_samples=4",
            "--model.module=csmpn_tpu.models.hulls.HullsModel",
            "--model.hidden_features=4", "--model.num_layers=1",
        ]
        out = run_task("csmpn_tpu.tasks.hulls", hulls_args, str(tmp_path))
        assert "Saved latest-state checkpoint" in out
        lasts = glob.glob(os.path.join(str(tmp_path), "runs", "*", "last"))
        assert lasts, f"no last checkpoint written; out: {out[-1500:]}"

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["DATAROOT"] = str(tmp_path)
        env["RUNDIR"] = os.path.join(str(tmp_path), "runs")
        env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
        env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
        cmd = [
            sys.executable, "-m", "csmpn_tpu.tasks.hulls",
            "--run_name=seg2",
            "--trainer.module=csmpn_tpu.engineer.Trainer",
            "--trainer.max_steps=10",
            "--trainer.val_check_interval=4",
            "--trainer.print_interval=1",
            "--trainer.limit_val_batches=1",
            f"--trainer.checkpoint={lasts[0]}",
            "--optimizer.module=csmpn_tpu.engineer.optim.adam",
        ] + hulls_args
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=540)
        assert proc.returncode == 0, \
            proc.stdout[-3000:] + proc.stderr[-3000:]
        assert "Successfully restored state" in proc.stdout
        # resumed at step 6 (the first run's max_steps), not step 0
        assert "Set global step to 6." in proc.stdout
        assert "Step: 6 (Training)" in proc.stdout
        assert "Stopping due to max_steps." in proc.stdout
