"""Experiment-framework tests: config reflection, schedulers, metrics,
checkpointing, sweep expansion."""
import math
import os

import numpy as np
import pytest

from csmpn_tpu.engineer.config import (
    get_default_args,
    load_module,
    merge_dict,
    parse_args,
    unflatten,
)
from csmpn_tpu.engineer.metrics import (
    Accuracy,
    BinaryAUROC,
    Loss,
    MetricCollection,
    RMSRE,
    RRMSE,
)
from csmpn_tpu.engineer.schedulers import cosine_annealing_schedule
from csmpn_tpu.engineer.sweep import build_commands, expand_grid


class _Dummy:
    def __init__(self, a: int = 3, lr=1e-3, flag: bool = False,
                 name: str = "x"):
        self.a, self.lr, self.flag, self.name = a, lr, flag, name


class TestConfig:
    def test_merge_and_unflatten(self):
        a = {"x": {"y": 1, "z": 2}, "k": 3}
        b = {"x": {"y": 9}}
        assert merge_dict(a, b) == {"x": {"y": 9, "z": 2}, "k": 3}
        assert unflatten({"a.b.c": 1, "a.d": 2}) == {
            "a": {"b": {"c": 1}, "d": 2}}

    def test_reflection_defaults(self):
        args = get_default_args(_Dummy.__init__)
        assert args == {"a": 3, "lr": 1e-3, "flag": False, "name": "x"}

    def test_parse_module_and_overrides(self, tmp_path):
        cfg = tmp_path / "base.yaml"
        cfg.write_text("trainer:\n  module: csmpn_tpu.engineer.Trainer\n"
                       "  max_steps: 100\n")
        config, name, exp = parse_args([
            "prog.py", "-C", str(cfg),
            "--model.module=tests.test_engineer._Dummy",
            "--model.a=7", "--model.lr=3e-3", "--model.flag=true",
            "--trainer.max_steps=5",
        ])
        assert config["model"]["module"] == "tests.test_engineer._Dummy"
        assert config["model"]["a"] == 7
        assert config["model"]["lr"] == pytest.approx(3e-3)
        assert config["model"]["flag"] is True
        assert config["trainer"]["max_steps"] == 5
        assert config["seed"] == 42

    def test_sweep_pseudo_args_spliced(self, tmp_path):
        config, _, _ = parse_args([
            "prog.py",
            "--_combo='--model.module=tests.test_engineer._Dummy "
            "--model.a=9'",
        ])
        assert config["model"]["a"] == 9

    def test_unknown_key_raises(self, tmp_path):
        cfg = tmp_path / "bad.yaml"
        cfg.write_text("model:\n  module: tests.test_engineer._Dummy\n"
                       "  bogus: 1\n")
        with pytest.raises(KeyError):
            parse_args(["prog.py", "-C", str(cfg)])

    def test_load_module(self):
        fn = load_module("csmpn_tpu.engineer.optim.adam")
        assert callable(fn)


class TestScheduler:
    def test_phases(self):
        s = cosine_annealing_schedule(1.0, max_steps=128, warmup_steps=16,
                                      decay_steps=32)
        # warmup starts at 0, reaches ~1 at warmup end
        assert float(s(0)) == pytest.approx(0.0, abs=1e-6)
        assert float(s(8)) == pytest.approx(0.5, abs=1e-6)
        # plateau
        assert float(s(50)) == pytest.approx(1.0)
        # decay ends at 0
        assert float(s(127)) == pytest.approx(
            0.5 + 0.5 * math.cos(math.pi * 31 / 32), abs=1e-6)

    def test_no_warmup(self):
        s = cosine_annealing_schedule(2.0, max_steps=10)
        assert float(s(0)) == pytest.approx(2.0)
        assert float(s(9)) == pytest.approx(2.0)


class TestMetrics:
    def test_loss_mean(self):
        m = Loss()
        m.update(np.array([1.0, 3.0]))
        m.update(np.array([5.0]))
        assert m.compute() == pytest.approx(3.0)
        m.reset()
        assert m.empty()

    def test_collection_validates_names(self):
        c = MetricCollection({"loss": Loss()})
        with pytest.raises(ValueError):
            c.update(unknown=np.array([1.0]))

    def test_rrmse(self):
        m = RRMSE()
        m.update((np.array([4.0, 4.0]), np.array([16.0, 16.0])))
        assert m.compute() == pytest.approx(0.5)

    def test_auroc_perfect(self):
        m = BinaryAUROC()
        m.update((np.array([0.9, 0.8, 0.2, 0.1]),
                  np.array([1, 1, 0, 0])))
        assert m.compute() == pytest.approx(1.0)

    def test_auroc_interleaved(self):
        # points (0,0)->(0,.5)->(.5,.5)->(.5,1)->(1,1): AUC = 0.75
        m = BinaryAUROC()
        m.update((np.array([0.9, 0.8, 0.7, 0.6]),
                  np.array([1, 0, 1, 0])))
        assert float(m.compute()) == pytest.approx(0.75)


class TestSweep:
    def test_grid_expansion(self, tmp_path):
        cfg = {
            "program": "csmpn_tpu/tasks/hulls.py",
            "command": ["${env}", "${interpreter}", "${program}",
                        "--fixed=1", "${args}"],
            "parameters": {
                "lr": {"values": [0.1, 0.2]},
                "bs": {"values": [8]},
            },
        }
        combos = expand_grid(cfg)
        assert len(combos) == 2
        cmds = build_commands(cfg, ["--extra=x"])
        assert all("--fixed=1" in c and "--extra=x" in c for c in cmds)
        assert any("--lr=0.1" in c for c in cmds)
        assert any("--lr=0.2" in c for c in cmds)

    def test_in_repo_programs_run_as_modules(self, tmp_path):
        """Task scripts invoked as FILES cannot import csmpn_tpu
        (sys.path[0] becomes tasks/, and PYTHONPATH must stay unset for
        the TPU plugin — NOTES.md), so build_commands must emit the
        ``-m`` module form for in-repo programs."""
        cfg = {
            "program": "csmpn_tpu/tasks/md17.py",
            "command": ["${env}", "${interpreter}", "${program}",
                        "${args}"],
            "parameters": {},
        }
        (cmd,) = build_commands(cfg, [])
        assert "python -u -m csmpn_tpu.tasks.md17" in cmd
        # out-of-repo programs pass through untouched
        cfg["program"] = "some/other/script.py"
        (cmd,) = build_commands(cfg, [])
        assert "some/other/script.py" in cmd and " -m " not in cmd

    def test_shipped_configs_expand(self):
        """Every shipped sweep yaml must parse and expand into runnable
        module-form commands (the reference user's entry point:
        ``python -m csmpn_tpu.engineer.sweep configs/<task>.yaml``)."""
        import os

        import yaml

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for task in ("hulls", "motion", "md17", "nba"):
            with open(os.path.join(root, "configs", f"{task}.yaml")) as f:
                cfg = yaml.safe_load(f)
            cmds = build_commands(cfg, [])
            assert cmds, task
            assert all(f"-m csmpn_tpu.tasks.{task}" in c for c in cmds), task


class TestWandbSweep:
    """Reference `sweep` console flow (sweep.py:127-200): wandb sweep
    registration, agent jobfile, sweep-id git tag — exercised offline with
    an injected fake wandb module and a throwaway git repo."""

    def _write_cfg(self, tmp_path):
        import yaml

        cfg = {
            "program": "csmpn_tpu/tasks/hulls.py",
            "project": "csmpn-tests",
            "command": ["${env}", "${interpreter}", "${program}",
                        "${args}"],
            "parameters": {"lr": {"values": [0.1, 0.2, 0.3]}},
        }
        p = tmp_path / "sweep.yaml"
        p.write_text(yaml.safe_dump(cfg))
        return p

    def test_register_tag_and_jobfile(self, tmp_path, monkeypatch):
        import subprocess

        from csmpn_tpu.engineer.sweep import sweep_wandb

        repo = tmp_path / "repo"
        repo.mkdir()
        monkeypatch.chdir(repo)
        for cmd in ("git init -q", "git config user.email t@t",
                    "git config user.name t",
                    "git commit --allow-empty -q -m init"):
            subprocess.run(cmd, shell=True, check=True)

        class FakeWandb:
            @staticmethod
            def sweep(sweep, project=None, entity=None):
                assert project == "csmpn-tests"
                assert sweep["parameters"]["lr"]["values"] == [0.1, 0.2, 0.3]
                return "abc123"

        cfg = self._write_cfg(tmp_path)
        job = tmp_path / "job.sh"
        sweep_id = sweep_wandb(str(cfg), wandb_module=FakeWandb,
                               jobfile=str(job))
        assert sweep_id == "abc123"
        text = job.read_text()
        assert "#SBATCH --array=1-3" in text          # one task per combo
        assert "git checkout abc123" in text
        assert "wandb agent" in text and "abc123" in text
        tags = subprocess.run("git tag", shell=True, capture_output=True,
                              text=True).stdout.split()
        assert "abc123" in tags                        # sweep-id tag pinned

    def test_detached_head_refused(self, tmp_path):
        from csmpn_tpu.engineer.sweep import sweep_wandb

        def fake_git(cmd):
            return "HEAD detached at 1234abc" if "status" in cmd else ""

        with pytest.raises(RuntimeError, match="detached"):
            sweep_wandb(str(self._write_cfg(tmp_path)), wandb_module=None,
                        run_git=fake_git)

    def test_missing_wandb_clear_error(self, tmp_path):
        from csmpn_tpu.engineer.sweep import register_wandb_sweep

        try:
            import wandb  # noqa: F401
            pytest.skip("real wandb present")
        except ImportError:
            pass
        with pytest.raises(RuntimeError, match="not installed"):
            register_wandb_sweep({"parameters": {}})


class TestMoreMetrics:
    def test_accuracy(self):
        m = Accuracy()
        m.update(np.array([1.0, 0.0, 1.0, 1.0]))
        assert m.compute() == pytest.approx(0.75)

    def test_rmsre(self):
        m = RMSRE()
        m.update(np.array([4.0, 4.0]))
        assert m.compute() == pytest.approx(2.0)

    def test_lorentz_metric(self):
        from csmpn_tpu.engineer.metrics import LorentzMetric

        m = LorentzMetric()
        rng = np.random.RandomState(0)
        target = rng.randint(0, 2, 200)
        preds = np.clip(target * 0.6 + rng.rand(200) * 0.4, 0, 1)
        m.update((preds, target))
        out = m.compute()
        assert set(out) == {"auc", "eB_0.3", "eB_0.5"}
        assert out["auc"] > 0.5


class TestCyclicScheduler:
    def test_cycle(self):
        from csmpn_tpu.engineer.schedulers import cosine_cyclic_schedule

        s = cosine_cyclic_schedule(1.0, max_steps=100, cycle_steps=10)
        # at step 0: 0.5*((min-base)*cos(0)+min+base) = min (f32 eps)
        assert float(s(0)) == pytest.approx(1e-7, abs=1e-6)
        # half cycle: base
        assert float(s(5)) == pytest.approx(1.0, abs=1e-6)
        assert float(s(10)) == pytest.approx(1e-7, abs=1e-6)


class TestDiscoverTests:
    def test_runner(self, tmp_path):
        from csmpn_tpu.engineer.discover_tests import discover_and_run

        good = tmp_path / "mod_ok.py"
        good.write_text("def test():\n    assert True\n")
        bad = tmp_path / "mod_bad.py"
        bad.write_text("def test():\n    raise RuntimeError('boom')\n")
        plain = tmp_path / "mod_plain.py"
        plain.write_text("x = 1\n")
        failures = discover_and_run(str(tmp_path))
        assert failures == 1


class TestCheckpointReplacement:
    def test_stale_file_removed_on_improvement(self, tmp_path):
        from csmpn_tpu.engineer.checkpoint import Checkpoint

        class FakeLogger:
            dir = str(tmp_path)

        class FakeTrainer:
            logger = FakeLogger()
            current_epoch = 0
            global_step = 1
            should_test = False

        ckpt = Checkpoint("val/loss")
        state = ({"w": np.zeros(2)}, {"m": np.zeros(2)})
        t = FakeTrainer()
        ckpt.on_test_end(t, state, {"val/loss": 1.0})
        assert t.should_test
        path = os.path.join(str(tmp_path), "best_val_loss")
        assert os.path.exists(path)
        # improvement overwrites in place
        ckpt.on_test_end(t, state, {"val/loss": 0.5})
        assert ckpt.best_metrics["val/loss"] == 0.5
        # no improvement: untouched
        ckpt.on_test_end(t, state, {"val/loss": 0.9})
        assert ckpt.best_metrics["val/loss"] == 0.5
