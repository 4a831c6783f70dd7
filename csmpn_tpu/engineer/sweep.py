"""Sweep launchers (reference `engineer/sweep/sweep_local.py` and
`sweep.py`).

``sweep_local``: expands a YAML ``parameters`` grid into a cartesian product
of shell commands and runs each sequentially, stopping on first failure
(sweep_local.py:26-53).  ``write_slurm_jobfile``: generates a SLURM array
jobfile for the grid (cluster analogue of sweep.py:127-200, wandb-free).
"""
from __future__ import annotations

import itertools
import subprocess
import sys
from typing import Dict, List, Optional

import yaml


def expand_grid(config: Dict) -> List[Dict]:
    parameters = {k: v["values"] for k, v in config["parameters"].items()}
    keys, values = zip(*parameters.items()) if parameters else ((), ())
    return [dict(zip(keys, combo))
            for combo in itertools.product(*values)]


def build_commands(config: Dict, extra_args: List[str]) -> List[str]:
    base = []
    for c in config["command"]:
        if c == "${env}":
            base.append("/usr/bin/env")
        elif c == "${interpreter}":
            base.append("python -u")
        elif c == "${program}":
            base.append(config["program"])
        elif c == "${args}":
            continue
        else:
            base.append(c)
    commands = []
    for combo in expand_grid(config):
        cmd = base + [f"--{k}={v}" for k, v in combo.items()] + extra_args
        commands.append(" ".join(cmd))
    return commands


def sweep_local(config_path: str, extra_args: Optional[List[str]] = None,
                dry_run: bool = False) -> int:
    with open(config_path) as f:
        config = yaml.safe_load(f)
    for cmd in build_commands(config, list(extra_args or [])):
        print("\nRunning:", cmd, "\n")
        if dry_run:
            continue
        result = subprocess.call(cmd, shell=True)
        if result != 0:
            return result
    return 0


def write_slurm_jobfile(config_path: str, out_path: str,
                        partition: str = "gpu", time: str = "24:00:00",
                        extra_args: Optional[List[str]] = None) -> str:
    with open(config_path) as f:
        config = yaml.safe_load(f)
    commands = build_commands(config, list(extra_args or []))
    lines = [
        "#!/bin/bash",
        f"#SBATCH --array=0-{len(commands) - 1}",
        f"#SBATCH --partition={partition}",
        f"#SBATCH --time={time}",
        "",
        "case $SLURM_ARRAY_TASK_ID in",
    ]
    for i, cmd in enumerate(commands):
        lines.append(f"  {i}) {cmd} ;;")
    lines += ["esac", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    return out_path


def main() -> None:
    sys.exit(sweep_local(sys.argv[1], sys.argv[2:]))


def main_cluster() -> None:
    """Cluster analogue of the reference `sweep` console script
    (sweep.py:127-200): expands the grid into a SLURM array jobfile.
    wandb sweep registration is intentionally omitted (offline
    environments); the jobfile is self-contained."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--out", default="sweep_job.sh")
    ap.add_argument("--partition", default="gpu")
    ap.add_argument("--time", default="24:00:00")
    args, extra = ap.parse_known_args()
    path = write_slurm_jobfile(args.config, args.out,
                               partition=args.partition, time=args.time,
                               extra_args=extra)
    print(f"Wrote SLURM array jobfile: {path}")


if __name__ == "__main__":
    main()
