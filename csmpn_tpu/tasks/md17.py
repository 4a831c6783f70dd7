"""Md17 task entry (reference csmpn/md17.py).

Run via the sweep runner:
    python -m csmpn_tpu.engineer.sweep configs/md17.yaml
"""
from csmpn_tpu.engineer.fire import fire
from csmpn_tpu.tasks.common import run_task


def main(config):
    run_task(config)


if __name__ == "__main__":
    fire(main)
