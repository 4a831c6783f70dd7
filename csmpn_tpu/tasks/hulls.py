"""Convex-hulls task entry (reference csmpn/hulls.py).

Run:  python -m csmpn_tpu.tasks.hulls -C configs/engineer/trainer.yaml \
        --model.module=csmpn_tpu.models.hulls.HullsModel \
        --dataset.module=csmpn_tpu.data.hulls.ConvexHullDataset \
        --optimizer.module=csmpn_tpu.engineer.optim.adam \
        --trainer.max_steps=131072
or via the sweep runner:  python -m csmpn_tpu.engineer.sweep configs/hulls.yaml
"""
from csmpn_tpu.engineer.fire import fire
from csmpn_tpu.tasks.common import run_task


def main(config):
    run_task(config)


if __name__ == "__main__":
    fire(main)
