"""Summarize a task-CLI training log into one JSON row for RESULTS.md.

The ConsoleLogger prints ``section/metric: value`` blocks at log/val/test
boundaries (engineer/loggers.py:30).  This extracts, per metric family:
final train value, best val value, the test value logged immediately
after that best val (the trainer schedules a test pass on every
val-improvement — engineer/checkpoint.py), the last training step
reached, and the median train s_it.

Usage: python tools/summarize_run.py runs/<log> [runs/<log> ...]
"""
from __future__ import annotations

import json
import re
import statistics
import sys

LINE = re.compile(r"^(train|val|test)/([\w.]+): (-?[\d.]+(?:e-?\d+)?)$")
STEP = re.compile(r"^Step: (\d+) \(Training\)")


def summarize(path: str) -> dict:
    last = {"train": {}, "val": {}, "test": {}}
    best_val: dict = {}
    test_at_best: dict = {}
    s_its: list = []
    last_step = 0
    pending_best = False
    pending_val_best = False
    with open(path, errors="replace") as f:
        for line in f:
            line = line.rstrip("\n")
            ms = STEP.match(line)
            if ms:
                last_step = int(ms.group(1))
                continue
            m = LINE.match(line)
            if not m:
                continue
            sec, key, val = m.group(1), m.group(2), float(m.group(3))
            last[sec][key] = val
            if sec == "train" and key == "s_it":
                s_its.append(val)
            if sec == "val" and key == "loss":
                if val < best_val.get("loss", float("inf")):
                    pending_val_best = True
            if sec == "val" and key == "s_it" and pending_val_best:
                # s_it is the last metric the trainer appends to a val
                # block; snapshotting here (not at the loss line) keeps
                # metrics printed after loss from carrying stale values
                # from the previous block.
                best_val = dict(last["val"])
                pending_val_best = False
                pending_best = True
            if sec == "test" and key == "s_it" and pending_best:
                # end of the test block that followed the improvement
                test_at_best = dict(last["test"])
                pending_best = False
    return {
        "log": path,
        "last_train_step": last_step,
        "final_train": last["train"],
        "best_val": best_val,
        "test_at_best_val": test_at_best,
        "median_train_s_it": (round(statistics.median(s_its), 4)
                              if s_its else None),
    }


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(json.dumps(summarize(p)))
