#!/usr/bin/env python
"""Summarize a training run's tensorboard scalars: step time + topology-event
phase breakdown (densification/t_* keys written by topo/graph_ops.py).

Usage: python scripts/read_run_timings.py <model_dir> [--last N]
"""

import argparse
import collections
import glob
import os


def load_scalars(model_dir):
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )
    from tensorboard.util import tensor_util

    files = sorted(glob.glob(os.path.join(model_dir, "events.out.tfevents.*")),
                   key=os.path.getmtime)
    vals = collections.defaultdict(list)
    for f in files:
        for ev in EventFileLoader(f).Load():
            for v in ev.summary.value or []:
                # torch SummaryWriter stores values as tensor protos;
                # simple_value reads 0.0 there. Skip non-scalar tensors
                # (logged images).
                if v.HasField("tensor"):
                    arr = tensor_util.make_ndarray(v.tensor)
                    if arr.size != 1:
                        continue
                    x = float(arr.reshape(()))
                else:
                    x = v.simple_value
                vals[v.tag].append((ev.step, x))
    return vals


def main():
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("model_dir")
    p.add_argument("--last", type=int, default=20,
                   help="summarize the last N samples per tag")
    args = p.parse_args()
    vals = load_scalars(args.model_dir)
    for tag in sorted(vals):
        if not (tag.startswith("densification/") or tag == "general/iter_time"
                or tag.startswith("eval/") or tag.startswith("general/num")):
            continue
        xs = [x for _, x in vals[tag][-args.last:]]
        print(f"{tag:45s} n={len(vals[tag]):6d} "
              f"last{args.last}: mean={np.mean(xs):10.3f} "
              f"min={np.min(xs):10.3f} max={np.max(xs):10.3f}")


if __name__ == "__main__":
    main()
