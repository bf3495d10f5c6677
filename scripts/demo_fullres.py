#!/usr/bin/env python
"""Full-resolution production-path demo: CubeNET-64 training at the paper
protocol (608x968, 238-band window of 299-band ENVI cubes, batch 2) with
REAL file I/O — synthetic cubes written as genuine ENVI .hdr/.dat pairs and
read back through the native C++ reader + prefetching pipeline.

Shows the host-I/O story: epoch 1 pays cold ENVI reads; with
cfg.cache_items set, later epochs run from the decoded host-RAM LRU and the
TPU step time dominates.

Usage: python scripts/demo_fullres.py [--workdir DIR] [--epochs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--boxes", type=int, default=3)
    p.add_argument("--dates", type=int, default=2)
    p.add_argument("--no-cache", action="store_true")
    p.add_argument("--no-disk-cache", action="store_true",
                   help="disable the on-disk decoded-cube cache (on by default "
                        "under <workdir>/decoded_cache; a SECOND run of this "
                        "script pays no cold ENVI decode at all)")
    args = p.parse_args()

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.data.synthetic import make_experiment_tree
    from hyperpri_tpu.train import train_net

    workdir = args.workdir or tempfile.mkdtemp(prefix="hyperpri_fullres_")
    marker = os.path.join(workdir, "Datasets", "HyperPRI", "data_splits", "train1.json")
    if os.path.exists(marker):
        print(f"== reusing existing cubes under {workdir}")
    else:
        print(f"== writing {args.boxes * args.dates} full-size 299-band ENVI cubes under {workdir}")
        t0 = time.time()
        make_experiment_tree(
            workdir, n_boxes=args.boxes, dates_per_box=args.dates,
            size_hw=(608, 968), bands=299,
        )
        print(f"   generated in {time.time() - t0:.0f}s")

    cfg = ExpHyperspectralPRI(calling_path=workdir, split_no=1)  # paper defaults
    cfg.precision = "bf16"
    cfg.cache_items = 0 if args.no_cache else 16
    if not args.no_disk_cache:
        cfg.decoded_cache_dir = os.path.join(workdir, "decoded_cache")
    trainer = train_net(cfg, max_epochs=args.epochs, progress=True)

    import csv

    with open(os.path.join(cfg.save_path, "LOGS", "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    times = [round(float(r["epoch_time"]), 2) for r in rows]
    print(json.dumps({
        "workdir": workdir,
        "epoch_times_sec": times,
        "cold_epoch_sec": times[0] if times else None,
        "warm_epoch_sec": times[-1] if len(times) > 1 else None,
        "best_val_loss": trainer.fit_result.best_val_loss,
    }, indent=2))


if __name__ == "__main__":
    main()
