#!/usr/bin/env python
"""Input-pipeline throughput vs train-step time (TODO: train-step pipelining).

Answers: can the host pipeline (ENVI decode -> crop -> collate -> bf16 cast
-> device_put, with a prefetch thread and the opt-in LRU cube cache) keep a
~120 ms/step CubeNET train step fed with REAL on-disk ENVI cubes?

Writes full-resolution synthetic cubes once (same ENVI layout as HyperPRI),
then measures:
  1. loader-only, host side (device_put off): cold epoch (disk) vs warm
     epochs (LRU cache) — the reference re-reads every cube every epoch
     (SURVEY §3.1); the cache is this framework's fix.
  2. loader with device_put (bf16): adds the host->device link. On this
     tunneled dev platform the link is the bottleneck (not so on a real
     TPU host with local PCIe).
  3. end-to-end train steps/s consuming the loader, vs the synthetic-input
     step rate (scripts/bench_train.py) — the gap is the un-overlapped
     ingest cost.

Usage: python scripts/bench_input_pipeline.py [--workdir DIR] [--boxes 4]
       [--height 608 --width 968 --bands 238] [--epochs 3] [--e2e]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/hyperpri_pipe_bench")
    p.add_argument("--boxes", type=int, default=4)
    p.add_argument("--dates", type=int, default=2)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=968)
    p.add_argument("--bands", type=int, default=238)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--cache", type=int, default=64, help="LRU cube cache items")
    p.add_argument("--e2e", action="store_true", help="also time real train steps")
    args = p.parse_args()

    import jax
    import ml_dtypes
    import numpy as np

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.data.pipeline import DataLoader
    from hyperpri_tpu.data.synthetic import make_experiment_tree

    marker = os.path.join(
        args.workdir, f"ok_{args.boxes}x{args.dates}_{args.height}x{args.width}x{args.bands}"
    )
    if not os.path.exists(marker):
        t0 = time.perf_counter()
        os.makedirs(args.workdir, exist_ok=True)
        make_experiment_tree(
            args.workdir,
            n_boxes=args.boxes,
            dates_per_box=args.dates,
            size_hw=(args.height, args.width),
            bands=args.bands,
        )
        open(marker, "w").write("ok")
        print(f"wrote {args.boxes * args.dates} cubes in {time.perf_counter()-t0:.1f}s",
              flush=True)

    cfg = ExpHyperspectralPRI(calling_path=args.workdir, split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, args.bands
    cfg.channels = args.bands
    cfg.augment = False
    ds = cfg.get_train_data()
    ds._cache_items = args.cache
    n = len(ds)
    print(f"dataset: {n} cubes of {args.height}x{args.width}x{args.bands}", flush=True)

    def run_epochs(device_put, tag):
        loader = DataLoader(
            ds, args.batch, shuffle=True, prefetch=2, device_put=device_put,
            image_dtype=ml_dtypes.bfloat16,
        )
        for ep in range(args.epochs):
            loader.set_epoch(ep)
            t0 = time.perf_counter()
            count = 0
            for b in loader:
                if device_put:
                    jax.block_until_ready(b["image"])
                count += 1
            dt = time.perf_counter() - t0
            kind = "cold" if ep == 0 else "warm"
            print(
                f"{tag} epoch {ep} ({kind}): {dt:6.2f}s  "
                f"{n/dt:6.2f} cubes/s  {dt/count*1e3:7.1f} ms/batch",
                flush=True,
            )

    run_epochs(False, "host-only")
    if jax.default_backend() == "tpu":
        run_epochs(True, "devput    ")

    if args.e2e:
        import jax.numpy as jnp

        from hyperpri_tpu.train.trainer import create_train_state, make_train_step

        cfg.precision = "bf16"
        cfg.model_name = "CubeNET"
        model = cfg.get_network()
        state = create_train_state(
            cfg, model, np.zeros((1, 64, 64, args.bands), np.float32), seed=0
        )
        step = jax.jit(make_train_step(cfg.threshold))
        loader = DataLoader(ds, args.batch, shuffle=True, prefetch=2,
                            device_put=True, image_dtype=ml_dtypes.bfloat16)
        # compile + warm cache epoch
        loader.set_epoch(0)
        for b in loader:
            b.pop("names", None)
            state, logs = step(state, b)
        float(logs["loss_sum"])
        for ep in (1, 2):
            loader.set_epoch(ep)
            t0 = time.perf_counter()
            count = 0
            for b in loader:
                b.pop("names", None)
                state, logs = step(state, b)
                count += 1
            float(logs["loss_sum"])  # force
            dt = time.perf_counter() - t0
            print(
                f"e2e train epoch {ep}: {dt:6.2f}s  {dt/count*1e3:7.1f} ms/step "
                f"({count} steps, warm cache)",
                flush=True,
            )


if __name__ == "__main__":
    main()
