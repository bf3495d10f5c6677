#!/usr/bin/env python
"""Test-set evaluation + inference-time benchmark for all three models.

Script equivalent of the reference's test_models.ipynb (SURVEY.md §2 C18):
per model and split, evaluate the held-out test split at the published best
thresholds, and measure wall-clock inference time (batch 1, mean of 5 runs).
The reference's protocol is torch-on-CPU; here the timing runs on whatever
backend JAX selects (TPU by default, --cpu to mirror the protocol exactly).

Usage:
  python scripts/test_models.py --calling-path /data/exp [--models CubeNET]
         [--splits 1 2 3 4 5] [--cpu] [--thresholds 0.33 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--calling-path", default=os.getcwd())
    p.add_argument("--models", nargs="+", default=["UNET", "SpectralUNET", "CubeNET"])
    p.add_argument("--splits", nargs="+", type=int, default=[1, 2, 3, 4, 5])
    p.add_argument("--cpu", action="store_true", help="time on CPU (reference protocol)")
    p.add_argument("--timing-runs", type=int, default=5)
    p.add_argument("--test-json", default=None)
    p.add_argument("--out", default=None, help="write results JSON here")
    from hyperpri_tpu.cli import _add_model_overrides

    _add_model_overrides(p)
    args = p.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"  # also gates the compile cache off
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.cli import (
        REFERENCE_THRESHOLDS,
        _apply_model_overrides,
        _make_config,
    )
    from hyperpri_tpu.train import Trainer, test_net
    from hyperpri_tpu.train.evaluate import _load_eval_state

    results = {}
    for model_name in args.models:
        dset = "RGB" if model_name.upper() == "UNET" else "HSI"
        for split in args.splits:
            cfg = _make_config(dset, args.calling_path, split, 0, False)
            cfg.change_network_param(model_name, args.calling_path, split)
            _apply_model_overrides(cfg, args)
            if args.test_json:
                cfg.json_dir["test"] = args.test_json
            else:
                cfg.json_dir["test"] = os.path.join(cfg.data_dir, "data_splits", "test.json")
            thr = REFERENCE_THRESHOLDS.get(model_name, [0.5] * 5)[split - 1]

            print(f"===== {model_name} split {split} (threshold {thr}) =====")
            trainer = Trainer(cfg)
            try:
                state = _load_eval_state(trainer, cfg, None)
            except FileNotFoundError as e:
                print(f"   skipped: {e}")
                continue
            data = cfg.get_test_data()
            metrics = test_net(data, cfg, best_threshold=thr, trainer=trainer, state=state)

            # Inference timing: batch 1, mean of N runs over the test set
            # (reference test_models.ipynb cell 11 protocol).
            sample = data[0]["image"][None]
            x = jnp.asarray(sample)

            @jax.jit
            def forward(variables, image):
                out = trainer.model.apply(variables, image, train=False)
                return jnp.sum(out.astype(jnp.float32))

            variables = {"params": state.params, "batch_stats": state.batch_stats}
            float(forward(variables, x))  # compile
            times = []
            for _ in range(args.timing_runs):
                t0 = time.perf_counter()
                float(forward(variables, x))
                times.append(time.perf_counter() - t0)
            mean_t = float(np.mean(times))
            print(f"   inference: {mean_t * 1e3:.1f} ms/image (mean of {args.timing_runs})")
            metrics["conf_mat"] = np.asarray(metrics["conf_mat"]).tolist()
            metrics["inference_sec_per_image"] = mean_t
            results[f"{model_name}_split{split}"] = metrics

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
