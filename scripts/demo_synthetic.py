#!/usr/bin/env python
"""End-to-end demo on synthetic rhizobox data: train CubeNET, sweep
thresholds, evaluate the held-out split, render segmaps.

Exercises the complete reference protocol (train -> validate_net threshold
sweep -> test_net at the chosen threshold -> segmap export) without the
unreleased HyperPRI dataset; the synthetic cubes are linearly separable in
the spectral dimension, so a correct pipeline reaches DICE > 0.9 quickly.

Usage: python scripts/demo_synthetic.py [--workdir DIR] [--epochs 30] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--size", type=int, nargs=2, default=(64, 96))
    p.add_argument("--bands", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        # Env var too: the persistent-compile-cache gate (hyperpri_tpu
        # __init__) reads JAX_PLATFORMS to skip host-specific CPU AOT entries.
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.data.synthetic import make_experiment_tree
    from hyperpri_tpu.ops.metrics import best_threshold_from_pr
    from hyperpri_tpu.train import test_net, train_net, validate_net

    workdir = args.workdir or tempfile.mkdtemp(prefix="hyperpri_demo_")
    make_experiment_tree(
        workdir, n_boxes=4, dates_per_box=3, size_hw=tuple(args.size),
        bands=args.bands, n_splits=2,
    )
    cfg = ExpHyperspectralPRI(calling_path=workdir, split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, args.bands
    cfg.channels = args.bands
    cfg.cube_featmaps = 16
    cfg.epochs = args.epochs
    cfg._refresh_paths()

    print(f"== training CubeNET-16 on synthetic cubes under {workdir}")
    trainer = train_net(cfg, progress=True)
    print(f"== threshold sweep (validate_net)")
    import jax.numpy as jnp

    precision, recall, thresholds = validate_net(cfg.get_val_data(), cfg)
    best, _, _ = best_threshold_from_pr(
        jnp.asarray(precision), jnp.asarray(recall), jnp.asarray(thresholds)
    )
    print(f"== test_net at threshold {float(best):.2f} with segmaps")
    cfg.json_dir["test"] = os.path.join(cfg.data_dir, "data_splits", "test.json")
    results = test_net(cfg.get_test_data(), cfg, best_threshold=float(best), save_segmaps=True)

    summary = {
        "workdir": workdir,
        "best_val_loss": trainer.fit_result.best_val_loss,
        "best_val_dice": trainer.fit_result.best_val_dice,
        "best_threshold": float(best),
        "test_dice": results["dice"],
        "test_pix_acc": results["pix_acc"],
        "test_ap": results["avg_prec"],
    }
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
