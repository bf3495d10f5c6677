"""Training-trajectory parity evidence run: flax/optax vs live torch.

Runs all three reference architectures at FULL channel widths (exact paper
architecture; only the spatial extent and — for the HSI models — the band
count are reduced to keep the CPU run tractable) for 50 fp32 Adam steps from
a shared init on identical batches, with the reference's exact step semantics
(/root/reference/src/PLTrainer.py:79-98, :164-183). Writes the measured
deviations to parity_train_torch.json and prints a summary table; the numbers
are recorded in BENCHMARKS.md ("training-trajectory parity").

SpectralUNET runs batch=1 so the reference's per-image BN1d statistics
(python batch loop, models.py:132) coincide with the flax batch-joint stats.

Usage: python scripts/parity_train_torch.py [--steps 50] [--out FILE]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from hyperpri_tpu.train.parity import run_trajectory_parity  # noqa: E402

RUNS = [
    # (model, kwargs) — full widths; UNET is the exact 31,043,521-param net.
    ("UNET", dict(batch=2, hw=(44, 52))),
    # CubeNET: exact 128-wide body + first_depth=64; 238->24 bands shrinks
    # only the first conv's contraction depth (none of the trainable-path
    # semantics depend on it).
    ("CubeNET", dict(batch=2, hw=(44, 52), hsi_depth=24)),
    # SpectralUNET: full bn_feats=1650 (30.4M params), batch=1 (see above).
    ("SpectralUNET", dict(batch=1, hw=(24, 28), hsi_depth=24, bn_feats=1650)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "parity_train_torch.json"))
    ap.add_argument("--models", nargs="*", default=None)
    args = ap.parse_args()

    results = []
    for name, kw in RUNS:
        if args.models and name not in args.models:
            continue
        t0 = time.time()
        print(f"== {name} ({args.steps} steps) ==")
        out = run_trajectory_parity(
            name, n_steps=args.steps, verbose=True, chaos_control=True, **kw
        )
        out["wall_s"] = round(time.time() - t0, 1)
        print(f"  wall: {out['wall_s']} s")
        results.append(out)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nwrote {os.path.abspath(args.out)}")

    print(f"\n{'model':<14} {'metric':<12} {'flax-vs-torch':>14} {'1ulp-torch-ctl':>15}")
    for r in results:
        rows = [
            ("loss_rel_max", r["loss_rel_dev_max"], r.get("control_loss_rel_dev_max")),
            ("loss_rel_fin", r["loss_rel_dev_final"], r.get("control_loss_rel_dev_final")),
            ("bn_rel_dev", r["bn_running_rel_dev_max"], r.get("control_bn_running_rel_dev_max")),
            ("sweepP_dev", r["sweep_precision_dev_max"], r.get("control_sweep_precision_dev_max")),
            ("sweepR_dev", r["sweep_recall_dev_max"], r.get("control_sweep_recall_dev_max")),
            ("logit_dev", r["eval_logit_dev_max"], r.get("control_eval_logit_dev_max")),
        ]
        for name_, ours, ctl in rows:
            ctl_s = f"{ctl:>15.2e}" if ctl is not None else f"{'—':>15}"
            print(f"{r['model']:<14} {name_:<12} {ours:>14.2e} {ctl_s}")
        print(f"{r['model']:<14} {'best_thr':<12} {r['best_threshold_flax']:>14.2f} "
              f"{r['best_threshold_torch']:>15.2f}")


if __name__ == "__main__":
    main()
