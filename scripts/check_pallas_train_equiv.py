#!/usr/bin/env python
"""TPU-side numerical check: the pallas_train conv path vs the XLA path on a
real forward+backward — judged against the model's own chaos floor.

The Pallas kernels are f32-ULP-equal to XLA per layer (fwd bit-level, dX
2e-7, dW 2e-6 measured on TPU at model shapes), but at random init the
23-layer BN+ReLU stack amplifies last-bit differences into percent-level
gradient changes. So three runs are compared:

  A = XLA;  A' = XLA with a 1-ULP input perturbation (the chaos baseline);
  B = Pallas.

The gate: worst per-layer grad deviation of B-vs-A must be within a small
multiple of A'-vs-A. Conv biases feeding BatchNorm are skipped (their true
gradient is exactly zero — BN cancels constant shifts — so both paths
report pure accumulation noise there).

Usage: python scripts/check_pallas_train_equiv.py [--height 608 --width 968]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=968)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--chaos-mult", type=float, default=4.0,
                   help="allowed multiple of the 1-ULP chaos baseline")
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.train.trainer import create_train_state, masked_bce

    runs = {}
    losses = {}
    for name, (pallas, scale) in {
        "xla": (False, 1.0),
        "xla_ulp": (False, 1.0 + 2 ** -22),
        "pallas": (True, 1.0),
    }.items():
        cfg = ExpHyperspectralPRI(calling_path=".")
        cfg.model_name = "CubeNET"
        cfg.precision = args.precision
        cfg.pallas_train = pallas
        model = cfg.get_network()
        state = create_train_state(
            cfg, model, np.zeros((1, 64, 64, cfg.channels), np.float32), seed=0
        )

        @jax.jit
        def run(state, key, scale):
            image = scale * jax.random.normal(
                key, (args.batch, args.height, args.width, cfg.channels), jnp.float32
            )
            mask = (jax.random.uniform(key, image.shape[:3] + (1,)) < 0.3).astype(
                jnp.float32
            )
            valid = jnp.ones((args.batch,))

            def loss_fn(params):
                logits, _ = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    image, train=True, mutable=["batch_stats"],
                )
                return masked_bce(logits, mask, valid)

            return jax.value_and_grad(loss_fn)(state.params)

        loss, g = run(state, jax.random.key(7), jnp.float32(scale))
        losses[name] = float(loss)
        runs[name] = {
            jax.tree_util.keystr(k): np.asarray(v, np.float32)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
        }
        print(f"{name}: loss={losses[name]:.6f}", flush=True)

    def worst_rel(a, b, floor):
        worst, worst_k = 0.0, None
        for k in b:
            if float(np.max(np.abs(b[k]))) < floor:
                continue
            r = float(np.max(np.abs(a[k] - b[k])) / (np.max(np.abs(b[k])) + 1e-12))
            if r > worst:
                worst, worst_k = r, k
        return worst, worst_k

    gmax = max(float(np.max(np.abs(v))) for v in runs["xla"].values())
    floor = 1e-4 * gmax
    chaos, chaos_k = worst_rel(runs["xla_ulp"], runs["xla"], floor)
    ours, ours_k = worst_rel(runs["pallas"], runs["xla"], floor)
    loss_rel = abs(losses["pallas"] - losses["xla"]) / max(abs(losses["xla"]), 1e-9)
    loss_chaos = abs(losses["xla_ulp"] - losses["xla"]) / max(abs(losses["xla"]), 1e-9)
    print(f"loss rel: pallas {loss_rel:.2e}  vs 1-ULP chaos {loss_chaos:.2e}")
    print(f"worst grad rel: pallas {ours:.3e} at {ours_k}")
    print(f"                chaos  {chaos:.3e} at {chaos_k}")
    ok = ours <= max(args.chaos_mult * chaos, 1e-5) and loss_rel <= max(
        args.chaos_mult * loss_chaos, 1e-6
    )
    print("EQUIV OK (within chaos floor)" if ok else "EQUIV MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
