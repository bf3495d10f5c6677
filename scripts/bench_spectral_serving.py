#!/usr/bin/env python
"""SpectralUNET chunked-serving sweep: chunk size x precast-bf16 weights x
BN folding (VERDICT r3 weak #6 / next #7).

The model is pure matmuls (per-pixel MLP), yet round-3 recorded only
42.6 TF/s (3.6 cubes/s) at the default chunk=65536 — ~22% of the v5e bf16
peak. Hypotheses this sweep separates:
  - per-chunk weight casts: f32 master params are re-cast to bf16 INSIDE the
    lax.map body, i.e. once per chunk (~180 MB of reads per cube at 9
    chunks) -> precast once outside the loop;
  - BN eval affine chains -> fold into the Dense kernels (ops/fold_bn);
  - chunk too small to amortize per-chunk overheads / too large for VMEM
    reuse -> sweep 32k..full.

Protocol: batch 1, full 608x968x238 cube, K reps inside one jitted scan with
per-rep input perturbation, measured null-dispatch RTT subtracted
(reference protocol anchor: /root/reference/test_models.ipynb cell 11).

Usage: python scripts/bench_spectral_serving.py [--reps 4] [--chunks 32768,65536,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--chunks", default="32768,65536,131072,294272,full")
    p.add_argument("--feats", type=int, default=1650)
    p.add_argument("--height", type=int, default=608)
    p.add_argument("--width", type=int, default=968)
    p.add_argument("--variants", default="base,precast,fold,fold+precast")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.models import SpectralUNET
    from hyperpri_tpu.ops.chunked import apply_pixelwise_chunked
    from hyperpri_tpu.ops.fold_bn import fold_batch_norm

    H, W, D, F = args.height, args.width, 238, args.feats
    bf16 = jnp.bfloat16

    model = SpectralUNET(hsi_depth=D, n_classes=1, bn_feats=F, dtype=bf16)
    small = jnp.zeros((1, 8, 8, D), bf16)
    variables = jax.jit(lambda: model.init(jax.random.key(0), small, train=False))()
    params, stats = variables["params"], variables["batch_stats"]

    # matmul FLOPs per pixel from the Dense kernel shapes
    flops_px = sum(
        2 * int(np.prod(leaf.shape))
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if leaf.ndim == 2
    )
    flops = flops_px * H * W
    print(f"bn_feats={F}  {flops_px/1e6:.2f} MFLOP/pixel  {flops/1e12:.2f} TFLOP/cube", flush=True)

    folded_model = SpectralUNET(hsi_depth=D, n_classes=1, bn_feats=F, dtype=bf16, fused_bn=True)
    folded_params = fold_batch_norm(params, stats)

    def precast(tree):
        return jax.tree.map(lambda x: x.astype(bf16) if x.ndim >= 2 else x, tree)

    variant_defs = {
        "base": (model, {"params": params, "batch_stats": stats}),
        "precast": (model, {"params": precast(params), "batch_stats": stats}),
        "fold": (folded_model, {"params": folded_params}),
        "fold+precast": (folded_model, {"params": precast(folded_params)}),
    }

    @jax.jit
    def null(x):
        return x + 1.0

    def timeit(fn, *fargs):
        jax.block_until_ready(fn(*fargs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rtt = timeit(lambda x: null(x), jnp.zeros(()))
    print(f"rtt={rtt*1e3:.1f}ms reps={args.reps}", flush=True)

    K = args.reps
    x0 = jax.random.normal(jax.random.key(1), (1, H, W, D), jnp.float32).astype(bf16)

    for chunk_s in args.chunks.split(","):
        chunk = None if chunk_s == "full" else int(chunk_s)
        for vname in args.variants.split(","):
            mdl, vars_ = variant_defs[vname]

            @jax.jit
            def run(vars_, x, key):
                def step(acc, k):
                    eps = (jax.random.normal(k, (), jnp.float32) * 1e-8).astype(bf16)
                    xi = x * (1 + eps)
                    if chunk is None:
                        y = mdl.apply(vars_, xi, train=False)
                    else:
                        y = apply_pixelwise_chunked(mdl, vars_, xi, chunk=chunk)
                    y32 = y.astype(jnp.float32)
                    return acc + jnp.sum(y32 * y32) * 1e-20, None

                acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, K))
                return acc

            try:
                t = (timeit(run, vars_, x0, jax.random.key(2)) - rtt) / K
                print(
                    f"chunk={chunk_s:>7} {vname:13s} {t*1e3:8.1f} ms/cube "
                    f"{1/t:6.2f} cubes/s  {flops/t/1e12:6.1f} TF/s",
                    flush=True,
                )
            except Exception as e:
                print(f"chunk={chunk_s:>7} {vname:13s} FAIL {type(e).__name__}: {str(e)[:120]}",
                      flush=True)


if __name__ == "__main__":
    main()
