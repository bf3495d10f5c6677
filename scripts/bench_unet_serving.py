#!/usr/bin/env python
"""UNET serving throughput under the r5 staged AUTO-layout protocol.

Same two-point dispatch protocol as bench.py's CubeNET headline (pre-staged
cube pool in compiler-chosen entry formats, K_lo/K_hi scanned dispatches,
(t_hi - t_lo)/(k_hi - k_lo)); kept separate because the driver's bench.py
contract is one JSON line for the flagship model. Refreshes BENCHMARKS.md's
UNET inference row (reference protocol: test_models.ipynb cell 11).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(k_lo=10, k_hi=30, n_runs=3):
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from hyperpri_tpu.models import UNet
    from hyperpri_tpu.utils.staging import compile_with_auto_formats, stage_in_formats

    H, W, C = 608, 968, 3
    model = UNet(n_channels=C, n_classes=1, bilinear=True, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    small = jnp.zeros((1, 64, 64, C), jnp.bfloat16)
    variables = jax.jit(lambda r, s: model.init(r, s, train=False))(rng, small)

    n_staged = 8
    xs = jax.random.normal(rng, (n_staged, H, W, C), jnp.bfloat16)

    def make(k_inner):
        @functools.partial(jax.jit, in_shardings=Format(Layout.AUTO))
        def forward_k(variables, xs, start):
            def body(carry, k):
                x = jax.lax.dynamic_index_in_dim(xs, (start + k) % n_staged, 0)
                y = model.apply(variables, x, train=False)
                return carry + jnp.sum(y[..., 0].astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(k_inner))
            return acc

        return forward_k

    start0 = jnp.zeros((), jnp.int32)
    c_hi, fmt_hi = compile_with_auto_formats(make(k_hi), variables, xs, start0)
    c_lo, _ = compile_with_auto_formats(make(k_lo), variables, xs, start0)
    variables, xs, start0 = stage_in_formats((variables, xs, start0), fmt_hi)
    float(c_lo(variables, xs, start0))
    float(c_hi(variables, xs, start0))

    def timed(c, n):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(c(variables, xs, start0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(c_lo, n_runs), timed(c_hi, n_runs)
    per = (t_hi - t_lo) / (k_hi - k_lo)
    print(json.dumps({
        "metric": "UNET RGB inference throughput (608x968x3, batch 1, bf16, TPU)",
        "value": round(1.0 / per, 2),
        "unit": "imgs/sec",
        "ms_per_img": round(per * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
