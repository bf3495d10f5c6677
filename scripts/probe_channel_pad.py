#!/usr/bin/env python
"""Probe: does feeding the first conv a channel-padded (256) input beat
letting XLA pad 238->256 per call?

Math is identical: 18 extra input channels are zero in both the input and
the kernel. The question is whether XLA's materialized input pad
(bf16[608,968,238] -> [*,256], ~0.27 GB/s of traffic per forward) disappears
when the input arrives pre-padded from the host pipeline.

Measures (a) the first conv alone, (b) the full CubeNET forward, both ways.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 608, 968
K = 10


def timed(fn, *args, n=3):
    fn(*args)  # compile+warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    @functools.partial(jax.jit, static_argnums=())
    def scan_conv(x, w):
        def body(c, _):
            return c, jnp.float32(jnp.sum(conv(x * (1.0 + c), w)))

        _, ys = jax.lax.scan(body, jnp.bfloat16(0), None, length=K)
        return ys.sum()

    for c in (238, 256):
        x = jnp.asarray(rng.normal(size=(1, H, W, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, c, 64)) * 0.01, jnp.bfloat16)
        if c == 256:
            x = x.at[..., 238:].set(0)
            w = w.at[:, :, 238:, :].set(0)
        t = timed(lambda a, b: float(scan_conv(a, b)), x, w)
        print(f"first conv c={c}: {t / K * 1e3:.2f} ms/call (scan of {K})")


if __name__ == "__main__":
    main()
