#!/usr/bin/env python
"""Time conv3x3 implementations (XLA, Pallas halo, Pallas packed) at the
model's hot shapes on the real chip.

Protocol: K reps inside one jitted lax.scan; inputs perturbed per step by a
data-dependent scalar so nothing hoists; result consumed via sum-of-squares;
measured null-dispatch RTT subtracted (see bench.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=16)
    p.add_argument("--impls", default="xla,pallas,packed")
    p.add_argument("--shapes", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hyperpri_tpu.ops.pallas.conv3x3 import conv3x3_bias_act

    try:
        from hyperpri_tpu.ops.pallas.conv3x3_packed import conv3x3_packed
    except ImportError:
        conv3x3_packed = None

    K = args.steps
    bf16 = jnp.bfloat16

    @jax.jit
    def null(x):
        return x + 1.0

    def timeit(fn, *fargs):
        float(fn(*fargs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rtt = timeit(null, jnp.zeros(()))
    print(f"rtt={rtt*1e3:.1f}ms K={K}", flush=True)

    impls = {}
    if "xla" in args.impls:
        impls["xla"] = lambda x, w, b: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b.astype(x.dtype)
    if "pallas" in args.impls:
        impls["pallas"] = lambda x, w, b: conv3x3_bias_act(
            x, w, b, relu=False, out_dtype=x.dtype
        )
    if "packed" in args.impls and conv3x3_packed is not None:
        impls["packed"] = lambda x, w, b: conv3x3_packed(
            x, w, b, relu=False, out_dtype=x.dtype
        )
    if "packed64" in args.impls and conv3x3_packed is not None:
        impls["packed64"] = lambda x, w, b: conv3x3_packed(
            x, w, b, relu=False, out_dtype=x.dtype, lane_stride=64
        )

    B = 2
    shapes = [
        ("first 238->64 @608x968", (B, 608, 968, 238), 64),
        ("inc2 64->64 @608x968", (B, 608, 968, 64), 64),
        ("up4a 128->64 @608x968", (B, 608, 968, 128), 64),
        ("down1 64->128 @304x484", (B, 304, 484, 64), 128),
        ("mid 128->128 @304x484", (B, 304, 484, 128), 128),
        ("deep 256->256 @152x242", (B, 152, 242, 256), 256),
        ("enc2a 256->512 @152x242", (B, 152, 242, 256), 512),
        ("enc2b 512->512 @152x242", (B, 152, 242, 512), 512),
        ("dec2 512->256 @152x242", (B, 152, 242, 512), 256),
    ]
    if args.shapes:
        keys = args.shapes.split(",")
        shapes = [s for s in shapes if any(k in s[0] for k in keys)]

    for name, xshape, o in shapes:
        n, h, w_, c = xshape
        key = jax.random.key(0)
        x = jax.random.normal(key, xshape, jnp.float32).astype(bf16)
        wgt = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, c, o), jnp.float32) * 0.05).astype(bf16)
        bias = jax.random.normal(jax.random.fold_in(key, 2), (o,), jnp.float32)
        flops = 2 * n * h * w_ * c * o * 9
        row = f"{name:26s}"
        for iname, f in impls.items():
            @jax.jit
            def run(x, wgt, bias, key, f=f):
                def step(acc, k):
                    eps = (jax.random.normal(k, (), jnp.float32) * 1e-8).astype(bf16)
                    y = f(x * (1 + eps), wgt, bias)
                    y32 = y.astype(jnp.float32)
                    return acc + jnp.sum(y32 * y32) * 1e-20, None

                acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, K))
                return acc

            try:
                t = (timeit(run, x, wgt, bias, jax.random.key(3)) - rtt) / K
                row += f"  {iname} {t*1e3:7.2f} ms {flops/t/1e12:6.1f} TF/s"
            except Exception as e:
                row += f"  {iname} FAIL {type(e).__name__}"
                print(f"\n{iname} error: {e}\n", file=sys.stderr)
        print(row, flush=True)


if __name__ == "__main__":
    main()
