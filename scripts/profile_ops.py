#!/usr/bin/env python
"""Op-level fwd/bwd micro-benchmarks at CubeNET's real training shapes.

Ranks the individual operators inside the 167 ms train step (VERDICT r1
item 3) so the optimization effort lands where the time is. Each op is timed
as (a) forward and (b) forward+backward via jax.vjp, K reps inside one jitted
lax.scan with an accumulated scalar so nothing is dead code.

Usage: python scripts/profile_ops.py [--steps 8] [--ops op1,op2,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--ops", default=None, help="comma-separated subset")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    K = args.steps
    bf16 = jnp.bfloat16

    @jax.jit
    def null(x):
        return x + 1.0

    def timeit(fn, *fargs):
        # fetch the scalar: block_until_ready is not a reliable barrier on
        # the tunneled dev platform (see bench.py)
        float(fn(*fargs))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*fargs))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rtt = timeit(null, jnp.zeros(()))

    def bench(name, f, arg_shapes, param_shapes=(), dtypes=None):
        """f(args..., params...) -> array. Times fwd and fwd+bwd (wrt all)."""
        key = jax.random.key(0)
        dtypes = dtypes or [bf16] * (len(arg_shapes) + len(param_shapes))
        vals = [
            jax.random.normal(jax.random.fold_in(key, i), s, jnp.float32).astype(dt)
            for i, (s, dt) in enumerate(zip(list(arg_shapes) + list(param_shapes), dtypes))
        ]

        # sum of squares: a plain sum(conv(x,w)) gets algebraically rewritten
        # by XLA into conv-of-sums (measured: 1024-ch conv "ran" in 0.07 ms),
        # and it also makes the backward cotangent realistic (2y, not ones)
        def scalar_of(x):
            x = x.astype(jnp.float32)
            return jnp.sum(x * x) * 1e-20

        def perturb(vals, k):
            # real data dependence on the step key so the scan body cannot be
            # hoisted as loop-invariant; one broadcasted multiply per input
            eps = jax.random.normal(k, (), jnp.float32) * 1e-8
            return [v * (1 + eps).astype(v.dtype) for v in vals]

        @jax.jit
        def run_pass(vals, key):
            def step(acc, k):
                noisy = perturb(vals, k)
                return acc + sum(scalar_of(v) for v in noisy), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, K))
            return acc

        @jax.jit
        def run_fwd(vals, key):
            def step(acc, k):
                noisy = perturb(vals, k)
                return acc + scalar_of(f(*noisy)), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, K))
            return acc

        @jax.jit
        def run_bwd(vals, key):
            def step(acc, k):
                noisy = perturb(vals, k)
                def lf(*vs):
                    return scalar_of(f(*vs)) * 1e20
                g = jax.grad(lf, argnums=tuple(range(len(noisy))))(*noisy)
                return acc + sum(scalar_of(x) for x in jax.tree.leaves(g)), None
            acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, K))
            return acc

        t0 = (timeit(run_pass, vals, jax.random.key(1)) - rtt) / K * 1e3
        tf_ = (timeit(run_fwd, vals, jax.random.key(1)) - rtt) / K * 1e3 - t0
        tb = (timeit(run_bwd, vals, jax.random.key(2)) - rtt) / K * 1e3 - t0
        print(f"{name:34s} fwd {tf_:8.2f} ms   fwd+bwd {tb:8.2f} ms   bwd-only {tb - tf_:8.2f} ms   (perturb+reduce {t0:.2f})", flush=True)

    # match the model's lowering exactly: flax nn.Conv(dtype=bf16) runs the
    # conv with both operands bf16 and NO preferred_element_type (whose VJP
    # rejects mixed-dtype cotangents anyway)
    conv = lambda o: lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def convT(x, w):
        # flax ConvTranspose k2s2 equivalent
        return jax.lax.conv_transpose(
            x, w, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def convT_matmul(x, w):
        # same op as a (flipped-kernel) matmul + depth-to-space
        n, h, wd, c = x.shape
        o = w.shape[-1]
        km = jnp.transpose(w[::-1, ::-1], (2, 0, 1, 3)).reshape(c, 4 * o)
        y = jax.lax.dot_general(
            x.reshape(n * h * wd, c), km,
            dimension_numbers=(((1,), (0,)), ((), ())))
        return (
            y.reshape(n, h, wd, 2, 2, o)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, 2 * h, 2 * wd, o)
        )

    def pool(x):
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    def pool_reshape(x):
        n, h, w, c = x.shape
        x = x[:, : h // 2 * 2, : w // 2 * 2, :]
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return jnp.max(x, axis=(2, 4))

    def bn_train(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jnp.maximum(y, 0.0).astype(bf16)

    def bn_train_bf16(x, scale, bias):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
        a = (jax.lax.rsqrt(var + 1e-5) * scale).astype(bf16)
        b = (bias - mean * jax.lax.rsqrt(var + 1e-5) * scale).astype(bf16)
        return jnp.maximum(x * a + b, 0.0)

    B = 2
    cases = {
        # name: (fn, activation shapes, param shapes, dtypes)
        "first_conv 238->64 @608x968": (conv(64), [(B, 608, 968, 238)], [(3, 3, 238, 64)], None),
        "inc2 64->64 @608x968": (conv(64), [(B, 608, 968, 64)], [(3, 3, 64, 64)], None),
        "down1conv 64->128 @304x484": (conv(128), [(B, 304, 484, 64)], [(3, 3, 64, 128)], None),
        "conv 128->128 @304x484": (conv(128), [(B, 304, 484, 128)], [(3, 3, 128, 128)], None),
        "conv 256->256 @152x242": (conv(256), [(B, 152, 242, 256)], [(3, 3, 256, 256)], None),
        "conv 512->512 @76x121": (conv(512), [(B, 76, 121, 512)], [(3, 3, 512, 512)], None),
        "conv 1024->1024 @38x60": (conv(1024), [(B, 38, 60, 1024)], [(3, 3, 1024, 1024)], None),
        "up4conv 128->64 @608x968": (conv(64), [(B, 608, 968, 128)], [(3, 3, 128, 64)], None),
        "convT 1024->512 @38x60": (convT, [(B, 38, 60, 1024)], [(2, 2, 1024, 512)], None),
        "convT 128->64 @304x484": (convT, [(B, 304, 484, 128)], [(2, 2, 128, 64)], None),
        "convTmm 1024->512 @38x60": (convT_matmul, [(B, 38, 60, 1024)], [(2, 2, 1024, 512)], None),
        "convTmm 128->64 @304x484": (convT_matmul, [(B, 304, 484, 128)], [(2, 2, 128, 64)], None),
        "maxpool @608x968x64": (pool, [(B, 608, 968, 64)], [], None),
        "maxpool_reshape @608x968x64": (pool_reshape, [(B, 608, 968, 64)], [], None),
        "maxpool @304x484x128": (pool, [(B, 304, 484, 128)], [], None),
        "maxpool_reshape @304x484x128": (pool_reshape, [(B, 304, 484, 128)], [], None),
        "bn_relu f32 @608x968x64": (bn_train, [(B, 608, 968, 64)],
                                    [(64,), (64,)], [bf16, jnp.float32, jnp.float32]),
        "bn_relu bf16 @608x968x64": (bn_train_bf16, [(B, 608, 968, 64)],
                                     [(64,), (64,)], [bf16, jnp.float32, jnp.float32]),
        "bn_relu f32 @304x484x128": (bn_train, [(B, 304, 484, 128)],
                                     [(128,), (128,)], [bf16, jnp.float32, jnp.float32]),
    }
    subset = args.ops.split(",") if args.ops else None
    print(f"rtt={rtt*1e3:.1f}ms  K={K}")
    for name, (f, a, pp, dt) in cases.items():
        if subset and not any(s in name for s in subset):
            continue
        try:
            bench(name, f, a, pp, dt)
        except Exception as e:  # keep going past any single-op failure
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
