#!/usr/bin/env python
"""Time the maxpool-2x2 backward: XLA window-stack vs Pallas parity kernel.

The XLA first-max bwd (ops/pool.py) materializes T(2,128) window stacks
(~2.4 ms/step of copies at CubeNET's two big pool layers); the Pallas kernel
(ops/pallas/pool_bwd.py) computes dx in one pass. Isolated per-layer timing
at the model's pool shapes, plus exactness vs the XLA path on-chip.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--th", type=int, default=16)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpri_tpu.ops.pallas.pool_bwd import max_pool_2x2_bwd_pallas
    from hyperpri_tpu.ops.pool import _bwd

    K = args.reps

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

    rtt = timeit(null, jnp.zeros(()))
    print(f"rtt={rtt*1e3:.1f}ms K={K}")

    shapes = [(2, 608, 968, 64), (2, 304, 484, 128), (2, 152, 242, 256)]
    for shape in shapes:
        n, h, w, c = shape
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32).astype(jnp.bfloat16)
        g = jax.random.normal(jax.random.key(1), (n, h // 2, w // 2, c), jnp.float32).astype(jnp.bfloat16)

        # exactness on chip
        ref = _bwd(x, g)[0]
        out = max_pool_2x2_bwd_pallas(x, g, th=args.th)
        dev = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))

        row = f"{str(shape):24s} dev={dev:.1e}"
        for name, f in [("xla", lambda x, g: _bwd(x, g)[0]),
                        ("pallas", lambda x, g: max_pool_2x2_bwd_pallas(x, g, th=args.th))]:
            @jax.jit
            def run(x, g, key, f=f):
                def step(acc, k):
                    eps = (jax.random.normal(k, (), jnp.float32) * 1e-8).astype(x.dtype)
                    y = f(x * (1 + eps), g)
                    return acc + jnp.sum(y.astype(jnp.float32) ** 2) * 1e-20, None

                acc, _ = jax.lax.scan(step, jnp.zeros(()), jax.random.split(key, K))
                return acc

            t = (timeit(run, x, g, jax.random.key(2)) - rtt) / K
            row += f"  {name} {t*1e3:6.2f} ms"
        print(row, flush=True)


if __name__ == "__main__":
    main()
