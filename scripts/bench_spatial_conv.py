#!/usr/bin/env python
"""Explicit halo-exchange conv (parallel/spatial_conv.py) vs GSPMD
auto-partitioning, fwd+bwd, on the virtual 8-device CPU mesh at a real
CubeNET layer shape. Absolute CPU times are meaningless; the comparison and
the emitted-collective story are the point (SURVEY §5.7).

Usage: python scripts/bench_spatial_conv.py [--devices 8] [--steps 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--shape", type=int, nargs=4, default=(2, 608, 968, 64))
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"  # also gates the compile cache off
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P, NamedSharding

    from hyperpri_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
    from hyperpri_tpu.parallel.spatial_conv import conv3x3_spatial

    data = 2 if args.devices % 2 == 0 else 1
    mesh = make_mesh({"data": data, "spatial": args.devices // data})
    n, h, w_, c = args.shape
    o = c
    rng = np.random.default_rng(0)
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(n, h, w_, c)).astype(np.float32)),
        batch_sharding(mesh),
    )
    wk = jax.device_put(
        jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32)),
        replicated(mesh),
    )
    b = jax.device_put(jnp.zeros((o,), jnp.float32), replicated(mesh))
    K = args.steps

    def scanned(conv):
        @jax.jit
        def run(x, wk, b, key):
            def body(acc, k):
                eps = 1 + jax.random.normal(k, (), jnp.float32) * 1e-8

                def loss(wk):
                    y = conv(x * eps, wk, b)
                    return jnp.sum(y * y) * 1e-20

                l, g = jax.value_and_grad(loss)(wk)
                return acc + l + jnp.sum(g * g) * 1e-20, None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jax.random.split(key, K))
            return acc

        return run

    def gspmd_conv(x, wk, b):
        return (
            jax.lax.conv_general_dilated(
                x, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + b
        )

    def halo_conv(x, wk, b):
        return conv3x3_spatial(x, wk, b, mesh)

    results = {}
    for name, conv in [("gspmd_auto", gspmd_conv), ("explicit_halo", halo_conv)]:
        run = scanned(conv)
        float(run(x, wk, b, jax.random.key(0)))  # compile
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(x, wk, b, jax.random.key(i)))
            ts.append(time.perf_counter() - t0)
        results[name] = min(ts) / K
        print(f"{name:14s}: {results[name]*1e3:8.1f} ms/step (fwd+bwd, {mesh.shape})",
              flush=True)
    print(f"explicit/gspmd ratio: {results['explicit_halo']/results['gspmd_auto']:.2f}")


if __name__ == "__main__":
    main()
