"""Probe: MXU dot throughput vs (M, K, N) on the real chip.

Question: why do full-res shallow-channel convs (238->64, 128->64 at
608x968) sit at ~18 TF/s in BOTH XLA and the Pallas kernel while deep
tiles (512ch) reach 99 TF/s?  Hypotheses: (a) N=64 wastes half the MXU
lanes, (b) small K x N per-dot work is issue-latency bound in M, (c) HBM.
This times pure VMEM-resident dot_generals through a scanned jit so the
answer is about the MXU, not memory.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

K_INNER = 2000


def time_dot(m, k, n, dtype=jnp.bfloat16, iters=K_INNER):
    a = jax.random.normal(jax.random.key(0), (m, k), dtype)
    b = jax.random.normal(jax.random.key(1), (k, n), dtype)

    @jax.jit
    def run(a, b):
        def body(c, _):
            # vary a cheaply so the dot cannot be hoisted; read the result at
            # a data-dependent index so DCE cannot slice the dot to one row
            a2 = a + c
            y = jax.lax.dot_general(
                a2, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            i = jnp.clip((c * 1e6).astype(jnp.int32), 0, y.shape[0] - 1)
            j = jnp.clip((c * 1e5).astype(jnp.int32), 0, y.shape[1] - 1)
            v = jax.lax.dynamic_index_in_dim(
                jax.lax.dynamic_index_in_dim(y, i, 0, keepdims=False), j, 0, keepdims=False
            )
            return c + (v * 1e-20).astype(dtype), None

        c, _ = jax.lax.scan(body, jnp.zeros((), dtype), None, length=iters)
        return c

    float(run(a, b))  # compile
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(a, b))
        best = min(best, time.perf_counter() - t0)
    per = (best - RTT) / iters
    tf = 2 * m * k * n / per / 1e12
    return per * 1e3, tf


def measure_rtt(n=20):
    null = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    float(null(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(null(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


RTT = 0.0


def main():
    global RTT
    print(f"backend={jax.default_backend()} dev={jax.devices()}", file=sys.stderr)
    RTT = measure_rtt()
    print(f"RTT {RTT*1e3:.2f} ms", flush=True)
    M = 7808  # th=8 x wo=976, the conv kernel's row count per dot
    shapes = [
        (M, 128, 64),
        (M, 128, 128),
        (M, 256, 64),
        (M, 256, 128),
        (M, 256, 576),
        (M, 512, 64),
        (M, 512, 512),
        (M, 1024, 64),
        (M, 2048, 64),
    ]
    for m, k, n in shapes:
        try:
            ms1, tf1 = time_dot(m, k, n, iters=2000)
            ms2, tf2 = time_dot(m, k, n, iters=8000)
            print(f"M={m:7d} K={k:5d} N={n:4d}  {ms1*1e3:8.2f}/{ms2*1e3:8.2f} us  {tf1:7.1f}/{tf2:7.1f} TF/s", flush=True)
        except Exception as e:
            print(f"M={m} K={k} N={n}  FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
