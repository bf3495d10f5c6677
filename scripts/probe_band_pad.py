"""Probe: does serving a 256-band-padded cube kill the 238->256 lane pad?

The CubeNET serving profile shows ~1.9 ms/cube of input pad+copy — XLA
padding the 238-channel input to 256 MXU lanes before the first conv
(BENCHMARKS.md device profile). If the HOST pads the cube to 256 bands at
ENVI-decode time (free: the native reader already gathers band-by-band, and
the pad bands multiply zero weight rows), the on-device pad never exists.

This probe measures the whole serving graph both ways with bench.py's
two-point dispatch-cancelling protocol:
  a) 238-band input, first conv (3,3,238,64)  — status quo
  b) 256-band input, first conv (3,3,256,64)  — pad bands zero-weighted

(b) pays +7.6% first-conv FLOPs on paper, but the MXU computes 256 K lanes
either way after XLA's pad — only the pad pass itself differs. The RNG
input generation is also ~7.6% bigger in (b); the delta reported here is
therefore a LOWER bound on the production win (real serving uploads
pre-padded host buffers and generates nothing on device).
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from hyperpri_tpu.models import CubeNET  # noqa: E402

H, W = 608, 968
K_LO, K_HI, N_RUNS = 10, 30, 3


def measure(depth: int) -> float:
    model = CubeNET(hsi_depth=depth, n_classes=1, first_depth=64,
                    bilinear=False, dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    small = jnp.zeros((1, 64, 64, depth), jnp.bfloat16)
    variables = jax.jit(lambda r, s: model.init(r, s, train=False))(rng, small)

    def make(k_inner):
        @jax.jit
        def forward_k(variables, key):
            def body(carry, k):
                x = jax.random.normal(k, (1, H, W, depth), jnp.bfloat16)
                y = model.apply(variables, x, train=False)
                return carry + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, 0.0, jax.random.split(key, k_inner))
            return acc

        return forward_k

    f_lo, f_hi = make(K_LO), make(K_HI)
    float(f_lo(variables, rng))
    float(f_hi(variables, rng))

    def timed(fn, n):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            float(fn(variables, jax.random.key(i)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = timed(f_lo, N_RUNS), timed(f_hi, N_RUNS)
    return (t_hi - t_lo) / (K_HI - K_LO)


def main():
    for depth in (238, 256):
        per_cube = measure(depth)
        print(f"depth={depth}: {per_cube*1e3:.2f} ms/cube -> "
              f"{1.0/per_cube:.1f} cubes/s")


if __name__ == "__main__":
    main()
