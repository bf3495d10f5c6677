#!/usr/bin/env python
"""Probe: deeper dh-fold for the c=64 packed convs (TODO.md open lever).

The tap-packed kernel (ops/pallas/conv3x3_packed.py) at c=64 pads the dot's
K axis to cp=128 with zeros — half the MXU K lanes idle on the inc2/decoder
64->64 convs, which the r5 train trace shows running at 45-80 TF/s. The
candidate fix packs TWO dh taps into the K axis instead of zeros:

  current: for dh in 0..2:  P[dh] = X[dh:dh+th] (M,128:top half zero) @ W[dh] (128,192)
  folded:  P01 = [X[0:th] | X[1:th+1]] (M,128: both halves real) @ W01 (128,192)
           P2  = X[2:2+th] (M,128: top half zero) @ W2  (128,192)

-> 2 MXU dot passes instead of 3 (33% fewer), at the cost of one extra
lane-concat VPU copy per tile to build the fused operand.

This probe times BOTH patterns as minimal Pallas kernels over a realistic
(n=2, 608-row, 64-lane, th=8, twb=72) tile stream so the decision is made on
hardware, not on a FLOP model. The shifted-add epilogue and halo DMA are
identical between the two and included, so the delta isolates the dot/concat
trade.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax._src.pallas.core import Element  # same import the production kernel uses

TH, TW = 8, 64
TWB = TW + 8
LS = 64  # lane stride / output channels


def _current_kernel(x_ref, w_ref, o_ref, p_ref, acc_ref):
    # x: (1, th+2, twb, 128) — c=64 in the lower lanes, upper 64 are zeros
    for dh in range(3):
        x2 = x_ref[0, dh : dh + TH, 0:TWB, :].reshape(TH * TWB, 128)
        p_ref[...] = jax.lax.dot_general(
            x2, w_ref[dh], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(TH, TWB, 3 * LS)
        s = (
            p_ref[0:TH, 0:TW, 0:LS]
            + p_ref[0:TH, 1 : 1 + TW, LS : 2 * LS]
            + p_ref[0:TH, 2 : 2 + TW, 2 * LS : 3 * LS]
        )
        acc_ref[...] = s if dh == 0 else acc_ref[...] + s
    o_ref[...] = acc_ref[...][None].astype(o_ref.dtype)


def _folded_kernel(x_ref, w01_ref, w2_ref, o_ref, p_ref, acc_ref, cat_ref):
    # x: (th+2, twb, 64) — REAL 64 lanes only (no zero padding stored).
    # Build the fused operand: lanes [x[dh=0] | x[dh=1]] per window row.
    cat_ref[:, :, 0:64] = x_ref[0, 0:TH, 0:TWB, :]
    cat_ref[:, :, 64:128] = x_ref[0, 1 : 1 + TH, 0:TWB, :]
    p_ref[...] = jax.lax.dot_general(
        cat_ref[...].reshape(TH * TWB, 128), w01_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TH, TWB, 3 * LS)
    s = (
        p_ref[0:TH, 0:TW, 0:LS]
        + p_ref[0:TH, 1 : 1 + TW, LS : 2 * LS]
        + p_ref[0:TH, 2 : 2 + TW, 2 * LS : 3 * LS]
    )
    acc_ref[...] = s
    # tap dh=2: half-filled K (zeros live in w2's upper K rows instead of x)
    cat_ref[:, :, 0:64] = x_ref[0, 2 : 2 + TH, 0:TWB, :]
    cat_ref[:, :, 64:128] = jnp.zeros((TH, TWB, 64), cat_ref.dtype)
    p_ref[...] = jax.lax.dot_general(
        cat_ref[...].reshape(TH * TWB, 128), w2_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(TH, TWB, 3 * LS)
    acc_ref[...] += (
        p_ref[0:TH, 0:TW, 0:LS]
        + p_ref[0:TH, 1 : 1 + TW, LS : 2 * LS]
        + p_ref[0:TH, 2 : 2 + TW, 2 * LS : 3 * LS]
    )
    o_ref[...] = acc_ref[...][None].astype(o_ref.dtype)


def build(n=2, h=608, w=968):
    n_h, n_w = h // TH, -(-w // TW)
    hp, wp = n_h * TH + 2, n_w * TW + 8
    key = jax.random.key(0)
    x128 = jax.random.normal(key, (n, hp, wp, 128), jnp.bfloat16)
    x128 = x128.at[..., 64:].set(0)  # current kernel: zero upper lanes
    x64 = x128[..., :64]
    wp3 = jax.random.normal(key, (3, 128, 3 * LS), jnp.bfloat16)
    wp3 = wp3.at[:, 64:, :].set(0)
    # folded weights: W01[k] = W[0][k] for k<64 (tap dh=0), W[1][k-64] above
    w01 = jnp.concatenate([wp3[0, :64], wp3[1, :64]], axis=0)[None]
    w2 = jnp.concatenate([wp3[2, :64], jnp.zeros((64, 3 * LS), jnp.bfloat16)], axis=0)[None]

    grid = (n, n_h, n_w)

    def xspec(lanes):
        # overlapping halo windows, same Element geometry as the real kernel
        return pl.BlockSpec(
            (Element(1), Element(TH + 2), Element(TWB), Element(lanes)),
            lambda bn, i, j: (bn, i * TH, j * TW, 0),
            memory_space=pltpu.VMEM,
        )

    cur = pl.pallas_call(
        _current_kernel, grid=grid,
        in_specs=[
            xspec(128),
            pl.BlockSpec((3, 128, 3 * LS), lambda bn, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, TW, LS), lambda bn, i, j: (bn, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n_h * TH, n_w * TW, LS), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TH, TWB, 3 * LS), jnp.float32),
                        pltpu.VMEM((TH, TW, LS), jnp.float32)],
    )
    wspec = pl.BlockSpec((1, 128, 3 * LS), lambda bn, i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    fold = pl.pallas_call(
        _folded_kernel, grid=grid,
        in_specs=[xspec(64), wspec, wspec],
        out_specs=pl.BlockSpec((1, TH, TW, LS), lambda bn, i, j: (bn, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, n_h * TH, n_w * TW, LS), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((TH, TWB, 3 * LS), jnp.float32),
                        pltpu.VMEM((TH, TW, LS), jnp.float32),
                        pltpu.VMEM((TH, TWB, 128), jnp.bfloat16)],
    )
    return (cur, (x128, wp3)), (fold, (x64, w01, w2))


def timeit(f, args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    (cur, a_cur), (fold, a_fold) = build()
    ja, jb = jax.jit(cur), jax.jit(fold)
    # numeric check: both compute the same accumulation
    ya, yb = ja(*a_cur), jb(*a_fold)
    import numpy as np

    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))))
    ta, tb = timeit(ja, a_cur), timeit(jb, a_fold)
    print(f"max |cur - folded| = {err:.3e}")
    print(f"current (3 half-K dots): {ta*1e3:.3f} ms")
    print(f"folded  (2 dots):        {tb*1e3:.3f} ms  ({(ta-tb)/ta*100:+.1f}%)")


if __name__ == "__main__":
    main()
