"""Pallas TPU kernel: 2x2 max-pool backward without layout churn.

The XLA lowering of the first-max backward (ops/pool.py _bwd) builds the
(N, H2, 2, W2, 2, C) window stack with transpose/reshape pairs that
materialize T(2,128)-layout copies — measured ~2.4 ms/step of pure data
formatting at the CubeNET train step's two big pool layers (hlo_stats,
round 4). This kernel computes dx DIRECTLY at full resolution:

  - the window max is recomputed in-VMEM with parity-correct neighbor
    max/rolls (no window-stack tensor ever exists),
  - the row-major first-max tie-break (torch MaxPool2d / select-and-scatter
    scan order; pinned by tests/test_pool.py) becomes a parity-masked
    "no earlier equal element" test over rolled equality masks,
  - the incoming half-res cotangent g is upsampled in-VMEM (sublane
    interleave), multiplied by the first-max mask, and written out in the
    plain T(8,128) layout the adjoint conv wants.

Contract: H and W even (every HyperPRI pool input: 608x968, 304x484,
152x242; the odd-W 76x121 layer falls back to the XLA path), C arbitrary
(lane-tiled in the grid). Numerics identical to ops/pool.py _bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _roll(x, shift, axis):
    """Circular shift (negative = toward lower indices); wrap garbage only
    ever lands on parity positions the caller never selects (call sites)."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _kernel(x_ref, g_ref, o_ref, *, th, w):
    xb = x_ref[0].astype(jnp.float32)  # (th, w, ct)
    gb = g_ref[0].astype(jnp.float32)  # (th//2, w//2, ct)

    col = jax.lax.broadcasted_iota(jnp.int32, (th, w, 1), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (th, w, 1), 0)
    even_s = (col % 2) == 0
    even_r = (row % 2) == 0

    # Window max at every full-res position. Wrap-around of the rolls only
    # reaches (even_s at s=w-1) / (odd_s at s=0) etc., all impossible for
    # even w/th, so no wrap value is ever selected.
    x_right = _roll(xb, -1, 1)  # x[r, s+1]
    x_left = _roll(xb, 1, 1)  # x[r, s-1]
    wmax_w = jnp.where(even_s, jnp.maximum(xb, x_right), jnp.maximum(x_left, xb))
    w_down = _roll(wmax_w, -1, 0)
    w_up = _roll(wmax_w, 1, 0)
    wmax = jnp.where(even_r, jnp.maximum(wmax_w, w_down), jnp.maximum(w_up, wmax_w))

    # Row-major window order (0,0),(0,1),(1,0),(1,1): position is "first"
    # iff no earlier in-window position reaches the window max. Mosaic cannot
    # roll or select i1 vectors ("Rotate with non-32-bit data" / trunci to
    # i1), so everything stays f32: prev = max of the EARLIER in-window
    # elements (parity-selected from rolled copies of x; wrap garbage only
    # lands on parities whose select arm never reads it), and
    # first = (x >= wmax) & (prev < wmax) as nested f32 selects.
    x_up = _roll(xb, 1, 0)  # x[r-1, s]
    neg = jnp.full_like(xb, -jnp.inf)
    prev_even_r = jnp.where(even_s, neg, x_left)
    m_u_ur = jnp.maximum(x_up, _roll(x_up, -1, 1))  # x[r-1,s], x[r-1,s+1]
    m_all = jnp.maximum(jnp.maximum(_roll(x_up, 1, 1), x_up), x_left)
    prev = jnp.where(even_r, prev_even_r, jnp.where(even_s, m_u_ur, m_all))

    # Upsample g 2x in both dims (VMEM-local interleaves).
    g_w = jnp.repeat(gb, 2, axis=1)  # (th//2, w, ct)
    g_up = jnp.repeat(g_w, 2, axis=0)  # (th, w, ct)

    out = jnp.where(xb >= wmax, jnp.where(prev < wmax, g_up, 0.0), 0.0)
    o_ref[0] = out.astype(o_ref.dtype)


def max_pool_2x2_bwd_pallas(
    x: jnp.ndarray, g: jnp.ndarray, th: int = 8, interpret: bool = False
) -> jnp.ndarray:
    """dx of y = maxpool2x2(x) given cotangent g, first-max tie-breaking.

    x: (n, h, w, c) with h, w even; g: (n, h//2, w//2, c).
    """
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f"pallas pool bwd needs even H/W, got {(h, w)}")
    assert g.shape == (n, h // 2, w // 2, c), (x.shape, g.shape)
    th = min(th, h)
    while h % th or (th % 2):
        th -= 2
    th = max(th, 2)
    ct = min(c, LANE)
    if c % ct:
        raise ValueError(f"channels {c} not tileable by {ct}")

    grid = (n, h // th, c // ct)
    return pl.pallas_call(
        functools.partial(_kernel, th=th, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w, ct), lambda ni, hi, ci: (ni, hi, 0, ci)),
            pl.BlockSpec((1, th // 2, w // 2, ct), lambda ni, hi, ci: (ni, hi, 0, ci)),
        ],
        out_specs=pl.BlockSpec((1, th, w, ct), lambda ni, hi, ci: (ni, hi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), g.dtype),
        # Full-width W blocks with ~8 live f32 temps: Mosaic's scoped-vmem
        # accounting measures 49.8M at th=16 / 968-wide / 64-lane blocks,
        # past the 16M default cap (fits v5e's 128M VMEM fine).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, g)
