"""Pallas conv3x3 variant: H-shift decomposition (no halo windows).

Same fused 3x3 SAME conv + bias + ReLU contract as conv3x3.py, but instead
of overlapping Element-indexed halo blocks, the three H-taps come from three
H-shifted views of the padded input, each a *standard* non-overlapping
BlockSpec stream (which Mosaic pipelines with double-buffered DMA). W-taps
remain static in-block slices. Costs ~3x input HBM traffic; wins when the
halo path's synchronous window copies dominate (large widths).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(*refs, th: int, wo: int, relu: bool, n_chunks: int):
    x_refs = refs[: 3 * n_chunks]
    w_ref, b_ref, o_ref, acc_ref = refs[3 * n_chunks : 3 * n_chunks + 4]

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dh in range(3):
        for k in range(n_chunks):
            x_ref = x_refs[dh * n_chunks + k]
            for dw in range(3):
                xs = x_ref[0, :, dw : dw + wo, :]
                xs2 = xs.reshape(th * wo, xs.shape[-1])
                acc_ref[...] += jax.lax.dot_general(
                    xs2,
                    w_ref[dh, dw, k * LANE : k * LANE + xs.shape[-1], :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    to = o_ref.shape[-1]
    y = acc_ref[...] + b_ref[0, :].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.reshape(1, th, wo, to).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "th", "to", "out_dtype", "interpret"))
def conv3x3_bias_act_shift(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    relu: bool = True,
    th: int = 16,
    to: Optional[int] = None,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    n, h, width, c = x.shape
    kh, kw, wc, o = w.shape
    assert (kh, kw) == (3, 3) and wc == c
    out_dtype = out_dtype or x.dtype
    th = min(th, _round_up(h, 8))

    wo = _round_up(width, 8)
    wb = _round_up(wo + 2, 8)
    cp = _round_up(c, LANE)
    to = _round_up(min(to or LANE, _round_up(o, 8)), 8)
    op = _round_up(o, to)
    n_chunks = cp // LANE

    def vmem_bytes(th_):
        esz = x.dtype.itemsize
        x_b = 2 * 3 * n_chunks * th_ * wb * LANE * esz
        w_b = 2 * 9 * cp * to * w.dtype.itemsize
        o_b = 2 * th_ * wo * to * jnp.dtype(out_dtype).itemsize
        acc = th_ * wo * to * 4
        return x_b + w_b + o_b + acc

    while th > 4 and vmem_bytes(th) > 12 * 1024 * 1024:
        th //= 2

    n_h_blocks = pl.cdiv(h, th)
    hp = n_h_blocks * th
    xp = jnp.pad(x, ((0, 0), (1, hp - h + 1), (1, wb - width - 1), (0, cp - c)))
    shifts = []
    for dh in range(3):
        for k in range(n_chunks):
            shifts.append(xp[:, dh : dh + hp, :, k * LANE : (k + 1) * LANE])
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, op - o)))
    # Bias as a 2-D (8, op) tile so each Cout-tile is a standard blocked
    # read (Mosaic cannot prove dynamic 1-D slices aligned).
    bp = jnp.broadcast_to(jnp.pad(b, (0, op - o)), (8, op))

    grid = (n, n_h_blocks, op // to)
    kernel = functools.partial(_kernel, th=th, wo=wo, relu=relu, n_chunks=n_chunks)

    x_spec = pl.BlockSpec((1, th, wb, LANE), lambda bn, i, j: (bn, i, 0, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec] * (3 * n_chunks)
        + [
            pl.BlockSpec((3, 3, cp, to), lambda bn, i, j: (0, 0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, to), lambda bn, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, wo, to), lambda bn, i, j: (bn, i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, hp, wo, op), out_dtype),
        scratch_shapes=[pltpu.VMEM((th * wo, to), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * width * c * o * 9,
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*shifts, wp, bp)
    return out[:, :h, :width, :o]
