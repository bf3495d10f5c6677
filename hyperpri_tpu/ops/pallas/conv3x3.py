"""Pallas TPU kernel: fused 3x3 stride-1 SAME conv + bias + ReLU, NHWC.

The hot op of every model in this framework (SURVEY.md §2.2: cuDNN conv
kernels are the reference's FLOP carrier). Design:

  - implicit GEMM over a (batch, H-tile, Cout-tile) grid: each step holds
    (TH+2, Wb, <=128) input halo blocks and the (3, 3, C, TO) weight block
    in VMEM and issues 9 shifted (TH*Wo, 128) x (128, TO) matmuls per
    channel chunk on the MXU, accumulating in float32 VMEM scratch;
  - the H halo comes from overlapping Element-indexed windows (stride TH,
    size TH+2) over an input pre-padded so no window is out of bounds.
    Mosaic constraints found empirically on v5e: trailing two block dims
    divisible by 8; dynamic 1-D slices cannot be alignment-proven; scoped
    VMEM is ~16 MB including pipeline double-buffering;
  - channels are passed as separate pre-split <=128-lane chunk arrays.
    A single full-width block with K=C dots also compiles, but measures
    ~15-25% slower (0.82 vs 0.72 ms at 256ch, 0.55 vs 0.44 ms at 512ch):
    the 128-wide K chunks pipeline DMA against MXU work better;
  - W is zero-padded to a multiple of 8, C to a multiple of 128 (zero
    weights for the padding lanes -> exact outputs);
  - bias add + optional ReLU fused into the epilogue.

Numerical contract: float32 accumulation regardless of input dtype,
matching XLA's conv on TPU. Validated exact vs jax.lax.conv_general_dilated
on TPU hardware and in interpret mode (tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Element block-dim: the index map yields *element* offsets for that axis,
# which is what overlapping halo windows need (stride th, window th+2).
from jax._src.pallas.core import Element  # noqa: E402  (not yet re-exported)

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conv_kernel(*refs, th: int, wo: int, relu: bool, n_chunks: int,
                 stats_hw=None, pro_hw=None):
    refs = list(refs)
    x_ref = refs.pop(0)
    w_ref = refs.pop(0)
    b_ref = refs.pop(0)
    pa_ref = refs.pop(0) if pro_hw is not None else None
    pb_ref = refs.pop(0) if pro_hw is not None else None
    o_ref = refs.pop(0)
    s_ref = refs.pop(0) if stats_hw is not None else None
    acc_ref = refs.pop(0)
    z_ref = refs.pop(0) if pro_hw is not None else None

    if pro_hw is not None:
        # BN-affine + ReLU prologue (see conv3x3_packed._kernel): the input
        # is the producing conv's RAW output; z = relu(pa*x + pb) per input
        # channel, masked back to exact zeros on the padding border.
        h, w = pro_hw
        i = pl.program_id(1)
        wb = x_ref.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wb, 1), 0) + i * th
        col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wb, 1), 1)
        valid = (row >= 1) & (row <= h) & (col >= 1) & (col <= w)
        zf = x_ref[0].astype(jnp.float32) * pa_ref[0, :] + pb_ref[0, :]
        z_ref[...] = jnp.where(valid, jnp.maximum(zf, 0.0), 0.0).astype(z_ref.dtype)

    acc_ref[...] = jnp.zeros_like(acc_ref)
    # channels processed in 128-lane chunks via static in-VMEM slices (the
    # chunked K dots measure 15-25% faster than one K=C dot; a single input
    # array avoids materializing per-chunk HBM copies of the whole tensor)
    for k in range(n_chunks):
        for dh in range(3):
            for dw in range(3):
                if z_ref is not None:
                    xs = z_ref[dh : dh + th, dw : dw + wo, k * LANE : (k + 1) * LANE]
                else:
                    xs = x_ref[0, dh : dh + th, dw : dw + wo, k * LANE : (k + 1) * LANE]
                xs2 = xs.reshape(th * wo, LANE)
                acc_ref[...] += jax.lax.dot_general(
                    xs2,
                    w_ref[dh, dw, k * LANE : (k + 1) * LANE, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
    to = o_ref.shape[-1]
    y = acc_ref[...] + b_ref[0, :].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.reshape(1, th, wo, to).astype(o_ref.dtype)

    if s_ref is not None:
        # BatchNorm batch statistics ride along while the f32 accumulator is
        # still in VMEM: per-channel sum and sum-of-squares of the (pre-relu)
        # output, excluding alignment-padding rows/cols. Saves the separate
        # full-resolution reduction pass XLA would otherwise run (measured
        # ~1.3 ms per 608x968x64 conv).
        h, w = stats_hw
        i = pl.program_id(1)
        row = jax.lax.broadcasted_iota(jnp.int32, (th, wo, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, wo, 1), 1)
        valid = jnp.logical_and(row < h - i * th, col < w)
        ym = jnp.where(valid, y.reshape(th, wo, to), 0.0)
        first = jnp.logical_and(pl.program_id(0) == 0, i == 0)

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        s_ref[0:1, :] += jnp.sum(ym, axis=(0, 1), keepdims=False).reshape(1, to)
        s_ref[1:2, :] += jnp.sum(ym * ym, axis=(0, 1), keepdims=False).reshape(1, to)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "th", "to", "out_dtype", "with_stats", "interpret"),
)
def conv3x3_bias_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    pa: Optional[jnp.ndarray] = None,
    pb: Optional[jnp.ndarray] = None,
    *,
    relu: bool = True,
    th: int = 16,
    to: Optional[int] = None,
    out_dtype=None,
    with_stats: bool = False,
    interpret: bool = False,
):
    """y = act(conv3x3_same(act_in(x), w) + b) with (N, H, W, C) x,
    (3, 3, C, O) w.

    pa/pb: optional (C,) float32 per-input-channel affine; when given the
    kernel computes act_in(x) = relu(pa*x + pb) in VMEM on the loaded halo
    window (masked to zero on the padding border) — the BatchNorm-apply +
    ReLU between two convs fused into the consumer's load. Else identity.

    with_stats (requires relu=False): additionally returns a (sum, sumsq)
    tuple of f32 (O,) per-channel reductions of y over N,H,W — the
    BatchNorm batch statistics, accumulated in the kernel epilogue (same
    structure as conv3x3_packed's, so _conv_route's return type does not
    diverge by route)."""
    n, h, width, c = x.shape
    kh, kw, wc, o = w.shape
    assert (kh, kw) == (3, 3) and wc == c, (w.shape, x.shape)
    out_dtype = out_dtype or x.dtype
    prologue = pa is not None
    th = min(th, _round_up(h, 8))

    wo = _round_up(width, 8)       # output/compute width
    wb = _round_up(wo + 2, 8)      # input block width (halo included)
    cp = _round_up(c, LANE)        # input channels: whole lane tiles
    to = _round_up(min(to or LANE, _round_up(o, 8)), 8)
    op = _round_up(o, to)          # output channels: whole number of tiles
    n_chunks = cp // LANE

    # Auto-fit the H tile to the ~16 MB scoped-VMEM budget: double-buffered
    # input block + weights + output, plus the f32 accumulator scratch.
    def vmem_bytes(th_):
        esz = x.dtype.itemsize
        x_b = 2 * (th_ + 2) * wb * cp * esz
        w_b = 2 * 9 * cp * to * w.dtype.itemsize
        o_b = 2 * th_ * wo * to * jnp.dtype(out_dtype).itemsize
        acc = th_ * wo * to * 4
        z_b = (th_ + 2) * wb * cp * esz if prologue else 0
        return x_b + w_b + o_b + acc + z_b

    while th > 4 and vmem_bytes(th) > 12 * 1024 * 1024:
        th //= 2

    n_h_blocks = pl.cdiv(h, th)
    # Pad: 1-px SAME border; bottom so halo windows (stride th, size th+2)
    # never leave the array (OOB Element reads clamp and would shift tiles);
    # right/channel to alignment. All padding is zeros -> exact outputs.
    bottom = n_h_blocks * th - h + 1
    xp = jnp.pad(x, ((0, 0), (1, bottom), (1, wb - width - 1), (0, cp - c)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, cp - c), (0, op - o)))
    # Bias as a 2-D (8, op) tile so each Cout-tile is a standard blocked
    # read (Mosaic cannot prove dynamic 1-D slices aligned).
    bp = jnp.broadcast_to(jnp.pad(b, (0, op - o)), (8, op))

    grid = (n, n_h_blocks, op // to)
    if with_stats:
        assert not relu, "stats are the BatchNorm input: pre-activation only"
    kernel = functools.partial(
        _conv_kernel,
        th=th,
        wo=wo,
        relu=relu,
        n_chunks=n_chunks,
        stats_hw=(h, width) if with_stats else None,
        pro_hw=(h, width) if prologue else None,
    )
    flops = 2 * n * h * width * c * o * 9

    x_spec = pl.BlockSpec(
        (Element(1), Element(th + 2), Element(wb), Element(cp)),
        lambda bn, i, j: (bn, i * th, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        x_spec,
        pl.BlockSpec((3, 3, cp, to), lambda bn, i, j: (0, 0, 0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, to), lambda bn, i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [xp, wp, bp]
    if prologue:
        pap = jnp.broadcast_to(jnp.pad(pa.astype(jnp.float32), (0, cp - c)), (8, cp))
        pbp = jnp.broadcast_to(jnp.pad(pb.astype(jnp.float32), (0, cp - c)), (8, cp))
        cspec = pl.BlockSpec((8, cp), lambda bn, i, j: (0, 0), memory_space=pltpu.VMEM)
        in_specs += [cspec, cspec]
        operands += [pap, pbp]
    out_specs = pl.BlockSpec(
        (1, th, wo, to), lambda bn, i, j: (bn, i, 0, j), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, n_h_blocks * th, wo, op), out_dtype)
    if with_stats:
        out_specs = (
            out_specs,
            pl.BlockSpec((8, to), lambda bn, i, j: (0, j), memory_space=pltpu.VMEM),
        )
        out_shape = (out_shape, jax.ShapeDtypeStruct((8, op), jnp.float32))
    scratch_shapes = [pltpu.VMEM((th * wo, to), jnp.float32)]
    if prologue:
        scratch_shapes.append(pltpu.VMEM((th + 2, wb, cp), x.dtype))
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2, transcendentals=0
        ),
        interpret=interpret,
    )(*operands)
    if with_stats:
        out, stats = result
        return out[:, :h, :width, :o], (stats[0, :o], stats[1, :o])
    return result[:, :h, :width, :o]
