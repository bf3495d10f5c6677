"""Trainable fused Pallas 3x3 conv: forward kernel + custom VJP.

Forward: conv3x3_bias_act (ops/pallas/conv3x3.py) with relu off — the model's
Conv->BN->ReLU keeps BN/ReLU in XLA (cheap, fusible elementwise) and routes
only the convolution itself through Pallas.

Backward:
  dX = conv3x3_same(g, W') with W'[dh,dw,o,c] = W[2-dh, 2-dw, c, o]
       (the adjoint of a stride-1 SAME conv is a SAME conv with the
        spatially-flipped, channel-transposed kernel) — the *same* forward
       kernel, so dX inherits its VMEM halo pipeline;
  dW = conv3x3_wgrad (ops/pallas/conv3x3_grad.py);
  db = sum(g) over N,H,W (left to XLA: one fusible reduction).

Gradient dtypes match the XLA path: operands are the model's compute dtype
(bf16 in training), accumulation f32, cotangents returned in operand dtype.

Why this exists: the hlo_stats trace of the 167 ms CubeNET train step shows
84 ms of HBM-bound "loop fusion" + 25 ms of layout copies, nearly all of it
XLA's spatial blocking of the full-resolution (608x968, 64-238 channel)
convolutions — the machinery this kernel family keeps in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hyperpri_tpu.ops.pallas.conv3x3 import conv3x3_bias_act
from hyperpri_tpu.ops.pallas.conv3x3_grad import conv3x3_wgrad
from hyperpri_tpu.ops.pallas.conv3x3_packed import (
    arena_g_extent,
    conv3x3_packed,
    padded_width,
)

# Tap-packing stride for the packed kernel (see conv3x3_packed.py): 64
# halves the P scratch/N-passes for the O<=64 layers; measured faster than
# 128 on v5e and numerically validated on hardware.
_PACKED_LS = 64

# Max boundary channels routed to the packed epilogue-backward kernel in
# _bnact_bwd. The r5 cap-lift experiment (64 -> 128, full-lane tap stride)
# was BUILT, hardware-validated (dx within 1 bf16 ulp, dpa/dpb ~1e-6 rel vs
# the XLA oracle at the 304x484/152x242 boundary shapes) and measured a
# NON-WIN: same-session A/B 88.17 -> 90.39 ms CubeNET / 88.0 -> 89.35 UNET —
# at ls=128 the packed kernel's own g_eff pad plus doubled P-scratch passes
# cost more than the halo route's input lane pad. Default stays 64; the
# env knob keeps the route measurable on future hardware.
import os as _os  # noqa: E402

_BNACT_PACKED_MAX_BC = int(_os.environ.get("HYPERPRI_BNACT_PACKED_MAX_BC", "64"))


def _conv_route(x, w, b, pa=None, pb=None, *, relu, with_stats=False,
                interpret=False, logical_hw=None, arena_in=False,
                arena_out=False, pre_padded=False):
    """One 3x3 SAME conv, routed to the best measured kernel for its output
    width (scripts/bench_conv_kernels.py on v5e): O <= 64 -> tap-packed
    fat-N dots (conv3x3_packed, lane stride 64; 238->64 7.2 vs 9.2 ms halo,
    128->64 3.9 vs 4.5); wider -> the halo kernel's Cout-tiled shifted dots
    (conv3x3_bias_act; at O=128 mid-res shapes it beats packed 0.72 vs
    0.80 ms). pa/pb: optional per-input-channel BN-affine+ReLU prologue.
    Arena flags (conv3x3_packed docstring) require the packed route."""
    o = w.shape[-1]
    if o <= _PACKED_LS:
        return conv3x3_packed(
            x, w, b, pa, pb, relu=relu, out_dtype=x.dtype, lane_stride=_PACKED_LS,
            with_stats=with_stats, interpret=interpret,
            logical_hw=logical_hw, arena_in=arena_in, arena_out=arena_out,
            pre_padded=pre_padded,
        )
    if arena_in or arena_out or pre_padded:
        raise ValueError("arena/pre-padded geometry is packed-route only")
    return conv3x3_bias_act(
        x, w, b, pa, pb, relu=relu, out_dtype=x.dtype, with_stats=with_stats,
        interpret=interpret,
    )


def _wgrad(x, g, o, interpret, pa=None, pb=None, arena_in=False,
           arena_g=False, logical_hw=None):
    """dW with the input pad geometry matched to the packed forward's (so
    XLA CSEs the two full-res pads) whenever the forward took the packed
    route; with an arena-framed x there is no pad at all. arena_g: g is the
    materialized zero-framed arena g_eff (read raw at +8 offsets)."""
    if arena_in:
        return conv3x3_wgrad(x, g, pa, pb, arena_in=True, arena_g=arena_g,
                             logical_hw=logical_hw, interpret=interpret)
    pad_w = None
    if o <= _PACKED_LS:
        pad_w = padded_width(
            x.shape[2], x.shape[1], x.shape[3], o, x.dtype, x.dtype,
            lane_stride=_PACKED_LS, prologue=pa is not None,
        )
    return conv3x3_wgrad(x, g, pa, pb, pad_w_to=pad_w, arena_g=arena_g,
                         logical_hw=logical_hw, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_bias_train(x, w, b, interpret=False, pre_padded_hw=None):
    """y = conv3x3_same(x, w) + b, differentiable, Pallas on TPU.

    x: (N, H, W, C); w: (3, 3, C, O); b: (O,) float32.

    pre_padded_hw: logical (h, w) when x arrives HOST-pre-padded (the ingest
    conv under data-parallel meshes, parallel/spatial_conv.py — the per-shard
    geometry equals the single-chip one since each data shard holds full
    (H, W)); fwd and wgrad read the buffer raw, dx is zeros in x's padded
    aval (the ingest buffer is leaf data; XLA DCEs the zeros).
    """
    return _conv_route(x, w, b, relu=False, interpret=interpret,
                       logical_hw=pre_padded_hw,
                       pre_padded=pre_padded_hw is not None)


def _fwd(x, w, b, interpret, pre_padded_hw=None):
    y = _conv_route(x, w, b, relu=False, interpret=interpret,
                    logical_hw=pre_padded_hw,
                    pre_padded=pre_padded_hw is not None)
    return y, (x, w)


def _bwd(interpret, pre_padded_hw, res, g):
    x, w = res
    g = g.astype(x.dtype)
    # adjoint kernel: spatial flip + (C, O) transpose
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    zero_bias = jnp.zeros((w.shape[2],), jnp.float32)
    if pre_padded_hw is not None:
        dw = conv3x3_wgrad(x, g, pre_padded_c=w.shape[2],
                           interpret=interpret).astype(w.dtype)
        db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
        return jnp.zeros_like(x), dw, db
    dx = _conv_route(g, wt, zero_bias, relu=False, interpret=interpret)
    dw = _wgrad(x, g, w.shape[-1], interpret).astype(w.dtype)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv3x3_bias_train.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def conv3x3_bias_stats_train(x, w, b, interpret=False, arena_out=False,
                             pre_padded_hw=None):
    """Like conv3x3_bias_train but also returns the BatchNorm batch
    statistics of y, computed in the kernel epilogue while the f32
    accumulator is in VMEM: (y, sum_c, sumsq_c) with the (O,) f32 per-channel
    sum and sum-of-squares over N,H,W.

    The VJP folds the statistics' cotangents into an effective output
    cotangent before the shared dX/dW kernels:
        dL/dy_total = g_y + g_sum[c] + 2 * y * g_sumsq[c]
    (y is a residual; XLA dedupes it with BatchNorm's own saved activation).

    arena_out: y is returned arena-framed (conv3x3_packed docstring) so a
    fused consumer (conv3x3_bnact_stats_train with arena_hw) reads it with
    no pad/slice pass between the kernels; the stats stay logical.

    pre_padded_hw: logical (h, w) when x arrives HOST-pre-padded (the network
    ingest conv; conv3x3_packed pre_padded docstring) — both the forward and
    the wgrad read it raw, so the shared full-resolution input pad never runs
    on device. dx is returned as zeros in x's (padded) aval: the ingest
    buffer is leaf data with no gradient consumer, and XLA DCEs the zeros.
    """
    y, stats = _conv_route(x, w, b, relu=False, with_stats=True,
                           interpret=interpret, arena_out=arena_out,
                           logical_hw=pre_padded_hw,
                           pre_padded=pre_padded_hw is not None)
    return y, stats[0], stats[1]


def _stats_fwd(x, w, b, interpret, arena_out=False, pre_padded_hw=None):
    y, s, ss = conv3x3_bias_stats_train(x, w, b, interpret, arena_out,
                                        pre_padded_hw)
    return (y, s, ss), (x, w, y)


def _stats_bwd(interpret, arena_out, pre_padded_hw, res, cotangents):
    x, w, y = res
    gy, gsum, gsumsq = cotangents
    if arena_out:
        # y/gy are arena-framed; the garbage regions carry no gradient (the
        # fused consumer's dx zeroes beyond-logical tiles and never writes
        # the borders) but gsum broadcasting would make them nonzero — slice
        # to logical before the elementwise fold. The slices fuse into the
        # pad-rooted g_eff fusions feeding the adjoint/wgrad kernels.
        h, w_ = pre_padded_hw if pre_padded_hw is not None else (x.shape[1], x.shape[2])
        o = w.shape[-1]
        gy = gy[:, 8 : 8 + h, 8 : 8 + w_, :o]
        y = y[:, 8 : 8 + h, 8 : 8 + w_, :o]
    g_eff = (
        gy.astype(jnp.float32)
        + gsum[None, None, None, :]
        + 2.0 * y.astype(jnp.float32) * gsumsq[None, None, None, :]
    ).astype(x.dtype)
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    zero_bias = jnp.zeros((w.shape[2],), jnp.float32)
    o = w.shape[-1]
    bc = w.shape[2]  # adjoint conv's output channels
    if pre_padded_hw is not None:
        # Host-ingest conv: the wgrad reads the pre-padded x raw (no pad op
        # on any leg); dx is zeros in x's padded aval — the ingest buffer is
        # leaf data, its cotangent has no consumer, and XLA DCEs the zeros.
        dw = conv3x3_wgrad(x, g_eff, pre_padded_c=bc,
                           interpret=interpret).astype(w.dtype)
        db = jnp.sum(g_eff.astype(jnp.float32), axis=(0, 1, 2))
        return jnp.zeros_like(x), dw, db
    h, w_ = x.shape[1], x.shape[2]
    # Adjoint output channels up to 128 stay on the packed kernel (full-lane
    # stride above _PACKED_LS): at bc in (64, 128] the halo route pays a
    # separate full-res 64->128-lane input pad (pad.736, 0.93 ms at
    # 608x968 in the round-4 post-ingest hlo_stats) that the arena-g read
    # avoids.
    ls = _PACKED_LS if bc <= _PACKED_LS else 128
    ext = (
        arena_g_extent(h, w_, o, bc, x.dtype, x.dtype,
                       lane_stride=ls, affine_bwd=False)
        if bc <= 128 and o % 8 == 0
        else None
    )
    if ext is not None:
        # Arena-g (see _bnact_bwd): g_eff materializes ONCE, zero-framed —
        # the jnp.pad (and, with arena_out, the gy/y logical slices) fuse
        # into the producer fusion, so the adjoint conv's separate
        # full-resolution 128-lane pad pass never runs.
        eh, ew = ext
        g_arena = jnp.pad(g_eff, ((0, 0), (8, eh + 8 - h), (8, ew + 8 - w_), (0, 0)))
        dx = conv3x3_packed(
            g_arena, wt, zero_bias, relu=False, out_dtype=x.dtype,
            lane_stride=ls, interpret=interpret,
            logical_hw=(h, w_), arena_g=True,
        )
        dw = _wgrad(x, g_arena, o, interpret, arena_g=True,
                    logical_hw=(h, w_)).astype(w.dtype)
        db = jnp.sum(g_arena.astype(jnp.float32), axis=(0, 1, 2))[:o]
        return dx, dw, db
    dx = _conv_route(g_eff, wt, zero_bias, relu=False, interpret=interpret)
    dw = _wgrad(x, g_eff, w.shape[-1], interpret).astype(w.dtype)
    db = jnp.sum(g_eff.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dw, db


conv3x3_bias_stats_train.defvjp(_stats_fwd, _stats_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv3x3_bnact_stats_train(x, pa, pb, w, b, interpret=False, arena_hw=None):
    """Fused BN-apply + ReLU + conv + BN-stats, differentiable, Pallas on TPU:

        z = relu(pa * x + pb)          (per-channel affine, in-kernel)
        y = conv3x3_same(z, w) + b
        returns (y, sum_c(y), sumsq_c(y))

    This is the DoubleConv conv1->bn1->relu->conv2 boundary collapsed into
    the conv2 kernel: the activated tensor z never exists in HBM (the
    forward applies the affine on each loaded halo window; dW recomputes it
    the same way). x is the RAW output of the producing conv; pa/pb are the
    BatchNorm affine folded to per-channel scale/shift:
        pa = gamma * rsqrt(var + eps),  pb = beta - mean * pa.
    Reference behavior being fused: model_parts.py:14-31 (Conv->BN->ReLU)*2.

    arena_hw: logical (h, w) when x is the producer's ARENA-framed raw
    output (conv3x3_bias_stats_train with arena_out) — the kernels then read
    x (forward, dW, and the backward-epilogue residual) with no pad or slice
    pass, and dx is returned arena-framed to match x's aval. Requires the
    boundary to be <= 64 channels (packed kernels on every leg) and the
    producer/adjoint tile covers to agree (models/parts.arena_compatible).
    """
    y, stats = _conv_route(
        x, w, b, pa, pb, relu=False, with_stats=True, interpret=interpret,
        logical_hw=arena_hw, arena_in=arena_hw is not None,
    )
    return y, stats[0], stats[1]


def _bnact_fwd(x, pa, pb, w, b, interpret, arena_hw=None):
    y, s, ss = conv3x3_bnact_stats_train(x, pa, pb, w, b, interpret, arena_hw)
    return (y, s, ss), (x, pa, pb, w, y)


def _bnact_bwd(interpret, arena_hw, res, cotangents):
    x, pa, pb, w, y = res
    gy, gsum, gsumsq = cotangents
    arena = arena_hw is not None
    g_eff = (
        gy.astype(jnp.float32)
        + gsum[None, None, None, :]
        + 2.0 * y.astype(jnp.float32) * gsumsq[None, None, None, :]
    ).astype(x.dtype)
    # dz: adjoint conv of the effective output cotangent (Pallas kernel).
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    zero_bias = jnp.zeros((w.shape[2],), jnp.float32)
    bc = w.shape[2]  # boundary channels (= adjoint conv's output channels)
    o = w.shape[-1]
    # Boundary channels up to 128 stay on the packed epilogue-backward kernel
    # (full-lane tap stride above _PACKED_LS, mirroring _stats_bwd): the halo
    # fallback at bc in (64, 128] pays a separate full-resolution lane pad on
    # the adjoint's input plus an unfused mask/scale pass.
    ls = _PACKED_LS if bc <= _PACKED_LS else 128
    # Arena lanes carry o channels directly (no 128-lane pad) — requires an
    # 8-divisible channel count for the (8,128) tiling.
    ext = (
        arena_g_extent(*arena_hw, o, bc, x.dtype, x.dtype, lane_stride=ls)
        if arena and o % 8 == 0
        else None
    )
    if bc <= _PACKED_LS and ext is not None:
        # Arena-g: g_eff is materialized ONCE, zero-framed at (8,8) inside the
        # adjoint conv's tile cover — the jnp.pad fuses into the g_eff
        # producer fusion, so the separate full-resolution 128-lane pad passes
        # XLA otherwise emits for the adjoint conv (measured 0.93 ms each at
        # 608x968x64, pads .725/.738 in the round-4 hlo_stats) never run. All
        # three consumers read this one buffer: the adjoint conv (arena_g
        # window reads), the wgrad (+8-offset raw windows), and db (the frame
        # zeros contribute nothing to the sum).
        h, w_ = arena_hw
        eh, ew = ext
        g_arena = jnp.pad(g_eff, ((0, 0), (8, eh + 8 - h), (8, ew + 8 - w_), (0, 0)))
        dx, (dpa, dpb) = conv3x3_packed(
            g_arena, wt, zero_bias, pa, pb, x, relu=False, out_dtype=x.dtype,
            lane_stride=_PACKED_LS, interpret=interpret, logical_hw=arena_hw,
            arena_in=True, arena_out=True, arena_g=True,
        )
        assert dx.shape == x.shape, (dx.shape, x.shape)
        dw = conv3x3_wgrad(
            x, g_arena, pa, pb, arena_in=True, arena_g=True,
            logical_hw=arena_hw, interpret=interpret,
        ).astype(w.dtype)
        db = jnp.sum(g_arena.astype(jnp.float32), axis=(0, 1, 2))[:o]
        return dx, dpa, dpb, dw, db
    if bc <= _BNACT_PACKED_MAX_BC:
        # Fused backward epilogue (conv3x3_packed bwd_x): the relu-mask
        # recompute, dx = mdz*pa scale, and the dpa/dpb reductions all run
        # while dz is still in the kernel's f32 accumulator — the separate
        # full-res elementwise pass + reduction re-read (measured 1.3 + 0.8
        # ms per 608x968x64 boundary, hlo_stats) never touch HBM. With an
        # arena residual, dx is emitted arena-framed (aval-matching x).
        # bc in (64, 128] (r5 cap lift): same kernel at the full 128-lane tap
        # stride — the halo fallback's separate full-res input lane pad and
        # unfused mask/scale/reduction passes never run.
        dx, (dpa, dpb) = conv3x3_packed(
            g_eff, wt, zero_bias, pa, pb, x, relu=False, out_dtype=x.dtype,
            lane_stride=ls, interpret=interpret,
            arena_in=arena, arena_out=arena,
        )
        if arena:
            assert dx.shape == x.shape, (dx.shape, x.shape)
    else:
        if arena:
            raise ValueError("arena boundaries must be <= 64 channels")
        # Halo-kernel route (boundary > _PACKED_LS channels): mask in XLA.
        dz = _conv_route(g_eff, wt, zero_bias, relu=False, interpret=interpret)
        # Backward through z = relu(pa*x + pb): recompute the relu mask from
        # the saved raw input (z itself was never materialized).
        x32 = x.astype(jnp.float32)
        dz32 = dz.astype(jnp.float32)
        m = (x32 * pa + pb) > 0
        mdz = jnp.where(m, dz32, 0.0)
        dx = (mdz * pa).astype(x.dtype)
        dpa = jnp.sum(mdz * x32, axis=(0, 1, 2))
        dpb = jnp.sum(mdz, axis=(0, 1, 2))
    dw = _wgrad(x, g_eff, w.shape[-1], interpret, pa, pb, arena_in=arena).astype(w.dtype)
    db = jnp.sum(g_eff.astype(jnp.float32), axis=(0, 1, 2))
    return dx, dpa, dpb, dw, db


conv3x3_bnact_stats_train.defvjp(_bnact_fwd, _bnact_bwd)
