"""Pallas TPU kernel: tap-packed 3x3 SAME conv for narrow output channels.

Motivation (measured on v5e, scripts/probe_mxu.py): a bf16 dot with N=64
output lanes runs at ~20 TF/s (half the MXU lanes idle and the per-pass
pipe cost is paid per 128-lane group), while the same M rows with N=576
packed columns reach ~134 TF/s. The models' full-resolution convs all have
O=64 (CubeNET inc 238->64, inc2 64->64, final Up 128->64 / 64->64 — the
FLOP majority of every forward), so the halo kernel's 9-shifted-dot
formulation (ops/pallas/conv3x3.py) issues exactly the worst dot shape.

This kernel restructures the arithmetic so each H-row tap needs ONE fat dot:

    for dh in 0..2:                       # 3 dots instead of 9*ceil(C/128)
        P = X[dh:dh+th, :twb, :] @ Wpack[dh]        # (th*twb, C) x (C, 384)
        acc[i, j, :] += sum_dw P[i, j+dw, dw*128 : dw*128+128]

where Wpack[dh][c, dw*128 + o] = w[dh, dw, c, o] (taps packed at a 128-lane
stride; lanes o>=O are zero so the shifted adds contribute exact zeros to
the padding lanes). The dw shifts move from matmul *inputs* (which forced a
relayout copy of the whole block per tap) to the matmul *output* read
(a sublane-offset read the VPU absorbs in the accumulate).

Cost per (th, tw) tile: 3 dots of M=th*twb rows + 9 shifted f32 adds,
vs 9*ceil(C/128) dots of M=th*tw rows + as many shifted input copies.

Same numerical contract as the halo kernel: f32 accumulation, bias (+ReLU)
epilogue, zero-padding for alignment -> exact outputs. Restrictions:
O <= 128 (the packing stride); use conv3x3_bias_act for deeper outputs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax._src.pallas.core import Element  # noqa: E402  (not yet re-exported)

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fit_tiles(h, width, c, o, in_dtype, out_dtype, th=8, tw=None, lane_stride=64,
              prologue=False, affine_bwd=False, arena_in=False):
    """(th, tw) auto-fit to the scoped-VMEM budget. twb = tw + 8: the 2-col
    halo rounded up to a whole sublane tile (windows overlap by 8). Exposed
    so callers (conv_train) can reproduce the pad geometry and share the
    padded input with the wgrad kernel. `prologue` accounts for the
    BN-affine+ReLU input-activation scratch; `affine_bwd` for the residual
    block the epilogue-backward mode streams in (see conv3x3_packed);
    `arena_in` for the wider (th+9, twb+8) aligned windows over an
    arena-framed input (fewer lanes: the arena stores op, not cp)."""
    cp = _round_up(c, LANE)
    op = _round_up(o, 8)
    ls = lane_stride
    th = min(th, _round_up(h, 8))

    def vmem_bytes(th_, tw_):
        twb_ = tw_ + 8
        esz = jnp.dtype(in_dtype).itemsize
        if arena_in:
            x_b = 2 * (th_ + 9) * (twb_ + 8) * _round_up(c, 8) * esz
        else:
            x_b = 2 * (th_ + 2) * twb_ * cp * esz
        w_b = 2 * 3 * cp * 3 * ls * esz
        p_b = th_ * twb_ * 3 * ls * 4
        a_b = th_ * tw_ * ls * 4
        o_b = 2 * th_ * tw_ * op * jnp.dtype(out_dtype).itemsize
        z_b = (th_ + 2) * twb_ * cp * esz if prologue else 0
        r_b = 2 * th_ * tw_ * op * esz if affine_bwd else 0
        return x_b + w_b + p_b + a_b + o_b + z_b + r_b

    if tw is None:
        tw = _round_up(width, 8)
        while tw > 64 and vmem_bytes(th, tw) > 11 * 1024 * 1024:
            tw = _round_up((tw + 1) // 2, 8)
    while th > 4 and vmem_bytes(th, tw) > 11 * 1024 * 1024:
        th //= 2
    return th, tw


def arena_extent(h, width, c, o, in_dtype, out_dtype, lane_stride=64,
                 prologue=False, affine_bwd=False):
    """(Eh, Ew) tile cover this kernel's grid spans for logical (h, width) —
    the arena buffer is (n, 8 + Eh + 8, 8 + Ew + 8, round_up(o, 8)). Producers
    and consumers of a shared arena must agree on the extent (checked by
    models/parts.arena_compatible)."""
    th, tw = fit_tiles(h, width, c, o, in_dtype, out_dtype,
                       lane_stride=lane_stride, prologue=prologue,
                       affine_bwd=affine_bwd)
    if th != 8:
        return None  # Element output offsets must be 8-divisible (probe)
    n_h = -(-h // th)
    n_w = -(-width // tw)
    return n_h * th, n_w * tw


def arena_g_extent(h, width, c, o, in_dtype, out_dtype, lane_stride=64,
                   affine_bwd=True):
    """(Eh, Ew) tile cover of the arena-g read (conv3x3_packed with arena_g:
    an adjoint conv consuming a zero-framed arena g_eff). The g_eff arena
    buffer is (n, 8 + Eh + 8, 8 + Ew + 8, round_up(c, 8)); the producer
    (conv_train's fused pad) must build exactly this extent. affine_bwd=True
    for the bwd-epilogue adjoint (_bnact_bwd); False for the plain fwd-mode
    adjoint (_stats_bwd)."""
    th, tw = fit_tiles(h, width, c, o, in_dtype, out_dtype,
                       lane_stride=lane_stride, prologue=True,
                       affine_bwd=affine_bwd, arena_in=True)
    if th != 8:
        return None  # arena Element offsets must be 8-divisible
    return -(-h // th) * th, -(-width // tw) * tw


def padded_width(width, h, c, o, in_dtype, out_dtype, lane_stride=64,
                 prologue=False):
    """Total padded W (left border + W + right) the packed kernel DMAs."""
    th, tw = fit_tiles(h, width, c, o, in_dtype, out_dtype, lane_stride=lane_stride,
                       prologue=prologue)
    n_w = -(-width // tw)
    return 1 + width + ((n_w - 1) * tw + (tw + 8) - 1 - width)


def _kernel(*refs, th, tw, twb, relu, op, ls, stats_hw=None, pro_hw=None,
            bwd_hw=None, bwd_shift=0, n_w=1, arena_x=False, gx_hw=None):
    refs = list(refs)
    x_ref = refs.pop(0)
    w_ref = refs.pop(0)
    b_ref = refs.pop(0)
    pa_ref = refs.pop(0) if (pro_hw or bwd_hw) is not None else None
    pb_ref = refs.pop(0) if (pro_hw or bwd_hw) is not None else None
    r_ref = refs.pop(0) if bwd_hw is not None else None
    o_ref = refs.pop(0)
    s_ref = refs.pop(0) if (stats_hw or bwd_hw) is not None else None
    p_ref = refs.pop(0)
    acc_ref = refs.pop(0)
    z_ref = refs.pop(0) if (pro_hw is not None or gx_hw is not None) else None
    cp = z_ref.shape[-1] if z_ref is not None else x_ref.shape[-1]

    if gx_hw is not None:
        # Raw arena-framed x (an arena-materialized g_eff, produced by a
        # zero-filling jnp.pad fused into its producer): realign the 8-aligned
        # (th+9, twb+8) window by the static +7 shift and zero-extend the
        # arena's op-wide lanes to the dot's cp. The frame is EXACT ZEROS so
        # the valid-mask select is semantically a no-op, but it (a) forces the
        # +7-sublane-offset layout through arithmetic — Mosaic cannot
        # concatenate offset-mismatched layouts on a non-concat dim — and
        # (b) guards a mis-extent producer from leaking values.
        h, w = gx_hw
        i, j = pl.program_id(1), pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, twb, 1), 0) + i * th
        col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, twb, 1), 1) + j * tw
        valid = (row >= 1) & (row <= h) & (col >= 1) & (col <= w)
        xw = x_ref[0, 7 : 7 + th + 2, 7 : 7 + twb, :]
        zf = jnp.where(valid, xw.astype(jnp.float32), 0.0)
        if xw.shape[-1] < cp:
            zf = jnp.concatenate(
                [zf, jnp.zeros((th + 2, twb, cp - xw.shape[-1]), zf.dtype)], axis=-1
            )
        z_ref[...] = zf.astype(z_ref.dtype)
    if pro_hw is not None:
        # BN-affine + ReLU prologue: the input is the producing conv's RAW
        # output (padded with zeros); apply z = relu(a*x + b) per channel in
        # VMEM, masking the SAME border / alignment padding back to exact
        # zeros (relu(b) would otherwise leak into the halo). One pass over
        # the (th+2, twb) window before the tap loop.
        h, w = pro_hw
        i, j = pl.program_id(1), pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, twb, 1), 0) + i * th
        col = jax.lax.broadcasted_iota(jnp.int32, (th + 2, twb, 1), 1) + j * tw
        valid = (row >= 1) & (row <= h) & (col >= 1) & (col <= w)
        if arena_x:
            # Arena-framed input (logical (0,0) at (8,8); never-written
            # borders and beyond-logical tiles are arbitrary garbage, possibly
            # NaN): the window is 8-aligned at (i*th, j*tw), so realign by the
            # static +7 shift here, mask BEFORE anything can propagate NaN
            # (where() on the *inputs*, not the affine result), and
            # zero-extend the op-wide arena lanes to the dot's cp lanes.
            xw = x_ref[0, 7 : 7 + th + 2, 7 : 7 + twb, :]
            xm = jnp.where(valid, xw.astype(jnp.float32), 0.0)
            # pa/pb ride (8, op_in) tiles in arena mode (lane widths match)
            zf = jnp.maximum(xm * pa_ref[0, :] + pb_ref[0, :], 0.0)
            zf = jnp.where(valid, zf, 0.0)
            if xw.shape[-1] < cp:
                zf = jnp.concatenate(
                    [zf, jnp.zeros((th + 2, twb, cp - xw.shape[-1]), zf.dtype)], axis=-1
                )
            z_ref[...] = zf.astype(z_ref.dtype)
        else:
            zf = x_ref[0].astype(jnp.float32) * pa_ref[0, :] + pb_ref[0, :]
            z_ref[...] = jnp.where(valid, jnp.maximum(zf, 0.0), 0.0).astype(z_ref.dtype)

    def x_window(dh):
        if z_ref is not None:
            return z_ref[dh : dh + th, 0:twb, :]
        return x_ref[0, dh : dh + th, 0:twb, :]

    for dh in range(3):
        x2 = x_window(dh).reshape(th * twb, cp)
        p_ref[...] = jax.lax.dot_general(
            x2,
            w_ref[dh],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(th, twb, 3 * ls)
        # one read-modify-write of acc per dh: the three shifted tap reads
        # fold into a single VPU expression
        s = (
            p_ref[0:th, 0:tw, 0:ls]
            + p_ref[0:th, 1 : 1 + tw, ls : 2 * ls]
            + p_ref[0:th, 2 : 2 + tw, 2 * ls : 3 * ls]
        )
        if dh == 0:
            acc_ref[...] = s
        else:
            acc_ref[...] += s
    y = acc_ref[...]
    if bwd_hw is None:
        # The backward-epilogue mode skips the bias: y there is the adjoint
        # conv's dz, which has no bias term (adding one would corrupt
        # dx/dpa/dpb; the b operand is ignored in that mode).
        y = y + b_ref[0, :].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    if bwd_hw is not None:
        # Fused BN-affine+ReLU *backward* epilogue: this call is the adjoint
        # conv (y = dz, the cotangent of z = relu(pa*x + pb) at the fused
        # DoubleConv boundary, conv_train.conv3x3_bnact_stats_train). While
        # dz sits in the f32 accumulator, recompute the relu mask from the
        # residual x, emit dx = [z' > 0] * dz * pa, and accumulate the
        # affine's gradients dpa = sum(mdz * x), dpb = sum(mdz) — the
        # separate full-resolution mask/scale pass and the reduction re-read
        # XLA would otherwise run never touch HBM.
        h, w = bwd_hw
        i, j = pl.program_id(1), pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1)
        valid = jnp.logical_and(row < h - i * th, col < w - j * tw)
        # r is read raw (no pad pass) through Element windows whose W start
        # is clamped so no window crosses the physical round_up(W,8) extent
        # (whole-row overreads hard-fault; see conv3x3_grad.py). The last W
        # block is therefore left-shifted by a static `bwd_shift` columns;
        # realign it here. Clamp-garbage (which can be NaN/Inf) is zeroed
        # before any product — 0 * NaN would poison the reductions.
        rb = r_ref[0]
        if bwd_shift:
            rs = jnp.concatenate(
                [rb[:, bwd_shift:, :], jnp.zeros((th, bwd_shift, ls), rb.dtype)],
                axis=1,
            )
            rb = jnp.where(j == n_w - 1, rs, rb)
        xf = jnp.where(valid, rb.astype(jnp.float32), 0.0)
        # valid must mask mdz too: the first padding row/col of y is NOT
        # zero (the SAME conv's halo bleeds real neighbors into the margin)
        # and m there is `pb > 0` on the zeroed xf.
        m = jnp.logical_and((xf * pa_ref[0, :] + pb_ref[0, :]) > 0, valid)
        mdz = jnp.where(m, y, 0.0)
        o_ref[...] = (mdz * pa_ref[0, :])[:, :, :op].reshape(
            1, th, tw, op
        ).astype(o_ref.dtype)
        first = jnp.logical_and(
            pl.program_id(0) == 0, jnp.logical_and(i == 0, j == 0)
        )

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        s_ref[0:1, :] += jnp.sum(mdz * xf, axis=(0, 1)).reshape(1, ls)
        s_ref[1:2, :] += jnp.sum(mdz, axis=(0, 1)).reshape(1, ls)
        return
    o_ref[...] = y[:, :, :op].reshape(1, th, tw, op).astype(o_ref.dtype)

    if s_ref is not None:
        # BatchNorm batch statistics while the f32 accumulator is in VMEM:
        # per-channel sum / sum-of-squares of pre-relu y, excluding the
        # alignment-padding rows/cols (same scheme as conv3x3.py).
        h, w = stats_hw
        i, j = pl.program_id(1), pl.program_id(2)
        row = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1)
        valid = jnp.logical_and(row < h - i * th, col < w - j * tw)
        ym = jnp.where(valid, y, 0.0)
        first = jnp.logical_and(
            pl.program_id(0) == 0, jnp.logical_and(i == 0, j == 0)
        )

        @pl.when(first)
        def _():
            s_ref[...] = jnp.zeros_like(s_ref)

        s_ref[0:1, :] += jnp.sum(ym, axis=(0, 1)).reshape(1, ls)
        s_ref[1:2, :] += jnp.sum(ym * ym, axis=(0, 1)).reshape(1, ls)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "th", "tw", "out_dtype", "lane_stride", "with_stats",
                     "interpret", "logical_hw", "arena_in", "arena_out", "arena_g",
                     "pre_padded"),
)
def conv3x3_packed(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    pa: Optional[jnp.ndarray] = None,
    pb: Optional[jnp.ndarray] = None,
    bwd_x: Optional[jnp.ndarray] = None,
    *,
    relu: bool = True,
    th: int = 8,
    tw: Optional[int] = None,
    out_dtype=None,
    lane_stride: Optional[int] = None,
    with_stats: bool = False,
    interpret: bool = False,
    logical_hw: Optional[tuple] = None,
    arena_in: bool = False,
    arena_out: bool = False,
    arena_g: bool = False,
    pre_padded: bool = False,
):
    """y = act(conv3x3_same(act_in(x), w) + b); (N,H,W,C) x, (3,3,C,O) w,
    O <= 128.

    pa/pb: optional (C,) float32 per-input-channel affine — the kernel
    computes act_in(x) = relu(pa*x + pb) in VMEM on each loaded window
    (masked back to zero on the padding border), fusing the BatchNorm-apply
    + ReLU between two convs into the consumer's load. Without them,
    act_in = identity.

    bwd_x: switches the kernel to the BN-affine *backward* epilogue (the
    adjoint-conv call of conv_train.conv3x3_bnact_stats_train). x is then
    the cotangent g, y = dz stays in the f32 accumulator, and pa/pb are the
    (O,) affine of the boundary being differentiated; bwd_x is the saved
    residual (N, H, W, O) raw producer output, read through a ragged blocked
    spec (no padding pass). Returns (dx, (dpa, dpb)) with
    dx = [pa*bwd_x+pb > 0] * dz * pa, dpa = sum(mdz*bwd_x), dpb = sum(mdz).
    Mutually exclusive with the prologue / with_stats / relu modes. In this
    mode the b operand is ignored (the adjoint conv has no bias term).

    lane_stride: packing stride of the three dw taps in the fat dot's N dim
    (>= O, multiple of 8). 64 halves the P scratch and the MXU N-passes for
    O <= 64 but exercises sub-tile lane slices; default packs at the full
    128-lane tile so every slice is tile-aligned.

    Arena geometry (TODO.md; crux validated by scripts/probe_element_out.py):
    an "arena" tensor frames logical pixel (0,0) at (8,8) inside a
    (n, 8+Eh+8, 8+Ew+8, round_up(ch,8)) buffer whose borders and
    beyond-logical tiles are never written (arbitrary garbage, masked in
    consumers) — raw Pallas conv outputs flow between kernels with NO
    full-resolution pad or slice pass in between.
      arena_out: write y arena-framed (Element output windows at +8 offsets)
                 instead of slicing to logical; stats stay logical-masked.
      arena_in:  prologue mode — x is arena-framed (logical_hw required);
                 the 8-aligned (th+9, twb+8) window is realigned by a static
                 +7 shift in the scratch copy, garbage masked, lanes
                 zero-extended to the dot's cp.
                 bwd mode — bwd_x (the residual) is arena-framed; its +8
                 offsets are themselves 8-aligned, so the reads need no
                 clamping, realign shift, or ragged pad.
      arena_g:   bwd mode — x (the g_eff cotangent) is arena-framed with a
                 ZERO-FILLED frame (produced by a jnp.pad fused into its
                 producer, conv_train._bnact_bwd), so the full-resolution
                 128-lane pad pass never materializes; the window realign +
                 lane zero-extension happen in the scratch copy (no masking —
                 the frame is exact zeros, unlike prologue-arena garbage).
                 logical_hw required; extent must match arena_g_extent().

    pre_padded: host-ingest mode — x IS the padded input buffer this wrapper
    would otherwise build with jnp.pad (logical (0,0) at (1,1), lanes
    zero-extended to round_up(C,128), zeros everywhere beyond the logical
    crop; geometry from models/parts.first_conv_ingest_spec, which reproduces
    this function's fit_tiles call). The full-resolution pad+copy — ~1.9 ms
    per CubeNET train step for the shared fwd/wgrad 238->256 first-conv input
    pad (round-3 hlo_stats) — never exists on device: the HOST writes the
    crop into a zeroed buffer once, absorbed by the async loader's prefetch.
    logical_hw required (h/w cannot be read off the padded shape); the true
    channel count comes from w. Mutually exclusive with arena_in/arena_g and
    the prologue (the ingest conv is the network's first — nothing precedes
    it to fuse). arena_out IS permitted and the exclusion check below
    deliberately omits it: input framing (where this conv reads from) and
    output framing (where it writes to) are independent, and CubeNET's
    ingest first conv relies on pre_padded + arena_out for the
    first_conv -> inc2 arena chain.
    """
    bwd = bwd_x is not None
    prologue = pa is not None and not bwd
    n = x.shape[0]
    c = w.shape[2]
    if arena_g and pa is not None and not bwd:
        raise ValueError("arena_g conflicts with the prologue (both own z_ref)")
    if pre_padded and (arena_in or arena_g or prologue or bwd):
        raise ValueError("pre_padded is the bare host-ingest conv: no arena "
                         "modes, no prologue, no bwd epilogue")
    if (arena_in and prologue) or arena_g:
        if logical_hw is None:
            raise ValueError("arena-framed x needs logical_hw")
        h, width = logical_hw
        opx = x.shape[-1]
        assert opx >= c and opx % 8 == 0, (x.shape, c)
    elif pre_padded:
        if logical_hw is None:
            raise ValueError("pre_padded x needs logical_hw")
        h, width = logical_hw
    else:
        _, h, width, xc = x.shape
        if logical_hw is not None:
            assert (h, width) == tuple(logical_hw), (x.shape, logical_hw)
        assert xc == c, (w.shape, x.shape)
    kh, kw, wc, o = w.shape
    assert (kh, kw) == (3, 3), w.shape
    assert o <= LANE, f"packed kernel requires O <= {LANE}, got {o}"
    out_dtype = out_dtype or x.dtype
    if bwd:
        assert not relu and not with_stats and pa is not None
        if arena_in:
            if bwd_x.shape[0] != n or bwd_x.shape[-1] < o:
                raise ValueError(f"arena bwd_x {bwd_x.shape} mismatches (n={n}, o={o})")
        else:
            assert bwd_x.shape == (n, h, width, o), (bwd_x.shape, (n, h, width, o))

    cp = _round_up(c, LANE)
    op = _round_up(o, 8)
    ls = lane_stride or LANE
    assert ls % 8 == 0 and op <= ls <= LANE, (ls, op)
    th = min(th, _round_up(h, 8))

    th, tw = fit_tiles(h, width, c, o, x.dtype, out_dtype,
                       th=th, tw=tw, lane_stride=ls, prologue=prologue or arena_g,
                       affine_bwd=bwd, arena_in=(arena_in and prologue) or arena_g)
    twb = tw + 8
    # Arena invariants raise (not assert): a wiring bug here becomes raw
    # out-of-bounds TPU window reads under `python -O`, not a clean error.
    if (arena_out or arena_in or arena_g) and th != 8:
        raise ValueError(f"arena offsets must be 8-divisible, got th={th}")

    n_h = pl.cdiv(h, th)
    n_w = pl.cdiv(width, tw)
    if (arena_in and prologue) or arena_g:
        # Arena input: no pad pass at all. Windows are (th+9, twb+8) at
        # aligned (i*th, j*tw) — the W size is twb+8, not the minimal twb+7,
        # because Mosaic requires the block's second-to-last dim to be
        # 8-divisible. The last windows reach (n_h*th+9, n_w*tw+16), which
        # the arena's +16 slack covers iff the producer's extent is
        # >= this kernel's tile cover (checked at wiring time, re-checked here).
        if x.shape[1] < n_h * th + 9 or x.shape[2] < n_w * tw + 16:
            raise ValueError(
                f"arena extent {x.shape} < consumer tile cover "
                f"{(n_h * th + 9, n_w * tw + 16)}")
        xp = x
    elif pre_padded:
        # Host-ingest: x already has the pad geometry below (built once on
        # the host from first_conv_ingest_spec); windows read it raw. The
        # invariants raise (not assert): a mis-sized buffer becomes raw
        # out-of-bounds TPU window reads under `python -O` otherwise.
        if x.shape[1] < n_h * th + 2 or x.shape[2] < n_w * tw + 8:
            raise ValueError(
                f"pre-padded extent {x.shape} < window cover "
                f"{(n_h * th + 2, n_w * tw + 8)} for logical {(h, width)}")
        if x.shape[-1] < cp:
            raise ValueError(f"pre-padded lanes {x.shape[-1]} < {cp}")
        xp = x
    else:
        # Pad: 1-px SAME border top/left; bottom/right so every Element window
        # (H stride th size th+2; W stride tw size twb) stays in bounds.
        bottom = n_h * th + 1 - h
        right = (n_w - 1) * tw + twb - 1 - width
        xp = jnp.pad(x, ((0, 0), (1, bottom), (1, right), (0, cp - c)))

    # Wpack[dh][c, dw*ls + o] = w[dh, dw, c, o]; zero elsewhere.
    wp = jnp.pad(w.astype(x.dtype), ((0, 0), (0, 0), (0, cp - c), (0, ls - o)))
    wp = jnp.transpose(wp, (0, 2, 1, 3)).reshape(3, cp, 3 * ls)
    bp = jnp.broadcast_to(jnp.pad(b, (0, ls - o)), (8, ls))

    grid = (n, n_h, n_w)
    if with_stats:
        assert not relu, "stats are the BatchNorm input: pre-activation only"
    wphys = _round_up(width, 8)
    bwd_shift = max(0, n_w * tw - wphys) if (bwd and not arena_in) else 0
    kernel = functools.partial(
        _kernel, th=th, tw=tw, twb=twb, relu=relu, op=op, ls=ls,
        stats_hw=(h, width) if with_stats else None,
        pro_hw=(h, width) if prologue else None,
        bwd_hw=(h, width) if bwd else None,
        bwd_shift=bwd_shift, n_w=n_w,
        arena_x=arena_in and prologue, gx_hw=(h, width) if arena_g else None,
    )
    flops = 2 * n * h * width * c * o * 9

    if (arena_in and prologue) or arena_g:
        x_spec = pl.BlockSpec(
            (Element(1), Element(th + 9), Element(twb + 8), Element(opx)),
            lambda bn, i, j: (bn, i * th, j * tw, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        x_spec = pl.BlockSpec(
            (Element(1), Element(th + 2), Element(twb), Element(cp)),
            lambda bn, i, j: (bn, i * th, j * tw, 0),
            memory_space=pltpu.VMEM,
        )
    in_specs = [
        x_spec,
        pl.BlockSpec((3, cp, 3 * ls), lambda bn, i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, ls), lambda bn, i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xp, wp, bp]
    if prologue or bwd:
        # Per-channel affine as (8, lanes) 2-D tiles (same trick as bias:
        # dynamic 1-D slices cannot be alignment-proven). Prologue: input
        # channels (cp lanes; arena: the window's op-wide lanes so widths
        # match in the scratch copy); backward epilogue: output channels
        # (ls lanes).
        al = (opx if arena_in else cp) if prologue else ls
        an = c if prologue else o
        pap = jnp.broadcast_to(jnp.pad(pa.astype(jnp.float32), (0, al - an)), (8, al))
        pbp = jnp.broadcast_to(jnp.pad(pb.astype(jnp.float32), (0, al - an)), (8, al))
        cspec = pl.BlockSpec((8, al), lambda bn, i, j: (0, 0), memory_space=pltpu.VMEM)
        in_specs += [cspec, cspec]
        operands += [pap, pbp]
    if bwd and arena_in:
        # Arena residual: the +8 frame offset makes every window offset
        # 8-divisible by itself, so the reads are plain aligned windows — no
        # clamping, no realign shift, no ragged-H pad. Coverage is the
        # producer-extent >= this kernel's tile cover (wiring-checked).
        assert bwd_x.shape[1] >= n_h * th + 8 and bwd_x.shape[2] >= n_w * tw + 8, (
            bwd_x.shape, (n_h * th, n_w * tw))
        in_specs.append(
            pl.BlockSpec(
                (Element(1), Element(th), Element(tw), Element(ls)),
                lambda bn, i, j: (
                    bn,
                    (i * (th // 8) + 1) * 8,
                    (j * (tw // 8) + 1) * 8,
                    0,
                ),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bwd_x)
    elif bwd:
        # The residual is read RAW (no full-resolution pad pass — the whole
        # point) through non-overlapping Element windows, wgrad-style: the W
        # start is clamped so no window crosses the physical round_up(W,8)
        # extent (the clamped last block is realigned in-kernel by the
        # static bwd_shift), H windows stay within round_up(h,8) because
        # th <= 8, and lane/sublane clamp-garbage is masked before use.
        # H windows reach n_h*th rows. On ragged H (h % th != 0) that would
        # read whole rows past the allocation — whole-row overreads past the
        # physical extent hard-fault on TPU (conv3x3_grad.py pads g for the
        # same reason). Zero-pad the residual to the window extent; the
        # in-kernel `valid` mask already zeroes these rows before use.
        # Hardware-validated at h%8 in {3,5} up to 605x968 — fwd/stats/wgrad
        # at 1e-6, bwd dx within one bf16 ULP (scripts/probe_ragged_h.py, r4).
        if n_h * th != h:
            bwd_x = jnp.pad(bwd_x, ((0, 0), (0, n_h * th - h), (0, 0), (0, 0)))
        w_start = wphys - tw  # static, >= 0 since tw <= round_up(width, 8)
        # The min() is expressed in units of 8 with an explicit *8 so Mosaic
        # can prove the sublane tiling divides the window offset (a raw
        # min(j*tw, w_start) fails its divisibility proof).
        in_specs.append(
            pl.BlockSpec(
                (Element(1), Element(th), Element(tw), Element(ls)),
                lambda bn, i, j: (
                    bn,
                    i * th,
                    jnp.minimum(j * (tw // 8), w_start // 8) * 8,
                    0,
                ),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bwd_x)
    scratch_shapes = [
        pltpu.VMEM((th, twb, 3 * ls), jnp.float32),
        pltpu.VMEM((th, tw, ls), jnp.float32),
    ]
    if prologue or arena_g:
        scratch_shapes.append(pltpu.VMEM((th + 2, twb, cp), x.dtype))

    if arena_out:
        # Arena output: Element windows at the +8 frame offset, written as
        # (expr)*8 so Mosaic's divisibility proof accepts them (probe:
        # scripts/probe_element_out.py). The 8-px borders and beyond-logical
        # tiles of the buffer are never written — consumers mask them.
        y_spec = pl.BlockSpec(
            (Element(1), Element(th), Element(tw), Element(op)),
            lambda bn, i, j: (bn, (i * (th // 8) + 1) * 8, (j * (tw // 8) + 1) * 8, 0),
            memory_space=pltpu.VMEM,
        )
        y_shape = jax.ShapeDtypeStruct(
            (n, 8 + n_h * th + 8, 8 + n_w * tw + 8, op), out_dtype
        )
    else:
        y_spec = pl.BlockSpec(
            (1, th, tw, op), lambda bn, i, j: (bn, i, j, 0), memory_space=pltpu.VMEM
        )
        y_shape = jax.ShapeDtypeStruct((n, n_h * th, n_w * tw, op), out_dtype)

    two_outputs = with_stats or bwd
    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            y_spec,
            pl.BlockSpec((8, ls), lambda bn, i, j: (0, 0), memory_space=pltpu.VMEM),
        )
        if two_outputs
        else y_spec,
        out_shape=(y_shape, jax.ShapeDtypeStruct((8, ls), jnp.float32))
        if two_outputs
        else y_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2, transcendentals=0
        ),
        # Arena Element windows sit at sublane-unaligned 8-offsets inside
        # 16-row bf16 tiles; Mosaic pads their double buffers past the
        # Python-side vmem fit (see conv3x3_grad) — raise the 16M default
        # cap rather than shrink tiles below the 8-divisibility floor.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
        if (arena_in or arena_out or arena_g)
        else None,
        interpret=interpret,
    )(*operands)
    if two_outputs:
        out, stats = result
        if not arena_out:
            out = out[:, :h, :width, :o]
        return out, (stats[0, :o], stats[1, :o])
    return result if arena_out else result[:, :h, :width, :o]
