"""Pallas TPU kernel: 3x3 SAME conv weight gradient (dW), NHWC.

dW[dh, dw, c, o] = sum_{n,h,w} x_pad[n, h+dh, w+dw, c] * g[n, h, w, o]

This is the missing piece for running the fused Pallas conv in *training*:
XLA's own kernel-gradient convolution at the full-resolution shallow layers
is the single largest chunk of the 125 ms CubeNET backward (hlo_stats trace,
scripts/trace_train.py) because GSPMD blocks the 968-wide spatial axis
through HBM. Here the whole (3, 3, C, O) accumulator lives in VMEM across
the entire grid; each grid step loads one (TH+2)-row halo block of x and the
matching TH-row block of g and issues 9 (C, TH*W) x (TH*W, O) MXU dots.

Same packing rules as the forward kernel (ops/pallas/conv3x3.py): channels
in <=128-lane chunks, W padded to a multiple of 8, halo via Element-indexed
overlapping windows over a pre-padded input. f32 accumulation; output f32.
Validated against jax.grad of lax.conv_general_dilated (tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax._src.pallas.core import Element  # noqa: E402 (not yet re-exported)

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_PACK = 64  # dw-pack stride (see dw_pack below)


def _wgrad_kernel(*refs, th: int, wo: int, h: int, w: int, n_chunks: int,
                  prologue: bool = False, dw_pack: bool = False,
                  arena_x: bool = False, fold: bool = False):
    refs = list(refs)
    x_ref = refs.pop(0)
    g_ref = refs.pop(0)
    y_ref = refs.pop(0) if fold else None
    gs_ref = refs.pop(0) if fold else None
    gss_ref = refs.pop(0) if fold else None
    pa_ref = refs.pop(0) if prologue else None
    pb_ref = refs.pop(0) if prologue else None
    o_ref = refs.pop(0)
    db_ref = refs.pop(0) if fold else None
    z_ref = refs.pop(0) if prologue else None

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
        if fold:
            db_ref[...] = jnp.zeros_like(db_ref)

    i = pl.program_id(1)
    if prologue:
        # Same BN-affine + ReLU input prologue as the forward kernels
        # (conv3x3_packed._kernel): x is the producing conv's RAW output;
        # z = relu(pa*x + pb), masked back to exact zeros on the padding
        # border so dW matches the forward's activated input.
        wb_ = z_ref.shape[1]
        prow = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wb_, 1), 0) + i * th
        pcol = jax.lax.broadcasted_iota(jnp.int32, (th + 2, wb_, 1), 1)
        pvalid = (prow >= 1) & (prow <= h) & (pcol >= 1) & (pcol <= w)
        if arena_x:
            # Arena-framed x (see conv3x3_packed): 8-aligned window realigned
            # by the static +7 shift, garbage masked before the affine (it
            # may be NaN), op-wide lanes zero-extended to the dot's cp.
            xw = x_ref[0, 7 : 7 + th + 2, 7 : 7 + wb_, :]
            xm = jnp.where(pvalid, xw.astype(jnp.float32), 0.0)
            zf = jnp.maximum(xm * pa_ref[0, :] + pb_ref[0, :], 0.0)
            zf = jnp.where(pvalid, zf, 0.0)
            if xw.shape[-1] < z_ref.shape[-1]:
                zf = jnp.concatenate(
                    [zf, jnp.zeros((th + 2, wb_, z_ref.shape[-1] - xw.shape[-1]), zf.dtype)],
                    axis=-1,
                )
            z_ref[...] = zf.astype(z_ref.dtype)
        else:
            zf = x_ref[0].astype(jnp.float32) * pa_ref[0, :] + pb_ref[0, :]
            z_ref[...] = jnp.where(pvalid, jnp.maximum(zf, 0.0), 0.0).astype(z_ref.dtype)

    # g is read RAW (no HBM pad pass): its Element windows clamp at the H
    # tail and the array may be narrower than wo, so zero the out-of-range
    # rows/cols here (one VPU select per block — the HBM pad copies this
    # replaces measured 1.3 ms each at full resolution). Mask before the
    # flatten: Mosaic cannot shape-cast an i1 vector.
    row = jax.lax.broadcasted_iota(jnp.int32, (th, wo, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (th, wo, 1), 1)
    valid = jnp.logical_and(row < h - i * th, col < w)
    op = g_ref.shape[-1]
    if fold:
        # Fused BN-stats cotangent: the effective output cotangent of a
        # stats-collecting conv (conv_train._stats_bwd/_bnact_bwd) is
        #   g_eff = gy + gsum + 2 * y * gsumsq
        # — computed HERE from the raw gy and the saved pre-activation y
        # instead of XLA materializing a full-resolution g_eff tensor just
        # to feed this kernel's raw read (measured ~1.3 ms per 608x968x64
        # leg, hlo_stats). db = sum(g_eff) rides along in db_ref so the
        # reduction never re-reads HBM either. Mask the raw inputs BEFORE
        # the arithmetic (clamp/arena garbage can be NaN, and the gsum
        # broadcast would make out-of-range pixels nonzero); cast to the
        # cotangent dtype before the dots for bit-parity with the
        # materialized path.
        gm = jnp.where(valid, g_ref[0].astype(jnp.float32), 0.0)
        ym = jnp.where(valid, y_ref[0].astype(jnp.float32), 0.0)
        ge = jnp.where(valid, gm + gs_ref[0, :] + 2.0 * ym * gss_ref[0, :], 0.0)
        g2m = ge.astype(g_ref.dtype)
        db_ref[0:1, :] += jnp.sum(g2m.astype(jnp.float32), axis=(0, 1)).reshape(1, op)
    else:
        g2m = jnp.where(valid, g_ref[0], 0)

    if dw_pack:
        # O <= 64 route: the N=64 dots leave half the MXU lanes idle (same
        # waste the packed forward kernel eliminates). Reindex the column
        # sum (u = c + dw):  dW[dh, dw] = sum_{r,u} x[dh+r, u] * g[r, u-dw]
        # — x no longer shifts with dw, so the three dw taps pack into the
        # RHS lanes: RHS[(r, u), dw*64 + o] = g[r, u-dw, o] (zero-embedded
        # into the wo+8-wide u range, built ONCE per block, reused across
        # every dh and channel chunk). 3 dots of N=192 (2 MXU passes, 75%
        # lane fill) replace 9 dots of N=64 (9 passes, 50% fill).
        wo8 = wo + 8
        if op < _PACK:
            g2m = jnp.concatenate(
                [g2m, jnp.zeros((th, wo, _PACK - op), g2m.dtype)], axis=-1
            )
        parts = []
        for dw in range(3):
            right = jnp.zeros((th, wo8 - wo - dw, _PACK), g2m.dtype)
            if dw == 0:
                parts.append(jnp.concatenate([g2m, right], axis=1))
            else:
                left = jnp.zeros((th, dw, _PACK), g2m.dtype)
                parts.append(jnp.concatenate([left, g2m, right], axis=1))
        rhs = jnp.concatenate(parts, axis=-1).reshape(th * wo8, 3 * _PACK)
        for k in range(n_chunks):
            for dh in range(3):
                if z_ref is not None:
                    xs = z_ref[dh : dh + th, 0:wo8, k * LANE : (k + 1) * LANE]
                else:
                    xs = x_ref[0, dh : dh + th, 0:wo8, k * LANE : (k + 1) * LANE]
                out = jax.lax.dot_general(
                    xs.reshape(th * wo8, LANE),
                    rhs,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for dw in range(3):
                    o_ref[dh, dw, k * LANE : (k + 1) * LANE, :] += out[
                        :, dw * _PACK : dw * _PACK + op
                    ]
        return

    g2 = g2m.reshape(th * wo, op)
    for k in range(n_chunks):
        for dh in range(3):
            for dw in range(3):
                if z_ref is not None:
                    xs = z_ref[dh : dh + th, dw : dw + wo, k * LANE : (k + 1) * LANE]
                else:
                    xs = x_ref[0, dh : dh + th, dw : dw + wo, k * LANE : (k + 1) * LANE]
                xs2 = xs.reshape(th * wo, LANE)
                # (C, THW) x (THW, O): contract over the pixel axis
                o_ref[dh, dw, k * LANE : (k + 1) * LANE, :] += jax.lax.dot_general(
                    xs2,
                    g2,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )


@functools.partial(jax.jit, static_argnames=("th", "pad_w_to", "interpret",
                                              "arena_in", "arena_g", "logical_hw",
                                              "pre_padded_c"))
def conv3x3_wgrad(
    x: jnp.ndarray,
    g: jnp.ndarray,
    pa: Optional[jnp.ndarray] = None,
    pb: Optional[jnp.ndarray] = None,
    *,
    y: Optional[jnp.ndarray] = None,
    gsum: Optional[jnp.ndarray] = None,
    gsumsq: Optional[jnp.ndarray] = None,
    th: int = 16,
    pad_w_to: Optional[int] = None,
    interpret: bool = False,
    arena_in: bool = False,
    arena_g: bool = False,
    logical_hw: Optional[tuple] = None,
    pre_padded_c: Optional[int] = None,
):
    """dW (3, 3, C, O) f32 for y = conv3x3_same(act_in(x), w), given
    cotangent g.

    x: (N, H, W, C); g: (N, H, W, O).

    pa/pb: optional (C,) float32 per-input-channel affine; when given,
    act_in(x) = relu(pa*x + pb) is recomputed in VMEM on each loaded block
    (matching the forward kernels' prologue) instead of reading a
    materialized activation from HBM.

    pad_w_to: total padded input width (left border + W + right zeros) to
    use instead of the minimal round_up(W,8)+8. Passing the packed forward
    kernel's geometry (conv3x3_packed.padded_width) makes this kernel's
    input pad byte-identical to the forward's, so XLA CSEs the two
    full-resolution pads into one (measured ~1.9 ms/step on CubeNET).
    The extra columns are zeros and contribute nothing to dW.

    arena_in: x is arena-framed (logical (0,0) at (8,8), see conv3x3_packed)
    and read with NO pad pass: 8-aligned windows realigned by a static +7
    shift in the prologue scratch copy (prologue required — the arena's
    borders/garbage must be masked). Logical (h, w) come from g.

    y/gsum/gsumsq ("fold" mode): g is the RAW gy cotangent of a
    stats-collecting conv and y its saved pre-activation output; the kernel
    computes the effective cotangent g_eff = gy + gsum + 2*y*gsumsq (and
    db = sum(g_eff)) in VMEM instead of reading a materialized g_eff.
    Returns (dW, db) instead of dW.

    arena_g: g (and y, in fold mode) is arena-framed; requires logical_hw.
    The +8-offset windows are read raw with the beyond-logical region masked
    in-kernel — no slice pass. Without fold, g is the MATERIALIZED
    arena-framed g_eff (conv_train._bnact_bwd's zero-framed pad, shared with
    the adjoint conv's arena_g read) and its lane width is taken as the
    8-rounded output-channel count.

    pre_padded_c: host-ingest mode (conv3x3_packed pre_padded) — x IS the
    padded buffer the forward consumed raw (logical (0,0) at (1,1), lanes
    zero-extended, zeros beyond logical) and this is its true channel count
    (unreadable from the padded shape); dW slices to it, so the zero pad
    lanes never surface. No pad op runs on either leg; logical (h, w) come
    from g. Mutually exclusive with pad_w_to / the arena modes.
    """
    fold = y is not None
    if fold:
        assert gsum is not None and gsumsq is not None
        assert y.shape == g.shape and y.dtype == g.dtype, (y.shape, g.shape)
    # Arena invariants raise (not assert): a wiring bug here becomes raw
    # out-of-bounds TPU window reads under `python -O`, not a clean error.
    if arena_g and logical_hw is None:
        raise ValueError("arena_g requires logical_hw")
    if arena_in:
        if pa is None:
            raise ValueError("arena_in x requires the masking prologue")
        if pad_w_to is not None:
            raise ValueError("arena_in reads raw — no pad to share")
        n = x.shape[0]
        c = pa.shape[0]
        if arena_g:
            h, width = logical_hw
            # Non-fold arena_g: g is the materialized arena-framed g_eff; its
            # lane width IS the (8-rounded) output-channel count.
            o = gsum.shape[0] if fold else g.shape[-1]
        else:
            gn, h, width, o = g.shape
            assert gn == n, (x.shape, g.shape)
    elif arena_g:
        n, h, width, c = x.shape
        assert (h, width) == tuple(logical_hw), (x.shape, logical_hw)
        o = gsum.shape[0] if fold else g.shape[-1]
        assert g.shape[0] == n, (x.shape, g.shape)
    elif pre_padded_c is not None:
        if arena_in or arena_g or pad_w_to is not None:
            raise ValueError("pre_padded_c is a raw pre-padded read — no "
                             "arena modes, no pad geometry to share")
        n = x.shape[0]
        c = pre_padded_c
        gn, h, width, o = g.shape
        assert gn == n, (x.shape, g.shape)
    else:
        n, h, width, c = x.shape
        gn, gh, gw, o = g.shape
        assert (gn, gh, gw) == (n, h, width), (x.shape, g.shape)
    th = min(th, _round_up(h, 8))

    wo = _round_up(width, 8)
    wb = _round_up(wo + 2, 8)
    if pad_w_to is not None:
        assert pad_w_to >= wb and pad_w_to % 8 == 0, (pad_w_to, wb)
        wb = pad_w_to
    cp = _round_up(c, LANE)
    op = _round_up(o, 8)
    n_chunks = cp // LANE

    prologue = pa is not None
    if pre_padded_c is not None:
        # H windows reach round_up(h, th)+2 rows on the host buffer (whose
        # extent comes from the packed forward's th=8 cover) — shrink th
        # until the cover fits; W needs wb columns, which the forward's
        # n_w*tw+8 extent always covers (n_w*tw >= round_up(w, 8) = wb-8).
        while th > 4 and _round_up(h, th) + 2 > x.shape[1]:
            th //= 2
        if x.shape[1] < _round_up(h, th) + 2 or x.shape[2] < wb:
            raise ValueError(
                f"pre-padded extent {x.shape} < wgrad window cover "
                f"{(_round_up(h, th) + 2, wb)} for logical {(h, width)}")
        if x.shape[-1] < cp:
            raise ValueError(f"pre-padded lanes {x.shape[-1]} < {cp}")
    if arena_in:
        # H windows reach round_up(h, th)+9 rows; the arena's +16 slack
        # covers that only while the tile cover matches the producer's
        # (round_up(h, 8)) — shrink th=16 to 8 on H shapes where the covers
        # diverge. Offsets i*th stay 8-divisible for th in {8, 16}.
        while th > 8 and _round_up(h, th) + 9 > x.shape[1]:
            th //= 2
        if th % 8 != 0:
            raise ValueError(f"arena_in th must be 8-divisible, got {th}")
        # W window is wb+8 = wo+16 (8-divisible per Mosaic's block rule),
        # read from col 0 — the arena's full W extent covers it exactly.
        if x.shape[1] < _round_up(h, th) + 9 or x.shape[2] < wo + 16:
            raise ValueError(
                f"arena extent {x.shape} < wgrad tile cover "
                f"{(_round_up(h, th) + 9, wo + 16)} for logical {(h, width)}")
    if arena_g:
        # g/y windows sit at the +8 arena frame offset (logical row i*th is
        # physical 8+i*th); the tile cover must stay within the producer's
        # extent (+16 slack splits as 8 top border + 8 bottom).
        while th > 8 and _round_up(h, th) > g.shape[1] - 16:
            th //= 2
        if th % 8 != 0:
            raise ValueError(f"arena_g th must be 8-divisible, got {th}")
        if g.shape[1] - 16 < _round_up(h, th) or g.shape[2] < wo + 8:
            raise ValueError(
                f"arena g extent {g.shape} < wgrad tile cover "
                f"{(_round_up(h, th) + 16, wo + 8)} for logical {(h, width)}")
    # O <= 64: fold the three dw taps into the dot's N dimension (N=192)
    # instead of 9 half-lane N=64 dots — see _wgrad_kernel. Needs the x
    # window to span wo+8 columns, which wb always covers (wo is a multiple
    # of 8, so wb = round_up(wo+2, 8) = wo+8).
    dw_pack = op <= _PACK

    def vmem_bytes(th_):
        esz = x.dtype.itemsize
        x_b = 2 * (th_ + 2) * wb * cp * esz
        g_b = 2 * th_ * wo * op * g.dtype.itemsize
        y_b = g_b if fold else 0
        o_b = 9 * cp * op * 4
        z_b = (th_ + 2) * wb * cp * esz if prologue else 0
        r_b = th_ * (wo + 8) * 3 * _PACK * g.dtype.itemsize if dw_pack else 0
        return x_b + g_b + y_b + o_b + z_b + r_b

    while th > (8 if (arena_in or arena_g) else 4) and vmem_bytes(th) > 12 * 1024 * 1024:
        th //= 2

    n_h_blocks = pl.cdiv(h, th)
    if arena_in or pre_padded_c is not None:
        xp = x  # read raw through shifted arena / host pre-padded windows
    else:
        bottom = n_h_blocks * th - h + 1
        # x: 1-px SAME border + bottom/right alignment (zeros). g is consumed
        # raw when its Element windows stay inside the physical (8,128)-tiled
        # extent: W overreads up to round_up(w,8) clamp safely and are masked
        # in-kernel, but whole-row overreads past round_up(h,8) are a hard TPU
        # fault (measured) — so ragged H (or a non-8-multiple channel count)
        # falls back to an explicit zero-pad.
        xp = jnp.pad(x, ((0, 0), (1, bottom), (1, wb - width - 1), (0, cp - c)))
    if arena_g or (n_h_blocks * th == h and op == o):
        gp, yp = g, y
    else:
        gpad = ((0, 0), (0, n_h_blocks * th - h), (0, wo - width), (0, op - o))
        gp = jnp.pad(g, gpad)
        yp = jnp.pad(y, gpad) if fold else None

    grid = (n, n_h_blocks)
    kernel = functools.partial(
        _wgrad_kernel, th=th, wo=wo, h=h, w=width, n_chunks=n_chunks,
        prologue=prologue, dw_pack=dw_pack, arena_x=arena_in, fold=fold,
    )
    flops = 2 * n * h * width * c * o * 9

    if arena_in:
        x_spec = pl.BlockSpec(
            (Element(1), Element(th + 9), Element(wb + 8), Element(x.shape[-1])),
            lambda bn, i: (bn, i * th, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        x_spec = pl.BlockSpec(
            (Element(1), Element(th + 2), Element(wb), Element(cp)),
            lambda bn, i: (bn, i * th, 0, 0),
            memory_space=pltpu.VMEM,
        )
    if arena_g:
        gl = g.shape[-1]
        g_spec = pl.BlockSpec(
            (Element(1), Element(th), Element(wo), Element(gl)),
            lambda bn, i: (bn, (i * (th // 8) + 1) * 8, 8, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        gl = op
        g_spec = pl.BlockSpec(
            (Element(1), Element(th), Element(wo), Element(op)),
            lambda bn, i: (bn, i * th, 0, 0),
            memory_space=pltpu.VMEM,
        )
    in_specs = [x_spec, g_spec]
    operands = [xp, gp]
    scratch_shapes = []
    if fold:
        gsp = jnp.broadcast_to(jnp.pad(gsum.astype(jnp.float32), (0, gl - o)), (8, gl))
        gssp = jnp.broadcast_to(jnp.pad(gsumsq.astype(jnp.float32), (0, gl - o)), (8, gl))
        sspec = pl.BlockSpec((8, gl), lambda bn, i: (0, 0), memory_space=pltpu.VMEM)
        in_specs += [g_spec, sspec, sspec]
        operands += [yp, gsp, gssp]
    if prologue:
        al = x.shape[-1] if arena_in else cp
        pap = jnp.broadcast_to(jnp.pad(pa.astype(jnp.float32), (0, al - c)), (8, al))
        pbp = jnp.broadcast_to(jnp.pad(pb.astype(jnp.float32), (0, al - c)), (8, al))
        cspec = pl.BlockSpec((8, al), lambda bn, i: (0, 0), memory_space=pltpu.VMEM)
        in_specs += [cspec, cspec]
        operands += [pap, pbp]
        scratch_shapes.append(pltpu.VMEM((th + 2, wb, cp), x.dtype))
    dw_spec = pl.BlockSpec(
        (3, 3, cp, op), lambda bn, i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    dw_shape = jax.ShapeDtypeStruct((3, 3, cp, op), jnp.float32)
    if fold:
        out_specs = (
            dw_spec,
            pl.BlockSpec((8, gl), lambda bn, i: (0, 0), memory_space=pltpu.VMEM),
        )
        out_shape = (dw_shape, jax.ShapeDtypeStruct((8, gl), jnp.float32))
    else:
        out_specs, out_shape = dw_spec, dw_shape
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + g.size * g.dtype.itemsize * (2 if fold else 1),
            transcendentals=0,
        ),
        # Arena windows are sublane-unaligned (8-offsets in 16-row bf16
        # tiles), so Mosaic's double-buffer allocation pads past what
        # vmem_bytes models (measured 20.4M at th=8, 608x968x64->64) — the
        # 16M default cap rejects a kernel that fits v5e's 128M VMEM fine.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024)
        if (arena_in or arena_g)
        else None,
        interpret=interpret,
    )(*operands)
    if fold:
        dw, db = out
        return dw[:, :, :c, :o], db[0, :o]
    return out[:, :, :c, :o]
