"""U-Net building blocks, TPU-native (Flax linen, NHWC).

Functional parity targets (behavior, not code) from the reference:
/root/reference/src/Experiments/model_parts.py
  - DoubleConv  (model_parts.py:14-31): (Conv3x3 -> BN -> ReLU) * 2
  - Down        (model_parts.py:34-45): MaxPool2 -> DoubleConv
  - Up          (model_parts.py:48-90): upsample (bilinear align-corners or
                ConvTranspose2d k2s2), center-pad to the skip's spatial size,
                concat [skip, x] (or multiplicative attention skip*x), DoubleConv
  - OutConv     (model_parts.py:93-99): 1x1 conv

TPU-first choices:
  - NHWC layout (channels on the 128-wide lane dimension).
  - Convs run in a configurable compute dtype (bf16 by default in training);
    BatchNorm statistics are always computed in float32.
  - Bilinear upsample uses an explicit align_corners=True gather+lerp (torch
    `nn.Upsample(align_corners=True)` semantics differ from jax.image.resize).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (new = 0.9*old + 0.1*batch).
# flax momentum is the decay of the running average -> 0.9.
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# Gate defaults for the trainable Pallas conv route (measured; see Conv3x3).
# Single source of truth: Conv3x3's field defaults and _packed_train_route
# both read these, and the packed-route split is imported from conv_train so
# the wiring predicate can never drift from the route the conv actually takes.
from hyperpri_tpu.ops.pallas.conv_train import _PACKED_LS as PACKED_MAX_O

import os as _os

PALLAS_MIN_PIXELS = 30_000
PALLAS_MIN_CHANNELS = 32
# Deep-tile cutoff for the trainable Pallas route. 256 is the r2-measured
# optimum (512 was neutral then); env-tunable so the balance can be re-probed
# as the rest of the step gets faster (r5: the 152x242 256<->512 convs sit at
# 57 TF/s in XLA's transposed layouts while the halo kernel reached 99 TF/s
# at 76x121x512 per-op).
PALLAS_MAX_CHANNELS = int(_os.environ.get("HYPERPRI_PALLAS_MAX_CHANNELS", "256"))


def _packed_train_route(h, w, c, o, pallas_train, train, spatial_mesh,
                        min_pixels=PALLAS_MIN_PIXELS,
                        min_channels=PALLAS_MIN_CHANNELS,
                        max_channels=PALLAS_MAX_CHANNELS):
    """True iff Conv3x3 would route this layer through the tap-packed
    trainable Pallas kernel (the arena-eligible route). Mirrors Conv3x3's
    use_pallas gate + conv_train._conv_route's O<=64 split."""
    return (
        pallas_train and train and jax.default_backend() == "tpu"
        and spatial_mesh is None
        and h * w >= min_pixels
        and min_channels <= c
        and max(c, o) <= max_channels
        and o <= PACKED_MAX_O
    )


def arena_compatible(h, w, c1, o1, o2, dtype, prologue1=False):
    """True iff a conv1(c1->o1) -> BN+ReLU -> conv2(o1->o2) boundary at
    logical (h, w) can run in arena geometry (ops/pallas/conv3x3_packed):
    the producer's, consumer's, and adjoint's tile covers must agree so the
    arena buffer has one well-defined extent and dx's aval matches conv1's y.
    """
    if o1 > PACKED_MAX_O or o2 > PACKED_MAX_O:
        return False
    from hyperpri_tpu.ops.pallas.conv3x3_packed import arena_extent, fit_tiles

    e1 = arena_extent(h, w, c1, o1, dtype, dtype, prologue=prologue1)
    if e1 is None:
        return False
    # adjoint of conv2 (dx of the fused boundary): c=o2 cotangent channels,
    # o=o1 boundary channels, epilogue-backward residual accounting
    ea = arena_extent(h, w, o2, o1, dtype, dtype, affine_bwd=True)
    if ea != e1:
        return False
    th2, tw2 = fit_tiles(h, w, o1, o2, dtype, dtype, prologue=True, arena_in=True)
    if th2 != 8:
        return False
    # H covers agree by construction (both th are 8 here, so both spans are
    # round_up(h, 8)); only the consumer's W tile cover can exceed the
    # producer's extent.
    return -(-w // tw2) * tw2 <= e1[1]


def first_conv_ingest_spec(h, w, c, o, dtype, pallas_train=True, train=True,
                           spatial_mesh=None):
    """Host-side pre-padded ingest geometry for the network's first packed
    conv (ops/pallas/conv3x3_packed pre_padded): the HOST writes each cube
    into a zeroed (H_pad, W_pad, C_pad) buffer at (row0, col0) = (1, 1) and
    the fwd + wgrad kernels read it raw — the shared full-resolution
    1-px-halo + lane pad (~1.9 ms/step for CubeNET's 238->256 first conv,
    round-3 hlo_stats) never runs on device.

    Returns ((H_pad, W_pad, C_pad), (row0, col0), (h, w, c)), or None when
    the packed route would not fire for this shape (caller must then feed
    logical cubes). The third element records the LOGICAL dims the spec was
    probed with so pipeline.pre_pad_images can reject a batch whose crop
    drifted from them (a smaller crop would embed silently and feed zero
    rows into the first conv's BN statistics — no shape error, no
    recompile). Reproduces conv3x3_packed's own fit_tiles call so the
    geometry can never drift from the kernel's window cover."""
    if not _packed_train_route(h, w, c, o, pallas_train, train, spatial_mesh):
        return None
    from hyperpri_tpu.ops.pallas.conv3x3_packed import fit_tiles

    from hyperpri_tpu.ops.pallas.conv_train import _PACKED_LS

    th, tw = fit_tiles(h, w, c, o, dtype, dtype, lane_stride=_PACKED_LS)
    n_h, n_w = -(-h // th), -(-w // tw)
    c_pad = -(-c // 128) * 128
    return (n_h * th + 2, n_w * tw + 8, c_pad), (1, 1), (h, w, c)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch semantics.

    Differences from flax nn.BatchNorm that matter for parity with the
    reference's BatchNorm1d/2d/3d layers:
      - running_var accumulates the *unbiased* batch variance (n/(n-1))
        while normalization uses the biased one (torch behavior);
      - statistics always computed in float32 regardless of compute dtype.
    Parameter/collection names match nn.BatchNorm ('scale'/'bias' in params,
    'mean'/'var' in batch_stats) so checkpoints and the torch-import bridge
    are layout-compatible.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, use_running_average: bool, precomputed=None,
        affine_only: bool = False, count=None, feats=None,
    ):
        """precomputed: optional (sum, sumsq) per-channel f32 pair over
        N,H,W — batch statistics already reduced inside the producing Pallas
        conv's epilogue (ops/pallas/conv_train.py), skipping the separate
        full-resolution reduction pass here.

        affine_only: update the running statistics but return the folded
        per-channel (A, B) f32 pair with y = A*x + B instead of applying the
        normalization — the consumer fuses the apply (+ ReLU) into its own
        Pallas conv prologue (ops/pallas/conv_train.conv3x3_bnact_stats_train)
        and x never takes the elementwise round trip through HBM.

        count/feats: explicit pixel count and channel count for precomputed
        stats when x is ARENA-framed (bigger than logical, padded lanes —
        see ops/pallas/conv3x3_packed) and its shape would give the wrong
        normalization count."""
        feats = feats if feats is not None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (feats,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feats,), jnp.float32)
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((feats,), jnp.float32))

        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            if count is None:
                count = float(np.prod([x.shape[a] for a in axes]))
            if precomputed is not None:
                psum, psumsq = precomputed
                mean = psum / count
                var = psumsq / count - jnp.square(mean)
            else:
                mean = jnp.mean(x32, axis=axes)
                var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = count
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased

        if affine_only:
            a = scale * jax.lax.rsqrt(var + self.epsilon)
            return a, bias - mean * a
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling with align_corners=True semantics, NHWC.

    Matches torch.nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True): output pixel i samples input coordinate
    i * (in - 1) / (out - 1).
    """
    n, h, w, c = x.shape
    out_h, out_w = 2 * h, 2 * w

    def axis_weights(in_size: int, out_size: int):
        if in_size == 1:
            idx0 = jnp.zeros((out_size,), jnp.int32)
            return idx0, idx0, jnp.zeros((out_size,), x.dtype)
        pos = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i0 = jnp.clip(i0, 0, in_size - 2)
        frac = pos - i0.astype(jnp.float32)
        return i0, i0 + 1, frac.astype(x.dtype)

    h0, h1, hw_ = axis_weights(h, out_h)
    w0, w1, ww_ = axis_weights(w, out_w)

    # Interpolate along H, then W.
    top = jnp.take(x, h0, axis=1)
    bot = jnp.take(x, h1, axis=1)
    xh = top + (bot - top) * hw_[None, :, None, None]
    left = jnp.take(xh, w0, axis=2)
    right = jnp.take(xh, w1, axis=2)
    return left + (right - left) * ww_[None, None, :, None]


def pad_to_match(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Center-pad NHWC `x` spatially to (target_h, target_w).

    Matches the reference's F.pad split (model_parts.py:77-80): left/top get
    floor(diff/2), right/bottom get the remainder.
    """
    diff_y = target_h - x.shape[1]
    diff_x = target_w - x.shape[2]
    if diff_y == 0 and diff_x == 0:
        return x
    return jnp.pad(
        x,
        (
            (0, 0),
            (diff_y // 2, diff_y - diff_y // 2),
            (diff_x // 2, diff_x - diff_x // 2),
            (0, 0),
        ),
    )


class Conv3x3(nn.Module):
    """3x3 SAME conv (+bias) that routes through the trainable fused Pallas
    kernel (ops/pallas/conv_train.py) when `pallas_train` is on, the backend
    is TPU, and the shape is in the regime where XLA's conv lowering
    collapses (full-resolution maps with shallow channels: the hlo_stats
    trace shows XLA spending 2/3 of the CubeNET train step on HBM-bound
    spatial-blocking machinery for exactly these layers).

    Parameter names/shapes are identical to nn.Conv ('kernel' (3,3,C,O),
    'bias' (O,)), so the flag can be toggled on any existing checkpoint.
    """

    features: int
    pallas_train: bool = False
    spatial_mesh: Any = None  # H-sharded SPMD: explicit halo-exchange conv
    min_pixels: int = PALLAS_MIN_PIXELS  # H*W gate: covers the 152x242 stage
    # (in-graph XLA runs those convs at 8.7 TF/s vs ~60 standalone — layout
    # pathology; extending Pallas there measures 114.6 -> 112.9 ms/step)
    min_channels: int = PALLAS_MIN_CHANNELS  # tiny-C convs (UNet RGB stem)
    # waste the 128-lane K
    max_channels: int = PALLAS_MAX_CHANNELS  # deep tiles are MXU-efficient in XLA
    # (512 measured twice in-graph: 102.25/101.48 vs 101.63/100.78 ms — no win;
    # the halo kernel's H-tile collapses to 4-8 rows at cp=512 and its halo
    # re-load overhead cancels the layout-boundary savings)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, collect_stats: bool = False, train: bool = False,
                 prologue=None, arena_out: bool = False, arena_hw=None,
                 pre_padded=None):
        """Returns (y, stats) where stats is a (sum, sumsq) f32 pair of
        per-channel BatchNorm batch statistics when `collect_stats` and the
        Pallas path is active (computed in the kernel epilogue), else None —
        the caller passes it to TorchBatchNorm(precomputed=...).

        prologue: optional per-input-channel (A, B) f32 pair; the conv then
        computes conv(relu(A*x + B), w) + b — the previous BatchNorm-apply +
        ReLU fused into this conv's Pallas input load (DoubleConv wires it).
        Routes that can't fuse it apply the affine in XLA first (identical
        numerics, one extra elementwise pass).

        Arena geometry (ops/pallas/conv3x3_packed; DoubleConv wires it when
        arena_compatible): arena_out returns y ARENA-framed so the fused
        consumer reads it with no pad/slice pass; arena_hw=(h, w) declares
        this conv's input x as arena-framed with that logical extent
        (requires prologue — the arena's garbage is masked in-kernel). The
        caller must only set these when the packed Pallas route is certain.

        Routing (measured, scripts/bench_conv_kernels.py on v5e):
          - train: all gated full-res shapes -> Pallas (XLA's training-graph
            spatial blocking collapses there); O<=64 layers take the
            tap-packed kernel, wider ones the halo kernel;
          - eval: XLA (whole-model measurement; see use_packed_eval below)."""
        if arena_hw is not None:
            if prologue is None:
                raise ValueError("arena input needs the masking prologue")
            c = prologue[0].shape[-1]
            h_log, w_log = arena_hw
        elif pre_padded is not None:
            # Host-ingest conv (first_conv_ingest_spec): x is the pre-padded
            # buffer; logical (h, w) and the true channel count are declared
            # by the caller (unreadable from the padded shape).
            if prologue is not None or arena_hw is not None:
                raise ValueError("pre-padded ingest is the bare first conv")
            h_log, w_log, c = pre_padded
        else:
            c = x.shape[-1]
            h_log, w_log = x.shape[1], x.shape[2]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        shape_ok = (
            h_log * w_log >= self.min_pixels
            and self.min_channels <= c
            and max(c, self.features) <= self.max_channels
        )
        on_tpu = jax.default_backend() == "tpu"
        # A bare pallas_call cannot be GSPMD-partitioned: under a mesh the
        # kernel must go through the shard_map route below, never this flag.
        use_pallas = (
            self.pallas_train and train and on_tpu and shape_ok
            and self.spatial_mesh is None
        )
        if arena_out or arena_hw is not None:
            # wiring (DoubleConv/_fused_single_boundary) only requests arena
            # when the packed trainable route is certain; raise (not assert)
            # so a miswire fails cleanly even under `python -O`
            if not (use_pallas and self.features <= PACKED_MAX_O):
                raise ValueError(
                    f"arena requested off the packed route: use_pallas={use_pallas}, "
                    f"features={self.features}, arena_out={arena_out}, arena_hw={arena_hw}")
            if not (collect_stats and (arena_hw is None or prologue is not None)):
                raise ValueError("arena conv requires collect_stats and a masking prologue")
        # Mesh ingest (VERDICT r4 weak #5): under a DATA-PARALLEL-only mesh
        # each shard holds the full (H_pad, W_pad) plane, so the per-shard
        # kernel geometry equals the single-chip one and the shard_map route
        # (conv3x3_spatial) reads the pre-padded buffer raw.
        from hyperpri_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS

        mesh_ingest = (
            pre_padded is not None
            and self.spatial_mesh is not None
            and self.spatial_mesh.shape.get(SPATIAL_AXIS, 1) == 1
            and shape_ok and self.pallas_train and train
            and self.features <= PACKED_MAX_O
            # same shard-divisibility conditions as the mesh route below —
            # without them a non-divisible batch would slip past the miswire
            # guard and feed the padded buffer to the plain XLA conv
            and x.shape[0] % self.spatial_mesh.shape.get(DATA_AXIS, 1) == 0
            and x.shape[1] % self.spatial_mesh.shape.get(SPATIAL_AXIS, 1) == 0
        )
        if pre_padded is not None and not mesh_ingest and not (
            use_pallas and collect_stats and self.features <= PACKED_MAX_O
        ):
            # wiring (first_conv_ingest_spec) only pre-pads when the packed
            # stats route is certain; raise so a miswire never feeds a padded
            # buffer to the XLA conv as if it were the logical cube
            raise ValueError(
                f"pre-padded ingest off the packed stats route: "
                f"use_pallas={use_pallas}, collect_stats={collect_stats}, "
                f"features={self.features}")
        # Eval stays on XLA: the tap-packed kernel wins per-op at C>64/O<=64
        # (first conv 7.2 vs 10.9 ms) but measured SLOWER composed into the
        # batch-1 serving graph (38.7 vs 60.0 cubes/s whole-model) — XLA's
        # pure-forward fusion is its best case. The per-conv eval-routing
        # experiment lives in scripts/bench_conv_kernels.py; see BENCHMARKS.md.
        x = x.astype(self.dtype)
        fuse_prologue = (
            prologue is not None and use_pallas and collect_stats
        )
        if prologue is not None and not fuse_prologue:
            # Fallback: apply the BN-affine + ReLU here (same math the fused
            # kernel prologue would compute; one XLA elementwise pass).
            pa, pb = prologue
            x = jnp.maximum(x.astype(jnp.float32) * pa + pb, 0.0).astype(self.dtype)
        if self.spatial_mesh is not None and shape_ok and (
            x.shape[1] % self.spatial_mesh.shape["spatial"] == 0
            # shard_map needs equal shards on every mapped axis; batch-1
            # tracing (param init) under a data>1 mesh falls through to the
            # XLA conv (identical params, GSPMD handles the replicated init).
            and x.shape[0] % self.spatial_mesh.shape["data"] == 0
        ):
            # Mesh route (SURVEY 5.7): shard_map with explicit ppermute halo
            # exchange over 'spatial', running the Pallas kernel per shard in
            # training on TPU. Spatially-sharded meshes always take it (the
            # GSPMD fallback is involuntary full rematerialization);
            # data-parallel-only meshes take it only when it buys the Pallas
            # training kernel — XLA's conv partitions fine over batch alone.
            spatial_n = self.spatial_mesh.shape["spatial"]
            if spatial_n > 1 or (self.pallas_train and train):
                from hyperpri_tpu.parallel.spatial_conv import conv3x3_spatial

                return (
                    conv3x3_spatial(
                        x, kernel.astype(self.dtype), bias, self.spatial_mesh,
                        train=train and self.pallas_train,
                        pre_padded_hw=(h_log, w_log) if mesh_ingest else None,
                    ),
                    None,
                )
        if use_pallas:
            from hyperpri_tpu.ops.pallas.conv_train import (
                conv3x3_bias_stats_train,
                conv3x3_bias_train,
                conv3x3_bnact_stats_train,
            )

            if fuse_prologue:
                pa, pb = prologue
                y, s, ss = conv3x3_bnact_stats_train(
                    x, pa, pb, kernel.astype(self.dtype), bias.astype(jnp.float32),
                    False, arena_hw,
                )
                return y, (s, ss)
            if collect_stats:
                y, s, ss = conv3x3_bias_stats_train(
                    x, kernel.astype(self.dtype), bias.astype(jnp.float32),
                    False, arena_out,
                    (h_log, w_log) if pre_padded is not None else None,
                )
                return y, (s, ss)
            return (
                conv3x3_bias_train(x, kernel.astype(self.dtype), bias.astype(jnp.float32)),
                None,
            )
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dtype),
            (1, 1),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype), None


@jax.custom_vjp
def _conv_transpose_2x2(x, k):
    return jax.lax.conv_transpose(
        x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _ct_fwd(x, k):
    return _conv_transpose_2x2(x, k), (x, k)


def _ct_bwd(res, g):
    x, k = res
    # dX: a plain stride-2 conv of the cotangent with the flipped,
    # channel-transposed kernel. XLA's own conv_transpose VJP instead emits
    # a full-resolution `reverse` + dilated conv (2.8 ms at 608x968 in the
    # CubeNET step trace); the strided conv form avoids the reverse pass.
    kp = jnp.transpose(k[::-1, ::-1], (0, 1, 3, 2))
    dx = jax.lax.conv_general_dilated(
        g, kp, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    # dK: reshape-einsum form. XLA's own conv_transpose kernel-gradient emits
    # a full-resolution `reverse` (2.8 ms at 608x968x64 in the train-step
    # trace) + dilated conv; splitting g's even/odd rows+cols by a reshape
    # turns it into one multi-dim dot_general with no reverse. (A previous
    # STRIDED-SLICE matmul form hard-crashed the TPU worker — see git
    # history; the reshape lowering avoids strided slices entirely.)
    # dk[di,dj,c,o] = sum_{n,i,j} x[n,i,j,c] * g[n, 2i+1-di, 2j+1-dj, o]
    n, hh, ww, _ = x.shape
    o = g.shape[-1]
    g6 = g.reshape(n, hh, 2, ww, 2, o)
    dk = jax.lax.dot_general(
        x, g6,
        dimension_numbers=(((0, 1, 2), (0, 1, 3)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (c, r, s, o)
    dk = dk.transpose(1, 2, 0, 3)[::-1, ::-1]
    return dx.astype(x.dtype), dk.astype(k.dtype)


_conv_transpose_2x2.defvjp(_ct_fwd, _ct_bwd)


class ConvTransposeUp(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (2,2), strides=(2,2), VALID)
    with a custom backward (see _ct_bwd). Forward is XLA's conv_transpose
    (it fuses well); parameter names/shapes identical to nn.ConvTranspose."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        y = _conv_transpose_2x2(x, kernel.astype(self.dtype))
        return (y + bias.astype(self.dtype)).astype(self.dtype)


class ConvTranspose2x2(nn.Module):
    """ConvTranspose2d(kernel=2, stride=2) as a matmul + depth-to-space.

    Replaces nn.ConvTranspose for the decoder upsamples (reference
    model_parts.py:63: nn.ConvTranspose2d(in, in//2, kernel_size=2, stride=2)).
    A k2s2 transposed conv has non-overlapping output blocks, so it is exactly
    one (N*H*W, C) x (C, 4*O) matmul followed by a pixel-shuffle reshape:

        out[n, 2i+di, 2j+dj, o] = sum_c x[n,i,j,c] * kernel[1-di, 1-dj, c, o]

    (kernel flip empirically pinned against flax nn.ConvTranspose and torch,
    tests/test_torch_parity.py). In *isolation* this form wins big on TPU:
    the input-dilation backward at 304x484 measures 5.9 ms vs 2.3 ms for the
    matmul (scripts/profile_ops.py). In the full CubeNET train step it LOSES
    (178 vs 167 ms measured): the depth-to-space transpose materializes a
    full-resolution HBM shuffle that XLA fused away in the dilated-conv
    lowering. Kept (with parity test) as the building block for a future
    fused upsample+concat kernel; the models use nn.ConvTranspose.
    Parameter names/shapes are identical to nn.ConvTranspose
    ('kernel' (2,2,C,O), 'bias' (O,)), so checkpoints are interchangeable.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        o = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, c, o), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (o,), jnp.float32)
        n, h, w, _ = x.shape
        k = kernel[::-1, ::-1].astype(self.dtype)  # flip: see docstring
        km = jnp.transpose(k, (2, 0, 1, 3)).reshape(c, 4 * o)
        y = jax.lax.dot_general(
            x.reshape(n * h * w, c),
            km,
            dimension_numbers=(((1,), (0,)), ((), ())),
        )
        y = (
            y.reshape(n, h, w, 2, 2, o)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, 2 * h, 2 * w, o)
        )
        return (y + bias.astype(self.dtype)).astype(self.dtype)


SERVING_MIN_PIXELS = 140_000


def _packed_serving_route(h, w, c, o, min_pixels=SERVING_MIN_PIXELS):
    """True iff PallasConv3x3 routes this layer through the packed kernel."""
    return (
        jax.default_backend() == "tpu"
        and h * w >= min_pixels
        and c >= 33
        and o <= 64
    )


def serving_arena_compatible(h, w, c1, o1, o2, dtype):
    """True iff the serving conv1(c1->o1, relu) -> conv2(o1->o2) pair at
    logical (h, w) can chain in arena geometry: conv1 writes its ACTIVATED
    output arena-framed (arena_out) and conv2 reads it through the masked
    raw-arena window path (arena_g — garbage frames zeroed in-kernel), so
    the slice after conv1 and the full-res 128-lane pad before conv2 never
    exist. Simpler than the training arena: no stats, no prologue, no
    backward."""
    if o1 > PACKED_MAX_O or o2 > PACKED_MAX_O:
        return False
    from hyperpri_tpu.ops.pallas.conv3x3_packed import arena_extent, fit_tiles

    e1 = arena_extent(h, w, c1, o1, dtype, dtype)  # fwd, no prologue
    if e1 is None:
        return False
    th2, tw2 = fit_tiles(h, w, o1, o2, dtype, dtype, prologue=True,
                         arena_in=True)
    if th2 != 8:
        return False
    return -(-w // tw2) * tw2 <= e1[1]


class PallasConv3x3(nn.Module):
    """3x3 SAME conv + bias (+ReLU), serving path (BN already folded).

    Routes each layer to the fastest measured implementation on v5e
    (scripts/bench_conv_kernels.py): the tap-packed Pallas kernel
    (ops/pallas/conv3x3_packed.py) for large maps with C > 64 and O <= 128
    (where XLA's conv underuses the MXU lanes), XLA's fused conv+bias+relu
    everywhere else (its pure-forward fusion is unbeatable at deep tiles
    and 64-channel inputs). Parameter layout identical to nn.Conv, so
    checkpoints and fold_bn trees are interchangeable with the XLA path.
    `force_pallas` pins the halo kernel (ops/pallas/conv3x3.py) for every
    shape — the all-custom-kernel configuration kept for benchmarking.

    arena_out / arena_in_hw: serving arena chain (serving_arena_compatible) —
    this conv writes its activated output arena-framed / reads an
    arena-framed input with logical extent (h, w). Packed route only; the
    caller must have checked the route and extent agreement."""

    features: int
    relu: bool = True
    force_pallas: bool = False
    min_pixels: int = SERVING_MIN_PIXELS
    arena_out: bool = False
    arena_in_hw: Optional[tuple] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.arena_in_hw is not None:
            h_log, w_log = self.arena_in_hw
            c = x.shape[-1]  # arena lane width == conv input channels
        else:
            h_log, w_log = x.shape[1], x.shape[2]
            c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c, self.features), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        on_tpu = jax.default_backend() == "tpu"
        x = x.astype(self.dtype)
        if self.force_pallas:
            from hyperpri_tpu.ops.pallas.conv3x3 import conv3x3_bias_act

            return conv3x3_bias_act(
                x, kernel.astype(self.dtype), bias.astype(jnp.float32),
                relu=self.relu, out_dtype=self.dtype, interpret=not on_tpu,
            )
        # Route EVERY qualifying narrow-output conv through the packed kernel,
        # including 64->64 where XLA wins in isolation (3.1 vs 3.9 ms): the
        # serving-graph trace (scripts/trace_infer.py) shows in-graph XLA
        # full-res convs pick transposed layouts ({3,0,2,1:T(2,128)}) and pay
        # ~0.5-0.7 ms conversion copies at every Pallas boundary — keeping
        # the whole full-resolution region in one layout regime wins
        # (packed 128->64 measures 0.81 ms in-graph at batch 1 vs 2.7-3.5 ms
        # for the XLA layout-converted equivalent).
        packed_wins = _packed_serving_route(h_log, w_log, c, self.features,
                                            self.min_pixels)
        if (self.arena_out or self.arena_in_hw is not None) and not packed_wins:
            raise ValueError(
                f"serving arena requested off the packed route: "
                f"c={c}, o={self.features}, hw={(h_log, w_log)}")
        if packed_wins:
            from hyperpri_tpu.ops.pallas.conv3x3_packed import conv3x3_packed

            return conv3x3_packed(
                x, kernel.astype(self.dtype), bias.astype(jnp.float32),
                relu=self.relu, out_dtype=self.dtype, lane_stride=64,
                arena_out=self.arena_out,
                arena_g=self.arena_in_hw is not None,
                logical_hw=self.arena_in_hw,
            )
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(self.dtype)
        return jnp.maximum(y, 0.0) if self.relu else y


class DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) * 2. Reference: model_parts.py:14-31.

    Serving path: with fused_bn (BN folded by ops/fold_bn.py) and use_pallas,
    each half runs as one fused Pallas conv+bias+ReLU kernel."""

    out_channels: int
    mid_channels: Optional[int] = None
    fused_bn: bool = False  # inference path: BN folded into conv (ops/fold_bn.py)
    use_pallas: bool = False
    pallas_train: bool = False  # trainable Pallas convs at full-res shapes
    spatial_mesh: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        mid = self.mid_channels if self.mid_channels is not None else self.out_channels
        if self.fused_bn and self.use_pallas:
            # Serving arena chain: conv1 writes its activated output
            # arena-framed and conv2 reads it in place — no slice/pad pass
            # between the two packed kernels (serving_arena_compatible).
            n, h, w, c_in = x.shape
            sarena = (
                _packed_serving_route(h, w, c_in, mid)
                and _packed_serving_route(h, w, mid, self.out_channels)
                and serving_arena_compatible(h, w, c_in, mid,
                                             self.out_channels, self.dtype)
            )
            x = PallasConv3x3(mid, dtype=self.dtype, arena_out=sarena,
                              name="conv1")(x)
            return PallasConv3x3(self.out_channels, dtype=self.dtype,
                                 arena_in_hw=(h, w) if sarena else None,
                                 name="conv2")(x)
        want_stats = train and not self.fused_bn
        n, h, w, c_in = x.shape
        # Arena geometry: when BOTH convs take the tap-packed trainable
        # Pallas route and their tile covers agree, conv1 emits its raw
        # output ARENA-framed and conv2 (fwd, dW, and the backward epilogue)
        # reads it in place — the full-resolution pad before conv2 and the
        # residual slice after conv1 never exist (TODO.md arena design;
        # ops/pallas/conv3x3_packed docstring).
        arena = (
            want_stats
            and _packed_train_route(h, w, c_in, mid, self.pallas_train, train,
                                    self.spatial_mesh)
            and _packed_train_route(h, w, mid, self.out_channels,
                                    self.pallas_train, train, self.spatial_mesh)
            and arena_compatible(h, w, c_in, mid, self.out_channels, self.dtype)
        )
        x, st = Conv3x3(
            mid,
            pallas_train=self.pallas_train,
            spatial_mesh=self.spatial_mesh,
            dtype=self.dtype,
            name="conv1",
        )(x, collect_stats=want_stats, train=train, arena_out=arena)
        prologue = None
        if not self.fused_bn:
            bn1 = TorchBatchNorm(name="bn1")
            if train:
                # Fold bn1-apply + ReLU into conv2's kernel prologue — the
                # activated mid tensor never takes an HBM round trip. Stats
                # come from conv1's Pallas epilogue when it took that route
                # (st), else bn1 reduces them in XLA; either way the affine
                # is exact and Conv3x3 falls back to an XLA relu(pa*x+pb)
                # pass (identical numerics) whenever conv2 itself can't
                # fuse. This covers boundaries whose conv1 is gated off the
                # Pallas path (e.g. UNET inc: 3 input channels) but whose
                # conv2 is full-res Pallas.
                prologue = bn1(
                    x, use_running_average=False, precomputed=st, affine_only=True,
                    count=float(n * h * w) if arena else None,
                    feats=mid if arena else None,
                )
            else:
                x = bn1(x, use_running_average=not train, precomputed=st)
        if prologue is None:
            x = nn.relu(x).astype(self.dtype)
        x, st = Conv3x3(
            self.out_channels,
            pallas_train=self.pallas_train,
            spatial_mesh=self.spatial_mesh,
            dtype=self.dtype,
            name="conv2",
        )(x, collect_stats=want_stats, train=train, prologue=prologue,
          arena_hw=(h, w) if arena else None)
        if not self.fused_bn:
            x = TorchBatchNorm(name="bn2")(x, use_running_average=not train, precomputed=st)
        return nn.relu(x).astype(self.dtype)


class Down(nn.Module):
    """MaxPool(2) -> DoubleConv. Reference: model_parts.py:34-45.

    Pooling uses VALID padding (floor on odd sizes), matching torch
    nn.MaxPool2d(2) — e.g. 121 -> 60.
    """

    out_channels: int
    fused_bn: bool = False
    use_pallas: bool = False
    pallas_train: bool = False
    spatial_mesh: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        from hyperpri_tpu.ops.pool import max_pool_2x2

        x = max_pool_2x2(x)
        return DoubleConv(
            self.out_channels,
            fused_bn=self.fused_bn,
            use_pallas=self.use_pallas,
            pallas_train=self.pallas_train,
            spatial_mesh=self.spatial_mesh,
            dtype=self.dtype,
            name="conv",
        )(x, train=train)


class Up(nn.Module):
    """Upsample -> center-pad -> merge with skip -> DoubleConv.

    Reference: model_parts.py:48-90. `in_channels` is the channel count of the
    *deeper* input x1 (needed to reproduce the reference's channel arithmetic,
    including the bilinear=True quirk at model_parts.py:57-61).
    Merge is concat([skip, x], channel axis) or skip*x when use_attention.
    """

    in_channels: int
    out_channels: int
    bilinear: bool = True
    use_attention: bool = False
    fused_bn: bool = False
    use_pallas: bool = False
    pallas_train: bool = False
    spatial_mesh: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.bilinear:
            x1 = upsample2x_align_corners(x1)
            # Reference: DoubleConv(in, out//2, mid=in//2) (attention variant
            # DoubleConv(in//2, out//2, mid=in//2)); input channels are
            # inferred from the merge below, so one module covers both.
            conv = DoubleConv(
                self.out_channels // 2,
                self.in_channels // 2,
                fused_bn=self.fused_bn,
                use_pallas=self.use_pallas,
                pallas_train=self.pallas_train,
                spatial_mesh=self.spatial_mesh,
                dtype=self.dtype,
                name="conv",
            )
        else:
            x1 = ConvTransposeUp(self.in_channels // 2, dtype=self.dtype, name="up")(x1)
            conv = DoubleConv(
                self.out_channels,
                fused_bn=self.fused_bn,
                use_pallas=self.use_pallas,
                pallas_train=self.pallas_train,
                spatial_mesh=self.spatial_mesh,
                dtype=self.dtype,
                name="conv",
            )

        x1 = pad_to_match(x1, x2.shape[1], x2.shape[2])
        if self.use_attention:
            x = x2 * x1
        else:
            x = jnp.concatenate([x2, x1], axis=-1)
        return conv(x, train=train)


class _FlatHead(nn.Module):
    """1x1 conv with out_channels=1, computed as a channel contraction to a
    rank-3 (N, H, W) tensor, then re-expanded.

    Why not nn.Conv: a full-resolution (N, H, W, 1) conv output forces XLA
    into a bad corner — the natural T(8,128) layout pads the size-1 channel
    128x, so layout assignment picks a transposed {3,0,2,1:T(2,128)} layout
    instead, and the fused head+loss computation then runs at 24 GiB/s
    (6.1 ms of the 113 ms CubeNET train step, hlo_stats). Contracting to
    rank-3 keeps every full-res tensor in the dense (8,128)-tiled layout;
    the trailing [..., None] cancels against the loss path's squeeze.

    Training-graph only: the pure-forward serving graph measures FASTER with
    the plain nn.Conv head (60.3 vs 42.2 cubes/s — XLA fuses the conv head
    into the final DoubleConv there, and the layout pathology above is
    specific to the value+grad graph). Parameter names/shapes match nn.Conv
    ('kernel' (1,1,C,1), 'bias' (1,)), so checkpoints are interchangeable."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (1, 1, c, 1), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (1,), jnp.float32)
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            kernel.reshape(c).astype(self.dtype),
            dimension_numbers=(((3,), (0,)), ((), ())),
        )  # (N, H, W)
        return (y + bias.astype(self.dtype))[..., None]


class OutConv(nn.Module):
    """1x1 conv head. Reference: model_parts.py:93-99."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if self.out_channels == 1 and train:
            return _FlatHead(dtype=self.dtype, name="conv")(x)
        return nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv")(x)
