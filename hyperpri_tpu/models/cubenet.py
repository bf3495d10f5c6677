"""CubeNET: 3D-conv spectral front end + wide (C=128) U-Net body.

Behavioral parity target: /root/reference/src/Experiments/models.py:148-247
(Conv3d(1, first_depth, kernel=(238,3,3), padding=(0,1,1)) collapses the full
spectral depth in one step, reshape to 2D, inc2 Conv+BN+ReLU, then a U-Net at
C=128; 31,178,881 params at hsi_depth=238, first_depth=64, bilinear=False).

TPU-first redesign: a Conv3d over the *entire* depth with no depth padding is
mathematically identical to a 2D 3x3 convolution with `hsi_depth` input
channels — weight[o, 1, d, kh, kw] <-> weight2d[kh, kw, d, o]. In NHWC that is
a single MXU-friendly conv (contraction size 238*9 = 2142), so no 3D
convolution, no reshape, and no wasted depth dimension ever exist on device.

Input:  (N, H, W, hsi_depth) NHWC.
Output: (N, H, W, n_classes) logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from hyperpri_tpu.models.parts import (
    Conv3x3,
    ConvTransposeUp,
    DoubleConv,
    Down,
    OutConv,
    PallasConv3x3,
    TorchBatchNorm,
    Up,
    pad_to_match,
    upsample2x_align_corners,
)


class CubeNET(nn.Module):
    hsi_depth: int = 238
    n_classes: int = 1
    first_depth: int = 64
    bilinear: bool = True
    use_attention: bool = False
    analyze: bool = False
    fused_bn: bool = False  # serving path: consume ops/fold_bn.py trees
    use_pallas: bool = False  # serving path: fused Pallas conv kernels
    pallas_train: bool = False  # trainable Pallas convs at full-res shapes
    spatial_mesh: Any = None  # H-sharded SPMD: explicit halo-exchange convs
    # Host-ingest: logical (h, w) when train batches arrive HOST-pre-padded
    # for the first packed conv (parts.first_conv_ingest_spec geometry) — the
    # ~1.9 ms/step shared fwd/wgrad 238->256 input pad never runs on device.
    # Set only on the train-step clone; init/eval use the plain model.
    ingest_hw: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        if self.ingest_hw is not None and not train:
            raise ValueError("pre-padded ingest is a train-step-only contract")
        if self.ingest_hw is None and x.shape[-1] != self.hsi_depth:
            raise ValueError(
                f"CubeNET expects {self.hsi_depth} bands (NHWC), got shape {x.shape}"
            )
        factor = 2 if self.bilinear else 1
        fd = self.first_depth
        c = 128

        x = x.astype(self.dtype)
        # Spectral collapse: Conv3d(1, fd, (D,3,3), pad (0,1,1)) == 2D conv
        # with D input channels (reference models.py:169).
        if self.fused_bn and self.use_pallas:
            from hyperpri_tpu.models.parts import (
                _packed_serving_route,
                serving_arena_compatible,
            )

            h, w = x.shape[1], x.shape[2]
            # Serving arena chain across first_conv -> inc2 (same fusable
            # boundary shape as DoubleConv's; see parts.py DoubleConv).
            sarena = (
                _packed_serving_route(h, w, self.hsi_depth, fd)
                and _packed_serving_route(h, w, fd, fd)
                and serving_arena_compatible(h, w, self.hsi_depth, fd, fd,
                                             self.dtype)
            )
            x1 = PallasConv3x3(fd, dtype=self.dtype, arena_out=sarena,
                               name="first_conv")(x)
            x1 = PallasConv3x3(fd, dtype=self.dtype,
                               arena_in_hw=(h, w) if sarena else None,
                               name="inc2_conv")(x1)
        else:
            from hyperpri_tpu.models.parts import _packed_train_route, arena_compatible

            want_stats = train and not self.fused_bn
            n = x.shape[0]
            if self.ingest_hw is not None:
                h, w = self.ingest_hw
            else:
                h, w = x.shape[1], x.shape[2]
            # first_conv -> first_bn -> ReLU -> inc2_conv is the same fusable
            # boundary shape as DoubleConv's conv1->bn1->relu->conv2: fold the
            # bn-apply + ReLU into inc2_conv's Pallas prologue and, when the
            # tile covers agree, hand first_conv's raw output over in ARENA
            # geometry (no full-res pad before inc2, no residual slice after
            # first_conv; see ops/pallas/conv3x3_packed).
            arena = (
                want_stats
                and _packed_train_route(h, w, self.hsi_depth, fd,
                                        self.pallas_train, train, self.spatial_mesh)
                and _packed_train_route(h, w, fd, fd,
                                        self.pallas_train, train, self.spatial_mesh)
                and arena_compatible(h, w, self.hsi_depth, fd, fd, self.dtype)
            )
            x1, st = Conv3x3(fd, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="first_conv")(
                x, collect_stats=want_stats, train=train, arena_out=arena,
                pre_padded=(h, w, self.hsi_depth) if self.ingest_hw is not None else None,
            )
            prologue = None
            if not self.fused_bn:
                first_bn = TorchBatchNorm(name="first_bn")
                if train:
                    prologue = first_bn(
                        x1, use_running_average=False, precomputed=st,
                        affine_only=True,
                        count=float(n * h * w) if arena else None,
                        feats=fd if arena else None,
                    )
                else:
                    x1 = first_bn(x1, use_running_average=not train, precomputed=st)
            if prologue is None:
                x1 = nn.relu(x1).astype(self.dtype)
            # inc2: single Conv+BN+ReLU to "match UNET's starter DoubleConv"
            # (reference models.py:176-180).
            x1, st = Conv3x3(fd, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="inc2_conv")(
                x1, collect_stats=want_stats, train=train, prologue=prologue,
                arena_hw=(h, w) if arena else None,
            )
            if not self.fused_bn:
                x1 = TorchBatchNorm(name="inc2_bn")(x1, use_running_average=not train, precomputed=st)
            x1 = nn.relu(x1).astype(self.dtype)

        x2 = Down(c, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = Down(c * 2, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = Down(c * 4, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down3")(x3, train=train)
        x5 = Down(c * 8 // factor, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down4")(x4, train=train)

        y = Up(c * 8, c * 4, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up1")(
            x5, x4, train=train
        )
        y = Up(c * 4, c * 2, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up2")(
            y, x3, train=train
        )
        y = Up(c * 2, c, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up3")(
            y, x2, train=train
        )

        if fd == 64:
            y = Up(c, 64 * factor, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up4")(
                y, x1, train=train
            )
        else:
            # Alternate head for first_depth != 64 (reference models.py:193-199,
            # 229-240): upsample, center-pad, concat [x1, y], DoubleConv -> 64.
            if self.bilinear:
                y = upsample2x_align_corners(y)
                conv4 = DoubleConv(64, 64, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="upconv4")
            else:
                y = ConvTransposeUp(64, dtype=self.dtype, name="upsample4")(y)
                conv4 = DoubleConv(64, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="upconv4")
            y = pad_to_match(y, x1.shape[1], x1.shape[2])
            y = conv4(jnp.concatenate([x1, y], axis=-1), train=train)

        logits = OutConv(self.n_classes, dtype=self.dtype, name="outc")(y, train=train)
        logits = logits.astype(jnp.float32)

        if self.analyze:
            return logits, logits, nn.sigmoid(logits)
        return logits
