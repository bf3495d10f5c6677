"""Classic 2D U-Net for RGB root segmentation, TPU-native (NHWC, Flax).

Behavioral parity target: /root/reference/src/Experiments/models.py:23-68
(widths 64->128->256->512->1024, binary logit head; 31,043,521 params at
n_channels=3, bilinear=False, n_classes=1).

Input:  (N, H, W, n_channels) NHWC.
Output: (N, H, W, n_classes) logits.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from hyperpri_tpu.models.parts import DoubleConv, Down, OutConv, Up


class UNet(nn.Module):
    n_channels: int = 3
    n_classes: int = 1
    bilinear: bool = True
    use_attention: bool = False
    analyze: bool = False
    fused_bn: bool = False  # serving path: consume ops/fold_bn.py trees
    use_pallas: bool = False  # serving path: fused Pallas conv kernels
    pallas_train: bool = False  # trainable Pallas convs at full-res shapes
    spatial_mesh: Any = None  # H-sharded SPMD: explicit halo-exchange convs
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False):
        if x.shape[-1] != self.n_channels:
            raise ValueError(
                f"UNet expects {self.n_channels} input channels (NHWC), got shape {x.shape}"
            )
        factor = 2 if self.bilinear else 1
        c = 64  # starter_dim

        x = x.astype(self.dtype)
        x1 = DoubleConv(c, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="inc")(x, train=train)
        x2 = Down(c * 2, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down1")(x1, train=train)
        x3 = Down(c * 4, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down2")(x2, train=train)
        x4 = Down(c * 8, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down3")(x3, train=train)
        x5 = Down(c * 16 // factor, fused_bn=self.fused_bn, use_pallas=self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="down4")(x4, train=train)

        y = Up(c * 16, c * 8, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up1")(
            x5, x4, train=train
        )
        y = Up(c * 8, c * 4, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up2")(
            y, x3, train=train
        )
        y = Up(c * 4, c * 2, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up3")(
            y, x2, train=train
        )
        y = Up(c * 2, c * factor, self.bilinear, self.use_attention, self.fused_bn, self.use_pallas, pallas_train=self.pallas_train, spatial_mesh=self.spatial_mesh, dtype=self.dtype, name="up4")(
            y, x1, train=train
        )
        logits = OutConv(self.n_classes, dtype=self.dtype, name="outc")(y, train=train)
        logits = logits.astype(jnp.float32)

        if self.analyze:
            # Reference models.py:65-68 returns (logits, logits, sigmoid).
            return logits, logits, nn.sigmoid(logits)
        return logits
