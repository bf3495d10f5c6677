"""SpectralUNET: per-pixel spectral MLP with U-Net-style skip concats.

Behavioral parity target: /root/reference/src/Experiments/models.py:71-145
(5 down + 4 up Linear+BN1d+ReLU blocks, all `bn_feats` wide, skip concats,
Linear(2*bn_feats -> n_classes) head; 30,388,051 params at hsi_depth=238,
bn_feats=1650).

TPU-first redesign: the reference rasterizes each cube to (H*W, 238) rows and
loops over the batch in Python (models.py:132). Here the whole batch is one
(N*H*W, C) tensor, so every layer is a single large MXU matmul. BatchNorm
statistics are taken over all pixels of the batch jointly (the reference takes
them per image because of its Python loop; at eval time both use running
averages, so inference semantics are identical).

Input:  (N, H, W, hsi_depth) NHWC.
Output: (N, H, W, n_classes) logits.

Memory note: at full 608x968 resolution the (N*H*W, 1650) activations are the
reason the reference needed DeepSpeed ZeRO-2 over 2 GPUs. The TPU answer is
spatial sharding of the pixel axis across the mesh (see
hyperpri_tpu/parallel) plus optional remat of each block (`remat=True`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from hyperpri_tpu.models.parts import TorchBatchNorm


class SpectralBlock(nn.Module):
    """Linear -> [BN1d] -> ReLU. Reference: models.py:105-115 (_basic_module).

    `train` is a module attribute (not a call argument) so the block can be
    rematerialized with nn.remat without static-argnum plumbing — attributes
    are always static under lifted transforms.
    """

    feats: int
    bnorm: bool = True
    fused_bn: bool = False
    train: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if skip is not None:
            # Concat *inside* the (possibly rematted) unit: under remat only
            # the two halves are saved as residuals, never the doubled-width
            # concat buffer — the difference between SpectralUNET training
            # fitting in one chip's HBM or not at full resolution.
            x = jnp.concatenate([skip, x], axis=-1)
        x = nn.Dense(self.feats, dtype=self.dtype, name="linear")(x)
        if self.bnorm and not self.fused_bn:
            x = TorchBatchNorm(name="bn")(x, use_running_average=not self.train)
        return nn.relu(x).astype(self.dtype)


class SpectralUNET(nn.Module):
    hsi_depth: int = 238
    n_classes: int = 1
    bn_feats: int = 16
    bnorm: bool = True
    remat: bool = False
    fused_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.shape[-1] != self.hsi_depth:
            raise ValueError(
                f"SpectralUNET expects {self.hsi_depth} bands (NHWC), got shape {x.shape}"
            )
        n, h, w, d = x.shape
        p = x.astype(self.dtype).reshape(n * h * w, d)

        block = nn.remat(SpectralBlock) if self.remat else SpectralBlock

        def mk(name):
            return block(
                self.bn_feats, self.bnorm, self.fused_bn, train, dtype=self.dtype, name=name
            )

        x0 = mk("tail")(p)
        x1 = mk("down1")(x0)
        x2 = mk("down2")(x1)
        x3 = mk("down3")(x2)
        x4 = mk("down4")(x3)

        u = mk("up1")(x4)
        u = mk("up2")(u, x3)
        u = mk("up3")(u, x2)
        u = mk("up4")(u, x1)

        # Head: concat kept inside the rematted unit (same residual-memory
        # reason), with the Dense named 'outc' for checkpoint-layout parity.
        outc = nn.Dense(self.n_classes, dtype=self.dtype, name="outc")

        def head(mdl, uu, xx0):
            return mdl(jnp.concatenate([xx0, uu], axis=-1))

        out = (nn.remat(head) if self.remat else head)(outc, u, x0)
        return out.astype(jnp.float32).reshape(n, h, w, self.n_classes)
