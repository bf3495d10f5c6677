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
from jax.ad_checkpoint import checkpoint_name

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


#: checkpoint_name tag applied to every SpectralBlock output when
#: ``offload=True``. The trainer's matching remat policy
#: (train/trainer.py:spectral_offload_policy) offloads exactly these values
#: to pinned host memory across the fwd->bwd gap.
OFFLOAD_TAG = "spectral_act"


class SpectralUNET(nn.Module):
    hsi_depth: int = 238
    n_classes: int = 1
    bn_feats: int = 16
    bnorm: bool = True
    remat: bool = False
    fused_bn: bool = False
    #: Host-offloaded rematerialization: tag each block output with
    #: jax.ad_checkpoint.checkpoint_name so an OUTER jax.checkpoint around
    #: the loss (the trainer adds it; spectral_offload_policy) saves those
    #: residuals to pinned_host instead of HBM. This is what lets the full
    #: paper protocol — batch 2, (608,700) crops, bn_feats=1650, where the
    #: ~10 saved (851K, 1650) residuals alone are ~28 GB — train on ONE
    #: 16 GB chip with numerics IDENTICAL to the unchunked/unoffloaded
    #: step (offload moves bytes; recompute re-runs the same fused ops).
    #: The reference needed >=2 GPUs + DeepSpeed ZeRO-2 for this model
    #: (/root/reference/README.md:67-68, src/PLTrainer.py:421-433).
    offload: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.shape[-1] != self.hsi_depth:
            raise ValueError(
                f"SpectralUNET expects {self.hsi_depth} bands (NHWC), got shape {x.shape}"
            )
        n, h, w, d = x.shape
        p = x.astype(self.dtype).reshape(n * h * w, d)

        # offload mode: plain blocks — the outer trainer-side checkpoint
        # owns recompute, per-block remat would only nest redundantly.
        block = nn.remat(SpectralBlock) if (self.remat and not self.offload) else SpectralBlock
        tag = (
            (lambda y: checkpoint_name(y, OFFLOAD_TAG)) if self.offload else (lambda y: y)
        )

        def mk(name):
            return block(
                self.bn_feats, self.bnorm, self.fused_bn, train, dtype=self.dtype, name=name
            )

        x0 = tag(mk("tail")(p))
        x1 = tag(mk("down1")(x0))
        x2 = tag(mk("down2")(x1))
        x3 = tag(mk("down3")(x2))
        x4 = tag(mk("down4")(x3))

        u = tag(mk("up1")(x4))
        u = tag(mk("up2")(u, x3))
        u = tag(mk("up3")(u, x2))
        u = tag(mk("up4")(u, x1))

        # Head: concat kept inside the rematted unit (same residual-memory
        # reason), with the Dense named 'outc' for checkpoint-layout parity.
        outc = nn.Dense(self.n_classes, dtype=self.dtype, name="outc")

        def head(mdl, uu, xx0):
            return mdl(jnp.concatenate([xx0, uu], axis=-1))

        out = (nn.remat(head) if (self.remat and not self.offload) else head)(outc, u, x0)
        return out.astype(jnp.float32).reshape(n, h, w, self.n_classes)
