"""Losses. Parity target: torch.nn.BCEWithLogitsLoss as used by the reference
(src/Experiments/params_HyperPRI.py:60,223; src/PLTrainer.py:86)."""

from __future__ import annotations

import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray, reduction: str = "mean"):
    """Numerically stable binary cross-entropy on logits.

    loss = max(x, 0) - x*z + log(1 + exp(-|x|)), elementwise — identical to
    torch.nn.BCEWithLogitsLoss. `targets` may be any float/int array of the
    same shape; it is cast to the logits dtype.
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")
