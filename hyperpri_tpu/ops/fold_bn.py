"""Inference-time BatchNorm folding (model surgery for the serving path).

At eval, BN is the affine y = (x - mean) / sqrt(var + eps) * scale + bias.
For a conv/dense layer feeding a BN, that affine folds into the layer's
kernel and bias:

    k' = k * (scale / sqrt(var + eps))        (broadcast on out-channels)
    b' = (b - mean) * scale / sqrt(var + eps) + bias

Folding removes every BN elementwise chain (and its f32 upcasts) from the
inference graph: DoubleConv becomes conv -> relu -> conv -> relu. Models
built with `fused_bn=True` consume the folded tree produced here; training
checkpoints stay in unfolded form.

Pairing is by the naming convention used across hyperpri_tpu.models:
conv1->bn1, conv2->bn2, first_conv->first_bn, inc2_conv->inc2_bn, linear->bn.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from hyperpri_tpu.models.parts import BN_EPS

_PAIRS = {
    "conv1": "bn1",
    "conv2": "bn2",
    "first_conv": "first_bn",
    "inc2_conv": "inc2_bn",
    "linear": "bn",
}


def _fold_leaf(conv: Dict[str, Any], bn_p: Dict[str, Any], bn_s: Dict[str, Any], eps: float):
    scale = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    kernel = conv["kernel"] * scale  # out-channels are the trailing axis
    bias = (conv.get("bias", 0.0) - bn_s["mean"]) * scale + bn_p["bias"]
    return {"kernel": kernel.astype(conv["kernel"].dtype), "bias": bias.astype(jnp.float32)}


def fold_batch_norm(params: Dict[str, Any], batch_stats: Dict[str, Any], eps: float = BN_EPS):
    """Return a params tree for the `fused_bn=True` model variant."""

    def walk(p_node: Dict[str, Any], s_node: Dict[str, Any]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for name, child in p_node.items():
            if not isinstance(child, dict):
                out[name] = child
                continue
            bn_name = _PAIRS.get(name)
            if bn_name is not None and bn_name in p_node:
                out[name] = _fold_leaf(child, p_node[bn_name], s_node[bn_name], eps)
            elif name in _PAIRS.values() and any(
                _PAIRS.get(c) == name for c in p_node
            ):
                continue  # consumed by its conv partner
            else:
                out[name] = walk(child, s_node.get(name, {}))
        return out

    return walk(params, batch_stats)
