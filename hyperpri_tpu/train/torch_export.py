"""Export hyperpri_tpu flax models to PyTorch reference state dicts.

The inverse of train/torch_import.py: given flax (params, batch_stats) trees,
produce a torch state dict keyed exactly like the reference architectures
(src/Experiments/models.py, model_parts.py), so a reference-shaped torch model
can be initialized FROM a flax init. This is the enabling piece of the
training-trajectory parity harness (scripts/parity_train_torch.py): both
frameworks start from bit-identical weights, receive identical batches, and
their loss/BN-stat trajectories are compared step by step.

Layout transforms (each the inverse of torch_import.convert_state_dict):
  flax Conv kernel (kh, kw, I, O)      -> torch Conv2d  (O, I, kh, kw)
  flax Conv kernel (kh, kw, D, O)      -> torch Conv3d  (O, 1, D, kh, kw)
  flax ConvTranspose kernel            -> torch ConvT2d (I, O, kh, kw),
    (kh, kw, I, O), unflipped             spatially flipped
  flax Dense kernel (I, O)             -> torch Linear  (O, I)
  flax BN scale/bias + batch_stats     -> torch BN weight/bias/running_*
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from hyperpri_tpu.train.torch_import import module_map


def _get(tree: Dict[str, Any], path: str) -> Dict[str, Any]:
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _np32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def export_state_dict(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    model_name: str,
    cfg=None,
) -> Dict[str, np.ndarray]:
    """flax (params, batch_stats) -> reference-keyed torch state dict (numpy).

    Keys match the bare-module layout (no 'm_network.' wrapper) the reference
    models produce from `model.state_dict()`; torch_import.normalize_torch_keys
    round-trips the wrapped forms.
    """
    from flax import serialization

    params = serialization.to_state_dict(params)
    batch_stats = serialization.to_state_dict(batch_stats)
    sd: Dict[str, np.ndarray] = {}
    for flax_path, (tprefix, kind) in module_map(model_name, cfg).items():
        if kind == "conv":
            node = _get(params, flax_path)
            sd[f"{tprefix}.weight"] = np.transpose(_np32(node["kernel"]), (3, 2, 0, 1))
            sd[f"{tprefix}.bias"] = _np32(node["bias"])
        elif kind == "conv3d":
            node = _get(params, flax_path)
            w = np.transpose(_np32(node["kernel"]), (3, 2, 0, 1))  # (O, D, kh, kw)
            sd[f"{tprefix}.weight"] = w[:, None]  # (O, 1, D, kh, kw)
            sd[f"{tprefix}.bias"] = _np32(node["bias"])
        elif kind == "convT":
            node = _get(params, flax_path)
            w = _np32(node["kernel"])[::-1, ::-1]  # undo the spatial flip
            sd[f"{tprefix}.weight"] = np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))
            sd[f"{tprefix}.bias"] = _np32(node["bias"])
        elif kind == "linear":
            node = _get(params, flax_path)
            sd[f"{tprefix}.weight"] = np.ascontiguousarray(_np32(node["kernel"]).T)
            sd[f"{tprefix}.bias"] = _np32(node["bias"])
        elif kind == "bn":
            node = _get(params, flax_path)
            stats = _get(batch_stats, flax_path)
            sd[f"{tprefix}.weight"] = _np32(node["scale"])
            sd[f"{tprefix}.bias"] = _np32(node["bias"])
            sd[f"{tprefix}.running_mean"] = _np32(stats["mean"])
            sd[f"{tprefix}.running_var"] = _np32(stats["var"])
            sd[f"{tprefix}.num_batches_tracked"] = np.zeros((), np.int64)
        else:  # pragma: no cover
            raise ValueError(kind)
    return sd


def export_to_torch_module(
    module, params: Dict[str, Any], batch_stats: Dict[str, Any],
    model_name: str, cfg=None,
):
    """Load a flax state into a live torch module (strict=False: tied
    submodules like CubeNET's first_conv-inside-inc alias the same tensors,
    so only one of the duplicate key sets needs to be present)."""
    import torch

    sd = export_state_dict(params, batch_stats, model_name, cfg)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in sd.items()}
    missing, unexpected = module.load_state_dict(tensors, strict=False)
    unexpected = [k for k in unexpected]
    # Every missing key must be an alias of a loaded tensor (e.g. 'inc.0.*'
    # aliases 'first_conv.*'); anything else is a real mapping bug.
    aliased = {"inc.0.weight", "inc.0.bias"}
    leftover = [k for k in missing if k not in aliased]
    if leftover or unexpected:
        raise ValueError(f"state dict mismatch: missing={leftover} unexpected={unexpected}")
    return module


def flax_tuple(state) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """(params, batch_stats) from a TrainState-like object."""
    return state.params, state.batch_stats
