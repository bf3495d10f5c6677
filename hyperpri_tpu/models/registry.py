"""Model factory and naming, mirroring the reference registry semantics.

Parity targets:
  - initialize_model    /root/reference/src/Experiments/models.py:250-276
  - translate_load_dir  /root/reference/src/Experiments/models.py:279-292
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp

from hyperpri_tpu.models.cubenet import CubeNET
from hyperpri_tpu.models.spectral_unet import SpectralUNET
from hyperpri_tpu.models.unet import UNet


def initialize_model(
    model_name: str,
    num_classes: int,
    network_parameters: Mapping[str, Any],
    analyze: bool = False,
    dtype: Any = jnp.float32,
):
    """Name -> model instance, using the reference's parameter-dict keys."""
    name = model_name.lower()
    if name in ("unet", "unet+"):
        return UNet(
            n_channels=network_parameters["channels"],
            n_classes=num_classes,
            bilinear=network_parameters.get("bilinear", True),
            use_attention=network_parameters.get("use_attention", False) or name == "unet+",
            analyze=analyze,
            pallas_train=network_parameters.get("pallas_train", False),
            dtype=dtype,
        )
    if name == "spectralunet":
        depth = network_parameters["hsi_hi"] - network_parameters["hsi_lo"]
        return SpectralUNET(
            hsi_depth=depth,
            n_classes=num_classes,
            bn_feats=network_parameters["spectral_bn_size"],
            remat=network_parameters.get("remat", False),
            offload=network_parameters.get("offload", False),
            dtype=dtype,
        )
    if name == "cubenet":
        depth = network_parameters["hsi_hi"] - network_parameters["hsi_lo"]
        return CubeNET(
            hsi_depth=depth,
            n_classes=num_classes,
            first_depth=network_parameters["3d_featmaps"],
            bilinear=network_parameters.get("bilinear", True),
            use_attention=network_parameters.get("use_attention", False),
            analyze=analyze,
            pallas_train=network_parameters.get("pallas_train", False),
            dtype=dtype,
        )
    raise RuntimeError(f"Invalid model: {model_name!r}")


def translate_load_dir(model_name: str, net_params: Mapping[str, Any]) -> str:
    """Model name -> save-directory string (reference models.py:279-292)."""
    if model_name == "SpectralUNET":
        return f"{model_name}_{net_params['spectral_bn_size']}"
    if model_name == "CubeNET":
        return f"{model_name}_{net_params['3d_featmaps']}"
    return "UNET"


def count_params(params: Dict[str, Any]) -> int:
    """Total learnable parameter count of a flax 'params' collection.

    Comparable to torch's sum(p.numel()) — BatchNorm running statistics live
    in the separate 'batch_stats' collection and are not counted, matching
    torch buffers being excluded from parameter counts.
    """
    import jax

    return sum(int(x.size) for x in jax.tree.leaves(params))
