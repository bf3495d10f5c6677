from hyperpri_tpu.models.cubenet import CubeNET
from hyperpri_tpu.models.parts import DoubleConv, Down, OutConv, Up, upsample2x_align_corners
from hyperpri_tpu.models.registry import count_params, initialize_model, translate_load_dir
from hyperpri_tpu.models.spectral_unet import SpectralBlock, SpectralUNET
from hyperpri_tpu.models.unet import UNet

__all__ = [
    "CubeNET",
    "DoubleConv",
    "Down",
    "OutConv",
    "Up",
    "upsample2x_align_corners",
    "count_params",
    "initialize_model",
    "translate_load_dir",
    "SpectralBlock",
    "SpectralUNET",
    "UNet",
]
