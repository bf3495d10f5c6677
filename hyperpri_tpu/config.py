"""Experiment configuration layer (config-as-factory).

Parity target: /root/reference/src/Experiments/params_HyperPRI.py —
ExpRedGreenBluePRI (:15-165) and ExpHyperspectralPRI (:168-356). The config
object is also the factory: get_network() / get_train_data() / get_val_data()
/ get_test_data(), plus change_network_param() for on-the-fly model swaps
(used by the kfold_validate/kfold_segmaps drivers) and translate_load_dir()
for path naming.

Attribute names, defaults, and the path templates
  Saved_Models/{dataset}/{model_param_str}/Run_{run_num}/   (run_num = 10*seed + split)
  Saved_Models/{dataset}/Val_Segmentation_Maps/Run_{run_num}/{model_param_str}/
are preserved so reference users find their flags where they expect them.

TPU-first differences:
  - `criterion` is the string 'bce_with_logits' resolved to a pure-JAX loss.
  - `device` defaults to 'tpu'; 'cpu' works everywhere.
  - `precision` ('fp32' | 'bf16') replaces Lightning's 'bf16-mixed' flag and
    applies to any model, not only the ZeRO path.
  - transforms are described by data (crop size / augment flags), not by
    torchvision objects; the paired random crop lives in the dataset.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from hyperpri_tpu.data.dataset import HyperpriDataset
from hyperpri_tpu.models.registry import initialize_model


@dataclass
class ExperimentConfig:
    """Shared experiment parameters; see subclasses for per-dataset defaults."""

    calling_path: str = "."
    split_no: int = 1
    seed_num: int = 0
    augment: bool = False
    comet_logging: bool = False  # accepted for API parity; no external logger

    # Basic definitions -------------------------------------------------
    dataset: str = "RGB"
    b_size: Dict[str, int] = field(default_factory=lambda: {"train": 2, "val": 2, "test": 1})
    device: str = "tpu"
    epochs: int = 2000

    # Dataset definitions -----------------------------------------------
    patch_size: Tuple[int, int] = (608, 968)
    color_mode: str = "rgb"
    channels: int = 3
    rescale: int = 1
    rotate: bool = False
    num_classes: int = 1
    label_set: Optional[list] = None
    hsi_lo: int = 0
    hsi_hi: int = 299
    cache_items: int = 0  # host-RAM LRU of decoded images/cubes (0 = off)
    # On-disk decoded-cube cache dir (None = off): decoded (H, W, B) band
    # windows persist across processes, so cold epochs skip the ENVI gather
    # the reference re-pays every epoch (reference dataset.py:265-268).
    decoded_cache_dir: Optional[str] = None

    # Model parameters --------------------------------------------------
    model_name: str = "UNET"
    bilinear: bool = False
    feature_extraction: bool = False
    use_attention: bool = False
    use_pretrained: bool = False
    spectral_bn_size: int = 1650
    cube_featmaps: int = 64
    mlp_layers: tuple = ()
    test_deepspeed: Optional[bool] = None  # parity flag; ZeRO == sharded opt-state here

    # Optimizer ----------------------------------------------------------
    criterion: str = "bce_with_logits"
    optimizer: str = "adam"
    learn_rate: float = 0.001
    weight_decay: float = 0.0
    momentum: float = 0.9

    # Metrics ------------------------------------------------------------
    task: str = "binary"
    threshold: float = 0.5

    # Early stopping ------------------------------------------------------
    # Declared-but-unused in the reference too (params_HyperPRI.py:72,234
    # sets consecutive = None and nothing reads it); kept for config parity.
    consecutive: Optional[int] = None
    overall: int = 500  # patience on val_loss, epochs

    # TPU execution -------------------------------------------------------
    precision: str = "fp32"  # 'fp32' | 'bf16'
    remat: bool = False
    # SpectralUNET host-offloaded remat: block residuals cross the fwd->bwd
    # gap in pinned host memory (trainer.spectral_offload_policy) — the
    # single-chip answer to the reference's >=2-GPU ZeRO-2 requirement at
    # the full paper protocol (README.md:67-68). Numerics identical to the
    # unoffloaded step (regression-tested).
    offload: bool = False
    # Chunked-pixel gradient accumulation (train/chunked.py): split each
    # batch's pixels into this many chunks, accumulate grads, one optimizer
    # update. BN batch statistics are per chunk — at grad_accum_chunks ==
    # batch size this is exactly the REFERENCE's per-image BN semantics (its
    # Python loop, models.py:132-141). 0 = off (whole-batch joint stats).
    grad_accum_chunks: int = 0
    # Trainable Pallas convs for the full-resolution layers: -26% CubeNET /
    # -14% UNET train-step time on one chip (BENCHMARKS.md round 2). Active
    # only on a TPU backend at qualifying shapes; the Trainer forces it off
    # under SPMD meshes (custom calls do not GSPMD-partition).
    pallas_train: bool = True
    mesh_shape: Optional[Dict[str, int]] = None  # e.g. {'data': 2, 'spatial': 4}
    zero_shard_opt: bool = False  # ZeRO-equivalent sharded optimizer state
    offload_opt_state: bool = False  # ZeRO-3-offload equivalent: Adam moments in host memory
    profile_dir: Optional[str] = None  # jax.profiler trace of one post-compile epoch
    # Under a mesh, per-epoch full-state checkpoints go through orbax
    # (sharded write, sharding-aware restore — each host writes its shards,
    # the no-consolidation answer to zero_to_fp32); best-model exports stay
    # msgpack for the eval tooling. Single-host runs use msgpack throughout.
    orbax_under_mesh: bool = True

    def __post_init__(self):
        self.run_num = 10 * self.seed_num + self.split_no
        self.data_dir = f"{self.calling_path}/Datasets/HyperPRI"
        self.json_dir = {
            "train": f"{self.data_dir}/data_splits/train{self.split_no}.json",
            "val": f"{self.data_dir}/data_splits/val{self.split_no}.json",
            "test": f"{self.data_dir}/data_splits/val{self.split_no}.json",
        }
        self._refresh_paths()

    def _refresh_paths(self):
        self.model_param_str = self.translate_load_dir()
        self.save_path = (
            f"{self.calling_path}/Saved_Models/{self.dataset}/"
            f"{self.model_param_str}/Run_{self.run_num}/"
        )
        self.fig_dir = (
            f"{self.calling_path}/Saved_Models/{self.dataset}/"
            f"Val_Segmentation_Maps/Run_{self.run_num}/{self.model_param_str}/"
        )

    # -- factory API (params_HyperPRI.py:117-152, :283-343) ---------------

    def translate_load_dir(self) -> str:
        name = self.model_name.lower()
        if name == "spectralunet":
            return f"{self.model_name}_{self.spectral_bn_size}"
        if name == "cubenet":
            return f"{self.model_name}_{self.cube_featmaps}"
        if name in ("unet", "unet+"):
            return self.model_name
        raise ValueError(
            f"{self.model_name} is not in list of possible models "
            "(accepted: UNET, UNET+, SpectralUNET, CubeNET)"
        )

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.precision == "bf16" else jnp.float32

    def network_parameters(self) -> Dict[str, Any]:
        return {
            "channels": self.channels,
            "bilinear": self.bilinear,
            "feature_extraction": self.feature_extraction,
            "use_attention": self.use_attention,
            "hsi_lo": self.hsi_lo,
            "hsi_hi": self.hsi_hi,
            "spectral_bn_size": self.spectral_bn_size,
            "3d_featmaps": self.cube_featmaps,
            "remat": self.remat,
            "offload": self.offload,
            "pallas_train": self.pallas_train,
        }

    def get_network(self):
        return initialize_model(
            self.model_name, self.num_classes, self.network_parameters(), dtype=self.compute_dtype
        )

    def _dataset(self, split: str, crop: Optional[Tuple[int, int]]) -> HyperpriDataset:
        mode = "HSI" if self.dataset.upper() == "HSI" else self.color_mode
        return HyperpriDataset(
            root=self.data_dir,
            mode=mode,
            crop_size=crop,
            subset=self.label_set,
            hsi_lo=self.hsi_lo if mode.lower() == "hsi" else 0,
            hsi_hi=self.hsi_hi if mode.lower() == "hsi" else 0,
            json_file=self.json_dir.get(split),
            seed=self.run_num,
            cache_items=self.cache_items,
            decoded_cache_dir=self.decoded_cache_dir,
        )

    def get_train_data(self) -> HyperpriDataset:
        crop = self.patch_size if self.augment or self.dataset.upper() == "RGB" else None
        return self._dataset("train", crop)

    def get_val_data(self) -> HyperpriDataset:
        return self._dataset("val", None)

    def get_test_data(self) -> HyperpriDataset:
        return self._dataset("test", None)

    def change_network_param(
        self,
        new_model_name: str,
        calling_path: str,
        split_no: int,
        seed_num: int = 0,
        model_params: Optional[Dict[str, Any]] = None,
    ):
        """Swap the model (and optionally other attrs) on-the-fly; recompute
        run_num and the save/fig path templates (params_HyperPRI.py:89-106)."""
        if model_params is not None:
            for k, v in model_params.items():
                if getattr(self, k, None) is not None:
                    setattr(self, k, v)
        self.calling_path = calling_path
        self.run_num = 10 * seed_num + split_no
        self.model_name = new_model_name
        self._refresh_paths()


@dataclass
class ExpRedGreenBluePRI(ExperimentConfig):
    """RGB experiment defaults (params_HyperPRI.py:15-165)."""

    dataset: str = "RGB"
    color_mode: str = "rgb"
    model_name: str = "UNET"
    b_size: Dict[str, int] = field(default_factory=lambda: {"train": 2, "val": 2, "test": 1})

    def __post_init__(self):
        self.channels = 3 if self.color_mode.lower() != "gray" else 1
        super().__post_init__()


@dataclass
class ExpHyperspectralPRI(ExperimentConfig):
    """HSI experiment defaults (params_HyperPRI.py:168-356)."""

    dataset: str = "HSI"
    model_name: str = "CubeNET"
    hsi_lo: int = 25
    hsi_hi: int = 263
    channels: int = 238
    b_size: Dict[str, int] = field(default_factory=lambda: {"train": 2, "val": 2, "test": 2})
    test_deepspeed: Optional[bool] = False

    def __post_init__(self):
        self.channels = self.hsi_hi - self.hsi_lo
        super().__post_init__()


def resolve_criterion(name: str):
    from hyperpri_tpu.ops.losses import bce_with_logits

    if name in ("bce_with_logits", "bce", "BCEWithLogitsLoss"):
        return bce_with_logits
    raise ValueError(f"unknown criterion {name!r}")
