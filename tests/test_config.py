"""Config layer: path templates, run_num arithmetic, factories, model swaps
(parity: src/Experiments/params_HyperPRI.py)."""

import pytest

from hyperpri_tpu.config import ExpHyperspectralPRI, ExpRedGreenBluePRI
from hyperpri_tpu.models import CubeNET, SpectralUNET, UNet


def test_rgb_defaults_and_paths():
    cfg = ExpRedGreenBluePRI(calling_path="/exp", split_no=2, seed_num=1)
    assert cfg.run_num == 12  # 10*seed + split (params_HyperPRI.py:44)
    assert cfg.save_path == "/exp/Saved_Models/RGB/UNET/Run_12/"
    assert cfg.fig_dir == "/exp/Saved_Models/RGB/Val_Segmentation_Maps/Run_12/UNET/"
    assert cfg.json_dir["train"].endswith("data_splits/train2.json")
    assert cfg.json_dir["test"].endswith("data_splits/val2.json")  # test==val by default
    assert cfg.b_size == {"train": 2, "val": 2, "test": 1}
    assert cfg.epochs == 2000 and cfg.overall == 500
    assert cfg.learn_rate == 0.001 and cfg.optimizer == "adam"
    assert cfg.channels == 3
    assert isinstance(cfg.get_network(), UNet)


def test_hsi_defaults():
    cfg = ExpHyperspectralPRI(calling_path="/exp", split_no=1)
    assert cfg.hsi_lo == 25 and cfg.hsi_hi == 263
    assert cfg.channels == 238
    assert cfg.b_size == {"train": 2, "val": 2, "test": 2}
    assert cfg.model_param_str == "CubeNET_64"
    assert cfg.spectral_bn_size == 1650 and cfg.cube_featmaps == 64
    assert isinstance(cfg.get_network(), CubeNET)


def test_change_network_param_swaps_model_and_paths():
    cfg = ExpHyperspectralPRI(calling_path="/exp", split_no=3)
    cfg.change_network_param("SpectralUNET", "/exp", 3)
    assert isinstance(cfg.get_network(), SpectralUNET)
    assert cfg.model_param_str == "SpectralUNET_1650"
    assert cfg.save_path == "/exp/Saved_Models/HSI/SpectralUNET_1650/Run_3/"
    # dict overrides only touch existing attrs (params_HyperPRI.py:96-100)
    cfg.change_network_param("CubeNET", "/exp", 3, model_params={"cube_featmaps": 32,
                                                                 "not_an_attr": 1})
    assert cfg.cube_featmaps == 32
    assert not hasattr(cfg, "not_an_attr")
    assert cfg.model_param_str == "CubeNET_32"


def test_unknown_model_raises():
    cfg = ExpRedGreenBluePRI(calling_path="/exp")
    with pytest.raises(ValueError, match="not in list"):
        cfg.change_network_param("ResNet", "/exp", 1)


def test_gray_mode_channel_quirk():
    # Reference quirk: color_mode='gray' sets channels=1 even though the
    # dataset replicates gray to 3 channels (params_HyperPRI.py:32).
    cfg = ExpRedGreenBluePRI(calling_path="/exp", color_mode="gray")
    assert cfg.channels == 1


def test_augment_gates_train_crop(tmp_path):
    from hyperpri_tpu.data.synthetic import make_experiment_tree

    make_experiment_tree(str(tmp_path), n_boxes=2, dates_per_box=1, size_hw=(20, 28), bands=8)
    cfg = ExpHyperspectralPRI(calling_path=str(tmp_path), split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.patch_size = (16, 16)
    # HSI default augment=False: no crop (params_HyperPRI.py:201-206)
    assert cfg.get_train_data()[0]["image"].shape == (20, 28, 8)
    cfg2 = ExpHyperspectralPRI(calling_path=str(tmp_path), split_no=1, augment=True)
    cfg2.hsi_lo, cfg2.hsi_hi = 0, 8
    cfg2.patch_size = (16, 16)
    assert cfg2.get_train_data()[0]["image"].shape == (16, 16, 8)
    # RGB always crops the train split
    cfg3 = ExpRedGreenBluePRI(calling_path=str(tmp_path), split_no=1)
    cfg3.patch_size = (16, 16)
    assert cfg3.get_train_data()[0]["image"].shape == (16, 16, 3)
    # eval splits never crop (20x28 is landscape: no rotation)
    assert cfg3.get_val_data()[0]["image"].shape == (20, 28, 3)
