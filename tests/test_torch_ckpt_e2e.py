"""End-to-end torch checkpoint restore: a reference-format best_wts.pt file
(raw state dict with 'module.'-prefixed keys, PLTrainer.py:315-327) dropped
into save_path must be found by the eval checkpoint resolution and produce
working predictions through validate_net."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def make_torch_spectral_sd(depth, feats, prefix="module."):
    """Reference-keyed SpectralUNET state dict with random weights."""
    rng = np.random.default_rng(0)
    sd = {}
    blocks = {"tail": (depth, feats), "down1": (feats, feats), "down2": (feats, feats),
              "down3": (feats, feats), "down4": (feats, feats), "up1": (feats, feats),
              "up2": (2 * feats, feats), "up3": (2 * feats, feats), "up4": (2 * feats, feats)}
    for name, (cin, cout) in blocks.items():
        sd[f"{prefix}{name}.0.weight"] = torch.tensor(
            rng.normal(0, 0.1, (cout, cin)).astype(np.float32))
        sd[f"{prefix}{name}.0.bias"] = torch.tensor(rng.normal(0, 0.1, cout).astype(np.float32))
        sd[f"{prefix}{name}.1.weight"] = torch.tensor(np.ones(cout, np.float32))
        sd[f"{prefix}{name}.1.bias"] = torch.tensor(np.zeros(cout, np.float32))
        sd[f"{prefix}{name}.1.running_mean"] = torch.tensor(np.zeros(cout, np.float32))
        sd[f"{prefix}{name}.1.running_var"] = torch.tensor(np.ones(cout, np.float32))
        sd[f"{prefix}{name}.1.num_batches_tracked"] = torch.tensor(0)
    sd[f"{prefix}outc.weight"] = torch.tensor(rng.normal(0, 0.1, (1, 2 * feats)).astype(np.float32))
    sd[f"{prefix}outc.bias"] = torch.tensor(np.zeros(1, np.float32))
    return sd


def test_best_wts_pt_restore_through_validate(tmp_path):
    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.data.synthetic import make_experiment_tree
    from hyperpri_tpu.train import validate_net

    make_experiment_tree(str(tmp_path), n_boxes=2, dates_per_box=1, size_hw=(12, 16), bands=8)
    cfg = ExpHyperspectralPRI(calling_path=str(tmp_path), split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8
    cfg.model_name = "SpectralUNET"
    cfg.spectral_bn_size = 16
    cfg._refresh_paths()

    os.makedirs(cfg.save_path, exist_ok=True)
    sd = make_torch_spectral_sd(8, 16)
    torch.save(sd, os.path.join(cfg.save_path, "best_wts.pt"))

    prec, rec, thr = validate_net(cfg.get_val_data(), cfg, verbose=False, n_thresholds=50)
    assert prec.shape == (51,)
    assert np.all(np.isfinite(prec)) and np.all(np.isfinite(rec))
