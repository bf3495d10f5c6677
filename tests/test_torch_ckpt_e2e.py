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


def _hsi_cfg(tmp_path):
    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.data.synthetic import make_experiment_tree

    make_experiment_tree(str(tmp_path), n_boxes=2, dates_per_box=1, size_hw=(12, 16), bands=8)
    cfg = ExpHyperspectralPRI(calling_path=str(tmp_path), split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8
    cfg.model_name = "SpectralUNET"
    cfg.spectral_bn_size = 16
    cfg._refresh_paths()
    os.makedirs(os.path.join(cfg.save_path, "Checkpoints"), exist_ok=True)
    return cfg


def test_lightning_ckpt_restore_through_validate(tmp_path):
    """A Lightning-format .ckpt FILE (zip-serialized torch payload with
    'pytorch-lightning_version' + '_forward_module.m_network.' keys,
    PLTrainer.py:309-327) in Checkpoints/ must route to the torch bridge by
    content — the old extension-based routing fed it to the msgpack loader."""
    from hyperpri_tpu.train import validate_net

    cfg = _hsi_cfg(tmp_path)
    sd = make_torch_spectral_sd(8, 16, prefix="_forward_module.m_network.")
    payload = {
        "pytorch-lightning_version": "2.0.7",
        "state_dict": sd,
        "epoch": 41,
        "global_step": 1234,
    }
    torch.save(payload, os.path.join(cfg.save_path, "Checkpoints",
                                     "epoch=41-val_loss=0.080-val_dice=0.838.ckpt"))
    prec, rec, thr = validate_net(cfg.get_val_data(), cfg, verbose=False, n_thresholds=50)
    assert np.all(np.isfinite(prec)) and np.all(np.isfinite(rec))


def _write_zero2_dir(ckpt_dir, sd_fp32, world=2, n_groups=2):
    """Synthesize a DeepSpeed ZeRO-2 sharded checkpoint: bf16 module copies
    + rank-partitioned fp32 masters (padded flat groups), 'latest' tag."""
    import collections

    tag = "checkpoint"
    root = os.path.join(ckpt_dir, tag)
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(ckpt_dir, "latest"), "w") as f:
        f.write(tag)

    param_items = [(k, v) for k, v in sd_fp32.items()
                   if "running_" not in k and "num_batches" not in k]
    buffers = {k: v for k, v in sd_fp32.items() if k not in dict(param_items)}
    # split params into groups round-robin (any grouping is legal)
    groups = [param_items[g::n_groups] for g in range(n_groups)]

    param_shapes = []
    partitions = [[] for _ in range(world)]
    for items in groups:
        shapes = collections.OrderedDict((k, v.shape) for k, v in items)
        param_shapes.append(shapes)
        flat = torch.cat([v.flatten().float() for _, v in items])
        pad = (-len(flat)) % world
        flat = torch.cat([flat, torch.zeros(pad)])
        per = len(flat) // world
        for r in range(world):
            partitions[r].append(flat[r * per : (r + 1) * per].clone())

    module_bf16 = {k: (v.bfloat16().float() if v.dtype.is_floating_point else v)
                   for k, v in {**dict(param_items), **buffers}.items()}
    torch.save({"module": module_bf16, "param_shapes": param_shapes,
                "ds_version": "0.9.0"},
               os.path.join(root, "mp_rank_00_model_states.pt"))
    for r in range(world):
        torch.save({"optimizer_state_dict":
                    {"single_partition_of_fp32_groups": partitions[r],
                     "zero_stage": 2, "partition_count": world}},
                   os.path.join(root, f"zero_pp_rank_{r}_mp_rank_00_optim_states.pt"))


def test_zero2_dir_consolidation_recovers_fp32_masters(tmp_path):
    from hyperpri_tpu.train.torch_import import consolidate_zero2_dir, normalize_torch_keys

    sd = make_torch_spectral_sd(8, 16, prefix="_forward_module.m_network.")
    d = str(tmp_path / "epoch=9-val_loss=0.1-val_dice=0.9.ckpt")
    _write_zero2_dir(d, sd)
    merged = normalize_torch_keys(consolidate_zero2_dir(d))
    # fp32 masters restored exactly (NOT the bf16 module round-trip)
    for k, v in sd.items():
        nk = k.replace("_forward_module.m_network.", "")
        if "num_batches" in k:
            continue
        np.testing.assert_array_equal(merged[nk].numpy(), v.numpy(), err_msg=nk)


def test_zero2_dir_restore_through_validate(tmp_path):
    """End-to-end: a ZeRO-2 sharded DIRECTORY under Checkpoints/ is found by
    checkpoint resolution and consolidated on the fly (PLTrainer.py:186-216)."""
    from hyperpri_tpu.train import validate_net

    cfg = _hsi_cfg(tmp_path)
    sd = make_torch_spectral_sd(8, 16, prefix="_forward_module.m_network.")
    _write_zero2_dir(os.path.join(cfg.save_path, "Checkpoints",
                                  "epoch=9-val_loss=0.1-val_dice=0.9.ckpt"), sd)
    prec, rec, thr = validate_net(cfg.get_val_data(), cfg, verbose=False, n_thresholds=50)
    assert np.all(np.isfinite(prec)) and np.all(np.isfinite(rec))


def test_detect_checkpoint_format(tmp_path):
    from hyperpri_tpu.train.checkpoint import detect_checkpoint_format, save_pytree

    # msgpack pytree
    mp = str(tmp_path / "state.ckpt")
    save_pytree(mp, {"params": {"w": np.ones(3, np.float32)}})
    assert detect_checkpoint_format(mp) == "msgpack"
    # torch zip
    tz = str(tmp_path / "weights.ckpt")
    torch.save({"a": torch.ones(2)}, tz)
    assert detect_checkpoint_format(tz) == "torch"
    # torch legacy pickle
    tl = str(tmp_path / "legacy.pt")
    torch.save({"a": torch.ones(2)}, tl, _use_new_zipfile_serialization=False)
    assert detect_checkpoint_format(tl) == "torch"
    # directory
    dd = tmp_path / "sharded.ckpt"
    dd.mkdir()
    assert detect_checkpoint_format(str(dd)) == "zero_dir"
