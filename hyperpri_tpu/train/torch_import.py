"""Import PyTorch reference checkpoints into hyperpri_tpu models.

Parity target: the reference's eval-time checkpoint resolution handles three
formats (src/PLTrainer.py:270-330): Lightning .ckpt, raw .pt state dicts
('module.*' / bare keys remapped to 'm_network.*'), and consolidated
DeepSpeed dirs. A user migrating from the reference brings .pt/.ckpt files;
this module maps them onto the flax parameter trees so trained GPU weights
evaluate bit-comparably on TPU.

Layout transforms:
  torch Conv2d  (O, I, kh, kw)      -> flax Conv kernel (kh, kw, I, O)
  torch Conv3d  (O, 1, D, kh, kw)   -> flax Conv kernel (kh, kw, D, O)
                                       (CubeNET spectral collapse == 2D conv)
  torch ConvT2d (I, O, kh, kw)      -> flax ConvTranspose kernel (kh, kw, I, O),
                                       spatially flipped (flax does not flip)
  torch Linear  (O, I)              -> flax Dense kernel (I, O)
  torch BN weight/bias/running_*    -> flax BatchNorm scale/bias + batch_stats
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

_DC = {"conv1": ("0", "conv"), "bn1": ("1", "bn"), "conv2": ("3", "conv"), "bn2": ("4", "bn")}


def _double_conv_map(flax_prefix: str, torch_prefix: str) -> Dict[str, Tuple[str, str]]:
    out = {}
    for fname, (tidx, kind) in _DC.items():
        out[f"{flax_prefix}/{fname}"] = (f"{torch_prefix}.{tidx}", kind)
    return out


def module_map(model_name: str, cfg=None) -> Dict[str, Tuple[str, str]]:
    """flax module path -> (torch module prefix, kind in conv|convT|linear|bn)."""
    name = model_name.lower()
    m: Dict[str, Tuple[str, str]] = {}
    if name in ("unet", "unet+"):
        m.update(_double_conv_map("inc", "inc.double_conv"))
        for k in range(1, 5):
            m.update(_double_conv_map(f"down{k}/conv", f"down{k}.maxpool_conv.1.double_conv"))
            m[f"up{k}/up"] = (f"up{k}.up", "convT")
            m.update(_double_conv_map(f"up{k}/conv", f"up{k}.conv.double_conv"))
        m["outc/conv"] = ("outc.conv", "conv")
        return m
    if name == "spectralunet":
        for blk in ["tail", "down1", "down2", "down3", "down4", "up1", "up2", "up3", "up4"]:
            m[f"{blk}/linear"] = (f"{blk}.0", "linear")
            m[f"{blk}/bn"] = (f"{blk}.1", "bn")
        m["outc"] = ("outc", "linear")
        return m
    if name == "cubenet":
        m["first_conv"] = ("first_conv", "conv3d")
        m["first_bn"] = ("inc.1", "bn")
        m["inc2_conv"] = ("inc2.0", "conv")
        m["inc2_bn"] = ("inc2.1", "bn")
        for k in range(1, 5):
            m.update(_double_conv_map(f"down{k}/conv", f"down{k}.maxpool_conv.1.double_conv"))
        for k in range(1, 4):
            m[f"up{k}/up"] = (f"up{k}.up", "convT")
            m.update(_double_conv_map(f"up{k}/conv", f"up{k}.conv.double_conv"))
        first_depth = getattr(cfg, "cube_featmaps", 64) if cfg is not None else 64
        if first_depth == 64:
            m["up4/up"] = ("up4.up", "convT")
            m.update(_double_conv_map("up4/conv", "up4.conv.double_conv"))
        else:
            m["upsample4"] = ("upsample4", "convT")
            m.update(_double_conv_map("upconv4", "upconv4.double_conv"))
        m["outc/conv"] = ("outc.conv", "conv")
        return m
    raise ValueError(f"no torch mapping for model {model_name!r}")


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def convert_state_dict(
    torch_sd: Dict[str, Any], model_name: str, cfg=None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch state dict -> (flax params, flax batch_stats) nested dicts."""
    mapping = module_map(model_name, cfg)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path, leafname, value):
        node = tree
        for part in path.split("/"):
            node = node.setdefault(part, {})
        node[leafname] = value

    for flax_path, (tprefix, kind) in mapping.items():
        if kind == "conv":
            w = _np(torch_sd[f"{tprefix}.weight"])
            put(params, flax_path, "kernel", np.transpose(w, (2, 3, 1, 0)))
            put(params, flax_path, "bias", _np(torch_sd[f"{tprefix}.bias"]))
        elif kind == "conv3d":
            w = _np(torch_sd[f"{tprefix}.weight"])[:, 0]  # (O, D, kh, kw)
            put(params, flax_path, "kernel", np.transpose(w, (2, 3, 1, 0)))
            put(params, flax_path, "bias", _np(torch_sd[f"{tprefix}.bias"]))
        elif kind == "convT":
            # flax ConvTranspose applies the kernel un-flipped (fractionally
            # strided conv); torch's ConvTranspose2d flips it -> spatial flip.
            w = _np(torch_sd[f"{tprefix}.weight"])  # (I, O, kh, kw)
            w = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()
            put(params, flax_path, "kernel", w)
            put(params, flax_path, "bias", _np(torch_sd[f"{tprefix}.bias"]))
        elif kind == "linear":
            put(params, flax_path, "kernel", _np(torch_sd[f"{tprefix}.weight"]).T)
            put(params, flax_path, "bias", _np(torch_sd[f"{tprefix}.bias"]))
        elif kind == "bn":
            put(params, flax_path, "scale", _np(torch_sd[f"{tprefix}.weight"]))
            put(params, flax_path, "bias", _np(torch_sd[f"{tprefix}.bias"]))
            put(batch_stats, flax_path, "mean", _np(torch_sd[f"{tprefix}.running_mean"]))
            put(batch_stats, flax_path, "var", _np(torch_sd[f"{tprefix}.running_var"]))
        else:  # pragma: no cover
            raise ValueError(kind)
    return params, batch_stats


def normalize_torch_keys(raw: Dict[str, Any]) -> Dict[str, Any]:
    """Strip the reference's wrapper prefixes (PLTrainer.py:203-211, 315-327):
    'pytorch-lightning' payloads nest under 'state_dict'; keys may carry
    'm_network.', 'module.', or '_forward_module.m_network.' prefixes."""
    if "pytorch-lightning_version" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        for prefix in ("_forward_module.m_network.", "m_network.", "module."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        if "feat_ext" in k:
            continue
        out[k] = v
    return out


def _state_from_torch_sd(trainer, cfg, sd: Dict[str, Any]):
    from flax import serialization

    from hyperpri_tpu.train.trainer import create_train_state

    params, batch_stats = convert_state_dict(sd, cfg.model_name, cfg)
    img = np.zeros((1, 32, 32, cfg.channels), np.float32)
    state = create_train_state(cfg, trainer.model, img, cfg.run_num)
    new_params = serialization.from_state_dict(state.params, params)
    new_stats = serialization.from_state_dict(state.batch_stats, batch_stats)
    return state.replace(params=new_params, batch_stats=new_stats)


def load_torch_checkpoint_state(trainer, cfg, path: str):
    """Load a torch .pt/.ckpt file into a fresh TrainState (eval restore)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    return _state_from_torch_sd(trainer, cfg, normalize_torch_keys(raw))


def consolidate_zero2_dir(ckpt_dir: str) -> Dict[str, Any]:
    """Merge a DeepSpeed ZeRO-2 sharded checkpoint directory into one fp32
    state dict — the stand-in for deepspeed's
    convert_zero_checkpoint_to_fp32_state_dict as driven by the reference
    (PLTrainer.py:186-216), with no chdir workaround and no deepspeed import.

    Layout (stage 2: params replicated, optimizer partitioned):
      <dir>/latest                      text file naming the tag subdir
      <dir>/<tag>/mp_rank_00_model_states.pt
          'module'       full module state dict (bf16 under 'bf16-mixed')
          'param_shapes' per-optimizer-group OrderedDict{fqn: shape}
      <dir>/<tag>/zero_pp_rank_<R>_mp_rank_00_optim_states.pt
          ['optimizer_state_dict']['single_partition_of_fp32_groups']
          = per-group 1-D fp32 master shard for rank R (groups flattened in
            param_shapes order, zero-padded to a multiple of world size)

    The fp32 masters, when present, overwrite the module copies (the module
    dict may be bf16); BN buffers (running_mean/var) only exist in 'module'.
    """
    import glob as _glob

    import torch

    tag = None
    latest = os.path.join(ckpt_dir, "latest")
    if os.path.exists(latest):
        with open(latest) as f:
            tag = f.read().strip()
    if tag and os.path.isdir(os.path.join(ckpt_dir, tag)):
        root = os.path.join(ckpt_dir, tag)
    else:
        hits = _glob.glob(os.path.join(ckpt_dir, "**", "*model_states.pt"), recursive=True)
        if not hits:
            raise FileNotFoundError(f"no *model_states.pt under {ckpt_dir}")
        root = os.path.dirname(sorted(hits)[0])

    ms = torch.load(
        os.path.join(root, "mp_rank_00_model_states.pt"),
        map_location="cpu",
        weights_only=False,
    )
    sd = {k: v.float() if hasattr(v, "float") else v for k, v in ms["module"].items()}

    optim_files = sorted(_glob.glob(os.path.join(root, "*_optim_states.pt")))
    param_shapes = ms.get("param_shapes")
    if optim_files and param_shapes:
        per_rank = []
        for f in optim_files:
            osd = torch.load(f, map_location="cpu", weights_only=False)
            per_rank.append(osd["optimizer_state_dict"]["single_partition_of_fp32_groups"])
        for g, shapes in enumerate(param_shapes):
            flat = torch.cat([torch.as_tensor(r[g]).float().flatten() for r in per_rank])
            offset = 0
            for name, shape in shapes.items():
                numel = int(np.prod(tuple(shape)))
                sd[name] = flat[offset : offset + numel].view(tuple(shape))
                offset += numel
            # anything past `offset` is the world-size alignment padding
    return sd


def load_zero2_checkpoint_state(trainer, cfg, ckpt_dir: str):
    """Load a DeepSpeed ZeRO-2 sharded directory into a fresh TrainState."""
    sd = normalize_torch_keys(consolidate_zero2_dir(ckpt_dir))
    return _state_from_torch_sd(trainer, cfg, sd)
