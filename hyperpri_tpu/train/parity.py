"""Training-trajectory parity harness: flax/optax vs live-torch reference.

The strongest DICE-parity proxy available without the (unshipped) HyperPRI
dataset: initialize the torch reference architecture FROM the flax init
(train/torch_export.py), feed both frameworks byte-identical synthetic
batches, run N fp32 Adam steps with the reference's exact step semantics
(/root/reference/src/PLTrainer.py:79-98 training_step, :164-183
configure_optimizers: BCEWithLogits mean, Adam lr=1e-3 wd=0, BN momentum 0.1),
and measure how far the two trajectories drift apart:

  - per-step training losses (max relative deviation),
  - final BN running_mean/running_var buffers (max abs deviation),
  - final parameters (max abs deviation),
  - a post-training 500-threshold PR sweep over a held-out batch
    (max |precision| / |recall| deviation + best-threshold agreement).

Run on CPU: both sides use fp32 CPU kernels, so residual deviation measures
op-ordering/algorithm differences (XLA conv vs torch conv), not hardware.
Driven by scripts/parity_train_torch.py (50-step evidence run; results
recorded in BENCHMARKS.md) and tests/test_torch_train_parity.py (short runs,
asserted tolerances).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def _to_torch_layout(img: np.ndarray, model_name: str) -> np.ndarray:
    """flax NHWC -> the reference's input layout for each model."""
    x = np.transpose(img, (0, 3, 1, 2))  # (N, C|D, H, W)
    if model_name.lower() == "cubenet":
        return x[:, None]  # (N, 1, D, H, W), reference models.py:202
    return x


def make_batches(
    n_steps: int,
    batch: int,
    h: int,
    w: int,
    channels: int,
    seed: int = 0,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Deterministic synthetic (image NHWC, mask NHW1) pairs, fp32."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_steps):
        img = rng.uniform(0.0, 1.0, size=(batch, h, w, channels)).astype(np.float32)
        mask = (rng.uniform(size=(batch, h, w, 1)) < 0.3).astype(np.float32)
        out.append((img, mask))
    return out


def _flax_model_and_cfg(model_name: str, hsi_depth: int, bn_feats: int):
    from hyperpri_tpu.config import ExperimentConfig
    from hyperpri_tpu.models import CubeNET, SpectralUNET, UNet

    name = model_name.lower()
    cfg = ExperimentConfig(model_name=model_name, bilinear=False)
    if name in ("unet", "unet+"):
        return UNet(n_channels=3, n_classes=1, bilinear=False), cfg, 3
    if name == "spectralunet":
        cfg.spectral_bn_size = bn_feats
        return SpectralUNET(hsi_depth=hsi_depth, n_classes=1, bn_feats=bn_feats), cfg, hsi_depth
    if name == "cubenet":
        return (
            CubeNET(hsi_depth=hsi_depth, n_classes=1, first_depth=64, bilinear=False),
            cfg,
            hsi_depth,
        )
    raise ValueError(model_name)


def _torch_model(model_name: str, hsi_depth: int, bn_feats: int):
    from hyperpri_tpu.train import torch_ref

    name = model_name.lower()
    if name in ("unet", "unet+"):
        return torch_ref.make_torch_unet(3, 1)
    if name == "spectralunet":
        return torch_ref.make_torch_spectral_unet(hsi_depth, 1, bn_feats)
    if name == "cubenet":
        return torch_ref.make_torch_cubenet(hsi_depth, 1, 64)
    raise ValueError(model_name)


def _bn_shadowed_biases(model_name: str, cfg) -> set:
    """Torch keys of conv/linear biases that feed DIRECTLY into a BatchNorm.

    Mathematically these parameters are inert: BN subtracts the per-channel
    batch mean, so a uniform bias shift never reaches the output and its true
    gradient is exactly zero. Both frameworks feed Adam pure round-off noise
    for them, and Adam's m/sqrt(v) normalization turns that noise into
    full-lr random walks — the walks decorrelate between frameworks without
    any effect on the function. They are excluded from live_param_dev_max
    (still counted in param_dev_max)."""
    from hyperpri_tpu.train.torch_import import module_map

    m = module_map(model_name, cfg)
    bn_prefixes = {t for t, kind in m.values() if kind == "bn"}
    shadowed = set()
    for tprefix, kind in m.values():
        if kind not in ("conv", "conv3d", "linear"):
            continue
        parts = tprefix.rsplit(".", 1)
        nxt = None
        if len(parts) == 2 and parts[1].isdigit():
            nxt = f"{parts[0]}.{int(parts[1]) + 1}"
        elif tprefix == "first_conv":  # aliased as inc.0; BN is inc.1
            nxt = "inc.1"
        if nxt in bn_prefixes:
            shadowed.add(f"{tprefix}.bias")
    return shadowed


def run_trajectory_parity(
    model_name: str,
    n_steps: int = 50,
    batch: int = 2,
    hw: Tuple[int, int] = (44, 52),
    hsi_depth: int = 238,
    bn_feats: int = 1650,
    seed: int = 0,
    n_thresholds: int = 500,
    verbose: bool = False,
    chaos_control: bool = False,
    chunked: int = 0,
) -> Dict[str, float]:
    """Run both trajectories; return the measured deviation summary.

    SpectralUNET note: the reference computes BN1d train statistics PER IMAGE
    (python batch loop, models.py:132); the flax model takes them over the
    whole batch jointly (documented divergence). At batch=1 the two coincide,
    so SpectralUNET parity runs use batch=1 to compare everything else.
    Alternatively pass chunked=batch: the chunked grad-accumulation step
    (train/chunked.py) takes BN statistics per image exactly like the
    reference's loop, so batch>1 trajectories become directly comparable.

    chaos_control: additionally run a SECOND torch trajectory from the same
    init with ONE weight perturbed by 1e-7 (≈1 bf16 ulp of a unit value) and
    report the same deviation metrics torch-vs-torch (control_*). Deviations
    of that size are the trajectory's intrinsic sensitivity — Adam's
    m/sqrt(v) turns any epsilon into full-lr update flips — so flax-vs-torch
    deviations at or below the control are chaos floor, not semantic gaps.
    """
    import jax
    import jax.numpy as jnp

    from hyperpri_tpu.ops.metrics import best_threshold_from_pr, pr_curve
    from hyperpri_tpu.train import torch_ref
    from hyperpri_tpu.train.torch_export import export_state_dict, export_to_torch_module
    from hyperpri_tpu.train.trainer import create_train_state, make_train_step

    h, w = hw
    model, cfg, channels = _flax_model_and_cfg(model_name, hsi_depth, bn_feats)
    batches = make_batches(n_steps, batch, h, w, channels, seed)
    eval_img, eval_mask = make_batches(1, batch, h, w, channels, seed + 1)[0]

    # --- flax trajectory
    state = create_train_state(cfg, model, batches[0][0], seed=0)
    if chunked:
        from hyperpri_tpu.train.chunked import make_chunked_train_step

        train_step = jax.jit(make_chunked_train_step(threshold=0.5, n_chunks=chunked))
    else:
        train_step = jax.jit(make_train_step(threshold=0.5))
    flax_losses = []
    for img, mask in batches:
        jb = {
            "image": jnp.asarray(img),
            "mask": jnp.asarray(mask),
            "valid": jnp.ones((batch,), jnp.float32),
        }
        state, logs = train_step(state, jb)
        flax_losses.append(float(logs["loss_sum"]) / float(logs["n"]))
    flax_eval = np.asarray(
        state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(eval_img),
            train=False,
        )
    )

    # --- torch trajectory from the SAME init
    tmodel = _torch_model(model_name, hsi_depth, bn_feats)
    init_state = create_train_state(cfg, model, batches[0][0], seed=0)
    export_to_torch_module(
        tmodel, init_state.params, init_state.batch_stats, model_name, cfg
    )
    torch_batches = [
        (_to_torch_layout(img, model_name), np.transpose(mask, (0, 3, 1, 2)))
        for img, mask in batches
    ]
    torch_losses = torch_ref.run_reference_training(tmodel, torch_batches, lr=cfg.learn_rate)

    import torch

    tmodel.eval()
    with torch.no_grad():
        torch_eval = (
            tmodel(torch.from_numpy(_to_torch_layout(eval_img, model_name)))
            .numpy()
            .transpose(0, 2, 3, 1)
        )

    # --- deviations
    flax_l = np.asarray(flax_losses)
    torch_l = np.asarray(torch_losses)
    loss_rel = np.abs(flax_l - torch_l) / np.maximum(np.abs(torch_l), 1e-12)

    final_sd = export_state_dict(state.params, state.batch_stats, model_name, cfg)
    torch_sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    shadowed = _bn_shadowed_biases(model_name, cfg)
    param_dev = 0.0
    live_param_dev = 0.0
    bn_dev = 0.0
    bn_rel_dev = 0.0
    for k, ours in final_sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        d = float(np.max(np.abs(ours - torch_sd[k])))
        if "running_" in k:
            bn_dev = max(bn_dev, d)
            # relative to the buffer's own scale: running_var is O(act^2)
            # and can sit in the hundreds for early layers
            bn_rel_dev = max(bn_rel_dev, d / (float(np.max(np.abs(torch_sd[k]))) + 1e-6))
        else:
            param_dev = max(param_dev, d)
            if k not in shadowed:
                live_param_dev = max(live_param_dev, d)

    # --- post-training threshold sweep on the held-out batch (both sides
    # through OUR sweep so the comparison isolates the model trajectories).
    # Curve deviations are compared after the reference's own 1%-tail crop
    # (PLTrainer.py:547): the uncropped tails are degenerate (zero predicted
    # positives -> patched precision) on a briefly-trained model.
    mask_flat = jnp.asarray(eval_mask.reshape(-1))
    p_f, r_f, thr = pr_curve(jax.nn.sigmoid(jnp.asarray(flax_eval.reshape(-1))), mask_flat, n_thresholds)
    p_t, r_t, _ = pr_curve(jax.nn.sigmoid(jnp.asarray(torch_eval.reshape(-1))), mask_flat, n_thresholds)
    best_f, _, _ = best_threshold_from_pr(p_f, r_f, thr)
    best_t, _, _ = best_threshold_from_pr(p_t, r_t, thr)
    crop = max(1, len(np.asarray(p_f)) // 100)
    p_f_c, p_t_c = np.asarray(p_f)[crop:-crop], np.asarray(p_t)[crop:-crop]
    r_f_c, r_t_c = np.asarray(r_f)[crop:-crop], np.asarray(r_t)[crop:-crop]

    out = {
        "model": model_name,
        "n_steps": n_steps,
        "loss_rel_dev_max": float(np.max(loss_rel)),
        "loss_rel_dev_final": float(loss_rel[-1]),
        "loss_first_flax": float(flax_l[0]),
        "loss_first_torch": float(torch_l[0]),
        "loss_final_flax": float(flax_l[-1]),
        "loss_final_torch": float(torch_l[-1]),
        "bn_running_dev_max": bn_dev,
        "bn_running_rel_dev_max": bn_rel_dev,
        "param_dev_max": param_dev,
        "live_param_dev_max": live_param_dev,
        "eval_logit_dev_max": float(np.max(np.abs(flax_eval - torch_eval))),
        "eval_logit_rel_dev": float(
            np.max(np.abs(flax_eval - torch_eval)) / (np.std(torch_eval) + 1e-12)
        ),
        "sweep_precision_dev_max": float(np.max(np.abs(p_f_c - p_t_c))),
        "sweep_recall_dev_max": float(np.max(np.abs(r_f_c - r_t_c))),
        "best_threshold_flax": float(best_f),
        "best_threshold_torch": float(best_t),
        "flax_losses": [float(x) for x in flax_l],
        "torch_losses": [float(x) for x in torch_l],
    }
    if chaos_control:
        tmodel2 = _torch_model(model_name, hsi_depth, bn_feats)
        export_to_torch_module(
            tmodel2, init_state.params, init_state.batch_stats, model_name, cfg
        )
        with torch.no_grad():
            p0 = next(tmodel2.parameters())
            p0.view(-1)[0] += 1e-7
        control_losses = np.asarray(
            torch_ref.run_reference_training(tmodel2, torch_batches, lr=cfg.learn_rate)
        )
        ctl_rel = np.abs(control_losses - torch_l) / np.maximum(np.abs(torch_l), 1e-12)
        ctl_bn_rel = 0.0
        sd2 = {k: v.detach().cpu().numpy() for k, v in tmodel2.state_dict().items()}
        for k, theirs in torch_sd.items():
            if "running_" not in k:
                continue
            d = float(np.max(np.abs(sd2[k] - theirs)))
            ctl_bn_rel = max(ctl_bn_rel, d / (float(np.max(np.abs(theirs))) + 1e-6))
        tmodel2.eval()
        with torch.no_grad():
            t2_eval = (
                tmodel2(torch.from_numpy(_to_torch_layout(eval_img, model_name)))
                .numpy()
                .transpose(0, 2, 3, 1)
            )
        p_c, r_c, _ = pr_curve(
            jax.nn.sigmoid(jnp.asarray(t2_eval.reshape(-1))), mask_flat, n_thresholds
        )
        out["control_loss_rel_dev_max"] = float(np.max(ctl_rel))
        out["control_loss_rel_dev_final"] = float(ctl_rel[-1])
        out["control_bn_running_rel_dev_max"] = ctl_bn_rel
        out["control_eval_logit_dev_max"] = float(np.max(np.abs(t2_eval - torch_eval)))
        out["control_sweep_precision_dev_max"] = float(
            np.max(np.abs(np.asarray(p_c)[crop:-crop] - p_t_c))
        )
        out["control_sweep_recall_dev_max"] = float(
            np.max(np.abs(np.asarray(r_c)[crop:-crop] - r_t_c))
        )

    if verbose:
        for k, v in out.items():
            if not isinstance(v, list):
                print(f"  {k}: {v}")
    return out
