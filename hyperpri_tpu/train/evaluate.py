"""Evaluation: threshold sweeps (validate_net) and fixed-threshold tests
(test_net).

Parity targets: /root/reference/src/PLTrainer.py:463-609 (validate_net) and
:612-661 (test_net). Same protocol:

  validate_net: load best checkpoint -> predict over the split -> overall
  BCE -> 500-threshold PR sweep -> crop 1% tails -> best-DICE threshold
  (rounded to 2 decimals) -> print BCE/PixAcc/Prec/Recall/DICE/+IOU/AP/
  row-normalized confusion matrix -> save pr_curve.png -> patch the
  undefined-precision tail -> optional segmap pass. Returns
  (precision, recall, thresholds).

  test_net: same predict-then-metrics flow at a *given* threshold.

TPU-first: the whole metric block (BCE + PR sweep + AP + confusion matrix)
runs on device in one jit over the concatenated logits; only the final
scalars come back to host.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hyperpri_tpu.config import ExperimentConfig
from hyperpri_tpu.data.pipeline import DataLoader
from hyperpri_tpu.ops.losses import bce_with_logits
from hyperpri_tpu.ops.metrics import (
    average_precision,
    best_threshold_from_pr,
    binary_accuracy,
    binary_dice,
    binary_jaccard,
    confusion_matrix,
    patch_pr_tail,
    pr_curve,
)
from hyperpri_tpu.train.checkpoint import find_eval_checkpoint
from hyperpri_tpu.train.trainer import Trainer
from hyperpri_tpu.utils.segmaps import eval_color_segmaps


def _gather_predictions(trainer: Trainer, loader: DataLoader, state):
    """Run prediction; return flat (logits, masks) plus per-batch raw data."""
    logit_parts, mask_parts, batches = [], [], []
    for logits, masks, valid, names in trainer.predict(loader, state):
        keep = valid > 0
        logit_parts.append(logits[keep].reshape(-1))
        mask_parts.append(masks[keep].reshape(-1))
        batches.append((logits, masks, valid, names))
    return np.concatenate(logit_parts), np.concatenate(mask_parts), batches


def _load_eval_state(trainer: Trainer, cfg: ExperimentConfig, state=None):
    if state is not None:
        return state
    ckpt_path = find_eval_checkpoint(cfg.save_path)
    if ckpt_path is None:
        raise FileNotFoundError(
            f"no checkpoint under {cfg.save_path} (Checkpoints/ or best_wts.pt)"
        )
    print(f"   LOADING FROM CKPT FILE: {ckpt_path}")
    # Route by content, not extension (PLTrainer.py:270-330 handles Lightning
    # .ckpt files, raw .pt state dicts, and ZeRO-2 sharded dirs alike).
    from hyperpri_tpu.train.checkpoint import detect_checkpoint_format

    fmt = detect_checkpoint_format(ckpt_path)
    if fmt == "zero_dir":
        from hyperpri_tpu.train.torch_import import load_zero2_checkpoint_state

        return load_zero2_checkpoint_state(trainer, cfg, ckpt_path)
    if fmt == "torch":
        from hyperpri_tpu.train.torch_import import load_torch_checkpoint_state

        return load_torch_checkpoint_state(trainer, cfg, ckpt_path)
    return trainer.restore_state(ckpt_path)


def _eval_loader(data, cfg, trainer) -> DataLoader:
    image_dtype = None
    if cfg.precision == "bf16":
        import ml_dtypes

        image_dtype = ml_dtypes.bfloat16  # halve host->device ingest bytes
    return DataLoader(
        data,
        trainer.effective_batch(cfg.b_size["test"]),
        shuffle=False,
        sharding=trainer._batch_shardings(),
        image_dtype=image_dtype,
    )


# Ceiling on how many decoded cubes the segmap-eval LRU may pin in host RAM
# (~0.5 GB per f32 cube -> ~8 GB worst case). Splits larger than this fall
# back to per-batch reloads, the pre-cache behavior.
SEGMAP_CACHE_ITEMS_CAP = 16


@contextlib.contextmanager
def _segmap_image_cache(dataset, enabled: bool):
    """Hold decoded images in the dataset LRU across the predict + segmap
    passes so each cube is decoded at most once per eval (the segmap pass
    would otherwise re-read ~267 MB ENVI per displayed image). Sized to the
    split — eval splits are ~14 val / ~8 test images — but capped at
    SEGMAP_CACHE_ITEMS_CAP cubes of host RAM; restored on exit."""
    if not enabled or not hasattr(dataset, "set_cache_items"):
        yield
        return
    wanted = min(len(dataset), SEGMAP_CACHE_ITEMS_CAP)
    old = dataset.set_cache_items(max(wanted, dataset._cache_items))
    try:
        yield
    finally:
        dataset.set_cache_items(old)


def validate_net(
    val_data,
    params: ExperimentConfig,
    trainer: Optional[Trainer] = None,
    save_segmaps: bool = False,
    state=None,
    n_thresholds: int = 500,
    verbose: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    cfg = params
    trainer = trainer or Trainer(cfg)
    state = _load_eval_state(trainer, cfg, state)
    loader = _eval_loader(val_data, cfg, trainer)

    # The cache context spans predict + render so each cube decodes at most
    # once when the split fits the capped LRU; larger splits reload per batch.
    with _segmap_image_cache(val_data, save_segmaps):
        flat_logits, flat_masks, batches = _gather_predictions(trainer, loader, state)
        logits_d = jnp.asarray(flat_logits)
        masks_d = jnp.asarray(flat_masks)

        bce = bce_with_logits(logits_d, masks_d)
        probs = jax.nn.sigmoid(logits_d)
        precision, recall, thresholds = pr_curve(probs, masks_d, n_thresholds)
        best_thr, curve_prec, curve_rec = best_threshold_from_pr(precision, recall, thresholds)
        best_thr_f = float(best_thr)

        best_acc = binary_accuracy(probs, masks_d, best_thr_f)
        # Safe division: a degenerate curve point with P=R=0 (e.g. a model that
        # predicts nothing positive) must report dice 0.0, not NaN. The reference
        # shares the unguarded form (PLTrainer.py:556-557); divergence intended.
        pr_sum = curve_prec + curve_rec
        best_dice = jnp.where(pr_sum > 0, 2 * curve_prec * curve_rec / jnp.maximum(pr_sum, 1e-12), 0.0)
        best_iou = binary_jaccard(probs, masks_d, best_thr_f)
        ap = average_precision(probs, masks_d)
        conf = confusion_matrix(probs, masks_d, best_thr_f, normalize=True)

        if verbose:
            print(f"\n{cfg.model_name}\n   Best Threshold {best_thr_f:.3f}:")
            print(f"      BCE Loss : {float(bce):.3f}")
            print(f"      Pixel Acc: {float(best_acc):.3f}")
            print(f"      Precision: {float(curve_prec):.3f}")
            print(f"      Recall   : {float(curve_rec):.3f}")
            print(f"      DICE     : {float(best_dice):.3f}")
            print(f"      +IOU     : {float(best_iou):.3f}")
            print(f"      Avg Prec : {float(ap):.3f}\n")
            conf_np = np.asarray(conf)
            print(f"      Conf Mat : {conf_np[0].tolist()}")
            print(f"                 {conf_np[1].tolist()}")

        _save_pr_plot(recall, precision, float(ap), os.path.join(cfg.save_path, "pr_curve.png"))
        precision = patch_pr_tail(precision)

        if save_segmaps:
            for logits, masks, valid, names in batches:
                eval_color_segmaps(
                    _reload_images(val_data, names, valid), names, logits, masks,
                    cfg.fig_dir, dataset=cfg.dataset,
                    model_param_str=cfg.model_param_str,
                    threshold=best_thr_f, valid=valid,
                )

    return np.asarray(precision), np.asarray(recall), np.asarray(thresholds)


def test_net(
    test_data,
    params: ExperimentConfig,
    best_threshold: float,
    trainer: Optional[Trainer] = None,
    save_segmaps: bool = False,
    state=None,
    verbose: bool = True,
) -> dict:
    cfg = params
    trainer = trainer or Trainer(cfg)
    state = _load_eval_state(trainer, cfg, state)
    loader = _eval_loader(test_data, cfg, trainer)

    with _segmap_image_cache(test_data, save_segmaps):
        flat_logits, flat_masks, batches = _gather_predictions(trainer, loader, state)
        probs = jax.nn.sigmoid(jnp.asarray(flat_logits))
        masks_d = jnp.asarray(flat_masks)
        thr = float(best_threshold)

        results = {
            "pix_acc": float(binary_accuracy(probs, masks_d, thr)),
            "dice": float(binary_dice(probs, masks_d, thr, zero_division=1e-12)),
            "pos_iou": float(binary_jaccard(probs, masks_d, thr)),
            "avg_prec": float(average_precision(probs, masks_d)),
            "conf_mat": np.asarray(confusion_matrix(probs, masks_d, thr, normalize=True)),
            "threshold": thr,
        }
        if verbose:
            print(f"Threshold {thr:.3f}:")
            print(f"      Pixel Acc: {results['pix_acc']:.3f}")
            print(f"      DICE     : {results['dice']:.3f}")
            print(f"      +IOU     : {results['pos_iou']:.3f}")
            print(f"      Avg Prec : {results['avg_prec']:.3f}\n")
            print(f"      Conf Mat : {results['conf_mat'][0].tolist()}")
            print(f"                 {results['conf_mat'][1].tolist()}")

        if save_segmaps:
            for logits, masks, valid, names in batches:
                eval_color_segmaps(
                    _reload_images(test_data, names, valid), names, logits, masks,
                    cfg.fig_dir, dataset=cfg.dataset,
                    model_param_str=cfg.model_param_str,
                    threshold=thr, valid=valid,
                )
    return results


def _reload_images(dataset, names, valid) -> np.ndarray:
    """Re-read the display images for segmap rendering (prediction batches
    carry only tensors; cubes are cheap to re-read for the few eval images)."""
    by_name = {e.name: i for i, e in enumerate(dataset.files)}
    images = []
    for i, name in enumerate(names):
        if valid is not None and not valid[i]:
            images.append(None)
            continue
        images.append(dataset[by_name[name]]["image"])
    h, w, c = next(im.shape for im in images if im is not None)
    return np.stack([im if im is not None else np.zeros((h, w, c), np.float32) for im in images])


def _save_pr_plot(recall, precision, ap: float, path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path), exist_ok=True)
    plt.figure(dpi=120)
    plt.plot(np.asarray(recall), np.asarray(precision), label=f"AP = {ap:.3f}")
    plt.xlabel("Recall")
    plt.ylabel("Precision")
    plt.legend()
    plt.tight_layout()
    plt.savefig(path)
    plt.close()
