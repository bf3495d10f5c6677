"""Segmentation-map rendering: prediction-vs-ground-truth overlays.

Parity target: eval_color_segmaps (/root/reference/src/PLTrainer.py:219-267):
  - HSI cubes become pseudo-RGB from band indices [125, 49, 0] of the
    238-band window (~700/546/436 nm) with gamma 1/2.2 correction;
  - colorblind-safe palette: red = prediction only, blue = ground truth
    only, green = agreement; overlay alpha 0.6;
  - one figure per image saved to {fig_dir}/{name}_seg.png.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

HSI_PSEUDO_RGB_BANDS = [125, 49, 0]  # R ~700nm, G ~546nm, B ~436nm
RED = np.array([202, 0, 32]) / 255.0  # prediction only
BLUE = np.array([5, 133, 176]) / 255.0  # ground truth only
GREEN = np.array([155, 191, 133]) / 255.0  # agreement


def to_display_rgb(image_hwc: np.ndarray, dataset: str) -> np.ndarray:
    """(H, W, C) image -> (H, W, 3) display RGB (gamma-corrected pseudo-RGB
    for HSI, PLTrainer.py:236-240)."""
    if dataset.lower() == "hsi":
        bands = [min(b, image_hwc.shape[-1] - 1) for b in HSI_PSEUDO_RGB_BANDS]
        rgb = image_hwc[..., bands]
        return np.clip(rgb, 0, None) ** (1 / 2.2)
    return np.clip(image_hwc[..., :3], 0, 1)


def overlay_mask(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """(H, W) bool pred/gt -> (H, W, 3) colorblind overlay (PLTrainer.py:245-258)."""
    h, w = pred.shape
    out = np.zeros((h, w, 3))
    out[..., 0] = pred
    out[..., 1] = gt
    out[pred, :] = RED
    out[gt, :] = BLUE
    out[pred & gt, :] = GREEN
    return out


def eval_color_segmaps(
    batch_img: np.ndarray,
    batch_name: Sequence[str],
    batch_pred_logits: np.ndarray,
    batch_mask: np.ndarray,
    fig_dir: str,
    dataset: str = "RGB",
    model_param_str: str = "",
    threshold: float = 0.5,
    valid: Optional[np.ndarray] = None,
) -> list:
    """Render and save overlays for one batch; returns written paths."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(fig_dir, exist_ok=True)
    written = []
    for idx in range(batch_img.shape[0]):
        if valid is not None and not valid[idx]:
            continue
        name = batch_name[idx]
        img = to_display_rgb(np.asarray(batch_img[idx]), dataset)
        probs = 1.0 / (1.0 + np.exp(-np.asarray(batch_pred_logits[idx], np.float64)))
        pred = (probs > threshold).squeeze(-1).astype(bool)
        gt = np.asarray(batch_mask[idx]).squeeze(-1).astype(bool)
        overlay = overlay_mask(pred, gt)

        fig = plt.figure(dpi=200)
        plt.title(f"{model_param_str} - {name}")
        plt.imshow(img)
        plt.imshow(overlay, alpha=0.6)
        plt.tick_params(axis="both", labelsize=0, length=0)
        path = os.path.join(fig_dir, f"{name}_seg.png")
        fig.savefig(path, dpi=200, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written
