"""Segmentation metrics in pure JAX, with torchmetrics-matching semantics.

Replaces the reference's torchmetrics stack (src/PLTrainer.py:23-24,62-68,
542-543,558-562,637-643):

  - Accuracy(task='binary')                  -> binary_accuracy
  - JaccardIndex(task='binary', threshold)   -> binary_jaccard
  - Dice(num_classes=2, ignore_index=0) and
    Dice(num_classes=1) both reduce to the positive-class micro dice
    2TP/(2TP+FP+FN)                          -> binary_dice
  - PrecisionRecallCurve('binary', thresholds=500) -> pr_curve
  - AveragePrecision(task='binary')          -> average_precision (exact,
    tie-aware, matching the thresholds=None sort-based computation)
  - BinaryConfusionMatrix(threshold)         -> confusion_matrix

Semantics preserved exactly:
  - thresholding is `prob > threshold` for point metrics (torchmetrics
    _binary_stat_scores_format) and `prob >= threshold` for the PR sweep
    (torchmetrics _binary_precision_recall_curve_update);
  - the PR sweep uses thresholds = linspace(0, 1, T) and appends the final
    (precision=1, recall=0) point, so precision/recall have length T+1;
  - safe division: 0/0 -> 0 (except dice, which takes a zero_division value,
    reference passes 1e-12).

TPU-first: the 500-threshold sweep is one bincount over threshold buckets
plus a reversed cumsum — O(pixels + T), not O(pixels * T).

A tiny StatScores accumulator mirrors torchmetrics' per-batch update /
epoch-end compute pattern for streaming epoch metrics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def _safe_div(num, den):
    num = num.astype(jnp.float32) if hasattr(num, "astype") else jnp.float32(num)
    den = jnp.asarray(den, jnp.float32)
    return jnp.where(den == 0, 0.0, jnp.asarray(num, jnp.float32) / jnp.where(den == 0, 1.0, den))


def _binarize(preds: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """torchmetrics point-metric formatting: floats are thresholded with >."""
    if jnp.issubdtype(preds.dtype, jnp.floating):
        return preds > threshold
    return preds.astype(bool)


class StatScores(NamedTuple):
    """Micro-accumulated binary confusion counts (float64-safe int32 sums)."""

    tp: jnp.ndarray
    fp: jnp.ndarray
    tn: jnp.ndarray
    fn: jnp.ndarray

    @classmethod
    def zeros(cls) -> "StatScores":
        z = jnp.zeros((), jnp.int32)
        return cls(z, z, z, z)

    def update(self, preds, target, threshold: float = 0.5, valid=None) -> "StatScores":
        """Accumulate counts; `valid` (broadcastable bool/0-1 mask) excludes
        padded samples/pixels from all four counts (fixed-shape batches)."""
        p = _binarize(preds, threshold)
        t = target.astype(bool)
        if valid is not None:
            v = jnp.broadcast_to(jnp.asarray(valid, bool), jnp.broadcast_shapes(p.shape, t.shape))
        else:
            v = jnp.ones((), bool)
        p, t = jnp.broadcast_arrays(p, t)
        tp = jnp.sum((p & t) & v, dtype=jnp.int32)
        fp = jnp.sum((p & ~t) & v, dtype=jnp.int32)
        tn = jnp.sum((~p & ~t) & v, dtype=jnp.int32)
        fn = jnp.sum((~p & t) & v, dtype=jnp.int32)
        return StatScores(self.tp + tp, self.fp + fp, self.tn + tn, self.fn + fn)

    def merge(self, other: "StatScores") -> "StatScores":
        return StatScores(
            self.tp + other.tp, self.fp + other.fp, self.tn + other.tn, self.fn + other.fn
        )


def accuracy_from_stats(s: StatScores) -> jnp.ndarray:
    return _safe_div(s.tp + s.tn, s.tp + s.tn + s.fp + s.fn)


def dice_from_stats(s: StatScores, zero_division: float = 0.0) -> jnp.ndarray:
    den = 2 * s.tp + s.fp + s.fn
    return jnp.where(den == 0, zero_division, (2 * s.tp) / jnp.maximum(den, 1).astype(jnp.float32))


def jaccard_from_stats(s: StatScores) -> jnp.ndarray:
    return _safe_div(s.tp, s.tp + s.fp + s.fn)


def binary_accuracy(preds, target, threshold: float = 0.5):
    return accuracy_from_stats(StatScores.zeros().update(preds, target, threshold))


def binary_dice(preds, target, threshold: float = 0.5, zero_division: float = 0.0):
    """Positive-class micro dice 2TP/(2TP+FP+FN).

    Equals torchmetrics Dice(num_classes=2, ignore_index=0) (train/val path,
    PLTrainer.py:64-67) and Dice(num_classes=1) on binarized preds (test path,
    PLTrainer.py:637-639).
    """
    return dice_from_stats(StatScores.zeros().update(preds, target, threshold), zero_division)


def binary_jaccard(preds, target, threshold: float = 0.5):
    return jaccard_from_stats(StatScores.zeros().update(preds, target, threshold))


def confusion_matrix(preds, target, threshold: float = 0.5, normalize: bool = False):
    """2x2 confusion matrix [[TN, FP], [FN, TP]]; optional row-normalization
    (the reference normalizes by true-class totals, PLTrainer.py:581,659)."""
    s = StatScores.zeros().update(preds, target, threshold)
    mat = jnp.array([[s.tn, s.fp], [s.fn, s.tp]], jnp.float32)
    if normalize:
        mat = mat / jnp.clip(mat.sum(axis=-1, keepdims=True), 1e-12)
    return mat


def pr_curve(probs: jnp.ndarray, target: jnp.ndarray, thresholds: int = 500):
    """Thresholded precision-recall curve, torchmetrics semantics.

    Returns (precision[T+1], recall[T+1], thresholds[T]) with
    thresholds = linspace(0, 1, T), preds compared with >=, safe 0/0 -> 0,
    and the appended final point (precision=1, recall=0).
    """
    t = jnp.linspace(0.0, 1.0, thresholds)
    p = probs.reshape(-1).astype(jnp.float32)
    y = target.reshape(-1).astype(bool)

    # Bucket of a prob = number of thresholds <= prob, minus 1. A prediction
    # is positive at threshold i iff bucket >= i. With uniform thresholds the
    # bucket is an O(1) computation instead of a searchsorted.
    scale = thresholds - 1
    bucket = jnp.clip(jnp.floor(p * scale).astype(jnp.int32), 0, thresholds - 1)
    # Guard against floating error at exact threshold values: prob >= t_i must
    # place prob in bucket >= i. t_i = i/(T-1); floor(p*(T-1)) is exact enough
    # for the 2-decimal thresholds used in practice, but correct the edge:
    bucket = jnp.where(p * scale >= bucket + 1, bucket + 1, bucket)

    pos_hist = jnp.zeros(thresholds, jnp.int32).at[bucket].add(y.astype(jnp.int32))
    neg_hist = jnp.zeros(thresholds, jnp.int32).at[bucket].add((~y).astype(jnp.int32))
    # tps[i] = # positives with prob >= t_i  (reversed cumulative sum)
    tps = jnp.cumsum(pos_hist[::-1])[::-1]
    fps = jnp.cumsum(neg_hist[::-1])[::-1]
    total_pos = jnp.sum(y)

    precision = _safe_div(tps, tps + fps)
    recall = _safe_div(tps, total_pos)
    precision = jnp.concatenate([precision, jnp.ones((1,), jnp.float32)])
    recall = jnp.concatenate([recall, jnp.zeros((1,), jnp.float32)])
    return precision, recall, t


def average_precision(probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Exact binary average precision (torchmetrics thresholds=None).

    AP = sum_k dRecall_k * Precision(threshold group of k), tie-aware: all
    predictions sharing a probability fall at one curve point whose precision
    is evaluated at the end of the tie group.
    """
    p = probs.reshape(-1).astype(jnp.float32)
    y = target.reshape(-1).astype(jnp.float32)
    n = p.shape[0]

    order = jnp.argsort(-p)
    p_sorted = p[order]
    y_sorted = y[order]

    cum_tp = jnp.cumsum(y_sorted)
    total_pos = cum_tp[-1]
    ranks = jnp.arange(1, n + 1, dtype=jnp.float32)
    precision = cum_tp / ranks

    # Boundary = last element of a tie group (prob differs from the next).
    boundary = jnp.concatenate([p_sorted[:-1] != p_sorted[1:], jnp.ones((1,), bool)])
    group_id = jnp.cumsum(boundary) - boundary.astype(jnp.int32)  # 0-indexed
    group_prec = jnp.zeros(n, jnp.float32).at[group_id].add(
        jnp.where(boundary, precision, 0.0)
    )
    contrib = y_sorted * group_prec[group_id]
    return _safe_div(jnp.sum(contrib), total_pos)


def best_threshold_from_pr(precision, recall, thresholds, crop_frac: int = 100):
    """Reference's best-DICE threshold selection (PLTrainer.py:545-555).

    Crops len(precision)//crop_frac entries from both ends, computes
    dice = 2PR/(P+R), picks argmax, rounds the threshold to 2 decimals.
    Returns (best_threshold, precision_at_best, recall_at_best).
    """
    pr_crop = int(len(precision) // crop_frac)
    end = -pr_crop if pr_crop else None  # guard: short curves are not cropped
    tp = precision[pr_crop:end]
    tr = recall[pr_crop:end]
    tt = thresholds[pr_crop:end]
    dice = _safe_div(2 * tp * tr, tp + tr)
    idx = jnp.argmax(dice)
    # Intentional parity quirk: precision/recall have T+1 entries but
    # thresholds has T, so after identical crops `idx` can exceed tt's last
    # index by one (the reference carries the same latent off-by-one,
    # PLTrainer.py:547-555). jnp indexing clamps out-of-bounds gathers, so
    # the final threshold is returned in that case — pinned by
    # tests/test_metrics.py::test_best_threshold_oob_argmax_clamps.
    best = jnp.round(tt[idx] * 100) / 100
    return best, tp[idx], tr[idx]


def patch_pr_tail(precision: jnp.ndarray) -> jnp.ndarray:
    """Reference's cosmetic interpolation of the undefined-precision tail
    (PLTrainer.py:597-600): if precision[-2] ~ 0, set it to (1+p[-3])/2."""
    return jnp.where(
        precision[-2] < 1e-6,
        precision.at[-2].set((1.0 + precision[-3]) / 2.0),
        precision,
    )
