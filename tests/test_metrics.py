"""Metric tests against brute-force numpy oracles (torchmetrics semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.ops.losses import bce_with_logits
from hyperpri_tpu.ops.metrics import (
    StatScores,
    average_precision,
    best_threshold_from_pr,
    binary_accuracy,
    binary_dice,
    binary_jaccard,
    confusion_matrix,
    patch_pr_tail,
    pr_curve,
)


def make_data(rng, n=5000):
    probs = rng.uniform(0, 1, n).astype(np.float32)
    target = (rng.uniform(0, 1, n) < 0.3).astype(np.int32)
    return probs, target


def brute_counts(probs, target, thr, ge=False):
    pred = probs >= thr if ge else probs > thr
    tp = int(np.sum(pred & (target == 1)))
    fp = int(np.sum(pred & (target == 0)))
    fn = int(np.sum(~pred & (target == 1)))
    tn = int(np.sum(~pred & (target == 0)))
    return tp, fp, tn, fn


def test_bce_with_logits_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 3, (4, 7)).astype(np.float32)
    target = (rng.uniform(size=(4, 7)) < 0.4).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    theirs = float(
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits), torch.tensor(target))
    )
    assert abs(ours - theirs) < 1e-5


def test_point_metrics_match_bruteforce(rng):
    probs, target = make_data(rng)
    for thr in [0.3, 0.5, 0.7]:
        tp, fp, tn, fn = brute_counts(probs, target, thr)
        acc = (tp + tn) / probs.size
        dice = 2 * tp / (2 * tp + fp + fn)
        iou = tp / (tp + fp + fn)
        assert abs(float(binary_accuracy(jnp.asarray(probs), jnp.asarray(target), thr)) - acc) < 1e-6
        assert abs(float(binary_dice(jnp.asarray(probs), jnp.asarray(target), thr)) - dice) < 1e-6
        assert abs(float(binary_jaccard(jnp.asarray(probs), jnp.asarray(target), thr)) - iou) < 1e-6


def test_bool_preds_accepted(rng):
    probs, target = make_data(rng, 100)
    seg = probs > 0.5
    assert float(binary_accuracy(jnp.asarray(seg), jnp.asarray(target))) == pytest.approx(
        float(np.mean(seg == target.astype(bool)))
    )


def test_confusion_matrix(rng):
    probs, target = make_data(rng, 2000)
    tp, fp, tn, fn = brute_counts(probs, target, 0.4)
    mat = np.asarray(confusion_matrix(jnp.asarray(probs), jnp.asarray(target), 0.4))
    np.testing.assert_array_equal(mat, [[tn, fp], [fn, tp]])
    norm = np.asarray(confusion_matrix(jnp.asarray(probs), jnp.asarray(target), 0.4, normalize=True))
    np.testing.assert_allclose(norm[0], [tn / (tn + fp), fp / (tn + fp)], rtol=1e-6)


def test_stat_scores_streaming_equals_single_shot(rng):
    probs, target = make_data(rng, 3000)
    s = StatScores.zeros()
    for chunk in range(3):
        sl = slice(chunk * 1000, (chunk + 1) * 1000)
        s = s.update(jnp.asarray(probs[sl]), jnp.asarray(target[sl]), 0.5)
    tp, fp, tn, fn = brute_counts(probs, target, 0.5)
    assert (int(s.tp), int(s.fp), int(s.tn), int(s.fn)) == (tp, fp, tn, fn)


def test_pr_curve_matches_bruteforce(rng):
    probs, target = make_data(rng, 4000)
    T = 127
    prec, rec, thr = map(np.asarray, pr_curve(jnp.asarray(probs), jnp.asarray(target), T))
    assert prec.shape == (T + 1,) and rec.shape == (T + 1,) and thr.shape == (T,)
    assert prec[-1] == 1.0 and rec[-1] == 0.0
    ts = np.linspace(0, 1, T)
    total_pos = target.sum()
    for i in np.r_[0:T:9, T - 1]:
        tp, fp, tn, fn = brute_counts(probs, target, ts[i], ge=True)
        expect_p = 0.0 if tp + fp == 0 else tp / (tp + fp)
        assert prec[i] == pytest.approx(expect_p, abs=1e-6), f"threshold {ts[i]}"
        assert rec[i] == pytest.approx(tp / total_pos, abs=1e-6)


def test_pr_curve_exact_threshold_values():
    # Values sitting exactly on thresholds must be counted as positive (>=).
    probs = np.array([0.0, 0.5, 1.0], np.float32)
    target = np.array([0, 1, 1], np.int32)
    prec, rec, thr = map(np.asarray, pr_curve(jnp.asarray(probs), jnp.asarray(target), 3))
    # thresholds [0, .5, 1]; at t=0.5 preds {0.5, 1.0} -> tp=2, fp=0
    assert prec[1] == 1.0 and rec[1] == 1.0
    # at t=1.0 preds {1.0} -> tp=1
    assert prec[2] == 1.0 and rec[2] == pytest.approx(0.5)


def sklearn_style_ap(probs, target):
    order = np.argsort(-probs, kind="stable")
    p, y = probs[order], target[order]
    total_pos = y.sum()
    ap, prev_recall = 0.0, 0.0
    # walk unique thresholds in descending order
    k = 0
    n = len(p)
    tp = 0
    while k < n:
        j = k
        while j + 1 < n and p[j + 1] == p[k]:
            j += 1
        tp += y[k : j + 1].sum()
        precision = tp / (j + 1)
        recall = tp / total_pos
        ap += (recall - prev_recall) * precision
        prev_recall = recall
        k = j + 1
    return ap


def test_average_precision_matches_oracle(rng):
    probs, target = make_data(rng, 1500)
    ours = float(average_precision(jnp.asarray(probs), jnp.asarray(target)))
    oracle = sklearn_style_ap(probs, target)
    assert ours == pytest.approx(oracle, abs=1e-5)


def test_average_precision_with_ties():
    probs = np.array([0.9, 0.9, 0.9, 0.1, 0.1], np.float32)
    target = np.array([1, 0, 1, 0, 1], np.int32)
    ours = float(average_precision(jnp.asarray(probs), jnp.asarray(target)))
    oracle = sklearn_style_ap(probs, target)
    assert ours == pytest.approx(oracle, abs=1e-6)


def test_best_threshold_selection():
    # Build a curve whose best crop-interior dice is known.
    T = 500
    prec = np.linspace(1.0, 0.0, T + 1).astype(np.float32)
    rec = np.linspace(0.0, 1.0, T + 1).astype(np.float32)  # p + r = 1 -> dice <= 0.5
    # make an obvious peak at index 250
    prec[250], rec[250] = 0.9, 0.9
    thr = np.linspace(0, 1, T).astype(np.float32)
    best, p, r = best_threshold_from_pr(jnp.asarray(prec), jnp.asarray(rec), jnp.asarray(thr))
    assert p == pytest.approx(0.9) and r == pytest.approx(0.9)
    assert float(best) == pytest.approx(round(thr[250] * 100) / 100, abs=1e-6)


def test_patch_pr_tail():
    prec = jnp.asarray(np.array([0.5, 0.6, 0.8, 0.0, 1.0], np.float32))
    patched = np.asarray(patch_pr_tail(prec))
    assert patched[-2] == pytest.approx((1 + 0.8) / 2)
    untouched = np.asarray(patch_pr_tail(jnp.asarray(np.array([0.5, 0.6, 0.8, 0.7, 1.0], np.float32))))
    assert untouched[-2] == pytest.approx(0.7)


def test_best_threshold_oob_argmax_clamps():
    # precision/recall have T+1 entries, thresholds has T (torchmetrics
    # layout). If the argmax of dice lands on the final curve point, the
    # threshold gather index is out of bounds by one; jnp clamps to the last
    # threshold — pinned here as the intended parity behavior (the reference
    # shares the latent off-by-one, PLTrainer.py:547-555).
    import jax.numpy as jnp

    from hyperpri_tpu.ops.metrics import best_threshold_from_pr

    T = 10
    precision = jnp.concatenate([jnp.linspace(0.1, 0.5, T), jnp.array([1.0])])
    recall = jnp.concatenate([jnp.linspace(0.1, 0.5, T), jnp.array([1.0])])
    thresholds = jnp.linspace(0.0, 0.9, T)
    best, p, r = best_threshold_from_pr(precision, recall, thresholds)
    assert float(best) == pytest.approx(0.9)  # clamped to thresholds[-1]
    assert float(p) == pytest.approx(1.0) and float(r) == pytest.approx(1.0)
