from hyperpri_tpu.ops.chunked import apply_pixelwise_chunked
from hyperpri_tpu.ops.fold_bn import fold_batch_norm
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

__all__ = [
    "apply_pixelwise_chunked",
    "fold_batch_norm",
    "bce_with_logits",
    "StatScores",
    "average_precision",
    "best_threshold_from_pr",
    "binary_accuracy",
    "binary_dice",
    "binary_jaccard",
    "confusion_matrix",
    "patch_pr_tail",
    "pr_curve",
]
