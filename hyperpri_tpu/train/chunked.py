"""Chunked-pixel gradient-accumulation training (SpectralUNET memory control).

The training counterpart of ops/chunked.py (which streams the pixel axis for
INFERENCE): the train step splits the batch's pixels into `n_chunks` fixed-
size chunks, runs forward+backward per chunk under lax.scan, accumulates
gradients / loss numerator / confusion counts across chunks, and applies ONE
optimizer update — so peak activation memory is O(chunk * width) instead of
O(N*H*W * width) and the reference's full paper protocol for SpectralUNET
(batch 2, (608,700) crops, bn_feats=1650 — which needed >=2 GPUs under
DeepSpeed ZeRO-2, /root/reference/README.md:67-68, src/PLTrainer.py:421-433)
trains on ONE 16 GB chip.

BatchNorm semantics across chunks
---------------------------------
Per-pixel models couple pixels ONLY through BatchNorm batch statistics. This
trainer takes BN statistics PER CHUNK (and updates running stats sequentially
chunk-by-chunk), which is exactly the REFERENCE's own training semantics when
n_chunks == batch size: the reference rasterizes each image separately in a
Python loop (/root/reference/src/Experiments/models.py:132-141), so its BN1d
batch statistics are per-image, its running stats update once per image, and
its backward differentiates through per-image stats. hyperpri_tpu's unchunked
trainer intentionally takes joint stats over all pixels of the batch (one
(N*H*W, C) matmul stack — models/spectral_unet.py docstring); this trainer at
n_chunks=N reproduces the reference's per-image semantics instead.

With n_chunks == 1 the step is numerically IDENTICAL to the unchunked train
step (regression-tested). For sub-image chunks (n_chunks > N) the statistics
are "ghost batch norm" over >=100K pixels each — the equivalence test pins
the gradient direction to the unchunked step's at small shapes.

An exact-joint-stats chunked step cannot stream in one pass: layer k+1's
batch statistics depend on ALL chunks' layer-k outputs (and the backward's
per-layer stat reductions couple the same way top-down), so exactness costs
either O(L) re-passes per layer or host round-trips of every activation. The
exact single-chip answer to that is the host-offload remat path
(trainer.spectral_offload_policy + SpectralUNET(offload=True)), which keeps
unchunked numerics bit-for-bit; this module is the fast reference-semantics
alternative. Both are measured in BENCHMARKS.md.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from hyperpri_tpu.ops.losses import bce_with_logits
from hyperpri_tpu.ops.metrics import StatScores
from hyperpri_tpu.train.trainer import TrainState, _squeeze_last


def make_chunked_train_step(threshold: float, n_chunks: int, remat_policy=None,
                            apply_fn=None):
    """Build a jittable chunked train step.

    The batch's (N, H, W, C) image is rasterized to (N*H*W, C) pixel rows
    (image-major, so chunk boundaries at multiples of H*W are image
    boundaries: n_chunks=N == the reference's per-image loop), zero-padded to
    n_chunks equal chunks, and scanned. Each chunk runs the model on a
    (1, chunk, 1, C) view — SpectralUNET is per-pixel, so any spatial
    factorization of the same rows produces the same values.

    Gradients are summed across chunks against the GLOBAL valid-pixel
    denominator, so the accumulated gradient equals the gradient of the
    whole-batch mean BCE (with per-chunk BN stats). Padding pixels carry
    zero loss weight and a False metrics mask; they do enter chunk BN
    statistics only as all-zero rows of the final partial chunk — avoided
    entirely when n_chunks divides the pixel count (the production configs:
    N*H*W is divisible by N and by 8 for every protocol shape).
    """

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        image, mask, valid = batch["image"], batch["mask"], batch["valid"]
        n, h, w, c = image.shape
        total = n * h * w
        chunk = -(-total // n_chunks)  # ceil-div; last chunk zero-padded
        padded = chunk * n_chunks

        pixels = image.reshape(total, c)
        targets = _squeeze_last(mask)[0].reshape(total).astype(jnp.float32)
        pix_valid = jnp.broadcast_to(
            (valid.reshape(n, 1) > 0), (n, h * w)
        ).reshape(total)
        if padded != total:
            pixels = jnp.pad(pixels, ((0, padded - total), (0, 0)))
            targets = jnp.pad(targets, (0, padded - total))
            pix_valid = jnp.pad(pix_valid, (0, padded - total))
        pixels = pixels.reshape(n_chunks, chunk, c)
        targets = targets.reshape(n_chunks, chunk)
        pix_valid = pix_valid.reshape(n_chunks, chunk)

        # Whole-batch mean-BCE denominator (masked_bce's): #valid samples
        # times pixels-per-sample — identical to the unchunked step's.
        denom = jnp.maximum(jnp.sum(valid.astype(jnp.float32)) * (h * w), 1.0)

        def chunk_loss(params, batch_stats, px, tg, vmask):
            logits, updates = (apply_fn or state.apply_fn)(
                {"params": params, "batch_stats": batch_stats},
                px[None, :, None, :],
                train=True,
                mutable=["batch_stats"],
            )
            logits = logits.reshape(chunk)
            per = bce_with_logits(logits, tg, reduction="none")
            wgt = vmask.astype(jnp.float32)
            loss_num = jnp.sum(per * wgt)
            return loss_num / denom, (logits, updates["batch_stats"])

        if remat_policy is not None:
            chunk_loss = jax.checkpoint(
                chunk_loss, policy=remat_policy, static_argnums=()
            )
        grad_fn = jax.value_and_grad(chunk_loss, has_aux=True)

        def body(carry, xs):
            grads_acc, loss_acc, stats_acc, bstats = carry
            px, tg, vmask = xs
            (loss_c, (logits, bstats)), grads = grad_fn(
                state.params, bstats, px, tg, vmask
            )
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            probs = jax.nn.sigmoid(logits)
            stats_acc = stats_acc.update(probs, tg > 0.5, threshold, valid=vmask)
            return (grads_acc, loss_acc + loss_c, stats_acc, bstats), None

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss, stats, new_bstats), _ = jax.lax.scan(
            body,
            (zero_grads, jnp.zeros(()), StatScores.zeros(), state.batch_stats),
            (pixels, targets, pix_valid),
        )
        state = state.apply_gradients(grads=grads, batch_stats=new_bstats)
        n_valid = jnp.sum(valid)
        logs = {"loss_sum": loss * n_valid, "n": n_valid, "stats": stats}
        return state, logs

    return train_step
