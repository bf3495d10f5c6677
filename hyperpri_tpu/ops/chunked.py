"""Chunked inference for per-pixel models (SpectralUNET memory control).

At full 608x968 resolution a single SpectralUNET activation is
(588K pixels, 1650) floats — the reason the reference needed ZeRO-2 across
2 GPUs (README.md:68). For inference there is no cross-pixel coupling (BN
uses running stats), so the pixel axis can be streamed through the model in
fixed-size chunks with lax.map: peak activation memory becomes
O(chunk * width) instead of O(H*W * width), at full MXU utilization for
chunks >= a few thousand pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_pixelwise_chunked(model, variables, x: jnp.ndarray, chunk: int = 65536):
    """Eval-mode apply of a pixelwise model over (N, H, W, D) in pixel chunks.

    Returns (N, H, W, n_classes) logits, identical to
    model.apply(variables, x, train=False) for per-pixel models.
    """
    n, h, w, d = x.shape
    total = n * h * w
    pixels = x.reshape(total, d)
    n_chunks = -(-total // chunk)
    padded = n_chunks * chunk
    if padded != total:
        pixels = jnp.pad(pixels, ((0, padded - total), (0, 0)))
    chunks = pixels.reshape(n_chunks, chunk, d)

    def run(block):
        # (chunk, D) -> (1, chunk, 1, D) image for the model's NHWC contract
        out = model.apply(variables, block[None, :, None, :], train=False)
        return out[0, :, 0, :]

    out = jax.lax.map(run, chunks)
    out = out.reshape(padded, -1)[:total]
    return out.reshape(n, h, w, -1)
