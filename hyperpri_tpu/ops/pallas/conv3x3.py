"""Pallas TPU kernel: fused 3x3 stride-1 SAME conv + bias + ReLU, NHWC.

The hot op of every model in this framework (SURVEY.md §2.2: cuDNN conv
kernels are the reference's FLOP carrier). Design:

  - implicit GEMM: for each (batch, H-tile, Cout-tile) grid cell, the kernel
    holds an (TH+2, W+2, Cin) input halo block and the (3, 3, Cin, TO)
    weight block in VMEM and issues 9 shifted (TH*W, Cin) x (Cin, TO)
    matmuls on the MXU, accumulating in float32 VMEM scratch;
  - the H halo comes from overlapping BlockSpec index maps over an input
    pre-padded by 1 pixel (zero SAME border), so no DMA choreography is
    needed and XLA pipelines the HBM->VMEM streams across grid steps;
  - bias add + optional ReLU fused into the epilogue, output cast to the
    compute dtype (bf16 by default).

Numerical contract: float32 accumulation regardless of input dtype
(preferred_element_type), matching XLA's conv on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Element block-dim: the index map yields *element* offsets for that axis,
# which is what overlapping halo windows need (stride th, window th+2).
from jax._src.pallas.core import Element  # noqa: E402  (not yet re-exported)


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, th: int, width: int, relu: bool):
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for dh in range(3):
        for dw in range(3):
            xs = x_ref[0, dh : dh + th, dw : dw + width, :]
            xs2 = xs.reshape(th * width, xs.shape[-1])
            acc_ref[...] += jax.lax.dot_general(
                xs2,
                w_ref[dh, dw],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = acc_ref[...] + b_ref[...].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[...] = y.reshape(1, th, width, o_ref.shape[-1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("relu", "th", "to", "out_dtype", "interpret")
)
def conv3x3_bias_act(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    *,
    relu: bool = True,
    th: int = 8,
    to: Optional[int] = None,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = act(conv3x3_same(x, w) + b) with (N, H, W, C) x, (3, 3, C, O) w."""
    n, h, width, c = x.shape
    kh, kw, wc, o = w.shape
    assert (kh, kw) == (3, 3) and wc == c, (w.shape, x.shape)
    out_dtype = out_dtype or x.dtype
    to = to or min(o, 128)
    th = min(th, h)

    # Pad: 1-pixel SAME border, plus bottom rows so every halo window
    # (stride th, size th+2) stays in bounds — OOB Element reads clamp the
    # window start (dynamic-slice semantics), which would shift tail tiles.
    n_h_blocks = pl.cdiv(h, th)
    bottom = n_h_blocks * th - h + 1
    xp = jnp.pad(x, ((0, 0), (1, bottom), (1, 1), (0, 0)))

    grid = (n, n_h_blocks, pl.cdiv(o, to))
    kernel = functools.partial(_conv_kernel, th=th, width=width, relu=relu)
    flops = 2 * n * h * width * c * o * 9

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Overlapping halo windows over the pre-padded H axis: window
            # th+2, stride th. Mosaic requires all-or-none Element dims, so
            # every axis uses Element with explicit element offsets.
            pl.BlockSpec(
                (Element(1), Element(th + 2), Element(width + 2), Element(c)),
                lambda bn, i, j: (bn, i * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, c, to), lambda bn, i, j: (0, 0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((to,), lambda bn, i, j: (j,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, width, to), lambda bn, i, j: (bn, i, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, width, o), out_dtype),
        scratch_shapes=[pltpu.VMEM((th * width, to), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * x.dtype.itemsize * 2, transcendentals=0
        ),
        interpret=interpret,
    )(xp, w, b)
