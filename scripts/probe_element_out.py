#!/usr/bin/env python
"""Crux probe for the arena-geometry plan (TODO.md): Pallas TPU kernels CAN
write through Element-indexed OUTPUT windows at offset (+8, +8) into a
larger-than-grid buffer — the precondition for producers emitting conv
outputs directly in a bordered arena (no separate slice + re-pad).

Measured findings (v5e, 2026-08-18):
  - offset +1 on H fails Mosaic ("Couldn't prove that tiling (8) divides
    index ... on dimension 0"): OUTPUT window offsets must be 8-divisible
    on EVERY non-lane dim, including the untiled H dim — so the arena needs
    8-row top borders, not 1.
  - a numerically 8-divisible index like `i*th + 8` STILL fails the proof;
    it must be written syntactically as `(i*(th//8) + 1) * 8` (same rule as
    the clamped input windows in conv3x3_packed's bwd_x spec).
  - with both, compile + run succeed and the interior matches exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element


def _kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def run(interpret):
    n, h, w, c = 1, 16, 24, 128
    th, tw = 8, 16
    n_h, n_w = h // th, w // tw + 1  # ragged W on purpose
    x = jnp.arange(n * h * 32 * c, dtype=jnp.float32).reshape(n, h, 32, c)[:, :, :24, :]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, n_w * tw - w), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=(n, n_h, n_w),
        in_specs=[pl.BlockSpec((1, th, tw, c), lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (Element(1), Element(th), Element(tw), Element(c)),
            lambda b, i, j: (b, (i * (th // 8) + 1) * 8, (j * (tw // 8) + 1) * 8, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, 8 + n_h * th + 8, 8 + n_w * tw + 8, c),
                                       jnp.float32),
        interpret=interpret,
    )(xp)
    got = out[:, 8:8 + h, 8:8 + w, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(xp[:, :, :w, :] * 2.0))
    print(f"ELEMENT-OUT arena write OK interpret={interpret} out={out.shape}")


if __name__ == "__main__":
    run(True)
    if jax.default_backend() == "tpu":
        run(False)
