#!/usr/bin/env python
"""Bisect which Mosaic ops the pool-bwd kernel can rely on: compile tiny
one-op Pallas kernels on the real chip and report compile/run/exactness per
op. Used to pin the pool_bwd formulation (rolls per axis, repeats, -inf)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = (8, 16, 128)  # (outer, sublane, lane)


def run_case(name, body, out_shape=S):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    x = jnp.asarray(np.random.default_rng(0).normal(size=S).astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(x)
        ref = body(x)
        dev = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name:28s} OK   dev={dev:.1e}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:110]
        print(f"{name:28s} FAIL {type(e).__name__}: {msg}", flush=True)


def main():
    run_case("roll_axis0", lambda x: pltpu.roll(x, 1, 0))
    run_case("roll_axis1", lambda x: pltpu.roll(x, 1, 1))
    run_case("repeat_axis0", lambda x: jnp.repeat(x[:4], 2, axis=0))
    run_case("repeat_axis1", lambda x: jnp.repeat(x[:, :8], 2, axis=1))
    run_case("neg_inf_where", lambda x: jnp.where(x > 0, jnp.full_like(x, -jnp.inf), x))
    run_case("stride2_axis0", lambda x: jnp.concatenate([x[0::2], x[1::2]], 0))
    run_case(
        "stack_reshape_axis0",
        lambda x: jnp.stack([x[:4], x[4:]], axis=1).reshape(8, 16, 128),
    )
    run_case(
        "bcast_reshape_axis1",
        lambda x: jnp.broadcast_to(x[:, :8, None, :], (8, 8, 2, 128)).reshape(8, 16, 128),
    )


if __name__ == "__main__":
    main()
