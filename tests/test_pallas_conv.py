"""Pallas fused conv3x3 kernel vs XLA conv oracle (interpret mode on CPU;
the same kernel is validated exact on real TPU hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.ops.pallas.conv3x3 import conv3x3_bias_act


def xla_conv(x, w, b, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize(
    "n,h,w,c,o,th",
    [
        (2, 16, 24, 8, 16, 8),
        (1, 10, 12, 8, 8, 4),   # ragged H tail
        (1, 9, 11, 16, 8, 4),   # odd everything
        (1, 7, 5, 4, 4, 8),     # th > h
        (1, 8, 8, 8, 136, 8),   # ragged O tail (to=128)
    ],
)
def test_conv3x3_matches_xla(rng, n, h, w, c, o, th):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    ref = xla_conv(x, wk, b)
    out = conv3x3_bias_act(x, wk, b, th=th, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_conv3x3_no_relu(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, 4, 8)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ref = xla_conv(x, wk, b, relu=False)
    out = conv3x3_bias_act(x, wk, b, relu=False, interpret=True)
    assert float(jnp.min(ref)) < 0  # negative values survive
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
