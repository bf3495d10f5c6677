"""Tap-packed Pallas conv3x3 (ops/pallas/conv3x3_packed.py) vs XLA oracle
(interpret mode on CPU; validated on real TPU hardware both lane strides)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.ops.pallas.conv3x3_packed import conv3x3_packed


def xla_conv(x, w, b, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b
    return jnp.maximum(y, 0.0) if relu else y


@pytest.mark.parametrize("lane_stride", [None, 64])
@pytest.mark.parametrize(
    "n,h,w,c,o,th,tw",
    [
        (2, 16, 24, 8, 16, 8, None),
        (1, 10, 12, 8, 8, 4, None),     # ragged H tail
        (1, 9, 11, 16, 8, 4, None),     # odd everything
        (1, 7, 5, 4, 4, 8, None),       # th > h
        (1, 12, 30, 64, 64, 4, 16),     # explicit W tiling, ragged W tail
        (2, 16, 11, 130, 8, 8, 8),      # >128 input channels + W tiles
    ],
)
def test_packed_matches_xla(rng, lane_stride, n, h, w, c, o, th, tw):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    ref = xla_conv(x, wk, b)
    out = conv3x3_packed(x, wk, b, th=th, tw=tw, lane_stride=lane_stride, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_no_relu_and_o128(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 10, 12)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, 12, 128)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))
    ref = xla_conv(x, wk, b, relu=False)
    out = conv3x3_packed(x, wk, b, relu=False, interpret=True)
    assert float(jnp.min(ref)) < 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_rejects_wide_output(rng):
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    wk = jnp.zeros((3, 3, 8, 136), jnp.float32)
    b = jnp.zeros((136,), jnp.float32)
    with pytest.raises(AssertionError):
        conv3x3_packed(x, wk, b, interpret=True)
