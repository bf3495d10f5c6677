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


# ---- BN-affine + ReLU backward epilogue (bwd_x mode) ----


def _bwd_ref(g, wt, pa, pb, r):
    """Oracle for the fused backward epilogue: dz = adjoint conv of g, then
    backward through z = relu(pa*r + pb)."""
    dz = xla_conv(g, wt, jnp.zeros((wt.shape[-1],), jnp.float32), relu=False)
    r32 = r.astype(jnp.float32)
    m = (r32 * pa + pb) > 0
    mdz = jnp.where(m, dz, 0.0)
    dx = mdz * pa
    dpa = jnp.sum(mdz * r32, axis=(0, 1, 2))
    dpb = jnp.sum(mdz, axis=(0, 1, 2))
    return dx, dpa, dpb


@pytest.mark.parametrize(
    "n,h,w,c,o,tw",
    [
        # tw=16, width=20 -> n_w=2, n_w*tw=32 vs wphys=24: bwd_shift=8, the
        # clamped last residual window must be realigned in-kernel.
        (1, 16, 20, 32, 64, 16),
        # shift-0 multi-tile control (width divisible by tw).
        (2, 12, 32, 16, 64, 16),
        # o < lane_stride: residual lane over-read garbage (lanes o..63)
        # must be masked out of dpa/dpb (0 * NaN would poison the sums).
        (1, 13, 20, 24, 48, 16),
        # o in (64, 128]: the r5 cap lift (conv_train._bnact_bwd routes
        # 64 < bc <= 128 boundaries here at the full 128-lane tap stride,
        # e.g. the 304x484 down1/up decoder DoubleConv boundaries).
        (1, 16, 24, 32, 128, 16),
        (1, 13, 20, 64, 96, 16),
    ],
)
def test_packed_bwd_epilogue(rng, n, h, w, c, o, tw):
    """conv3x3_packed(bwd_x=...) vs the unfused XLA oracle, exercising the
    static bwd_shift realignment of the raw residual's clamped last W block
    (production full-res shapes hit shift=8; see conv_train._bnact_bwd)."""
    g = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o,)) * 0.1).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(n, h, w, o)).astype(np.float32))
    zero_b = jnp.zeros((o,), jnp.float32)

    dx, (dpa, dpb) = conv3x3_packed(
        g, wt, zero_b, pa, pb, r, relu=False, tw=tw,
        lane_stride=64 if o <= 64 else 128,  # conv_train._bnact_bwd routing
        interpret=True,
    )
    dx2, dpa2, dpb2 = _bwd_ref(g, wt, pa, pb, r)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dpa), np.asarray(dpa2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dpb), np.asarray(dpb2), rtol=1e-4, atol=1e-4)
