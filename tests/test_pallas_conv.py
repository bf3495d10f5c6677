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
        (1, 12, 10, 64, 64, 4),  # tap-packed mode (C==64)
        (2, 16, 11, 64, 8, 8),   # tap-packed, odd W + small O
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


# ---- training path: custom VJP (wgrad kernel + adjoint-conv dX) ----


@pytest.mark.parametrize(
    "n,h,w,c,o",
    [
        (2, 16, 24, 8, 16),
        (1, 9, 11, 16, 8),    # odd spatial
        (1, 10, 12, 136, 8),  # >128 input channels (2 lane chunks)
        (1, 12, 10, 64, 64),  # tap-packed mode (C==64)
    ],
)
def test_conv3x3_train_grads_match_xla(rng, n, h, w, c, o):
    from hyperpri_tpu.ops.pallas.conv_train import conv3x3_bias_train

    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))

    def loss_pallas(x, wk, b):
        y = conv3x3_bias_train(x, wk, b, True)  # interpret mode
        return jnp.sum(y * jnp.cos(y.astype(jnp.float32)))

    def loss_xla(x, wk, b):
        y = xla_conv(x, wk, b, relu=False)
        return jnp.sum(y * jnp.cos(y))

    ref_l, ref_g = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(x, wk, b)
    out_l, out_g = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(x, wk, b)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-5)
    for got, want, name in zip(out_g, ref_g, ["dx", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-4,
            err_msg=f"{name} mismatch",
        )


def test_conv3x3_wgrad_kernel_direct(rng):
    from hyperpri_tpu.ops.pallas.conv3x3_grad import conv3x3_wgrad

    n, h, w, c, o = 2, 12, 10, 8, 16
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h, w, o)).astype(np.float32))

    def fwd(wk):
        return jnp.sum(
            jax.lax.conv_general_dilated(
                x, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            * g
        )

    ref = jax.grad(fwd)(jnp.zeros((3, 3, c, o), jnp.float32))
    out = conv3x3_wgrad(x, g, interpret=True)
    assert out.shape == (3, 3, c, o) and out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_conv3x3_with_stats(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 12, 8)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, 8, 16)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    y, stats = conv3x3_bias_act(x, wk, b, relu=False, with_stats=True, th=4, interpret=True)
    ref = xla_conv(x, wk, b, relu=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(stats[0]), np.asarray(jnp.sum(ref, axis=(0, 1, 2))), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats[1]), np.asarray(jnp.sum(ref * ref, axis=(0, 1, 2))), rtol=1e-5
    )


def test_conv3x3_stats_train_grads(rng):
    """Gradients through (y, sum, sumsq) match autodiff of the XLA ops —
    including the cotangent folding g_eff = gy + gsum + 2*y*gsumsq."""
    from hyperpri_tpu.ops.pallas.conv_train import conv3x3_bias_stats_train

    x = jnp.asarray(rng.normal(size=(1, 9, 11, 8)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, 8, 8)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    def loss_pallas(x, wk, b):
        y, s, ss = conv3x3_bias_stats_train(x, wk, b, True)
        mean = s / y[..., 0].size
        var = ss / y[..., 0].size - mean**2
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(yn * jnp.cos(yn))

    def loss_xla(x, wk, b):
        y = xla_conv(x, wk, b, relu=False)
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.mean(y * y, axis=(0, 1, 2)) - mean**2
        yn = (y - mean) * jax.lax.rsqrt(var + 1e-5)
        return jnp.sum(yn * jnp.cos(yn))

    ref_l, ref_g = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(x, wk, b)
    out_l, out_g = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(x, wk, b)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-5)
    for got, want, nm in zip(out_g, ref_g, ["dx", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3, err_msg=nm
        )


# ---- fused BN-apply + ReLU prologue (conv3x3_bnact_stats_train) ----


def _bnact_ref(x, pa, pb, w, b):
    z = jnp.maximum(x.astype(jnp.float32) * pa + pb, 0.0).astype(x.dtype)
    y = xla_conv(z, w, b, relu=False)
    return y, jnp.sum(y, axis=(0, 1, 2)), jnp.sum(y * y, axis=(0, 1, 2))


@pytest.mark.parametrize(
    "n,h,w,c,o",
    [
        (2, 16, 24, 32, 16),   # packed route (O <= 64)
        (1, 13, 21, 96, 64),   # packed, ragged spatial
        (2, 12, 20, 64, 96),   # halo route (O > 64)
        (1, 9, 17, 160, 128),  # halo, 2 input lane chunks
    ],
)
def test_conv3x3_bnact_prologue(rng, n, h, w, c, o):
    """Fused relu(pa*x+pb) input prologue: forward + all five gradients
    (dx, dpa, dpb, dw, db) match autodiff of the unfused XLA ops, on both
    kernel routes. The prologue masks the padding border back to exact
    zeros (relu(pb) would otherwise leak into the halo)."""
    from hyperpri_tpu.ops.pallas.conv_train import conv3x3_bnact_stats_train

    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))

    y1, s1, ss1 = conv3x3_bnact_stats_train(x, pa, pb, wk, b, True)
    y2, s2, ss2 = _bnact_ref(x, pa, pb, wk, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ss1), np.asarray(ss2), rtol=1e-4)

    def loss(args, fused):
        x_, pa_, pb_, w_, b_ = args
        if fused:
            y, s, ss = conv3x3_bnact_stats_train(x_, pa_, pb_, w_, b_, True)
        else:
            y, s, ss = _bnact_ref(x_, pa_, pb_, w_, b_)
        mod = jnp.cos(jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape) * 0.01)
        return jnp.sum(y * mod) + jnp.sum(s * 0.3) + jnp.sum(ss * 0.01)

    g1 = jax.grad(lambda a: loss(a, True))((x, pa, pb, wk, b))
    g2 = jax.grad(lambda a: loss(a, False))((x, pa, pb, wk, b))
    for got, want, nm in zip(g1, g2, ["dx", "dpa", "dpb", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-3, rtol=1e-3, err_msg=nm
        )


def test_bnact_prologue_border_zero(rng):
    """A strongly positive shift (relu(pb) > 0 everywhere) must still yield
    the same result as the unfused reference — i.e. the prologue's border
    masking reproduces the conv's zero padding exactly."""
    from hyperpri_tpu.ops.pallas.conv_train import conv3x3_bnact_stats_train

    c, o = 8, 8
    x = jnp.asarray(rng.normal(size=(1, 8, 9, c)).astype(np.float32))
    pa = jnp.ones((c,), jnp.float32) * 0.5
    pb = jnp.ones((c,), jnp.float32) * 3.0  # relu(pb)=3 in any unmasked border
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.zeros((o,), jnp.float32)
    y1, _, _ = conv3x3_bnact_stats_train(x, pa, pb, wk, b, True)
    y2, _, _ = _bnact_ref(x, pa, pb, wk, b)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)


def test_conv3x3_wgrad_prologue(rng):
    """Direct wgrad with the recomputed-activation prologue."""
    from hyperpri_tpu.ops.pallas.conv3x3_grad import conv3x3_wgrad

    n, h, w, c, o = 1, 10, 12, 8, 8
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(c,)) * 0.1).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h, w, o)).astype(np.float32))

    def fwd(wk):
        z = jnp.maximum(x * pa + pb, 0.0)
        return jnp.sum(xla_conv(z, wk, jnp.zeros((o,)), relu=False) * g)

    ref = jax.grad(fwd)(jnp.zeros((3, 3, c, o), jnp.float32))
    out = conv3x3_wgrad(x, g, pa, pb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_mosaic_version_pins_current():
    """The Mosaic behavior pins (Element OOB semantics, 8-divisible offsets,
    VMEM accounting) are validated against exact jax/jaxlib/libtpu versions;
    this fails loudly on an upgrade so the kernel matrix gets re-run."""
    from hyperpri_tpu.ops import pallas as pallas_pkg

    assert pallas_pkg.check_mosaic_version_pins(), (
        pallas_pkg._installed_versions(), pallas_pkg.VALIDATED_VERSIONS)
