"""Arena geometry (ops/pallas/conv3x3_packed + conv_train) vs the logical
path, interpret mode on CPU.

The arena frames logical pixel (0,0) at (8,8) of a larger buffer whose
borders/beyond-logical tiles are garbage; producers write through offset
Element windows and consumers mask. Numerics must be IDENTICAL to the
logical path (same dots, same masks) — these tests assert tight f32
equality on values and grads through the full fused-boundary chain
(conv1 arena_out -> bnact arena consumer -> arena dx/wgrad/residual).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.models.parts import arena_compatible
from hyperpri_tpu.ops.pallas.conv3x3_grad import conv3x3_wgrad
from hyperpri_tpu.ops.pallas.conv3x3_packed import arena_extent, conv3x3_packed
from hyperpri_tpu.ops.pallas.conv_train import (
    conv3x3_bias_stats_train,
    conv3x3_bnact_stats_train,
)


def _embed_arena(x_logical, eh, ew, op, fill=np.nan):
    """Reference arena builder: logical at (8,8), garbage elsewhere."""
    n, h, w, o = x_logical.shape
    buf = np.full((n, 8 + eh + 8, 8 + ew + 8, op), fill, np.float32)
    buf[:, 8 : 8 + h, 8 : 8 + w, :o] = np.asarray(x_logical)
    # producer-written beyond-logical tiles are finite (bias-valued) and
    # pad lanes are exact zeros; borders stay NaN (never written)
    buf[:, 8 : 8 + eh, 8 : 8 + ew, :][np.isnan(buf[:, 8 : 8 + eh, 8 : 8 + ew, :])] = 3.25
    buf[:, 8 : 8 + eh, 8 : 8 + ew, o:] = 0.0
    return jnp.asarray(buf)


@pytest.mark.parametrize("n,h,w,o", [(1, 16, 24, 64), (2, 13, 21, 64), (1, 12, 20, 20)])
def test_arena_out_interior_matches_logical(rng, n, h, w, o):
    c = 16
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    ref, (s_ref, ss_ref) = conv3x3_packed(
        x, wk, b, relu=False, with_stats=True, lane_stride=64, interpret=True
    )
    out, (s, ss) = conv3x3_packed(
        x, wk, b, relu=False, with_stats=True, lane_stride=64, interpret=True,
        arena_out=True,
    )
    eh, ew = arena_extent(h, w, c, o, x.dtype, x.dtype)
    assert out.shape == (n, eh + 16, ew + 16, ((o + 7) // 8) * 8), out.shape
    np.testing.assert_allclose(
        np.asarray(out[:, 8 : 8 + h, 8 : 8 + w, :o]), np.asarray(ref), atol=2e-5
    )
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref), rtol=1e-5)


@pytest.mark.parametrize("n,h,w,c1,o1,o2", [(1, 16, 24, 16, 64, 64), (2, 13, 21, 16, 20, 24)])
def test_arena_consumer_forward_matches_logical(rng, n, h, w, c1, o1, o2):
    """bnact consumer fed a hand-built arena (NaN borders!) must equal the
    logical-path bnact on the sliced tensor."""
    x1 = jnp.asarray(rng.normal(size=(n, h, w, o1)).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o1,)) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(3, 3, o1, o2)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(o2,)).astype(np.float32))
    eh, ew = arena_extent(h, w, c1, o1, jnp.float32, jnp.float32)
    xa = _embed_arena(x1, eh, ew, ((o1 + 7) // 8) * 8)

    y_ref, s_ref, ss_ref = conv3x3_bnact_stats_train(x1, pa, pb, w2, b2, True)
    y, s, ss = conv3x3_bnact_stats_train(xa, pa, pb, w2, b2, True, (h, w))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,h,w,o1,o2", [(1, 16, 24, 64, 64), (2, 13, 21, 20, 24)])
def test_arena_wgrad_matches_logical(rng, n, h, w, o1, o2):
    x1 = jnp.asarray(rng.normal(size=(n, h, w, o1)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h, w, o2)).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o1,)) * 0.1).astype(np.float32))
    eh, ew = arena_extent(h, w, 16, o1, jnp.float32, jnp.float32)
    xa = _embed_arena(x1, eh, ew, ((o1 + 7) // 8) * 8)
    ref = conv3x3_wgrad(x1, g, pa, pb, interpret=True)
    out = conv3x3_wgrad(xa, g, pa, pb, arena_in=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "n,h,w,c1,o1,o2",
    [
        (1, 16, 24, 16, 64, 64),
        (2, 13, 21, 16, 64, 64),   # ragged both: garbage tiles live
        (1, 12, 20, 16, 20, 24),   # non-8-multiple boundary channels
    ],
)
def test_arena_chain_values_and_grads_match_logical(rng, n, h, w, c1, o1, o2):
    """The full fused boundary — conv1(arena_out) -> bnact(arena) — must
    match the logical chain in value AND in every gradient (x, w1, b1, pa,
    pb, w2, b2), covering the arena dx (aval-matching the producer), the
    arena wgrad, and the arena residual read in the backward epilogue."""
    if not arena_compatible(h, w, c1, o1, o2, jnp.float32):
        pytest.skip("geometry not arena-compatible at this shape")
    x = jnp.asarray(rng.normal(size=(n, h, w, c1)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(3, 3, c1, o1)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o1,)) * 0.1).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(3, 3, o1, o2)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(o2,)).astype(np.float32))

    def loss(args, arena):
        x_, w1_, b1_, pa_, pb_, w2_, b2_ = args
        y1, s1, ss1 = conv3x3_bias_stats_train(x_, w1_, b1_, True, arena)
        y2, s2, ss2 = conv3x3_bnact_stats_train(
            y1, pa_, pb_, w2_, b2_, True, (h, w) if arena else None
        )
        # touch every output so every cotangent path is exercised
        return (
            jnp.mean(y2 * y2)
            + 0.1 * jnp.sum(s2)
            + 0.05 * jnp.sum(ss2)
            + 0.2 * jnp.sum(s1)
            + 0.03 * jnp.sum(ss1)
        )

    args = (x, w1, b1, pa, pb, w2, b2)
    v_ref, g_ref = jax.value_and_grad(loss)(args, False)
    v, g = jax.value_and_grad(loss)(args, True)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    for got, ref, name in zip(g, g_ref, ["x", "w1", "b1", "pa", "pb", "w2", "b2"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


@pytest.mark.parametrize("n,h,w,o1,o2,arena", [
    (1, 16, 24, 64, 64, False),
    (2, 13, 21, 20, 24, False),   # ragged H: padded fold path
    (1, 16, 24, 64, 64, True),    # arena-framed gy/y raw reads
    (2, 13, 21, 20, 24, True),
])
def test_wgrad_geff_fold_matches_materialized(rng, n, h, w, o1, o2, arena):
    """Fold mode (g_eff = gy + gsum + 2y*gsumsq and db computed IN the wgrad
    kernel from raw gy/y) must match the materialized-g_eff path exactly,
    including with arena-framed cotangents (NaN borders)."""
    x1 = jnp.asarray(rng.normal(size=(n, h, w, o1)).astype(np.float32))
    gy = jnp.asarray(rng.normal(size=(n, h, w, o2)).astype(np.float32))
    yv = jnp.asarray(rng.normal(size=(n, h, w, o2)).astype(np.float32))
    gs = jnp.asarray(rng.normal(size=(o2,)).astype(np.float32))
    gss = jnp.asarray((rng.normal(size=(o2,)) * 0.1).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o1,)) * 0.1).astype(np.float32))

    g_eff = gy + gs + 2.0 * yv * gss
    dw_ref = conv3x3_wgrad(x1, g_eff, pa, pb, interpret=True)
    db_ref = jnp.sum(g_eff, axis=(0, 1, 2))

    if arena:
        eh, ew = arena_extent(h, w, 16, o2, jnp.float32, jnp.float32)
        if (eh, ew) == (None, None) or eh is None:
            pytest.skip("no arena extent at this shape")
        op2 = ((o2 + 7) // 8) * 8
        gya = _embed_arena(gy, eh, ew, op2)
        ya = _embed_arena(yv, eh, ew, op2)
        dw, db = conv3x3_wgrad(
            x1, gya, pa, pb, y=ya, gsum=gs, gsumsq=gss,
            arena_g=True, logical_hw=(h, w), interpret=True,
        )
    else:
        dw, db = conv3x3_wgrad(
            x1, gy, pa, pb, y=yv, gsum=gs, gsumsq=gss, interpret=True,
        )
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref), rtol=1e-4, atol=1e-4)


def _embed_arena_zero(t, eh, ew):
    """Arena-g reference builder: zero-FILLED frame (the producer is a
    jnp.pad, so unlike producer-written arenas there is no garbage)."""
    n, h, w, o = t.shape
    buf = np.zeros((n, 8 + eh + 8, 8 + ew + 8, o), np.float32)
    buf[:, 8 : 8 + h, 8 : 8 + w, :] = np.asarray(t)
    return jnp.asarray(buf)


@pytest.mark.parametrize("n,h,w,o1,o2", [(1, 16, 24, 64, 64), (2, 13, 21, 20, 24)])
def test_wgrad_arena_g_materialized_matches_logical(rng, n, h, w, o1, o2):
    """Non-fold arena_g: the wgrad reading a MATERIALIZED zero-framed arena
    g_eff (conv_train._bnact_bwd's fused pad) must match the logical read."""
    from hyperpri_tpu.ops.pallas.conv3x3_packed import arena_g_extent

    x1 = jnp.asarray(rng.normal(size=(n, h, w, o1)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h, w, o2)).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o1,)) * 0.1).astype(np.float32))
    ext = arena_g_extent(h, w, o2, o1, jnp.float32, jnp.float32)
    if ext is None:
        pytest.skip("no arena-g extent at this shape")
    ga = _embed_arena_zero(g, *ext)
    ref = conv3x3_wgrad(x1, g, pa, pb, interpret=True)
    out = conv3x3_wgrad(x1, ga, pa, pb, arena_g=True, logical_hw=(h, w),
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,h,w,o1,o2", [(1, 16, 24, 64, 64), (2, 13, 21, 24, 24)])
def test_packed_bwd_arena_g_matches_logical(rng, n, h, w, o1, o2):
    """Packed bwd with arena_g (adjoint conv reading the zero-framed arena
    g_eff) and a LOGICAL residual must match the fully-logical bwd call —
    the composition a non-arena boundary would use."""
    from hyperpri_tpu.ops.pallas.conv3x3_packed import arena_g_extent

    g = jnp.asarray(rng.normal(size=(n, h, w, o2)).astype(np.float32))
    res = jnp.asarray(rng.normal(size=(n, h, w, o1)).astype(np.float32))
    wt = jnp.asarray((rng.normal(size=(3, 3, o2, o1)) * 0.1).astype(np.float32))
    pa = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    pb = jnp.asarray((rng.normal(size=(o1,)) * 0.1).astype(np.float32))
    zb = jnp.zeros((o2,), jnp.float32)
    ext = arena_g_extent(h, w, o2, o1, jnp.float32, jnp.float32)
    if ext is None:
        pytest.skip("no arena-g extent at this shape")
    ga = _embed_arena_zero(g, *ext)
    dx_ref, (dpa_ref, dpb_ref) = conv3x3_packed(
        g, wt, zb, pa, pb, res, relu=False, lane_stride=64, interpret=True
    )
    dx, (dpa, dpb) = conv3x3_packed(
        ga, wt, zb, pa, pb, res, relu=False, lane_stride=64, interpret=True,
        arena_g=True, logical_hw=(h, w),
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dpa), np.asarray(dpa_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dpb), np.asarray(dpb_ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n,h,w,c1,o1,o2", [(1, 16, 24, 40, 64, 64), (2, 13, 21, 64, 24, 24)])
def test_serving_arena_chain_matches_logical(rng, n, h, w, c1, o1, o2):
    """Serving chain: conv1(relu, arena_out) -> conv2(relu, arena_g) must
    equal the logical conv->relu->conv->relu chain. conv2's in-kernel valid
    mask supplies the SAME-pad zeros (the arena frame is unwritten garbage)."""
    from hyperpri_tpu.models.parts import serving_arena_compatible

    if not serving_arena_compatible(h, w, c1, o1, o2, jnp.float32):
        pytest.skip("geometry not serving-arena-compatible at this shape")
    x = jnp.asarray(rng.normal(size=(n, h, w, c1)).astype(np.float32))
    w1 = jnp.asarray((rng.normal(size=(3, 3, c1, o1)) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(o1,)).astype(np.float32))
    w2 = jnp.asarray((rng.normal(size=(3, 3, o1, o2)) * 0.1).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(o2,)).astype(np.float32))

    y1_ref = conv3x3_packed(x, w1, b1, relu=True, lane_stride=64, interpret=True)
    y2_ref = conv3x3_packed(y1_ref, w2, b2, relu=True, lane_stride=64, interpret=True)

    y1a = conv3x3_packed(x, w1, b1, relu=True, lane_stride=64, interpret=True,
                         arena_out=True)
    y2 = conv3x3_packed(y1a, w2, b2, relu=True, lane_stride=64, interpret=True,
                        arena_g=True, logical_hw=(h, w))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref), atol=2e-5)


def test_arena_compatible_model_shapes():
    # the production full-res boundaries must qualify (608x968, th=8, tw=488)
    assert arena_compatible(608, 968, 238, 64, 64, jnp.bfloat16)
    assert arena_compatible(608, 968, 64, 64, 64, jnp.bfloat16)
    assert arena_compatible(608, 968, 128, 64, 64, jnp.bfloat16)
    # >64-channel boundaries are packed-route-ineligible
    assert not arena_compatible(304, 484, 128, 128, 128, jnp.bfloat16)
