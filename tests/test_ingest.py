"""Host pre-padded ingest (ops/pallas conv3x3_packed pre_padded /
conv3x3_wgrad pre_padded_c / conv_train pre_padded_hw), interpret mode on CPU.

The host writes each cube into a zeroed buffer with the exact pad geometry
the packed forward would otherwise build in-graph (logical (0,0) at (1,1),
lanes zero-extended to round_up(C,128)); the fwd and wgrad kernels read it
raw, so the shared full-resolution input pad — ~1.9 ms/step for CubeNET's
238->256 first conv (BENCHMARKS.md round-3 hlo_stats) — never runs on
device. Numerics must be IDENTICAL to the logical path: same buffer bytes,
same windows, same dots.

Reference behavior being accelerated: the first Conv3d of
/root/reference/src/Experiments/models.py:169 (CubeNET spectral collapse).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.models.parts import first_conv_ingest_spec
from hyperpri_tpu.ops.pallas.conv3x3_grad import conv3x3_wgrad
from hyperpri_tpu.ops.pallas.conv3x3_packed import conv3x3_packed, fit_tiles
from hyperpri_tpu.ops.pallas.conv_train import _PACKED_LS, conv3x3_bias_stats_train


def _spec(h, w, c, o, dtype=jnp.float32):
    """Ingest geometry without the TPU-backend route gate (interpret tests)."""
    th, tw = fit_tiles(h, w, c, o, dtype, dtype, lane_stride=_PACKED_LS)
    n_h, n_w = -(-h // th), -(-w // tw)
    return (n_h * th + 2, n_w * tw + 8, -(-c // 128) * 128), (1, 1)


def _pre_pad(x, spec):
    """Host-side framing: the crop lands at (1,1) of a zeroed buffer."""
    (hp, wp, cp), (r0, c0) = spec
    n, h, w, c = x.shape
    buf = np.zeros((n, hp, wp, cp), np.asarray(x).dtype)
    buf[:, r0 : r0 + h, c0 : c0 + w, :c] = np.asarray(x)
    return jnp.asarray(buf)


@pytest.mark.parametrize("n,h,w,c,o", [(1, 16, 24, 37, 64), (2, 13, 21, 130, 24)])
def test_pre_padded_forward_matches_logical(rng, n, h, w, c, o):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    ref, (s_ref, ss_ref) = conv3x3_packed(
        x, wk, b, relu=False, with_stats=True, lane_stride=64, interpret=True
    )
    xp = _pre_pad(x, _spec(h, w, c, o))
    out, (s, ss) = conv3x3_packed(
        xp, wk, b, relu=False, with_stats=True, lane_stride=64, interpret=True,
        logical_hw=(h, w), pre_padded=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(ss), np.asarray(ss_ref))


@pytest.mark.parametrize("n,h,w,c,o", [(1, 16, 24, 37, 64), (2, 13, 21, 130, 24)])
def test_pre_padded_wgrad_matches_logical(rng, n, h, w, c, o):
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(n, h, w, o)).astype(np.float32))
    ref = conv3x3_wgrad(x, g, interpret=True)
    xp = _pre_pad(x, _spec(h, w, c, o))
    dw = conv3x3_wgrad(xp, g, pre_padded_c=c, interpret=True)
    assert dw.shape == (3, 3, c, o)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("arena_out", [False, True])
def test_pre_padded_stats_train_grads_match_logical(rng, arena_out):
    n, h, w, c, o = 1, 16, 24, 37, 64
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))

    def loss_ref(wk, b):
        y, s, ss = conv3x3_bias_stats_train(x, wk, b, True, False)
        return jnp.sum(y**2) + jnp.sum(s * ss)

    def loss_pp(wk, b):
        xp = jnp.asarray(_pre_pad(x, _spec(h, w, c, o)))
        y, s, ss = conv3x3_bias_stats_train(xp, wk, b, True, arena_out, (h, w))
        if arena_out:
            y = y[:, 8 : 8 + h, 8 : 8 + w, :o]
        return jnp.sum(y**2) + jnp.sum(s * ss)

    l_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1))(wk, b)
    l_pp, g_pp = jax.value_and_grad(loss_pp, argnums=(0, 1))(wk, b)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    # rtol: the two jaxprs fuse the (identical-valued) g_eff reductions
    # differently, so f32 sum order drifts at the 1e-7-relative level
    np.testing.assert_allclose(np.asarray(g_pp[0]), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(g_pp[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=3e-5)


def test_ingest_spec_covers_kernel_windows():
    """The exported spec (with the route gate bypassed via pallas_train/train
    True and backend-independent shape math) covers both kernels' windows at
    the production CubeNET shape."""
    h, w, c, o = 608, 968, 238, 64
    th, tw = fit_tiles(h, w, c, o, jnp.bfloat16, jnp.bfloat16, lane_stride=_PACKED_LS)
    spec = _spec(h, w, c, o, jnp.bfloat16)
    (hp, wp, cp), _ = spec
    n_h, n_w = -(-h // th), -(-w // tw)
    assert hp >= n_h * th + 2 and wp >= n_w * tw + 8 and cp == 256
    # wgrad needs round_up(h, th_w)+2 rows and round_up(w,8)+8 cols
    assert wp >= ((w + 7) // 8) * 8 + 8


def test_pre_pad_images_layout():
    from hyperpri_tpu.data.pipeline import pre_pad_images

    img = np.arange(2 * 5 * 6 * 3).reshape(2, 5, 6, 3).astype(np.float32)
    buf = pre_pad_images(img, ((10, 16, 8), (1, 1)))
    assert buf.shape == (2, 10, 16, 8)
    np.testing.assert_array_equal(buf[:, 1:6, 1:7, :3], img)
    assert buf.sum() == img.sum()  # everything outside the window is zero


def test_pre_pad_images_rejects_drifted_crop():
    """A 3-tuple spec carries the probed logical (h, w, c); a batch whose
    crop drifted (same padded extent, fewer rows) must fail loudly instead
    of embedding silently with zero rows in the first conv's BN stats."""
    from hyperpri_tpu.data.pipeline import pre_pad_images

    spec = ((10, 16, 8), (1, 1), (5, 6, 3))
    ok = pre_pad_images(np.zeros((2, 5, 6, 3), np.float32), spec)
    assert ok.shape == (2, 10, 16, 8)
    with pytest.raises(ValueError, match="crop shape"):
        pre_pad_images(np.zeros((2, 4, 6, 3), np.float32), spec)
    with pytest.raises(ValueError, match="crop shape"):
        pre_pad_images(np.zeros((2, 5, 6, 2), np.float32), spec)


def test_cubenet_ingest_is_train_only():
    from hyperpri_tpu.models.cubenet import CubeNET

    model = CubeNET(hsi_depth=8, first_depth=8, ingest_hw=(16, 16))
    with pytest.raises(ValueError, match="train-step-only"):
        model.init(jax.random.key(0), jnp.zeros((1, 18, 24, 128)), train=False)


def test_first_conv_ingest_spec_gates_route():
    # off the packed route (tiny pixels) -> None
    assert first_conv_ingest_spec(16, 16, 238, 64, jnp.bfloat16) is None
    # mesh active -> None (shard_map route owns conv layout)
    class FakeMesh:
        shape = {"data": 1, "spatial": 2}
    assert first_conv_ingest_spec(608, 968, 238, 64, jnp.bfloat16,
                                  spatial_mesh=FakeMesh()) is None


def test_mesh_ingest_data_parallel_equivalence(rng):
    """Pre-padded ingest under a DATA-PARALLEL virtual mesh (VERDICT r4 weak
    #5): conv3x3_spatial reads the host-padded buffer per shard and must
    match the logical-input path exactly — values AND weight/bias grads
    (shard_map's psum transpose). On backends without the Pallas route the
    per-shard fallback slices the logical window back out, so the test
    exercises the full mesh plumbing on the virtual CPU mesh."""
    from hyperpri_tpu.parallel.mesh import make_mesh
    from hyperpri_tpu.parallel.spatial_conv import conv3x3_spatial

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh({"data": 2, "spatial": 1}, devices=jax.devices()[:2])
    n, h, w, c, o = 2, 16, 24, 37, 64
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    xp = _pre_pad(x, _spec(h, w, c, o))

    def loss_logical(wk, b):
        y = conv3x3_spatial(x, wk, b, mesh, train=True)
        return jnp.sum(y**2)

    def loss_ingest(wk, b):
        y = conv3x3_spatial(xp, wk, b, mesh, train=True, pre_padded_hw=(h, w))
        return jnp.sum(y**2)

    l_ref, g_ref = jax.value_and_grad(loss_logical, argnums=(0, 1))(wk, b)
    l_pp, g_pp = jax.value_and_grad(loss_ingest, argnums=(0, 1))(wk, b)
    np.testing.assert_allclose(float(l_pp), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_pp[0]), np.asarray(g_ref[0]),
                               rtol=1e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(g_pp[1]), np.asarray(g_ref[1]),
                               rtol=1e-5, atol=2e-5)


def test_mesh_ingest_requires_no_spatial_sharding(rng):
    from hyperpri_tpu.parallel.mesh import make_mesh
    from hyperpri_tpu.parallel.spatial_conv import conv3x3_spatial

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh({"data": 1, "spatial": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="spatial=1"):
        conv3x3_spatial(jnp.zeros((1, 16, 24, 128)), jnp.zeros((3, 3, 37, 64)),
                        jnp.zeros((64,)), mesh, train=True, pre_padded_hw=(14, 22))
