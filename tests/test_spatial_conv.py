"""Explicit halo-exchange spatial conv (parallel/spatial_conv.py) on the
virtual 8-device CPU mesh: forward and gradient equivalence vs the plain
unsharded conv — SURVEY §5.7's shard_map + ppermute design."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.parallel.mesh import make_mesh
from hyperpri_tpu.parallel.spatial_conv import conv3x3_spatial


def ref_conv(x, w, b):
    return (
        jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )


@pytest.mark.parametrize("mesh_shape", [{"data": 2, "spatial": 4}, {"data": 1, "spatial": 8}])
def test_spatial_conv_forward_matches_unsharded(rng, mesh_shape):
    mesh = make_mesh(mesh_shape)
    n, h, w_, c, o = 2, 32, 12, 8, 16
    x = jnp.asarray(rng.normal(size=(n, h, w_, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))

    y = jax.jit(lambda x, wk, b: conv3x3_spatial(x, wk, b, mesh))(x, wk, b)
    ref = ref_conv(x, wk, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_spatial_conv_gradients_match_unsharded(rng):
    mesh = make_mesh({"data": 2, "spatial": 4})
    n, h, w_, c, o = 2, 16, 10, 4, 8
    x = jnp.asarray(rng.normal(size=(n, h, w_, c)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))

    def loss_sharded(x, wk, b):
        y = conv3x3_spatial(x, wk, b, mesh)
        return jnp.sum(y * jnp.cos(y))

    def loss_ref(x, wk, b):
        y = ref_conv(x, wk, b)
        return jnp.sum(y * jnp.cos(y))

    ref_l, ref_g = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, wk, b)
    out_l, out_g = jax.jit(jax.value_and_grad(loss_sharded, argnums=(0, 1, 2)))(x, wk, b)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-6)
    for got, want, nm in zip(out_g, ref_g, ["dx", "dw", "db"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5, err_msg=nm
        )


def test_spatial_conv_trivial_mesh(rng):
    """n_spatial == 1: no halo exchange path."""
    mesh = make_mesh({"data": 2, "spatial": 1}, devices=jax.devices()[:2])
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 4)).astype(np.float32))
    wk = jnp.asarray((rng.normal(size=(3, 3, 4, 4)) * 0.1).astype(np.float32))
    b = jnp.zeros((4,), jnp.float32)
    y = conv3x3_spatial(x, wk, b, mesh)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref_conv(x, wk, b)), atol=2e-5
    )


def test_spatial_conv_under_sharded_jit(rng):
    """Inside a pjit whose inputs carry the mesh shardings (the trainer's
    situation): the shard_map region composes with GSPMD around it."""
    from hyperpri_tpu.parallel.mesh import batch_sharding, replicated

    mesh = make_mesh({"data": 2, "spatial": 4})
    n, h, w_, c, o = 2, 32, 12, 8, 8
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(n, h, w_, c)).astype(np.float32)),
        batch_sharding(mesh),
    )
    wk = jax.device_put(
        jnp.asarray((rng.normal(size=(3, 3, c, o)) * 0.1).astype(np.float32)),
        replicated(mesh),
    )
    b = jax.device_put(jnp.zeros((o,), jnp.float32), replicated(mesh))

    @jax.jit
    def step(x, wk, b):
        y = conv3x3_spatial(x, wk, b, mesh)
        return jnp.sum(jax.nn.relu(y))

    out = float(step(x, wk, b))
    ref = float(jnp.sum(jax.nn.relu(ref_conv(x, wk, b))))
    assert abs(out - ref) / abs(ref) < 1e-5


def test_conv3x3_module_spatial_routing(rng):
    """Conv3x3 with spatial_mesh set routes through the halo-exchange conv
    and matches the plain module bit-for-bit at f32 tolerance."""
    from hyperpri_tpu.models.parts import Conv3x3

    mesh = make_mesh({"data": 2, "spatial": 4})
    x = jnp.asarray(rng.normal(size=(2, 32, 12, 40)).astype(np.float32))
    plain = Conv3x3(16)
    vs = plain.init(jax.random.key(0), x)
    y_ref, _ = plain.apply(vs, x)

    sharded = Conv3x3(16, spatial_mesh=mesh, min_pixels=1)
    y, st = jax.jit(lambda v, x: sharded.apply(v, x))(vs, x)
    assert st is None
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

    # non-divisible H falls back to the plain path
    x_odd = jnp.asarray(rng.normal(size=(2, 30, 12, 40)).astype(np.float32))
    vs2 = plain.init(jax.random.key(0), x_odd)
    y2, _ = sharded.apply(vs2, x_odd)
    y2_ref, _ = plain.apply(vs2, x_odd)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref), atol=2e-5)


def test_trainer_spatial_mesh_model_clone():
    """Trainer under a spatial mesh clones the model with spatial_mesh set;
    a sharded train step still runs and produces a finite loss."""
    import numpy as np

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.train.trainer import Trainer, create_train_state, make_train_step

    cfg = ExpHyperspectralPRI(calling_path=".")
    cfg.model_name = "CubeNET"
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.cube_featmaps = 4
    cfg.mesh_shape = {"data": 2, "spatial": 4}
    tr = Trainer(cfg)
    assert tr.model.spatial_mesh is tr.mesh

    state = create_train_state(cfg, tr.model, np.zeros((1, 32, 24, 8), np.float32), seed=0)
    step = make_train_step(cfg.threshold)
    batch = {
        "image": jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 24, 8)).astype(np.float32)),
        "mask": jnp.zeros((2, 32, 24, 1), jnp.float32),
        "valid": jnp.ones((2,)),
    }
    _, logs = jax.jit(step)(state, batch)
    assert np.isfinite(float(logs["loss_sum"]))
