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


def test_conv3x3_module_data_only_mesh_route(rng):
    """Data-parallel-only mesh: the shard_map route fires only in training
    with pallas_train on (where it exists to host the Pallas kernel per data
    shard — a bare pallas_call cannot be GSPMD-partitioned); eval falls
    through to the plain XLA conv. Both match the unsharded module."""
    from hyperpri_tpu.models.parts import Conv3x3

    mesh = make_mesh({"data": 8, "spatial": 1})
    x = jnp.asarray(rng.normal(size=(8, 8, 12, 40)).astype(np.float32))
    plain = Conv3x3(16)
    vs = plain.init(jax.random.key(0), x)
    y_ref, _ = plain.apply(vs, x)

    routed = Conv3x3(16, spatial_mesh=mesh, pallas_train=True, min_pixels=1)
    y_tr, st = jax.jit(lambda v, x: routed.apply(v, x, train=True))(vs, x)
    assert st is None
    np.testing.assert_allclose(np.asarray(y_tr), np.asarray(y_ref), atol=2e-5)
    y_ev, _ = routed.apply(vs, x, train=False)
    np.testing.assert_allclose(np.asarray(y_ev), np.asarray(y_ref), atol=2e-5)

    # batch-1 tracing (param init under a data>1 mesh) must not hit the
    # shard_map divisibility requirement
    x1 = x[:1]
    y1, _ = routed.apply(vs, x1, train=True)
    y1_ref, _ = plain.apply(vs, x1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1_ref), atol=2e-5)


def test_conv3x3_data_only_mesh_gradients(rng):
    """Gradients through the data-only-mesh shard_map route match the plain
    conv: weight/bias cotangents come back psummed over the data axis."""
    from hyperpri_tpu.models.parts import Conv3x3

    mesh = make_mesh({"data": 8, "spatial": 1})
    x = jnp.asarray(rng.normal(size=(8, 8, 10, 36)).astype(np.float32))
    plain = Conv3x3(8)
    routed = Conv3x3(8, spatial_mesh=mesh, pallas_train=True, min_pixels=1)
    vs = plain.init(jax.random.key(1), x)

    def loss(module):
        def f(v, x):
            y, _ = module.apply(v, x, train=True)
            return jnp.sum(y * jnp.sin(y))
        return f

    l_ref, g_ref = jax.value_and_grad(loss(plain))(vs, x)
    l_got, g_got = jax.jit(jax.value_and_grad(loss(routed)))(vs, x)
    np.testing.assert_allclose(float(l_got), float(l_ref), rtol=1e-6)
    for got, want in zip(jax.tree.leaves(g_got), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5)


def test_trainer_data_only_mesh_keeps_pallas_route():
    """A data-parallel-only mesh with pallas_train on wires spatial_mesh into
    the model (so training keeps the Pallas kernels per shard on TPU) and the
    sharded step matches the single-device step."""
    import numpy as np

    from hyperpri_tpu.config import ExpHyperspectralPRI
    from hyperpri_tpu.train.trainer import Trainer, create_train_state

    def tiny(mesh_shape):
        cfg = ExpHyperspectralPRI(calling_path=".")
        cfg.hsi_lo, cfg.hsi_hi = 0, 8
        cfg.channels = 8
        cfg.cube_featmaps = 8
        cfg.pallas_train = True
        cfg.mesh_shape = mesh_shape
        return cfg

    rng = np.random.default_rng(3)
    batch = {
        "image": rng.normal(size=(8, 16, 16, 8)).astype(np.float32),
        "mask": (rng.uniform(size=(8, 16, 16, 1)) < 0.3).astype(np.float32),
        "valid": np.ones((8,), np.float32),
    }

    cfg1 = tiny(None)
    tr1 = Trainer(cfg1, mesh=None)
    s1 = create_train_state(cfg1, tr1.model, batch["image"][:1], seed=0)
    tr1._compile_steps(s1)
    s1, logs1 = tr1._train_step(s1, batch)

    cfg2 = tiny({"data": 8})
    tr2 = Trainer(cfg2)
    assert tr2.mesh.shape == {"data": 8, "spatial": 1}
    assert tr2.model.spatial_mesh is tr2.mesh
    s2 = create_train_state(cfg2, tr2.model, batch["image"][:1], seed=0)
    s2 = tr2._place_state(s2)
    tr2._compile_steps(s2)
    sh = tr2._batch_shardings()
    b = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    s2, logs2 = tr2._train_step(s2, b)

    l1 = float(logs1["loss_sum"]) / float(logs1["n"])
    l2 = float(logs2["loss_sum"]) / float(logs2["n"])
    assert abs(l1 - l2) < 2e-5


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
