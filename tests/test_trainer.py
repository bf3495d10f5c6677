"""End-to-end trainer tests on synthetic data (UNET-RGB minimum slice:
SURVEY.md §7.4) — train, checkpoint, resume, early-stop, validate, test,
segmaps."""

import glob
import os

import numpy as np
import pytest

from hyperpri_tpu.config import ExpHyperspectralPRI, ExpRedGreenBluePRI
from hyperpri_tpu.data.pipeline import DataLoader
from hyperpri_tpu.data.synthetic import make_experiment_tree
from hyperpri_tpu.train import Trainer, train_net, validate_net
from hyperpri_tpu.train import test_net as run_test_net
from hyperpri_tpu.train.checkpoint import find_eval_checkpoint, find_resume_checkpoint


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("exp"))
    make_experiment_tree(path, n_boxes=3, dates_per_box=2, size_hw=(16, 24), bands=20)
    return path


@pytest.fixture(scope="module")
def rgb_cfg_factory(workdir):
    def make(**kw):
        cfg = ExpRedGreenBluePRI(calling_path=workdir, split_no=1, **kw)
        cfg.patch_size = (16, 16)
        cfg.epochs = 2
        return cfg

    return make


@pytest.fixture(scope="module")
def trained(rgb_cfg_factory):
    cfg = rgb_cfg_factory()
    trainer = train_net(cfg, checkpoint=False, progress=False)
    return cfg, trainer


def test_fit_runs_and_checkpoints(trained):
    cfg, trainer = trained
    res = trainer.fit_result
    assert res.epochs_run == 2
    assert np.isfinite(res.best_val_loss)
    ckpts = os.listdir(os.path.join(cfg.save_path, "Checkpoints"))
    assert "last.ckpt" in ckpts
    assert any(c.startswith("epoch=") for c in ckpts)
    assert os.path.exists(os.path.join(cfg.save_path, "diceCheckpoints"))
    # logs written
    assert os.path.exists(os.path.join(cfg.save_path, "LOGS", "metrics.csv"))
    assert os.path.exists(os.path.join(cfg.save_path, "LOGS", "hparams.json"))


def test_resume_from_last(trained, rgb_cfg_factory):
    cfg, _ = trained
    cfg2 = rgb_cfg_factory()
    cfg2.epochs = 3
    assert find_resume_checkpoint(cfg2.save_path) is not None
    trainer = train_net(cfg2, checkpoint=True, progress=False)
    # epochs 0,1 done previously; resume runs only epoch 2
    assert trainer.fit_result.epochs_run == 1


def test_validate_net_threshold_sweep(trained):
    cfg, _ = trained
    prec, rec, thr = validate_net(cfg.get_val_data(), cfg, verbose=False, n_thresholds=100)
    assert prec.shape == (101,) and rec.shape == (101,) and thr.shape == (100,)
    assert os.path.exists(os.path.join(cfg.save_path, "pr_curve.png"))
    assert prec[-1] == 1.0 and rec[-1] == 0.0


def test_test_net_fixed_threshold(trained):
    cfg, _ = trained
    results = run_test_net(cfg.get_test_data(), cfg, best_threshold=0.5, verbose=False)
    for key in ("pix_acc", "dice", "pos_iou", "avg_prec"):
        assert 0.0 <= results[key] <= 1.0
    assert results["conf_mat"].shape == (2, 2)


def test_segmaps_written(trained):
    cfg, _ = trained
    run_test_net(cfg.get_test_data(), cfg, best_threshold=0.5, save_segmaps=True, verbose=False)
    maps = glob.glob(os.path.join(cfg.fig_dir, "*_seg.png"))
    assert len(maps) >= 1


def test_early_stopping_patience_zero(rgb_cfg_factory, workdir):
    cfg = rgb_cfg_factory(seed_num=7)  # separate Run_ dir
    cfg.epochs = 10
    cfg.overall = 0  # stop on first non-improving epoch
    cfg.learn_rate = 0.0  # loss cannot improve after epoch 0
    trainer = train_net(cfg, progress=False)
    assert trainer.fit_result.stopped_early
    assert trainer.fit_result.epochs_run <= 3


def test_eval_checkpoint_prefers_best_over_last(trained):
    cfg, _ = trained
    best = find_eval_checkpoint(cfg.save_path)
    assert best is not None and "last" not in os.path.basename(best)


def test_loss_decreases_on_learnable_synthetic(workdir):
    # CubeNET on strongly-separable synthetic spectra: loss must drop.
    cfg = ExpHyperspectralPRI(calling_path=workdir, split_no=1, seed_num=3)
    cfg.hsi_lo, cfg.hsi_hi = 2, 18
    cfg.channels = 16
    cfg.cube_featmaps = 8
    cfg.epochs = 3
    trainer = train_net(cfg, progress=False)
    import csv

    with open(os.path.join(cfg.save_path, "LOGS", "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["tr_loss"]) for r in rows]
    assert losses[-1] < losses[0]


def test_feature_extraction_trains_only_head(workdir):
    # The flag must freeze the backbone and train the outc head (the
    # reference's set_parameter_requires_grad is dead code; ADVICE r1).
    import jax
    import jax.numpy as jnp

    from hyperpri_tpu.train.trainer import create_train_state, make_train_step

    cfg = ExpRedGreenBluePRI(calling_path=workdir, split_no=1)
    cfg.feature_extraction = True
    model = cfg.get_network()
    img = np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32)
    state = create_train_state(cfg, model, img[:1], seed=0)
    batch = {
        "image": jnp.asarray(img),
        "mask": jnp.ones((2, 16, 16, 1), jnp.float32),
        "valid": jnp.ones((2,), jnp.float32),
    }
    new_state, _ = jax.jit(make_train_step(0.5))(state, batch)

    def changed(a, b):
        return bool(np.any(np.asarray(a) != np.asarray(b)))

    flat_old = jax.tree_util.tree_flatten_with_path(state.params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    head_changed, backbone_changed = False, False
    for (path, old), (_, new) in zip(flat_old, flat_new):
        is_head = any(getattr(p, "key", None) == "outc" for p in path)
        if changed(old, new):
            if is_head:
                head_changed = True
            else:
                backbone_changed = True
    assert head_changed and not backbone_changed


def test_sgd_weight_decay_applied(workdir):
    from hyperpri_tpu.train.trainer import make_optimizer

    cfg = ExpRedGreenBluePRI(calling_path=workdir, split_no=1)
    cfg.optimizer = "SGD"
    cfg.learn_rate = 0.1
    cfg.weight_decay = 0.5
    tx = make_optimizer(cfg)
    params = {"w": np.ones((3,), np.float32)}
    zero_grads = {"w": np.zeros((3,), np.float32)}
    import optax

    st = tx.init(params)
    updates, _ = tx.update(zero_grads, st, params)
    # pure decay: update = -lr * wd * param
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.05 * np.ones(3), rtol=1e-6)
