"""Model parity tests: exact parameter counts and output shapes.

Parameter-count oracles are the empirically verified reference counts
(SURVEY.md §2 / BASELINE.md): UNet 31,043,521; SpectralUNET 30,388,051;
CubeNET-64 31,178,881.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.models import (
    CubeNET,
    SpectralUNET,
    UNet,
    count_params,
    initialize_model,
    translate_load_dir,
)


def init_model(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return variables


def test_unet_param_count_paper_config():
    model = UNet(n_channels=3, n_classes=1, bilinear=False)
    variables = init_model(model, (1, 32, 32, 3))
    assert count_params(variables["params"]) == 31_043_521


def test_spectral_unet_param_count_paper_config():
    model = SpectralUNET(hsi_depth=238, n_classes=1, bn_feats=1650)
    variables = init_model(model, (1, 4, 4, 238))
    assert count_params(variables["params"]) == 30_388_051


def test_cubenet_param_count_paper_config():
    model = CubeNET(hsi_depth=238, n_classes=1, first_depth=64, bilinear=False)
    variables = init_model(model, (1, 32, 32, 238))
    assert count_params(variables["params"]) == 31_178_881


def test_unet_bilinear_param_count_differs():
    # bilinear=True halves the bottleneck (factor=2); just check it builds and
    # is smaller than the transpose-conv variant.
    model = UNet(n_channels=3, n_classes=1, bilinear=True)
    variables = init_model(model, (1, 32, 32, 3))
    assert count_params(variables["params"]) < 31_043_521


@pytest.mark.parametrize("h,w", [(32, 48), (38, 62)])
def test_unet_output_shape(h, w):
    # 38x62: odd sizes at some pooling levels exercise the center-pad path
    # (reference model_parts.py:74-80).
    model = UNet(n_channels=3, n_classes=1, bilinear=False)
    x = jnp.zeros((2, h, w, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, h, w, 1)
    assert y.dtype == jnp.float32


def test_cubenet_output_shape_and_finite():
    model = CubeNET(hsi_depth=16, n_classes=1, first_depth=8, bilinear=False)
    x = jax.random.normal(jax.random.key(1), (1, 48, 40, 16))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 48, 40, 1)
    assert bool(jnp.isfinite(y).all())


def test_cubenet_alt_head_first_depth_not_64():
    # Exercises the first_depth != 64 branch (reference models.py:193-199).
    model = CubeNET(hsi_depth=8, n_classes=1, first_depth=16, bilinear=False)
    x = jnp.zeros((1, 32, 32, 8), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 1)


def test_spectral_unet_output_shape():
    model = SpectralUNET(hsi_depth=16, n_classes=1, bn_feats=32)
    x = jax.random.normal(jax.random.key(1), (2, 8, 10, 16))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 8, 10, 1)


def test_spectral_unet_is_pixelwise():
    # A per-pixel MLP must give identical logits for identical spectra,
    # regardless of spatial position (eval mode, running stats).
    model = SpectralUNET(hsi_depth=12, n_classes=1, bn_feats=16)
    spectrum = jax.random.normal(jax.random.key(2), (12,))
    x = jnp.broadcast_to(spectrum, (1, 4, 6, 12))
    variables = model.init(jax.random.key(0), x, train=False)
    y = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y)[0, 0, 0, 0], rtol=1e-5)


def test_train_mode_updates_batch_stats():
    model = UNet(n_channels=3, n_classes=1, bilinear=False)
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    _, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_analyze_flag_returns_triple():
    model = UNet(n_channels=3, n_classes=1, bilinear=False, analyze=True)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert isinstance(out, tuple) and len(out) == 3
    np.testing.assert_allclose(np.asarray(out[2]), jax.nn.sigmoid(np.asarray(out[0])))


def test_registry_factory_and_load_dir():
    params = {
        "channels": 3,
        "bilinear": False,
        "use_attention": False,
        "hsi_lo": 25,
        "hsi_hi": 263,
        "spectral_bn_size": 1650,
        "3d_featmaps": 64,
    }
    assert isinstance(initialize_model("UNET", 1, params), UNet)
    assert isinstance(initialize_model("SpectralUNET", 1, params), SpectralUNET)
    assert isinstance(initialize_model("CubeNET", 1, params), CubeNET)
    with pytest.raises(RuntimeError):
        initialize_model("nope", 1, params)
    assert translate_load_dir("SpectralUNET", params) == "SpectralUNET_1650"
    assert translate_load_dir("CubeNET", params) == "CubeNET_64"
    assert translate_load_dir("UNET", params) == "UNET"
