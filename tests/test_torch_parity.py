"""Numerical parity against torch (CPU) for every op whose semantics the
torch-checkpoint import bridge depends on: Conv2d, ConvTranspose2d (k2s2),
BatchNorm eval, Linear, bilinear align-corners upsample, maxpool floor.

These pin down the weight-layout transforms in train/torch_import.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from hyperpri_tpu.models.parts import upsample2x_align_corners  # noqa: E402


def nchw(x_nhwc):
    return torch.tensor(np.moveaxis(x_nhwc, -1, 1))


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_conv2d_weight_transform(rng):
    x = rng.normal(size=(2, 9, 11, 5)).astype(np.float32)
    tconv = torch.nn.Conv2d(5, 7, 3, padding=1)
    w = tconv.weight.detach().numpy()  # (O, I, kh, kw)
    b = tconv.bias.detach().numpy()
    ref = to_nhwc(tconv(nchw(x)))

    conv = nn.Conv(7, (3, 3), padding="SAME")
    params = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "bias": jnp.asarray(b)}
    ours = conv.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_conv_transpose_k2s2_weight_transform(rng):
    x = rng.normal(size=(1, 6, 5, 8)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(8, 4, kernel_size=2, stride=2)
    w = tconv.weight.detach().numpy()  # (I, O, kh, kw)
    b = tconv.bias.detach().numpy()
    ref = to_nhwc(tconv(nchw(x)))

    conv = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID")
    # flax applies the kernel un-flipped -> torch weights need a spatial flip
    params = {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()),
        "bias": jnp.asarray(b),
    }
    ours = conv.apply({"params": params}, jnp.asarray(x))
    assert ours.shape == ref.shape == (1, 12, 10, 4)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_conv_transpose_2x2_matmul_form(rng):
    """The production ConvTranspose2x2 (matmul + depth-to-space) matches both
    flax nn.ConvTranspose and torch ConvTranspose2d with the same weights."""
    from hyperpri_tpu.models.parts import ConvTranspose2x2

    x = rng.normal(size=(2, 6, 5, 8)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(8, 4, kernel_size=2, stride=2)
    w = tconv.weight.detach().numpy()
    b = tconv.bias.detach().numpy()
    ref = to_nhwc(tconv(nchw(x)))

    params = {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()),
        "bias": jnp.asarray(b),
    }
    ours = ConvTranspose2x2(4).apply({"params": params}, jnp.asarray(x))
    assert ours.shape == ref.shape == (2, 12, 10, 4)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)

    flax_ref = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID").apply(
        {"params": params}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(flax_ref), atol=1e-5)


def test_batchnorm_eval_parity(rng):
    x = rng.normal(size=(3, 4, 4, 6)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        tbn.weight.copy_(torch.tensor(rng.normal(size=6).astype(np.float32)))
        tbn.bias.copy_(torch.tensor(rng.normal(size=6).astype(np.float32)))
        tbn.running_mean.copy_(torch.tensor(rng.normal(size=6).astype(np.float32)))
        tbn.running_var.copy_(torch.tensor(rng.uniform(0.5, 2, 6).astype(np.float32)))
    ref = to_nhwc(tbn(nchw(x)))

    from hyperpri_tpu.models.parts import TorchBatchNorm

    bn = TorchBatchNorm()
    variables = {
        "params": {
            "scale": jnp.asarray(tbn.weight.detach().numpy()),
            "bias": jnp.asarray(tbn.bias.detach().numpy()),
        },
        "batch_stats": {
            "mean": jnp.asarray(tbn.running_mean.numpy()),
            "var": jnp.asarray(tbn.running_var.numpy()),
        },
    }
    ours = bn.apply(variables, jnp.asarray(x), use_running_average=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_batchnorm_train_stats_update(rng):
    # One training step: torch momentum 0.1 == flax momentum 0.9.
    x = rng.normal(size=(4, 3, 3, 5)).astype(np.float32)
    tbn = torch.nn.BatchNorm2d(5)
    tbn.train()
    ref = to_nhwc(tbn(nchw(x)))

    from hyperpri_tpu.models.parts import TorchBatchNorm

    bn = TorchBatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x), use_running_average=False)
    ours, updates = bn.apply(
        variables, jnp.asarray(x), use_running_average=False, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]), tbn.running_mean.detach().numpy(), atol=1e-5
    )
    # torch running_var uses the *unbiased* batch variance
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["var"]), tbn.running_var.detach().numpy(), atol=1e-4
    )


def test_bilinear_align_corners_upsample(rng):
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
    ref = to_nhwc(up(nchw(x)))
    ours = upsample2x_align_corners(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_maxpool_floor_parity(rng):
    x = rng.normal(size=(1, 7, 121, 2)).astype(np.float32)  # odd sizes -> floor
    ref = to_nhwc(torch.nn.MaxPool2d(2)(nchw(x)))
    ours = nn.max_pool(jnp.asarray(x), (2, 2), strides=(2, 2))
    assert ours.shape == (1, 3, 60, 2)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=0)


def test_linear_weight_transform(rng):
    x = rng.normal(size=(10, 6)).astype(np.float32)
    tl = torch.nn.Linear(6, 4)
    ref = tl(torch.tensor(x)).detach().numpy()
    dense = nn.Dense(4)
    params = {
        "kernel": jnp.asarray(tl.weight.detach().numpy().T),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }
    ours = dense.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_conv3d_spectral_collapse_equivalence(rng):
    """Conv3d(1, O, (D,3,3), pad (0,1,1)) over the full depth == 2D conv with
    D input channels — the CubeNET front-end lowering (models/cubenet.py)."""
    D, O = 10, 4
    x = rng.normal(size=(2, 6, 7, D)).astype(np.float32)
    tconv = torch.nn.Conv3d(1, O, (D, 3, 3), padding=(0, 1, 1))
    xt = torch.tensor(np.moveaxis(x, -1, 1)[:, None])  # (N, 1, D, H, W)
    ref = tconv(xt).detach().numpy()[:, :, 0]  # (N, O, H, W)
    ref = np.moveaxis(ref, 1, -1)

    w = tconv.weight.detach().numpy()[:, 0]  # (O, D, kh, kw)
    conv = nn.Conv(O, (3, 3), padding="SAME")
    params = {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    ours = conv.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_full_state_dict_import_unet():
    """Synthesize a reference-shaped UNet state dict, import, and check the
    flax tree is fully populated with matching shapes."""
    from flax import serialization

    from hyperpri_tpu.models import UNet
    from hyperpri_tpu.train.torch_import import convert_state_dict, normalize_torch_keys

    rng = np.random.default_rng(0)

    def dc_keys(prefix, cin, mid, cout):
        ks = {}
        ks[f"{prefix}.0.weight"] = rng.normal(size=(mid, cin, 3, 3)).astype(np.float32)
        ks[f"{prefix}.0.bias"] = rng.normal(size=mid).astype(np.float32)
        for stat in ["weight", "bias", "running_mean", "running_var"]:
            ks[f"{prefix}.1.{stat}"] = rng.normal(size=mid).astype(np.float32)
        ks[f"{prefix}.3.weight"] = rng.normal(size=(cout, mid, 3, 3)).astype(np.float32)
        ks[f"{prefix}.3.bias"] = rng.normal(size=cout).astype(np.float32)
        for stat in ["weight", "bias", "running_mean", "running_var"]:
            ks[f"{prefix}.4.{stat}"] = rng.normal(size=cout).astype(np.float32)
        return ks

    sd = {}
    sd.update(dc_keys("m_network.inc.double_conv", 3, 64, 64))
    chans = [(64, 128), (128, 256), (256, 512), (512, 1024)]
    for k, (ci, co) in enumerate(chans, 1):
        sd.update(dc_keys(f"m_network.down{k}.maxpool_conv.1.double_conv", ci, co, co))
    up_chans = [(1024, 512), (512, 256), (256, 128), (128, 64)]
    for k, (ci, co) in enumerate(up_chans, 1):
        sd[f"m_network.up{k}.up.weight"] = rng.normal(size=(ci, ci // 2, 2, 2)).astype(np.float32)
        sd[f"m_network.up{k}.up.bias"] = rng.normal(size=ci // 2).astype(np.float32)
        sd.update(dc_keys(f"m_network.up{k}.conv.double_conv", ci, co, co))
    sd["m_network.outc.conv.weight"] = rng.normal(size=(1, 64, 1, 1)).astype(np.float32)
    sd["m_network.outc.conv.bias"] = rng.normal(size=1).astype(np.float32)

    params, batch_stats = convert_state_dict(normalize_torch_keys(sd), "UNET")

    model = UNet(n_channels=3, n_classes=1, bilinear=False)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), train=False)
    new_params = serialization.from_state_dict(variables["params"], params)
    new_stats = serialization.from_state_dict(variables["batch_stats"], batch_stats)
    for ours, ref in zip(jax.tree.leaves(new_params), jax.tree.leaves(variables["params"])):
        assert ours.shape == ref.shape
    # imported values actually run
    y = model.apply({"params": new_params, "batch_stats": new_stats},
                    jnp.zeros((1, 16, 16, 3)), train=False)
    assert y.shape == (1, 16, 16, 1)


def test_conv_transpose_up_custom_vjp(rng):
    """ConvTransposeUp (custom backward) matches nn.ConvTranspose in both
    the forward and all gradients."""
    from hyperpri_tpu.models.parts import ConvTransposeUp

    x = jnp.asarray(rng.normal(size=(2, 6, 5, 8)).astype(np.float32))
    ref_mod = nn.ConvTranspose(4, (2, 2), strides=(2, 2), padding="VALID")
    params = ref_mod.init(jax.random.key(0), x)["params"]

    ours_mod = ConvTransposeUp(4)

    def loss(mod):
        def f(p, x):
            y = mod.apply({"params": p}, x)
            return jnp.sum(y * jnp.cos(y))
        return f

    ref_l, ref_g = jax.value_and_grad(loss(ref_mod), argnums=(0, 1))(params, x)
    out_l, out_g = jax.value_and_grad(loss(ours_mod), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-6)
    for got, want in zip(jax.tree.leaves(out_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
