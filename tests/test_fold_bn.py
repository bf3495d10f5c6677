"""BN folding (serving-path surgery) must preserve eval-mode outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyperpri_tpu.models import CubeNET, SpectralUNET, UNet
from hyperpri_tpu.ops.fold_bn import fold_batch_norm


def randomized_variables(model, x, key):
    variables = model.init(key, x, train=False)
    # randomize batch_stats so folding is non-trivial
    leaves, treedef = jax.tree.flatten(variables["batch_stats"])
    rng = np.random.default_rng(0)
    new = [jnp.asarray(np.abs(rng.normal(0.5, 0.3, l.shape)).astype(np.float32) + 0.1) for l in leaves]
    return {"params": variables["params"], "batch_stats": jax.tree.unflatten(treedef, new)}


@pytest.mark.parametrize(
    "model_fn,shape",
    [
        (lambda fused: UNet(3, 1, bilinear=False, fused_bn=fused), (1, 32, 32, 3)),
        (lambda fused: CubeNET(8, 1, first_depth=8, bilinear=False, fused_bn=fused), (1, 32, 32, 8)),
        (lambda fused: SpectralUNET(8, 1, bn_feats=12, fused_bn=fused), (1, 6, 6, 8)),
    ],
)
def test_folded_matches_unfolded_eval(model_fn, shape):
    x = jax.random.normal(jax.random.key(1), shape)
    model = model_fn(False)
    variables = randomized_variables(model, x, jax.random.key(0))
    ref = model.apply(variables, x, train=False)

    folded_params = fold_batch_norm(variables["params"], variables["batch_stats"])
    fused_model = model_fn(True)
    # the fused model's param tree must match what the surgery produced
    expected = fused_model.init(jax.random.key(0), x, train=False)["params"]
    assert jax.tree.structure(expected) == jax.tree.structure(folded_params)
    out = fused_model.apply(
        {"params": folded_params, "batch_stats": {}}, x, train=False
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_pallas_serving_path_matches_xla_path():
    """fused_bn + use_pallas must equal fused_bn with XLA convs (interpret
    mode on CPU; exactness on TPU is covered by the kernel benchmarks)."""
    x = jax.random.normal(jax.random.key(1), (1, 16, 24, 8))
    base = CubeNET(8, 1, first_depth=8, bilinear=False)
    variables = randomized_variables(base, x, jax.random.key(0))
    folded = fold_batch_norm(variables["params"], variables["batch_stats"])

    xla_model = CubeNET(8, 1, first_depth=8, bilinear=False, fused_bn=True)
    pal_model = CubeNET(8, 1, first_depth=8, bilinear=False, fused_bn=True, use_pallas=True)
    ref = xla_model.apply({"params": folded, "batch_stats": {}}, x, train=False)
    out = pal_model.apply({"params": folded, "batch_stats": {}}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
