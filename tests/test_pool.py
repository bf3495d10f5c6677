"""max_pool_2x2 (ops/pool.py) vs nn.max_pool: forward exact, backward
matches select-and-scatter's first-max tie-breaking."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hyperpri_tpu.ops.pool import max_pool_2x2


def _cases(rng):
    yield jnp.asarray(rng.normal(size=(2, 8, 10, 4)).astype(np.float32))
    yield jnp.asarray(rng.normal(size=(1, 9, 11, 3)).astype(np.float32))  # odd tails
    # adversarial ties: post-relu zeros and repeated values
    x = rng.normal(size=(2, 6, 6, 8)).astype(np.float32)
    x = np.maximum(np.round(x * 2) / 2, 0.0)  # lots of equal values + zeros
    yield jnp.asarray(x)
    yield jnp.zeros((1, 4, 4, 2), jnp.float32)  # all ties


def test_forward_matches_nn_max_pool(rng):
    for x in _cases(rng):
        ref = nn.max_pool(x, (2, 2), strides=(2, 2))
        out = max_pool_2x2(x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_backward_matches_select_and_scatter(rng):
    for x in _cases(rng):
        def loss_ref(x):
            y = nn.max_pool(x, (2, 2), strides=(2, 2))
            return jnp.sum(y * jnp.cos(y))

        def loss_new(x):
            y = max_pool_2x2(x)
            return jnp.sum(y * jnp.cos(y))

        ref = jax.grad(loss_ref)(x)
        out = jax.grad(loss_new)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pallas_bwd_matches_xla_bwd(rng):
    """The Pallas pool-backward (ops/pallas/pool_bwd.py, interpret mode here;
    bit-exact on hardware per scripts/probe_pool_bwd.py) must reproduce the
    XLA first-max backward exactly, ties included."""
    from hyperpri_tpu.ops.pallas.pool_bwd import max_pool_2x2_bwd_pallas
    from hyperpri_tpu.ops.pool import _bwd

    shapes = [(2, 16, 24, 64), (1, 8, 968, 64), (2, 32, 16, 128), (1, 6, 10, 256)]
    for shape in shapes:
        n, h, w, c = shape
        # quantized values force cross-window and in-window ties
        x = jnp.asarray(rng.integers(0, 4, shape).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(
            rng.normal(size=(n, h // 2, w // 2, c)).astype(np.float32)
        ).astype(jnp.bfloat16)
        ref = _bwd(x, g)[0]
        out = max_pool_2x2_bwd_pallas(x, g, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), err_msg=str(shape)
        )


def test_pallas_route_gate():
    """Odd H/W or non-tileable channels must stay on the XLA path."""
    from hyperpri_tpu.ops.pool import _pallas_route_ok

    ok = jnp.zeros((2, 608, 968, 64))
    assert not _pallas_route_ok(jnp.zeros((2, 76, 121, 512)))  # odd W
    assert not _pallas_route_ok(jnp.zeros((2, 75, 120, 64)))  # odd H
    assert not _pallas_route_ok(jnp.zeros((2, 608, 968, 20)))  # lanes % 8
    assert not _pallas_route_ok(jnp.zeros((2, 8, 8, 64)))  # tiny
    # even/tileable routes IFF the backend is TPU at trace time
    assert _pallas_route_ok(ok) == (jax.default_backend() == "tpu")
