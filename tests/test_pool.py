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
