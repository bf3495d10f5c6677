"""2x2 max pooling with a cheap, torch-exact backward.

nn.max_pool's VJP lowers to select-and-scatter, which measures 2.05 ms at
the full-resolution 608x968x64 layer of the CubeNET train step (hlo_stats,
scripts/trace_train.py) and is HBM-bound. This variant keeps XLA's
reduce_window for the forward (a reshape+max forward measures 1.55 vs
0.88 ms at 608x968x64 — the strided sublane reshape is itself HBM-bound)
and hand-writes only the VJP as elementwise ops XLA fuses: the gradient
goes to the FIRST maximal element of each window in row-major order — the
same tie-breaking select-and-scatter uses (scan order) and torch's
MaxPool2d indices produce, so training numerics are unchanged.

VALID padding, stride 2 — torch nn.MaxPool2d(2) semantics (odd tails
dropped), matching models/parts.py Down.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_stack(x):
    """(N, H, W, C) -> (N, H2, W2, 4, C): the 2x2 windows in row-major order."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    x4 = x[:, : h2 * 2, : w2 * 2, :].reshape(n, h2, 2, w2, 2, c)
    return x4.transpose(0, 1, 3, 2, 4, 5).reshape(n, h2, w2, 4, c)


def _reduce_window_max(x):
    init = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    )
    return jax.lax.reduce_window(
        x, jnp.asarray(init, x.dtype), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@jax.custom_vjp
def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return _reduce_window_max(x)


def _fwd(x):
    return _reduce_window_max(x), x


def _pallas_route_ok(x):
    """Route the backward to the Pallas kernel (ops/pallas/pool_bwd.py) on
    TPU for even-H/W layers with lane-tileable channels — the XLA lowering's
    (N,H2,2,W2,2,C) window stack materializes T(2,128)-layout copies
    (measured 5.94 vs 2.99 ms at 608x968x64, scripts/probe_pool_bwd.py).
    The odd-W deepest pool (76x121x512) falls back to the XLA path."""
    n, h, w, c = x.shape
    return (
        jax.default_backend() == "tpu"
        and h % 2 == 0
        and w % 2 == 0
        and (c % 128 == 0 or (c <= 128 and c % 8 == 0))
        and h * w >= 4096  # tiny shapes: not worth a kernel launch
    )


def _bwd(x, g):
    if _pallas_route_ok(x):
        from hyperpri_tpu.ops.pallas.pool_bwd import max_pool_2x2_bwd_pallas

        return (max_pool_2x2_bwd_pallas(x, g.astype(x.dtype)).astype(x.dtype),)
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xs = _window_stack(x)  # (N, H2, W2, 4, C)
    m = jnp.max(xs, axis=3, keepdims=True)
    eq = xs >= m  # equality, robust to -inf windows
    # first max in row-major window order: strictly-before prefix has no max
    before = jnp.cumsum(eq.astype(jnp.int32), axis=3)
    first = jnp.logical_and(eq, before == 1)
    dxs = jnp.where(first, g[:, :, :, None, :], jnp.zeros((), g.dtype))
    dx = (
        dxs.reshape(n, h2, w2, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, h2 * 2, w2 * 2, c)
    )
    if h2 * 2 != h or w2 * 2 != w:
        dx = jnp.pad(dx, ((0, 0), (0, h - h2 * 2), (0, w - w2 * 2), (0, 0)))
    return (dx,)


max_pool_2x2.defvjp(_fwd, _bwd)
