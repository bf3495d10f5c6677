"""Explicit halo-exchange spatial convolution: shard_map + ppermute.

SURVEY §5.7's design, realized: when the H axis of the (N, H, W, C) feature
maps is sharded over the mesh's 'spatial' axis, a 3x3 SAME conv needs one
row of halo from each neighbor. Instead of delegating to GSPMD's automatic
partitioner (whose fallback is full-tensor rematerialization — the
involuntary-remat issue VERDICT r1 flagged), this wraps the conv in a
`shard_map` region that:

  1. exchanges single boundary rows with the H-neighbors via
     `jax.lax.ppermute` (two one-row transfers riding ICI, ~W*C elements,
     vs GSPMD's full-feature-map fallback);
  2. zeroes the halo at the global top/bottom (SAME-conv zero padding);
  3. runs the local conv on the extended block — the fused Pallas kernel
     on a TPU backend (the custom-VJP training path), XLA's conv elsewhere
     (e.g. the virtual CPU mesh used in tests);
  4. slices the halo rows back off.

Gradients are free: shard_map is differentiable, ppermute's transpose is the
reverse permutation, and the replicated weights' cotangent is psummed by the
transpose of their implicit broadcast — exactly the DDP gradient all-reduce,
emitted from types rather than hand-written NCCL (SURVEY §2.2).

Constraint: every shard must hold >= 1 row; H need not divide evenly is NOT
supported (shard_map requires equal shards), matching batch_sharding's
even-shard layout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:  # jax >= 0.8: public API (check_rep was renamed check_vma)
    import inspect

    from jax import shard_map as _shard_map

    # Some intermediate jax versions expose jax.shard_map but still spell
    # the kwarg check_rep; translate only when the new name exists, and
    # accept either spelling (default True) from call sites.
    _VMA = "check_vma" in inspect.signature(_shard_map).parameters

    def shard_map(f, **kw):
        flag = kw.pop("check_rep", kw.pop("check_vma", True))
        kw["check_vma" if _VMA else "check_rep"] = flag
        return _shard_map(f, **kw)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hyperpri_tpu.parallel.mesh import DATA_AXIS, SPATIAL_AXIS


def conv3x3_spatial(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    mesh: Mesh,
    *,
    data_axis: str = DATA_AXIS,
    spatial_axis: str = SPATIAL_AXIS,
    train: bool = True,
    pre_padded_hw: Optional[tuple] = None,
) -> jnp.ndarray:
    """3x3 SAME conv + bias over (N, H, W, C) with N sharded on `data_axis`
    and H sharded on `spatial_axis`. Differentiable (Pallas custom-VJP path
    on TPU).

    With `spatial_axis` of size 1 (data-parallel-only meshes) the halo
    exchange is skipped entirely — the shard_map then exists purely to run
    the Pallas kernel per data shard, which GSPMD cannot partition on its
    own (a bare pallas_call under a mesh forces activation replication).

    `train=False` keeps the local conv on XLA even on TPU: the Pallas
    kernels win only against the training graph's spatial-blocking
    pathology; XLA's batch-1 pure-forward conv fusion is faster for
    inference (measured, BENCHMARKS.md "serving Pallas dead end").

    pre_padded_hw: logical (h, w) when x arrives HOST-pre-padded for the
    first packed conv (data/pipeline.pre_pad_images geometry) — the
    single-chip ingest win kept under data-parallel meshes: each data shard
    holds the full (H_pad, W_pad) plane, so the per-shard kernel geometry is
    exactly the single-chip one and the buffer is read raw. Requires
    spatial=1 (an H-sharded padded buffer would break the framing); backends
    without the Pallas route slice the logical window back out and run the
    plain conv (identical numerics, one slice)."""
    n_spatial = mesh.shape[spatial_axis]
    if pre_padded_hw is not None and n_spatial != 1:
        raise ValueError("pre-padded ingest requires a data-parallel-only "
                         f"mesh (spatial=1), got spatial={n_spatial}")

    fwd = functools.partial(jax.lax.conv_general_dilated,
                            window_strides=(1, 1), padding="SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def local_conv(xe, w, b, pp_hw=None):
        if train and jax.default_backend() == "tpu":
            from hyperpri_tpu.ops.pallas.conv_train import conv3x3_bias_train

            return conv3x3_bias_train(xe, w, b.astype(jnp.float32), False, pp_hw)
        if pp_hw is not None:
            # No Pallas route (e.g. the virtual CPU test mesh): recover the
            # logical window from the padded buffer (crop at (1,1), true
            # channel count from the kernel) and run the plain conv.
            h, width = pp_hw
            xe = xe[:, 1 : 1 + h, 1 : 1 + width, : w.shape[2]]
        return fwd(xe, w) + b.astype(xe.dtype)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(data_axis, spatial_axis, None, None), P(), P()),
        out_specs=P(data_axis, spatial_axis, None, None),
        check_rep=False,
    )
    def f(xs, w, b):
        if n_spatial == 1:
            return local_conv(xs, w, b, pre_padded_hw)
        idx = jax.lax.axis_index(spatial_axis)
        up = [(i, (i + 1) % n_spatial) for i in range(n_spatial)]
        down = [(i, (i - 1) % n_spatial) for i in range(n_spatial)]
        # halo_top: the last row of the shard ABOVE us; halo_bot: the first
        # row of the shard BELOW us. ppermute over the ring; the wrapped
        # edges are zeroed (global SAME zero padding).
        halo_top = jax.lax.ppermute(xs[:, -1:, :, :], spatial_axis, up)
        halo_bot = jax.lax.ppermute(xs[:, :1, :, :], spatial_axis, down)
        halo_top = jnp.where(idx == 0, 0.0, halo_top)
        halo_bot = jnp.where(idx == n_spatial - 1, 0.0, halo_bot)
        xe = jnp.concatenate([halo_top, xs, halo_bot], axis=1)
        # SAME conv on the extended block: its zero-padded top/bottom rows
        # only affect the two halo output rows, which are sliced off.
        return local_conv(xe, w, b)[:, 1:-1]

    return f(x, w, b)
