"""Sharding rules: ZeRO-equivalent optimizer-state partitioning.

Replaces DeepSpeed ZeRO-2 (reference src/PLTrainer.py:421,424-433): instead
of a runtime engine that partitions optimizer state and re-gathers gradients
over NCCL, the Adam moments are *declared* sharded over the 'data' mesh axis
via PartitionSpecs; XLA GSPMD emits the reduce-scatter/all-gather pattern
over ICI from the declarations. No engine, no consolidation step — restoring
a checkpoint with different shardings re-distributes automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hyperpri_tpu.parallel.mesh import DATA_AXIS


def zero_partition_spec(leaf: Any, axis_size: int) -> P:
    """Choose a PartitionSpec for one optimizer-state leaf.

    Shards the largest dimension divisible by the axis size (preferring the
    trailing/channel dimension, which is contiguous and usually a multiple
    of 64); replicates scalars and indivisible leaves.
    """
    shape = getattr(leaf, "shape", ())
    if not shape or axis_size <= 1:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: (shape[d] % axis_size == 0, shape[d], d))
    best = dims[-1]
    if shape[best] % axis_size != 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = DATA_AXIS
    return P(*spec)


def zero_opt_state_shardings(opt_state: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings for an optax state, ZeRO-style over 'data'."""
    axis_size = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        return NamedSharding(mesh, zero_partition_spec(leaf, axis_size))

    return jax.tree.map(spec_for, opt_state)


def replicated_like(tree: Any, mesh: Mesh) -> Any:
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda _: rep, tree)


def estimate_zero_savings(opt_state: Any, mesh: Mesh) -> float:
    """Fraction of optimizer-state bytes that end up sharded (diagnostics)."""
    axis_size = mesh.shape[DATA_AXIS]
    total, sharded = 0, 0
    for leaf in jax.tree.leaves(opt_state):
        n = int(np.prod(getattr(leaf, "shape", ()) or (1,)))
        total += n
        if zero_partition_spec(leaf, axis_size) != P():
            sharded += n
    return sharded / max(total, 1)
