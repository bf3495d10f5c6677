"""Device mesh construction for SPMD training.

Replaces the reference's process-level parallelism plumbing (Lightning
strategy strings "ddp" / "deepspeed_stage_2" / DeepSpeedStrategy(stage=3),
src/PLTrainer.py:409-453) with a jax.sharding.Mesh over ICI. Two axes:

  - 'data'    batch data-parallelism (DDP equivalent) and the axis optimizer
              state shards over (ZeRO equivalent, see sharding.py)
  - 'spatial' spatial partitioning of the H axis of the 608x968 feature maps
              (the TPU-idiomatic answer to "SpectralUNET doesn't fit on one
              device", replacing MODEL_SHARD=True; XLA GSPMD inserts the
              conv halo exchanges over ICI automatically)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    shape: Optional[Dict[str, int]] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'spatial') mesh.

    `shape` maps axis name -> size; axes omitted get size 1; a single omitted
    axis absorbs all remaining devices. Default: all devices on 'data'.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    shape = dict(shape or {})
    sizes = [shape.get(DATA_AXIS, 0), shape.get(SPATIAL_AXIS, 0)]
    known = int(np.prod([s for s in sizes if s > 0])) if any(s > 0 for s in sizes) else 1
    for i, s in enumerate(sizes):
        if s == 0:
            sizes[i] = n // known
            known *= sizes[i]
    if sizes[0] * sizes[1] != n:
        raise ValueError(f"mesh shape {sizes} does not cover {n} devices")
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """(N, H, W, C) batches: N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS if spatial else None))


def sample_sharding(mesh: Mesh) -> NamedSharding:
    """(N,) per-sample arrays (valid masks): N over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(**kwargs) -> bool:
    """Multi-host bring-up: jax.distributed.initialize when launched as one
    process per host (the multi-slice/DCN analog of the reference's implicit
    torchrun rank plumbing, SURVEY.md §5.8). No-op for single-process runs.

    Returns True if a multi-process runtime was initialized.
    """
    import os

    if int(os.environ.get("JAX_NUM_PROCESSES", os.environ.get("SLURM_NTASKS", "1"))) <= 1:
        return False
    jax.distributed.initialize(**kwargs)
    return True
