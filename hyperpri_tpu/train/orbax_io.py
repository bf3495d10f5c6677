"""Orbax checkpoint backend: sharding-aware, async-capable saves.

The msgpack backend (train/checkpoint.py) is the default for single-host
runs; this backend is the SPMD answer to DeepSpeed's partitioned checkpoint
layout + zero_to_fp32 consolidation (reference src/PLTrainer.py:186-216):
each host writes its shards, and restore *re-distributes automatically* to
whatever mesh/shardings the restoring program declares — no consolidation
step ever exists.

Usage:
    ck = OrbaxCheckpointer(directory)
    ck.save(step, state_view)                      # async by default
    state_view = ck.restore(step, target=state_view_with_shardings)
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class OrbaxCheckpointer:
    def __init__(self, directory: str, max_to_keep: int = 2, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=async_save
            ),
        )

    def save(self, step: int, tree: Any, wait: bool = False) -> None:
        self.manager.save(step, args=self._ocp.args.StandardSave(tree))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {self.directory}")
        if target is None:
            return self.manager.restore(step)
        # Restore directly into the target's shardings: each device reads only
        # its shard (the no-consolidation property).
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
            if hasattr(x, "shape")
            else x,
            target,
        )
        return self.manager.restore(step, args=self._ocp.args.StandardRestore(abstract))

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
