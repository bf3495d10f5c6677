"""Checkpointing: dual best-model policy + resume, msgpack-serialized pytrees.

Replaces the reference's Lightning ModelCheckpoint pair + DeepSpeed ZeRO
consolidation (src/PLTrainer.py:349-354, 379-406, 186-216, 270-330):

  - Checkpoints/      best-val_loss FULL state (params, batch_stats,
                      opt_state, counters), plus `last.ckpt` every epoch
                      (save_last=True semantics) — filenames
                      `epoch={e}-val_loss={l:.3f}-val_dice={d:.3f}.ckpt`.
  - diceCheckpoints/  best-val_dice WEIGHTS-ONLY state.

There is no consolidation step: JAX state is already a host pytree (and under
SPMD, restoring with shardings re-distributes automatically), which is the
TPU answer to zero_to_fp32 (SURVEY.md §2.2).

Format: flax msgpack of a plain state-dict — single file, no directory
layout, loadable without the model class.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

from flax import serialization


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = serialization.msgpack_serialize(serialization.to_state_dict(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def detect_checkpoint_format(path: str) -> str:
    """'zero_dir' | 'torch' | 'msgpack', decided by content, not extension.

    The reference's eval restore accepts three on-disk formats
    (PLTrainer.py:186-216, 270-330): Lightning/torch files (any extension —
    users have both .ckpt and .pt), DeepSpeed ZeRO-2 sharded *directories*,
    and (here) this repo's own msgpack pytrees. Extension-based routing
    would feed a Lightning .ckpt to the msgpack loader and crash.

      directory                      -> ZeRO-2 sharded checkpoint dir
      zip magic PK\\x03\\x04         -> torch >=1.6 zipfile serialization
      pickle proto header 0x80 0x02+ -> legacy torch pickle
      msgpack map root (0x8N/0xde..) -> this repo's flax msgpack
    """
    if os.path.isdir(path):
        return "zero_dir"
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic[:2] == b"PK":
        return "torch"
    if len(magic) == 2 and magic[0] == 0x80 and 2 <= magic[1] <= 5:
        return "torch"  # pickle protocol 2..5 (msgpack 0x80 is an empty map,
        # never the root of a saved state pytree)
    return "msgpack"


def load_pytree(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if target is None:
        return raw
    return serialization.from_state_dict(target, raw)


class DualCheckpointManager:
    """Best-val_loss full checkpoints + best-val_dice weight checkpoints."""

    def __init__(self, save_path: str, save_last: bool = True):
        self.ckpt_dir = os.path.join(save_path, "Checkpoints")
        self.dice_dir = os.path.join(save_path, "diceCheckpoints")
        self.save_last = save_last
        self.best_val_loss = float("inf")
        self.best_val_dice = float("-inf")
        self._best_loss_file: Optional[str] = None
        self._best_dice_file: Optional[str] = None

    @staticmethod
    def _fname(epoch: int, val_loss: float, val_dice: float) -> str:
        return f"epoch={epoch}-val_loss={val_loss:.3f}-val_dice={val_dice:.3f}.ckpt"

    def step(
        self,
        epoch: int,
        val_loss: float,
        val_dice: float,
        full_state: Any,
        weights_state: Any,
    ) -> Dict[str, bool]:
        """Call once per epoch after validation. Returns which bests updated."""
        out = {"best_loss": False, "best_dice": False}
        name = self._fname(epoch, val_loss, val_dice)

        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            new = os.path.join(self.ckpt_dir, name)
            save_pytree(new, full_state)
            if self._best_loss_file and os.path.exists(self._best_loss_file):
                os.remove(self._best_loss_file)  # save_top_k=1
            self._best_loss_file = new
            out["best_loss"] = True

        if val_dice > self.best_val_dice:
            self.best_val_dice = val_dice
            new = os.path.join(self.dice_dir, name)
            save_pytree(new, weights_state)
            if self._best_dice_file and os.path.exists(self._best_dice_file):
                os.remove(self._best_dice_file)
            self._best_dice_file = new
            out["best_dice"] = True

        if self.save_last:
            save_pytree(os.path.join(self.ckpt_dir, "last.ckpt"), full_state)
        return out


def find_resume_checkpoint(save_path: str) -> Optional[str]:
    """Newest `last*` checkpoint for crash resume (PLTrainer.py:379-406).

    Mesh runs checkpoint every epoch through orbax (save_path/orbax, step
    dirs named by epoch); when present those are newer-or-equal to any
    msgpack best-model export, so they win. Returned as an
    'orbax:<dir>:<step>' pointer that Trainer.fit restores sharding-aware.
    """
    orbax_dir = os.path.join(save_path, "orbax")
    if os.path.isdir(orbax_dir):
        steps = [int(d) for d in os.listdir(orbax_dir) if d.isdigit()]
        if steps:
            return f"orbax:{orbax_dir}:{max(steps)}"
    load_path = os.path.join(save_path, "Checkpoints")
    if not os.path.exists(load_path):
        return None
    best, best_t = None, -1.0
    for c in os.listdir(load_path):
        if "last" not in c:
            continue
        p = os.path.join(load_path, c)
        if os.path.getmtime(p) > best_t:
            best, best_t = p, os.path.getmtime(p)
    return best


def find_eval_checkpoint(save_path: str) -> Optional[str]:
    """Newest non-`last` checkpoint in Checkpoints/, else best_wts.pt, else
    last.ckpt (PLTrainer.py:275-294, 473-491)."""
    load_path = os.path.join(save_path, "Checkpoints")
    if os.path.exists(load_path):
        ckpts = os.listdir(load_path)
        best, best_t = None, -1.0
        for c in ckpts:
            if "last" in c:
                continue
            p = os.path.join(load_path, c)
            if os.path.getmtime(p) > best_t:
                best, best_t = p, os.path.getmtime(p)
        if best is not None:
            return best
        if os.path.exists(os.path.join(load_path, "last.ckpt")):
            return os.path.join(load_path, "last.ckpt")
        return None
    alt = os.path.join(save_path, "best_wts.pt")
    return alt if os.path.exists(alt) else None


def parse_ckpt_name(path: str) -> Dict[str, float]:
    m = re.match(r"epoch=(\d+)-val_loss=([-\d.]+)-val_dice=([-\d.]+)\.ckpt", os.path.basename(path))
    if not m:
        return {}
    return {"epoch": int(m.group(1)), "val_loss": float(m.group(2)), "val_dice": float(m.group(3))}
