"""Host input pipeline: shuffle, collate, pad, and prefetch to device.

Replaces torch DataLoader as used by the reference (PLTrainer.py:338-343,
467-471): batch sizes {'train': 2, 'val': 2, 'test': 1|2}, shuffled train,
sequential eval.

TPU-first design:
  - Fixed batch shapes under jit: the final partial batch is padded to the
    full batch size and carries a per-sample `valid` mask consumed by the
    loss/metrics (no recompiles, no dropped samples — torch's default
    drop_last=False semantics, preserved exactly).
  - Background-thread prefetch with a bounded queue; each batch is
    device_put while the previous one computes, overlapping host I/O
    (the ~267 MB/cube ENVI reads, SURVEY.md §3.1) with TPU step time.
  - Per-epoch shuffling is a pure function of (seed, epoch) — deterministic
    resume without loader state.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Sequence

import jax
import numpy as np


def collate(samples: Sequence[Dict], batch_size: int) -> Dict[str, np.ndarray]:
    """Stack samples; cyclic-pad to `batch_size` with a `valid` mask.

    Padding repeats real samples (wrap-around) rather than zero-filling:
    loss/metrics exclude pad rows via `valid` either way, but BatchNorm batch
    statistics see the whole fixed-shape batch — all-zero pad images would
    skew the mean/var used to normalize real samples and pollute the running
    stats, diverging from the reference's smaller last batch. Duplicated real
    images keep the statistics on-distribution."""
    n = len(samples)
    assert 0 < n <= batch_size
    reps = [samples[i % n] for i in range(batch_size)]
    image = np.stack([s["image"] for s in reps])
    mask = np.stack([s["mask"] for s in reps])
    valid = (np.arange(batch_size) < n).astype(np.float32)
    names = [s["index"] for s in samples] + [""] * (batch_size - n)
    return {"image": image, "mask": mask, "valid": valid, "names": names}


class DataLoader:
    """Minimal epoch-based loader over a HyperpriDataset-like object.

    `shuffle=True` draws a fresh permutation per epoch from
    default_rng((seed, epoch)); crops use an independent stream keyed the
    same way, so a resumed epoch reproduces the original batches.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        device_put: bool = True,
        sharding=None,
        weighted: bool = False,
        image_dtype=None,
        fetch_workers: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.device_put = device_put
        self.sharding = sharding
        # Cast images on host before device_put (e.g. ml_dtypes.bfloat16 when
        # the model computes in bf16): halves host->device bytes, which is
        # the ingest bottleneck for ~270 MB hyperspectral cubes. The cast is
        # pushed into the dataset when it supports it (set_image_dtype), so
        # decoded cubes are cached already-cast and warm epochs skip the
        # ~0.5 s/batch full-cube astype entirely.
        self.image_dtype = image_dtype
        if image_dtype is not None and hasattr(dataset, "set_image_dtype"):
            dataset.set_image_dtype(image_dtype)
        # Per-sample threaded fetch within a batch: decode/crop/binarize are
        # large numpy ops that release the GIL; 2-4 workers overlap them.
        self.fetch_workers = max(1, int(fetch_workers))
        # Inverse-frequency weighted sampling from dataset.sample_weights
        # (the weights the reference computes at dataset.py:76-82 but never
        # consumes; opt-in here).
        self.weighted = weighted
        self.epoch = 0
        # Host pre-padded ingest (models/parts.first_conv_ingest_spec):
        # when set, every yielded batch's image is embedded into a zeroed
        # (H_pad, W_pad, C_pad) buffer at (row0, col0) on the host, so the
        # first packed conv's fwd/wgrad read it raw and the full-resolution
        # in-graph pad never runs. probe() stays LOGICAL (it feeds model
        # init). The Trainer sets this after probing shapes.
        self.image_pad_spec = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def probe(self) -> Dict[str, np.ndarray]:
        """One host-side single-sample batch for shape/dtype inspection.

        Avoids `next(iter(loader))`: an abandoned prefetching iterator leaves
        its producer thread parked on q.put holding ~prefetch batches of host
        RAM (hundreds of MB for HSI cubes) for the process lifetime."""
        rng = np.random.default_rng((self.seed + 1, self.epoch))
        b = collate([self.dataset.__getitem__(0, rng=rng)], 1)
        if self.image_dtype is not None:
            b["image"] = b["image"].astype(self.image_dtype)
        return b

    def __len__(self):
        n = len(self.dataset)
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[Dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.weighted:
            w = np.asarray(self.dataset.sample_weights, np.float64)
            p = w / w.sum()
            order = np.random.default_rng((self.seed, self.epoch)).choice(
                n, size=n, replace=True, p=p
            )
        elif self.shuffle:
            order = np.random.default_rng((self.seed, self.epoch)).permutation(n)
        crop_rng = np.random.default_rng((self.seed + 1, self.epoch))
        pool = (
            ThreadPoolExecutor(min(self.fetch_workers, self.batch_size))
            if self.fetch_workers > 1 and self.batch_size > 1
            else None
        )
        try:
            for start in range(0, n, self.batch_size):
                idx = order[start : start + self.batch_size]
                # One spawned child generator per sample: crops stay a pure
                # function of (seed, epoch, position) whether fetched
                # sequentially or in parallel.
                rngs = crop_rng.spawn(len(idx))
                fetch = lambda ir: self.dataset.__getitem__(int(ir[0]), rng=ir[1])
                if pool is not None:
                    samples = list(pool.map(fetch, zip(idx, rngs)))
                else:
                    samples = [fetch(ir) for ir in zip(idx, rngs)]
                yield collate(samples, self.batch_size)
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    def __iter__(self) -> Iterator[Dict]:
        if self.prefetch <= 0:
            yield from self._maybe_put(self._batches())
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def producer():
            try:
                for b in self._maybe_put(self._batches()):
                    q.put(b)
            except BaseException as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is sentinel:
                break
            yield b
        t.join()
        if err:
            raise err[0]

    def _maybe_put(self, it: Iterator[Dict]) -> Iterator[Dict]:
        for b in it:
            if self.image_dtype is not None and b["image"].dtype != self.image_dtype:
                b["image"] = b["image"].astype(self.image_dtype)
            if self.image_pad_spec is not None:
                b["image"] = pre_pad_images(b["image"], self.image_pad_spec)
            if self.device_put:
                names = b.pop("names")
                arrays = {k: v for k, v in b.items()}
                if isinstance(self.sharding, dict):
                    arrays = {
                        k: jax.device_put(v, self.sharding[k]) if k in self.sharding
                        else jax.device_put(v)
                        for k, v in arrays.items()
                    }
                elif self.sharding is not None:
                    arrays = jax.device_put(arrays, self.sharding)
                else:
                    arrays = jax.device_put(arrays)
                arrays["names"] = names
                yield arrays
            else:
                yield b


def pre_pad_images(image: np.ndarray, spec) -> np.ndarray:
    """Embed a logical (N, H, W, C) image batch into the zeroed pre-padded
    ingest buffer (models/parts.first_conv_ingest_spec geometry): logical
    (0,0) at (row0, col0), lanes zero-extended. One host-side copy per batch,
    absorbed by the loader's prefetch — replaces a ~1.9 ms/step on-device
    full-resolution pad (BENCHMARKS.md)."""
    (hp, wp, cp), (r0, c0) = spec[0], spec[1]
    n, h, w, c = image.shape
    if len(spec) > 2:
        # The spec carries the logical dims it was probed with: a batch whose
        # crop drifted (e.g. 606 rows vs the probed 608, same padded extent)
        # would embed silently — zero rows entering the first conv's BN batch
        # statistics with no shape error and no recompile. Fail loudly instead.
        if (h, w, c) != tuple(spec[2]):
            raise ValueError(
                f"pre-padded ingest spec was probed for logical {tuple(spec[2])} "
                f"(h, w, c) but this batch is {(h, w, c)} — the crop shape "
                "changed after the Trainer wired the ingest spec"
            )
    buf = np.zeros((n, hp, wp, cp), image.dtype)
    buf[:, r0 : r0 + h, c0 : c0 + w, :c] = image
    return buf


def epoch_metrics_mask(mask: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Broadcast the per-sample valid flags to per-pixel weights."""
    return valid.reshape((-1,) + (1,) * (mask.ndim - 1))
