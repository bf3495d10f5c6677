"""On-disk decoded-cube cache: pay the ENVI gather once per machine, not once
per process.

The reference re-decodes every ~267 MB ENVI cube from its raw interleave on
EVERY access (/root/reference/src/dataset.py:265-268 — envi.open().load() +
moveaxis + band slice); the host-RAM LRU (data/dataset.py) removes the cost
within a process but every cold start re-pays the full strided gather + cast.
This module persists the decoded (H, W, B) band-window array — already in the
channel-last layout and ingest dtype (bf16) the models consume — so a cold
epoch becomes a single contiguous sequential read.

Layout: <cache_dir>/<sha1(key)>.bin (raw bytes) + .json sidecar (shape,
dtype, source fingerprint). The key folds in the hdr/dat absolute paths,
sizes, mtimes, the band window, and the dtype, so edits to the source cube
or a different window/dtype miss cleanly. Writes are atomic (tmp + rename):
concurrent loader processes either see a complete entry or decode themselves.

Size control: sweep_cache(dir, max_bytes) evicts least-recently-used entries
(by access/mtime) down to the cap; callers opt in (an unbounded cache is the
default because decoded windows are ~0.5x the raw data already on disk).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from typing import Optional

import numpy as np


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def cache_key(hdr_path: str, dat_path: str, band_lo: int, band_hi: Optional[int], dtype) -> str:
    payload = json.dumps(
        {
            "hdr": _fingerprint(hdr_path),
            "dat": _fingerprint(dat_path),
            "band_lo": int(band_lo),
            "band_hi": None if band_hi is None else int(band_hi),
            "dtype": np.dtype(dtype).name,
            "v": 1,
        },
        sort_keys=True,
    )
    return hashlib.sha1(payload.encode()).hexdigest()


def _paths(cache_dir: str, key: str):
    return os.path.join(cache_dir, key + ".bin"), os.path.join(cache_dir, key + ".json")


def read_cube_cached(
    hdr_path: str,
    dat_path: str,
    band_lo: int = 0,
    band_hi: Optional[int] = None,
    dtype=np.float32,
    cache_dir: Optional[str] = None,
    use_native: bool = True,
) -> np.ndarray:
    """read_cube with an on-disk decoded cache (falls through when
    cache_dir is None). Returns a contiguous (H, W, B) array."""
    from hyperpri_tpu.data.envi import read_cube

    if cache_dir is None:
        return read_cube(hdr_path, dat_path, band_lo, band_hi, dtype, use_native=use_native)

    dtype = np.dtype(dtype)
    key = cache_key(hdr_path, dat_path, band_lo, band_hi, dtype)
    bin_path, meta_path = _paths(cache_dir, key)
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        shape = tuple(meta["shape"])
        nbytes = int(np.prod(shape)) * dtype.itemsize
        if os.path.getsize(bin_path) == nbytes:
            out = np.fromfile(bin_path, dtype=np.uint8, count=nbytes).view(dtype)
            return out.reshape(shape)
    except (OSError, ValueError, KeyError):
        pass  # miss or damaged entry: re-decode and overwrite

    cube = read_cube(hdr_path, dat_path, band_lo, band_hi, dtype, use_native=use_native)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(np.ascontiguousarray(cube).tobytes())
            os.replace(tmp, bin_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"shape": list(cube.shape), "dtype": dtype.name}, f)
            os.replace(tmp, meta_path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    except OSError:
        pass  # cache is best-effort: a full/read-only disk never fails a read
    return cube


def sweep_cache(cache_dir: str, max_bytes: int) -> int:
    """Evict least-recently-touched entries down to max_bytes; returns bytes
    freed. Entry recency = the .bin's st_atime if the filesystem tracks it,
    else st_mtime."""
    try:
        names = [n for n in os.listdir(cache_dir) if n.endswith(".bin")]
    except OSError:
        return 0
    entries = []
    total = 0
    for n in names:
        p = os.path.join(cache_dir, n)
        try:
            st = os.stat(p)
        except OSError:
            continue
        entries.append((max(st.st_atime_ns, st.st_mtime_ns), st.st_size, p))
        total += st.st_size
    freed = 0
    entries.sort()
    for _, size, p in entries:
        if total - freed <= max_bytes:
            break
        for victim in (p, p[:-4] + ".json"):
            try:
                os.unlink(victim)
            except OSError:
                pass
        freed += size
    return freed
