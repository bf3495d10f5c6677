"""ctypes bindings for the native C++ ENVI reader (runtime/envi_reader.cc).

The native reader mmaps the .dat and gathers the requested band window into
float32 NHWC with a thread pool — the accelerated path behind
hyperpri_tpu.data.envi.read_cube (which falls back to numpy when the shared
library hasn't been built). Build with:  make -C runtime
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_INTERLEAVE_CODE = {"bil": 0, "bip": 1, "bsq": 2}

_lib = None
_lib_checked = False


def _find_library() -> Optional[str]:
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg_dir)
    candidates = [
        os.environ.get("HYPERPRI_IO_LIB", ""),
        os.path.join(repo, "runtime", "build", "libhyperpri_io.so"),
    ]
    # pip-installed builds place the library inside the package as
    # hyperpri_tpu/_libhyperpri_io.*.so (setup.py OptionalBuildExt).
    import glob

    candidates += sorted(glob.glob(os.path.join(pkg_dir, "_libhyperpri_io*.so")))
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def get_library():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    path = _find_library()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.envi_read_slice.restype = ctypes.c_int
    lib.envi_read_slice.argtypes = [
        ctypes.c_char_p,  # dat_path
        ctypes.c_long,  # header_offset
        ctypes.c_int,  # lines
        ctypes.c_int,  # samples
        ctypes.c_int,  # bands
        ctypes.c_int,  # dtype_code
        ctypes.c_int,  # byte_order
        ctypes.c_int,  # interleave
        ctypes.c_int,  # band_lo
        ctypes.c_int,  # band_hi
        ctypes.POINTER(ctypes.c_float),  # out
        ctypes.c_int,  # n_threads
    ]
    if hasattr(lib, "envi_read_slice_bf16"):
        lib.envi_read_slice_bf16.restype = ctypes.c_int
        lib.envi_read_slice_bf16.argtypes = lib.envi_read_slice.argtypes[:-2] + [
            ctypes.POINTER(ctypes.c_uint16),  # out (bf16 bit patterns)
            ctypes.c_int,  # n_threads
        ]
    _lib = lib
    return _lib


def _bf16_dtype():
    try:
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    except ImportError:  # pragma: no cover
        return None


def read_cube_native(hdr, dat_path: str, band_lo: int, band_hi: int, dtype) -> Optional[np.ndarray]:
    """Native band-window read; None if unavailable (caller falls back).

    dtype float32 uses envi_read_slice; ml_dtypes.bfloat16 uses
    envi_read_slice_bf16 (in-reader RNE conversion — half the materialized
    bytes, no Python-side cast on the cold decode path)."""
    lib = get_library()
    if lib is None:
        return None
    bf16 = _bf16_dtype()
    want = np.dtype(dtype)
    if want == np.float32:
        fn, out_dt, ptr_t = lib.envi_read_slice, np.float32, ctypes.c_float
    elif bf16 is not None and want == bf16 and hasattr(lib, "envi_read_slice_bf16"):
        fn, out_dt, ptr_t = lib.envi_read_slice_bf16, bf16, ctypes.c_uint16
    else:
        return None
    from hyperpri_tpu.data.envi import ENVI_DTYPES

    dtype_code = {np.dtype(v): k for k, v in ENVI_DTYPES.items()}.get(np.dtype(hdr.dtype.type))
    if dtype_code is None:
        return None
    nb = band_hi - band_lo
    out = np.empty((hdr.lines, hdr.samples, nb), out_dt)
    rc = fn(
        dat_path.encode(),
        hdr.header_offset,
        hdr.lines,
        hdr.samples,
        hdr.bands,
        dtype_code,
        hdr.byte_order,
        _INTERLEAVE_CODE[hdr.interleave],
        band_lo,
        band_hi,
        out.ctypes.data_as(ctypes.POINTER(ptr_t)),
        min(os.cpu_count() or 1, 8),
    )
    if rc != 0:
        # Fall back to the numpy reader rather than hard-failing: the numpy
        # path supports everything the header parser does, so a native-layer
        # gap (unknown dtype code, short file) must not turn a working read
        # into an error just because the library was built.
        import warnings

        warnings.warn(
            f"envi_read_slice returned {rc} for {dat_path}; falling back to numpy"
        )
        return None
    return out
