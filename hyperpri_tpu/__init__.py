"""hyperpri_tpu — a TPU-native hyperspectral root-segmentation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
GatorSense/HyperPRI (reference: /root/reference): three binary-segmentation
model families (UNet on RGB, SpectralUNET and CubeNET on 238-band
hyperspectral cubes), the HyperPRI ENVI data pipeline, the 5-fold
cross-validation training/evaluation protocol, threshold sweeps, and
segmentation-map rendering — re-designed TPU-first:

- NHWC layouts, bf16 compute with f32 params, static shapes under jit.
- CubeNET's depth-238 Conv3d front end is lowered to a single MXU 3x3
  conv with 238 input channels (mathematically identical).
- SpectralUNET's per-pixel MLP is a batched (N*H*W, C) matmul stack on
  the MXU instead of the reference's per-image Python loop
  (reference: src/Experiments/models.py:132).
- Distribution is SPMD over a jax.sharding.Mesh (data + spatial axes);
  XLA GSPMD inserts ICI collectives and conv halo exchanges from
  sharding annotations — replacing Lightning DDP / DeepSpeed ZeRO-2
  (reference: src/PLTrainer.py:409-453).
"""

__version__ = "0.1.0"

import os as _os

def _machine_key() -> str:
    """Host-CPU fingerprint the compile cache is keyed by.

    XLA:CPU cache entries are AOT machine code; their embedded CPU-feature
    set (AMX/AVX512 variants) follows the machine that compiled them, and
    loading them on a host with a different feature set logs "could lead to
    execution errors such as SIGILL". Keying the cache directory by the
    host's feature flags makes entries load only where they were compiled —
    same-host reruns (the common case) stay warm, a new host starts cold
    instead of loading foreign AOT code."""
    import hashlib
    import platform

    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith(("flags", "features")):
                    sig += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(sig.encode()).hexdigest()[:12]


# Persistent XLA compilation cache: full-model TPU compiles run minutes
# (remote Mosaic kernel compiles included); caching them across processes
# cuts trainer/eval startup from ~7 min to seconds on warm starts. Opt out
# with HYPERPRI_NO_COMPILE_CACHE=1. Set via env (works before OR after
# `import jax` as long as no backend is initialized yet).
if not _os.environ.get("HYPERPRI_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(
            _os.path.expanduser("~"), ".cache", "hyperpri_tpu_xla", _machine_key()
        ),
    )
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
    try:  # if jax is already imported, mirror into the live config
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir", _os.environ["JAX_COMPILATION_CACHE_DIR"]
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _sweep_compile_cache(limit_bytes: int = 4 << 30) -> None:
    """LRU-evict the persistent compile cache down to `limit_bytes`.

    The cache grows without bound otherwise (one entry per distinct
    executable; full-model entries run tens of MB). Eviction is by mtime —
    jax rewrites entries on cache hits, so mtime approximates recency of
    use. Best-effort: any error leaves the cache as-is."""
    cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir or not _os.path.isdir(cache_dir):
        return
    try:
        entries = []
        total = 0
        with _os.scandir(cache_dir) as it:
            for e in it:
                if e.is_file():
                    st = e.stat()
                    entries.append((st.st_mtime, st.st_size, e.path))
                    total += st.st_size
        if total <= limit_bytes:
            return
        entries.sort()  # oldest first
        for _, size, path in entries:
            _os.unlink(path)
            total -= size
            if total <= limit_bytes:
                break
    except OSError:  # pragma: no cover - concurrent writers, perms
        pass


if not _os.environ.get("HYPERPRI_NO_COMPILE_CACHE"):
    _sweep_compile_cache()

from hyperpri_tpu.models import UNet, SpectralUNET, CubeNET, initialize_model

__all__ = ["UNet", "SpectralUNET", "CubeNET", "initialize_model", "__version__"]
