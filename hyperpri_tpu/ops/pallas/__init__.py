"""Pallas TPU kernels (conv families + custom VJPs).

The kernels in this package pin Mosaic-specific behavior that is NOT part of
any documented contract (see TODO.md "Quality" and BENCHMARKS.md):

  - Element OOB semantics: sub-tile window overreads clamp; whole-row reads
    past the physical round_up(h, 8) extent hard-fault the chip.
  - Element offsets must be 8-divisible on every non-lane dim and written
    syntactically as ``(expr) * 8`` for Mosaic's divisibility proof.
  - VMEM stack accounting charges per distinct dot-operand shape.
  - 64-lane sub-slices of a 128-lane vector mis-lower.

These were validated on the versions below (tests/test_pallas_conv*.py +
scripts/check_pallas_train_equiv.py are the regression net). On a version
drift we warn loudly instead of failing: the kernel tests are the real
gate, and a warning still surfaces in logs when behavior changes silently.
"""

import warnings

import jax

# (jax, jaxlib, libtpu) the Mosaic behavior pins were last validated on.
VALIDATED_VERSIONS = {"jax": "0.9.0", "jaxlib": "0.9.0", "libtpu": "0.0.34"}


def _installed_versions() -> dict:
    import jaxlib

    out = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    try:
        import importlib.metadata as md

        out["libtpu"] = md.version("libtpu")
    except Exception:
        out["libtpu"] = VALIDATED_VERSIONS["libtpu"]  # not installed: CPU-only env
    return out


def check_mosaic_version_pins(stacklevel: int = 2) -> bool:
    """Warn (once per process) when jax/jaxlib/libtpu drift from the versions
    the Mosaic behavior pins were validated on. Returns True when matched."""
    got = _installed_versions()
    if got == VALIDATED_VERSIONS:
        return True
    warnings.warn(
        "hyperpri_tpu Pallas kernels pin undocumented Mosaic behavior "
        f"(Element OOB clamping/faulting, 8-divisible offsets, VMEM "
        f"accounting) validated on {VALIDATED_VERSIONS}, but found {got}. "
        "Re-run tests/test_pallas_conv.py, tests/test_pallas_conv_packed.py "
        "and scripts/check_pallas_train_equiv.py before trusting results.",
        RuntimeWarning,
        stacklevel=stacklevel,
    )
    return False


check_mosaic_version_pins()
