"""Build hooks: compile the optional native ENVI reader into the package.

The reader (runtime/envi_reader.cc) is a plain C++17 shared library consumed
via ctypes (hyperpri_tpu/data/native_io.py) — no pybind11, no Python C API.
It is declared `optional`: any toolchain failure leaves the pure-numpy ENVI
path (hyperpri_tpu/data/envi.py) as the fallback, so `pip install .` never
fails for lack of a compiler.

Developers working from a checkout can keep using `make -C runtime`; the
ctypes loader searches both locations.
"""

from __future__ import annotations

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class OptionalBuildExt(build_ext):
    """build_ext that tolerates a missing/failing C++ toolchain."""

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:  # noqa: BLE001 - any toolchain failure
            print(f"WARNING: skipping optional native extension {ext.name}: {exc}")

    def get_export_symbols(self, ext):
        # ctypes shared library, not a Python extension module: there is no
        # PyInit_* symbol to export.
        return []


setup(
    ext_modules=[
        Extension(
            "hyperpri_tpu._libhyperpri_io",
            sources=["runtime/envi_reader.cc"],
            extra_compile_args=["-O3", "-std=c++17", "-pthread", "-fPIC"],
            extra_link_args=["-pthread"],
            optional=True,
        )
    ],
    cmdclass={"build_ext": OptionalBuildExt},
)
