"""Packaging for abr_iod_tpu (reference analogue: /root/reference/setup.py,
which builds the CUDA/C++ extensions of maskrcnn_benchmark).

The TPU compute path is pure JAX/XLA — nothing to compile.  The one
native component is the host data plane (csrc/abr_host.cpp: threaded
batch assembly, NMS oracle, IoU), loaded via ctypes with pure-numpy
fallbacks, so the extension is OPTIONAL: a failed build (no compiler)
still produces a fully working install.
"""

import os

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class OptionalBuildExt(build_ext):
    """Build csrc/abr_host.cpp into the package; tolerate failure (the
    ctypes loader in abr_iod_tpu/data/native.py falls back to numpy)."""

    def run(self):
        try:
            super().run()
        except Exception as exc:  # no compiler / unsupported platform
            print(f"warning: native host plane not built ({exc}); "
                  "pure-numpy fallbacks will be used")

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:
            print(f"warning: skipping {ext.name}: {exc}")


abr_host = Extension(
    # ctypes-loaded shared library (no PyInit): data/native.py searches
    # for _abrhost*.so next to the package before csrc/libabrhost.so
    "abr_iod_tpu._abrhost",
    sources=[os.path.join("csrc", "abr_host.cpp")],
    language="c++",
    extra_compile_args=["-O3", "-std=c++17", "-fPIC", "-pthread"],
    extra_link_args=["-pthread"],
)

setup(ext_modules=[abr_host], cmdclass={"build_ext": OptionalBuildExt})
