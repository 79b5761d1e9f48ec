"""Install-time build of the native host library.

The reference compiles its native layer inside setup.py (ObjC++ compiler
hook + Metal linkage, mps_bitsandbytes/setup.py:13-47). The TPU build's
native layer is a plain C++ shared library (csrc/host_pack.cpp,
multithreaded fp->NF4 host packer) bound via ctypes — pybind11 is not part
of this environment — so the install-time equivalent is: run the csrc
Makefile with the platform compiler and ship the result inside the package
at tpu_bitsandbytes/utils/libtbnb_host.so (the first path
utils/native.py probes). Build failure is non-fatal, matching the
reference's fallback contract: every native op has a pure-JAX fallback.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class build_py_with_native(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        csrc = os.path.join(here, "csrc")
        so = os.path.join(csrc, "libtbnb_host.so")
        try:
            subprocess.check_call(["make", "-C", csrc])
        except Exception as exc:  # missing compiler/make: fall back
            print(f"tpu-bitsandbytes: native host lib build skipped ({exc});"
                  " pure-JAX fallbacks will be used")
            if not os.path.exists(so):
                return
        dst = os.path.join(self.build_lib, "tpu_bitsandbytes", "utils")
        os.makedirs(dst, exist_ok=True)
        shutil.copy2(so, dst)
        print(f"tpu-bitsandbytes: bundled native host lib -> "
              f"{os.path.join(dst, 'libtbnb_host.so')}")


setup(cmdclass={"build_py": build_py_with_native})
