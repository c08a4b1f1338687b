"""Native (C++/OpenMP) kernels with on-demand compilation.

The shared library is built once with g++ into a cache directory and
loaded through ctypes (no pybind11 in this environment). All entry points
degrade gracefully: callers fall back to the pure-Python path when the
toolchain is unavailable.
"""

import ctypes
import hashlib
import os
import subprocess
import sys

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "fci_sigma.cpp")


def _build_dir():
    d = os.environ.get("EVCONT_TPU_NATIVE_CACHE",
                       os.path.expanduser("~/.cache/evcont_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def load_native():
    """Compile (if needed) and load the native kernel library; returns the
    ctypes CDLL or None when unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        with open(_SRC, "rb") as f:
            tag = hashlib.sha1(f.read()).hexdigest()[:12]
        so_path = os.path.join(_build_dir(), f"libfcisigma_{tag}.so")
        if not os.path.exists(so_path):
            cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
                   "-fPIC", _SRC, "-o", so_path + ".tmp"]
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
        for name in ("expand_alpha", "expand_beta",
                     "contract_alpha", "contract_beta"):
            getattr(lib, name).restype = None
        _LIB = lib
    except Exception as exc:  # toolchain missing, compile failure, ...
        print(f"evcont_tpu.native: falling back to Python kernels ({exc})",
              file=sys.stderr)
        _LIB = None
    return _LIB
