"""Native-extension builder: compile csrc/*.cpp at first use, bind via ctypes.

TPU-native analog of the reference's JIT extension machinery
(gptqmodel/utils/cpp.py + extension.py registry: "build only what you use").
No pybind11 in this image, so bindings are plain ``extern "C"`` + ctypes.
Failures degrade gracefully — callers fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

log = logging.getLogger("gptqmodel_tpu")

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_CACHE = Path(
    os.environ.get("GPTQ_TPU_EXT_CACHE", Path.home() / ".cache" / "gptqmodel_tpu")
)

_libs: dict[str, object] = {}


def _build(name: str) -> Path | None:
    src = _CSRC / f"{name}.cpp"
    if not src.exists():
        return None
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    _CACHE.mkdir(parents=True, exist_ok=True)
    so = _CACHE / f"{name}-{tag}.so"
    if so.exists():
        return so
    with tempfile.TemporaryDirectory(dir=_CACHE) as td:
        tmp_so = Path(td) / so.name
        cmd = [
            os.environ.get("CXX", "g++"), "-O3", "-shared", "-fPIC",
            "-std=c++17", "-pthread", str(src), "-o", str(tmp_so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001 — any build failure -> numpy path
            log.warning("native ext %s build failed (%s); using numpy", name, e)
            return None
        os.replace(tmp_so, so)  # atomic publish
    return so


def load_ext(name: str):
    """ctypes handle for csrc/<name>.cpp, or None (numpy fallback)."""
    if name in _libs:
        return _libs[name]
    so = _build(name)
    lib = ctypes.CDLL(str(so)) if so else None
    _libs[name] = lib
    return lib


def pack_ext():
    """The threaded bit-packer (csrc/pack.cpp), with argtypes configured."""
    lib = load_ext("pack")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        i32p = ctypes.POINTER(ctypes.c_int32)
        for fn in (lib.pack_axis0_cont, lib.pack_axis0_planar):
            fn.argtypes = [
                i32p, i32p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
            ]
            fn.restype = None
        lib._configured = True
    return lib
