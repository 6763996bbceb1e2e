"""Build and load the native host runtime (ctypes, no pybind11 dependency).

Compiles ``llcomp_host.cpp`` to a shared library on first use and caches it
next to the source keyed by source hash, so editing the C++ transparently
rebuilds.  Thread-safe via atomic rename.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "llcomp_host.cpp"

_lib: ctypes.CDLL | None = None


class NativeBuildError(RuntimeError):
    pass


def _compiler() -> str | None:
    for cc in (os.environ.get("CXX"), "g++", "clang++"):
        if not cc:
            continue
        try:
            subprocess.run([cc, "--version"], capture_output=True, check=True)
            return cc
        except (FileNotFoundError, subprocess.CalledProcessError):
            continue
    return None


def build(force: bool = False) -> pathlib.Path:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _DIR / f"_llcomp_host_{tag}.so"
    if out.exists() and not force:
        return out
    cc = _compiler()
    if cc is None:
        raise NativeBuildError("no C++ compiler available")
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=_DIR, delete=False
    ) as tmp:
        tmp_path = pathlib.Path(tmp.name)
    try:
        subprocess.run(
            [cc, "-O3", "-std=c++17", "-shared", "-fPIC", "-DNDEBUG",
             "-pthread", "-o", str(tmp_path), str(_SRC)],
            check=True, capture_output=True,
        )
        tmp_path.replace(out)  # atomic within the directory
    except subprocess.CalledProcessError as e:
        tmp_path.unlink(missing_ok=True)
        raise NativeBuildError(
            f"native build failed:\n{e.stderr.decode(errors='replace')}"
        ) from e
    # clean stale builds
    for old in _DIR.glob("_llcomp_host_*.so"):
        if old != out:
            old.unlink(missing_ok=True)
    return out


def load_library() -> ctypes.CDLL:
    global _lib
    if os.environ.get("LLCT_NO_NATIVE") == "1":
        # ops/debug kill-switch: force every caller (api auto-routing,
        # _native_available, tests) onto the pure jax/oracle engines
        raise NativeBuildError("native runtime disabled via LLCT_NO_NATIVE=1")
    if _lib is None:
        lib = ctypes.CDLL(str(build()))
        lib.llct_bound.restype = ctypes.c_size_t
        lib.llct_bound.argtypes = [ctypes.c_int] * 3
        lib.llct_encode_stream.restype = ctypes.c_size_t
        lib.llct_encode_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
        ]
        lib.llct_decode_stream.restype = ctypes.c_int
        lib.llct_decode_stream.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.llct_expand_slots.restype = ctypes.c_size_t
        lib.llct_expand_slots.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        pp = ctypes.POINTER(ctypes.c_void_p)
        lib.llct_decode_batch.restype = ctypes.c_int
        lib.llct_decode_batch.argtypes = [
            pp, ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, pp, ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.llct_encode_batch.restype = None
        lib.llct_encode_batch.argtypes = [
            pp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            pp, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
    return _lib
