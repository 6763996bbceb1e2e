"""NumPy-facing bindings to the native host runtime (see native/llcomp_host.cpp).

Same stream contract as the JAX paths: headerless rev-2 entropy streams;
containers are applied by ``api``.
"""
from __future__ import annotations

import numpy as np

from .native import load_library


def encode_stream(img: np.ndarray) -> bytes:
    """uint8 [H, W, C] -> headerless rev-2 stream (native scalar encoder)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W, C = img.shape
    lib = load_library()
    cap = lib.llct_bound(W, H, C)
    out = np.empty(cap, dtype=np.uint8)
    n = lib.llct_encode_stream(
        img.ctypes.data, W, H, C, out.ctypes.data, cap
    )
    if n == 0:
        raise ValueError(f"native encode failed for shape {img.shape}")
    return out[:n].tobytes()


def decode_stream(data: bytes, shape: tuple[int, int, int]) -> np.ndarray:
    """Headerless rev-2 stream -> uint8 [H, W, C] (native scalar decoder)."""
    H, W, C = shape
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((H, W, C), dtype=np.uint8)
    lib = load_library()
    rc = lib.llct_decode_stream(
        buf.ctypes.data if buf.size else None, buf.size, W, H, C, out.ctypes.data
    )
    if rc != 0:
        raise ValueError("corrupt stream (native decoder)")
    return out


def expand_slots(meta: np.ndarray, runs: np.ndarray) -> bytes:
    """Native slot-record expansion (alternative to coder.expand_slots)."""
    meta = np.ascontiguousarray(meta, dtype=np.int32)
    runs = np.ascontiguousarray(runs, dtype=np.int32)
    lib = load_library()
    cap = int(meta.size + runs[meta & 1 == 1].sum()) + 16
    out = np.empty(cap, dtype=np.uint8)
    n = lib.llct_expand_slots(
        meta.ctypes.data, runs.ctypes.data, meta.size, out.ctypes.data, cap
    )
    return out[:n].tobytes()
