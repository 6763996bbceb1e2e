"""tpu-llcomp: a TPU-native lossless image codec (llcomp rev-2 bitstream).

Public API:
    encode(img)          -> bytes        reference-compatible single stream
    decode(data)         -> np.ndarray
    encode_sliced(...)   -> bytes        sliced container, TPU-parallel
    decode_sliced(...)   -> np.ndarray
"""
from .core.config import REV2, CodecConfig, EXT, EXT_SLICED  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports keep `import llcomp_tpu` light (no jax init) for CLI help paths.
    if name in ("encode", "decode"):
        from . import api

        return getattr(api, name)
    if name in ("encode_sliced", "decode_sliced"):
        from . import api

        return getattr(api, name)
    raise AttributeError(name)
