from . import tables  # noqa: F401
from .config import REV2, CodecConfig, EXT, EXT_SLICED  # noqa: F401
