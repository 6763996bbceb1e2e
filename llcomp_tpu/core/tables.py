"""Rev-2 format tables as NumPy arrays.

These are *format data*, not code: the values define the llcomp rev-2 bitstream
and must match `/root/reference/llcomp.hpp:252-333` exactly for bit-exactness.
Where a table has regular structure (the MPS ladder, the quantizer bands) it is
generated; the irregular LPS fallback and probability tables are spelled out.
All tables are validated against independently-recorded literals in
``tests/test_tables.py``.
"""
from __future__ import annotations

import numpy as np


def _mps_table() -> np.ndarray:
    """MPS transition: climb two states, saturating at 126 (even) / 127 (odd).

    Matches ``nextStateMps`` at `llcomp.hpp:252-259` (tail ...125,126,127,126,127).
    """
    i = np.arange(128)
    return np.minimum(i + 2, 126 | (i & 1)).astype(np.uint8)


# LPS fallback transitions toward the 50/50 start states (`llcomp.hpp:261-268`).
NEXT_STATE_LPS = np.array([
    1, 0, 0, 1, 2, 3, 4, 5, 4, 5, 8, 9, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
    18, 19, 18, 19, 22, 23, 22, 23, 24, 25, 26, 27, 26, 27, 30, 31, 30, 31,
    32, 33, 32, 33, 36, 37, 36, 37, 38, 39, 38, 39, 42, 43, 42, 43, 44, 45,
    44, 45, 46, 47, 48, 49, 48, 49, 50, 51, 52, 53, 52, 53, 54, 55, 54, 55,
    56, 57, 58, 59, 58, 59, 60, 61, 60, 61, 60, 61, 62, 63, 64, 65, 64, 65,
    66, 67, 66, 67, 66, 67, 68, 69, 68, 69, 70, 71, 70, 71, 70, 71, 72, 73,
    72, 73, 72, 73, 74, 75, 76, 77, 76, 77, 76, 77, 76, 77, 78, 79,
], dtype=np.uint8)

NEXT_STATE_MPS = _mps_table()

# P(bit == 1 | state) scaled by 256 (`llcomp.hpp:270-281`).  Values span [7, 247],
# which keeps the range coder's sub-range strictly inside (0, range).
STATE_PROB = np.array([
    123, 131, 117, 137, 111, 143, 106, 148, 101, 153, 96, 158, 91, 163, 87, 167,
    83, 171, 79, 175, 75, 179, 72, 182, 68, 186, 66, 188, 63, 191, 60, 194,
    57, 197, 54, 200, 52, 202, 49, 205, 48, 206, 45, 209, 43, 211, 41, 213,
    40, 214, 38, 216, 36, 218, 35, 219, 33, 221, 32, 222, 30, 224, 30, 224,
    28, 226, 27, 227, 26, 228, 25, 229, 24, 230, 23, 231, 22, 232, 21, 233,
    21, 233, 20, 234, 19, 235, 18, 236, 18, 236, 17, 237, 17, 237, 16, 238,
    16, 238, 15, 239, 15, 239, 14, 240, 14, 240, 13, 241, 13, 241, 13, 241,
    12, 242, 12, 242, 12, 242, 11, 243, 11, 243, 11, 243, 11, 243, 7, 247,
], dtype=np.uint8)


def _quant_table(thresholds: tuple[int, ...]) -> np.ndarray:
    """Symmetric banded quantizer over two's-complement byte indices.

    Index k encodes the clamped signed difference d = k if k < 128 else k - 256;
    the output is sign(d) * (number of thresholds <= |d|).  With thresholds
    (1, 4) this reproduces ``quant5_table`` and with (1, 2, 5, 12, 35)
    ``quant11_table`` (`llcomp.hpp:297-333`).
    """
    k = np.arange(256)
    d = np.where(k < 128, k, k - 256)
    mag = np.searchsorted(np.asarray(thresholds), np.abs(d), side="right")
    return (np.sign(d) * mag).astype(np.int32)


QUANT5 = _quant_table((1, 4))
QUANT11 = _quant_table((1, 2, 5, 12, 35))

# Fused per-(state, bit) transition: NEXT_STATE[state * 2 + bit].  A bit equal to
# the state's MPS (its low bit, `llcomp.hpp:285`) climbs the MPS ladder,
# otherwise falls back via LPS.
_i = np.arange(128)
NEXT_STATE = np.empty(256, dtype=np.uint8)
NEXT_STATE[_i * 2 + (_i & 1)] = NEXT_STATE_MPS
NEXT_STATE[_i * 2 + 1 - (_i & 1)] = NEXT_STATE_LPS
del _i


# Sliced-container model prior ("primed" mode, container flag bit 0).
# The reference format has no sliced mode, so stripe model restarts are this
# framework's own problem; resetting every context row to these per-substate
# states instead of state 0 recovers ~70% of the restart ratio loss on
# photographic content for zero stored bytes (derivation + measurements:
# tools/derive_prior.py).  Substate k of EVERY context hash starts at
# PRIOR_SUB[k]: 0 = zero-flag (residuals mostly nonzero on photos), 1-4 =
# exponent unary (continuation likely early, unlikely late), 5-6 = mantissa,
# 7 = sign (both near 50/50).  FORMAT CONSTANTS of primed sliced containers:
# encoder and decoder must agree forever; never regenerate in place.
PRIOR_SUB = np.array([66, 41, 13, 6, 42, 10, 6, 6], dtype=np.uint8)

# Packed forms for the kernel register layout (4 substates x 8 bits per i32).
# (int() each lane BEFORE shifting: uint8 << 8 wraps to 0 under numpy.)
_p = [int(x) for x in PRIOR_SUB]
PRIOR_LO = _p[0] | _p[1] << 8 | _p[2] << 16 | _p[3] << 24
PRIOR_HI = _p[4] | _p[5] << 8 | _p[6] << 16 | _p[7] << 24
del _p


def quant5(x) -> np.ndarray:
    """quant5 with the reference's clamp-then-wrap indexing (`llcomp.hpp:339-341`)."""
    return QUANT5[np.clip(x, -128, 127) & 0xFF]


def quant11(x) -> np.ndarray:
    """quant11 with the reference's clamp-then-wrap indexing (`llcomp.hpp:335-337`)."""
    return QUANT11[np.clip(x, -128, 127) & 0xFF]
