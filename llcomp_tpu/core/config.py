"""Codec configuration.

The reference keeps every format parameter as a compile-time constant
(`/root/reference/llcomp.hpp:18-25`).  Here they live in a frozen dataclass so the
framework can host future revisions, while the default instance is pinned to the
rev-2 values required for bit-exactness against the C++ encoder/decoder.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Format parameters of an llcomp bitstream revision.

    Defaults reproduce rev 2 (`llcomp.hpp:19-25`):  magic byte ``0x77 + revision``,
    LargeModel 5-neighbor context hash, exponent-context cap 4, mantissa-context
    cap 6, sign context 7, and 8 adaptive sub-states per context hash.
    """

    revision: int = 2
    large_model: bool = True
    e_lim: int = 4      # exponent context saturates at this value (contexts 1..4)
    r_lim: int = 6      # mantissa context saturates here      (contexts 5..6)
    sign_ctx: int = 7   # sign bit context                      (context  7)
    substates: int = 8  # sub-states per context hash (0..7 above)

    # Fixed-shape decomposition bound: a symbol's |diff| <= 1274 (post-RCT values
    # span [-255, 382], the gradient predictor spans [-892, 1019]), so the
    # exponent e <= 10 and a symbol emits at most 2e + 3 = 23 binary decisions.
    max_bins_per_symbol: int = 24

    @property
    def magic(self) -> int:
        return (0x77 + self.revision) & 0xFF

    @property
    def num_hashes(self) -> int:
        """Reachable context hashes after sign folding.

        The reference allocates ``(11*11*11*5*5 + 1) / 2`` hash slots
        (`llcomp.hpp:26-32`) but only hashes 0..7925 are reachable
        (max = 5 + 5*11 + 5*121 + 2*605 + 2*3025 = 7925); the trimmed model is
        bit-exact-equivalent and fits comfortably in on-chip memory.
        """
        if self.large_model:
            return 5 + 5 * 11 + 5 * 121 + 2 * 605 + 2 * 3025 + 1  # 7926
        return 5 + 5 * 11 + 5 * 121 + 1  # 671

    @property
    def num_states(self) -> int:
        """Size of the (trimmed) adaptive model in bytes: one u8 per sub-state."""
        return self.num_hashes * self.substates


#: The one configuration that is bit-exact against the reference bitstream.
REV2 = CodecConfig()

#: File extension of the single-stream reference-compatible format.
EXT = ".llcomp"
#: File extension of the sliced multi-stream container (this framework's own).
EXT_SLICED = ".llct"
