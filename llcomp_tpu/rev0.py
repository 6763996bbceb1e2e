"""Revision-0 codec — the llcomp.js bitstream (magic 0x77).

The reference ships a second, independent implementation in JavaScript
(`/root/reference/llcomp.js`) that encodes an **older, incompatible** format
revision (SURVEY §2.12).  This module reimplements it so rev-0 files remain
readable/writable from this framework.  Differences from rev 2:

* magic byte 0x77 (`llcomp.js:314`), not 0x79;
* the probability model stores 128 states but draws P(MPS) from a 64-entry
  **float** table indexed ``state >> 1`` (`llcomp.js:113-122,138`); the coded
  probability is P(bit==1) = p if the state is odd else 1-p;
* the range coder multiplies by the float probability with clamping
  ``max(1, min(range-1, int(range*p)))`` (`llcomp.js:40,80`) instead of the
  integer ``range*P >> 8``;
* the MPS/LPS transition tables have different tails
  (`llcomp.js:95-111`: MPS ...125,124,125,126,127; LPS ...76,77,126,127);
* compression requires 3 or 4 channels (`llcomp.js:299`).

Everything else (RCT, neighbors, context hash, binarization, model layout,
finish semantics) matches rev 2.  All float arithmetic is IEEE-754 double in
both Node and Python, so results are deterministic and portable.  No Node
runtime exists in this environment, so conformance is established by
round-trip testing plus the shared-component equivalences above.
"""
from __future__ import annotations

import numpy as np

from .core import tables
from .oracle import (
    _trunc_div4,
    binarize,
    context_and_residual,
    median3,
    rct_forward,
)

MAGIC = 0x77

# MPS transition (`llcomp.js:95-102`): climb by 2 up to 125, then the tail
# 124,125 self-pairs; 126/127 absorbing (and unreachable from state 0).
NEXT_STATE_MPS_0 = np.array(
    [min(i + 2, 125) if i < 124 else i for i in range(128)], dtype=np.uint8
)

# LPS transition (`llcomp.js:104-111`).
NEXT_STATE_LPS_0 = np.array([
    1, 0, 0, 1, 2, 3, 4, 5, 4, 5, 8, 9, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
    18, 19, 18, 19, 22, 23, 22, 23, 24, 25, 26, 27, 26, 27, 30, 31, 30, 31,
    32, 33, 32, 33, 36, 37, 36, 37, 38, 39, 38, 39, 42, 43, 42, 43, 44, 45,
    44, 45, 46, 47, 48, 49, 48, 49, 50, 51, 52, 53, 52, 53, 54, 55, 54, 55,
    56, 57, 58, 59, 58, 59, 60, 61, 60, 61, 60, 61, 62, 63, 64, 65, 64, 65,
    66, 67, 66, 67, 66, 67, 68, 69, 68, 69, 70, 71, 70, 71, 70, 71, 72, 73,
    72, 73, 72, 73, 74, 75, 74, 75, 74, 75, 76, 77, 76, 77, 126, 127,
], dtype=np.uint8)

# P(MPS) by state pair (`llcomp.js:113-122`), float64.
MPS_PROBABILITY = np.array([
    0.5156, 0.5405, 0.5615, 0.5825, 0.6016, 0.6207, 0.6398, 0.6570,
    0.6723, 0.6875, 0.7028, 0.7162, 0.7295, 0.7410, 0.7525, 0.7639,
    0.7754, 0.7849, 0.7945, 0.8040, 0.8117, 0.8212, 0.8289, 0.8365,
    0.8422, 0.8499, 0.8556, 0.8613, 0.8671, 0.8728, 0.8785, 0.8823,
    0.8881, 0.8919, 0.8957, 0.8995, 0.9033, 0.9072, 0.9110, 0.9148,
    0.9167, 0.9205, 0.9224, 0.9263, 0.9282, 0.9301, 0.9320, 0.9339,
    0.9358, 0.9377, 0.9396, 0.9415, 0.9434, 0.9454, 0.9473, 0.9473,
    0.9492, 0.9511, 0.9511, 0.9530, 0.9530, 0.9549, 0.9568, 0.9702,
], dtype=np.float64)

N_HASHES = 7926  # same reachable folded-hash space as rev 2
SUB = 8


def _prob1(state: int) -> float:
    p = MPS_PROBABILITY[state >> 1]
    return p if (state & 1) else 1.0 - p


class RangeEncoder0:
    """Rev-0 encoder: float probability with clamped split (`llcomp.js:39-52`)."""

    def __init__(self) -> None:
        self.low = 0
        self.range = 0xFF00
        self.pending = -1
        self.run = 0
        self.out = bytearray()

    def _shift(self) -> None:
        if self.pending < 0:
            self.pending = self.low >> 8
        elif self.low <= 0xFF00:
            self.out.append(self.pending & 0xFF)
            self.out.extend(b"\xff" * self.run)
            self.run = 0
            self.pending = self.low >> 8
        elif self.low >= 0x10000:
            self.out.append((self.pending + 1) & 0xFF)
            self.out.extend(b"\x00" * self.run)
            self.run = 0
            self.pending = (self.low >> 8) & 0xFF
        else:
            self.run += 1
        self.low = (self.low & 0xFF) << 8
        self.range <<= 8

    def put(self, bit: int, prob: float) -> None:
        range1 = max(1, min(self.range - 1, int(self.range * prob)))
        if bit:
            self.low += self.range - range1
            self.range = range1
        else:
            self.range -= range1
        if self.range < 0x100:
            self._shift()

    def finish(self) -> bytes:
        self.range = 0xFF
        self.low += 0xFF
        self._shift()
        self.range = 0xFF
        self._shift()
        return bytes(self.out)


class RangeDecoder0:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.range = 0xFF00
        self.low = (self._byte() << 8) | self._byte()

    def _byte(self) -> int:
        if self.pos >= len(self.data):
            return 0
        b = self.data[self.pos]
        self.pos += 1
        return b

    def get(self, prob: float) -> int:
        range1 = max(1, min(self.range - 1, int(self.range * prob)))
        self.range -= range1
        if self.low < self.range:
            bit = 0
        else:
            self.low -= self.range
            self.range = range1
            bit = 1
        if self.range < 0x100:
            self.range <<= 8
            self.low = (self.low << 8) | self._byte()
        return bit


def encode(img: np.ndarray) -> bytes:
    """uint8 [H, W, C] (C in {3, 4}, like llcomp.js) -> rev-0 stream."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[-1] not in (3, 4):
        raise ValueError("revision 0 requires 3 or 4 channels (llcomp.js:299)")
    H, W, C = img.shape
    v = rct_forward(img)
    hash_, diff = context_and_residual(v)
    ctx, bit, valid = binarize(diff)
    sym_hash = hash_.reshape(-1)

    states = np.zeros(N_HASHES * SUB, dtype=np.uint8)
    enc = RangeEncoder0()
    for si in range(ctx.shape[0]):
        base = int(sym_hash[si]) * SUB
        for k in range(ctx.shape[1]):
            if not valid[si, k]:
                break
            idx = base + int(ctx[si, k])
            st = int(states[idx])
            b = int(bit[si, k])
            enc.put(b, _prob1(st))
            states[idx] = (
                NEXT_STATE_MPS_0[st] if b == (st & 1) else NEXT_STATE_LPS_0[st]
            )
    head = bytes([MAGIC, C, W & 0xFF, W >> 8, H & 0xFF, H >> 8])
    return head + enc.finish()


def decode(data: bytes) -> np.ndarray:
    """Rev-0 stream -> uint8 [H, W, C]."""
    if data[0] != MAGIC:
        raise ValueError("Invalid magic number")
    C = data[1]
    W = data[2] | (data[3] << 8)
    H = data[4] | (data[5] << 8)
    dec = RangeDecoder0(data, pos=6)

    states = np.zeros(N_HASHES * SUB, dtype=np.uint8)
    q11 = tables.QUANT11
    q5 = tables.QUANT5
    lines = np.zeros((3, W * C), dtype=np.int64)
    out = np.empty((H, W, C), dtype=np.uint8)

    def q(table, x):
        return int(table[max(-128, min(127, x)) & 0xFF])

    def rac(base, ctx):
        idx = base + ctx
        st = int(states[idx])
        b = dec.get(_prob1(st))
        states[idx] = (
            NEXT_STATE_MPS_0[st] if b == (st & 1) else NEXT_STATE_LPS_0[st]
        )
        return b

    for h in range(H):
        line0 = lines[h % 3]
        line1 = lines[(h + 2) % 3]
        line2 = lines[(h + 1) % 3]
        for w in range(W):
            x = w * C
            for i in range(C):
                l = int(line0[x - C + i]) if w > 0 else (int(line1[x + i]) if h > 0 else 128)
                t = int(line1[x + i]) if h > 0 else l
                L = int(line0[x - 2 * C + i]) if w > 1 else l
                tl = int(line1[x - C + i]) if h > 0 and w > 0 else t
                tr = int(line1[x + C + i]) if h > 0 and w < W - 1 else t
                T = int(line2[x + i]) if h > 1 else t

                hsh = (q(q11, l - tl) + q(q11, tl - t) * 11 + q(q11, t - tr) * 121
                       + q(q5, L - l) * 605 + q(q5, T - t) * 3025)
                predict = median3(l, l + t - tl, t)
                neg = hsh < 0
                if neg:
                    hsh = -hsh
                base = hsh * SUB

                if rac(base, 0):
                    diff = 0
                else:
                    e = 0
                    c = 1
                    while rac(base, min(c, 4)):
                        c += 1
                        e += 1
                        if e > 31:
                            raise ValueError("Invalid exponent")
                    value = 1
                    c = 5
                    for _ in range(e):
                        value = 2 * value + rac(base, min(c, 6))
                        c += 1
                    diff = -value if rac(base, 7) else value
                if neg:
                    diff = -diff
                line0[x + i] = predict + diff

            r, g, b = int(line0[x]), int(line0[x + 1]), int(line0[x + 2])
            g -= int(_trunc_div4(np.int64(r + b)))
            r += g
            b += g
            out[h, w, 0] = max(0, min(255, r))
            out[h, w, 1] = max(0, min(255, g))
            out[h, w, 2] = max(0, min(255, b))
            for i in range(3, C):
                out[h, w, i] = line0[x + i] & 0xFF
    return out
