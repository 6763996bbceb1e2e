"""Batched lane-parallel decoder (JAX).

Decoding is the serial heart of the format: every context hash depends on
just-reconstructed neighbor samples, and the number of coded bits per symbol
is data-dependent (unknown until the unary exponent prefix terminates).  The
TPU formulation keeps *all lanes in lockstep over symbols*:

  * one `lax.scan` step per symbol position (identical across lanes, since all
    lanes in a batch share slice geometry) — neighbor reads/writes become
    dynamic slices at scalar offsets shared by every lane;
  * a fixed 24-iteration inner `fori_loop` over binary decisions, each lane
    advancing its own little symbol state machine (zero-flag → unary exponent
    → mantissa → sign → done) and simply idling once its symbol is complete —
    24 is the provable per-symbol bound (SURVEY §2.4);
  * per-lane adaptive model updates as one-element gathers/scatters into the
    trimmed [S, 63409] state table (a trash column absorbs idle lanes);
  * the inverse color transform is hoisted out of the loop entirely: it is a
    pure per-pixel map over the reconstructed planes, applied vectorized at
    the end (the reference interleaves it per pixel, `llcomp.hpp:532-540`,
    but it commutes with reconstruction).

Reference semantics: decode loop at `llcomp.hpp:486-545`; getSymbol mirror at
`llcomp.hpp:219-247`.  Corruption handling is *stronger* than the reference:
a symbol that fails to terminate within 24 decisions sets a per-lane error
flag (the reference only throws on exponents > 31 and otherwise emits
garbage).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .core import transform
from .core.config import REV2, CodecConfig

# Symbol state-machine phases.
_ZF, _EXP, _MANT, _SIGN, _DONE = 0, 1, 2, 3, 4


@functools.lru_cache(maxsize=64)
def _schedule(H: int, W: int, C: int):
    """Per-symbol-step scalars shared by all lanes: offsets, ring rows, flags."""
    t = np.arange(H * W * C)
    i = t % C
    w = (t // C) % W
    h = t // (C * W)
    x_off = w * C + i
    flags = (
        (w > 0).astype(np.int32)
        | ((h > 0).astype(np.int32) << 1)
        | ((w > 1).astype(np.int32) << 2)
        | ((w < W - 1).astype(np.int32) << 3)
        | ((h > 1).astype(np.int32) << 4)
    )
    # NumPy (not jnp): this cache is shared across traces, and device arrays
    # created inside one trace must never leak into another.
    return (
        x_off.astype(np.int32),
        (h % 3).astype(np.int32),
        ((h + 2) % 3).astype(np.int32),
        ((h + 1) % 3).astype(np.int32),
        flags,
    )


def _line_at(lines, row, off):
    """lines[:, row, off] for traced scalar row/off -> [S]."""
    S = lines.shape[0]
    sl = jax.lax.dynamic_slice(lines, (0, row, off), (S, 1, 1))
    return sl.reshape(S)


def _decode_impl(data: jnp.ndarray, H: int, W: int, C: int, cfg: CodecConfig = REV2):
    """data [S, cap] u8 (zero-padded) -> (planes [S, H, W, C] i32, err [S] bool).

    Pure function (unjitted) for shard_map wrapping; ``_decode_scan`` below is
    the jitted single-device entry point.
    """
    S, cap = data.shape
    NS = cfg.num_states
    stride = W * C
    d32 = data.astype(jnp.int32)
    # Flat 1-D gathers with absolute offsets: XLA:TPU compiles these fast,
    # unlike 2-D batched gathers (docs/DESIGN.md).
    dflat = d32.reshape(-1)
    data_base = jnp.arange(S) * cap
    lane_base = jnp.arange(S) * (NS + 1)

    x_off_t, cur_t, up_t, upup_t, flags_t = _schedule(H, W, C)

    # RangeDecoder init consumes two bytes (`llcomp.hpp:93-96`).
    low0 = (d32[:, 0] << 8) | d32[:, 1]

    def read_byte(pos):
        b = dflat[data_base + jnp.minimum(pos, cap - 1)]
        return jnp.where(pos < cap, b, 0)  # zero past end, like the reference

    def sym_step(carry, xs):
        states, lines, low, rng, pos, err = carry
        x_off, cur, up, upup, flags = xs
        w_pos = (flags & 1) != 0
        h_pos = (flags & 2) != 0
        w_gt1 = (flags & 4) != 0
        w_lt = (flags & 8) != 0
        h_gt1 = (flags & 16) != 0

        # -- neighbors from the reconstruction ring buffer ----------------
        lm1 = jnp.maximum(x_off - C, 0)
        lm2 = jnp.maximum(x_off - 2 * C, 0)
        lp1 = jnp.minimum(x_off + C, stride - 1)
        cur_m1 = _line_at(lines, cur, lm1)
        up_x = _line_at(lines, up, x_off)
        l = jnp.where(w_pos, cur_m1, jnp.where(h_pos, up_x, 128))
        t = jnp.where(h_pos, up_x, l)
        L = jnp.where(w_gt1, _line_at(lines, cur, lm2), l)
        tl = jnp.where(h_pos & w_pos, _line_at(lines, up, lm1), t)
        tr = jnp.where(h_pos & w_lt, _line_at(lines, up, lp1), t)
        T = jnp.where(h_gt1, _line_at(lines, upup, x_off), t)

        q11, q5 = transform._QUANT11, transform._QUANT5
        hsh = (
            q11[jnp.clip(l - tl, -128, 127) & 0xFF]
            + q11[jnp.clip(tl - t, -128, 127) & 0xFF] * 11
            + q11[jnp.clip(t - tr, -128, 127) & 0xFF] * 121
        )
        if cfg.large_model:
            hsh = hsh + (
                q5[jnp.clip(L - l, -128, 127) & 0xFF] * 605
                + q5[jnp.clip(T - t, -128, 127) & 0xFF] * 3025
            )
        predict = jnp.clip(l + t - tl, jnp.minimum(l, t), jnp.maximum(l, t))
        neg = hsh < 0
        base = jnp.where(neg, -hsh, hsh) * cfg.substates

        # -- fixed-bound symbol state machine over binary decisions -------
        def bin_step(_, st8):
            states, low, rng, pos, phase, value, e, ectx, mrem, mctx = st8
            active = phase != _DONE
            ctx = jnp.where(phase == _ZF, 0, 0)
            ctx = jnp.where(phase == _EXP, jnp.minimum(ectx, cfg.e_lim), ctx)
            ctx = jnp.where(phase == _MANT, jnp.minimum(mctx, cfg.r_lim), ctx)
            ctx = jnp.where(phase == _SIGN, cfg.sign_ctx, ctx)
            idx = lane_base + jnp.where(active, base + ctx, NS)

            st = jnp.minimum(states[idx].astype(jnp.int32), 127)
            prob = transform.STATE_PROB[st]
            range1 = (rng * prob) >> 8
            rng0 = rng - range1
            bit = (low >= rng0) & active
            low2 = jnp.where(bit, low - rng0, low)
            rng2 = jnp.where(active, jnp.where(bit, range1, rng0), rng)
            refill = active & (rng2 < 0x100)
            byte = read_byte(pos)
            low3 = jnp.where(refill, ((low2 << 8) | byte) & 0xFFFFFF, low2)
            rng3 = jnp.where(refill, rng2 << 8, rng2)
            pos2 = jnp.where(refill, pos + 1, pos)

            nst = transform.NEXT_STATE[st * 2 + bit.astype(jnp.int32)]
            states = states.at[idx].set(nst.astype(jnp.uint8))

            b = bit.astype(jnp.int32)
            # phase transitions
            is_zf = phase == _ZF
            is_exp = phase == _EXP
            is_mant = phase == _MANT
            is_sign = phase == _SIGN

            value = jnp.where(is_zf & ~bit, 1, value)
            value = jnp.where(is_zf & bit, 0, value)
            value = jnp.where(is_mant, 2 * value + b, value)
            value = jnp.where(is_sign & bit, -value, value)

            e2 = jnp.where(is_exp & bit, e + 1, e)
            ectx2 = jnp.where(is_exp & bit, ectx + 1, ectx)
            mrem2 = jnp.where(is_exp & ~bit, e2, jnp.where(is_mant, mrem - 1, mrem))
            mctx2 = jnp.where(is_mant, mctx + 1, mctx)

            phase2 = phase
            phase2 = jnp.where(is_zf, jnp.where(bit, _DONE, _EXP), phase2)
            phase2 = jnp.where(
                is_exp & ~bit, jnp.where(e2 > 0, _MANT, _SIGN), phase2
            )
            phase2 = jnp.where(is_mant & (mrem == 1), _SIGN, phase2)
            phase2 = jnp.where(is_sign, _DONE, phase2)
            return (states, low3, rng3, pos2, phase2, value, e2, ectx2, mrem2, mctx2)

        init = (
            states, low, rng, pos,
            jnp.full((S,), _ZF, jnp.int32), jnp.zeros((S,), jnp.int32),
            jnp.zeros((S,), jnp.int32), jnp.ones((S,), jnp.int32),
            jnp.zeros((S,), jnp.int32), jnp.full((S,), cfg.e_lim + 1, jnp.int32),
        )
        (states, low, rng, pos, phase, value, *_rest) = jax.lax.fori_loop(
            0, cfg.max_bins_per_symbol, bin_step, init
        )
        err = err | (phase != _DONE)
        diff = jnp.where(neg, -value, value)
        recon = predict + diff

        lines = jax.lax.dynamic_update_slice(
            lines, recon.reshape(S, 1, 1), (0, cur, x_off)
        )
        return (states, lines, low, rng, pos, err), recon

    carry0 = (
        jnp.zeros((S * (NS + 1),), jnp.uint8),
        jnp.zeros((S, 3, stride), jnp.int32),
        low0,
        jnp.full((S,), 0xFF00, jnp.int32),
        jnp.full((S,), 2, jnp.int32),
        jnp.zeros((S,), bool),
    )
    (_, _, _, _, _, err), recon_t = jax.lax.scan(
        sym_step, carry0, (x_off_t, cur_t, up_t, upup_t, flags_t)
    )
    planes = recon_t.T.reshape(S, H, W, C)
    return planes, err


_decode_scan = jax.jit(_decode_impl, static_argnames=("H", "W", "C", "cfg"))


def _bucket_cap(n: int, quantum: int = 4096) -> int:
    return max(quantum, -(-(n + 64) // quantum) * quantum)


def decode_lanes(
    streams: list[bytes], shape: tuple[int, int, int], cfg: CodecConfig = REV2
) -> np.ndarray:
    """Decode equal-geometry headerless streams -> images [S, H, W, C] u8."""
    H, W, C = shape
    S = len(streams)
    cap = _bucket_cap(max((len(s) for s in streams), default=0))
    data = np.zeros((S, cap), dtype=np.uint8)
    for s, blob in enumerate(streams):
        data[s, : len(blob)] = np.frombuffer(blob, dtype=np.uint8)
    planes, err = _decode_scan(jnp.asarray(data), H, W, C, cfg)
    if bool(np.asarray(err).any()):
        bad = np.nonzero(np.asarray(err))[0].tolist()
        raise ValueError(f"corrupt stream: symbol overran 24 decisions in lanes {bad}")
    return np.asarray(transform.rct_inverse(planes))
