"""Batched lane-parallel decoder (JAX).

Decoding is the serial heart of the format: every context hash depends on
just-reconstructed neighbor samples, and the number of coded decisions per
symbol is data-dependent (unknown until the unary exponent prefix
terminates).  Two engines, both bit-exact:

* **decision-outer** (default, ``_decode_impl``): one `lax.while_loop`
  iteration codes exactly one binary decision *per lane*, with each lane
  running its own little symbol state machine (zero-flag → unary exponent →
  mantissa → sign) and its own raster position.  Symbol-boundary work
  (neighbor fetch → context hash → prediction, then writeback of the
  reconstructed sample) piggybacks on the first/next decision's step.  Lanes
  drain at their natural pace and idle when finished; the loop ends when all
  lanes are done, so total iterations = max-over-lanes decision count
  (≈ 4.7/symbol on photo-like data) instead of the 24/symbol worst case.

* **symbol-lockstep** (``_decode_impl_lockstep``): one `lax.scan` step per
  symbol position shared by all lanes, with a fixed 24-iteration inner loop
  (the provable per-symbol bound, SURVEY §2.4).  Simpler control flow; kept
  as a second implementation for cross-checking and as the fallback.

Both use flat 1-D gathers/scatters with absolute offsets exclusively — 2-D
batched gathers take minutes to compile on the target backend
(docs/DESIGN.md).  The inverse color transform commutes with reconstruction
and is applied vectorized at the end (the reference interleaves it per pixel,
`llcomp.hpp:532-540`).

Reference semantics: decode loop at `llcomp.hpp:486-545`; getSymbol mirror at
`llcomp.hpp:219-247`, including the exponent-over-31 corruption guard.
"""
from __future__ import annotations

import functools

import numpy as np

import jax

from . import _env  # noqa: F401  (axon env repair: persistent cache)
import jax.numpy as jnp

from . import profiling
from .core import tables, transform
from .core.config import REV2, CodecConfig

# Symbol state-machine phases.
_ZF, _EXP, _MANT, _SIGN, _DONE = 0, 1, 2, 3, 4


def _init_states(S: int, cfg: CodecConfig, primed: bool, pad: int,
                 rstmap=None):
    """Per-lane model init: zeros (reference semantics), the sliced-mode
    hash-bucketed prior (tables.PRIOR_TAB, container flag bit 0), or a
    stored-seed reset map (flag bit 1, traced [num_states] u8); ``pad``
    trash slots per lane stay zero either way."""
    if rstmap is not None:
        row = jnp.concatenate(
            [jnp.asarray(rstmap, jnp.uint8), jnp.zeros((pad,), jnp.uint8)]
        )
        return jnp.tile(row, S)
    if not primed:
        return jnp.zeros((S * (cfg.num_states + pad),), jnp.uint8)
    row = np.concatenate([
        tables.prior_full(cfg.num_states, cfg.substates),
        np.zeros((pad,), np.uint8),
    ])
    return jnp.asarray(np.tile(row, S))


def _onehot_lut(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Serialization-free small-table lookup: one-hot * table, summed.

    Per-element gathers serialize on this backend (~0.1 us/element); for
    128/256-entry tables an [*, N] one-hot contraction is pure vector work.
    """
    n = table.shape[0]
    oh = (idx[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, idx.shape + (n,), idx.ndim)).astype(jnp.int32)
    return jnp.sum(oh * table, axis=-1)




def _quant_flat(table, x):
    return table[jnp.clip(x, -128, 127) & 0xFF]


# ===========================================================================
# Decision-outer engine
# ===========================================================================


def _decode_impl(data: jnp.ndarray, H: int, W: int, C: int,
                 cfg: CodecConfig = REV2, primed: bool = False,
                 rstmap=None):
    """data [S, cap] u8 (zero-padded) -> (planes [S, H, W, C] i32, err [S] bool)."""
    S, cap = data.shape
    NS = cfg.num_states
    stride = W * C
    n_sym = H * W * C
    d32 = data.astype(jnp.int32)
    dflat = d32.reshape(-1)
    data_base = jnp.arange(S) * cap
    model_base = jnp.arange(S) * (NS + 1)
    out_base = jnp.arange(S) * n_sym
    q11 = transform._QUANT11
    q5 = transform._QUANT5

    zero_i = jnp.zeros((S,), jnp.int32)

    def read_byte(pos):
        b = dflat[data_base + jnp.minimum(pos, cap - 1)]
        return jnp.where(pos < cap, b, 0)  # zero past end, like the reference

    def step(st):
        (states, out, low, rng, pos, k, i, w, h, phase, value, e,
         ectx, mrem, mctx, hsh_c, predict_c, neg_c, pending, recon_p, err,
         it) = st

        fin = k >= n_sym
        # ---- (a) writeback of a symbol completed last iteration ----------
        wb = pending & ~fin
        out = out.at[jnp.where(wb, out_base + k, S * n_sym)].set(
            recon_p, mode="drop"
        )
        # advance raster position for lanes that wrote back
        i2 = jnp.where(wb, i + 1, i)
        roll_i = wb & (i2 >= C)
        i2 = jnp.where(roll_i, 0, i2)
        w2 = jnp.where(roll_i, w + 1, w)
        roll_w = roll_i & (w2 >= W)
        w2 = jnp.where(roll_w, 0, w2)
        h2 = jnp.where(roll_w, h + 1, h)
        k2 = jnp.where(wb, k + 1, k)
        fin = k2 >= n_sym
        active = ~fin

        # ---- (b) context for lanes starting a new symbol -----------------
        # neighbors come straight from the output plane at fixed symbol-order
        # offsets from k (no separate line ring: one fewer per-lane scatter
        # each iteration)
        start = (pending | (it == 0)) & active
        w_pos = w2 > 0
        h_pos = h2 > 0

        def out_at(delta):
            return out[out_base + jnp.clip(k2 - delta, 0, n_sym - 1)]

        l = jnp.where(
            w_pos, out_at(C), jnp.where(h_pos, out_at(stride), 128)
        )
        t = jnp.where(h_pos, out_at(stride), l)
        L = jnp.where(w2 > 1, out_at(2 * C), l)
        tl = jnp.where(h_pos & w_pos, out_at(stride + C), t)
        tr = jnp.where(h_pos & (w2 < W - 1), out_at(stride - C), t)
        T = jnp.where(h2 > 1, out_at(2 * stride), t)

        hsh = (
            _quant_flat(q11, l - tl)
            + _quant_flat(q11, tl - t) * 11
            + _quant_flat(q11, t - tr) * 121
        )
        if cfg.large_model:
            hsh = hsh + _quant_flat(q5, L - l) * 605 + _quant_flat(q5, T - t) * 3025
        pred = jnp.clip(l + t - tl, jnp.minimum(l, t), jnp.maximum(l, t))
        neg = hsh < 0
        hsh = jnp.where(neg, -hsh, hsh)

        hsh_c2 = jnp.where(start, hsh * cfg.substates, hsh_c)
        predict_c2 = jnp.where(start, pred, predict_c)
        neg_c2 = jnp.where(start, neg, neg_c)
        phase = jnp.where(start, _ZF, phase)
        value = jnp.where(start, 0, value)
        e = jnp.where(start, 0, e)
        ectx = jnp.where(start, 1, ectx)
        mrem = jnp.where(start, 0, mrem)
        mctx = jnp.where(start, cfg.e_lim + 1, mctx)

        # ---- (c) one binary decision per active lane ---------------------
        ctx = jnp.where(phase == _EXP, jnp.minimum(ectx, cfg.e_lim), 0)
        ctx = jnp.where(phase == _MANT, jnp.minimum(mctx, cfg.r_lim), ctx)
        ctx = jnp.where(phase == _SIGN, cfg.sign_ctx, ctx)
        idx = model_base + jnp.where(active, hsh_c2 + ctx, NS)

        st8 = jnp.minimum(states[idx].astype(jnp.int32), 127)
        prob = _onehot_lut(transform.STATE_PROB, st8)
        range1 = (rng * prob) >> 8
        rng0 = rng - range1
        bit = (low >= rng0) & active
        low2 = jnp.where(bit, low - rng0, low)
        rng2 = jnp.where(active, jnp.where(bit, range1, rng0), rng)
        refill = active & (rng2 < 0x100)
        byte = read_byte(pos)
        low3 = jnp.where(refill, (low2 << 8) | byte, low2)
        rng3 = jnp.where(refill, rng2 << 8, rng2)
        pos2 = jnp.where(refill, pos + 1, pos)

        nst = _onehot_lut(transform.NEXT_STATE, st8 * 2 + bit.astype(jnp.int32))
        states = states.at[idx].set(nst.astype(jnp.uint8))

        b = bit.astype(jnp.int32)
        is_zf = (phase == _ZF) & active
        is_exp = (phase == _EXP) & active
        is_mant = (phase == _MANT) & active
        is_sign = (phase == _SIGN) & active

        value = jnp.where(is_zf, jnp.where(bit, 0, 1), value)
        value = jnp.where(is_mant, 2 * value + b, value)
        value = jnp.where(is_sign & bit, -value, value)

        e2 = jnp.where(is_exp & bit, e + 1, e)
        err = err | (e2 > 31)  # reference guard (`llcomp.hpp:232-234`)
        ectx2 = jnp.where(is_exp & bit, ectx + 1, ectx)
        mrem2 = jnp.where(is_exp & ~bit, e2, jnp.where(is_mant, mrem - 1, mrem))
        mctx2 = jnp.where(is_mant, mctx + 1, mctx)

        phase2 = phase
        phase2 = jnp.where(is_zf, jnp.where(bit, _DONE, _EXP), phase2)
        phase2 = jnp.where(is_exp & ~bit, jnp.where(e2 > 0, _MANT, _SIGN), phase2)
        phase2 = jnp.where(is_mant & (mrem == 1), _SIGN, phase2)
        phase2 = jnp.where(is_sign, _DONE, phase2)

        done_now = active & (phase2 == _DONE)
        diff = jnp.where(neg_c2, -value, value)
        recon_p2 = jnp.where(done_now, predict_c2 + diff, recon_p)

        return (states, out, low3, rng3, pos2, k2, i2, w2, h2,
                phase2, value, e2, ectx2, mrem2, mctx2, hsh_c2, predict_c2,
                neg_c2, done_now, recon_p2, err, it + 1)

    def cond(st):
        k, pending, err, it = st[5], st[18], st[20], st[21]
        unfinished = (k < n_sym) | pending
        # safety bound: a valid stream never exceeds 24 decisions/symbol
        return jnp.any(unfinished) & (it < n_sym * cfg.max_bins_per_symbol + 2)

    low0 = (d32[:, 0] << 8) | d32[:, 1]
    init = (
        _init_states(S, cfg, primed, 1, rstmap),      # states
        jnp.zeros((S * n_sym,), jnp.int32),           # out
        low0,                                         # low
        jnp.full((S,), 0xFF00, jnp.int32),            # range
        jnp.full((S,), 2, jnp.int32),                 # pos
        zero_i, zero_i, zero_i, zero_i,               # k, i, w, h
        jnp.full((S,), _DONE, jnp.int32),             # phase
        zero_i, zero_i, jnp.ones((S,), jnp.int32),    # value, e, ectx
        zero_i, jnp.full((S,), cfg.e_lim + 1, jnp.int32),  # mrem, mctx
        zero_i, zero_i, jnp.zeros((S,), bool),        # hash, predict, neg
        jnp.zeros((S,), bool),                        # pending writeback
        zero_i,                                       # recon pending
        jnp.zeros((S,), bool),                        # err
        jnp.zeros((), jnp.int32),                     # iteration counter
    )
    final = jax.lax.while_loop(cond, step, init)
    out, err = final[1], final[20]
    # a lane that hit the iteration bound without finishing is corrupt
    err = err | (final[5] < n_sym)
    planes = out.reshape(S, H, W, C)
    return planes, err


# ===========================================================================
# Row-batched symbol-lockstep engine
# ===========================================================================

def _decode_impl_rowbatch(
    data: jnp.ndarray, H: int, W: int, C: int, cfg: CodecConfig = REV2,
    primed: bool = False, rstmap=None,
):
    """Symbol-synchronous decode with per-symbol row batching.

    All lanes decode the same symbol position each scan step, so the only
    serialized (per-lane-indexed) operations are three slice transfers per
    symbol: gather the hash's 8-substate model row, prefetch a 24-byte input
    window (a symbol consumes at most 24 bytes), and scatter the updated row
    back.  The 24 decisions unroll into the step body as pure vector ops
    (sub-state select/update via 8-wide one-hots; probability and transition
    lookups via 128/256-entry one-hot contractions; byte fetch via 24-wide
    one-hot over the window).  ~5x fewer serialized elements per pixel than
    the decision-outer engine.
    """
    S, cap = data.shape
    NS = cfg.num_states
    stride = W * C
    d32 = data.astype(jnp.int32)
    dflat = d32.reshape(-1)
    data_base = jnp.arange(S) * cap
    lane_base = jnp.arange(S) * (NS + 8)

    prob_tab = transform.STATE_PROB
    next_tab = transform.NEXT_STATE

    x_off_t, cur_t, up_t, upup_t, flags_t = _schedule(H, W, C)
    low0 = (d32[:, 0] << 8) | d32[:, 1]

    gather8_dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def sym_step(carry, xs):
        states, lines, low, rng, pos, err = carry
        x_off, cur, up, upup, flags = xs
        w_pos = (flags & 1) != 0
        h_pos = (flags & 2) != 0
        w_gt1 = (flags & 4) != 0
        w_lt = (flags & 8) != 0
        h_gt1 = (flags & 16) != 0

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
            _quant_flat(q11, l - tl)
            + _quant_flat(q11, tl - t) * 11
            + _quant_flat(q11, t - tr) * 121
        )
        if cfg.large_model:
            hsh = hsh + _quant_flat(q5, L - l) * 605 + _quant_flat(q5, T - t) * 3025
        predict = jnp.clip(l + t - tl, jnp.minimum(l, t), jnp.maximum(l, t))
        neg = hsh < 0
        base = jnp.where(neg, -hsh, hsh) * cfg.substates

        # --- per-symbol slice transfers (the only serialized ops) --------
        row_start = (lane_base + base)[:, None]
        rows = jax.lax.gather(
            states, row_start, gather8_dn, (8,), mode="clip"
        ).astype(jnp.int32)                                   # [S, 8]
        pos0 = jnp.minimum(pos, cap - 24)
        wind = jax.lax.gather(
            dflat, (data_base + pos0)[:, None], gather8_dn, (24,), mode="clip"
        )                                                     # [S, 24]

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 8), 1)
        w_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 24), 1)

        phase = jnp.full((S,), _ZF, jnp.int32)
        value = jnp.zeros((S,), jnp.int32)
        e = jnp.zeros((S,), jnp.int32)
        ectx = jnp.ones((S,), jnp.int32)
        mrem = jnp.zeros((S,), jnp.int32)
        mctx = jnp.full((S,), cfg.e_lim + 1, jnp.int32)

        for _ in range(cfg.max_bins_per_symbol):            # unrolled
            active = phase != _DONE
            ctx = jnp.where(phase == _EXP, jnp.minimum(ectx, cfg.e_lim), 0)
            ctx = jnp.where(phase == _MANT, jnp.minimum(mctx, cfg.r_lim), ctx)
            ctx = jnp.where(phase == _SIGN, cfg.sign_ctx, ctx)

            oh = (sub_iota == ctx[:, None]).astype(jnp.int32)
            st = jnp.sum(rows * oh, axis=1)
            prob = _onehot_lut(prob_tab, st)
            range1 = (rng * prob) >> 8
            rng0 = rng - range1
            bit = (low >= rng0) & active
            low = jnp.where(bit, low - rng0, low)
            rng = jnp.where(active, jnp.where(bit, range1, rng0), rng)
            refill = active & (rng < 0x100)
            widx = pos - pos0
            byte = jnp.sum(jnp.where(w_iota == widx[:, None], wind, 0), axis=1)
            byte = jnp.where(widx < 24, byte, 0)
            low = jnp.where(refill, (low << 8) | byte, low)
            rng = jnp.where(refill, rng << 8, rng)
            pos = jnp.where(refill, pos + 1, pos)

            nst = _onehot_lut(next_tab, st * 2 + bit.astype(jnp.int32))
            rows = jnp.where((oh == 1) & active[:, None], nst[:, None], rows)

            b = bit.astype(jnp.int32)
            is_zf = phase == _ZF
            is_exp = phase == _EXP
            is_mant = phase == _MANT
            is_sign = phase == _SIGN
            value = jnp.where(is_zf & ~bit, 1, value)
            value = jnp.where(is_zf & bit, 0, value)
            value = jnp.where(is_mant, 2 * value + b, value)
            value = jnp.where(is_sign & bit, -value, value)
            e2 = jnp.where(is_exp & bit, e + 1, e)
            ectx = jnp.where(is_exp & bit, ectx + 1, ectx)
            mrem2 = jnp.where(is_exp & ~bit, e2,
                              jnp.where(is_mant, mrem - 1, mrem))
            mctx = jnp.where(is_mant, mctx + 1, mctx)
            phase2 = phase
            phase2 = jnp.where(is_zf, jnp.where(bit, _DONE, _EXP), phase2)
            phase2 = jnp.where(is_exp & ~bit, jnp.where(e2 > 0, _MANT, _SIGN), phase2)
            phase2 = jnp.where(is_mant & (mrem == 1), _SIGN, phase2)
            phase2 = jnp.where(is_sign, _DONE, phase2)
            phase = phase2
            mrem = mrem2
            e = e2

        err = err | (phase != _DONE)

        scatter_dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,),
        )
        states = jax.lax.scatter(
            states, row_start, rows.astype(jnp.uint8), scatter_dn,
            indices_are_sorted=False, unique_indices=True, mode="clip",
        )

        diff = jnp.where(neg, -value, value)
        recon = predict + diff
        lines = jax.lax.dynamic_update_slice(
            lines, recon.reshape(S, 1, 1), (0, cur, x_off)
        )
        return (states, lines, low, rng, pos, err), recon

    carry0 = (
        _init_states(S, cfg, primed, 8, rstmap),
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


# ===========================================================================
# Symbol-lockstep engine (cross-check / fallback)
# ===========================================================================


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


def _decode_impl_lockstep(
    data: jnp.ndarray, H: int, W: int, C: int, cfg: CodecConfig = REV2,
    primed: bool = False, rstmap=None,
):
    """data [S, cap] u8 (zero-padded) -> (planes [S, H, W, C] i32, err [S] bool)."""
    S, cap = data.shape
    NS = cfg.num_states
    stride = W * C
    d32 = data.astype(jnp.int32)
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
            _quant_flat(q11, l - tl)
            + _quant_flat(q11, tl - t) * 11
            + _quant_flat(q11, t - tr) * 121
        )
        if cfg.large_model:
            hsh = hsh + _quant_flat(q5, L - l) * 605 + _quant_flat(q5, T - t) * 3025
        predict = jnp.clip(l + t - tl, jnp.minimum(l, t), jnp.maximum(l, t))
        neg = hsh < 0
        base = jnp.where(neg, -hsh, hsh) * cfg.substates

        # -- fixed-bound symbol state machine over binary decisions -------
        def bin_step(_, st8):
            states, low, rng, pos, phase, value, e, ectx, mrem, mctx = st8
            active = phase != _DONE
            ctx = jnp.where(phase == _EXP, jnp.minimum(ectx, cfg.e_lim), 0)
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
            low3 = jnp.where(refill, (low2 << 8) | byte, low2)
            rng3 = jnp.where(refill, rng2 << 8, rng2)
            pos2 = jnp.where(refill, pos + 1, pos)

            nst = transform.NEXT_STATE[st * 2 + bit.astype(jnp.int32)]
            states = states.at[idx].set(nst.astype(jnp.uint8))

            b = bit.astype(jnp.int32)
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
        _init_states(S, cfg, primed, 1, rstmap),
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


_decode_scan = jax.jit(
    _decode_impl, static_argnames=("H", "W", "C", "cfg", "primed")
)
_decode_scan_lockstep = jax.jit(
    _decode_impl_lockstep, static_argnames=("H", "W", "C", "cfg", "primed")
)
_decode_scan_rowbatch = jax.jit(
    _decode_impl_rowbatch, static_argnames=("H", "W", "C", "cfg", "primed")
)


def _bucket_cap(n: int, quantum: int = 4096) -> int:
    return max(quantum, -(-(n + 64) // quantum) * quantum)


def _decode_lanes_pallas(
    streams: list[bytes], shape: tuple[int, int, int], cfg: CodecConfig,
    primed: bool = False, seed=None,
) -> tuple[np.ndarray, np.ndarray]:
    from .pallas import decode_kernel as dk

    H, W, C = shape
    S = len(streams)
    G = -(-S // dk.LANES)
    cap = _bucket_cap(max((len(s) for s in streams), default=0))
    # equal-shaped superblocks (zero-pad the tail) so every pallas call
    # shares ONE compiled kernel variant — a ragged tail block used to
    # compile a second variant inside the timed region
    step = dk._pick_nsub(G, cap, W * C)
    n_sb = -(-G // step)
    blocks = []
    for b in range(n_sb):
        blk = np.zeros((step, cap, dk.LANES), dtype=np.uint8)
        for s in range(b * step * dk.LANES,
                       min((b + 1) * step * dk.LANES, S)):
            blob = streams[s]
            g, l = divmod(s - b * step * dk.LANES, dk.LANES)
            blk[g, : len(blob), l] = np.frombuffer(blob, dtype=np.uint8)
        blocks.append(blk)
    # ship every superblock to the device FIRST (transfers run async and
    # overlap the kernel dispatches below), then one pallas call per
    # superblock of <= 8 groups (the kernel packs the groups into vreg
    # sublanes — see decode_kernel._pick_nsub).  Each superblock's image
    # download starts right after ITS dispatch: device->host transfers
    # are pull-based on this backend, and an early ask lets superblock
    # b's pixels stream back while b+1..n still compute.
    ups = [profiling.timed("decode/upload", jax.device_put, blk)
           for blk in blocks]
    inflight = []
    for u in ups:
        imgs, err = profiling.timed(
            "decode/pallas_kernel", dk.decode_groups_images,
            u, H, W, C, cfg, primed, False, seed
        )
        imgs.copy_to_host_async()
        err.copy_to_host_async()
        inflight.append((imgs, err))
    parts, lane_err = [], []
    for imgs, err in inflight:
        parts.append(profiling.timed("decode/download", np.asarray, imgs))
        lane_err.append(np.asarray(err))
    lane_err = np.concatenate(lane_err)[:S]
    return np.concatenate(parts)[:S], lane_err


def decode_lanes(
    streams: list[bytes], shape: tuple[int, int, int], cfg: CodecConfig = REV2,
    engine: str = "auto", primed: bool = False, errors: str = "raise",
    seed=None,
) -> np.ndarray:
    """Decode equal-geometry headerless streams -> images [S, H, W, C] u8.

    engine: 'pallas' (fused VMEM-resident kernel, default on TPU; bit-exact
    on hardware since round 2 — see pallas/decode_kernel.py), 'decision'
    (while_loop, per-lane pacing; the XLA default), 'lockstep' (fixed
    24-step inner loop), 'rowbatch', or 'auto'.
    primed: start context row h at the hash-bucketed prior
    tables.PRIOR_TAB[h % 121] instead of zeros (sliced containers with
    flag bit 0; see tools/derive_prior.py).
    seed: optional [121, 8] u8 stored-seed bucket table (flag bit 1)
    replacing the static prior values; one table per call.
    errors: 'raise' (default) raises ValueError if any lane's stream is
    corrupt; 'report' instead returns ``(images, bad_lanes)`` where
    ``bad_lanes`` lists the flagged lane indices and every *good* lane's
    pixels are intact — one corrupt stripe costs one stripe, not the batch
    (the container's per-slice independence exists for exactly this;
    repair via api.reencode_slice).
    """
    H, W, C = shape
    S = len(streams)
    if errors not in ("raise", "report"):
        raise ValueError(f"errors must be 'raise' or 'report', got {errors!r}")
    if engine == "auto":
        # measured on the axon v5e backend: the fused Pallas kernel decodes
        # ~6x faster than the XLA decision-outer engine (docs/DESIGN.md);
        # fall back to decision-outer off-TPU or for geometries the blocked
        # kernel cannot take (it requires W*C % 8 == 0, C <= 8)
        if jax.default_backend() == "tpu":
            engine = "pallas"
        else:
            engine = "decision"
    if engine == "pallas" and streams:
        # ultra-wide stripes whose line ring exceeds the measured VMEM
        # budget cannot take the fused kernel even one group at a time;
        # downgrade like encode_lanes does for over-budget stripes
        from .pallas import decode_kernel as dk

        if not dk.fits_pallas_decode(_bucket_cap(max(len(s) for s in streams)),
                                     W * C):
            engine = "decision"
    if engine == "pallas":
        out, lane_err = _decode_lanes_pallas(streams, shape, cfg, primed,
                                             seed)
        bad = np.nonzero(lane_err)[0].tolist()
    else:
        # per-lane serialized gathers scale with lane count while while_loop
        # iterations don't, and a smaller chunk also shortens the
        # max-over-lanes straggler tail, so modest chunks win (measured best
        # ~256 lanes on the target backend); all chunks are dispatched
        # before any is synced so the device queue stays full
        import os
        MAX_LANES = int(os.environ.get("LLCT_DECODE_MAX_LANES", "256"))
        fn = {
            "decision": _decode_scan,
            "lockstep": _decode_scan_lockstep,
            "rowbatch": _decode_scan_rowbatch,
        }[engine]
        rstmap = (jnp.asarray(tables.prior_full_from(
            seed, cfg.num_states, cfg.substates))
            if seed is not None else None)
        inflight = []
        for i in range(0, S, MAX_LANES):
            chunk = streams[i : i + MAX_LANES]
            cap = _bucket_cap(max((len(s) for s in chunk), default=0))
            data = np.zeros((len(chunk), cap), dtype=np.uint8)
            for s, blob in enumerate(chunk):
                data[s, : len(blob)] = np.frombuffer(blob, dtype=np.uint8)
            planes, err = fn(jnp.asarray(data), H, W, C, cfg, primed,
                             rstmap)
            inflight.append((i, transform.rct_inverse(planes), err))
        parts, bad = [], []
        for i, imgs, err in inflight:
            bad.extend((np.nonzero(np.asarray(err))[0] + i).tolist())
            parts.append(np.asarray(imgs))
        out = np.concatenate(parts)
    if errors == "report":
        return out, bad
    if bad:
        raise ValueError(f"corrupt stream in lanes {bad}")
    return out
