"""Fused Pallas TPU kernels for the encode hot scans.

Two sequential scans dominate model-free encode (see ``encode.py``): the
context-run **state walk** (probability pre-pass, sorted order) and the
**range-coder scan** (stream order).  Both are pure element-wise recurrences
over [8, 128]-shaped lane blocks — exactly what the VPU does at one vector op
per cycle — but as XLA scans they pay a measured ~26 us *per iteration* of
loop overhead.  Fused here, one iteration costs ~12-40 ns (measured): the
whole decision stream stays in VMEM tiles, carries live in VMEM scratch
across grid steps, and the only HBM traffic is streaming the decision/slot
arrays once.

Layout: lanes are grouped 1024 per kernel block, shaped [8, 128] (sublanes x
lanes, the native u8/int32 vreg tile).  Arrays are [G, T, 8, 128] with the
grid iterating (group, T-chunk); carries persist in scratch across T-chunks
of the same group and reset when a new group starts.

Table lookups use Mosaic's ``dynamic_gather`` in its supported form: the
128-entry table is broadcast to an [8, 128] block and gathered along lanes
with same-shape indices.  The 256-entry fused transition table is split into
its even/odd halves (next-state-on-0 / next-state-on-1) so each lookup stays
within 128 lanes.

Reference semantics mirrored here: range-coder put/renorm `llcomp.hpp:60-73`,
lazy carry resolution `llcomp.hpp:38-58`, adaptive state update
`llcomp.hpp:283-293`.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import tables

LANES = 128
SUBS = 8
GROUP = SUBS * LANES          # 1024 lanes per kernel block
TCHUNK = 512                  # decision steps per grid chunk

# 128-entry tables broadcast to the native block shape for dynamic_gather.
_PROB_B = np.broadcast_to(tables.STATE_PROB.astype(np.int32), (SUBS, LANES))
_NS0_B = np.broadcast_to(tables.NEXT_STATE[0::2].astype(np.int32), (SUBS, LANES))
_NS1_B = np.broadcast_to(tables.NEXT_STATE[1::2].astype(np.int32), (SUBS, LANES))
# hash-bucketed sliced-mode prior rows, packed 4 substates per i32 and
# padded 121 -> 128 buckets (tables.PRIOR_TAB; container flag bit 0)
_PRIOR_LO_B = np.broadcast_to(tables.PRIOR_LO121, (SUBS, LANES))
_PRIOR_HI_B = np.broadcast_to(tables.PRIOR_HI121, (SUBS, LANES))


def _lut(table_block, idx):
    """Per-element 128-entry table lookup: gather along lanes, same shapes."""
    return jnp.take_along_axis(table_block, idx, axis=1)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Stream-builder kernel: (hash, residual) per symbol -> 24-slot decisions
# ---------------------------------------------------------------------------


SCHUNK = 32               # symbols per builder grid step (24*64 | 3*TCHUNK)


def _make_build_kernel(n_sym: int, K: int):
    def kernel(hash_ref, diff_ref, out_ref):
        """Per decision slot t in a 32-symbol chunk: symbol t//24, slot t%24.

        Emits cidx*2 + bit for a live decision, -1 for padding — the Pallas
        replacement for the XLA binarize+pack stage (~300M slots at ~20
        vector ops each).  Slot layout per symbol (SURVEY §2.4): zero flag,
        unary exponent (ctx min(k,4)), stop, mantissa MSB-first (ctx 5,6..),
        sign (ctx 7).
        """
        c = pl.program_id(1)

        def step(t, _):
            sym_l = t // K
            k = t % K
            live_sym = c * SCHUNK + sym_l < n_sym
            h = hash_ref[0, sym_l]                # (8,128) folded hash
            d = diff_ref[0, sym_l]                # (8,128) folded residual
            ad = jnp.abs(d)
            e = jnp.zeros_like(ad)
            for j in range(1, 12):
                e = e + ((ad >> j) > 0).astype(jnp.int32)
            nz = ad != 0

            in_exp = (k >= 1) & (k <= e)
            is_stop = k == e + 1
            in_mant = (k >= e + 2) & (k <= 2 * e + 1)
            is_sign = k == 2 * e + 2

            ctx = jnp.where(in_exp, jnp.minimum(k, 4), 0)
            ctx = jnp.where(is_stop, jnp.minimum(e + 1, 4), ctx)
            ctx = jnp.where(in_mant, jnp.minimum(5 + (k - e - 2), 6), ctx)
            ctx = jnp.where(is_sign, 7, ctx)

            bit = jnp.where(in_exp, 1, 0)
            mant_i = jnp.clip(2 * e + 1 - k, 0, 30)
            bit = jnp.where(in_mant, (ad >> mant_i) & 1, bit)
            bit = jnp.where(is_sign, (d < 0).astype(jnp.int32), bit)
            is_zf = k == 0
            bit = jnp.where(is_zf & ~nz, 1, jnp.where(is_zf, 0, bit))
            valid = (is_zf | (nz & (in_exp | is_stop | in_mant | is_sign))
                     ) & live_sym

            packed = (h * 8 + ctx) * 2 + bit
            out_ref[0, t] = jnp.where(valid, packed, -1)
            return 0

        jax.lax.fori_loop(0, SCHUNK * K, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_sym", "K"))
def build_stream(hash_g: jnp.ndarray, diff_g: jnp.ndarray, n_sym: int,
                 K: int = 24):
    """hash/diff [G, n_sym_pad, 8, 128] (n_sym_pad % SCHUNK*2 == 0) ->
    decisions [G, n_sym_pad*K, 8, 128]; slots past n_sym are -1 padding.

    K in {8, 16, 24}: a per-batch bound on decisions per symbol (2e+3), so
    smooth batches emit 3x fewer padding slots into the big context sort.
    """
    G, n_sym_pad = hash_g.shape[0], hash_g.shape[1]
    assert n_sym_pad % (2 * SCHUNK) == 0, n_sym_pad
    assert K % 8 == 0, K                      # keeps T % TCHUNK == 0
    T = n_sym_pad * K
    return pl.pallas_call(
        _make_build_kernel(n_sym, K),
        grid=(G, n_sym_pad // SCHUNK),
        in_specs=[
            pl.BlockSpec((1, SCHUNK, SUBS, LANES), lambda g, c: (g, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SCHUNK, SUBS, LANES), lambda g, c: (g, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, SCHUNK * K, SUBS, LANES), lambda g, c: (g, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((G, T, SUBS, LANES), jnp.int32),
        interpret=_use_interpret(),
    )(hash_g, diff_g)




# ---------------------------------------------------------------------------
# Symbol-walk kernel: hash-sorted symbols -> back-sort-ready coder slots
# ---------------------------------------------------------------------------
#
# Symbol-granular variant of the probability pre-pass (docs/DESIGN.md): the
# big context sort runs over *symbols* (n_sym elements/lane) instead of
# decision slots (n_sym*K), because all <=24 decisions of a symbol share its
# context hash and their sub-context sequence is recomputable from the
# residual alone.  This kernel walks the sorted symbols with the hash's full
# 8-substate model row packed into two i32 registers per lane (4 sub-states
# x 8 bits each), regenerates each symbol's decisions inline (same slot
# schedule as the stream builder above), and emits packed
# (slotpos << 10 | valid << 9 | bit << 8 | prob) records — i.e. the exact
# operand of the compacting un-permute sort that feeds the range coder.


def _make_symwalk_kernel(K: int, primed: bool = False):
    def kernel(xs_ref, prob_tab, ns0_tab, ns1_tab, plo_tab, phi_tab,
               outlo_ref, outhi_ref, lo_s, hi_s):
        """xs: (bucket << 14 | live << 13 | seg << 12 | diff+1274), sorted
        by (hash, position) along the symbol axis (|diff| <= 1274, SURVEY
        §2.4, so the residual field needs exactly 12 bits).  Emits
        PAIR-packed coder records (rec_{2m+1} << 10 | rec_{2m}, rec =
        valid<<9|bit<<8|prob, invalid slots 0) as TWO quad-major streams —
        outlo holds each quad's first pair (slots 4q,4q+1), outhi its
        second (4q+2,4q+3) — so the compact stage's i64 key assembly reads
        two CONTIGUOUS arrays instead of stride-2 slices (device relayouts
        cost ~1 s/GB on this backend).  Positions never enter the kernel —
        the compacting sort key is assembled outside from the sorted
        symbol positions.  Fresh contexts reset the packed 8-substate row
        to zeros (reference semantics) or, when primed, to the
        hash-bucketed prior row plo/phi[bucket] (tables.PRIOR_LO/HI121,
        container flag bit 0)."""
        tchunk = pl.program_id(1)

        @pl.when(tchunk == 0)
        def _():
            lo_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)
            hi_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)

        ptab = prob_tab[:]
        n0 = ns0_tab[:]
        n1 = ns1_tab[:]
        plo = plo_tab[:]
        phi = phi_tab[:]

        def sym_step(j, carry):
            lo, hi = carry
            x = xs_ref[0, j]
            d = (x & 0xFFF) - 1274
            seg = (x & (1 << 12)) != 0
            live = (x & (1 << 13)) != 0
            # fresh context: reset the whole 8-substate row
            if primed:
                b = (x >> 14) & 0x7F
                rst_lo = _lut(plo, b)
                rst_hi = _lut(phi, b)
            else:
                rst_lo = 0
                rst_hi = 0
            lo = jnp.where(seg, rst_lo, lo)
            hi = jnp.where(seg, rst_hi, hi)

            ad = jnp.abs(d)
            e = jnp.zeros_like(ad)
            for jj in range(1, 12):
                e = e + ((ad >> jj) > 0).astype(jnp.int32)
            nz = ad != 0

            rec_even = None
            for k in range(K):
                in_exp = (k >= 1) & (k <= e)
                is_stop = k == e + 1
                in_mant = (k >= e + 2) & (k <= 2 * e + 1)
                is_sign = k == 2 * e + 2

                ctx = jnp.where(in_exp, jnp.minimum(k, 4), 0)
                ctx = jnp.where(is_stop, jnp.minimum(e + 1, 4), ctx)
                ctx = jnp.where(in_mant, jnp.minimum(5 + (k - e - 2), 6), ctx)
                ctx = jnp.where(is_sign, 7, ctx)

                bit = jnp.where(in_exp, 1, 0)
                mant_i = jnp.clip(2 * e + 1 - k, 0, 30)
                bit = jnp.where(in_mant, (ad >> mant_i) & 1, bit)
                bit = jnp.where(is_sign, (d < 0).astype(jnp.int32), bit)
                is_zf = k == 0
                bit = jnp.where(is_zf & ~nz, 1, jnp.where(is_zf, 0, bit))
                valid = (is_zf | (nz & (in_exp | is_stop | in_mant | is_sign))
                         ) & live

                # extract substate ctx from the packed row, look up, update
                sh = (ctx & 3) * 8
                word = jnp.where(ctx < 4, lo, hi)
                st = (word >> sh) & 0xFF
                prob = _lut(ptab, st)
                ns = jnp.where(bit == 1, _lut(n1, st), _lut(n0, st))
                upd = (word & ~(0xFF << sh)) | (ns << sh)
                lo = jnp.where(valid & (ctx < 4), upd, lo)
                hi = jnp.where(valid & (ctx >= 4), upd, hi)

                rec = jnp.where(
                    valid, (1 << 9) | (bit << 8) | prob, 0
                )
                if k % 2 == 0:
                    rec_even = rec
                elif k % 4 == 1:
                    outlo_ref[0, j * (K // 4) + k // 4] = (
                        rec_even | (rec << 10)
                    )
                else:
                    outhi_ref[0, j * (K // 4) + k // 4] = (
                        rec_even | (rec << 10)
                    )
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, SYMCHUNK, sym_step, (lo_s[:], hi_s[:]))
        lo_s[:] = lo
        hi_s[:] = hi

    return kernel


# symbols per walk grid step; n_pad is always a multiple of 2*SCHUNK=64
# (encode._flat_host pads to lcm(64, 128, C)), so powers of two <= 64 are
# always legal and larger values only when n_pad allows
SYMCHUNK = int(os.environ.get("LLCT_WALK_SYMCHUNK", "32"))


@functools.partial(jax.jit, static_argnames=("K", "primed"))
def walk_symbols(xs: jnp.ndarray, K: int = 24, primed: bool = False,
                 seed=None):
    """Sorted symbols [G, n_sym_pad, 8, 128] -> two quad-major pair-packed
    record streams (lo, hi), each [G, n_sym_pad*K/4, 8, 128] i32 (two
    10-bit records per word), for the compacting back sort
    (encode._stage_compact).

    seed: optional [121, 8] u8 per-image bucket table (stored-seed
    containers, flag bit 1) replacing the static tables.PRIOR_TAB values
    in the reset-row operands; the kernel is unchanged — only the operand
    VALUES differ, so primed and seeded compile once each."""
    if seed is not None:
        t = jnp.asarray(seed, jnp.int32)
        lo = t[:, 0] | t[:, 1] << 8 | t[:, 2] << 16 | t[:, 3] << 24
        hi = t[:, 4] | t[:, 5] << 8 | t[:, 6] << 16 | t[:, 7] << 24
        plo = jnp.broadcast_to(
            jnp.zeros(LANES, jnp.int32).at[:121].set(lo), (SUBS, LANES)
        )
        phi = jnp.broadcast_to(
            jnp.zeros(LANES, jnp.int32).at[:121].set(hi), (SUBS, LANES)
        )
    else:
        plo = jnp.asarray(_PRIOR_LO_B)
        phi = jnp.asarray(_PRIOR_HI_B)
    G, n_pad = xs.shape[0], xs.shape[1]
    assert n_pad % SYMCHUNK == 0, n_pad
    assert K % 4 == 0, K  # quad-packed compact sort granularity
    qshape = jax.ShapeDtypeStruct((G, n_pad * K // 4, SUBS, LANES), jnp.int32)
    qspec = pl.BlockSpec(
        (1, SYMCHUNK * K // 4, SUBS, LANES), lambda g, c: (g, c, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _make_symwalk_kernel(K, primed),
        grid=(G, n_pad // SYMCHUNK),
        in_specs=[
            pl.BlockSpec((1, SYMCHUNK, SUBS, LANES), lambda g, c: (g, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(qspec, qspec),
        out_shape=(qshape, qshape),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), jnp.int32)] * 2,
        interpret=_use_interpret(),
    )(
        xs,
        jnp.asarray(_PROB_B),
        jnp.asarray(_NS0_B),
        jnp.asarray(_NS1_B),
        plo,
        phi,
    )


# ---------------------------------------------------------------------------
# State-walk kernel: probabilities for sorted decision runs
# ---------------------------------------------------------------------------


def _walk_kernel(xs_ref, prob_tab, ns0_tab, ns1_tab, prob_ref, st_scratch):
    """xs: bit | seg_start<<1 per decision (sorted order) -> coding prob."""
    tchunk = pl.program_id(1)

    @pl.when(tchunk == 0)
    def _():
        st_scratch[:] = jnp.zeros((SUBS, LANES), jnp.int32)

    ptab = prob_tab[:]
    n0 = ns0_tab[:]
    n1 = ns1_tab[:]

    def step(t, st):
        x = xs_ref[0, t]
        seg = (x & 2) != 0
        bit = (x & 1) == 1
        st = jnp.where(seg, 0, st)
        prob_ref[0, t] = _lut(ptab, st)
        ns = jnp.where(bit, _lut(n1, st), _lut(n0, st))
        return ns

    st_scratch[:] = jax.lax.fori_loop(0, TCHUNK, step, st_scratch[:])


@functools.partial(jax.jit, static_argnames=())
def walk_probs(xs: jnp.ndarray) -> jnp.ndarray:
    """xs [G, T, 8, 128] int32 (bit | seg<<1, sorted order) -> probs int32."""
    G, T = xs.shape[0], xs.shape[1]
    grid = (G, T // TCHUNK)
    return pl.pallas_call(
        _walk_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBS, LANES), lambda g, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xs.shape, jnp.int32),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), jnp.int32)],
        interpret=_use_interpret(),
    )(
        xs,
        jnp.asarray(_PROB_B),
        jnp.asarray(_NS0_B),
        jnp.asarray(_NS1_B),
    )


# ---------------------------------------------------------------------------
# Range-coder kernel: slot records from (prob, bit, valid) stream
# ---------------------------------------------------------------------------


def _coder_kernel(xs_ref, meta_ref, runs_ref, fin_ref, low_s, rng_s, pend_s, run_s):
    """xs: prob | bit<<8 | valid<<9 (stream order) -> slot records + final carry."""
    tchunk = pl.program_id(1)

    @pl.when(tchunk == 0)
    def _():
        low_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)
        rng_s[:] = jnp.full((SUBS, LANES), 0xFF00, jnp.int32)
        pend_s[:] = jnp.full((SUBS, LANES), -1, jnp.int32)
        run_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)

    def step(t, carry):
        low, rng, pend, run = carry
        x = xs_ref[0, t]
        prob = x & 0xFF
        bit = (x & 0x100) != 0
        valid = (x & 0x200) != 0

        range1 = (rng * prob) >> 8
        low = jnp.where(bit & valid, low + rng - range1, low)
        rng = jnp.where(valid, jnp.where(bit, range1, rng - range1), rng)
        do = valid & (rng < 0x100)

        first = pend < 0
        nocarry = low <= 0xFF00
        cry = low >= 0x10000
        emit = do & ~first & (nocarry | cry)
        defer = do & ~first & ~nocarry & ~cry
        head = jnp.where(cry, (pend + 1) & 0xFF, pend & 0xFF)

        meta_ref[0, t] = (
            emit.astype(jnp.int32)
            | (cry.astype(jnp.int32) << 1)
            | (head << 8)
        )
        runs_ref[0, t] = run

        pend = jnp.where(do & ~defer, (low >> 8) & 0xFF, pend)
        run = jnp.where(emit, 0, jnp.where(defer, run + 1, run))
        low = jnp.where(do, (low & 0xFF) << 8, low)
        rng = jnp.where(do, rng << 8, rng)
        return low, rng, pend, run

    low, rng, pend, run = jax.lax.fori_loop(
        0, TCHUNK, step, (low_s[:], rng_s[:], pend_s[:], run_s[:])
    )
    low_s[:] = low
    rng_s[:] = rng
    pend_s[:] = pend
    run_s[:] = run

    @pl.when(tchunk == pl.num_programs(1) - 1)
    def _():
        fin_ref[0, 0] = low
        fin_ref[0, 1] = rng
        fin_ref[0, 2] = pend
        fin_ref[0, 3] = run


def _coder_kernel_off(xs_ref, kp_ref, fin_ref, low_s, rng_s, pend_s, run_s,
                      off_s):
    """Offset-packed variant: one record per decision, ``off<<9|carry<<8|head``
    for an emitting slot (off = the flushed head byte's position in the
    lane's output stream) or INT32_MAX for a silent one.  Emitting the byte
    offset from the scan carry kills the XLA cumsum over T and the separate
    offset-compaction sort in the expansion (coder.expand_kp_grouped), and
    halves the kernel's HBM writes vs the (meta, runs) pair."""
    tchunk = pl.program_id(1)

    @pl.when(tchunk == 0)
    def _():
        low_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)
        rng_s[:] = jnp.full((SUBS, LANES), 0xFF00, jnp.int32)
        pend_s[:] = jnp.full((SUBS, LANES), -1, jnp.int32)
        run_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)
        off_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)

    def step(t, carry):
        low, rng, pend, run, off = carry
        x = xs_ref[0, t]
        prob = x & 0xFF
        bit = (x & 0x100) != 0
        valid = (x & 0x200) != 0

        range1 = (rng * prob) >> 8
        low = jnp.where(bit & valid, low + rng - range1, low)
        rng = jnp.where(valid, jnp.where(bit, range1, rng - range1), rng)
        do = valid & (rng < 0x100)

        first = pend < 0
        nocarry = low <= 0xFF00
        cry = low >= 0x10000
        emit = do & ~first & (nocarry | cry)
        defer = do & ~first & ~nocarry & ~cry
        head = jnp.where(cry, (pend + 1) & 0xFF, pend & 0xFF)

        kp_ref[0, t] = jnp.where(
            emit,
            (off << 9) | (cry.astype(jnp.int32) << 8) | head,
            jnp.int32(0x7FFFFFFF),
        )

        off = jnp.where(emit, off + 1 + run, off)
        pend = jnp.where(do & ~defer, (low >> 8) & 0xFF, pend)
        run = jnp.where(emit, 0, jnp.where(defer, run + 1, run))
        low = jnp.where(do, (low & 0xFF) << 8, low)
        rng = jnp.where(do, rng << 8, rng)
        return low, rng, pend, run, off

    low, rng, pend, run, off = jax.lax.fori_loop(
        0, TCHUNK, step,
        (low_s[:], rng_s[:], pend_s[:], run_s[:], off_s[:]),
    )
    low_s[:] = low
    rng_s[:] = rng
    pend_s[:] = pend
    run_s[:] = run
    off_s[:] = off

    @pl.when(tchunk == pl.num_programs(1) - 1)
    def _():
        fin_ref[0, 0] = low
        fin_ref[0, 1] = rng
        fin_ref[0, 2] = pend
        fin_ref[0, 3] = run
        fin_ref[0, 4] = off


@functools.partial(jax.jit, static_argnames=())
def coder_scan_off(xs: jnp.ndarray):
    """xs [G, T, 8, 128] int32 (prob | bit<<8 | valid<<9, stream order) ->
    (kp [G, T, 8, 128] i32 offset-packed byte records,
    fin [G, 5, 8, 128] final carries incl. the byte offset)."""
    G, T = xs.shape[0], xs.shape[1]
    grid = (G, T // TCHUNK)
    kp, fin = pl.pallas_call(
        _coder_kernel_off,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, SUBS, LANES), lambda g, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xs.shape, jnp.int32),
            jax.ShapeDtypeStruct((G, 5, SUBS, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), jnp.int32)] * 5,
        interpret=_use_interpret(),
    )(xs)
    return kp, fin


def _coder_kernel_off_q(qlo_ref, qhi_ref, kp_ref, fin_ref, low_s, rng_s,
                        pend_s, run_s, off_s):
    """Quad-pair variant of ``_coder_kernel_off``: consumes the compacting
    sort's pair-packed payloads directly (qlo = rec2<<10|rec1, qhi =
    rec4<<10|rec3, rec = valid<<9|bit<<8|prob, stream order) and unpacks
    the four decisions in VMEM — the XLA-side 4-way stack/reshape interleave
    and its ~2x HBM round-trip disappear, and the kernel reads half the
    bytes per decision."""
    tchunk = pl.program_id(1)

    @pl.when(tchunk == 0)
    def _():
        low_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)
        rng_s[:] = jnp.full((SUBS, LANES), 0xFF00, jnp.int32)
        pend_s[:] = jnp.full((SUBS, LANES), -1, jnp.int32)
        run_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)
        off_s[:] = jnp.zeros((SUBS, LANES), jnp.int32)

    def put(x, t_out, carry):
        low, rng, pend, run, off = carry
        prob = x & 0xFF
        bit = (x & 0x100) != 0
        valid = (x & 0x200) != 0

        range1 = (rng * prob) >> 8
        low = jnp.where(bit & valid, low + rng - range1, low)
        rng = jnp.where(valid, jnp.where(bit, range1, rng - range1), rng)
        do = valid & (rng < 0x100)

        first = pend < 0
        nocarry = low <= 0xFF00
        cry = low >= 0x10000
        emit = do & ~first & (nocarry | cry)
        defer = do & ~first & ~nocarry & ~cry
        head = jnp.where(cry, (pend + 1) & 0xFF, pend & 0xFF)

        kp_ref[0, t_out] = jnp.where(
            emit,
            (off << 9) | (cry.astype(jnp.int32) << 8) | head,
            jnp.int32(0x7FFFFFFF),
        )

        off = jnp.where(emit, off + 1 + run, off)
        pend = jnp.where(do & ~defer, (low >> 8) & 0xFF, pend)
        run = jnp.where(emit, 0, jnp.where(defer, run + 1, run))
        low = jnp.where(do, (low & 0xFF) << 8, low)
        rng = jnp.where(do, rng << 8, rng)
        return low, rng, pend, run, off

    def step(t, carry):
        qlo = qlo_ref[0, t]
        qhi = qhi_ref[0, t]
        carry = put(qlo & 0x3FF, 4 * t, carry)
        carry = put((qlo >> 10) & 0x3FF, 4 * t + 1, carry)
        carry = put(qhi & 0x3FF, 4 * t + 2, carry)
        return put((qhi >> 10) & 0x3FF, 4 * t + 3, carry)

    low, rng, pend, run, off = jax.lax.fori_loop(
        0, TCHUNK // 4, step,
        (low_s[:], rng_s[:], pend_s[:], run_s[:], off_s[:]),
    )
    low_s[:] = low
    rng_s[:] = rng
    pend_s[:] = pend
    run_s[:] = run
    off_s[:] = off

    @pl.when(tchunk == pl.num_programs(1) - 1)
    def _():
        fin_ref[0, 0] = low
        fin_ref[0, 1] = rng
        fin_ref[0, 2] = pend
        fin_ref[0, 3] = run
        fin_ref[0, 4] = off


@functools.partial(jax.jit, static_argnames=())
def coder_scan_off_q(qlo: jnp.ndarray, qhi: jnp.ndarray):
    """qlo/qhi [G, Tq, 8, 128] i32 pair-packed quad payloads (stream order,
    dead quads 0) -> (kp [G, Tq*4, 8, 128] i32 offset-packed byte records,
    fin [G, 5, 8, 128] final carries incl. the byte offset)."""
    G, Tq = qlo.shape[0], qlo.shape[1]
    grid = (G, Tq * 4 // TCHUNK)
    qspec = pl.BlockSpec((1, TCHUNK // 4, SUBS, LANES),
                         lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM)
    kp, fin = pl.pallas_call(
        _coder_kernel_off_q,
        grid=grid,
        in_specs=[qspec, qspec],
        out_specs=(
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 5, SUBS, LANES), lambda g, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Tq * 4, SUBS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, 5, SUBS, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), jnp.int32)] * 5,
        interpret=_use_interpret(),
    )(qlo, qhi)
    return kp, fin


@functools.partial(jax.jit, static_argnames=())
def coder_scan(xs: jnp.ndarray):
    """xs [G, T, 8, 128] int32 -> (meta, runs [G, T, 8, 128], fin [G, 4, 8, 128])."""
    G, T = xs.shape[0], xs.shape[1]
    grid = (G, T // TCHUNK)
    meta, runs, fin = pl.pallas_call(
        _coder_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TCHUNK, SUBS, LANES), lambda g, t: (g, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, SUBS, LANES), lambda g, t: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(xs.shape, jnp.int32),
            jax.ShapeDtypeStruct(xs.shape, jnp.int32),
            jax.ShapeDtypeStruct((G, 4, SUBS, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((SUBS, LANES), jnp.int32)] * 4,
        interpret=_use_interpret(),
    )(xs)
    return meta, runs, fin


# ---------------------------------------------------------------------------
# Lane-group reshapes (host-of-device helpers, pure XLA)
# ---------------------------------------------------------------------------


def to_groups(a: jnp.ndarray) -> jnp.ndarray:
    """[S, T] -> [G, T, 8, 128] (S padded to a multiple of 1024 by caller)."""
    S, T = a.shape
    assert S % GROUP == 0, S
    return a.reshape(S // GROUP, SUBS, LANES, T).transpose(0, 3, 1, 2)


def from_groups(a: jnp.ndarray) -> jnp.ndarray:
    """[G, T, 8, 128] -> [S, T]."""
    G, T = a.shape[0], a.shape[1]
    return a.transpose(0, 2, 3, 1).reshape(G * GROUP, T)
