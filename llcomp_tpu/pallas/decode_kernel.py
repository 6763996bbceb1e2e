"""Fused Pallas TPU decode kernel.

Decode is the hardest part of the codec to accelerate: the adaptive model is
8 MB *per 128 lanes*, every decision both reads and writes it at a
data-dependent address, and the byte stream is consumed at a data-dependent
rate.  XLA formulations bottom out at ~0.3 MP/s on this backend because
per-lane gathers/scatters serialize (docs/DESIGN.md).  This kernel keeps
everything resident in VMEM for a group of 128 lanes and uses only the
dynamic-addressing primitives this Mosaic release actually compiles
(probed on hardware, tools/probe_mosaic*.py):

* per-lane *lane-dim* scalar loads/stores are illegal ("cannot statically
  prove that index in dimension 1 is a multiple of 128") — but dynamic
  *sublane* (dim-0) row loads, row stores and (8,128) window loads at a
  traced scalar offset all compile and are fast;
* scalars are bridged out of vector registers with one small VMEM->SMEM DMA
  per symbol, after which SMEM reads feed the dynamic row offsets.

Layout per 128-lane group:

* **model**: [NS/4, 128] int32 (4 packed sub-states per word, one lane per
  column).  A symbol's 8 sub-states = 2 words per lane.  Stage-in is a
  128-iteration loop of dynamic row loads blended by lane mask; stage-out is
  a dynamic row read-modify-write — the only true random access, paid once
  per symbol instead of once per decision;
* **sub-state selection** inside a symbol: the staged block is (8, 128), so
  reading the active context's state is a sublane ``dynamic_gather`` and
  writing it back is a sublane-one-hot select — both pure vector ops;
* **byte input**: per-lane 32-byte windows ([8, 128] int32 words) re-staged
  every symbol in the same per-lane loop (a symbol consumes at most 24
  bytes, so a fresh aligned window always covers it); decision-time fetch is
  a sublane gather + variable shift;
* **reconstruction ring** (3 rows) lives in VMEM; all lanes decode the same
  stripe geometry in lockstep, so neighbor I/O uses shared scalar offsets;
* **decisions**: the fixed 24-step inner loop is fully unrolled (Mosaic
  fori_loop supports only unroll=1/full, and per-iteration loop overhead
  dominates otherwise);
* **output** is buffered 8 symbols at a time and flushed as aligned (8, 128)
  tiles.

Bitstream semantics are the reference's exactly: decoder loop
`llcomp.hpp:486-545`, getSymbol `llcomp.hpp:219-247`, range decoder
`llcomp.hpp:91-127` (zeros past end-of-stream), exponent>31 raises.
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
from ..core.config import REV2, CodecConfig

LANES = 128
# symbols per grid step (multiple of 8); bigger chunks amortize per-grid-step
# overheads at the cost of a larger planes block (tunable for probes)
SYMCHUNK = int(os.environ.get("LLCT_DECODE_SYMCHUNK", "256"))
NS4 = (REV2.num_states + 8) // 4 + 8   # packed model words per lane (+trash row)

_ZF, _EXP, _MANT, _SIGN, _DONE = 0, 1, 2, 3, 4


def _b(row: np.ndarray) -> np.ndarray:
    """Broadcast a 128-entry table to the (8, 128) lookup-block shape.

    Mosaic's ``dynamic_gather`` lowering only accepts full-vreg (8, 128)
    operands (the encode kernels use the same layout); (1, 128) blocks fail
    to lower ("Shape mismatch in input, indices and output").
    """
    return np.ascontiguousarray(
        np.broadcast_to(np.asarray(row, dtype=np.int32), (8, LANES))
    )


# fused decision table: state byte -> prob | next0<<8 | next1<<16, so the
# inner loop does ONE lane-gather per decision instead of three
_FUSED = _b(
    tables.STATE_PROB.astype(np.int32)
    | (tables.NEXT_STATE[0::2].astype(np.int32) << 8)
    | (tables.NEXT_STATE[1::2].astype(np.int32) << 16)
)
_Q11_LO = _b(tables.QUANT11[:128])
_Q11_HI = _b(tables.QUANT11[128:])
_Q5_LO = _b(tables.QUANT5[:128])
_Q5_HI = _b(tables.QUANT5[128:])


def _lut(table_block, idx):
    """(1,128) 128-entry lookup via lane-axis dynamic_gather.

    ``table_block`` is (8,128); the (1,128) index is broadcast to the full
    vreg shape and row 0 of the gather is the result."""
    idx8 = jnp.broadcast_to(idx, (8, LANES))
    return jnp.take_along_axis(table_block, idx8, axis=1)[0:1, :]


def _quant(lo_tab, hi_tab, d):
    idx = jnp.clip(d, -128, 127) & 0xFF
    return jnp.where(
        idx < 128, _lut(lo_tab, idx), _lut(hi_tab, jnp.maximum(idx - 128, 0))
    )


def _sublane_gather(block, idx):
    """block (8,128), idx (1,128) in [0,8) -> (1,128): block[idx[l], l]."""
    idx_b = jnp.broadcast_to(idx, (8, LANES))
    return jnp.take_along_axis(block, idx_b, axis=0)[0:1, :]


# Hash-bucketed prior rows packed 4 substates/word and padded 121 -> 128
# buckets for lane-axis dynamic_gather (kernel operands, like _FUSED).
_PRIOR_LO_B = _b(tables.PRIOR_LO121)
_PRIOR_HI_B = _b(tables.PRIOR_HI121)


def _write_model_init(model_ref, sections: int, primed: bool, plo, phi):
    """Fill the packed model scratch: zeros (reference semantics) or the
    sliced-mode hash-bucketed prior (tables.PRIOR_TAB; container flag
    bit 0).  Model word 2h holds hash h's substates 0-3, word 2h+1
    substates 4-7, so row r of a section gets plo/phi[(r >> 1) % 121]
    by row parity.  Uses only hardware-proven Mosaic patterns: full-vreg
    (8,128) lane-axis dynamic_gather from the table OPERANDS (captured
    constants are not allowed in kernels; bigger gather shapes do not
    lower) + dynamic sublane row stores, in a fori loop of 8-row tiles
    (the NS4 % 8 tail re-stores an overlapping tile — values depend only
    on the absolute row, so the overlap is idempotent).  The blocked
    kernel stacks ``sections`` groups' models, each restarting the
    pattern at its own base; trash rows beyond the last hash row may
    hold anything."""
    if not primed:
        model_ref[:] = jnp.zeros((sections * NS4, LANES), jnp.int32)
        return
    plo_v = plo[:]
    phi_v = phi[:]
    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

    def tile_at(c0):
        r = sub8 + c0
        b = (r >> 1) % 121
        lo = jnp.take_along_axis(plo_v, b, axis=1)
        hi = jnp.take_along_axis(phi_v, b, axis=1)
        return jnp.where((r & 1) == 0, lo, hi)

    for s in range(sections):
        base = s * NS4

        def body(i, _, base=base):
            model_ref[pl.ds(base + i * 8, 8)] = tile_at(i * 8)
            return 0

        jax.lax.fori_loop(0, NS4 // 8, body, 0)
        if NS4 % 8:
            model_ref[pl.ds(base + NS4 - 8, 8)] = tile_at(NS4 - 8)


def _make_kernel(H: int, W: int, C: int, cap: int, cfg: CodecConfig,
                 interpret: bool, ablate: str = "", primed: bool = False):
    """``interpret=True`` swaps the three per-lane stage loops (model row
    pair in/out + byte window) for single vectorized gathers/scatters with
    identical semantics — the Mosaic-legal 128-iteration loops take minutes
    under the Pallas interpreter.  The decision machine (the part where
    semantic bugs live) is byte-identical between the two paths; the
    hardware staging path is validated on the chip (tools/tpu_decode_check,
    CLI selftest, bench)."""
    stride = W * C
    n_sym = H * W * C
    nwords = cap // 4

    def kernel(data_ref,                      # [cap/4, 128] i32 (packed bytes LE)
               ftab, q11lo, q11hi, q5lo, q5hi,   # (8,128) tables
               plo, phi,                      # (8,128) prior rows (primed)
               planes_ref,                    # [SYMCHUNK, 128] i32 out
               err_ref,                       # [8, 128] i32 out (sticky flags)
               model_ref,                     # [NS4, 128] i32 scratch
               lines_ref,                     # [3*stride, 128] i32 scratch
               vscr_ref,                      # [2, 128] i32 scratch: DMA source
               sscr_ref,                      # [2, 128] i32 SMEM: bridged scalars
               outbuf_ref,                    # [8, 128] i32 scratch: planes buffer
               state_ref,                     # [8, 128] i32 scratch: coder state
               dma_sem):
        chunk = pl.program_id(1)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        ftab_v = ftab[:]
        q11lo_v = q11lo[:]
        q11hi_v = q11hi[:]
        q5lo_v = q5lo[:]
        q5hi_v = q5hi[:]

        @pl.when(chunk == 0)
        def _init():
            _write_model_init(model_ref, 1, primed, plo[:], phi[:])
            lines_ref[:] = jnp.zeros((3 * stride, LANES), jnp.int32)
            err_ref[:] = jnp.zeros((8, LANES), jnp.int32)
            w0 = data_ref[0:1, :]
            b0 = w0 & 0xFF
            b1 = (w0 >> 8) & 0xFF
            # rows of state_ref: 0=low 1=range 2=dpos
            state_ref[0:1, :] = (b0 << 8) | b1
            state_ref[1:2, :] = jnp.full((1, LANES), 0xFF00, jnp.int32)
            state_ref[2:3, :] = jnp.full((1, LANES), 2, jnp.int32)
            state_ref[3:8, :] = jnp.zeros((5, LANES), jnp.int32)

        def sym_body(k, carry):
            low, rng, dpos = carry
            sym = chunk * SYMCHUNK + k
            # tail symbols past n_sym still run (cheaper than masking the
            # whole body): they read the zero tail / clamped windows and only
            # touch the ring, the model and the error mask, all of which are
            # dead after the last real symbol.  err is masked below.
            active = sym < n_sym
            i = sym % C
            w = (sym // C) % W
            h = sym // (W * C)
            off = w * C + i
            cur = (h % 3) * stride
            up = ((h + 2) % 3) * stride
            upup = ((h + 1) % 3) * stride

            # ---- neighbors (lane-uniform offsets) --------------------
            def line(base, o):
                return lines_ref[pl.ds(base + o, 1), :]

            om1 = jnp.maximum(off - C, 0)
            om2 = jnp.maximum(off - 2 * C, 0)
            op1 = jnp.minimum(off + C, stride - 1)
            l_n = line(cur, om1)
            up_x = line(up, off)
            l_ = jnp.where(w > 0, l_n, jnp.where(h > 0, up_x, 128))
            t_ = jnp.where(h > 0, up_x, l_)
            L_ = jnp.where(w > 1, line(cur, om2), l_)
            tl = jnp.where((h > 0) & (w > 0), line(up, om1), t_)
            tr = jnp.where((h > 0) & (w < W - 1), line(up, op1), t_)
            T_ = jnp.where(h > 1, line(upup, off), t_)

            hsh = (
                _quant(q11lo_v, q11hi_v, l_ - tl)
                + _quant(q11lo_v, q11hi_v, tl - t_) * 11
                + _quant(q11lo_v, q11hi_v, t_ - tr) * 121
                + _quant(q5lo_v, q5hi_v, L_ - l_) * 605
                + _quant(q5lo_v, q5hi_v, T_ - t_) * 3025
            )
            predict = jnp.clip(
                l_ + t_ - tl, jnp.minimum(l_, t_), jnp.maximum(l_, t_)
            )
            neg = hsh < 0
            base2 = jnp.where(neg, -hsh, hsh) * 2  # packed word index

            # ---- bridge per-lane scalars out via one small DMA -------
            # row 0: model word index; row 1: byte-window word base,
            # clamped so overrun/corrupt streams stage the zero tail.
            w4 = jnp.clip(jax.lax.shift_right_logical(dpos, 2), 0, nwords - 8)
            if "nostagein" in ablate:
                # timing ablation only (bit-INEXACT): zero model rows/window
                wa = jnp.zeros((1, LANES), jnp.int32)
                wb = jnp.zeros((1, LANES), jnp.int32)
                wind = jnp.zeros((8, LANES), jnp.int32)
            elif interpret:
                mdl = model_ref[:]
                wa = jnp.take_along_axis(mdl, base2, axis=0)
                wb = jnp.take_along_axis(mdl, base2 + 1, axis=0)
                dat = data_ref[:]
                wind = jnp.take_along_axis(
                    dat, jnp.broadcast_to(w4, (8, LANES)) + sub8, axis=0
                )
            else:
                vscr_ref[0:1, :] = base2
                vscr_ref[1:2, :] = w4
                cp = pltpu.make_async_copy(vscr_ref, sscr_ref, dma_sem)
                cp.start()
                cp.wait()

                # ---- merged per-lane stage-in: model rows + window ---
                zero1 = jnp.zeros((1, LANES), jnp.int32)

                def stage_in(l, acc):
                    wa, wb, wind = acc
                    r = sscr_ref[0, l]
                    b = sscr_ref[1, l]
                    wa = jnp.where(lane1 == l, model_ref[pl.ds(r, 1), :], wa)
                    wb = jnp.where(lane1 == l,
                                   model_ref[pl.ds(r + 1, 1), :], wb)
                    wind = jnp.where(lane8 == l, data_ref[pl.ds(b, 8), :],
                                     wind)
                    return wa, wb, wind

                wa, wb, wind = jax.lax.fori_loop(
                    0, LANES, stage_in,
                    (zero1, zero1, jnp.zeros((8, LANES), jnp.int32)),
                )
            wbase = w4 * 4

            # ---- decisions (fixed 24-step machine; fully unrolled on
            # hardware, rolled into a fori_loop under the interpreter
            # where XLA:CPU cannot compile the unrolled graph) ----------
            one = jnp.ones((1, LANES), jnp.int32)
            dstate = (
                wa, wb, low, rng, dpos,
                jnp.full((1, LANES), _ZF, jnp.int32),   # phase
                0 * one,                                 # value
                0 * one,                                 # e
                one,                                     # ectx
                0 * one,                                 # mrem
                jnp.full((1, LANES), cfg.e_lim + 1, jnp.int32),  # mctx
                0 * one,                                 # errv
            )

            def decision(_d, dstate):
                (wa, wb, low, rng, dpos, phase, value, e, ectx, mrem, mctx,
                 errv) = dstate
                act = phase != _DONE
                ctx = jnp.where(phase == _EXP,
                                jnp.minimum(ectx, cfg.e_lim), 0)
                ctx = jnp.where(phase == _MANT,
                                jnp.minimum(mctx, cfg.r_lim), ctx)
                ctx = jnp.where(phase == _SIGN, cfg.sign_ctx, ctx)

                # sub-state byte-select from the two packed words: no gather
                sh = (ctx & 3) * 8
                mword = jnp.where(ctx < 4, wa, wb)
                st8 = jax.lax.shift_right_logical(mword, sh) & 0xFF
                f = _lut(ftab_v, st8)
                prob = f & 0xFF
                range1 = (rng * prob) >> 8
                rng0 = rng - range1
                bit = (low >= rng0) & act
                low = jnp.where(bit, low - rng0, low)
                rng = jnp.where(act, jnp.where(bit, range1, rng0), rng)
                refl = act & (rng < 0x100)
                # byte fetch from the staged window
                widx = dpos - wbase
                word = _sublane_gather(
                    wind,
                    jnp.minimum(jax.lax.shift_right_logical(widx, 2), 7),
                )
                byte = (word >> ((widx & 3) * 8)) & 0xFF
                byte = jnp.where(widx < 32, byte, 0)
                low = jnp.where(refl, (low << 8) | byte, low)
                rng = jnp.where(refl, rng << 8, rng)
                dpos = jnp.where(refl, dpos + 1, dpos)

                ns = jax.lax.shift_right_logical(
                    f, jnp.where(bit, 16, 8)) & 0xFF
                # byte-insert the next state back into the packed word
                neww = (mword & ~(0xFF << sh)) | (ns << sh)
                wa = jnp.where(act & (ctx < 4), neww, wa)
                wb = jnp.where(act & (ctx >= 4), neww, wb)

                b = bit.astype(jnp.int32)
                is_zf = (phase == _ZF) & act
                is_exp = (phase == _EXP) & act
                is_mant = (phase == _MANT) & act
                is_sign = (phase == _SIGN) & act

                value = jnp.where(is_zf, jnp.where(bit, 0, 1), value)
                value = jnp.where(is_mant, 2 * value + b, value)
                value = jnp.where(is_sign & bit, -value, value)
                e2 = jnp.where(is_exp & bit, e + 1, e)
                errv = errv | (is_exp & (e2 > 31)).astype(jnp.int32)
                ectx = jnp.where(is_exp & bit, ectx + 1, ectx)
                last_mant = is_mant & (mrem == 1)  # pre-decrement count
                mrem = jnp.where(is_exp & ~bit, e2,
                                 jnp.where(is_mant, mrem - 1, mrem))
                mctx = jnp.where(is_mant, mctx + 1, mctx)
                nphase = phase
                nphase = jnp.where(is_zf, jnp.where(bit, _DONE, _EXP), nphase)
                nphase = jnp.where(is_exp & ~bit,
                                   jnp.where(e2 > 0, _MANT, _SIGN), nphase)
                nphase = jnp.where(last_mant, _SIGN, nphase)
                nphase = jnp.where(is_sign, _DONE, nphase)
                return (wa, wb, low, rng, dpos, nphase, value, e2, ectx,
                        mrem, mctx, errv)

            nsteps = cfg.max_bins_per_symbol
            if "decis1" in ablate:
                nsteps = 1  # timing ablation only (bit-INEXACT)
            if interpret:
                dstate = jax.lax.fori_loop(0, nsteps, decision, dstate)
            else:
                for _d in range(nsteps):
                    dstate = decision(_d, dstate)
            (wa, wb, low, rng, dpos, phase, value, _e, _ectx, _mrem, _mctx,
             errv) = dstate

            # a valid symbol always terminates within 24 decisions
            # (SURVEY §2.4); an unterminated one marks stream corruption
            errv = errv | (phase != _DONE).astype(jnp.int32)

            @pl.when(active)
            def _():
                err_ref[0:1, :] = err_ref[0:1, :] | errv

            # ---- stage-out the updated word pair (dynamic-row RMW) ----
            w0, w1 = wa, wb

            if "nostage" in ablate:
                pass  # timing ablation: no model write-back
            elif interpret:
                mdl = model_ref[:]
                lidx = jnp.arange(LANES)
                mdl = mdl.at[base2[0, :], lidx].set(w0[0, :])
                mdl = mdl.at[base2[0, :] + 1, lidx].set(w1[0, :])
                model_ref[:] = mdl
            else:
                def stage_out(l, _):
                    r = sscr_ref[0, l]
                    ra = model_ref[pl.ds(r, 1), :]
                    model_ref[pl.ds(r, 1), :] = jnp.where(lane1 == l, w0, ra)
                    rb = model_ref[pl.ds(r + 1, 1), :]
                    model_ref[pl.ds(r + 1, 1), :] = jnp.where(
                        lane1 == l, w1, rb)
                    return 0

                jax.lax.fori_loop(0, LANES, stage_out, 0)

            # ---- reconstruction: ring + buffered planes output ------
            diff = jnp.where(neg, -value, value)
            recon = predict + diff
            lines_ref[pl.ds(cur + off, 1), :] = recon
            outbuf_ref[pl.ds(k % 8, 1), :] = recon

            @pl.when(k % 8 == 7)
            def _flush():
                planes_ref[pl.ds((k // 8) * 8, 8), :] = outbuf_ref[:]

            return low, rng, dpos

        init = (state_ref[0:1, :], state_ref[1:2, :], state_ref[2:3, :])
        low, rng, dpos = jax.lax.fori_loop(0, SYMCHUNK, sym_body, init)
        state_ref[0:1, :] = low
        state_ref[1:2, :] = rng
        state_ref[2:3, :] = dpos

    return kernel


def _make_kernel_blocked(H: int, W: int, C: int, cap: int, cfg: CodecConfig,
                         NSUB: int, interpret: bool, ablate: str = "",
                         primed: bool = False):
    """Hardware kernel: 8-symbol blocks x NSUB lane-groups per instance
    (requires stride % 8 == 0, C <= 8).

    Two structural amortizations over the naive per-symbol kernel:

    **8-symbol blocks** (blocks never straddle a pixel row): neighbor
    windows stage once per block as three dynamic row loads and every
    in-block read becomes a STATIC slice; in-block pixels forward through
    registers; ring + planes output written as aligned tiles; the model
    write-back is deferred one symbol and merged with the next symbol's
    stage-in (double-parity SMEM slots).

    **NSUB-wide vectorization**: a (1,128) op occupies a full (8,128) vreg
    with 7 sublanes masked, so the whole decision machine runs NSUB
    lane-groups (NSUB*128 streams) in the sublane dimension at roughly the
    instruction cost of one.  Per-group state lives at sublane g:

    * model: one [NSUB*NS4, 128] scratch, group g's rows at g*NS4 (the
      bridged row index has the offset baked in);
    * ring lines: group-interleaved rows (pixel offset p, group g) ->
      row p*NSUB+g, so ONE dynamic load yields an (NSUB,128) neighbor
      value and block stores are contiguous (8*NSUB,128) tiles;
    * byte data: groups concatenated along rows (group g's words at
      g*cap4), per-group (8,128) windows re-staged per symbol;
    * the scalar DMA bridge ships all groups' (model row, window base)
      in one (2*NSUB,128) VMEM->SMEM copy per symbol;
    * the per-decision byte fetch is the only NSUB-replicated vector op
      (sublane dynamic_gather only takes (8,128) operands).

    The merged 128-iteration staging loop does NSUB row-pair RMWs + reads
    per lane — per-(group,lane) work is unavoidable (the model addresses
    are data-dependent and distinct), but everything else in the kernel
    amortizes across groups.  Under ``interpret`` the staging loops are
    replaced by vectorized gathers/scatters with identical semantics and
    immediate (not deferred) write-back; the decision machine — where
    semantic bugs live — is byte-identical between the two paths.
    Bitstream semantics are the reference's (decoder loop
    `llcomp.hpp:486-545`).
    """
    stride = W * C
    n_sym = H * W * C
    nwords = cap // 4
    cap4 = cap // 4
    assert stride % 8 == 0 and C <= 8 and SYMCHUNK % 8 == 0
    assert 1 <= NSUB <= 8
    LPAD = 16                       # lines base pad (window underruns)
    TRASH = NS4 - 2                 # model row pair never read by decode
    LROWS = 2 * LPAD + 3 * stride   # ring rows per group (pixel units)

    def kernel(data_ref,            # [NSUB*cap4, 128] i32 (LE-packed bytes)
               ftab, q11lo, q11hi, q5lo, q5hi,
               plo, phi,            # (8,128) prior rows (primed)
               planes_ref,          # [SYMCHUNK*NSUB, 128] i32 out
               err_ref,             # [NSUB, 128] i32 out (sticky flags)
               model_ref,           # [NSUB*NS4, 128] i32 scratch
               lines_ref,           # [LROWS*NSUB, 128] i32 scratch
               vscr_ref,            # [2*NSUB, 128] i32 scratch: DMA source
               sscr_ref,            # [4*NSUB, 128] i32 SMEM: bridged scalars
               pend_ref,            # [2*NSUB, 128] i32 scratch: pending pair
               state_ref,           # [24, 128] i32 scratch: coder state
               dma_sem):
        chunk = pl.program_id(1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
        subN = jax.lax.broadcasted_iota(jnp.int32, (NSUB, LANES), 0)
        ftab_v = ftab[:]
        q11lo_v = q11lo[:]
        q11hi_v = q11hi[:]
        q5lo_v = q5lo[:]
        q5hi_v = q5hi[:]

        def lutN(table_block, idx):
            """(NSUB,128) 128-entry lookup: one full-vreg dynamic_gather."""
            if NSUB == 8:
                return jnp.take_along_axis(table_block, idx, axis=1)
            idx8 = jnp.concatenate(
                [idx, jnp.zeros((8 - NSUB, LANES), jnp.int32)], axis=0
            )
            return jnp.take_along_axis(table_block, idx8, axis=1)[:NSUB]

        def quantN(lo_tab, hi_tab, d):
            idx = jnp.clip(d, -128, 127) & 0xFF
            return jnp.where(
                idx < 128, lutN(lo_tab, idx),
                lutN(hi_tab, jnp.maximum(idx - 128, 0))
            )

        @pl.when(chunk == 0)
        def _init():
            _write_model_init(model_ref, NSUB, primed, plo[:], phi[:])
            lines_ref[:] = jnp.zeros((LROWS * NSUB, LANES), jnp.int32)
            err_ref[:] = jnp.zeros((NSUB, LANES), jnp.int32)
            pend_ref[:] = jnp.zeros((2 * NSUB, LANES), jnp.int32)
            w0 = jnp.concatenate(
                [data_ref[g * cap4 : g * cap4 + 1, :] for g in range(NSUB)],
                axis=0,
            )
            b0 = w0 & 0xFF
            b1 = (w0 >> 8) & 0xFF
            # state_ref rows [0:N]=low [8:8+N]=range [16:16+N]=dpos
            state_ref[:] = jnp.zeros((24, LANES), jnp.int32)
            state_ref[0:NSUB, :] = (b0 << 8) | b1
            state_ref[8 : 8 + NSUB, :] = jnp.full(
                (NSUB, LANES), 0xFF00, jnp.int32
            )
            state_ref[16 : 16 + NSUB, :] = jnp.full(
                (NSUB, LANES), 2, jnp.int32
            )
            # seed the deferred write-back: a zero pair aimed at each
            # group's trash row, parked in the j=0 parity slot
            vscr_ref[0:NSUB, :] = subN * NS4 + TRASH
            vscr_ref[NSUB : 2 * NSUB, :] = jnp.zeros(
                (NSUB, LANES), jnp.int32
            )
            cp = pltpu.make_async_copy(
                vscr_ref, sscr_ref.at[pl.ds(2 * NSUB, 2 * NSUB)], dma_sem
            )
            cp.start()
            cp.wait()

        def decision(dstate, winds):
            (wa, wb, low, rng, dpos, wbase, phase, value, e, ectx,
             mrem, mctx, errv) = dstate
            act = phase != _DONE
            ctx = jnp.where(phase == _EXP,
                            jnp.minimum(ectx, cfg.e_lim), 0)
            ctx = jnp.where(phase == _MANT,
                            jnp.minimum(mctx, cfg.r_lim), ctx)
            ctx = jnp.where(phase == _SIGN, cfg.sign_ctx, ctx)

            sh = (ctx & 3) * 8
            mword = jnp.where(ctx < 4, wa, wb)
            st8 = jax.lax.shift_right_logical(mword, sh) & 0xFF
            f = lutN(ftab_v, st8)
            prob = f & 0xFF
            range1 = (rng * prob) >> 8
            rng0 = rng - range1
            bit = (low >= rng0) & act
            low = jnp.where(bit, low - rng0, low)
            rng = jnp.where(act, jnp.where(bit, range1, rng0), rng)
            refl = act & (rng < 0x100)
            widx = dpos - wbase
            wsel = jnp.minimum(jax.lax.shift_right_logical(widx, 2), 7)
            rows = []
            for g in range(NSUB):
                idx8 = jnp.broadcast_to(wsel[g : g + 1, :], (8, LANES))
                rows.append(
                    jnp.take_along_axis(winds[g], idx8, axis=0)[0:1, :]
                )
            word = rows[0] if NSUB == 1 else jnp.concatenate(rows, axis=0)
            byte = (word >> ((widx & 3) * 8)) & 0xFF
            byte = jnp.where(widx < 32, byte, 0)
            low = jnp.where(refl, (low << 8) | byte, low)
            rng = jnp.where(refl, rng << 8, rng)
            dpos = jnp.where(refl, dpos + 1, dpos)

            ns = jax.lax.shift_right_logical(
                f, jnp.where(bit, 16, 8)) & 0xFF
            neww = (mword & ~(0xFF << sh)) | (ns << sh)
            wa = jnp.where(act & (ctx < 4), neww, wa)
            wb = jnp.where(act & (ctx >= 4), neww, wb)

            b = bit.astype(jnp.int32)
            is_zf = (phase == _ZF) & act
            is_exp = (phase == _EXP) & act
            is_mant = (phase == _MANT) & act
            is_sign = (phase == _SIGN) & act

            value = jnp.where(is_zf, jnp.where(bit, 0, 1), value)
            value = jnp.where(is_mant, 2 * value + b, value)
            value = jnp.where(is_sign & bit, -value, value)
            e2 = jnp.where(is_exp & bit, e + 1, e)
            errv = errv | (is_exp & (e2 > 31)).astype(jnp.int32)
            ectx = jnp.where(is_exp & bit, ectx + 1, ectx)
            last_mant = is_mant & (mrem == 1)
            mrem = jnp.where(is_exp & ~bit, e2,
                             jnp.where(is_mant, mrem - 1, mrem))
            mctx = jnp.where(is_mant, mctx + 1, mctx)
            nphase = phase
            nphase = jnp.where(is_zf, jnp.where(bit, _DONE, _EXP), nphase)
            nphase = jnp.where(is_exp & ~bit,
                               jnp.where(e2 > 0, _MANT, _SIGN), nphase)
            nphase = jnp.where(last_mant, _SIGN, nphase)
            nphase = jnp.where(is_sign, _DONE, nphase)
            return (wa, wb, low, rng, dpos, wbase, nphase, value,
                    e2, ectx, mrem, mctx, errv)

        zeroN = jnp.zeros((NSUB, LANES), jnp.int32)
        oneN = jnp.ones((NSUB, LANES), jnp.int32)
        zfN = jnp.full((NSUB, LANES), _ZF, jnp.int32)
        mctxN = jnp.full((NSUB, LANES), cfg.e_lim + 1, jnp.int32)
        z1 = jnp.zeros((1, LANES), jnp.int32)
        z8 = jnp.zeros((8, LANES), jnp.int32)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def block_body(m, carry):
            low, rng, dpos, pa, pb, erracc = carry
            sym0 = chunk * SYMCHUNK + m * 8
            off0 = sym0 % stride
            h = sym0 // stride
            cur = LPAD + (h % 3) * stride
            up = LPAD + ((h + 2) % 3) * stride
            upup = LPAD + ((h + 1) % 3) * stride

            # ---- block neighbor windows (3 dynamic loads / 8 symbols);
            # group-interleaved rows make each an all-groups load --------
            cur_win = lines_ref[pl.ds((cur + off0 - 16) * NSUB, 16 * NSUB), :]
            up_win = lines_ref[pl.ds((up + off0 - 8) * NSUB, 24 * NSUB), :]
            upup_win = lines_ref[pl.ds((upup + off0) * NSUB, 8 * NSUB), :]

            def cw(q):     # cur_win pixel q in [-16, 0)
                return cur_win[(16 + q) * NSUB : (17 + q) * NSUB, :]

            def uw(q):     # up_win pixel q in [-8, 16)
                return up_win[(8 + q) * NSUB : (9 + q) * NSUB, :]

            h_pos = h > 0
            h_pos2 = h > 1

            recons = []
            for j in range(8):
                off_j = off0 + j
                w_pos = off_j >= C            # w > 0
                w_pos2 = off_j >= 2 * C       # w > 1
                w_last = off_j >= stride - C  # w == W-1

                l_raw = recons[j - C] if j - C >= 0 else cw(j - C)
                L_raw = recons[j - 2 * C] if j - 2 * C >= 0 else cw(j - 2 * C)
                up_x = uw(j)
                l_ = jnp.where(w_pos, l_raw,
                               jnp.where(h_pos, up_x, 128))
                t_ = jnp.where(h_pos, up_x, l_)
                L_ = jnp.where(w_pos2, L_raw, l_)
                tl = jnp.where(h_pos & w_pos, uw(j - C), t_)
                tr = jnp.where(h_pos & ~w_last, uw(j + C), t_)
                T_ = jnp.where(h_pos2,
                               upup_win[j * NSUB : (j + 1) * NSUB, :], t_)

                if "nohash" in ablate:
                    # timing ablation only (bit-INEXACT)
                    hsh = l_ - l_
                    predict = t_ - t_
                else:
                    hsh = (
                        quantN(q11lo_v, q11hi_v, l_ - tl)
                        + quantN(q11lo_v, q11hi_v, tl - t_) * 11
                        + quantN(q11lo_v, q11hi_v, t_ - tr) * 121
                        + quantN(q5lo_v, q5hi_v, L_ - l_) * 605
                        + quantN(q5lo_v, q5hi_v, T_ - t_) * 3025
                    )
                    predict = jnp.clip(
                        l_ + t_ - tl, jnp.minimum(l_, t_), jnp.maximum(l_, t_)
                    )
                neg = hsh < 0
                base2 = jnp.where(neg, -hsh, hsh) * 2

                # ---- bridge per-lane scalars (all groups, one DMA);
                # parity slot is static (j & 1) ---------------------------
                mrow = base2 + subN * NS4
                w4 = jnp.clip(jax.lax.shift_right_logical(dpos, 2),
                              0, nwords - 8)
                brow = w4 + subN * cap4
                slot = (j & 1) * 2 * NSUB
                pslot = ((j + 1) & 1) * 2 * NSUB
                if "nodma" not in ablate and not interpret:
                    vscr_ref[0:NSUB, :] = mrow
                    vscr_ref[NSUB : 2 * NSUB, :] = brow
                    cp = pltpu.make_async_copy(
                        vscr_ref, sscr_ref.at[pl.ds(slot, 2 * NSUB)], dma_sem
                    )
                    cp.start()
                    cp.wait()

                # ---- ONE merged staging loop: write-back prev symbol's
                # pairs, read this symbol's pairs + byte windows ----------
                pend_gs = [
                    jnp.concatenate([pa[g : g + 1, :], pb[g : g + 1, :]],
                                    axis=0)
                    for g in range(NSUB)
                ]

                def stage(l, acc):
                    was, wbs, winds = acc
                    was, wbs, winds = list(was), list(wbs), list(winds)
                    lm1 = lane1 == l
                    lm2 = lane2 == l
                    lm8 = lane8 == l
                    for g in range(NSUB):
                        rp = sscr_ref[pslot + g, l]
                        rc = sscr_ref[slot + g, l]
                        b = sscr_ref[slot + NSUB + g, l]
                        old = model_ref[pl.ds(rp, 2), :]
                        model_ref[pl.ds(rp, 2), :] = jnp.where(
                            lm2, pend_gs[g], old
                        )
                        pair = model_ref[pl.ds(rc, 2), :]
                        was[g] = jnp.where(lm1, pair[0:1, :], was[g])
                        wbs[g] = jnp.where(lm1, pair[1:2, :], wbs[g])
                        winds[g] = jnp.where(
                            lm8, data_ref[pl.ds(b, 8), :], winds[g]
                        )
                    return tuple(was), tuple(wbs), tuple(winds)

                if interpret:
                    # vectorized staging; write-back is immediate (after
                    # the decision loop below) instead of deferred — the
                    # deferred write always lands before the next read of
                    # the same row, so the visible state is identical
                    mdl = model_ref[:]
                    wa = jnp.take_along_axis(mdl, mrow, axis=0)
                    wb = jnp.take_along_axis(mdl, mrow + 1, axis=0)
                    dat = data_ref[:]
                    winds = [
                        jnp.take_along_axis(
                            dat,
                            jnp.broadcast_to(brow[g : g + 1, :], (8, LANES))
                            + sub8,
                            axis=0,
                        )
                        for g in range(NSUB)
                    ]
                elif "nostage" in ablate or "nodma" in ablate:
                    # timing ablation only (bit-INEXACT)
                    wa, wb = zeroN, zeroN
                    winds = [z8] * NSUB
                else:
                    was, wbs, winds = jax.lax.fori_loop(
                        0, LANES, stage,
                        (tuple([z1] * NSUB), tuple([z1] * NSUB),
                         tuple([z8] * NSUB)),
                    )
                    wa = (was[0] if NSUB == 1
                          else jnp.concatenate(was, axis=0))
                    wb = (wbs[0] if NSUB == 1
                          else jnp.concatenate(wbs, axis=0))
                wbase = w4 * 4

                dstate = (
                    wa, wb, low, rng, dpos, wbase,
                    zfN, zeroN, zeroN, oneN, zeroN, mctxN, zeroN,
                )
                nsteps = 1 if "decis1" in ablate else cfg.max_bins_per_symbol
                if interpret:
                    # rolled: XLA:CPU cannot compile the unrolled graph
                    def dbody(_d, ds):
                        return decision(ds, winds)

                    dstate = jax.lax.fori_loop(0, nsteps, dbody, dstate)
                else:
                    for _d in range(nsteps):
                        dstate = decision(dstate, winds)
                (pa, pb, low, rng, dpos, _wbase, phase, value,
                 _e, _ectx, _mrem, _mctx, errv) = dstate

                if interpret:
                    mdl = model_ref[:]
                    lidx = jnp.arange(LANES)
                    for g in range(NSUB):
                        mdl = mdl.at[mrow[g, :], lidx].set(pa[g, :])
                        mdl = mdl.at[mrow[g, :] + 1, lidx].set(pb[g, :])
                    model_ref[:] = mdl

                # sticky error: accumulate in a register, flush per chunk
                errv = errv | (phase != _DONE).astype(jnp.int32)
                erracc = jnp.where(sym0 + j < n_sym, erracc | errv, erracc)

                diff = jnp.where(neg, -value, value)
                recons.append(predict + diff)

            blk = jnp.concatenate(recons, axis=0)
            lines_ref[pl.ds((cur + off0) * NSUB, 8 * NSUB), :] = blk
            planes_ref[pl.ds(m * 8 * NSUB, 8 * NSUB), :] = blk
            return low, rng, dpos, pa, pb, erracc

        init = (state_ref[0:NSUB, :], state_ref[8 : 8 + NSUB, :],
                state_ref[16 : 16 + NSUB, :], pend_ref[0:NSUB, :],
                pend_ref[NSUB : 2 * NSUB, :], zeroN)
        low, rng, dpos, pa, pb, erracc = jax.lax.fori_loop(
            0, SYMCHUNK // 8, block_body, init
        )
        state_ref[0:NSUB, :] = low
        state_ref[8 : 8 + NSUB, :] = rng
        state_ref[16 : 16 + NSUB, :] = dpos
        pend_ref[0:NSUB, :] = pa
        pend_ref[NSUB : 2 * NSUB, :] = pb
        err_ref[:, :] = err_ref[:, :] | erracc

    return kernel


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "cfg", "primed", "lane_major")
)
def decode_groups_images(data: jnp.ndarray, H: int, W: int, C: int,
                         cfg: CodecConfig = REV2, primed: bool = False,
                         lane_major: bool = False, seed=None):
    """Like decode_groups, but finishes on-device: un-permutes the planes,
    applies the inverse RCT and returns uint8 images [G*128, H, W, C] plus
    the per-lane error flags.  4x less device->host traffic than fetching
    the raw i32 planes (the tunnel link is the e2e decode bottleneck).

    lane_major=True takes [G, 128, cap] instead of [G, cap, 128]: the host
    then fills each stream with ONE contiguous memcpy (the [cap, 128]
    layout costs thousands of stride-128 writes per batch) and the device
    pays a ~1 s/GB relayout instead (docs/DESIGN.md backend notes)."""
    from ..core import transform

    if lane_major:
        data = data.transpose(0, 2, 1)
    planes, err = _decode_groups_impl(data, H, W, C, cfg, "", primed, seed)
    G = data.shape[0]
    n_sym = H * W * C
    imgs = (
        planes[:, :n_sym, :]
        .transpose(0, 2, 1)
        .reshape(G * LANES, H, W, C)
    )
    return transform.rct_inverse(imgs), err[:, 0, :].reshape(G * LANES)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "cfg", "primed")
)
def decode_groups(data: jnp.ndarray, H: int, W: int, C: int,
                  cfg: CodecConfig = REV2, primed: bool = False,
                  seed=None):
    """data [G, cap, 128] u8 (zero-padded, cap % 64 == 0) ->
    (planes [G, n_sym_pad, 128] i32, err [G, 8, 128] i32)."""
    return _decode_groups_impl(data, H, W, C, cfg, "", primed, seed)


# NSUB constraints, MEASURED on the target chip (v5e via axon) with
# tools/probe_decode_nsub.py + tools/probe_decode_bisect.py, round 3:
#
# 1. **NSUB must be a power of two.**  Non-power-of-two sublane packings
#    mis-execute at RUNTIME (they compile fine): NSUB=5 and NSUB=6 fail
#    with "TPU backend error (Internal)" — or kill the worker outright —
#    at BOTH 512-wide (scratch well under any limit) and 2048-wide, while
#    2/4/8 decode bit-exact at the same geometries.  r02's bench crash at
#    2048-wide was the old sizing model picking NSUB=5.
# 2. **Total footprint must stay under ~112 MB.**  NSUB=8 at stride 6144
#    (~168 MB with pipeline buffers) kills the worker; NSUB=8 at stride
#    1536 (~103 MB) and NSUB=4 at 6144 (~84 MB) are bit-exact.
VMEM_BUDGET = int(os.environ.get("LLCT_DECODE_VMEM_BUDGET",
                                 112 * 1024 * 1024))


def _group_vmem(cap: int, stride: int) -> int:
    """Blocked-kernel VMEM bytes per lane-group (x128 lanes, i32 words),
    counting the Pallas pipeline's double buffers on grid-indexed blocks."""
    return (
        NS4 * 512                      # model scratch (~8.1 MB)
        + (32 + 3 * stride) * 512      # reconstructed-line ring
        + 2 * cap * 128                # packed stream window (double-buf)
        + 2 * SYMCHUNK * 512           # planes output block (double-buf)
        + 64 * 1024                    # coder/pending/SMEM slack
    )


def _pick_nsub(G: int, cap: int, stride: int = 1536) -> int:
    """Lane-groups per kernel instance: the largest POWER OF TWO <= 8 whose
    total footprint fits the measured budget (see constraints above).
    More groups amortize the decision machine's vector instructions
    (sublane packing: ~1.55x per doubling, r02 ablation)."""
    env = os.environ.get("LLCT_DECODE_NSUB")
    if env:
        n = max(1, min(8, int(env), G))
        # non-power-of-two NSUB compiles fine and then mis-executes or
        # kills the worker (docs/DESIGN.md hazards); only the probe tools
        # may bypass the rounding, via an explicit second flag
        if os.environ.get("LLCT_DECODE_NSUB_UNSAFE") == "1":
            return n
        return 1 << (n.bit_length() - 1)
    n = max(1, min(8, VMEM_BUDGET // _group_vmem(cap, stride), G))
    return 1 << (n.bit_length() - 1)   # round down to a power of two


def fits_pallas_decode(cap: int, stride: int, tuned: bool = True) -> bool:
    """True iff one lane-group fits the measured VMEM budget (ultra-wide
    stripes fall back to the XLA decode engines, mirroring
    encode.fits_pallas_budget).  ``tuned=False`` uses the default budget
    and chunk size regardless of probe env overrides — container-shaping
    policy must be a pure function of geometry on every host."""
    if tuned:
        return _group_vmem(cap, stride) <= VMEM_BUDGET
    base = (NS4 * 512 + (32 + 3 * stride) * 512 + 2 * cap * 128
            + 2 * 256 * 512 + 64 * 1024)
    return base <= 112 * 1024 * 1024


def _decode_groups_impl(data, H, W, C, cfg, ablate, primed=False,
                        seed=None):
    # A stored seed (container flag bit 1) rides the primed-mode operand
    # paths with values swapped, so the kernel must be BUILT primed even
    # when the container doesn't set FLAG_PRIMED — mirroring
    # encode._launch_stage_rest's `primed or seed is not None`.  Without
    # this the kernel zero-fills the model and ignores the seed operands.
    primed = primed or seed is not None
    G, cap = data.shape[0], data.shape[1]
    n_sym = H * W * C
    n_chunks = -(-n_sym // SYMCHUNK)
    n_sym_pad = n_chunks * SYMCHUNK
    cap4 = cap // 4

    # pack bytes little-endian into words for dynamic-row window staging
    d32 = (
        data[:, 0::4].astype(jnp.int32)
        | (data[:, 1::4].astype(jnp.int32) << 8)
        | (data[:, 2::4].astype(jnp.int32) << 16)
        | (data[:, 3::4].astype(jnp.int32) << 24)
    )

    stride = W * C
    interpret = _use_interpret()
    # LLCT_DECODE_FORCE_BLOCKED lets the CPU test suite run the hardware
    # blocked kernel under the (slow) Pallas interpreter on tiny images
    blocked = (stride % 8 == 0 and C <= 8
               and (not interpret
                    or os.environ.get("LLCT_DECODE_FORCE_BLOCKED") == "1"))
    if seed is not None:
        # stored-seed table (container flag bit 1): same operand layout as
        # the static prior, values swapped per call — the kernel (and its
        # compile) is identical, only plo/phi data differ
        t = jnp.asarray(seed, jnp.int32)
        slo = t[:, 0] | t[:, 1] << 8 | t[:, 2] << 16 | t[:, 3] << 24
        shi = t[:, 4] | t[:, 5] << 8 | t[:, 6] << 16 | t[:, 7] << 24
        plo_b = jnp.broadcast_to(
            jnp.zeros(LANES, jnp.int32).at[:121].set(slo), (8, LANES))
        phi_b = jnp.broadcast_to(
            jnp.zeros(LANES, jnp.int32).at[:121].set(shi), (8, LANES))
    else:
        plo_b, phi_b = _PRIOR_LO_B, _PRIOR_HI_B
    tabs = [_FUSED, _Q11_LO, _Q11_HI, _Q5_LO, _Q5_HI, plo_b, phi_b]
    if blocked:
        NSUB = _pick_nsub(G, cap, stride)
        G_out = -(-G // NSUB)
        Gp = G_out * NSUB
        if Gp != G:
            d32 = jnp.concatenate(
                [d32, jnp.zeros((Gp - G, cap4, LANES), jnp.int32)], axis=0
            )
        d32 = d32.reshape(G_out, NSUB * cap4, LANES)
        kernel = _make_kernel_blocked(H, W, C, cap, cfg, NSUB, interpret,
                                      ablate, primed)
        LROWS = 32 + 3 * stride
        planes, err = pl.pallas_call(
            kernel,
            grid=(G_out, n_chunks),
            in_specs=[
                pl.BlockSpec((None, NSUB * cap4, LANES),
                             lambda g, c: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + [
                pl.BlockSpec((8, LANES), lambda g, c: (0, 0),
                             memory_space=pltpu.VMEM)
            ] * 7,
            out_specs=(
                pl.BlockSpec((None, SYMCHUNK * NSUB, LANES),
                             lambda g, c: (g, c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((None, NSUB, LANES), lambda g, c: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((G_out, n_sym_pad * NSUB, LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((G_out, NSUB, LANES), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((NSUB * NS4, LANES), jnp.int32),
                pltpu.VMEM((LROWS * NSUB, LANES), jnp.int32),
                pltpu.VMEM((2 * NSUB, LANES), jnp.int32),
                pltpu.SMEM((4 * NSUB, LANES), jnp.int32),
                pltpu.VMEM((2 * NSUB, LANES), jnp.int32),  # pending pairs
                pltpu.VMEM((24, LANES), jnp.int32),        # coder state
                pltpu.SemaphoreType.DMA,
            ],
            # the per-group model scratch alone is ~8.1 MB x NSUB; lift
            # Mosaic's default 16 MB scoped-vmem budget to the chip limit
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
            interpret=interpret,
        )(jnp.asarray(d32), *[jnp.asarray(t) for t in tabs])
        # de-interleave: planes row (sym*NSUB + g) -> [group, sym]
        planes = (
            planes.reshape(G_out, n_sym_pad, NSUB, LANES)
            .transpose(0, 2, 1, 3)
            .reshape(Gp, n_sym_pad, LANES)[:G]
        )
        err = jnp.broadcast_to(
            err.reshape(Gp, 1, LANES)[:G], (G, 8, LANES)
        )
        return planes, err

    kernel = _make_kernel(H, W, C, cap, cfg, interpret, ablate, primed)
    scratch = [
        pltpu.VMEM((NS4, LANES), jnp.int32),
        pltpu.VMEM((3 * stride, LANES), jnp.int32),
        pltpu.VMEM((2, LANES), jnp.int32),
        pltpu.SMEM((2, LANES), jnp.int32),
        pltpu.VMEM((8, LANES), jnp.int32),
        pltpu.VMEM((8, LANES), jnp.int32),
        pltpu.SemaphoreType.DMA,
    ]
    planes, err = pl.pallas_call(
        kernel,
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((None, cap // 4, LANES), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((8, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 7,
        out_specs=(
            pl.BlockSpec((None, SYMCHUNK, LANES), lambda g, c: (g, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, LANES), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, n_sym_pad, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, 8, LANES), jnp.int32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray(d32), *[jnp.asarray(t) for t in tabs])
    return planes, err
