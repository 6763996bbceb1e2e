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
SYMCHUNK = 256        # symbols per grid step (multiple of 8)
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


def _make_kernel(H: int, W: int, C: int, cap: int, cfg: CodecConfig,
                 interpret: bool, ablate: str = ""):
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
            model_ref[:] = jnp.zeros((NS4, LANES), jnp.int32)
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
                         ablate: str = ""):
    """Hardware kernel, 8-symbol blocks (requires stride % 8 == 0, C <= 8).

    The ablation probe (tools/probe_decode_ablate.py) showed ~half the
    per-symbol cost is *fixed* overhead: six (1,128) dynamic neighbor line
    loads, per-symbol scalar index math and loop bookkeeping.  This variant
    amortizes all of it over 8-symbol blocks that never straddle a pixel
    row (stride % 8 == 0 guarantees that):

    * neighbor windows stage once per block as three dynamic row loads —
      cur (16,128) / up (24,128) / upup (8,128) — and every in-block read
      becomes a STATIC sublane slice; pixels decoded within the block are
      forwarded through registers instead of re-read from the ring;
    * the ring and the planes output are written once per block as aligned
      (8,128) tiles;
    * the model write-back is deferred one symbol and merged with the next
      symbol's stage-in, so each symbol runs ONE 128-lane staging loop with
      packed (2,128) row-pair accesses (write prev pair, read cur pair,
      read byte window) instead of separate in/out loops;
    * per-symbol scalar math on (h, w, offsets) reduces to a handful of
      block-level scalars plus static per-slot constants.

    The lines scratch is padded by 16 rows on both ends so window bases
    never need clamping (reads outside the current row are masked by the
    same edge predicates the reference uses).  Bitstream semantics are
    identical to ``_make_kernel`` (decoder loop `llcomp.hpp:486-545`).
    """
    stride = W * C
    n_sym = H * W * C
    nwords = cap // 4
    assert stride % 8 == 0 and C <= 8 and SYMCHUNK % 8 == 0
    LPAD = 16                       # lines base pad (window underruns)
    TRASH = NS4 - 2                 # model row pair never read by decode

    def kernel(data_ref, ftab, q11lo, q11hi, q5lo, q5hi,
               planes_ref, err_ref, model_ref, lines_ref, vscr_ref,
               sscr_ref, pend_ref, state_ref, dma_sem):
        chunk = pl.program_id(1)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (2, LANES), 1)
        ftab_v = ftab[:]
        q11lo_v = q11lo[:]
        q11hi_v = q11hi[:]
        q5lo_v = q5lo[:]
        q5hi_v = q5hi[:]

        @pl.when(chunk == 0)
        def _init():
            model_ref[:] = jnp.zeros((NS4, LANES), jnp.int32)
            lines_ref[:] = jnp.zeros((2 * LPAD + 3 * stride, LANES), jnp.int32)
            err_ref[:] = jnp.zeros((8, LANES), jnp.int32)
            pend_ref[:] = jnp.zeros((2, LANES), jnp.int32)
            w0 = data_ref[0:1, :]
            b0 = w0 & 0xFF
            b1 = (w0 >> 8) & 0xFF
            # rows of state_ref: 0=low 1=range 2=dpos
            state_ref[0:1, :] = (b0 << 8) | b1
            state_ref[1:2, :] = jnp.full((1, LANES), 0xFF00, jnp.int32)
            state_ref[2:3, :] = jnp.full((1, LANES), 2, jnp.int32)
            state_ref[3:8, :] = jnp.zeros((5, LANES), jnp.int32)
            # seed the deferred write-back: a zero pair aimed at the trash
            # row, and make the j=7 parity slot's base point there too
            vscr_ref[0:1, :] = jnp.full((1, LANES), TRASH, jnp.int32)
            vscr_ref[1:2, :] = jnp.zeros((1, LANES), jnp.int32)
            cp = pltpu.make_async_copy(vscr_ref, sscr_ref.at[pl.ds(2, 2)],
                                       dma_sem)
            cp.start()
            cp.wait()

        def decision(dstate):
            (wa, wb, low, rng, dpos, wbase, wind, phase, value, e, ectx,
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
            f = _lut(ftab_v, st8)
            prob = f & 0xFF
            range1 = (rng * prob) >> 8
            rng0 = rng - range1
            bit = (low >= rng0) & act
            low = jnp.where(bit, low - rng0, low)
            rng = jnp.where(act, jnp.where(bit, range1, rng0), rng)
            refl = act & (rng < 0x100)
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
            return (wa, wb, low, rng, dpos, wbase, wind, nphase, value,
                    e2, ectx, mrem, mctx, errv)

        zero1 = jnp.zeros((1, LANES), jnp.int32)
        one1 = jnp.ones((1, LANES), jnp.int32)
        zf1 = jnp.full((1, LANES), _ZF, jnp.int32)
        mctx1 = jnp.full((1, LANES), cfg.e_lim + 1, jnp.int32)

        def block_body(m, carry):
            low, rng, dpos, pa, pb, erracc = carry
            sym0 = chunk * SYMCHUNK + m * 8
            off0 = sym0 % stride
            h = sym0 // stride
            cur = LPAD + (h % 3) * stride
            up = LPAD + ((h + 2) % 3) * stride
            upup = LPAD + ((h + 1) % 3) * stride

            # ---- block neighbor windows (3 dynamic loads / 8 symbols) --
            cur_win = lines_ref[pl.ds(cur + off0 - 16, 16), :]
            up_win = lines_ref[pl.ds(up + off0 - 8, 24), :]
            upup_win = lines_ref[pl.ds(upup + off0, 8), :]
            h_pos = h > 0
            h_pos2 = h > 1

            recons = []
            for j in range(8):
                off_j = off0 + j
                w_pos = off_j >= C            # w > 0
                w_pos2 = off_j >= 2 * C       # w > 1
                w_last = off_j >= stride - C  # w == W-1

                l_raw = (recons[j - C] if j - C >= 0
                         else cur_win[16 + j - C: 17 + j - C, :])
                L_raw = (recons[j - 2 * C] if j - 2 * C >= 0
                         else cur_win[16 + j - 2 * C: 17 + j - 2 * C, :])
                up_x = up_win[8 + j: 9 + j, :]
                l_ = jnp.where(w_pos, l_raw,
                               jnp.where(h_pos, up_x, 128))
                t_ = jnp.where(h_pos, up_x, l_)
                L_ = jnp.where(w_pos2, L_raw, l_)
                tl = jnp.where(h_pos & w_pos,
                               up_win[8 + j - C: 9 + j - C, :], t_)
                tr = jnp.where(h_pos & ~w_last,
                               up_win[8 + j + C: 9 + j + C, :], t_)
                T_ = jnp.where(h_pos2, upup_win[j: j + 1, :], t_)

                if "nohash" in ablate:
                    # timing ablation only (bit-INEXACT)
                    hsh = l_ - l_
                    predict = t_ - t_
                else:
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
                base2 = jnp.where(neg, -hsh, hsh) * 2

                # ---- bridge scalars; parity slot is static (j & 1) -----
                w4 = jnp.clip(jax.lax.shift_right_logical(dpos, 2),
                              0, nwords - 8)
                slot = (j & 1) * 2
                pslot = ((j + 1) & 1) * 2
                if "nodma" not in ablate:
                    vscr_ref[0:1, :] = base2
                    vscr_ref[1:2, :] = w4
                    cp = pltpu.make_async_copy(
                        vscr_ref, sscr_ref.at[pl.ds(slot, 2)], dma_sem
                    )
                    cp.start()
                    cp.wait()

                # ---- ONE merged staging loop: write-back prev symbol's
                # pair, read this symbol's pair + byte window -------------
                pend = jnp.concatenate([pa, pb], axis=0)

                def stage(l, acc):
                    pair, wind = acc
                    rp = sscr_ref[pslot, l]
                    rc = sscr_ref[slot, l]
                    b = sscr_ref[slot + 1, l]
                    old = model_ref[pl.ds(rp, 2), :]
                    model_ref[pl.ds(rp, 2), :] = jnp.where(
                        lane2 == l, pend, old
                    )
                    pair = jnp.where(
                        lane2 == l, model_ref[pl.ds(rc, 2), :], pair
                    )
                    wind = jnp.where(lane8 == l, data_ref[pl.ds(b, 8), :],
                                     wind)
                    return pair, wind

                if "nostage" in ablate or "nodma" in ablate:
                    # timing ablation only (bit-INEXACT)
                    pair = jnp.zeros((2, LANES), jnp.int32)
                    wind = jnp.zeros((8, LANES), jnp.int32)
                else:
                    pair, wind = jax.lax.fori_loop(
                        0, LANES, stage,
                        (jnp.zeros((2, LANES), jnp.int32),
                         jnp.zeros((8, LANES), jnp.int32)),
                    )
                wa = pair[0:1, :]
                wb = pair[1:2, :]
                wbase = w4 * 4

                dstate = (
                    wa, wb, low, rng, dpos, wbase, wind,
                    zf1, zero1, zero1, one1, zero1, mctx1, zero1,
                )
                nsteps = 1 if "decis1" in ablate else cfg.max_bins_per_symbol
                for _d in range(nsteps):
                    dstate = decision(dstate)
                (pa, pb, low, rng, dpos, _wbase, _wind, phase, value,
                 _e, _ectx, _mrem, _mctx, errv) = dstate

                # sticky error: accumulate in a register, flush per chunk
                errv = errv | (phase != _DONE).astype(jnp.int32)
                erracc = jnp.where(sym0 + j < n_sym, erracc | errv, erracc)

                diff = jnp.where(neg, -value, value)
                recons.append(predict + diff)

            blk = jnp.concatenate(recons, axis=0)
            lines_ref[pl.ds(cur + off0, 8), :] = blk
            planes_ref[pl.ds(m * 8, 8), :] = blk
            return low, rng, dpos, pa, pb, erracc

        init = (state_ref[0:1, :], state_ref[1:2, :], state_ref[2:3, :],
                pend_ref[0:1, :], pend_ref[1:2, :], zero1)
        low, rng, dpos, pa, pb, erracc = jax.lax.fori_loop(
            0, SYMCHUNK // 8, block_body, init
        )
        state_ref[0:1, :] = low
        state_ref[1:2, :] = rng
        state_ref[2:3, :] = dpos
        pend_ref[0:1, :] = pa
        pend_ref[1:2, :] = pb
        err_ref[0:1, :] = err_ref[0:1, :] | erracc

    return kernel


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "cfg")
)
def decode_groups_images(data: jnp.ndarray, H: int, W: int, C: int,
                         cfg: CodecConfig = REV2):
    """Like decode_groups, but finishes on-device: un-permutes the planes,
    applies the inverse RCT and returns uint8 images [G*128, H, W, C] plus
    the per-lane error flags.  4x less device->host traffic than fetching
    the raw i32 planes (the tunnel link is the e2e decode bottleneck)."""
    from ..core import transform

    planes, err = decode_groups(data, H, W, C, cfg)
    G = data.shape[0]
    n_sym = H * W * C
    imgs = (
        planes[:, :n_sym, :]
        .transpose(0, 2, 1)
        .reshape(G * LANES, H, W, C)
    )
    return transform.rct_inverse(imgs), err[:, 0, :].reshape(G * LANES)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "C", "cfg")
)
def decode_groups(data: jnp.ndarray, H: int, W: int, C: int,
                  cfg: CodecConfig = REV2):
    """data [G, cap, 128] u8 (zero-padded, cap % 64 == 0) ->
    (planes [G, n_sym_pad, 128] i32, err [G, 8, 128] i32)."""
    return _decode_groups_impl(data, H, W, C, cfg, "")


def _decode_groups_impl(data, H, W, C, cfg, ablate):
    G, cap = data.shape[0], data.shape[1]
    n_sym = H * W * C
    n_chunks = -(-n_sym // SYMCHUNK)
    n_sym_pad = n_chunks * SYMCHUNK

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
    if blocked:
        kernel = _make_kernel_blocked(H, W, C, cap, cfg, ablate)
        scratch = [
            pltpu.VMEM((NS4, LANES), jnp.int32),
            pltpu.VMEM((32 + 3 * stride, LANES), jnp.int32),
            pltpu.VMEM((2, LANES), jnp.int32),
            pltpu.SMEM((4, LANES), jnp.int32),
            pltpu.VMEM((2, LANES), jnp.int32),     # pending model pair
            pltpu.VMEM((8, LANES), jnp.int32),     # coder state
            pltpu.SemaphoreType.DMA,
        ]
    else:
        kernel = _make_kernel(H, W, C, cap, cfg, interpret, ablate)
        scratch = [
            pltpu.VMEM((NS4, LANES), jnp.int32),
            pltpu.VMEM((3 * stride, LANES), jnp.int32),
            pltpu.VMEM((2, LANES), jnp.int32),
            pltpu.SMEM((2, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.VMEM((8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ]
    tabs = [_FUSED, _Q11_LO, _Q11_HI, _Q5_LO, _Q5_HI]
    planes, err = pl.pallas_call(
        kernel,
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((None, cap // 4, LANES), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((8, LANES), lambda g, c: (0, 0),
                         memory_space=pltpu.VMEM)
        ] * 5,
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
