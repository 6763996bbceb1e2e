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


def _lut(table_block, idx):
    """Per-element 128-entry table lookup: gather along lanes, same shapes."""
    return jnp.take_along_axis(table_block, idx, axis=1)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


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
