"""Lockstep-vectorized carry-less range coder (JAX).

One *lane* is one independent llcomp stream (an image or a stripe of one).
All lanes march through the bit-serial coder together: each `lax.scan` step
codes exactly one binary decision per lane with pure element-wise vector ops.

Two properties of the reference coder (`llcomp.hpp:33-127`) make a fixed-shape
formulation possible:

* ``range >= 1`` always holds after a ``put``, so renormalization shifts at
  most **once** per decision (`llcomp.hpp:38-58`) — every scan step does
  bounded work;
* the carry chain is *lazy*: a shift either (a) flushes the pending byte plus a
  same-valued run, (b) defers by counting, or (c) just installs a pending byte.
  Instead of emitting a variable number of bytes per step (impossible with
  static shapes), each step emits one fixed-size **slot record**
  ``(emit?, carry?, head byte, run length)``; the byte stream is recovered
  afterwards by a trivially-vectorized run expansion (`expand_slots``).

``put_step`` here is the model-free primitive (probability supplied per
decision); the baseline encode pipeline in ``encode.py`` wraps it with the
adaptive-model gather/update in the scan carry.  Because the encode-side model
walk is fully determined by the (precomputable) decision stream, a later
optimization can hoist the model out of the hot scan entirely and feed
precomputed probabilities straight into ``put_step``.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Shift (renormalization) step — mirrors renorm_encoder at llcomp.hpp:38-58
# --------------------------------------------------------------------------


def shift_step(low, rng, pend, run, do):
    """One renorm shift per lane where ``do`` is set.

    Returns updated (low, range, pending, run) and the slot record
    (emit flag, carry flag, head byte, flushed run length).
    """
    first = pend < 0
    nocarry = low <= 0xFF00
    carry = low >= 0x10000
    emit = do & ~first & (nocarry | carry)
    defer = do & ~first & ~nocarry & ~carry

    head = jnp.where(carry, (pend + 1) & 0xFF, pend & 0xFF)
    out_run = run                                     # flushed alongside head

    pend2 = jnp.where(do & ~defer, (low >> 8) & 0xFF, pend)
    run2 = jnp.where(emit, 0, jnp.where(defer, run + 1, run))
    low2 = jnp.where(do, (low & 0xFF) << 8, low)
    rng2 = jnp.where(do, rng << 8, rng)
    return (low2, rng2, pend2, run2), (emit, carry, head, out_run)


def pack_slot(emit, carry, head, out_run):
    """Slot record -> (meta int32, run int32).  meta = emit | carry<<1 | head<<8."""
    meta = (
        emit.astype(jnp.int32)
        | (carry.astype(jnp.int32) << 1)
        | (head.astype(jnp.int32) << 8)
    )
    return meta, out_run.astype(jnp.int32)


# --------------------------------------------------------------------------
# Encoder scan: probabilities precomputed, carry = 4 scalars per lane
# --------------------------------------------------------------------------


def encoder_init(n_lanes: int):
    zeros = jnp.zeros((n_lanes,), jnp.int32)
    return (zeros, jnp.full((n_lanes,), 0xFF00, jnp.int32),
            jnp.full((n_lanes,), -1, jnp.int32), zeros)


def put_step(carry, xs):
    """Code one decision per lane.  xs = (prob [S], bit [S], valid [S])."""
    low, rng, pend, run = carry
    prob, bit, valid = xs
    range1 = (rng * prob) >> 8
    is1 = (bit == 1) & valid
    low = jnp.where(is1, low + rng - range1, low)
    rng = jnp.where(valid, jnp.where(is1, range1, rng - range1), rng)
    do = valid & (rng < 0x100)
    (low, rng, pend, run), slot = shift_step(low, rng, pend, run, do)
    return (low, rng, pend, run), pack_slot(*slot)


def finish_steps(carry):
    """The two forced flush shifts of ``finish()`` (`llcomp.hpp:75-81`).

    The byte left pending afterwards is dropped, exactly as the reference
    does — the decoder reads zeros past end-of-stream.
    """
    low, rng, pend, run = carry
    t = jnp.ones_like(low, dtype=bool)
    low = low + 0xFF
    (low, rng, pend, run), slot1 = shift_step(low, jnp.full_like(rng, 0xFF), pend, run, t)
    (low, rng, pend, run), slot2 = shift_step(low, jnp.full_like(rng, 0xFF), pend, run, t)
    m1 = pack_slot(*slot1)
    m2 = pack_slot(*slot2)
    return (jnp.stack([m1[0], m2[0]]), jnp.stack([m1[1], m2[1]]))


def finish_steps_grouped_off(fin: jnp.ndarray):
    """Final carries [G, 5, 1, 8, 128] (incl. byte offset) -> the two flush
    shifts' offset-packed records [G, 2, 8, 128] plus per-lane stream lengths
    [G, 1, 8, 128].  Twin of ``finish_steps_grouped`` for the offset-packed
    coder kernel (`llcomp.hpp:75-81`: two forced shifts, pending byte
    dropped)."""
    low, rng, pend, run, off = (fin[:, i] for i in range(5))
    t = jnp.ones_like(low, dtype=bool)
    low = low + 0xFF
    kps = []
    for _ in range(2):
        (low, rng, pend, run), (emit, cry, head, out_run) = shift_step(
            low, jnp.full_like(rng, 0xFF), pend, run, t
        )
        kps.append(jnp.where(
            emit,
            (off << 9) | (cry.astype(jnp.int32) << 8) | head,
            jnp.int32(0x7FFFFFFF),
        ))
        off = jnp.where(emit, off + 1 + out_run, off)
    return jnp.concatenate(kps, axis=1), off


# --------------------------------------------------------------------------
# Device-side slot expansion (sorts + associative scan; no scatters)
# --------------------------------------------------------------------------


def expand_kp_grouped(kp: jnp.ndarray, kp_fin: jnp.ndarray, outcap: int):
    """Offset-packed byte records -> byte buffers, one fused sandwich sort.

    kp [G, T, 8, 128] i32 = off<<9 | carry<<8 | head for emitting slots,
    INT32_MAX otherwise (offsets strictly increase per lane); kp_fin
    [G, 2, 8, 128] the finish-flush records.  Because the coder kernel
    already packed each record's output byte offset, compaction, position
    probing and merge collapse into ONE single-operand sort:

      key = (off*2)<<9 | carry<<8 | head   for an emitting slot
            (p*2+1)<<9                      for the probe at byte position p

    Live entries (emits <= outcap plus exactly outcap probes) sort to the
    front, so the forward-fill + probe-extract run on a 2*outcap prefix.
    Returns bytes [G, outcap, 8, 128] u8 (lengths come from the final
    carries, ``finish_steps_grouped_off``).
    """
    G = kp.shape[0]
    BIG = jnp.int32(0x7FFFFFFF)

    live = kp != BIG
    k_slots = jnp.where(live, ((kp >> 9) << 10) | (kp & 0x1FF), BIG)
    kf_live = kp_fin != BIG
    k_fin = jnp.where(kf_live, ((kp_fin >> 9) << 10) | (kp_fin & 0x1FF), BIG)
    probe = (
        jax.lax.broadcasted_iota(
            jnp.int32, (G, outcap, kp.shape[2], kp.shape[3]), 1
        ) * 2 + 1
    ) << 9
    keys = jnp.concatenate([k_slots, k_fin, probe], axis=1)
    (sk,) = jax.lax.sort((keys,), dimension=1, num_keys=1)
    sk = sk[:, : 2 * outcap]

    is_probe = ((sk >> 9) & 1) == 1
    # slot fill value: (off+1)<<9 | carry<<8 | head, 0 for probes/dead
    sv = jnp.where(
        is_probe | (sk == BIG), 0, (((sk >> 10) + 1) << 9) | (sk & 0x1FF)
    )
    # forward-fill the latest slot entry: offsets strictly increase per
    # lane, so live sv values are strictly increasing and "last nonzero"
    # is a running max — one fused cummax instead of a log-pass pad/where
    # sweep (each of whose ~14 passes round-trips the array through HBM)
    sv = jax.lax.cummax(sv, axis=1)

    pp = sk >> 10
    f_off = (sv >> 9) - 1
    f_head = sv & 0xFF
    f_fill = jnp.where((sv & 0x100) != 0, 0, 0xFF)
    byte = jnp.where(f_off == pp, f_head, f_fill)
    kb = jnp.where(is_probe, (pp << 8) | byte, BIG)
    (kb,) = jax.lax.sort((kb,), dimension=1, num_keys=1)
    return (kb[:, :outcap] & 0xFF).astype(jnp.uint8)



def expand_markers(mk: jnp.ndarray, outcap: int):
    """Compact byte markers -> byte buffers (fused-kernel post-pass).

    mk [A, N, M, 128] i32: ``off<<9 | carry<<8 | head`` per emitted byte,
    offsets strictly ascending per lane, DEAD (0x7FFFFFFF) tails — the
    fused encode kernel's marker buffer (pallas/encode_fused.py).  Same
    sandwich-sort + cummax forward-fill as ``expand_kp_grouped``, but the
    input is ALREADY compact per lane: the sort runs over M + outcap ≈
    2 x compressed size elements instead of the old chain's ~n_decisions.
    Returns bytes [A, N, outcap, 128] u8.
    """
    BIG = jnp.int32(0x7FFFFFFF)
    A, N, M = mk.shape[0], mk.shape[1], mk.shape[2]
    live = mk != BIG
    k_slots = jnp.where(live, ((mk >> 9) << 10) | (mk & 0x1FF), BIG)
    probe = (
        jax.lax.broadcasted_iota(jnp.int32, (A, N, outcap, 128), 2) * 2 + 1
    ) << 9
    keys = jnp.concatenate([k_slots, probe], axis=2)
    (sk,) = jax.lax.sort((keys,), dimension=2, num_keys=1)
    sk = sk[:, :, : 2 * outcap]

    is_probe = ((sk >> 9) & 1) == 1
    sv = jnp.where(
        is_probe | (sk == BIG), 0, (((sk >> 10) + 1) << 9) | (sk & 0x1FF)
    )
    sv = jax.lax.cummax(sv, axis=2)
    pp = sk >> 10
    f_off = (sv >> 9) - 1
    f_head = sv & 0xFF
    f_fill = jnp.where((sv & 0x100) != 0, 0, 0xFF)
    byte = jnp.where(f_off == pp, f_head, f_fill)
    kb = jnp.where(is_probe, (pp << 8) | byte, BIG)
    (kb,) = jax.lax.sort((kb,), dimension=2, num_keys=1)
    return (kb[:, :, :outcap] & 0xFF).astype(jnp.uint8)


# --------------------------------------------------------------------------
# Device-side slot expansion (lane-major variant)
# --------------------------------------------------------------------------


def expand_slots_on_device(meta: jnp.ndarray, runs: jnp.ndarray, outcap: int):
    """Lane-major slot records [S, T] -> (bytes [S, outcap] u8, lens [S]).

    Fully on-device: the slot arrays (which can be GBs) never leave HBM; only
    the final byte buffers transfer.  All data movement is expressed as
    ``lax.sort`` + an associative forward-fill (the target backend sorts 67M
    elements in ~0.4 ms while XLA scatter/gather of the same volume
    serializes to seconds):

      1. compact emitting slots to the front of each lane (sort by offset);
      2. sandwich-sort slot entries (even keys 2*offset) with one probe per
         output byte position (odd keys 2*p+1);
      3. associative forward-fill carries each probe the latest preceding
         slot's (head, fill, offset);
      4. byte = head if the probe sits exactly at the slot's offset, else the
         run-fill value; a final sort extracts probes in position order.
    """
    S, T = meta.shape
    BIG = jnp.int32(1 << 30)

    emit = (meta & 1) == 1
    length = jnp.where(emit, 1 + runs, 0)
    ends = jnp.cumsum(length, axis=1)
    offs = ends - length
    lens = ends[:, -1]

    # 1. compact emitting slots: offsets strictly increase per lane, so
    #    (offset << 9 | head | carry<<8) sorts by offset as ONE operand
    pay1 = ((meta >> 8) & 0xFF) | (meta & 2) << 7
    kp1 = jnp.where(emit, (offs << 9) | pay1, BIG)
    (kp1,) = jax.lax.sort((kp1,), dimension=1, num_keys=1)
    kp1 = kp1[:, :outcap]
    k1 = jnp.where(kp1 < BIG, kp1 >> 9, BIG)
    p1 = kp1 & 0x1FF

    # 2. sandwich with one probe per output position; payload packs
    #    (offset+1) << 9 | carry << 8 | head so everything rides one int32
    p = jax.lax.broadcasted_iota(jnp.int32, (1, outcap), 1)
    probe_k = jnp.broadcast_to(p * 2 + 1, (S, outcap))
    slot_k = jnp.where(k1 < BIG, k1 * 2, BIG)
    slot_v = jnp.where(k1 < BIG, ((k1 + 1) << 9) | p1, 0)
    keys = jnp.concatenate([slot_k, probe_k], axis=1)
    vals = jnp.concatenate([slot_v, jnp.zeros((S, outcap), jnp.int32)], axis=1)
    sk, sv = jax.lax.sort((keys, vals), dimension=1, num_keys=1)

    # 3. forward-fill the latest slot entry: slot offsets strictly increase
    #    per lane => live sv values strictly increase => running max
    sv = jax.lax.cummax(sv, axis=1)

    # 4. probe bytes, extracted in position order
    is_probe = (sk & 1) == 1
    pp = sk >> 1
    f_off = (sv >> 9) - 1
    f_head = sv & 0xFF
    f_fill = jnp.where((sv & 0x100) != 0, 0, 0xFF)
    byte = jnp.where(f_off == pp, f_head, f_fill)
    kb = jnp.where(is_probe, (pp << 8) | byte, BIG)
    (kb,) = jax.lax.sort((kb,), dimension=1, num_keys=1)
    return (kb[:, :outcap] & 0xFF).astype(jnp.uint8), lens


# --------------------------------------------------------------------------
# Host-side slot expansion (NumPy; vectorized run-length fill)
# --------------------------------------------------------------------------


def expand_slots_batch(
    meta: np.ndarray, runs: np.ndarray, lane_major: bool = False
) -> list[bytes]:
    """[T, S] slot records -> per-lane byte streams, one vectorized pass.

    Lane-major flattening keeps each lane's slots contiguous, so a single
    np.repeat over all lanes followed by head-byte placement reconstructs
    every stream; per-lane totals split the result.  Pass ``lane_major=True``
    when the arrays are already [S, T].
    """
    if lane_major:
        m = np.ascontiguousarray(meta)
        r = np.ascontiguousarray(runs)
    else:
        m = np.ascontiguousarray(meta.T)     # [S, T]
        r = np.ascontiguousarray(runs.T)
    sel = (m & 1) == 1
    lens_all = np.where(sel, 1 + r.astype(np.int64), 0)
    per_lane = lens_all.sum(axis=1)

    sel_f = sel.reshape(-1)
    heads = ((m.reshape(-1)[sel_f] >> 8) & 0xFF).astype(np.uint8)
    fills = np.where(m.reshape(-1)[sel_f] & 2, 0x00, 0xFF).astype(np.uint8)
    lens = lens_all.reshape(-1)[sel_f]

    out = np.repeat(fills, lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out[starts] = heads
    bounds = np.concatenate([[0], np.cumsum(per_lane)])
    return [out[bounds[s] : bounds[s + 1]].tobytes() for s in range(m.shape[0])]


def expand_slots(meta: np.ndarray, runs: np.ndarray) -> bytes:
    """[T] slot records of one lane -> the lane's byte stream.

    Each emitting slot contributes its head byte followed by ``run`` fill bytes
    (0xFF without carry, 0x00 with carry) — the same order the reference's
    renorm loop writes them.
    """
    sel = (meta & 1) == 1
    if not sel.any():
        return b""
    heads = ((meta[sel] >> 8) & 0xFF).astype(np.uint8)
    fills = np.where((meta[sel] & 2) != 0, 0x00, 0xFF).astype(np.uint8)
    lens = 1 + runs[sel].astype(np.int64)
    out = np.repeat(fills, lens)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    out[starts] = heads
    return out.tobytes()
