"""Batched lane-parallel encoder (JAX).

The central idea on every path is **model-free encode**: the encoder's
adaptive model walk is fully determined by the decision stream, which is
computable in advance, so sorting each lane's decisions by context turns the
63 KB/lane model into a one-byte-per-lane carry (reset at context-run
starts).  Probabilities then return to stream order and the range-coder scan
carries just four scalars per lane.  The reference semantics mirrored here:
encode loop `llcomp.hpp:390-449`, model addressing `llcomp.hpp:440-441`,
probability/update protocol `llcomp.hpp:439-444`.

Two engines share that structure:

* **Pallas** (default on TPU): a chain of modest jits in kernel group layout
  [G, T, 8, 128] end to end — host-side lane grouping, symbol-axis
  precompute, a stream-builder kernel (K ∈ {8,16,24} slots/symbol bucket), a
  packed 2-operand context sort that doubles as compaction, the fused
  state-walk and range-coder kernels, on-device byte expansion, and an
  occupied-prefix-only transfer.  Every permutation is a ``lax.sort`` (this
  backend serializes per-element scatter/gather; multi-operand sorts and
  monolithic programs break its remote compiler — docs/DESIGN.md).
  ``encode_lanes_pipelined`` overlaps several batches' chains.

* **XLA** (CPU / fallback, shard_map-able for the mesh path): the same
  model-free structure with lax.scans; also the reference-style
  model-in-scan variant ``_pipeline_impl_modelscan`` for cross-checking.
"""
from __future__ import annotations

import functools
import os

import numpy as np

import jax

from . import _env  # noqa: F401  (axon env repair: persistent cache)
import jax.numpy as jnp

from . import coder, profiling
from .core import tables, transform
from .core.config import REV2, CodecConfig


def _bucket(n: int, quantum: int = 8192) -> int:
    """Round a scan length up to a bucket to bound jit recompiles."""
    return max(quantum, -(-n // quantum) * quantum)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _count(imgs: jnp.ndarray, cfg: CodecConfig = REV2) -> jnp.ndarray:
    v = transform.rct_forward(imgs)
    _, diff = transform.context_and_residual(v, cfg)
    return transform.count_bins(diff.reshape(diff.shape[0], -1))


def _compact_decisions(imgs: jnp.ndarray, cap: int, cfg: CodecConfig):
    """[S, H, W, C] -> per-lane front-packed decisions [S, cap] (cidx*2+bit, -1 pad).

    All flat 1-D scatters with absolute offsets: 2-D batched gathers take
    minutes to compile on the target backend (docs/DESIGN.md).
    """
    S = imgs.shape[0]
    v = transform.rct_forward(imgs)
    hash_, diff = transform.context_and_residual(v, cfg)
    ctx, bit, valid, _ = transform.binarize(diff.reshape(S, -1), cfg)

    cidx = hash_.reshape(S, -1, 1) * cfg.substates + ctx
    packed = (cidx << 1) | bit
    flatp = packed.reshape(-1)
    flatv = valid.reshape(S, -1)
    pos = jnp.cumsum(flatv.astype(jnp.int32), axis=1) - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, flatv.shape, 0)
    dst = jnp.where(flatv, lane * cap + pos, S * cap).reshape(-1)
    return (
        jnp.full((S * cap,), -1, jnp.int32)
        .at[dst].set(flatp, mode="drop")
        .reshape(S, cap)
    )


def _probability_prepass(compact: jnp.ndarray, cfg: CodecConfig,
                         primed: bool = False, rstmap=None):
    """Per-decision coding probabilities without materializing the model.

    For each lane: stable-sort decisions by context index (padding sorts
    last), walk the 128-state machine through each context's bit run with a
    one-byte carry (segment boundaries reset to state 0 — fresh context —
    or, when ``primed``, to the substate's prior tables.PRIOR_SUB), then
    scatter the probabilities back to stream order.
    """
    S, cap = compact.shape
    flat = compact.reshape(-1)
    lane_off = (jnp.arange(S) * cap)[:, None]

    key = jnp.where(compact >= 0, compact >> 1, jnp.int32(1 << 22))
    order = jnp.argsort(key, axis=1, stable=True)            # [S, cap]
    sortedp = flat[(lane_off + order).reshape(-1)].reshape(S, cap)

    skey = jnp.where(sortedp >= 0, sortedp >> 1, -1)
    sbit = (sortedp & 1).astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.full((S, 1), -2, jnp.int32), skey[:, :-1]], axis=1
    )
    seg_start = skey != prev
    if rstmap is not None:  # stored-seed reset map (container flag bit 1)
        rst = jnp.asarray(rstmap)[jnp.clip(skey, 0, cfg.num_states - 1)]
    elif primed:
        rst = jnp.asarray(tables.prior_full(cfg.num_states, cfg.substates))[
            jnp.clip(skey, 0, cfg.num_states - 1)
        ]
    else:
        rst = jnp.zeros(skey.shape, jnp.uint8)

    def walk(state, xs):
        b, ss, r = xs
        st = jnp.where(ss, r.astype(jnp.int32), state.astype(jnp.int32))
        p = transform.STATE_PROB[st]
        ns = transform.NEXT_STATE[st * 2 + b].astype(jnp.uint8)
        return ns, p.astype(jnp.uint8)

    _, probs_sorted = jax.lax.scan(
        walk, jnp.zeros((S,), jnp.uint8), (sbit.T, seg_start.T, rst.T)
    )                                                        # [cap, S]

    # un-permute: probs[lane, order[lane, j]] = probs_sorted[j, lane]
    probs = (
        jnp.zeros((S * cap,), jnp.uint8)
        .at[(lane_off + order).reshape(-1)]
        .set(probs_sorted.T.reshape(-1))
        .reshape(S, cap)
    )
    return probs


def _pipeline_impl(imgs: jnp.ndarray, cap: int, cfg: CodecConfig = REV2,
                   primed: bool = False, rstmap=None):
    """Full model-free encode; ``cap`` = static scan length (bucketed).

    Pure function (unjitted) so ``parallel`` can wrap it in shard_map with
    per-device lane blocks; ``_pipeline`` below is the jitted single-device
    entry point.  ``rstmap`` (optional [num_states] u8) overrides the
    context-reset states (stored-seed containers, flag bit 1).
    """
    S = imgs.shape[0]
    compact = _compact_decisions(imgs, cap, cfg)
    probs = _probability_prepass(compact, cfg, primed, rstmap)

    def step(cod, xs):
        p, prob = xs
        valid_s = p >= 0
        return coder.put_step(cod, (prob.astype(jnp.int32), p & 1, valid_s))

    cod, (meta, runs) = jax.lax.scan(
        step, coder.encoder_init(S), (compact.T, probs.T)
    )
    fmeta, fruns = coder.finish_steps(cod)
    meta = jnp.concatenate([meta, fmeta])
    runs = jnp.concatenate([runs, fruns])
    return meta, runs


def _pipeline_impl_modelscan(imgs: jnp.ndarray, cap: int,
                             cfg: CodecConfig = REV2, primed: bool = False):
    """Cross-check variant: adaptive model carried through the scan."""
    S = imgs.shape[0]
    compact = _compact_decisions(imgs, cap, cfg)

    NS = cfg.num_states
    if primed:                                           # +1 trash slot/lane
        row = np.concatenate([
            tables.prior_full(NS, cfg.substates),
            np.zeros((1,), np.uint8),
        ])
        states0 = jnp.asarray(np.tile(row, S))
    else:
        states0 = jnp.zeros((S * (NS + 1),), jnp.uint8)
    lane_base = jnp.arange(S) * (NS + 1)

    def step(carry, xs):
        states, cod = carry
        p = xs
        valid_s = p >= 0
        ci = lane_base + jnp.where(valid_s, p >> 1, NS)
        b = p & 1
        st = jnp.minimum(states[ci].astype(jnp.int32), 127)
        prob = transform.STATE_PROB[st]
        cod, slot = coder.put_step(cod, (prob, b, valid_s))
        ns = transform.NEXT_STATE[st * 2 + b].astype(jnp.uint8)
        states = states.at[ci].set(ns)
        return (states, cod), slot

    cod0 = coder.encoder_init(S)
    (_, cod), (meta, runs) = jax.lax.scan(step, (states0, cod0), compact.T)
    fmeta, fruns = coder.finish_steps(cod)
    meta = jnp.concatenate([meta, fmeta])
    runs = jnp.concatenate([runs, fruns])
    return meta, runs


# --- Pallas path as a chain of small jits ---------------------------------
# A monolithic program OOM-kills this backend's remote compile helper, so the
# pipeline is a chain of modest jits with device arrays flowing between them.
# Everything stays in kernel group layout [G, T, 8, 128] end to end — the
# [Sp, T] <-> grouped transposes otherwise move GBs per batch — and every
# permutation is a packed 2-operand lax.sort (scatter/gather serialize on
# this backend; multi-operand sorts blow up its compiler).

_BIG = jnp.int32(1 << 22)


@functools.partial(jax.jit, static_argnames=("H", "W", "C", "cfg"))
def _stage_precompute_g(imgs_g, H: int, W: int, C: int,
                        cfg: CodecConfig = REV2):
    """Grouped images [G, n_sym_pad, 8, 128] u8 -> folded (hash, diff), same layout.

    All neighbor fetches are static shifts along the symbol axis (symbol
    index = (h*W + w)*C + i), avoiding the device-side lane relayout that a
    [S, n_sym] -> group transpose costs (~1s/GB on this backend; the host
    pre-groups the tiny uint8 input instead).  Semantics: oracle.neighbors /
    context_and_residual.
    """
    n_sym = H * W * C
    stride = W * C
    v0 = imgs_g.astype(jnp.int32)

    if C >= 3:
        r = v0[:, 0::C] - v0[:, 1::C]
        b = v0[:, 2::C] - v0[:, 1::C]
        g = v0[:, 1::C] + transform.trunc_div4(b + r)
        v = _apply_rct(v0, r, g, b, C)
    else:
        v = v0

    sym = jax.lax.broadcasted_iota(jnp.int32, (1, v.shape[1], 1, 1), 1)
    w_idx = (sym // C) % W
    h_idx = sym // stride

    def shift(a, n):
        """a[..., s-n, ...] with zeros shifted in (masked by position checks)."""
        if n == 0:
            return a
        return jnp.pad(a, ((0, 0), (n, 0), (0, 0), (0, 0)))[:, : a.shape[1]]

    first = (w_idx == 0) & (h_idx == 0)
    l = jnp.where(w_idx > 0, shift(v, C), jnp.where(~first, shift(v, stride), 128))
    t = jnp.where(h_idx > 0, shift(v, stride), l)
    L = jnp.where(w_idx > 1, shift(v, 2 * C), l)
    tl = jnp.where((h_idx > 0) & (w_idx > 0), shift(v, stride + C), t)
    trr = jnp.pad(v, ((0, 0), (0, C), (0, 0), (0, 0)))[:, C:]
    tr = jnp.where((h_idx > 0) & (w_idx < W - 1), shift(trr, stride), t)
    T = jnp.where(h_idx > 1, shift(v, 2 * stride), t)

    h = (transform._quant11(l - tl) + transform._quant11(tl - t) * 11
         + transform._quant11(t - tr) * 121)
    if cfg.large_model:
        h = h + transform._quant5(L - l) * 605 + transform._quant5(T - t) * 3025
    predict = jnp.clip(l + t - tl, jnp.minimum(l, t), jnp.maximum(l, t))
    diff = v - predict
    neg = h < 0
    h = jnp.where(neg, -h, h)
    diff = jnp.where(neg, -diff, diff)
    # zero out the symbol padding (beyond n_sym): one decision each
    pad_mask = sym >= n_sym
    h = jnp.where(pad_mask, 0, h)
    diff = jnp.where(pad_mask, 0, diff)
    # decision-count reductions fused here: they read `diff` while it is
    # still hot instead of re-streaming it from HBM in a separate program
    ad = jnp.abs(diff)
    e = transform.ilog2(jnp.maximum(ad, 1), max_bits=12)
    nb = jnp.where(ad != 0, 2 * e + 3, 1)
    counts = (
        jnp.max(jnp.sum(nb, axis=1)),
        jnp.max(nb),
        jnp.max(jnp.sum((nb + 3) >> 2, axis=1)),
    )
    return h, diff, counts


def _apply_rct(v0, r, g, b, C):
    """Scatter the transformed first three channels back into the plane."""
    n = v0.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1) % C
    rs = jnp.repeat(r, C, axis=1)[:, :n]
    gs = jnp.repeat(g, C, axis=1)[:, :n]
    bs = jnp.repeat(b, C, axis=1)[:, :n]
    out = jnp.where(idx == 0, rs, v0)
    out = jnp.where(idx == 1, gs, out)
    out = jnp.where(idx == 2, bs, out)
    return out


@jax.jit
def _stage_count(diff_g):
    """Decision totals from the already-computed residuals (no re-transform).

    Returns (max total decisions per lane, max decisions per symbol, max
    total decision QUADS per lane — each symbol contributes ceil(nb/4)
    four-slot records to the packed compacting sort); lane and symbol
    padding contribute one decision each (zero residual), which only rounds
    the buckets up slightly.
    """
    ad = jnp.abs(diff_g)
    e = transform.ilog2(jnp.maximum(ad, 1), max_bits=12)
    nb = jnp.where(ad != 0, 2 * e + 3, 1)
    per_lane = jnp.sum(nb, axis=1)          # [G, 8, 128]
    per_lane_q = jnp.sum((nb + 3) >> 2, axis=1)
    return jnp.max(per_lane), jnp.max(nb), jnp.max(per_lane_q)


@jax.jit
def _stage_fwd_sort(stream_g):
    """Group stream -> context-sorted (key, bit<<20|pos) along axis 1.

    Packs (context, bit, position) into ONE int64 key — 38 bits — so a
    single-operand *unstable* sort replaces the stable two-operand one
    (measured ~25% faster on this backend; the explicit position bits make
    stability unnecessary).  Padding entries sort last either way; their
    payload ordering differs from the stable formulation but is fully
    masked downstream (key == BIG).
    """
    with jax.enable_x64(True):
        key64 = jnp.where(
            stream_g >= 0, (stream_g >> 1).astype(jnp.int64),
            jnp.int64(1) << 40,
        )
        pos = jax.lax.broadcasted_iota(jnp.int64, stream_g.shape, 1)
        bit = (stream_g & 1).astype(jnp.int64)
        # bit sits BELOW position so ordering is purely (context, position)
        packed = (key64 << 21) | (pos << 1) | bit
        (s,) = jax.lax.sort((packed,), dimension=1, is_stable=False, num_keys=1)
        skey = jnp.where(
            (s >> 21) >= (1 << 20), _BIG, (s >> 21).astype(jnp.int32)
        )
        spay = (
            ((s & 1) << 20) | ((s >> 1) & ((1 << 20) - 1))
        ).astype(jnp.int32)
    return skey, spay


@functools.partial(jax.jit, static_argnames=("n_sym",))
def _stage_sym_sort(hash_g, diff_g, n_sym: int):
    """Symbol-granular context sort (docs/DESIGN.md): sort *symbols* by
    (hash, position) — n_sym elements/lane instead of n_sym*K decision
    slots.  Returns the walk kernel's input (bucket << 14 | live << 13 |
    seg << 12 | diff+1274) plus the sorted original symbol positions as
    their own i32 array, so the walk kernel never carries position bits and
    the stream budget is set by the i64 quad key alone (2^25 positions, not
    2^17).  ``bucket`` = hash % 121 selects the primed-mode reset row
    (tables.PRIOR_TAB); unprimed walks ignore it.

    Key layout (55 bits): hash[13] | sympos[30] | diff+1274[12]; symbol
    padding gets hash 0x1FFF so it sorts after every real context run.
    """
    with jax.enable_x64(True):
        sym = jax.lax.broadcasted_iota(jnp.int64, hash_g.shape, 1)
        live = sym < n_sym
        h64 = jnp.where(live, hash_g.astype(jnp.int64), jnp.int64(0x1FFF))
        packed = (h64 << 42) | (sym << 12) | (diff_g + 1274).astype(jnp.int64)
        (s,) = jax.lax.sort((packed,), dimension=1, is_stable=False, num_keys=1)
        h_s = (s >> 42).astype(jnp.int32)
        origsym = ((s >> 12) & ((jnp.int64(1) << 30) - 1)).astype(jnp.int32)
        d12 = (s & 0xFFF).astype(jnp.int32)
    prev = jnp.concatenate(
        [jnp.full_like(h_s[:, :1], -2), h_s[:, :-1]], axis=1
    )
    seg = (h_s != prev).astype(jnp.int32)
    live_s = (h_s != 0x1FFF).astype(jnp.int32)
    bucket = h_s % np.int32(tables.PRIOR_BUCKETS)
    return (bucket << 14) | (live_s << 13) | (seg << 12) | d12, origsym


@functools.partial(jax.jit, static_argnames=("K", "Tq"))
def _stage_compact(kplo, kphi, origsym, K: int, Tq: int):
    """Pair-packed walk records -> compacted stream-order coder input.

    kplo/kphi [G, n_pad*K/4, 8, 128]: quad q's first pair (rec_{4q+1}<<10 |
    rec_{4q}) and second pair (rec_{4q+3}<<10 | rec_{4q+2}) in context-sorted
    symbol order (rec = valid<<9|bit<<8|prob, invalid 0) — two contiguous
    arrays, NOT interleaved, because stride-2 slices of a ~0.5 GB array are
    device relayouts (~1 s/GB here); origsym the sorted symbols' original
    stream positions.  A symbol's valid slots are a prefix of its K-slot
    block and K % 4 == 0, so each aligned quad shares validity with its
    first record: packing a quad and its stream position into ONE i64
    (slotquad << 40 | rec4..rec1) quarters the compacting un-permute sort's
    element count.  slotquad gets 23 bits — the position budget is 2^25
    decision slots per lane (the old in-kernel i32 packing capped it at
    2^20).  The ascending sort restores stream order AND front-packs the
    live quads; records unpack straight into the coder xs format
    (prob | bit<<8 | valid<<9), dead records 0.
    """
    G = kplo.shape[0]
    n_pad = origsym.shape[1]
    QS = K // 4                        # quads per symbol
    lo = kplo.reshape(G, n_pad, QS, kplo.shape[2], kplo.shape[3])
    hi = kphi.reshape(G, n_pad, QS, kphi.shape[2], kphi.shape[3])
    live = (lo & (1 << 9)) != 0
    with jax.enable_x64(True):
        quad_i = jax.lax.broadcasted_iota(jnp.int64, lo.shape, 2)
        slotquad = origsym[:, :, None].astype(jnp.int64) * QS + quad_i
        kq = (
            (slotquad << 40)
            | (hi.astype(jnp.int64) << 20)
            | lo.astype(jnp.int64)
        )
        kq = jnp.where(live, kq, jnp.int64(0x7FFFFFFFFFFFFFFF))
        kq = kq.reshape(G, n_pad * QS, kplo.shape[2], kplo.shape[3])
        (s,) = jax.lax.sort((kq,), dimension=1, is_stable=False, num_keys=1)
        # live quads are front-packed: unpack only the Tq-quad prefix the
        # coder will consume (the full-T unpack dominated HBM at large T)
        s = s[:, :Tq]
        dead = s == jnp.int64(0x7FFFFFFFFFFFFFFF)
        # pair-packed payload halves for the quad coder kernel: no 4-way
        # stack/reshape interleave (an HBM relayout of the whole coder
        # input), and the kernel reads half the bytes per decision
        qlo = jnp.where(dead, 0, s & 0xFFFFF).astype(jnp.int32)
        qhi = jnp.where(dead, 0, (s >> 20) & 0xFFFFF).astype(jnp.int32)
    return qlo, qhi


@jax.jit
def _stage_walk_xs(skey, spay):
    prev = jnp.concatenate(
        [jnp.full_like(skey[:, :1], -2), skey[:, :-1]], axis=1
    )
    seg = (skey != prev).astype(jnp.int32)
    return ((spay >> 20) & 1) | (seg << 1)


@jax.jit
def _stage_back_sort(skey, spay, probs_g):
    """Sorted probs -> compacted stream-order coder input [G, Tc, 8, 128].

    (position << 9 | bit << 8 | prob) fits 29 bits, so the un-permute is a
    single-operand sort (positions are unique per lane).
    """
    valid = skey < _BIG
    pos = spay & 0xFFFFF
    pay2 = (probs_g & 0xFF) | (((spay >> 20) & 1) << 8)
    kp = jnp.where(valid, (pos << 9) | pay2, jnp.int32(1 << 30))
    (kp,) = jax.lax.sort((kp,), dimension=1, is_stable=False, num_keys=1)
    return jnp.where(kp < (1 << 30), (kp & 0x1FF) | (1 << 9), 0)


@jax.jit
def _stage_finish(fin):
    """Final coder carries -> the two flush records + per-lane lengths.

    Split from the byte expansion so the (tiny) lengths can be synced
    FIRST and the expansion compiled at the actual max length instead of
    the raw*1.5 worst-case bound — the expansion's probe count, fill sweep
    and extract sort all scale with that cap (~3x smaller on photo data).
    """
    G = fin.shape[0]
    return coder.finish_steps_grouped_off(fin.reshape(G, 5, 1, 8, 128))


@functools.partial(jax.jit, static_argnames=("outcap",))
def _stage_expand_only(kp_g, kp_fin, outcap: int):
    """Offset-packed byte records + flush records -> byte buffers."""
    return coder.expand_kp_grouped(kp_g, kp_fin, outcap)


def _flat_host(imgs: np.ndarray) -> np.ndarray:
    """[S, h, W, C] u8 -> padded [Sp, n_pad] u8 (one contiguous memcpy)."""
    import math

    from .pallas import encode_kernels as pk

    S = imgs.shape[0]
    C = imgs.shape[-1]
    n_sym = int(np.prod(imgs.shape[1:]))
    # 128 keeps n_pad*K % TCHUNK == 0 for every K % 4 == 0 slot bucket
    quantum = math.lcm(2 * pk.SCHUNK, 128, C)
    n_pad = -(-n_sym // quantum) * quantum
    Sp = -(-S // pk.GROUP) * pk.GROUP
    buf = np.zeros((Sp, n_pad), dtype=np.uint8)
    buf[:S, :n_sym] = imgs.reshape(S, n_sym)
    return buf


@jax.jit
def _regroup_device(flat: jnp.ndarray) -> jnp.ndarray:
    """[Sp, n_pad] u8 -> kernel group layout [G, n_pad, 8, 128] u8.

    Relayouts run at ~1 s/GB on-device (~13 ms/batch); doing the lane
    grouping there instead of a strided host transpose saves ~65 ms of
    host-thread time per batch (tools/probe_group.py) — host time is the
    pipelined path's critical resource.
    """
    from .pallas import encode_kernels as pk

    Sp, n_pad = flat.shape
    G = Sp // pk.GROUP
    return flat.reshape(G, pk.SUBS, pk.LANES, n_pad).transpose(0, 3, 1, 2)


def _group_host(imgs: np.ndarray) -> np.ndarray:
    """[S, h, W, C] u8 -> [G, n_pad, 8, 128] u8 (host-side reference layout;
    the production path uploads ``_flat_host`` and regroups on-device)."""
    from .pallas import encode_kernels as pk

    buf = _flat_host(imgs)
    Sp, n_pad = buf.shape
    return np.ascontiguousarray(
        buf.reshape(Sp // pk.GROUP, pk.SUBS, pk.LANES, n_pad).transpose(
            0, 3, 1, 2
        )
    )


# Speculative (K, Tc) per lane-geometry: within a corpus, consecutive batches
# have similar statistics, so reusing the previous batch's buckets removes the
# mid-pipeline host sync on the decision counts; the launch returns the count
# futures so the caller can verify asynchronously and re-encode on a miss.
_spec_buckets: dict = {}


def _launch_stage_counts(imgs: np.ndarray, cfg: CodecConfig = REV2):
    """Phase A of the device chain: upload, precompute and *dispatch* the
    decision counts without syncing on them.  Returns an opaque context for
    ``_launch_stage_rest``; keeping the count sync out of this phase lets a
    multi-batch caller overlap every batch's count latency with the next
    batch's host grouping + upload."""
    H, W, C = imgs.shape[1], imgs.shape[2], imgs.shape[3]
    imgs_g = _regroup_device(
        profiling.timed("encode/upload", jax.device_put, _flat_host(imgs))
    )
    hash_g, diff_g, counts = profiling.timed(
        "encode/precompute", _stage_precompute_g, imgs_g, H, W, C, cfg
    )
    return (imgs, hash_g, diff_g, counts, cfg)


def _pipeline_pallas_launch(imgs: np.ndarray, outcap: int,
                            cfg: CodecConfig = REV2, speculate: bool = True,
                            primed: bool = False, seed=None):
    """Launch the device chain; returns (bytes, lens, check) where ``check()``
    returns True iff the speculated buckets covered this batch (always True
    when not speculating)."""
    return _launch_stage_rest(
        _launch_stage_counts(imgs, cfg), outcap, speculate, primed, seed
    )


def _launch_stage_rest(ctx, outcap: int, speculate: bool = True,
                       primed: bool = False, seed=None):
    from .pallas import encode_kernels as pk

    imgs, hash_g, diff_g, (total_max, sym_max, quad_max), cfg = ctx
    H, W, C = imgs.shape[1], imgs.shape[2], imgs.shape[3]
    n_sym = H * W * C
    geom = (H, W, C, imgs.shape[0])

    # the stream-granular walk variant has no substate information at reset
    # time, so primed/seeded encodes always take the symbol-granular chain
    symbol_variant = (
        os.environ.get("LLCT_ENCODE_VARIANT", "symbol") == "symbol"
    ) or primed or seed is not None
    spec = _spec_buckets.get(geom) if speculate else None
    if spec is None:
        sm = int(sym_max)
        if symbol_variant:
            # quad-packed compact sort only needs K % 4 == 0: finer buckets
            # shrink the walk + compact sort when sm lands between 8/16/24
            K = min(24, max(4, -(-sm // 4) * 4))
        else:
            K = 8 if sm <= 8 else (16 if sm <= 16 else 24)
        Tc_req = _bucket(int(total_max), quantum=8192)
        Tq_req = _bucket(int(quad_max), quantum=2048)
    else:
        K, Tc_req, Tq_req = spec

    T = hash_g.shape[1] * K
    assert T < (1 << 25), "stripe too large for the packed-sort pallas path"
    assert _outcap(n_sym) < (1 << 21), "stripe too large for byte expansion"
    Tc = min(T, Tc_req)

    if symbol_variant:
        # symbol-granular context sort: n_sym i64 elements/lane instead of
        # n_sym*K; the walk kernel regenerates decisions and emits the
        # compacting back sort's operand directly (docs/DESIGN.md)
        xs_sym, origsym = profiling.timed(
            "encode/sym_sort", _stage_sym_sort, hash_g, diff_g, n_sym
        )
        kplo, kphi = profiling.timed("encode/walk", pk.walk_symbols, xs_sym,
                                     K, primed or seed is not None, seed)
        qlo, qhi = profiling.timed(
            "encode/compact_sort", _stage_compact, kplo, kphi, origsym, K,
            min(T, Tq_req * 4) // 4
        )
        kp_g, fin = profiling.timed("encode/coder", pk.coder_scan_off_q,
                                    qlo, qhi)
    else:
        stream_g = pk.build_stream(hash_g, diff_g, n_sym, K)
        skey, spay = _stage_fwd_sort(stream_g)
        skey, spay = skey[:, :Tc], spay[:, :Tc]
        probs_g = pk.walk_probs(_stage_walk_xs(skey, spay))
        coder_xs = _stage_back_sort(skey, spay, probs_g)
        kp_g, fin = profiling.timed("encode/coder", pk.coder_scan_off,
                                    coder_xs)
    kp_fin, lens = profiling.timed("encode/finish", _stage_finish, fin)

    def check() -> bool:
        sm = int(sym_max)
        tm = int(total_max)
        qm = int(quad_max)
        if symbol_variant:
            kk = min(24, max(4, -(-sm // 4) * 4))
        else:
            kk = 8 if sm <= 8 else (16 if sm <= 16 else 24)
        _spec_buckets[geom] = (
            kk,
            max(_bucket(tm, quantum=8192), Tc_req),
            max(_bucket(qm, quantum=2048), Tq_req),
        )
        return (
            kk <= K
            and min(T, _bucket(tm, quantum=8192)) <= Tc
            and _bucket(qm, quantum=2048) <= Tq_req
        )

    return kp_g, kp_fin, lens, check


def _collect_bytes(kp_g, kp_fin, lens, outcap: int):
    """Sync lengths, expand at the actual cap, start the D2H copy.

    Returns (device byte buffer [G, cap2, 8, 128], lens np [S_padded]).
    The expansion of this batch overlaps later batches' device chains in
    the pipelined path because it is dispatched only here, after the
    (tiny) length sync.
    """
    lens_np = np.asarray(lens).reshape(-1)
    maxlen = int(lens_np.max(initial=1))
    if maxlen > outcap:  # cannot happen for the rev-2 coder
        raise AssertionError(f"stream overflow: {maxlen} > bound {outcap}")
    cap2 = min(outcap, max(1024, -(-maxlen // 1024) * 1024))
    byts = profiling.timed(
        "encode/byte_expand", _stage_expand_only, kp_g, kp_fin, cap2
    )
    byts.copy_to_host_async()
    return byts, lens_np


def _pipeline_pallas_bytes(imgs: np.ndarray, outcap: int,
                           cfg: CodecConfig = REV2, primed: bool = False,
                           seed=None):
    """Pallas encode to per-lane byte buffers on device.

    Slot records (GBs for big batches) never leave HBM; only the compacted
    byte buffers and per-lane lengths transfer to the host.  Returns
    (bytes [G, cap2, 8, 128] u8 device buffer, lens np [S_padded]).
    """
    kp_g, kp_fin, lens, check = _pipeline_pallas_launch(
        imgs, outcap, cfg, speculate=False, primed=primed, seed=seed
    )
    check()  # record buckets for future speculative launches
    return _collect_bytes(kp_g, kp_fin, lens, outcap)


_pipeline = jax.jit(_pipeline_impl, static_argnames=("cap", "cfg", "primed"))
_pipeline_modelscan = jax.jit(
    _pipeline_impl_modelscan, static_argnames=("cap", "cfg", "primed")
)


# --- Fused stream-order engine (round 4) -----------------------------------
# One Pallas kernel holds the model + range coder in VMEM and emits compact
# byte markers per lane (pallas/encode_fused.py) — no context sorts, no
# walk, no compact sort; the post-pass is a small sandwich expansion over
# ~2x the compressed size.  Bytes are engine-identical to every other path.


class FusedOverflow(RuntimeError):
    """A lane emitted more bytes than the marker buffer holds (only
    incompressible/adversarial content); the caller re-encodes through
    the sort chain."""


@functools.partial(jax.jit, static_argnames=("nsub",))
def _regroup_device_nsub(flat: jnp.ndarray, nsub: int) -> jnp.ndarray:
    """[Sp, n_pad] u8 -> fused-kernel group layout [G_out, n_pad, nsub, 128]."""
    Sp, n_pad = flat.shape
    return flat.reshape(Sp // (nsub * 128), nsub, 128, n_pad).transpose(
        0, 3, 1, 2
    )


@functools.partial(jax.jit, static_argnames=("n_sym",))
def _stage_xs_fused(hash_g: jnp.ndarray, diff_g: jnp.ndarray, n_sym: int):
    """Folded (hash, diff) -> the fused kernel's packed per-symbol input
    (live<<25 | hash<<12 | diff+1274); symbol padding is dead."""
    sym = jax.lax.broadcasted_iota(jnp.int32, (1, hash_g.shape[1], 1, 1), 1)
    live = (sym < n_sym).astype(jnp.int32)
    return (live << 25) | (hash_g << 12) | (diff_g + 1274)


def _fused_launch(imgs: np.ndarray, cfg: CodecConfig = REV2,
                  primed: bool = False, seed=None):
    """Dispatch the fused chain; returns (mk, lens, ovf, NSUB) device arrays
    without syncing (the pipelined path overlaps several batches)."""
    from .pallas import encode_fused as ef

    H, W, C = imgs.shape[1], imgs.shape[2], imgs.shape[3]
    n_sym = H * W * C
    NSUB, mcap = ef.pick_geometry(n_sym, -(-imgs.shape[0] // 128))
    dev = profiling.timed("encode/upload", jax.device_put, _flat_host(imgs))
    imgs_g = _regroup_device_nsub(dev, NSUB)
    hash_g, diff_g, _counts = profiling.timed(
        "encode/precompute", _stage_precompute_g, imgs_g, H, W, C, cfg
    )
    xs = _stage_xs_fused(hash_g, diff_g, n_sym)
    mk, lens, ovf = profiling.timed(
        "encode/fused_kernel", ef.encode_fused_groups, xs, mcap, cfg,
        primed or seed is not None, seed,
    )
    return mk, lens, ovf


def _fused_collect(mk, lens, ovf, n_sym: int, prefetch: bool = True):
    """Sync lengths + overflow, expand markers at the actual cap, start
    the D2H copy (``prefetch=False`` skips the copy start — the bench's
    device-only loop excludes downloads from its timed region; with the
    copy inside it the "device" number was really device+tunnel).
    Returns (device bytes [G_out, NSUB, cap2, 128], lens).

    lens and ovf are fetched in ONE device_get (two serialized
    np.asarray syncs cost two tunnel round-trips, ~0.3 s each here);
    callers that already hold host copies may pass numpy arrays."""
    if isinstance(lens, np.ndarray):
        lens_np, ovf_np = lens, np.asarray(ovf)
    else:
        lens_np, ovf_np = jax.device_get((lens, ovf))
    lens_np = lens_np.reshape(-1)
    if int(ovf_np.max(initial=0)):
        raise FusedOverflow("marker buffer overflow (incompressible lane)")
    maxlen = int(lens_np.max(initial=1))
    outcap = _outcap(n_sym)
    if maxlen > outcap:  # cannot happen for the rev-2 coder
        raise AssertionError(f"stream overflow: {maxlen} > bound {outcap}")
    # geometric cap ladder: expand_markers compiles once per cap value
    # (~1 min each on the remote backend), so nearby batch maxima must
    # share a bucket — a 1.5x ladder costs <= 50% extra sort rows but
    # caps the variant count at ~log1.5(outcap)
    cap2 = 1024
    while cap2 < maxlen:
        cap2 = min(outcap, -(-(cap2 + cap2 // 2) // 1024) * 1024)
    cap2 = min(outcap, cap2)
    # slice the marker buffer to the rows that can matter: each emitted
    # marker advances ``off`` by >= 1 (pallas/encode_fused.py decision()),
    # so buffer row i holds a marker with off >= i — once cap2 >= maxlen,
    # every marker with off < cap2 lives in the first cap2 rows and the
    # tail is provably DEAD or beyond every probe position.  The sandwich
    # sort shrinks from (mcap + cap2) to 2*cap2 rows (~38% at photo
    # ratios, where mcap is the 1.5x coder bound but cap2 ~ raw/2.2).
    if mk.shape[2] > cap2:
        mk = mk[:, :, :cap2, :]
    byts = profiling.timed(
        "encode/marker_expand", _expand_markers_jit, mk, cap2
    )
    if prefetch:
        byts.copy_to_host_async()
    return byts, lens_np


_expand_markers_jit = jax.jit(coder.expand_markers,
                              static_argnames=("outcap",))


def _encode_lanes_fused(imgs: np.ndarray, cfg: CodecConfig = REV2,
                        primed: bool = False, seed=None) -> list[bytes]:
    S = imgs.shape[0]
    n_sym = int(np.prod(imgs.shape[1:]))
    mk, lens, ovf = _fused_launch(imgs, cfg, primed, seed)
    byts_d, lens_np = _fused_collect(mk, lens, ovf, n_sym)
    cap2 = byts_d.shape[2]
    byts = profiling.timed("encode/download", np.asarray, byts_d)
    byts = byts.transpose(0, 1, 3, 2).reshape(-1, cap2)
    return [byts[s, : lens_np[s]].tobytes() for s in range(S)]


def _outcap(n_sym: int) -> int:
    """Per-lane compressed-size bound, bucketed (raw + raw/2 + 64)."""
    return -(-(n_sym + n_sym // 2 + 64) // 1024) * 1024


def pipeline_fits(n_sym: int) -> bool:
    """True iff a stripe of ``n_sym`` samples can take the pipelined
    accelerated path (the fused engine's budget on TPU hosts, else the
    sort chain's)."""
    if (os.environ.get("LLCT_ENCODE_ENGINE", "fused") == "fused"
            and jax.default_backend() == "tpu"):
        from .pallas import encode_fused as ef

        if ef.fits_fused(n_sym):
            return True
    return fits_pallas_budget(n_sym)


def fits_pallas_budget(n_sym: int) -> bool:
    """True iff a stripe of ``n_sym`` samples fits the Pallas encode chain.

    Limits: the packed-sort position budget (2^25 slots), the per-group HBM
    slot budget (~6 B/slot/lane at 1024 lanes, LLCT_SLOT_BUDGET), and the
    byte-expansion offset budget (2^21 bytes).  The XLA engine has no such
    limits (pick_slice_height avoids exceeding them by default).
    """
    slot_budget = int(os.environ.get("LLCT_SLOT_BUDGET", 900_000))
    return (n_sym * 24 < (1 << 25)
            and n_sym * 24 <= slot_budget
            and _outcap(n_sym) < (1 << 21))


def _pipelined_fused(batches: list[np.ndarray], cfg: CodecConfig,
                     primed: bool, seed=None) -> list[list[bytes]]:
    """Cross-batch overlap for the fused engine: every batch's upload +
    precompute + kernel is dispatched before any lens sync, then batches
    collect in order (lens sync -> marker expansion at the actual cap ->
    async D2H).  No count sync exists on this path at all.  A batch whose
    markers overflow re-encodes alone through the sort chain.

    The in-flight window is small on purpose: collecting batch i starts
    its byte DOWNLOAD while batch i+2's upload is still streaming, so the
    duplex tunnel's two directions overlap; a window wider than the batch
    list serializes all uploads before any download."""
    max_inflight = max(1, int(os.environ.get("LLCT_PIPELINE_INFLIGHT", "2")))
    ready: list = [None] * len(batches)
    inflight: list = []

    def _collect(item):
        bi, imgs, mk, lens, ovf = item
        n_sym = int(np.prod(imgs.shape[1:]))
        try:
            byts_d, lens_np = _fused_collect(mk, lens, ovf, n_sym)
        except FusedOverflow:
            if fits_pallas_budget(n_sym):
                ready[bi] = encode_lanes(imgs, cfg, engine="pallas",
                                         primed=primed, seed=seed)
            else:  # ultra-wide + incompressible: the XLA engine only
                ready[bi] = encode_lanes(imgs, cfg, engine="xla",
                                         primed=primed, seed=seed)
            return
        ready[bi] = (imgs.shape[0], byts_d, lens_np)

    for bi, imgs in enumerate(batches):
        mk, lens, ovf = _fused_launch(imgs, cfg, primed, seed)
        inflight.append((bi, imgs, mk, lens, ovf))
        while len(inflight) > max_inflight:
            _collect(inflight.pop(0))
    for item in inflight:
        _collect(item)
    out = []
    for r in ready:
        if isinstance(r, list):      # overflow fallback already has bytes
            out.append(r)
            continue
        S, byts_d, lens_np = r
        cap2 = byts_d.shape[2]
        byts = np.asarray(byts_d).transpose(0, 1, 3, 2).reshape(-1, cap2)
        out.append([byts[s, : lens_np[s]].tobytes() for s in range(S)])
    return out


def encode_lanes_pipelined(
    batches: list[np.ndarray], cfg: CodecConfig = REV2, primed: bool = False,
    seed=None, engine: str = "auto",
) -> list[list[bytes]]:
    """Encode several lane batches with cross-batch overlap (Pallas path).

    JAX dispatch is asynchronous: each batch's device chain is issued before
    the previous batch's results are collected, so host-side grouping,
    uploads and the per-batch count sync overlap earlier batches' device
    work.  Sustained throughput ~= max(stage) instead of sum(stages).
    engine: 'auto' (fused on TPU when every batch fits), 'fused', or
    'pallas' (the sort chain — also what the FusedOverflow fallback
    requests, so an overflowing batch is never re-run through the kernel
    that just overflowed).
    """
    from .pallas import encode_fused as ef

    if engine == "auto":
        engine = os.environ.get("LLCT_ENCODE_ENGINE", "fused")
    if (engine == "fused"
            and jax.default_backend() == "tpu"
            and all(ef.fits_fused(int(np.prod(b.shape[1:])))
                    for b in batches)):
        batches = [np.ascontiguousarray(b, dtype=np.uint8) for b in batches]
        return _pipelined_fused(batches, cfg, primed, seed)
    # NOTE: speculative (K, Tc) buckets were tried here to remove the
    # per-batch count sync, but measured *slower*: photo content teeters at
    # the K=16/24 bucket edge, and either the misses (re-encodes) or the
    # converged K=24 sort cost more than the ~0.1s sync they save.  The
    # two-phase dispatch below overlaps the sync latency instead: all
    # uploads + count dispatches go out first, so by the time a batch's
    # buckets are needed its counts are already on their way back.
    #
    # LLCT_PIPELINE_THREADS=1 moves host grouping + upload to a worker
    # thread so they overlap the main thread's chain dispatch and the
    # per-batch count/length syncs (uploads block the dispatching thread
    # on this backend).
    batches = [np.ascontiguousarray(b, dtype=np.uint8) for b in batches]
    stop = None
    if os.environ.get("LLCT_PIPELINE_THREADS", "0") != "0" and len(batches) > 1:
        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=2)
        stop = threading.Event()

        def _uploader():
            for imgs in batches:
                try:
                    item = _launch_stage_counts(imgs, cfg)
                except BaseException as e:  # surface in the consumer
                    item = e
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set() or isinstance(item, BaseException):
                    return

        threading.Thread(target=_uploader, daemon=True).start()

        def _staged():
            for _ in batches:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item

        staged = _staged()
    else:
        staged = [_launch_stage_counts(imgs, cfg) for imgs in batches]
    # two-step collect: sync each batch's (tiny) lens, dispatch its byte
    # expansion at the actual max length and start the device->host copy,
    # THEN materialize — a batch's bytes stream back (and its expansion
    # runs) while later batches' chains are still computing.  The collect
    # window is CAPPED: each in-flight batch retains its offset-packed
    # byte records in HBM (~0.5 GB/batch at 24K-symbol stripes), so an
    # unbounded batch list would OOM where the per-batch chain fits fine.
    max_inflight = max(1, int(os.environ.get("LLCT_PIPELINE_INFLIGHT", "4")))
    inflight = []
    ready = []

    def _collect_one(item):
        imgs, outcap, kp_g, kp_fin, lens_g, check = item
        check()
        b2, lens = _collect_bytes(kp_g, kp_fin, lens_g, outcap)
        ready.append((imgs.shape[0], b2, lens))

    try:
        for ctx in staged:
            imgs = ctx[0]
            n_sym = int(np.prod(imgs.shape[1:]))
            outcap = _outcap(n_sym)
            kp_g, kp_fin, lens_g, check = _launch_stage_rest(
                ctx, outcap, speculate=False, primed=primed, seed=seed
            )
            inflight.append((imgs, outcap, kp_g, kp_fin, lens_g, check))
            while len(inflight) > max_inflight:
                _collect_one(inflight.pop(0))
    finally:
        if stop is not None:
            stop.set()  # unblock the uploader if we are erroring out
    for item in inflight:
        _collect_one(item)
    out = []
    for S, b2, lens in ready:
        cap2 = b2.shape[1]
        byts = np.asarray(b2).transpose(0, 2, 3, 1).reshape(-1, cap2)
        out.append([byts[s, : lens[s]].tobytes() for s in range(S)])
    return out


def encode_lanes(
    imgs: np.ndarray, cfg: CodecConfig = REV2, engine: str = "auto",
    primed: bool = False, seed=None,
) -> list[bytes]:
    """Encode a batch of equal-shaped lanes [S, H, W, C] -> per-lane streams.

    Each returned byte string is a complete headerless rev-2 entropy stream
    (the caller prepends the 6-byte header or records it in a container).
    engine: 'pallas' (fused kernels, default on TPU), 'xla', or 'auto'.
    primed: start context row h at the hash-bucketed prior
    tables.PRIOR_TAB[h % 121] instead of zeros (sliced-container flag
    bit 0; single-stream reference mode never primes).
    seed: optional [121, 8] u8 per-image bucket table (stored-seed
    containers, flag bit 1): context row h resets to seed[h % 121]
    instead — the whole batch shares one table, so per-image seeds need
    per-image calls (api.compress) while corpus batching pools one seed.
    """
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    S = imgs.shape[0]
    if engine == "auto":
        if jax.default_backend() == "tpu":
            engine = os.environ.get("LLCT_ENCODE_ENGINE", "fused")
        else:
            engine = "xla"
    n_sym_total = int(np.prod(imgs.shape[1:]))
    if engine == "fused":
        from .pallas import encode_fused as ef

        if not ef.fits_fused(n_sym_total):
            engine = "pallas"
    if engine == "fused":
        from .pallas import encode_fused as ef

        # bound HBM: per lane the fused chain holds ~4B*n_pad (xs) +
        # 4B*mcap (markers) + grouped input/bytes; chunk big lane batches
        # to whole 1024-lane blocks and pipeline the chunks
        _, mcap = ef.pick_geometry(n_sym_total, 8)
        per_lane = 4 * n_sym_total + 4 * mcap + 2 * n_sym_total
        budget = int(os.environ.get("LLCT_FUSED_LANE_BUDGET", 3_000_000_000))
        chunk = max(1024, budget // max(1, per_lane) // 1024 * 1024)
        if S > chunk:
            parts = _pipelined_fused(
                [np.ascontiguousarray(imgs[i : i + chunk])
                 for i in range(0, S, chunk)], cfg, primed, seed)
            return [b for part in parts for b in part]
        try:
            return _encode_lanes_fused(imgs, cfg, primed=primed, seed=seed)
        except FusedOverflow:
            # incompressible lanes blew the marker budget: the sort chain
            # has no such limit and emits identical bytes
            engine = "pallas"
    if engine == "pallas" and not fits_pallas_budget(n_sym_total):
        engine = "xla"
    if engine == "pallas":
        n_sym = int(np.prod(imgs.shape[1:]))
        # bound HBM: the compact sort holds ~n_sym*K slot records per lane
        # in u32 pairs plus sort temps (~16 B/slot peak), so a huge lane
        # batch OOMs (measured: 8192 lanes x 24576 syms -> 3.75 GB temps x4
        # in _stage_compact).  Chunk to whole kernel groups and pipeline
        # the chunks so the split costs overlap instead of serializing.
        # 4096 lanes x 12288 syms (1.2e9 slots) measured safe and +20%
        # device throughput over 1024-lane batches (tools/sweep_lanes.py);
        # 8192 x 24576 (4.8e9) OOMs — the bound sits between, with margin
        budget = int(os.environ.get("LLCT_LANE_SLOT_BUDGET",
                                    1_300_000_000))
        from .pallas import encode_kernels as pk

        chunk = max(pk.GROUP,
                    (budget // max(1, n_sym * 24)) // pk.GROUP * pk.GROUP)
        if S > chunk:
            parts = encode_lanes_pipelined(
                [imgs[i : i + chunk] for i in range(0, S, chunk)], cfg,
                primed=primed, seed=seed, engine="pallas",
            )
            return [b for part in parts for b in part]
        outcap = _outcap(n_sym)
        byts_g, lens = _pipeline_pallas_bytes(imgs, outcap, cfg, primed,
                                              seed)
        cap2 = byts_g.shape[1]
        byts = np.asarray(byts_g).transpose(0, 2, 3, 1).reshape(-1, cap2)
        return [byts[s, : lens[s]].tobytes() for s in range(S)]
    counts = np.asarray(_count(imgs, cfg))
    cap = _bucket(int(counts.max()))
    rstmap = (jnp.asarray(tables.prior_full_from(seed, cfg.num_states,
                                                 cfg.substates))
              if seed is not None else None)
    meta, runs = _pipeline(imgs, cap, cfg, primed, rstmap)
    return coder.expand_slots_batch(np.asarray(meta), np.asarray(runs))
