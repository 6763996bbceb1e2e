"""Batched lane-parallel encoder (JAX).

Pipeline (all stages one jit per (shape, T) bucket):

  [S, H, W, C] u8
    └─ rct_forward ─ context_and_residual ─ binarize      (pure map, no loops)
    └─ compact: pack valid decisions per lane to the front [S, T]
    └─ probability pre-pass ("model-free encode"): the encoder's adaptive
       model walk is fully determined by the decision stream, which is known
       in advance on the encode side.  Stable-sort each lane's decisions by
       context; within a context run the state recurrence is a *segmented*
       scan whose carry is ONE BYTE per lane (reset to state 0 at run
       starts); un-permute the resulting probabilities back to stream order.
       The big [S, 63409] model array never exists on this path.
    └─ lax.scan over T decisions: pure element-wise range-coder puts with
       precomputed probabilities (carry = 4 scalars per lane), emitting one
       slot record per step
    └─ finish flush (2 slots)
  host: expand slot records to per-lane byte streams (one vectorized pass).

Why model-free: carrying the 63 KB/lane model through the scan makes XLA
materialize large per-step traffic (measured ~70 us/step on the target
backend); with the pre-pass both scans carry only a few bytes per lane.
A model-in-scan variant is kept as ``_pipeline_impl_modelscan`` for
cross-checking.

Reference semantics: encode loop at `llcomp.hpp:390-449`; model addressing
``states[hash * 8 + ctx]`` at `llcomp.hpp:440-441`; probability/update
protocol at `llcomp.hpp:439-444`.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from . import coder
from .core import transform
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


def _probability_prepass(compact: jnp.ndarray, cfg: CodecConfig):
    """Per-decision coding probabilities without materializing the model.

    For each lane: stable-sort decisions by context index (padding sorts
    last), walk the 128-state machine through each context's bit run with a
    one-byte carry (segment boundaries reset to state 0 — fresh context),
    then scatter the probabilities back to stream order.
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

    def walk(state, xs):
        b, ss = xs
        st = jnp.where(ss, 0, state.astype(jnp.int32))
        p = transform.STATE_PROB[st]
        ns = transform.NEXT_STATE[st * 2 + b].astype(jnp.uint8)
        return ns, p.astype(jnp.uint8)

    _, probs_sorted = jax.lax.scan(
        walk, jnp.zeros((S,), jnp.uint8), (sbit.T, seg_start.T)
    )                                                        # [cap, S]

    # un-permute: probs[lane, order[lane, j]] = probs_sorted[j, lane]
    probs = (
        jnp.zeros((S * cap,), jnp.uint8)
        .at[(lane_off + order).reshape(-1)]
        .set(probs_sorted.T.reshape(-1))
        .reshape(S, cap)
    )
    return probs


def _pipeline_impl(imgs: jnp.ndarray, cap: int, cfg: CodecConfig = REV2):
    """Full model-free encode; ``cap`` = static scan length (bucketed).

    Pure function (unjitted) so ``parallel`` can wrap it in shard_map with
    per-device lane blocks; ``_pipeline`` below is the jitted single-device
    entry point.
    """
    S = imgs.shape[0]
    compact = _compact_decisions(imgs, cap, cfg)
    probs = _probability_prepass(compact, cfg)

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


def _pipeline_impl_modelscan(imgs: jnp.ndarray, cap: int, cfg: CodecConfig = REV2):
    """Cross-check variant: adaptive model carried through the scan."""
    S = imgs.shape[0]
    compact = _compact_decisions(imgs, cap, cfg)

    NS = cfg.num_states
    states0 = jnp.zeros((S * (NS + 1),), jnp.uint8)      # +1 trash slot/lane
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


_pipeline = jax.jit(_pipeline_impl, static_argnames=("cap", "cfg"))
_pipeline_modelscan = jax.jit(
    _pipeline_impl_modelscan, static_argnames=("cap", "cfg")
)


def encode_lanes(
    imgs: np.ndarray, cfg: CodecConfig = REV2
) -> list[bytes]:
    """Encode a batch of equal-shaped lanes [S, H, W, C] -> per-lane streams.

    Each returned byte string is a complete headerless rev-2 entropy stream
    (the caller prepends the 6-byte header or records it in a container).
    """
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    counts = np.asarray(_count(imgs, cfg))
    cap = _bucket(int(counts.max()))
    meta, runs = _pipeline(imgs, cap, cfg)
    return coder.expand_slots_batch(np.asarray(meta), np.asarray(runs))
