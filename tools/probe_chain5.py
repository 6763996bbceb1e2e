#!/usr/bin/env python3
"""Round-5 fused-chain breakdown probe (VERDICT r04 #6: device chain at
14.2 MP/s vs 20.4 kernel-only — find the 6 MP/s).

Measures, with fresh inputs per round and all device work dispatched
before any sync:
  1. kernel-only rate (fused kernel to completion, no expansion)
  2. expansion cost at the shipped cap ladder (input = full mcap rows)
  3. expansion cost with the marker input SLICED to cap2+pad rows —
     marker offsets are strictly ascending per lane, so row i holds a
     marker with off >= i: every marker that can land below cap2 lives
     in the first cap2 rows, and the tail is provably DEAD once
     maxlen <= cap2.  The sort shrinks from (mcap+cap2) to ~(2*cap2)
     rows.
  4. whole chain e2e device rate both ways.

Run alone on the chip: python tools/probe_chain5.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from llcomp_tpu import coder
from llcomp_tpu import encode as jenc
from llcomp_tpu.core.config import REV2
from llcomp_tpu.pallas import encode_fused as ef


def make_photo(h, w, c=3, seed=42, noise=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 64 * np.sin(2 * np.pi * xx / w * 1.5)
            + 64 * np.cos(2 * np.pi * yy / h * 1.1))
    img = base[..., None] + np.arange(c)[None, None, :] * 10.0
    img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


H = W = 512
CH = 3
slice_h = 8
n_images = 16
n_sym = slice_h * W * CH
mp = n_images * H * W / 1e6
REPS = int(os.environ.get("PROBE_REPS", "3"))

print("backend:", jax.default_backend(), flush=True)


def batch(tag):
    return np.concatenate(
        [make_photo(H, W, c=CH, seed=3000 + tag * 131 + i).reshape(
            H // slice_h, slice_h, W, CH) for i in range(n_images)])


NSUB, mcap = ef.pick_geometry(n_sym, -(-batch(0).shape[0] // 128))
print(f"NSUB={NSUB} mcap={mcap} n_sym={n_sym}", flush=True)

_expand = jax.jit(coder.expand_markers, static_argnames=("outcap",))


def upload(b):
    u = jax.device_put(jenc._flat_host(b))
    u.block_until_ready()
    return u


def chain_to_kernel(u):
    g = jenc._regroup_device_nsub(u, NSUB)
    hg, dg, _ = jenc._stage_precompute_g(g, slice_h, W, CH, REV2)
    xs = jenc._stage_xs_fused(hg, dg, n_sym)
    return ef.encode_fused_groups(xs, mcap, REV2, True, None)


# -- warm all compile variants -------------------------------------------
u0 = upload(batch(999))
mk0, lens0, ovf0 = chain_to_kernel(u0)
lens_np = np.asarray(lens0).reshape(-1)
maxlen = int(lens_np.max())
outcap = jenc._outcap(n_sym)
cap2 = 1024
while cap2 < maxlen:
    cap2 = min(outcap, -(-(cap2 + cap2 // 2) // 1024) * 1024)
print(f"maxlen={maxlen} ladder cap2={cap2}", flush=True)
_expand(mk0, cap2).block_until_ready()
rows = min(mcap, cap2 + 64)
_expand(mk0[:, :, :rows, :], cap2).block_until_ready()

# 1. kernel-only
ts = []
for r in range(REPS):
    u = upload(batch(r))
    t0 = time.time()
    mk, lens, ovf = chain_to_kernel(u)
    lens.block_until_ready()
    mk.block_until_ready()
    ts.append(time.time() - t0)
print(f"kernel-only: {min(ts):.3f}s = {mp/min(ts):.1f} MP/s", flush=True)

# 2/3. expansion cost, full vs sliced input (markers resident)
mks = []
for r in range(REPS):
    u = upload(batch(100 + r))
    mk, lens, ovf = chain_to_kernel(u)
    mk.block_until_ready()
    mks.append(mk)
for label, fn in (
    ("expand full-mcap", lambda m: _expand(m, cap2)),
    ("expand sliced", lambda m: _expand(m[:, :, :rows, :], cap2)),
):
    ts = []
    for mk in mks:
        t0 = time.time()
        fn(mk).block_until_ready()
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts):.3f}s", flush=True)

# exactness of the sliced expansion
a = np.asarray(_expand(mks[0], cap2))
b = np.asarray(_expand(mks[0][:, :, :rows, :], cap2))
print("sliced expansion byte-identical:", bool(np.array_equal(a, b)),
      flush=True)

# 4. whole chain, batched lens sync, both expansion variants
for label, sliced in (("chain full", False), ("chain sliced", True)):
    ups = [upload(batch(200 + 10 * r)) for r in range(REPS)]
    t0 = time.time()
    res = [chain_to_kernel(u) for u in ups]
    fetched = jax.device_get([(l, o) for _, l, o in res])
    outs = []
    for (mk, _, _), (l, o) in zip(res, fetched):
        m = mk[:, :, :rows, :] if sliced else mk
        outs.append(_expand(m, cap2))
    for o in outs:
        o.block_until_ready()
    dt = time.time() - t0
    print(f"{label}: {dt/REPS:.3f}s/batch = {REPS*mp/dt:.1f} MP/s",
          flush=True)
