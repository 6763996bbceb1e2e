#!/usr/bin/env python3
"""Profile the encode chain at the wide extra-config geometries (round 5:
the r5f capture measured 2048x2048 encode at 3.4 MP/s and 256x8192 at
0.6 MP/s e2e while the headline runs 7.8 — find the stage).

Run alone on the chip: python tools/probe_wide.py [H W C n_img slice_h]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("LLCT_PROFILE", "1")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from llcomp_tpu import api, profiling
from llcomp_tpu import encode as jenc

H, W, CH, n_img, slice_h = (int(v) for v in (sys.argv[1:6] or
                                             (256, 8192, 3, 2, 4)))


def make_photo(h, w, c=3, seed=42, noise=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 64 * np.sin(2 * np.pi * xx / w * 1.5)
            + 64 * np.cos(2 * np.pi * yy / h * 1.1))
    img = base[..., None] + np.arange(c)[None, None, :] * 10.0
    img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


sh = min(slice_h, api.pick_slice_height(H, W, CH))
while H % sh:
    sh -= 1
n_sym = sh * W * CH
from llcomp_tpu.pallas import encode_fused as ef

S_batch = n_img * (H // sh)
NSUB, mcap = ef.pick_geometry(n_sym, -(-S_batch // 128))
print(f"backend={jax.default_backend()} slice_h={sh} n_sym={n_sym} "
      f"lanes/batch={S_batch} NSUB={NSUB} mcap={mcap} "
      f"fits_fused={ef.fits_fused(n_sym)} "
      f"fits_pallas={jenc.fits_pallas_budget(n_sym)}", flush=True)


def batch(tag):
    return np.concatenate(
        [make_photo(H, W, c=CH, seed=6000 + tag * 31 + i).reshape(
            H // sh, sh, W, CH) for i in range(n_img)])


mp = n_img * H * W / 1e6
warm = batch(0)
t0 = time.time()
jenc.encode_lanes(warm, engine="fused", primed=True)
print(f"warm+compile {time.time()-t0:.1f}s", flush=True)

# single-call timing, fresh inputs
for r in range(3):
    fb = batch(1 + r)
    t0 = time.time()
    jenc.encode_lanes(fb, engine="fused", primed=True)
    print(f"single call: {time.time()-t0:.2f}s = {mp/(time.time()-t0):.2f} "
          "MP/s", flush=True)

# pipelined timing (what the bench extra measures)
fbs = [batch(10 + r) for r in range(3)]
t0 = time.time()
jenc.encode_lanes_pipelined(fbs, primed=True)
dt = time.time() - t0
print(f"pipelined 3 batches: {dt:.2f}s = {3*mp/dt:.2f} MP/s", flush=True)

print(profiling.stages.report(), flush=True)
