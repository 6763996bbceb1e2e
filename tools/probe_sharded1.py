#!/usr/bin/env python3
"""Single-chip sanity for the sharded pod path (VERDICT r04 #3 done
criterion): encode_lanes_sharded on a 1-device TPU mesh must produce the
same bytes as the unsharded fused engine at comparable throughput (the
shard_map wrapper must not tax the kernel).

Run alone on the chip: python tools/probe_sharded1.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from llcomp_tpu import encode as jenc
from llcomp_tpu import parallel


def make_photo(h, w, c=3, seed=42, noise=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 64 * np.sin(2 * np.pi * xx / w * 1.5)
            + 64 * np.cos(2 * np.pi * yy / h * 1.1))
    img = base[..., None] + np.arange(c)[None, None, :] * 10.0
    img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


H = W = 512
slice_h = 8
n_images = 16
mp = n_images * H * W / 1e6
print("backend:", jax.default_backend(), flush=True)
mesh = parallel.make_mesh(1)


def batch(tag):
    return np.concatenate(
        [make_photo(H, W, seed=4000 + tag * 101 + i).reshape(
            H // slice_h, slice_h, W, 3) for i in range(n_images)])


# byte equality, then fresh-input timing of both paths
warm = batch(0)
t0 = time.time()
sh = parallel.encode_lanes_sharded(warm, mesh, engine="fused")
print(f"sharded warm+compile {time.time()-t0:.1f}s", flush=True)
un = jenc.encode_lanes(warm, engine="fused")
print("bytes identical:", sh == un, flush=True)

for label, fn in (
    ("unsharded fused", lambda b: jenc.encode_lanes(b, engine="fused")),
    ("sharded(1-dev)  ", lambda b: parallel.encode_lanes_sharded(
        b, mesh, engine="fused")),
):
    ts = []
    for r in range(3):
        fb = batch(1 + r)
        t0 = time.time()
        fn(fb)
        ts.append(time.time() - t0)
    print(f"{label}: {min(ts):.3f}s = {mp/min(ts):.2f} MP/s e2e", flush=True)
