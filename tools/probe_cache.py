#!/usr/bin/env python3
"""Measure whether JAX_COMPILATION_CACHE_DIR hits across processes on the
axon remote-compile backend (VERDICT r04 #5: extras paid 73-198 s compile
each despite the cache dir being set; nobody had checked whether the
persistent cache works here at all).

Run twice in fresh processes; if the second run's "compile" time is seconds
instead of ~a minute, the cache works and pre-warming geometries in one
process (or in a prior session) kills the children's compile bill.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import numpy as np

# the axon sitecustomize imports jax at interpreter startup, BEFORE any
# user code can set JAX_COMPILATION_CACHE_DIR — the env var is never read
# and the cache silently stays disabled (measured: "cache is disabled/not
# initialized" on every TPU process).  The explicit config update is the
# only way to enable it here.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from llcomp_tpu import encode as jenc  # noqa: E402

H = W = 512
CH = 3
slice_h = 8
n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 16

def make_photo(h, w, c=3, seed=42, noise=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 64 * np.sin(2 * np.pi * xx / w * 1.5)
            + 64 * np.cos(2 * np.pi * yy / h * 1.1))
    img = base[..., None] + np.arange(c)[None, None, :] * 10.0
    img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


imgs = [make_photo(H, W, c=CH, seed=100 + i) for i in range(n_images)]
lanes = np.concatenate(
    [img.reshape(H // slice_h, slice_h, W, CH) for img in imgs])

t0 = time.time()
streams = jenc.encode_lanes(lanes, engine="fused", primed=True)
print(f"encode_lanes fused warm-compile+run: {time.time() - t0:.1f}s, "
      f"{sum(len(s) for s in streams)} bytes", flush=True)
