#!/usr/bin/env python3
"""Benchmark: batched sliced encode (and decode) throughput on the local chip.

Prints ONE JSON line:
  {"metric": "encode_mps_512", "value": N, "unit": "MP/s", "vs_baseline": N, ...}

Baseline: the C++ reference encodes 512x512x3 photo-like at 4.0 MP/s on one
CPU core (BASELINE.md).  This benchmark encodes a batch of 512x512x3 images
cut into stripes, all stripes marching in lockstep through the device scans.

Env knobs: BENCH_IMAGES (default 8), BENCH_SLICE_H (default 8),
BENCH_REPS (default 3), BENCH_DECODE=0 to skip the decode measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: this backend's remote compiler has a multi-
# minute first-gather penalty per process; the disk cache (when supported)
# amortizes it across bench runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from llcomp_tpu import decode as jdec  # noqa: E402
from llcomp_tpu import encode as jenc  # noqa: E402


def make_photo(h, w, c=3, seed=42, noise=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 64 * np.sin(2 * np.pi * xx / w * 1.5)
        + 64 * np.cos(2 * np.pi * yy / h * 1.1)
    )
    img = base[..., None] + np.arange(c)[None, None, :] * 10.0
    img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


def main() -> int:
    H = W = int(os.environ.get("BENCH_SIZE", "512"))
    n_images = int(os.environ.get("BENCH_IMAGES", "8"))
    slice_h = int(os.environ.get("BENCH_SLICE_H", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    imgs = [make_photo(H, W, seed=100 + i) for i in range(n_images)]
    lanes = np.concatenate(
        [img.reshape(H // slice_h, slice_h, W, 3) for img in imgs]
    )
    S = lanes.shape[0]
    mp_total = n_images * H * W / 1e6

    dev_lanes = jax.device_put(lanes)
    counts = np.asarray(jenc._count(dev_lanes))
    cap = jenc._bucket(int(counts.max()))

    # -- encode ----------------------------------------------------------
    t0 = time.time()
    meta, runs = jax.block_until_ready(jenc._pipeline(dev_lanes, cap))
    compile_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        meta, runs = jax.block_until_ready(jenc._pipeline(dev_lanes, cap))
        times.append(time.time() - t0)
    enc_device_s = min(times)

    t0 = time.time()
    meta_h = np.asarray(meta)
    runs_h = np.asarray(runs)
    from llcomp_tpu import coder

    streams = coder.expand_slots_batch(meta_h, runs_h)
    host_s = time.time() - t0

    enc_mps_device = mp_total / enc_device_s
    enc_mps_e2e = mp_total / (enc_device_s + host_s)
    comp_bytes = sum(len(b) for b in streams)
    ratio = n_images * H * W * 3 / comp_bytes

    result = {
        "metric": "encode_mps_512",
        "value": round(enc_mps_device, 3),
        "unit": "MP/s",
        "vs_baseline": round(enc_mps_device / 4.0, 3),
        "encode_mps_e2e": round(enc_mps_e2e, 3),
        "compression_ratio": round(ratio, 3),
        "lanes": S,
        "images": n_images,
        "slice_h": slice_h,
        "compile_s": round(compile_s, 1),
        "platform": jax.devices()[0].platform,
    }

    # -- correctness gate + decode --------------------------------------
    if os.environ.get("BENCH_DECODE", "1") != "0":
        dcap = jdec._bucket_cap(max(len(b) for b in streams))
        data = np.zeros((S, dcap), dtype=np.uint8)
        for s, b in enumerate(streams):
            data[s, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        ddev = jax.device_put(data)
        t0 = time.time()
        planes, err = jax.block_until_ready(
            jdec._decode_scan(ddev, slice_h, W, 3)
        )
        dec_compile_s = time.time() - t0
        t0 = time.time()
        planes, err = jax.block_until_ready(
            jdec._decode_scan(ddev, slice_h, W, 3)
        )
        dec_s = time.time() - t0
        from llcomp_tpu.core import transform

        out = np.asarray(transform.rct_inverse(planes))
        ok = not np.asarray(err).any() and np.array_equal(out, lanes)
        result["decode_mps"] = round(mp_total / dec_s, 3)
        result["decode_compile_s"] = round(dec_compile_s, 1)
        result["roundtrip_exact"] = bool(ok)
        if not ok:
            result["vs_baseline"] = 0.0

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
