#!/usr/bin/env python3
"""Device encode/decode MP/s vs lane count (VERDICT r2 item 8).

Sweeps lane counts at the bench geometry (512-wide, 8-row stripes) with
FRESH inputs per measurement (the backend elides repeated executions) and
prints one JSON line per point plus a summary table for docs/DESIGN.md.
The knee of this curve justifies corpus.compress_corpus's default
max_lanes_per_batch.

Run on the chip: python tools/sweep_lanes.py [lane counts...]
Env: SWEEP_W (512), SWEEP_SLICE (8), SWEEP_REPS (2).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from llcomp_tpu import encode as jenc  # noqa: E402
from llcomp_tpu.core.config import REV2  # noqa: E402
from llcomp_tpu.pallas import decode_kernel as dk  # noqa: E402


def make_lanes(n, h, w, c, tag):
    rng = np.random.default_rng(1000 + tag)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 64 * np.sin(2 * np.pi * xx / w * (1.3 + 0.1 * (tag % 5))) \
        + 64 * np.cos(2 * np.pi * yy / h * 1.1)
    return np.clip(
        base[None, ..., None] + np.arange(c) * 10
        + rng.integers(-3, 4, size=(n, h, w, c)),
        0, 255,
    ).astype(np.uint8)


def main() -> int:
    W = int(os.environ.get("SWEEP_W", "512"))
    slice_h = int(os.environ.get("SWEEP_SLICE", "8"))
    C = 3
    reps = int(os.environ.get("SWEEP_REPS", "2"))
    counts = [int(v) for v in sys.argv[1:]] or [256, 512, 1024, 2048, 4096]
    n_sym = slice_h * W * C
    rows = []
    for n in counts:
        mp = n * slice_h * W / 1e6
        # --- encode device-only (inputs resident; chain + expansion) ----
        enc_s = float("inf")
        streams = None
        for r in range(reps + 1):  # rep 0 warms the compile
            lanes = make_lanes(n, slice_h, W, C, 31 * n + r)
            up = jax.device_put(jenc._group_host(lanes))
            up.block_until_ready()
            t0 = time.time()
            hg, dg, counts_ = jenc._stage_precompute_g(
                up, slice_h, W, C, REV2)
            kp, kf, ln, _ = jenc._launch_stage_rest(
                (lanes, hg, dg, counts_, REV2), jenc._outcap(n_sym),
                speculate=False, primed=True)
            b2, lens = jenc._collect_bytes(kp, kf, ln, jenc._outcap(n_sym))
            b2.block_until_ready()
            dt = time.time() - t0
            if r:
                enc_s = min(enc_s, dt)
            cap2 = b2.shape[1]
            byts = np.asarray(b2).transpose(0, 2, 3, 1).reshape(-1, cap2)
            streams = [byts[s, : lens[s]].tobytes() for s in range(n)]
        # --- decode device-only (streams resident, no pixel download) ---
        dec_s = float("inf")
        for r in range(reps + 1):
            if r:  # fresh streams per timed rep
                lanes = make_lanes(n, slice_h, W, C, 77 * n + r)
                streams = jenc.encode_lanes(lanes, engine="pallas",
                                            primed=True)
            G = -(-n // dk.LANES)
            cap = max(4096, -(-(max(len(s) for s in streams) + 64)
                              // 4096) * 4096)
            data = np.zeros((G, cap, dk.LANES), dtype=np.uint8)
            for s, blob in enumerate(streams):
                data[s // dk.LANES, : len(blob),
                     s % dk.LANES] = np.frombuffer(blob, dtype=np.uint8)
            step = dk._pick_nsub(G, cap, W * C)
            ups = [jax.device_put(data[g : g + step])
                   for g in range(0, G, step)]
            for u in ups:
                u.block_until_ready()
            t0 = time.time()
            infl = [dk.decode_groups_images(u, slice_h, W, C, REV2, True)
                    for u in ups]
            for imgs, err in infl:
                imgs.block_until_ready()
            if r:
                dec_s = min(dec_s, time.time() - t0)
        row = {"lanes": n, "mp": round(mp, 2),
               "encode_mps_device": round(mp / enc_s, 2),
               "decode_mps_device": round(mp / dec_s, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("\n| lanes | MP | encode dev MP/s | decode dev MP/s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['lanes']} | {r['mp']} | {r['encode_mps_device']} "
              f"| {r['decode_mps_device']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
