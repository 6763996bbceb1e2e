"""Probe the Pallas encode chain's real HBM ceiling for big stripes.

The slot budget (LLCT_SLOT_BUDGET, default 900k slots/lane) routes
over-budget stripes to the slow XLA engine.  Pair-packed walk records
halved the per-slot footprint since the budget was set, and the bucketed
prior made thin stripes cheap, so the right default is worth re-measuring:
encode progressively larger stripes on the Pallas path (budget lifted) and
report time + correctness until it OOMs.

Run alone: LLCT_SLOT_BUDGET=99000000 python tools/probe_budget.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("LLCT_SLOT_BUDGET", "99000000")

import jax  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_photo  # noqa: E402
from llcomp_tpu import encode as jenc, oracle  # noqa: E402

# (slice_h, W): slot counts n_sym*24 from 0.6M up to 4.7M per lane
CASES = [(8, 1024), (8, 2048), (16, 2048), (8, 4096), (16, 4096), (8, 8192)]


def main() -> None:
    for sh, W in CASES:
        n_sym = sh * W * 3
        # 32 real lanes pad to a full 1024-lane group inside the chain, so
        # every HBM allocation is full-size — exactly the OOM question —
        # while the host-side image generation stays cheap.
        lanes_per_img = 8
        imgs = [make_photo(sh * lanes_per_img, W, seed=100 + i)
                for i in range(4)]
        lanes = np.concatenate(
            [im.reshape(lanes_per_img, sh, W, 3) for im in imgs]
        )
        mp = lanes.shape[0] * n_sym / 3 / 1e6
        print(f"slice_h={sh} W={W}: n_sym={n_sym} slots/lane={n_sym * 24 / 1e6:.2f}M "
              f"lanes={lanes.shape[0]}", flush=True)
        try:
            t0 = time.time()
            streams = jenc.encode_lanes(lanes, engine="pallas", primed=True)
            dt = time.time() - t0
            want = oracle.encode_planes(
                oracle.rct_forward(lanes[1]), primed=True
            )
            ok = streams[1] == want
            t0 = time.time()
            lanes2 = np.concatenate(
                [make_photo(sh * lanes_per_img, W, seed=900 + i).reshape(
                    lanes_per_img, sh, W, 3) for i in range(4)]
            )
            up = time.time() - t0
            t0 = time.time()
            jenc.encode_lanes(lanes2, engine="pallas", primed=True)
            dt2 = time.time() - t0
            print(f"  OK exact={ok} compile+run {dt:.1f}s fresh {dt2:.2f}s "
                  f"({mp / dt2:.2f} MP/s e2e, gen {up:.2f}s)", flush=True)
        except Exception as e:
            print(f"  FAIL: {type(e).__name__}: {str(e)[:160]}", flush=True)
            break


if __name__ == "__main__":
    main()
