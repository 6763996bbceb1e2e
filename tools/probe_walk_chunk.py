#!/usr/bin/env python3
"""Probe the encode walk kernel's SYMCHUNK (symbols per grid step) on chip.

Bigger chunks amortize Mosaic per-grid-step overhead (384 steps at the
default 32 for a 12288-symbol stripe).  Each value runs in a subprocess
(fresh module constant) and times the full device chain on fresh inputs.
Usage: python tools/probe_walk_chunk.py [values...]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def _one() -> int:
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from llcomp_tpu import encode as jenc
    from llcomp_tpu.core.config import REV2

    H, W, C = 8, 512, 3
    n_lanes = 1024
    n_sym = H * W * C

    def batch(tag):
        rng = np.random.default_rng(300 + tag)
        yy, xx = np.mgrid[0:H, 0:W]
        base = 128 + 64 * np.sin(2 * np.pi * xx / W * 1.5) + 9 * yy
        return np.clip(
            base[None, ..., None] + np.arange(C) * 10
            + rng.integers(-3, 4, size=(n_lanes, H, W, C)),
            0, 255,
        ).astype(np.uint8)

    mp = n_lanes * H * W / 1e6
    best = float("inf")
    for r in range(4):  # rep 0 warms
        b = batch(r)
        up = jax.device_put(jenc._group_host(b))
        up.block_until_ready()
        t0 = time.time()
        hg, dg, counts = jenc._stage_precompute_g(up, H, W, C, REV2)
        kp, kf, ln, _ = jenc._launch_stage_rest(
            (b, hg, dg, counts, REV2), jenc._outcap(n_sym),
            speculate=False, primed=True)
        b2, lens = jenc._collect_bytes(kp, kf, ln, jenc._outcap(n_sym))
        b2.block_until_ready()
        if r:
            best = min(best, time.time() - t0)
    print(f"PROBE chunk={os.environ.get('LLCT_WALK_SYMCHUNK', '32')} "
          f"device_mps={mp/best:.2f}", flush=True)
    return 0


def main() -> int:
    if sys.argv[1:2] == ["--one"]:
        return _one()
    for v in sys.argv[1:] or ["32", "64", "128"]:
        env = dict(os.environ, LLCT_WALK_SYMCHUNK=str(v))
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            timeout=1500, capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [ln for ln in (r.stdout or "").splitlines()
                 if ln.startswith("PROBE")]
        err = (r.stderr or "").strip().splitlines()
        print(json.dumps({"chunk": v, "rc": r.returncode, "out": lines,
                          "err": err[-1][:120] if r.returncode and err
                          else None, "s": round(time.time() - t0, 1)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
