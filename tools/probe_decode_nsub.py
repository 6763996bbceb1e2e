#!/usr/bin/env python3
"""Probe the blocked decode kernel's NSUB (lane-groups per instance) at a
given geometry, each value in its own subprocess: a kernel fault kills the
TPU worker for the whole process, so isolation is the only way to bisect.

Usage: python tools/probe_decode_nsub.py [W] [C] [slice_h] [nsubs...]
Reports pass/fail + decode seconds per NSUB.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def _one(W: int, C: int, slice_h: int) -> int:
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from llcomp_tpu import decode as jdec
    from llcomp_tpu import encode as jenc

    H = slice_h
    rng = np.random.default_rng(9)
    n_lanes = 1024  # one encode group; > 8 decode groups
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 64 * np.sin(2 * np.pi * xx / W * 1.5) \
        + 64 * np.cos(2 * np.pi * (yy + 1) / (H + 7))
    lanes = np.clip(
        base[None, ..., None] + np.arange(C)[None, None, None, :] * 10
        + rng.integers(-3, 4, size=(n_lanes, H, W, C)),
        0, 255,
    ).astype(np.uint8)
    t0 = time.time()
    streams = jenc.encode_lanes(lanes, engine="pallas", primed=True)
    print(f"PROBE encode ok s={time.time()-t0:.1f}", flush=True)
    t0 = time.time()
    out = jdec.decode_lanes(streams, (H, W, C), engine="pallas", primed=True)
    exact = bool(np.array_equal(out, lanes))
    print(f"PROBE decode ok s={time.time()-t0:.1f} exact={exact} "
          f"nsub={os.environ.get('LLCT_DECODE_NSUB', 'auto')}", flush=True)
    return 0 if exact else 3


def main() -> int:
    if sys.argv[1:2] == ["--one"]:
        return _one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    slice_h = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    nsubs = [int(v) for v in sys.argv[4:]] or [8, 6, 4, 2]
    results = {}
    for nsub in nsubs:
        env = dict(os.environ, LLCT_DECODE_NSUB=str(nsub))
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             str(W), str(C), str(slice_h)],
            timeout=int(os.environ.get("PROBE_TIMEOUT", "1200")),
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        lines = [ln for ln in (r.stdout or "").splitlines()
                 if ln.startswith("PROBE")]
        errtail = (r.stderr or "").strip().splitlines()
        results[nsub] = {
            "ok": r.returncode == 0,
            "s": round(time.time() - t0, 1),
            "stages": lines,
            "err": errtail[-1][:160] if r.returncode and errtail else None,
        }
        print(f"NSUB={nsub}: {json.dumps(results[nsub])}", flush=True)
    print(json.dumps({"W": W, "C": C, "slice_h": slice_h,
                      "results": {str(k): v["ok"] for k, v in
                                  results.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
