#!/usr/bin/env python3
"""Bisect the round-3 512-wide decode INTERNAL error: same encoded streams
through (A) the r02-era call path (decode_groups, raw planes) and (B) the
current decode_groups_images path.  Usage: --one {A|B|C} in a subprocess.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _one(variant: str) -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from llcomp_tpu import encode as jenc
    from llcomp_tpu.core import transform
    from llcomp_tpu.core.config import REV2
    from llcomp_tpu.pallas import decode_kernel as dk

    H, W, C = 8, 512, 3
    rng = np.random.default_rng(21)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 128 + 64 * np.sin(2 * np.pi * xx / W * 1.5) + 8 * yy
    lanes = np.clip(
        base[None, ..., None] + np.arange(C) * 10
        + rng.integers(-3, 4, size=(1024, H, W, C)),
        0, 255,
    ).astype(np.uint8)
    t0 = time.time()
    streams = jenc.encode_lanes(lanes, engine="pallas", primed=True)
    print(f"PROBE encode ok {time.time()-t0:.1f}s", flush=True)

    S = len(streams)
    G = S // dk.LANES
    cap = max(4096, -(-(max(len(s) for s in streams) + 64) // 4096) * 4096)
    data = np.zeros((G, cap, dk.LANES), dtype=np.uint8)
    for s, blob in enumerate(streams):
        data[s // dk.LANES, : len(blob), s % dk.LANES] = np.frombuffer(
            blob, dtype=np.uint8)
    t0 = time.time()
    if variant == "A":      # r02 path: decode_groups, host unpermute
        planes, err = dk.decode_groups(jnp.asarray(data), H, W, C, REV2,
                                       True)
        planes = np.asarray(planes)
        err = np.asarray(err)
        imgs = np.asarray(transform.rct_inverse(
            jnp.asarray(planes[:, : H * W * C, :].transpose(0, 2, 1)
                        .reshape(G * dk.LANES, H, W, C))))
    elif variant == "B":    # current path: decode_groups_images
        imgs, err = dk.decode_groups_images(jnp.asarray(data), H, W, C,
                                            REV2, True, False, None)
        imgs = np.asarray(imgs)
    else:                   # current path via decode_lanes (full)
        from llcomp_tpu import decode as jdec

        imgs = jdec.decode_lanes(streams, (H, W, C), engine="pallas",
                                 primed=True)
    exact = bool(np.array_equal(np.asarray(imgs)[:S], lanes))
    print(f"PROBE decode {variant} ok {time.time()-t0:.1f}s exact={exact}",
          flush=True)
    return 0 if exact else 3


def main() -> int:
    if sys.argv[1:2] == ["--one"]:
        return _one(sys.argv[2])
    for v in sys.argv[1:] or ["A", "B", "C"]:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", v],
            timeout=1500, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        stages = [ln for ln in (r.stdout or "").splitlines()
                  if ln.startswith("PROBE")]
        errl = (r.stderr or "").strip().splitlines()
        print(f"{v}: rc={r.returncode} {stages} "
              f"err={errl[-1][:140] if r.returncode and errl else None} "
              f"({time.time()-t0:.0f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
