"""Timing ablation for the Pallas decode kernel on real TPU hardware.

argv[1]: comma-separated ablation variants ("baseline" for none).
argv[2]: lane count S (default 256; 128 lanes = one kernel group).

Splits per-symbol cost into (a) the per-lane staging loops (model row pair
in/out + byte window) and (b) the 24-step decision machine, by compiling
bit-INEXACT kernel variants that skip one or the other.  Timing only —
never use the ablated outputs.

Usage: python tools/probe_decode_ablate.py
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from llcomp_tpu import encode as jenc
from llcomp_tpu.core.config import REV2
from llcomp_tpu.pallas import decode_kernel as dk

H, W, C, S = 8, 512, 3, int(sys.argv[2]) if len(sys.argv) > 2 else 256
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(11)


def fresh_data(tag):
    imgs = np.stack(
        [rng.integers(0, 256, (H, W, C), dtype=np.uint8) for _ in range(S)]
    )
    streams = jenc.encode_lanes(imgs)
    cap = 4096
    while max(map(len, streams)) + 64 > cap:
        cap += 4096
    G = -(-S // dk.LANES)
    data = np.zeros((G, cap, dk.LANES), dtype=np.uint8)
    for s, blob in enumerate(streams):
        data[s // dk.LANES, : len(blob), s % dk.LANES] = np.frombuffer(
            blob, dtype=np.uint8
        )
    return jnp.asarray(data)


VARIANTS = sys.argv[1].split(",") if len(sys.argv) > 1 else [
    "", "nostagein", "nostageout", "decis1"
]
VARIANTS = ["" if v == "baseline" else v for v in VARIANTS]
fns = {
    v: jax.jit(
        functools.partial(dk._decode_groups_impl, ablate=v),
        static_argnames=("H", "W", "C", "cfg"),
    )
    for v in VARIANTS
}

mp = S * H * W / 1e6
for v in VARIANTS:
    for r in range(3):
        d = fresh_data(f"{v}-{r}")
        t0 = time.time()
        planes, err = fns[v](d, H=H, W=W, C=C, cfg=REV2)
        jax.block_until_ready((planes, err))
        dt = time.time() - t0
        label = "compile+run" if r == 0 else "run"
        print(f"{v or 'baseline':12s} rep{r} ({label}): {dt:7.3f}s"
              f"  {mp/dt:6.3f} MP/s", flush=True)
