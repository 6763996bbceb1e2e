#!/usr/bin/env python3
"""Tunnel health probe: compute latency + sustained D2H rate.

The decode e2e metric is download-bound in this dev environment (the
chip's pixels come back over the tunnel at 0.5-40 MB/s depending on the
window — docs/DESIGN.md hazards), so captures should be taken when the
link is healthy.  Prints one JSON line:

    {"compute_s": ..., "down_mbs": ..., "healthy": bool}

Heuristics: download >= LINK_HEALTHY_MBS (default 18 — the windows that
produced the record captures measured ~19+); compute only guards the
wedge (< 60 s — a fresh-process handshake alone can cost 25 s in an
otherwise fast window, measured r5l; the wedged mode hangs forever, so
run under timeout).

Usage:  timeout 150 python tools/probe_link.py
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")


def main() -> int:
    thresh = float(os.environ.get("LINK_HEALTHY_MBS", "18"))
    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jnp.ones((256, 256))
    float((x @ x).sum())
    compute_s = time.time() - t0

    mb = 16
    a = jnp.asarray(np.zeros((mb << 20,), np.uint8))
    b = a + 1
    b.block_until_ready()
    t1 = time.time()
    np.asarray(b)
    down = mb / (time.time() - t1)
    out = {
        "compute_s": round(compute_s, 1),
        "down_mbs": round(down, 1),
        "platform": jax.devices()[0].platform,
        "healthy": bool(compute_s < 60 and down >= thresh),
    }
    print(json.dumps(out))
    return 0 if out["healthy"] else 1


if __name__ == "__main__":
    sys.exit(main())
