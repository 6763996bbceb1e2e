#!/usr/bin/env python3
"""On-chip kernel smoke gate: Pallas encode+decode bit-exactness across the
reference's input envelope, each geometry in its own subprocess so a kernel
fault costs (and identifies) one config instead of killing the capture.

Run BEFORE any bench (CLAUDE.md).  Geometries cover the three shapes the
driver measures (BASELINE.md): 512-wide RGB, 2048-wide RGB, 256-wide RGBA.
The r02 bench lost two configs + the natural-ratio number to an uncaught
TPU worker fault at 2048/RGBA (VERDICT r2 item 1) — this gate exists so
that class of fault is caught here, cheaply, first.

Usage:
  python tools/chip_smoke.py            # all configs, subprocess-isolated
  python tools/chip_smoke.py --one H CH # one config, in-process (the
                                        # subprocess entry; stage markers
                                        # on stdout identify the fault site)
Env: SMOKE_TIMEOUT (s/config, default 900 — first compile of a fresh
geometry costs minutes on this backend), SMOKE_CONFIGS ("512x3,2048x3").
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# cache Mosaic/XLA compiles across smoke runs and into the bench process
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

# (H, W, C): the three driver geometries plus the round-4 ultra-wide shape
# (width 8192 used to fall off the kernel path entirely — VERDICT r03 #4)
CONFIGS = [(512, 512, 3), (2048, 2048, 3), (256, 256, 4), (256, 8192, 3)]


def _one(H: int, W: int, CH: int) -> int:
    """Encode + decode one small batch at the given geometry, in-process.

    Prints stage markers so a worker crash in the parent's capture points
    at the failing stage.  Uses the same slice-height policy as the bench
    and api.compress (api.pick_slice_height), 2 images -> enough lanes to
    exercise the multi-group kernel path at every geometry.  The 512 config
    additionally proves the kernel guard paths on real Mosaic: a corrupt
    stream must flag exactly its own lane, and 1-row / 1-column images must
    round-trip (VERDICT r03 #8).
    """
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    from llcomp_tpu import api
    from llcomp_tpu import decode as jdec
    from llcomp_tpu import encode as jenc

    slice_h = api.pick_slice_height(H, W, CH)
    while H % slice_h:
        slice_h -= 1
    rng = np.random.default_rng(77)
    # target ~2048 lanes: enough for 2+ decode superblocks at NSUB<=8
    # without making the gate expensive at 4K geometries
    n_img = min(16, max(2, 2048 // (H // slice_h)),
                max(2, 12_000_000 // (H * W)))  # bound smoke work ~12 MP
    yy, xx = np.mgrid[0:H, 0:W]
    imgs = []
    for i in range(n_img):
        base = 120 + 70 * np.sin(2 * np.pi * xx / W * (1 + 0.3 * i)) \
            + 50 * np.cos(2 * np.pi * yy / H * 1.7)
        im = base[..., None] + np.arange(CH)[None, None, :] * 9.0
        im = im + rng.integers(-3, 4, size=(H, W, CH))
        imgs.append(np.clip(im, 0, 255).astype(np.uint8))
    lanes = np.concatenate(
        [im.reshape(H // slice_h, slice_h, W, CH) for im in imgs])
    print(f"SMOKE stage=setup lanes={lanes.shape[0]} slice_h={slice_h} "
          f"platform={jax.default_backend()}", flush=True)

    on_tpu = jax.default_backend() == "tpu"
    engine = "fused" if on_tpu else "xla"   # fused = the round-4 default
    dec_engine = "pallas" if on_tpu else "decision"

    t0 = time.time()
    streams = jenc.encode_lanes(lanes, engine=engine, primed=True)
    print(f"SMOKE stage=encode ok s={time.time()-t0:.1f} "
          f"bytes={sum(len(s) for s in streams)}", flush=True)

    t0 = time.time()
    out = jdec.decode_lanes(streams, (slice_h, W, CH), engine=dec_engine,
                            primed=True)
    exact = bool(np.array_equal(out, lanes))
    print(f"SMOKE stage=decode ok s={time.time()-t0:.1f} exact={exact}",
          flush=True)
    if not exact:
        return 3

    if (H, W) == (512, 512):
        # corrupt-stream decode on the real kernel: exactly the poisoned
        # lane flags, every other lane stays exact (errors='report')
        t0 = time.time()
        bad = list(streams)
        bad[1] = bytes([b ^ 0xA5 for b in bad[1]]) + b"\xff" * 8
        outs, badlanes = jdec.decode_lanes(
            bad, (slice_h, W, CH), engine=dec_engine, primed=True,
            errors="report")
        others_ok = all(
            np.array_equal(outs[i], lanes[i])
            for i in range(len(bad)) if i not in badlanes
        )
        corrupt_ok = bool(badlanes) and 1 in badlanes and others_ok
        print(f"SMOKE stage=corrupt ok s={time.time()-t0:.1f} "
              f"flagged={badlanes[:4]} others_exact={others_ok}", flush=True)
        if not corrupt_ok:
            return 4

        # 1-row and 1-column images through the same kernel engines
        t0 = time.time()
        deg_ok = True
        for shp in ((1, 64, 3), (64, 1, 3)):
            im = (np.arange(np.prod(shp)) * 7 % 251).astype(
                np.uint8).reshape(shp)
            st = jenc.encode_lanes(im[None], engine=engine)
            o = jdec.decode_lanes(st, shp, engine=dec_engine)
            deg_ok = deg_ok and bool(np.array_equal(o[0], im))
        print(f"SMOKE stage=degenerate ok s={time.time()-t0:.1f} "
              f"exact={deg_ok}", flush=True)
        if not deg_ok:
            return 5

    if W >= 4096:
        # the production ultra-wide path is column-TILED (api.pick_tiling,
        # round 5): gate the full api.compress -> decompress pipeline —
        # policy, tiled container, kernels — on real Mosaic, not just the
        # untiled stripe kernels above
        t0 = time.time()
        tw, tsh = api.pick_tiling(H, W, CH)
        blob = api.compress(imgs[0], slices="auto", backend="jax")
        timg = api.decompress(blob, backend="jax")
        tiled_ok = bool(np.array_equal(timg, imgs[0]))
        print(f"SMOKE stage=tiled ok s={time.time()-t0:.1f} tile_w={tw} "
              f"slice_h={tsh} exact={tiled_ok} "
              f"ratio={imgs[0].nbytes / len(blob):.3f}", flush=True)
        if not (tiled_ok and (tw == 0 or blob[7] & 8)):
            return 6
    return 0


def _await_healthy_worker(max_wait_s: int = 900) -> None:
    """Block until a trivial TPU program runs fast in a subprocess.

    After a kernel fault the remote worker can stay SICK for minutes
    (INTERNAL / FAILED_PRECONDITION errors, 100x slowdowns) — testing the
    next config against a sick worker produces false failures
    (docs/DESIGN.md round-3 backend notes).
    """
    probe = ("import jax, jax.numpy as jnp; "
             "print(int((jnp.arange(1<<20)*3).sum()) % 97)")
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        t1 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=120,
                               capture_output=True)
            if r.returncode == 0 and time.time() - t1 < 30:
                return
        except subprocess.TimeoutExpired:
            pass
        print(f"SMOKE worker unhealthy ({time.time()-t1:.0f}s probe); "
              "waiting 60s", flush=True)
        time.sleep(60)


def main() -> int:
    if len(sys.argv) >= 5 and sys.argv[1] == "--one":
        return _one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))

    configs = CONFIGS
    if os.environ.get("SMOKE_CONFIGS"):
        configs = []
        for c in os.environ["SMOKE_CONFIGS"].split(","):
            parts = [int(v) for v in c.split("x")]
            if len(parts) == 2:       # legacy "HxC" form: square images
                parts = [parts[0], parts[0], parts[1]]
            configs.append(tuple(parts))
    timeout = int(os.environ.get("SMOKE_TIMEOUT", "900"))
    results = {}
    ok_all = True
    for (H, W, CH) in configs:
        key = f"{H}x{W}x{CH}"
        _await_healthy_worker()
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--one", str(H), str(W), str(CH)],
                timeout=timeout, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(
                    __file__))),
            )
            tail = (r.stdout or "").strip().splitlines()
            stages = [ln for ln in tail if ln.startswith("SMOKE ")]
            if r.returncode == 0:
                results[key] = {"ok": True, "s": round(time.time() - t0, 1)}
            else:
                err = (r.stderr or "").strip().splitlines()
                results[key] = {
                    "ok": False,
                    "rc": r.returncode,
                    "last_stage": stages[-1] if stages else None,
                    "err": err[-1][:200] if err else None,
                }
                ok_all = False
        except subprocess.TimeoutExpired:
            results[key] = {"ok": False, "err": f"timeout {timeout}s"}
            ok_all = False
        print(f"{key}: {json.dumps(results[key])}", flush=True)
    print(json.dumps({"smoke_ok": ok_all, "configs": results}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
