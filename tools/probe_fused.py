"""On-chip probe for the fused stream-order encode kernel (round 4).

1. exactness: 130 small lanes + the bench geometry (16x 512x512x3 as 8-row
   stripes = 1024 lanes), plain/primed/seeded, bytes vs the native C++
   runtime (independently conformance-tested engine);
2. timing: device-chain time with resident inputs (fresh values each
   round — the backend elides repeated identical executions) and e2e.

Run alone on the chip:  python tools/probe_fused.py [--quick]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def make_photo(h, w, c=3, seed=42, noise=3):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = (
        128
        + 60 * np.sin(x[..., None] / 37.0 + np.arange(c) * 0.7)
        + 50 * np.cos(y[..., None] / 23.0)
    )
    img = base + rng.normal(0, noise, (h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


def main():
    quick = "--quick" in sys.argv
    from llcomp_tpu import encode as jenc
    from llcomp_tpu import host
    from llcomp_tpu import seed as seedmod

    print("backend:", jax.default_backend(), flush=True)

    # --- exactness: small multi-group ---------------------------------
    t0 = time.time()
    lanes = np.stack([make_photo(2, 8, seed=i) for i in range(130)])
    got = jenc.encode_lanes(lanes, engine="fused")
    want = host.encode_images(lanes)
    bad = [i for i in range(130) if got[i] != want[i]]
    print(f"small130: {'OK' if not bad else f'FAIL {bad[:8]}'} "
          f"({time.time()-t0:.1f}s)", flush=True)
    if bad:
        return 1

    # --- exactness: bench geometry, plain + primed + seeded -----------
    imgs = [make_photo(512, 512, seed=100 + i) for i in range(16)]
    stripes = np.stack([im[y : y + 8] for im in imgs
                        for y in range(0, 512, 8)])
    tab = seedmod.derive_pooled(imgs[:4])
    for name, kw in (("plain", {}), ("primed", {"primed": True}),
                     ("seeded", {"seed": tab})):
        t0 = time.time()
        got = jenc.encode_lanes(stripes, engine="fused", **kw)
        t1 = time.time()
        want = host.encode_images(stripes, primed=kw.get("primed", False),
                                  seed=kw.get("seed"))
        bad = [i for i in range(len(stripes)) if got[i] != want[i]]
        print(f"bench-geom {name}: {'OK' if not bad else f'FAIL {bad[:8]}'} "
              f"(fused {t1-t0:.1f}s incl compile)", flush=True)
        if bad:
            return 1
        if quick:
            break

    # --- timing: e2e fresh-input rounds -------------------------------
    MP = stripes.shape[0] * 8 * 512 / 1e6
    for rnd in range(3):
        fresh = [make_photo(512, 512, seed=500 + 16 * rnd + i)
                 for i in range(16)]
        fs = np.stack([im[y : y + 8] for im in fresh
                       for y in range(0, 512, 8)])
        t0 = time.time()
        out = jenc.encode_lanes(fs, engine="fused", primed=True)
        dt = time.time() - t0
        print(f"e2e round {rnd}: {dt:.3f}s = {MP/dt:.2f} MP/s "
              f"({sum(map(len, out))} B)", flush=True)

    # --- timing: device-dominated, per-stage, fresh values each round --
    from llcomp_tpu.pallas import encode_fused as ef
    n_sym = 8 * 512 * 3
    nsubs = [int(s) for s in
             sys.argv[sys.argv.index("--nsub") + 1].split(",")] \
        if "--nsub" in sys.argv else [None]
    for nsub_req in nsubs:
        if nsub_req is not None:
            import os
            os.environ["LLCT_FUSED_NSUB"] = str(nsub_req)
        NSUB, mcap = ef.pick_geometry(n_sym, 8)
        print(f"NSUB={NSUB} mcap={mcap}", flush=True)
        for rnd in range(2):
            fresh = [make_photo(512, 512, seed=900 + 16 * rnd + i)
                     for i in range(16)]
            fs = np.stack([im[y : y + 8] for im in fresh
                           for y in range(0, 512, 8)])
            flat = jax.device_put(jenc._flat_host(fs))
            jax.block_until_ready(flat)
            t0 = time.time()
            imgs_g = jenc._regroup_device_nsub(flat, NSUB)
            hash_g, diff_g, _ = jenc._stage_precompute_g(imgs_g, 8, 512, 3)
            xs = jenc._stage_xs_fused(hash_g, diff_g, n_sym)
            jax.block_until_ready(xs)
            t_pre = time.time() - t0
            t0 = time.time()
            mk, lens, ovf = ef.encode_fused_groups(xs, mcap, primed=True)
            jax.block_until_ready(lens)
            t_kern = time.time() - t0
            lens_np = np.asarray(lens).reshape(-1)
            cap2 = max(1024, -(-int(lens_np.max()) // 1024) * 1024)
            t0 = time.time()
            byts = jenc._expand_markers_jit(mk, cap2)
            jax.block_until_ready(byts)
            t_exp = time.time() - t0
            tot = t_pre + t_kern + t_exp
            print(f"  r{rnd}: pre {t_pre:.3f} kern {t_kern:.3f} "
                  f"expand {t_exp:.3f} -> device {MP/tot:.2f} MP/s "
                  f"(kern-only {MP/t_kern:.2f}, "
                  f"ovf={int(np.asarray(ovf).max())}, "
                  f"meanlen={lens_np.mean():.0f})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
