"""Hardware check: Pallas decode kernel bit-exactness + speed on the real TPU.

Usage: python tools/tpu_decode_check.py [small|big]
"""
import sys, time
import numpy as np
import jax

from llcomp_tpu import oracle, encode as jenc, decode as jdec
from tests.conftest import make_photo  # deterministic synthetic photo

mode = sys.argv[1] if len(sys.argv) > 1 else "small"
print("backend:", jax.default_backend(), flush=True)

if mode == "small":
    H, W, C, S = 4, 6, 3, 3
else:
    H, W, C, S = 8, 512, 3, int(sys.argv[2]) if len(sys.argv) > 2 else 256

rng = np.random.default_rng(7)
imgs = np.stack([
    np.asarray(make_photo(H, W, C)) if i % 2 == 0 else
    rng.integers(0, 256, (H, W, C), dtype=np.uint8).astype(np.uint8)
    for i in range(S)
])
streams = [oracle.encode(img)[6:] for img in imgs] if mode == "small" else jenc.encode_lanes(imgs)
print("encoded", len(streams), "streams, max len", max(map(len, streams)), flush=True)

t0 = time.time()
out = jdec.decode_lanes(streams, (H, W, C), engine="pallas")
t1 = time.time()
ok = np.array_equal(out, imgs)
print(f"BITEXACT={ok} first decode {t1-t0:.1f}s", flush=True)
if not ok:
    bad = [i for i in range(S) if not np.array_equal(out[i], imgs[i])]
    print("mismatched lanes:", bad[:10], flush=True)
    i = bad[0]
    d = np.nonzero(out[i] != imgs[i])
    print("lane", i, "first diffs at", [tuple(x[:5]) for x in d], flush=True)
    print("got ", out[i][d][:8], "want", imgs[i][d][:8], flush=True)
    sys.exit(1)

if mode == "big":
    # fresh-input timing (backend elides repeated identical executions)
    for r in range(3):
        imgs2 = np.stack([rng.integers(0, 256, (H, W, C), dtype=np.uint8) for _ in range(S)])
        st2 = jenc.encode_lanes(imgs2)
        t0 = time.time()
        out2 = jdec.decode_lanes(st2, (H, W, C), engine="pallas")
        dt = time.time() - t0
        mp = S * H * W / 1e6
        print(f"rep{r}: {dt:.3f}s  {mp/dt:.3f} MP/s  exact={np.array_equal(out2, imgs2)}", flush=True)
