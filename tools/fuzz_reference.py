#!/usr/bin/env python3
"""Extended conformance fuzz against the compiled C++ reference.

Random shapes/content -> oracle bytes must equal the reference encoder's
bytes AND every engine must agree, plus decode round-trips.  This is the
suite's conformance axis at 10-20x the per-run seed count (run ad hoc on
CPU; round 5 ran 150 seeds clean).

  python tools/fuzz_reference.py [n_seeds] [--ref /tmp/refbuild/ref_oracle]

The reference binary is the buffer-size-patched build from
.claude/skills/verify/SKILL.md (the patch only prevents the reference's
own output-buffer overflow, SURVEY §2.9 — it cannot change emitted
bytes).  Only C>=3 shapes are cross-checked byte-for-byte (the
reference's c<3 decode is broken; our engines still round-trip them).
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

from llcomp_tpu import decode as jdec
from llcomp_tpu import encode as jenc
from llcomp_tpu import oracle

REF = "/tmp/refbuild/ref_oracle"
if "--ref" in sys.argv:
    REF = sys.argv[sys.argv.index("--ref") + 1]
N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 150


def ref_encode(img):
    h, w, c = img.shape
    r = subprocess.run([REF, "c", str(w), str(h), str(c)],
                       input=img.tobytes(), capture_output=True, check=True)
    return r.stdout


fails = 0
for seed in range(N):
    rng = np.random.default_rng(77000 + seed)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    c = int(rng.choice([1, 2, 3, 4]))
    style = seed % 4
    if style == 0:
        img = rng.integers(0, 256, (h, w, c), dtype=np.uint8)
    elif style == 1:
        img = np.full((h, w, c), int(rng.integers(0, 256)), np.uint8)
    elif style == 2:
        img = np.clip(int(rng.integers(0, 256)) + np.cumsum(
            rng.integers(-2, 3, (h, w, c)), axis=1), 0, 255).astype(np.uint8)
    else:
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(128 + 60 * np.sin(xx / max(3, w / 5))[..., None]
                      + rng.integers(-4, 5, (h, w, c)), 0, 255
                      ).astype(np.uint8)

    try:
        want = oracle.encode(img)
        if c >= 3 and os.path.exists(REF):
            ref = ref_encode(img)
            assert want == ref, "oracle != reference"
        for engine in ("xla", "fused"):
            got = jenc.encode_lanes(img[None], engine=engine)[0]
            assert got == want[6:], f"engine {engine} mismatch"
        out = jdec.decode_lanes([want[6:]], (h, w, c), engine="decision")
        assert np.array_equal(out[0], img), "roundtrip mismatch"
    except Exception as e:
        fails += 1
        print(f"FAIL seed={seed} shape={(h, w, c)} style={style}: {e}",
              flush=True)
    if (seed + 1) % 25 == 0:
        print(f"{seed + 1}/{N} done, {fails} failures", flush=True)
        # every random shape is a fresh XLA:CPU compile; past ~50 unique
        # programs LLVM dies with "compilation error: Cannot allocate
        # memory" (SIGABRT) — the same cumulative-compile crash the test
        # suite hits (docs/DESIGN.md round-4 resumed notes).  Dropping
        # the executables periodically keeps the accumulation bounded.
        jax.clear_caches()

print(f"fuzz_reference: {N} seeds, {fails} failures", flush=True)
sys.exit(1 if fails else 0)
