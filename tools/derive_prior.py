#!/usr/bin/env python3
"""Derive the sliced-mode model-prior constants (tables.PRIOR_SUB).

Sliced containers restart the adaptive model per stripe, which costs ratio
(the reference format has no sliced mode — `llcomp.hpp` always codes one
stream — so this is our own container's problem to solve).  Measured on the
oracle (round 2): resetting each context row to a fixed per-substate state
instead of state 0 recovers ~70% of the restart loss for free, because most
of what the model learns is universal structure, not image content:

  * substate 0 (zero-flag): residual==0 is coded as bit 1 and is by far the
    most common outcome on photographic content -> a state deep on the
    "ones" side;
  * substates 1-4 (exponent unary): continuation bits are likely at low
    exponent indices and unlikely at high ones;
  * substate 5-6 (mantissa) and 7 (sign): near 50/50.

This script derives the 8 constants by pooling per-substate bit counts over
a mixed synthetic corpus (gradients x noise levels x frequencies, i.e. NOT
the benchmark corpus) and picking, per substate, the 128-state-machine state
whose probability is closest to the pooled p1 (reachable within the pooled
evidence depth).

The SHIPPED prior goes further: it buckets the pooled counts by the hash's
two low quantizer components (bucket = hash % 121) so busy and smooth
neighborhoods get different start rows — `tables.PRIOR_TAB[121][8]`,
derived and ratio-evaluated in `tools/eval_bucketed_prior.py` (bench
corpus, 8-row stripes: 1.892 cold / 2.075 constant row / 2.186 bucketed vs
2.199 unsliced).  The constant row derived here survives as PRIOR_SUB, the
fallback for buckets with no training evidence.  Both are FORMAT CONSTANTS
of sliced-container flag bit 0 ("primed"): encoder and decoder must use
identical values forever; re-running these scripts is for documentation,
not for regenerating the tables.
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from llcomp_tpu import oracle  # noqa: E402
from llcomp_tpu.core import tables  # noqa: E402
from llcomp_tpu.core.config import REV2 as cfg  # noqa: E402


def make_train(h, w, c, seed, noise, fx, fy):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 64 * np.sin(2 * np.pi * xx / w * fx)
        + 64 * np.cos(2 * np.pi * yy / h * fy)
    )
    img = base[..., None] + np.arange(c)[None, None, :] * 13.0
    if noise:
        img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


def substate_counts(img):
    v = oracle.rct_forward(img)
    hash_, diff = oracle.context_and_residual(v, cfg)
    ctx, bit, valid = oracle.binarize(diff, cfg)
    sub = ctx[valid].astype(np.int64)
    b = bit[valid].astype(np.int64)
    n1 = np.bincount(sub[b == 1], minlength=cfg.substates)
    n0 = np.bincount(sub[b == 0], minlength=cfg.substates)
    return n0, n1


def pick_states(n0, n1):
    n = n0 + n1
    p1 = np.where(n > 0, 256.0 * n1 / np.maximum(n, 1), 128.0)
    prob = tables.STATE_PROB.astype(np.float64)
    return np.argmin(np.abs(prob[None, :] - p1[:, None]), axis=1), p1


def main():
    n0 = np.zeros(cfg.substates, np.int64)
    n1 = np.zeros(cfg.substates, np.int64)
    i = 0
    for noise in (2, 4, 6, 10):
        for fx, fy in ((0.7, 1.9), (1.3, 0.4), (2.6, 2.1)):
            img = make_train(192, 192, 3, 7_000 + i, noise, fx, fy)
            a, b = substate_counts(img)
            n0 += a
            n1 += b
            i += 1
    states, p1 = pick_states(n0, n1)
    print("pooled p1*256 per substate:", p1.round(1))
    print("PRIOR_SUB =", states.tolist())
    # Held-out measurements (oracle, 128^2 images, 8-row stripes, round 2):
    #   bench-style photos  1.744 cold -> 1.981 primed (+13.6%)
    #   noisy photos        1.187 cold -> 1.419 primed (+19.5%)
    #   pure noise          0.674 cold -> 0.680 primed (no harm)
    #   flat/step content   2.800 cold -> 2.553 primed (HURTS)
    # so the encoder applies the prior only when the image's zero-residual
    # fraction is below PRIMED_ZERO_FRAC_MAX (api.py) — flat content, whose
    # model wants the zero-leaning state-0 start, stays cold; the container
    # flag records the choice per file (decoder policy-free).


if __name__ == "__main__":
    main()
