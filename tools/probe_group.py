"""Probe: host-side lane grouping vs device-side relayout (encode upload path).

The shipped encode path pre-groups lanes on the host (_group_host: a strided
u8 transpose, ~0.16 s per 12.6 MB batch) because device-side relayouts were
assumed expensive.  But a relayout is ~1 s/GB on this backend => ~13 ms for a
batch, and the flat upload moves the same bytes.  Measure both, verify
equality, and time the full chain with each feed.

Run on the chip:  python tools/probe_group.py
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from llcomp_tpu import encode as jenc  # noqa: E402
from llcomp_tpu.pallas import encode_kernels as pk  # noqa: E402
from bench import make_photo  # noqa: E402

H = W = 512
CH = 3
SLICE = 8
N_IMG = 16


def batch(tag):
    return np.concatenate(
        [make_photo(H, W, c=CH, seed=4200 + tag * 13 + i).reshape(
            H // SLICE, SLICE, W, CH) for i in range(N_IMG)]
    )


def flat_host(imgs):
    """[S, h, W, C] -> [Sp, n_pad] u8, contiguous memcpy only."""
    import math
    S = imgs.shape[0]
    C = imgs.shape[-1]
    n_sym = int(np.prod(imgs.shape[1:]))
    quantum = math.lcm(2 * pk.SCHUNK, 128, C)
    n_pad = -(-n_sym // quantum) * quantum
    Sp = -(-S // pk.GROUP) * pk.GROUP
    buf = np.zeros((Sp, n_pad), dtype=np.uint8)
    buf[:S, :n_sym] = imgs.reshape(S, n_sym)
    return buf


@jax.jit
def regroup(flat):
    Sp, n_pad = flat.shape
    G = Sp // (pk.SUBS * pk.LANES)
    return flat.reshape(G, pk.SUBS, pk.LANES, n_pad).transpose(0, 3, 1, 2)


def main():
    imgs = batch(0)
    # equality check
    a = jenc._group_host(imgs)
    fl = flat_host(imgs)
    b = np.asarray(regroup(jax.device_put(fl)))
    print("equal:", np.array_equal(a, b))

    reps = 4
    # host grouping alone
    ts = []
    for r in range(reps):
        im = batch(10 + r)
        t0 = time.time()
        g = jenc._group_host(im)
        ts.append(time.time() - t0)
    print(f"host _group_host: {min(ts):.3f}s")

    # flat host pack alone
    ts = []
    for r in range(reps):
        im = batch(20 + r)
        t0 = time.time()
        fl = flat_host(im)
        ts.append(time.time() - t0)
    print(f"host flat pack:   {min(ts):.3f}s")

    # A: grouped upload (shipped): group + device_put + block
    ts = []
    for r in range(reps):
        im = batch(30 + r)
        t0 = time.time()
        u = jax.device_put(jenc._group_host(im))
        u.block_until_ready()
        ts.append(time.time() - t0)
    print(f"A group+upload:   {min(ts):.3f}s")

    # B: flat upload + device regroup + block
    ts = []
    for r in range(reps):
        im = batch(40 + r)
        t0 = time.time()
        u = regroup(jax.device_put(flat_host(im)))
        u.block_until_ready()
        ts.append(time.time() - t0)
    print(f"B flat+regroup:   {min(ts):.3f}s")


if __name__ == "__main__":
    main()
