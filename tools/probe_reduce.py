"""Probe: Mosaic lowering of full vector->scalar reductions + pl.when.

The fused encode kernel design (round 4) needs, once per symbol-quarter:
    mx = jnp.max(fill)            # (NSUB,128) i32 -> scalar
    @pl.when(mx > THRESH): ...    # rare flush body (staging loop + DMA)
plus a conditional-select path on the same scalar.  This probes exactly
that shape on hardware: a kernel that accumulates per-lane counters and
flushes them to an output row when the max crosses a threshold.

Run on the chip:  python tools/probe_reduce.py
"""
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N = 8


def _kernel(x_ref, out_ref, cnt_ref):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        cnt_ref[:] = jnp.zeros((N, LANES), jnp.int32)
        out_ref[:] = jnp.zeros((16, LANES), jnp.int32)

    def step(j, carry):
        fill, acc = carry
        v = x_ref[pl.ds(j * N, N), :]
        fill = fill + (v & 1)
        acc = acc + v
        mx = jnp.max(fill)
        do = mx > 3

        @pl.when(do)
        def _():
            out_ref[0:N, :] = out_ref[0:N, :] + fill

        fill = jnp.where(do, 0, fill)
        return fill, acc

    fill, acc = jax.lax.fori_loop(0, 4, step, (cnt_ref[:], cnt_ref[:] * 0))
    cnt_ref[:] = fill
    out_ref[8:16, :] = acc


@functools.partial(jax.jit, static_argnames=())
def run(x):
    return pl.pallas_call(
        _kernel,
        grid=(x.shape[0] // 32,),
        in_specs=[pl.BlockSpec((32, LANES), lambda c: (c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, LANES), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((N, LANES), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(x)


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, (64, LANES)).astype(np.int32)
    got = np.asarray(run(jnp.asarray(x)))

    # reference semantics
    fill = np.zeros((N, LANES), np.int64)
    out = np.zeros((N, LANES), np.int64)
    for c in range(2):
        acc = np.zeros((N, LANES), np.int64)  # resets per grid step
        for j in range(4):
            v = x[c * 32 + j * N : c * 32 + (j + 1) * N]
            fill += v & 1
            acc += v
            if fill.max() > 3:
                out += fill
                fill[:] = 0
    ok_flush = np.array_equal(got[0:N], out)
    ok_acc = np.array_equal(got[8:16], acc)
    print(f"max-reduce+pl.when probe: flush={'OK' if ok_flush else 'FAIL'} "
          f"acc={'OK' if ok_acc else 'FAIL'}")
    if not (ok_flush and ok_acc):
        print("got flush rows:\n", got[0:2, :8])
        print("want:\n", out[:2, :8])
        raise SystemExit(1)


if __name__ == "__main__":
    main()
