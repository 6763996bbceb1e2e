"""Round-2 probes, part 3: scalar gating + stage-loop cost split.

  pG: @pl.when(jnp.max(vreg) > t) -- vector->sreg reduction as a branch pred
  pH: per-symbol stage-loop cost split: model-rows only vs model+window,
      T=256 symbols x 128 lanes (the decode kernel's hot structure)
  pI: early-exit: value-carried 24-step loop wrapped in lax.cond legality
"""
from __future__ import annotations

import sys, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 15872


def run(name, build, reps=0):
    try:
        fn, make_args = build()
        fn = jax.jit(fn)
        t0 = time.time()
        out = jax.block_until_ready(fn(*make_args(0)))
        dt = time.time() - t0
        head = np.asarray(out).ravel()[:4].tolist()
        print(f"PASS {name}: compile+run {dt:.1f}s out[:4]={head}", flush=True)
        if reps:
            ts = []
            for r in range(1, reps + 1):
                args = make_args(r)
                t0 = time.time()
                np.asarray(jax.block_until_ready(fn(*args)))  # force fetch
                ts.append(time.time() - t0)
            print(f"     {name}: per-run {['%.4f' % t for t in ts]}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).split("\n") if ln.strip()]
        key = next((ln for ln in lines if "Mosaic" in ln or "prove" in ln
                    or "Not implemented" in ln or "Unsupported" in ln), lines[0])
        print(f"FAIL {name}: {type(e).__name__}: {key[:300]}", flush=True)
        return False


# pG: scalar-reduce branch predicate
def pG_scalar_gate():
    def kernel(x_ref, out_ref):
        v = x_ref[:]
        mx = jnp.max(v)

        @pl.when(mx > 100)
        def _():
            out_ref[:] = v + 1

        @pl.when(mx <= 100)
        def _():
            out_ref[:] = v - 1

    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        )(x)

    def make_args(r):
        rng = np.random.default_rng(r)
        return (jnp.asarray(rng.integers(0, 90 + 20 * (r % 2), (8, LANES)),
                            dtype=jnp.int32),)

    return lambda: (fn, make_args)


# pH: stage cost split over T symbols
def pH_stage(T=256, window=True, label="pH"):
    def kernel(idx_ref, data_ref, out_ref, model, vscr, sscr, sem):
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        @pl.when(pl.program_id(0) == 0)
        def _():
            model[:] = jnp.zeros((ROWS, LANES), jnp.int32)

        def sym(s, carry):
            r0 = (idx_ref[pl.ds(s % 64, 1), :] + carry) % (ROWS - 16)
            r0 = (r0 // 2) * 2
            vscr[0:1, :] = r0
            vscr[1:2, :] = (r0 % 992)
            cp = pltpu.make_async_copy(vscr, sscr, sem)
            cp.start()
            cp.wait()
            zero1 = jnp.zeros((1, LANES), jnp.int32)

            def stage_in(l, acc):
                wa, wb, wind = acc
                r = sscr[0, l]
                wa = jnp.where(lane1 == l, model[pl.ds(r, 1), :], wa)
                wb = jnp.where(lane1 == l, model[pl.ds(r + 1, 1), :], wb)
                if window:
                    b = sscr[1, l]
                    wind = jnp.where(lane8 == l, data_ref[pl.ds(b, 8), :], wind)
                return wa, wb, wind

            wa, wb, wind = jax.lax.fori_loop(
                0, LANES, stage_in,
                (zero1, zero1, jnp.zeros((8, LANES), jnp.int32)))

            w0 = wa + 1
            w1 = wb + 1

            def stage_out(l, _):
                r = sscr[0, l]
                ra = model[pl.ds(r, 1), :]
                model[pl.ds(r, 1), :] = jnp.where(lane1 == l, w0, ra)
                rb = model[pl.ds(r + 1, 1), :]
                model[pl.ds(r + 1, 1), :] = jnp.where(lane1 == l, w1, rb)
                return 0

            jax.lax.fori_loop(0, LANES, stage_out, 0)
            return (carry + jnp.sum(wind)) % 1009

        acc = jax.lax.fori_loop(0, T, sym, jnp.zeros((), jnp.int32))
        out_ref[:] = jnp.zeros((8, LANES), jnp.int32) + acc

    def fn(idx, data):
        return pl.pallas_call(
            kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((ROWS, LANES), jnp.int32),
                pltpu.VMEM((2, LANES), jnp.int32),
                pltpu.SMEM((2, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx, data)

    def make_args(r):
        rng = np.random.default_rng(100 + r)
        return (
            jnp.asarray(rng.integers(0, ROWS - 16, (64, LANES)), jnp.int32),
            jnp.asarray(rng.integers(0, 1 << 20, (1024, LANES)), jnp.int32),
        )

    return lambda: (fn, make_args)


if __name__ == "__main__":
    which = sys.argv[1:] or ["pG", "pHw", "pHn"]
    if "pG" in which:
        run("pG_scalar_gate", pG_scalar_gate(), reps=2)
    if "pHw" in which:
        run("pH_window", pH_stage(T=256, window=True), reps=3)
    if "pHn" in which:
        run("pH_nowindow", pH_stage(T=256, window=False), reps=3)


def main2():
    # isolate per-symbol stage cost from the fixed 8MB model-init cost
    run("pH_T32", pH_stage(T=32, window=True), reps=3)
    run("pH_T512", pH_stage(T=512, window=True), reps=3)
    run("pH_T512_nw", pH_stage(T=512, window=False), reps=3)
