"""Round-2 Mosaic probes: the vector->scalar bridge and dynamic-sublane ops.

Finding from probe_mosaic.py: per-lane *lane-dim* addressing is the illegal
part ("cannot statically prove that index in dimension 1 is a multiple of
128"); these probes test whether dynamic *sublane* (dim-0) addressing plus a
VMEM->SMEM DMA bridge gives everything the decode kernel needs:

  pA: DMA (1,128) VMEM scratch -> SMEM scratch, then scalar SMEM reads
  pB: dynamic model-row load  model[pl.ds(r,1), :]  with r from SMEM
  pC: dynamic model-row STORE (read-modify-write) with r from SMEM
  pD: dynamic (8,128) and (16,128) window loads at SMEM scalar offset
  pE: take_along_axis legality at (16,128) and (32,128)
  pF: full mock symbol step (DMA bridge + 128-lane stage in/out + 24
      unrolled decisions) -- the decode kernel cost model
"""
from __future__ import annotations

import sys
import time

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
                jax.block_until_ready(fn(*args))
                ts.append(time.time() - t0)
            print(f"     {name}: per-run {['%.4f' % t for t in ts]}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        lines = [ln for ln in str(e).split("\n") if ln.strip()]
        key = next((ln for ln in lines if "Mosaic" in ln or "prove" in ln
                    or "Not implemented" in ln or "Unsupported" in ln), lines[0])
        print(f"FAIL {name}: {type(e).__name__}: {key[:300]}", flush=True)
        return False


def _idx(r, rows=ROWS - 16):
    rng = np.random.default_rng(r)
    return jnp.asarray(rng.integers(0, rows, size=(1, LANES)), dtype=jnp.int32)


def _src(r, rows=ROWS):
    rng = np.random.default_rng(100 + r)
    return jnp.asarray(
        rng.integers(0, 1 << 20, size=(rows, LANES)), dtype=jnp.int32
    )


# pA: vector->scalar bridge: write row to VMEM scratch, DMA to SMEM, read
def pA_dma_bridge():
    def kernel(idx_ref, out_ref, vscr, sscr, sem):
        vscr[0:1, :] = idx_ref[0:1, :] * 2 + 1
        dma = pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem)
        dma.start()
        dma.wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(l, acc):
            return jnp.where(lane == l, sscr[0, l], acc)

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, LANES, body, jnp.zeros((1, LANES), jnp.int32)
        )

    def fn(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, LANES), jnp.int32),
                pltpu.SMEM((1, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx)

    return fn, lambda r: (_idx(r),)


# pB: dynamic model-row load with r from SMEM scalar
def pB_dyn_row_load():
    def kernel(idx_ref, src_ref, out_ref, vscr, sscr, sem):
        vscr[0:1, :] = idx_ref[0:1, :]
        pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).start()
        pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(l, acc):
            r = sscr[0, l]
            row = src_ref[pl.ds(r, 1), :]
            return jnp.where(lane == l, row, acc)

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, LANES, body, jnp.zeros((1, LANES), jnp.int32)
        )

    def fn(idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, LANES), jnp.int32),
                pltpu.SMEM((1, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx, src)

    return fn, lambda r: (_idx(r), _src(r))


# pC: dynamic model-row RMW (load row, blend one lane, store row back)
def pC_dyn_row_rmw():
    def kernel(idx_ref, val_ref, out_ref, model, vscr, sscr, sem):
        model[0:8, :] = jnp.zeros((8, LANES), jnp.int32)
        vscr[0:1, :] = idx_ref[0:1, :] % 8
        pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).start()
        pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(l, _):
            r = sscr[0, l]
            row = model[pl.ds(r, 1), :]
            model[pl.ds(r, 1), :] = jnp.where(lane == l, val_ref[0:1, :], row)
            return 0

        jax.lax.fori_loop(0, LANES, body, 0)
        out_ref[:] = model[0:8, :]

    def fn(idx, val):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ROWS, LANES), jnp.int32),
                pltpu.VMEM((1, LANES), jnp.int32),
                pltpu.SMEM((1, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx, val)

    return fn, lambda r: (_idx(r), _src(r, rows=1))


# pD: dynamic window loads at SMEM scalar offset
def pD_window_load(win=8):
    def kernel(idx_ref, src_ref, out_ref, vscr, sscr, sem):
        vscr[0:1, :] = jnp.minimum(idx_ref[0:1, :], ROWS - win)
        pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).start()
        pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).wait()
        lane = jax.lax.broadcasted_iota(jnp.int32, (win, LANES), 1)

        def body(l, acc):
            r = sscr[0, l]
            w = src_ref[pl.ds(r, win), :]
            return jnp.where(lane == l, w, acc)

        out_ref[:] = jax.lax.fori_loop(
            0, LANES, body, jnp.zeros((win, LANES), jnp.int32)
        )

    def fn(idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((win, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((1, LANES), jnp.int32),
                pltpu.SMEM((1, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx, src)

    return fn, lambda r: (_idx(r), _src(r))


# pE: take_along_axis legality at taller-than-8 sublane counts
def pE_taa(rows=16):
    def kernel(idx_ref, src_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :] % rows, (rows, LANES))
        out_ref[0:1, :] = jnp.take_along_axis(src_ref[:], idx, axis=0)[0:1, :]

    def fn(idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, src[:rows])

    return fn, lambda r: (_idx(r), _src(r))


# pF: full mock symbol step, T symbols: DMA bridge + per-lane stage-in of a
#     2-word model row + 24 unrolled decisions + per-lane stage-out
def pF_symbol_step(T=256):
    def kernel(idx_ref, out_ref, model, vscr, sscr, sem):
        model[0:8, :] = jnp.zeros((8, LANES), jnp.int32)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sym(s, carry):
            # per-lane pseudo-random model row (even, so r and r+1 are a pair)
            h = ((idx_ref[0:1, :] * (s + 1) + s * 40503) % (ROWS // 2 - 1)) * 2
            vscr[0:1, :] = h
            pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).start()
            pltpu.make_async_copy(vscr.at[0:1, :], sscr, sem).wait()
            zero = jnp.zeros((1, LANES), jnp.int32)

            def stage_in(l, acc):
                a, b = acc
                r = sscr[0, l]
                ra = model[pl.ds(r, 1), :]
                rb = model[pl.ds(r + 1, 1), :]
                return (jnp.where(lane1 == l, ra, a),
                        jnp.where(lane1 == l, rb, b))

            wa, wb = jax.lax.fori_loop(0, LANES, stage_in, (zero, zero))
            rows = jnp.concatenate(
                [(wa >> (k * 8)) & 0xFF for k in range(4)]
                + [(wb >> (k * 8)) & 0xFF for k in range(4)], axis=0)

            acc = carry
            for d in range(24):  # unrolled decision loop
                ctx = (acc + d) & 7
                pick = jnp.take_along_axis(
                    rows, jnp.broadcast_to(ctx, (8, LANES)), axis=0)[0:1, :]
                acc = (acc * 5 + pick + 1) & 0x7FFF
                upd = jnp.broadcast_to(ctx, (8, LANES)) == sub8
                rows = jnp.where(upd, (rows + 1) & 0xFF, rows)

            w0 = (rows[0:1] | (rows[1:2] << 8) | (rows[2:3] << 16)
                  | (rows[3:4] << 24))
            w1 = (rows[4:5] | (rows[5:6] << 8) | (rows[6:7] << 16)
                  | (rows[7:8] << 24))
            vscr[1:2, :] = w0
            vscr[2:3, :] = w1

            def stage_out(l, _):
                r = sscr[0, l]
                ra = model[pl.ds(r, 1), :]
                rb = model[pl.ds(r + 1, 1), :]
                model[pl.ds(r, 1), :] = jnp.where(lane1 == l, vscr[1:2, :], ra)
                model[pl.ds(r + 1, 1), :] = jnp.where(lane1 == l, vscr[2:3, :], rb)
                return 0

            jax.lax.fori_loop(0, LANES, stage_out, 0)
            return acc

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, T, sym, jnp.zeros((1, LANES), jnp.int32))

    def fn(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ROWS, LANES), jnp.int32),
                pltpu.VMEM((3, LANES), jnp.int32),
                pltpu.SMEM((1, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(idx)

    return fn, lambda r: (_idx(r),)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    which = sys.argv[1:] or ["pA", "pB", "pC", "pD8", "pD16", "pE16", "pE32",
                             "pF"]
    probes = {
        "pA": ("DMA vector->scalar bridge", pA_dma_bridge, 3),
        "pB": ("dyn row load, SMEM idx", pB_dyn_row_load, 3),
        "pC": ("dyn row RMW, SMEM idx", pC_dyn_row_rmw, 3),
        "pD8": ("dyn (8,128) window load", lambda: pD_window_load(8), 0),
        "pD16": ("dyn (16,128) window load", lambda: pD_window_load(16), 0),
        "pE16": ("take_along_axis (16,128)", lambda: pE_taa(16), 0),
        "pE32": ("take_along_axis (32,128)", lambda: pE_taa(32), 0),
        "pF": ("256 full mock symbol steps", pF_symbol_step, 3),
    }
    for key in which:
        name, builder, reps = probes[key]
        run(f"{key} {name}", builder, reps=reps)
    print("done", flush=True)
