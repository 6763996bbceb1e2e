"""Probe which per-lane addressing primitives this Mosaic release accepts on
real TPU hardware, and what they cost — groundwork for the round-2 decode
kernel (docs/DESIGN.md).  Run standalone on the TPU:

    python tools/probe_mosaic.py            # legality probes + microbench

Each probe is a tiny pallas_call; failures print the first line of the
compiler error so the kernel design can route around it.
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
ROWS = 15872  # model-plane scale (two i32 words per hash row, 7926 hashes)


def run(name, build, reps=0):
    """Compile+run a probe; optionally time `reps` fresh-input executions."""
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
                args = make_args(r)  # fresh inputs: backend elides repeats
                t0 = time.time()
                jax.block_until_ready(fn(*args))
                ts.append(time.time() - t0)
            print(f"     {name}: per-run {['%.4f' % t for t in ts]}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = " | ".join(str(e).split("\n")[:3])[:300]
        print(f"FAIL {name}: {type(e).__name__}: {msg}", flush=True)
        return False


def _idx(r, rows=ROWS - 2):
    rng = np.random.default_rng(r)
    return jnp.asarray(rng.integers(0, rows, size=(8, LANES)), dtype=jnp.int32)


def _src(r, rows=ROWS):
    rng = np.random.default_rng(100 + r)
    return jnp.asarray(
        rng.integers(0, 1 << 20, size=(rows, LANES)), dtype=jnp.int32
    )


# --------------------------------------------------------------------------
# P0: known blocker — per-lane scalar VMEM store (expected FAIL)
def p0_scalar_store():
    def kernel(idx_ref, out_ref):
        def body(l, _):
            r = idx_ref[0, l]
            out_ref[r, l] = r
            return 0
        jax.lax.fori_loop(0, LANES, body, 0)

    def fn(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((64, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx % 64)

    return fn, lambda r: (_idx(r),)


# P1: per-lane scalar VMEM LOAD (traced r, l) blended into a vector
def p1_scalar_load():
    def kernel(idx_ref, src_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(l, acc):
            r = idx_ref[0, l]
            v = src_ref[r, l]
            return jnp.where(lane == l, v, acc)

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, LANES, body, jnp.zeros((1, LANES), jnp.int32)
        )

    def fn(idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, src)

    return fn, lambda r: (_idx(r), _src(r))


# P2: per-lane dynamic ROW load (1,128) at traced sublane offset + blend
def p2_row_load_blend():
    def kernel(idx_ref, src_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(l, acc):
            r = idx_ref[0, l]
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
        )(idx, src)

    return fn, lambda r: (_idx(r), _src(r))


# P3: per-lane row READ-MODIFY-WRITE (dyn row load, lane blend, dyn row store)
def p3_row_rmw():
    def kernel(idx_ref, val_ref, out_ref, model_ref):
        model_ref[:] = jnp.zeros((ROWS, LANES), jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body(l, _):
            r = idx_ref[0, l]
            row = model_ref[pl.ds(r, 1), :]
            model_ref[pl.ds(r, 1), :] = jnp.where(lane == l, val_ref[0:1, :], row)
            return 0

        jax.lax.fori_loop(0, LANES, body, 0)
        out_ref[0:8, :] = model_ref[0:8, :]

    def fn(idx, val):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)],
        )(idx % 8, val)

    return fn, lambda r: (_idx(r), _src(r, rows=1))


# P4: dynamic (8,128) window load at traced scalar offset + blend (refill)
def p4_window_load():
    def kernel(idx_ref, src_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        def body(l, acc):
            r = idx_ref[0, l]
            win = src_ref[pl.ds(r, 8), :]
            return jnp.where(lane == l, win, acc)

        out_ref[:] = jax.lax.fori_loop(
            0, LANES, body, jnp.zeros((8, LANES), jnp.int32)
        )

    def fn(idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.minimum(idx, ROWS - 8), src)

    return fn, lambda r: (_idx(r), _src(r))


# P5: tall sublane gather — take_along_axis axis=0 on (32,128)
def p5_sublane_gather32():
    def kernel(idx_ref, src_ref, out_ref):
        idx = jnp.broadcast_to(idx_ref[0:1, :] % 32, (32, LANES))
        out_ref[0:1, :] = jnp.take_along_axis(src_ref[:], idx, axis=0)[0:1, :]

    def fn(idx, src):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, src[:32])

    return fn, lambda r: (_idx(r), _src(r))


# P6: scalar store to SMEM scratch + scalar read-back (index staging)
def p6_smem_staging():
    def kernel(idx_ref, out_ref, smem):
        def body(l, _):
            smem[l] = idx_ref[0, l] + 1
            return 0

        jax.lax.fori_loop(0, LANES, body, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def body2(l, acc):
            return jnp.where(lane == l, smem[l], acc)

        out_ref[0:1, :] = jax.lax.fori_loop(
            0, LANES, body2, jnp.zeros((1, LANES), jnp.int32)
        )

    def fn(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((LANES,), jnp.int32)],
        )(idx)

    return fn, lambda r: (_idx(r),)


# P7: timing — T symbol-steps of the full stage-in + stage-out machinery
def p7_symbol_step_cost(T=512):
    def kernel(idx_ref, out_ref, modelA, modelB, scr):
        modelA[0:8, :] = jnp.zeros((8, LANES), jnp.int32)
        modelB[0:8, :] = jnp.zeros((8, LANES), jnp.int32)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sym(s, carry):
            # pseudo-random per-lane rows, written to scratch for scalar reads
            scr[0:1, :] = (idx_ref[0:1, :] * (s + 1) + s * 40503) % (ROWS - 1)
            zero = jnp.zeros((1, LANES), jnp.int32)

            def stage_in(l, acc):
                a, b = acc
                r = scr[0, l]
                ra = modelA[pl.ds(r, 1), :]
                rb = modelB[pl.ds(r, 1), :]
                return (jnp.where(lane1 == l, ra, a),
                        jnp.where(lane1 == l, rb, b))

            wa, wb = jax.lax.fori_loop(0, LANES, stage_in, (zero, zero))
            rows = jnp.concatenate([wa] * 4 + [wb] * 4, axis=0)
            rows = (rows >> ((sub8 & 3) * 8)) & 0xFF

            # stand-in decision loop: 24 iterations of light vector work
            def dec(d, st):
                rows, acc = st
                ctx = (acc + d) & 7
                pick = jnp.take_along_axis(
                    rows, jnp.broadcast_to(ctx, (8, LANES)), axis=0)[0:1, :]
                acc = (acc * 5 + pick + 1) & 0x7FFF
                upd = jnp.broadcast_to(ctx, (8, LANES)) == sub8
                rows = jnp.where(upd, (rows + 1) & 0xFF, rows)
                return rows, acc

            rows, acc = jax.lax.fori_loop(0, 24, dec, (rows, carry))

            w0 = (rows[0:1] | (rows[1:2] << 8) | (rows[2:3] << 16)
                  | (rows[3:4] << 24))
            w1 = (rows[4:5] | (rows[5:6] << 8) | (rows[6:7] << 16)
                  | (rows[7:8] << 24))
            scr[1:2, :] = w0
            scr[2:3, :] = w1

            def stage_out(l, _):
                r = scr[0, l]
                ra = modelA[pl.ds(r, 1), :]
                rb = modelB[pl.ds(r, 1), :]
                modelA[pl.ds(r, 1), :] = jnp.where(lane1 == l, scr[1:2, :], ra)
                modelB[pl.ds(r, 1), :] = jnp.where(lane1 == l, scr[2:3, :], rb)
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
                pltpu.VMEM((ROWS, LANES), jnp.int32),
                pltpu.VMEM((8, LANES), jnp.int32),
            ],
        )(idx)

    return fn, lambda r: (_idx(r),)


# P8: timing — stage loops only, no decision loop (isolate loop cost)
def p8_stage_only_cost(T=512):
    def kernel(idx_ref, out_ref, modelA, scr):
        modelA[0:8, :] = jnp.zeros((8, LANES), jnp.int32)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def sym(s, carry):
            scr[0:1, :] = (idx_ref[0:1, :] * (s + 1) + s * 40503) % (ROWS - 1)
            zero = jnp.zeros((1, LANES), jnp.int32)

            def stage_in(l, acc):
                r = scr[0, l]
                return jnp.where(lane1 == l, modelA[pl.ds(r, 1), :], acc)

            wa = jax.lax.fori_loop(0, LANES, stage_in, zero)
            scr[1:2, :] = (wa + carry + 1) & 0xFFFF

            def stage_out(l, _):
                r = scr[0, l]
                ra = modelA[pl.ds(r, 1), :]
                modelA[pl.ds(r, 1), :] = jnp.where(lane1 == l, scr[1:2, :], ra)
                return 0

            jax.lax.fori_loop(0, LANES, stage_out, 0)
            return (carry + wa) & 0x7FFF

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
                pltpu.VMEM((8, LANES), jnp.int32),
            ],
        )(idx)

    return fn, lambda r: (_idx(r),)


# P9: timing — decision loop only (24 iters of vector work, no staging)
def p9_decision_only_cost(T=512):
    def kernel(idx_ref, out_ref):
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sym(s, carry):
            rows, acc = carry

            def dec(d, st):
                rows, acc = st
                ctx = (acc + d) & 7
                pick = jnp.take_along_axis(
                    rows, jnp.broadcast_to(ctx, (8, LANES)), axis=0)[0:1, :]
                acc = (acc * 5 + pick + 1) & 0x7FFF
                upd = jnp.broadcast_to(ctx, (8, LANES)) == sub8
                rows = jnp.where(upd, (rows + 1) & 0xFF, rows)
                return rows, acc

            return jax.lax.fori_loop(0, 24, dec, (rows, acc))

        rows0 = jnp.broadcast_to(idx_ref[0:1, :] & 0xFF, (8, LANES))
        _, acc = jax.lax.fori_loop(
            0, T, sym, (rows0, jnp.zeros((1, LANES), jnp.int32)))
        out_ref[0:1, :] = acc

    def fn(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx)

    return fn, lambda r: (_idx(r),)


# P10: timing — decision loop fully UNROLLED (is p9's 2.4us/step loop overhead?)
def p10_decision_unrolled(T=512):
    def kernel(idx_ref, out_ref):
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)

        def sym(s, carry):
            rows, acc = carry
            for d in range(24):  # python loop = full unroll
                ctx = (acc + d) & 7
                pick = jnp.take_along_axis(
                    rows, jnp.broadcast_to(ctx, (8, LANES)), axis=0)[0:1, :]
                acc = (acc * 5 + pick + 1) & 0x7FFF
                upd = jnp.broadcast_to(ctx, (8, LANES)) == sub8
                rows = jnp.where(upd, (rows + 1) & 0xFF, rows)
            return rows, acc

        rows0 = jnp.broadcast_to(idx_ref[0:1, :] & 0xFF, (8, LANES))
        _, acc = jax.lax.fori_loop(
            0, T, sym, (rows0, jnp.zeros((1, LANES), jnp.int32)))
        out_ref[0:1, :] = acc

    def fn(idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx)

    return fn, lambda r: (_idx(r),)


# P11: single-lane variants — how does cost scale with the lane count staged?
def p11_stage_few(T=512, NSTAGE=8):
    def kernel(idx_ref, out_ref, modelA, scr):
        modelA[0:8, :] = jnp.zeros((8, LANES), jnp.int32)
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        def sym(s, carry):
            scr[0:1, :] = (idx_ref[0:1, :] * (s + 1) + s * 40503) % (ROWS - 1)
            zero = jnp.zeros((1, LANES), jnp.int32)

            def stage_in(l, acc):
                r = scr[0, l]
                return jnp.where(lane1 == l, modelA[pl.ds(r, 1), :], acc)

            wa = jax.lax.fori_loop(0, NSTAGE, stage_in, zero)
            return (carry + wa) & 0x7FFF

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
                pltpu.VMEM((8, LANES), jnp.int32),
            ],
        )(idx)

    return fn, lambda r: (_idx(r),)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    which = sys.argv[1:] or ["p0", "p1", "p2", "p3", "p4", "p5", "p6",
                             "p7", "p8", "p9"]
    probes = {
        "p0": ("scalar VMEM store (expect FAIL)", p0_scalar_store, 0),
        "p1": ("scalar VMEM load traced idx", p1_scalar_load, 0),
        "p2": ("dyn row load + lane blend", p2_row_load_blend, 0),
        "p3": ("dyn row RMW (load/blend/store)", p3_row_rmw, 0),
        "p4": ("dyn (8,128) window load", p4_window_load, 0),
        "p5": ("take_along_axis (32,128) ax0", p5_sublane_gather32, 0),
        "p6": ("SMEM scalar store/load staging", p6_smem_staging, 0),
        "p7": ("512 full symbol-steps", p7_symbol_step_cost, 3),
        "p8": ("512 stage-only steps", p8_stage_only_cost, 3),
        "p9": ("512 decision-only steps", p9_decision_only_cost, 3),
        "p10": ("512 sym, 24 dec UNROLLED", p10_decision_unrolled, 3),
        "p11": ("512 sym, stage 8 lanes", p11_stage_few, 3),
    }
    for key in which:
        name, builder, reps = probes[key]
        run(f"{key} {name}", builder, reps=reps)
    print("done", flush=True)
