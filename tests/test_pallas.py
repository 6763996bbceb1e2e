"""Pallas fused encode kernels (interpret mode on CPU; bit-exactness)."""
import numpy as np
import pytest

from llcomp_tpu import encode as jenc
from llcomp_tpu import oracle
from tests.conftest import make_noise, make_photo


def test_pallas_engine_matches_oracle():
    lanes = np.stack(
        [make_photo(4, 8, seed=i) for i in range(2)] + [make_noise(4, 8)]
    )
    outs = jenc.encode_lanes(lanes, engine="pallas")
    for i in range(3):
        assert outs[i] == oracle.encode(lanes[i])[6:]


def test_pallas_engine_matches_xla_engine():
    lanes = np.stack([make_photo(4, 4, seed=9 + i) for i in range(2)])
    a = jenc.encode_lanes(lanes, engine="pallas")
    b = jenc.encode_lanes(lanes, engine="xla")
    assert a == b


def test_pallas_flat_and_tiny():
    lanes = np.full((1, 4, 4, 3), 42, np.uint8)
    assert jenc.encode_lanes(lanes, engine="pallas")[0] == oracle.encode(lanes[0])[6:]


def test_pallas_decode_matches_oracle():
    from llcomp_tpu import decode as jdec

    lanes = [make_photo(4, 6, seed=1), make_noise(4, 6, seed=2),
             np.full((4, 6, 3), 9, np.uint8)]
    streams = [oracle.encode(l)[6:] for l in lanes]
    out = jdec.decode_lanes(streams, (4, 6, 3), engine="pallas")
    for i, l in enumerate(lanes):
        np.testing.assert_array_equal(out[i], l)


def test_pallas_decode_channels():
    from llcomp_tpu import decode as jdec

    for c in (1, 4):
        img = make_photo(3, 5, c=c, seed=c)
        out = jdec.decode_lanes([oracle.encode(img)[6:]], (3, 5, c),
                                engine="pallas")
        np.testing.assert_array_equal(out[0], img)


def test_pallas_decode_corrupt_raises():
    from llcomp_tpu import decode as jdec
    from tests.test_native import _malicious_stream

    with pytest.raises(ValueError):
        jdec.decode_lanes([_malicious_stream()], (4, 4, 3), engine="pallas")


def test_pallas_roundtrip_pallas_only():
    from llcomp_tpu import decode as jdec

    lanes = np.stack([make_photo(4, 8, seed=40 + i) for i in range(2)])
    streams = jenc.encode_lanes(lanes, engine="pallas")
    out = jdec.decode_lanes(streams, (4, 8, 3), engine="pallas")
    np.testing.assert_array_equal(out, lanes)


def test_blocked_wide_kernel_interpret_bitexact(monkeypatch):
    """The hardware (blocked, NSUB-wide) decode kernel, run under the
    interpreter: multi-group sublane packing, group-interleaved ring,
    deferred-write-back semantics and the G-padding path (G=2 -> NSUB=2)."""
    from llcomp_tpu import decode as jdec

    monkeypatch.setenv("LLCT_DECODE_FORCE_BLOCKED", "1")
    monkeypatch.setenv("LLCT_DECODE_NSUB", "2")
    lanes = [make_photo(2, 8, seed=i) for i in range(129)]
    lanes += [make_noise(2, 8, seed=5), np.full((2, 8, 3), 77, np.uint8)]
    streams = [oracle.encode(l)[6:] for l in lanes]
    out = jdec.decode_lanes(streams, (2, 8, 3), engine="pallas")
    for i, l in enumerate(lanes):
        np.testing.assert_array_equal(out[i], l, err_msg=f"lane {i}")


def test_blocked_kernel_primed_multigroup(monkeypatch):
    """Primed (bucketed-prior) init of the blocked kernel across >1 model
    sections: each NS4 section must restart the PRIOR_TAB row pattern at
    its own base (a flat tile across NSUB*NS4 rows would misalign every
    section after the first, NS4 % 242 != 0)."""
    from llcomp_tpu import decode as jdec

    monkeypatch.setenv("LLCT_DECODE_FORCE_BLOCKED", "1")
    rng = np.random.default_rng(3)
    a = np.clip(rng.integers(-3, 4, (8, 8, 3)).cumsum(axis=1) + 120,
                0, 255).astype(np.uint8)
    b = np.clip(rng.integers(-4, 5, (8, 8, 3)).cumsum(axis=0) + 90,
                0, 255).astype(np.uint8)
    blobs = [oracle.encode_planes(oracle.rct_forward(im), primed=True)
             for im in (a, b)]
    streams = [blobs[0]] * 128 + [blobs[1]] * 2   # 130 lanes -> 2 sections
    out = jdec.decode_lanes(streams, a.shape, engine="pallas", primed=True)
    np.testing.assert_array_equal(out[0], a)
    np.testing.assert_array_equal(out[127], a)
    np.testing.assert_array_equal(out[129], b)


def test_fused_engine_matches_oracle():
    """Round-4 fused stream-order engine (model+coder in VMEM, no sorts):
    byte-identical to the oracle on mixed content, including the
    G-padding and symbol-tail paths."""
    lanes = np.stack(
        [make_photo(4, 8, seed=i) for i in range(2)]
        + [np.full((4, 8, 3), 42, np.uint8)]
    )
    outs = jenc.encode_lanes(lanes, engine="fused")
    for i in range(3):
        assert outs[i] == oracle.encode(lanes[i])[6:], f"lane {i}"


def test_fused_collect_prefetched_lens():
    """_fused_collect accepts host-prefetched numpy lens/ovf (the bench's
    device-only loop batches all batches' syncs into one device_get) and
    must produce the same bytes as the device-array path."""
    import jax

    lanes = np.stack([make_photo(4, 8, seed=500 + i) for i in range(3)])
    n_sym = int(np.prod(lanes.shape[1:]))
    mk, lens, ovf = jenc._fused_launch(lanes, jenc.REV2, primed=False,
                                       seed=None)
    lens_np, ovf_np = jax.device_get((lens, ovf))
    byts_d, ln = jenc._fused_collect(mk, lens_np, ovf_np, n_sym)
    byts_ref, ln_ref = jenc._fused_collect(mk, lens, ovf, n_sym)
    np.testing.assert_array_equal(ln, ln_ref)
    np.testing.assert_array_equal(np.asarray(byts_d), np.asarray(byts_ref))
    cap2 = byts_d.shape[2]
    flat = np.asarray(byts_d).transpose(0, 1, 3, 2).reshape(-1, cap2)
    for i in range(3):
        assert flat[i, : ln[i]].tobytes() == oracle.encode(lanes[i])[6:]


def test_fused_engine_multigroup():
    """>128 lanes exercises NSUB>1 sublane packing + model sectioning."""
    lanes = np.stack([make_photo(2, 8, seed=300 + i) for i in range(130)])
    outs = jenc.encode_lanes(lanes, engine="fused")
    for i in (0, 1, 127, 128, 129):
        assert outs[i] == oracle.encode(lanes[i])[6:], f"lane {i}"


def test_fused_engine_primed_and_seeded():
    from llcomp_tpu import seed as seedmod

    img = make_photo(16, 8, seed=21)
    tab = seedmod.derive(img)
    stripes = np.stack([img[:8], img[8:]])
    got_p = jenc.encode_lanes(stripes, engine="fused", primed=True)
    got_s = jenc.encode_lanes(stripes, engine="fused", seed=tab)
    for i, s in enumerate(stripes):
        assert got_p[i] == oracle.encode_planes(
            oracle.rct_forward(s), primed=True)
        assert got_s[i] == oracle.encode_planes(
            oracle.rct_forward(s), seed=tab)


def test_fused_engine_overflow_falls_back(monkeypatch):
    """Incompressible lanes overflow the marker buffer (sticky flag) and
    encode_lanes silently re-encodes through the sort chain."""
    from llcomp_tpu import encode as je
    from llcomp_tpu.pallas import encode_fused as ef

    lanes = np.stack([make_noise(4, 8, seed=i) for i in range(2)])
    monkeypatch.setenv("LLCT_FUSED_MCAP", "32")  # force overflow
    with pytest.raises(je.FusedOverflow):
        je._encode_lanes_fused(lanes)
    outs = jenc.encode_lanes(lanes, engine="fused")  # falls back
    for i in range(2):
        assert outs[i] == oracle.encode(lanes[i])[6:]
    monkeypatch.delenv("LLCT_FUSED_MCAP")
    # ample budget: no overflow even on noise
    outs2 = je._encode_lanes_fused(lanes)
    assert outs2 == outs
    assert ef.pick_mcap(4 * 8 * 3) >= 96


def test_fused_engine_single_symbol_rows():
    """1-pixel-high lanes and C=1/C=4 geometries through the fused path."""
    for c in (1, 3, 4):
        img = make_photo(1, 8, c=c, seed=c)
        out = jenc.encode_lanes(img[None], engine="fused")
        assert out[0] == oracle.encode(img)[6:], f"C={c}"


def test_fused_lane_chunking_byte_identical(monkeypatch):
    """Over-budget lane batches split into whole 1024-lane chunks through
    the fused pipeline; bytes must equal the unchunked path."""
    monkeypatch.setenv("LLCT_ENCODE_ENGINE", "fused")
    lanes = np.stack([make_photo(1, 8, seed=600 + i) for i in range(1025)])
    monkeypatch.setenv("LLCT_FUSED_LANE_BUDGET", "200000")  # chunk = 1024
    a = jenc.encode_lanes(lanes, engine="fused")
    monkeypatch.delenv("LLCT_FUSED_LANE_BUDGET")
    b = jenc.encode_lanes(lanes, engine="fused")
    assert a == b
    assert a[0] == oracle.encode(lanes[0])[6:]
    assert a[1024] == oracle.encode(lanes[1024])[6:]


def test_expand_markers_sliced_input_identical():
    """Round-5 expansion shrink: marker buffer row i always holds a marker
    with off >= i (each emit advances off by >= 1), so slicing the input
    to cap2 rows before expand_markers cannot change the bytes.  Pinned
    on synthetic ascending markers denser than any real stream."""
    import jax

    from llcomp_tpu import coder

    rng = np.random.default_rng(5)
    A, N, M, cap2 = 2, 3, 96, 64
    DEAD = 0x7FFFFFFF
    mk = np.full((A, N, M, 128), DEAD, np.int64)
    for a in range(A):
        for n in range(N):
            for lane in range(128):
                cnt = rng.integers(0, M)
                # strictly ascending offs with row i <= off(i); gaps model
                # deferred-0xFF runs, carry bits sprinkled in
                offs = np.cumsum(rng.integers(1, 3, cnt))
                keep = offs < 4 * cap2
                offs = offs[keep]
                heads = rng.integers(0, 256, len(offs))
                carry = rng.integers(0, 2, len(offs))
                mk[a, n, : len(offs), lane] = (
                    (offs << 9) | (carry << 8) | heads)
    mk = jax.numpy.asarray(mk.astype(np.int32))
    full = np.asarray(coder.expand_markers(mk, cap2))
    sliced = np.asarray(coder.expand_markers(mk[:, :, :cap2, :], cap2))
    np.testing.assert_array_equal(full, sliced)


def test_fused_engine_sliced_expansion_e2e():
    """A geometry where the cap ladder lands BELOW the marker capacity, so
    _fused_collect actually slices the buffer before expansion; bytes must
    still equal the oracle (n_sym=768: mcap=1232 > cap2=1024)."""
    lanes = np.stack([make_photo(2, 128, seed=700 + i) for i in range(2)])
    from llcomp_tpu.pallas import encode_fused as ef

    n_sym = int(np.prod(lanes.shape[1:]))
    mcap = ef.pick_geometry(n_sym, 1)[1]
    assert mcap > 1024, "geometry no longer exercises the slice"
    outs = jenc.encode_lanes(lanes, engine="fused")
    for i in range(2):
        assert outs[i] == oracle.encode(lanes[i])[6:], f"lane {i}"


def test_pipelined_fused_matches_oracle():
    """The fused cross-batch pipeline (dispatch-all, collect-in-order,
    overflow fallback) must be byte-identical to the oracle; exercised
    directly since auto-dispatch requires a TPU host."""
    from llcomp_tpu import encode as je

    batches = [np.stack([make_photo(2, 8, seed=400 + 2 * b + i)
                         for i in range(2)]) for b in range(3)]
    out = je._pipelined_fused(batches, je.REV2, primed=False)
    for b in range(3):
        for i in range(2):
            assert out[b][i] == oracle.encode(batches[b][i])[6:], (b, i)


def test_blocked_kernel_seeded_unprimed(monkeypatch):
    """Round-4 regression (ADVICE r03 high): seeded containers do NOT set
    FLAG_PRIMED, so api.decompress calls the decode engines with
    primed=False + seed.  The blocked Pallas kernel must still build its
    model init from the seed operands (primed promotion inside
    _decode_groups_impl) — before the fix it zero-filled the model and
    produced wrong pixels on TPU while every CPU engine passed."""
    from llcomp_tpu import decode as jdec, seed as seedmod

    monkeypatch.setenv("LLCT_DECODE_FORCE_BLOCKED", "1")
    img = make_photo(16, 8, seed=13)
    tab = seedmod.derive(img)
    stripes = [img[:8], img[8:]]
    streams = [oracle.encode_planes(oracle.rct_forward(s), seed=tab)
               for s in stripes]
    out = jdec.decode_lanes(streams, (8, 8, 3), engine="pallas",
                            primed=False, seed=tab)
    np.testing.assert_array_equal(out[0], stripes[0])
    np.testing.assert_array_equal(out[1], stripes[1])


def test_decode_nsub_env_rounded_to_pow2(monkeypatch):
    """LLCT_DECODE_NSUB=5/6 mis-execute on hardware (r02 worker kill);
    the override must round down to a power of two unless the explicit
    unsafe probe flag is also set."""
    from llcomp_tpu.pallas import decode_kernel as dk

    monkeypatch.setenv("LLCT_DECODE_NSUB", "5")
    assert dk._pick_nsub(8, 4096, 24) == 4
    monkeypatch.setenv("LLCT_DECODE_NSUB", "6")
    assert dk._pick_nsub(8, 4096, 24) == 4
    monkeypatch.setenv("LLCT_DECODE_NSUB", "8")
    assert dk._pick_nsub(8, 4096, 24) == 8
    monkeypatch.setenv("LLCT_DECODE_NSUB", "5")
    monkeypatch.setenv("LLCT_DECODE_NSUB_UNSAFE", "1")
    assert dk._pick_nsub(8, 4096, 24) == 5


def test_device_expansion_matches_host():
    """expand_slots_on_device == expand_slots_batch on random slot records."""
    import jax.numpy as jnp

    from llcomp_tpu import coder

    rng = np.random.default_rng(7)
    S, T, outcap = 4, 256, 640
    emit = rng.random((S, T)) < 0.3
    meta = (
        emit.astype(np.int32)
        | (rng.integers(0, 2, (S, T)) << 1)
        | (rng.integers(0, 256, (S, T)) << 8)
    ).astype(np.int32)
    runs = np.where(emit, rng.integers(0, 3, (S, T)), 0).astype(np.int32)
    want = coder.expand_slots_batch(meta, runs, lane_major=True)
    byts, lens = coder.expand_slots_on_device(
        jnp.asarray(meta), jnp.asarray(runs), outcap
    )
    byts, lens = np.asarray(byts), np.asarray(lens)
    for s in range(S):
        assert byts[s, : lens[s]].tobytes() == want[s]


def test_pipelined_speculation_miss_recovers():
    """A noisy batch after a smooth one forces a bucket-speculation miss."""
    smooth = np.full((2, 4, 8, 3), 100, np.uint8)
    noisy = make_noise(4, 8)[None].repeat(2, axis=0).copy()
    noisy[1] = make_noise(4, 8, seed=9)
    outs = jenc.encode_lanes_pipelined([smooth, noisy])
    for i in range(2):
        assert outs[0][i] == oracle.encode(smooth[i])[6:]
        assert outs[1][i] == oracle.encode(noisy[i])[6:]


def test_encode_variants_byte_identical(monkeypatch):
    """The symbol-granular and decision-granular pallas chains must emit
    identical bytes (both equal to the oracle) on mixed content."""
    lanes = np.stack(
        [make_photo(4, 8, seed=50 + i) for i in range(2)]
        + [make_noise(4, 8, seed=3), np.full((4, 8, 3), 7, np.uint8)]
    )
    monkeypatch.setenv("LLCT_ENCODE_VARIANT", "symbol")
    a = jenc.encode_lanes(lanes, engine="pallas")
    monkeypatch.setenv("LLCT_ENCODE_VARIANT", "decision")
    b = jenc.encode_lanes(lanes, engine="pallas")
    assert a == b
    for i in range(len(lanes)):
        assert a[i] == oracle.encode(lanes[i])[6:]


def test_encode_lanes_chunking_byte_identical(monkeypatch):
    """encode_lanes splits over-budget lane batches into whole kernel
    groups and pipelines them (HBM bound, round 3); bytes must be
    identical to the unchunked path."""
    lanes = np.stack([make_photo(1, 8, seed=200 + i) for i in range(1025)])
    monkeypatch.setenv("LLCT_LANE_SLOT_BUDGET", "300000")  # chunk = 1024
    a = jenc.encode_lanes(lanes, engine="pallas")
    monkeypatch.delenv("LLCT_LANE_SLOT_BUDGET")
    b = jenc.encode_lanes(lanes, engine="pallas")
    assert a == b
    assert a[0] == oracle.encode(lanes[0])[6:]
    assert a[1024] == oracle.encode(lanes[1024])[6:]


def test_pipelined_inflight_window_byte_identical(monkeypatch):
    """The capped collect window must not change bytes or order."""
    batches = [np.stack([make_photo(4, 8, seed=70 + 3 * b + i)
                         for i in range(2)]) for b in range(3)]
    monkeypatch.setenv("LLCT_PIPELINE_INFLIGHT", "1")
    a = jenc.encode_lanes_pipelined(batches)
    monkeypatch.delenv("LLCT_PIPELINE_INFLIGHT")
    b = jenc.encode_lanes_pipelined(batches)
    assert a == b


def test_decode_vmem_budget_model():
    """The measured-VMEM sizing that fixed the r02 2048-wide worker fault:
    NSUB picks must stay under decode_kernel.VMEM_BUDGET counting double
    buffers, and ultra-wide strides fall out of the Pallas path."""
    from llcomp_tpu.pallas import decode_kernel as dk

    # bench headline geometry: full 8-group packing still allowed
    assert dk._pick_nsub(8, 8192, 512 * 3) == 8
    # 2048-wide (stride 6144): the r02 crash geometry must cap at <= 4
    n = dk._pick_nsub(24, 12288, 2048 * 3)
    assert 1 <= n <= 4
    assert n * dk._group_vmem(12288, 2048 * 3) <= dk.VMEM_BUDGET
    # ultra-wide stripes cannot take the kernel even one group at a time
    assert not dk.fits_pallas_decode(4096, 50000 * 3)
    assert dk.fits_pallas_decode(8192, 1536)
