"""Public API: both container formats, slicing geometry, error paths."""
import numpy as np
import pytest

import llcomp_tpu
from llcomp_tpu import api, container, oracle
from tests.conftest import make_photo


def test_single_stream_matches_reference_format():
    img = make_photo(16, 16)
    blob = llcomp_tpu.compress(img)
    assert blob == oracle.encode(img)
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_sliced_roundtrip_even():
    img = make_photo(32, 16)
    blob = llcomp_tpu.compress(img, slices=4)
    assert container.is_sliced(blob)
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_sliced_roundtrip_ragged():
    """Height not divisible by slice count: last stripe is shorter."""
    img = make_photo(37, 16)
    blob = llcomp_tpu.compress(img, slices=5)
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_sliced_auto():
    img = make_photo(48, 8)
    blob = llcomp_tpu.compress(img, slices="auto")
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_sliced_streams_are_independent_reference_streams():
    """Each stripe payload is a valid headerless rev-2 stream of that stripe."""
    img = make_photo(24, 16)
    blob = llcomp_tpu.compress(img, slices=3, primed=False)
    streams, W, H, C, slice_h, flags = container.unpack_sliced(blob)
    assert (W, H, C, slice_h, len(streams), flags) == (16, 24, 3, 8, 3, 0)
    for i, s in enumerate(streams):
        stripe = img[i * 8 : (i + 1) * 8]
        assert s == oracle.encode(stripe)[6:]


def test_sliced_primed_streams_match_primed_oracle():
    """Primed stripes = oracle encode with the PRIOR_SUB initial model."""
    img = make_photo(24, 16)
    blob = llcomp_tpu.compress(img, slices=3, primed=True)
    streams, W, H, C, slice_h, flags = container.unpack_sliced(blob)
    assert flags & container.FLAG_PRIMED
    for i, s in enumerate(streams):
        stripe = img[i * 8 : (i + 1) * 8]
        ref = oracle.encode_planes(oracle.rct_forward(stripe), primed=True)
        assert s == ref
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_primed_improves_photo_ratio():
    """The model prior must pay for itself on photo-like content."""
    img = make_photo(64, 64)
    cold = llcomp_tpu.compress(img, slices="auto", primed=False)
    primed = llcomp_tpu.compress(img, slices="auto", primed=True)
    assert len(primed) < len(cold)
    np.testing.assert_array_equal(llcomp_tpu.decompress(primed), img)
    # the auto heuristic picks the prior for this content
    auto = llcomp_tpu.compress(img, slices="auto")
    assert auto == primed


def test_primed_all_decode_engines_agree():
    from llcomp_tpu import decode as jdec

    img = make_photo(16, 16)
    blob = llcomp_tpu.compress(img, slices=2, primed=True)
    streams, W, H, C, slice_h, flags = container.unpack_sliced(blob)
    ref = np.stack([img[:8], img[8:]])
    for engine in ("decision", "lockstep", "rowbatch"):
        out = jdec.decode_lanes(streams, (8, W, C), engine=engine, primed=True)
        np.testing.assert_array_equal(out, ref)
    # an unprimed decode of primed streams must NOT round-trip silently:
    # either a corruption error or wrong pixels
    try:
        wrong = jdec.decode_lanes(streams, (8, W, C), engine="lockstep")
        assert not np.array_equal(wrong, ref)
    except ValueError:
        pass


def test_sliced_size_overhead_bounded():
    img = make_photo(64, 64)
    single = len(llcomp_tpu.compress(img))
    sliced = len(llcomp_tpu.compress(img, slices=8))
    # per-slice model restart costs ratio; must stay modest on photo-like data
    assert sliced < single * 1.35


def test_grayscale_and_2d_input():
    img2d = make_photo(12, 10, c=1)[..., 0]
    blob = llcomp_tpu.compress(img2d)
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob)[..., 0], img2d)


def test_errors():
    with pytest.raises(TypeError):
        llcomp_tpu.compress(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        llcomp_tpu.decompress(b"\x00" * 16)
    with pytest.raises(ValueError):
        container.pack_single(b"", 70000, 10, 3)  # reference silently truncates


def test_oracle_backend():
    img = make_photo(8, 8)
    blob = llcomp_tpu.compress(img, backend="oracle")
    assert blob == llcomp_tpu.compress(img)
    np.testing.assert_array_equal(
        llcomp_tpu.decompress(blob, backend="oracle"), img
    )


def test_wide_image_slicing_stays_within_pallas_budget():
    """Wide stripes must respect the encode pipeline's HBM slot budget and
    never collapse to 1-row stripes for W <= 8192 (VERDICT r1 #4)."""
    import os

    budget = int(os.environ.get("LLCT_SLOT_BUDGET", 900_000))
    for w in (2048, 3840, 8192):
        sh = api.pick_slice_height(4096, w, 3)
        assert sh >= 8, (w, sh)  # never the 1-row-stripe ratio cliff
        # either inside the Pallas HBM budget or small enough that the
        # XLA fallback in encode_lanes handles it
        assert sh * w * 3 * 24 <= max(budget, 8 * w * 3 * 24)
    # and a wide-but-short image still round-trips (falls back if needed)
    img = make_photo(6, 640, c=3)
    blob = llcomp_tpu.compress(img, slices=2)
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_oversized_stripe_falls_back_to_xla():
    from llcomp_tpu import encode as jenc, oracle

    img = make_photo(3, 5000, c=3)  # n_sym*24 = 1.08M > 2^20
    out = jenc.encode_lanes(img[None], engine="pallas")
    assert out[0] == oracle.encode(img)[6:]


def test_reencode_slice_heals_corrupt_stripe():
    """Fault-tolerance primitive: re-encoding one stripe restores the exact
    original container (slice independence, SURVEY §5)."""
    img = make_photo(32, 16)
    blob = llcomp_tpu.compress(img, slices=4)
    streams, W, H, C, slice_h, flags = container.unpack_sliced(blob)
    # corrupt slice 2's payload in place
    bad = list(streams)
    bad[2] = bytes([b ^ 0xFF for b in bad[2]])
    broken = container.pack_sliced(bad, W, H, C, slice_h, flags=flags)
    assert broken != blob
    y0, y1 = container.slice_bounds(H, slice_h)[2]
    healed = api.reencode_slice(broken, 2, img[y0:y1])
    assert healed == blob
    np.testing.assert_array_equal(llcomp_tpu.decompress(healed), img)


def test_reencode_slice_validates_args():
    img = make_photo(32, 16)
    blob = llcomp_tpu.compress(img, slices=4)
    with pytest.raises(IndexError):
        api.reencode_slice(blob, 9, img[:8])
    with pytest.raises(ValueError):
        api.reencode_slice(blob, 0, img[:4])
