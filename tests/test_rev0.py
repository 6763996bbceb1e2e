"""Revision-0 (llcomp.js) codec: round-trips, dispatch, divergence from rev 2.

No Node runtime exists in this environment, so rev-0 conformance is
established by round-trip plus structural checks (shared components are
covered by the rev-2 golden tests; the rev-0-specific tables/floats are
transcribed from llcomp.js and spot-asserted here).
"""
import numpy as np
import pytest

import llcomp_tpu
from llcomp_tpu import oracle, rev0
from tests.conftest import make_noise, make_photo


@pytest.mark.parametrize(
    "shape", [(1, 1, 3), (2, 2, 3), (8, 8, 3), (7, 5, 3), (6, 6, 4), (16, 16, 3)]
)
def test_rev0_roundtrip(shape):
    img = make_photo(*shape, seed=sum(shape))
    np.testing.assert_array_equal(rev0.decode(rev0.encode(img)), img)


def test_rev0_roundtrip_noise_and_flat():
    for img in [make_noise(12, 12), np.full((16, 16, 3), 200, np.uint8)]:
        np.testing.assert_array_equal(rev0.decode(rev0.encode(img)), img)


def test_rev0_magic_and_divergence():
    img = make_photo(8, 8)
    b0 = rev0.encode(img)
    b2 = oracle.encode(img)
    assert b0[0] == 0x77 and b2[0] == 0x79
    assert b0[1:6] == b2[1:6]      # same header layout
    assert b0[6:] != b2[6:]        # different entropy coding


def test_rev0_channel_restriction():
    with pytest.raises(ValueError):
        rev0.encode(make_photo(4, 4, c=1))


def test_rev0_tables_spot():
    # llcomp.js:95-111 tails
    assert list(rev0.NEXT_STATE_MPS_0[-6:]) == [124, 125, 124, 125, 126, 127]
    assert list(rev0.NEXT_STATE_LPS_0[-4:]) == [76, 77, 126, 127]
    assert rev0.MPS_PROBABILITY[0] == 0.5156 and rev0.MPS_PROBABILITY[63] == 0.9702
    assert len(rev0.MPS_PROBABILITY) == 64


def test_api_dispatch():
    img = make_photo(8, 8)
    blob = llcomp_tpu.compress(img, revision=0)
    assert blob[0] == 0x77
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)
    with pytest.raises(ValueError):
        llcomp_tpu.compress(img, revision=1)


def test_rev0_cross_rejects():
    """rev-0 decoder rejects rev-2 streams and vice versa."""
    img = make_photo(8, 8)
    with pytest.raises(ValueError):
        rev0.decode(oracle.encode(img))
    with pytest.raises(ValueError):
        oracle.decode(rev0.encode(img))
