"""Distribution layer (single-process degenerate forms + span math)."""
import numpy as np

import llcomp_tpu
from llcomp_tpu import distributed, profiling
from tests.conftest import make_photo


def test_corpus_span_math():
    assert distributed.corpus_span(10, 0, 4) == (0, 3)
    assert distributed.corpus_span(10, 3, 4) == (9, 10)
    assert distributed.corpus_span(2, 3, 4) == (2, 2)  # empty tail span
    spans = [distributed.corpus_span(7, p, 3) for p in range(3)]
    assert spans[0][0] == 0 and spans[-1][1] == 7
    covered = sum(b - a for a, b in spans)
    assert covered == 7


def test_compress_image_pod_single_process():
    img = make_photo(32, 16)
    blob = distributed.compress_image_pod(img, slice_h=8)
    assert blob == llcomp_tpu.compress(img, slices=4)
    np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_compress_corpus_distributed_single_process():
    imgs = [make_photo(16, 16, seed=i) for i in range(3)]
    (lo, hi), blobs, stats = distributed.compress_corpus_distributed(imgs, 8)
    assert (lo, hi) == (0, 3) and len(blobs) == 3
    for img, blob in zip(imgs, blobs):
        np.testing.assert_array_equal(llcomp_tpu.decompress(blob), img)


def test_allgather_streams_single():
    s = [b"abc", b"", b"xy"]
    assert distributed._allgather_streams(s, 3, 0) == s


def test_phase_timer():
    t = profiling.PhaseTimer()
    with t("enc"):
        pass
    with t("enc"):
        pass
    rep = t.report()
    assert rep["enc"]["calls"] == 2


def test_annotate_smoke():
    import jax.numpy as jnp

    with profiling.annotate("encode-step"):
        _ = jnp.ones(4).sum()
