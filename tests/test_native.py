"""Native C++ host ops vs the numpy oracles."""

import numpy as np
import pytest

from enhanced_unet_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable (no g++)"
)


def _numpy_counts(mask):
    flat = (np.asarray(mask, np.uint8) > 0).astype(np.uint8).flatten(order="F")
    n = flat.size
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate(([0], change, [n]))
    counts = np.diff(bounds).astype(np.int64)
    if flat[0] == 1:
        counts = np.concatenate(([0], counts))
    return counts


class TestNativeRLE:
    def test_counts_match_numpy(self, rng):
        for _ in range(20):
            mask = (rng.random((37, 53)) > rng.random()).astype(np.uint8)
            got = native.rle_counts_native(mask)
            np.testing.assert_array_equal(got, _numpy_counts(mask))

    def test_empty_and_full(self):
        z = np.zeros((8, 8), np.uint8)
        np.testing.assert_array_equal(native.rle_counts_native(z), [64])
        o = np.ones((8, 8), np.uint8)
        np.testing.assert_array_equal(native.rle_counts_native(o), [0, 64])

    def test_decode_roundtrip(self, rng):
        mask = (rng.random((25, 31)) > 0.5).astype(np.uint8)
        counts = native.rle_counts_native(mask)
        back = native.rle_decode_native(counts, 25, 31)
        np.testing.assert_array_equal(back, mask)


class TestNativeIoU:
    def test_matches_numpy(self, rng):
        a = (rng.random((5, 40, 40)) > 0.7).astype(np.uint8)
        b = (rng.random((7, 40, 40)) > 0.7).astype(np.uint8)
        got = native.pairwise_iou_native(a, b)
        pa = a.reshape(5, -1).astype(np.int64)
        pb = b.reshape(7, -1).astype(np.int64)
        inter = pa @ pb.T
        union = pa.sum(1)[:, None] + pb.sum(1)[None, :] - inter
        expected = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        np.testing.assert_allclose(got, expected, atol=1e-12)

    def test_integration_through_instance_metrics(self, rng):
        from enhanced_unet_tpu.metrics import calculate_instance_metrics

        m = np.zeros((32, 32), np.uint8)
        m[4:12, 4:12] = 1
        r = calculate_instance_metrics([m], [0], [0.9], [m], [0])
        assert r["live_iou"] == 1.0 and r["live_precision"] == 1.0
