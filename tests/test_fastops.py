"""Native fastops extension tests (run against the fallback when unbuilt)."""

import numpy as np
import pytest

from visualcloze_tpu.utils import fastops


def test_hconcat_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    cells = [rng.integers(0, 256, (32, 24, 3), dtype=np.uint8) for _ in range(3)]
    got = fastops.hconcat_normalize(cells)
    want = np.concatenate(cells, axis=1).astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.dtype == np.float32


def test_resize_normalize_range_and_shape():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
    out = fastops.resize_normalize(img, 32, 24)
    assert out.shape == (32, 24, 3)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_resize_normalize_identity_size():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    out = fastops.resize_normalize(img, 16, 16)
    want = img.astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(out, want, atol=2e-2)


@pytest.mark.skipif(not fastops.HAVE_NATIVE, reason="extension not built")
def test_native_rejects_bad_inputs():
    from visualcloze_tpu import _fastops

    with pytest.raises(ValueError):
        _fastops.resize_normalize(np.zeros((4, 4), np.uint8), 2, 2)
    with pytest.raises(ValueError):
        _fastops.hconcat_normalize([])
    with pytest.raises(ValueError):
        _fastops.hconcat_normalize(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)]
        )
