"""Native batcher tests (exercise both native and fallback paths)."""
import numpy as np

from mxfusion_tpu.native import (gather_rows, shuffled_indices,
                                 native_available)
from mxfusion_tpu.native import loader


def test_gather_rows_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((1000, 17)).astype(np.float32)
    idx = rng.integers(0, 1000, size=256)
    out = gather_rows(src, idx)
    assert np.array_equal(out, src[idx])


def test_gather_rows_3d():
    rng = np.random.default_rng(1)
    src = rng.standard_normal((100, 4, 3))
    idx = rng.integers(0, 100, size=64)
    out = gather_rows(src, idx)
    assert np.array_equal(out, src[idx])


def test_shuffled_indices_is_permutation_and_deterministic():
    a = shuffled_indices(1000, seed=7)
    b = shuffled_indices(1000, seed=7)
    c = shuffled_indices(1000, seed=8)
    assert np.array_equal(np.sort(a), np.arange(1000))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_fallback_path():
    # force the numpy fallback regardless of compiler availability
    saved_lib, saved_tried = loader._LIB, loader._TRIED
    loader._LIB, loader._TRIED = None, True
    try:
        rng = np.random.default_rng(2)
        src = rng.standard_normal((50, 3))
        idx = rng.integers(0, 50, size=20)
        assert np.array_equal(gather_rows(src, idx), src[idx])
        p = shuffled_indices(50, seed=1)
        assert np.array_equal(np.sort(p), np.arange(50))
    finally:
        loader._LIB, loader._TRIED = saved_lib, saved_tried


def test_native_build_status_reported():
    # informational: native path should build in this image (g++ exists)
    assert isinstance(native_available(), bool)


def test_gather_rows_bounds_checked():
    import pytest
    src = np.zeros((10, 3))
    for bad in ([-1, 0], [0, 10], [99]):
        with pytest.raises(IndexError):
            gather_rows(src, np.asarray(bad, dtype=np.int64))
    # and identically on the forced numpy fallback
    saved_lib, saved_tried = loader._LIB, loader._TRIED
    loader._LIB, loader._TRIED = None, True
    try:
        with pytest.raises(IndexError):
            gather_rows(src, np.asarray([10], dtype=np.int64))
    finally:
        loader._LIB, loader._TRIED = saved_lib, saved_tried
