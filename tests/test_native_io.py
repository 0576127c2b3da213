"""Native C++ IO runtime tests: npy parsing, packed-store gather, parallel
per-file loads — exact agreement with numpy."""

import numpy as np
import pytest

from n2nmn_tpu.native import io as native_io


@pytest.fixture(scope="module")
def have_native():
    if not native_io.available():
        pytest.skip("native library not built and no toolchain")
    return True


def test_packed_store_gather(tmp_path, have_native):
    rng = np.random.RandomState(0)
    data = rng.randn(37, 5, 6, 3).astype(np.float32)
    path = str(tmp_path / "packed.npy")
    np.save(path, data)
    store = native_io.PackedStore(path)
    assert store.native, "expected the native mmap path"
    assert store.rows == 37
    assert store.row_floats == 5 * 6 * 3
    idx = np.array([0, 36, 5, 5, 17], np.int64)
    out = store.gather(idx)
    np.testing.assert_array_equal(
        out, data.reshape(37, -1)[idx])
    with pytest.raises(IndexError):
        store.gather(np.array([37], np.int64))
    with pytest.raises(IndexError):
        store.gather(np.array([-1], np.int64))
    store.close()


def test_load_npy_batch(tmp_path, have_native):
    rng = np.random.RandomState(1)
    paths, rows = [], []
    for i in range(9):
        row = rng.randn(1, 4, 7, 2).astype(np.float32)
        p = str(tmp_path / f"f{i}.npy")
        np.save(p, row)
        paths.append(p)
        rows.append(row.reshape(-1))
    out = native_io.load_npy_batch(paths, 4 * 7 * 2, num_threads=4)
    np.testing.assert_array_equal(out, np.stack(rows))


def test_npy_v2_header(tmp_path, have_native):
    """Long header forces .npy format v2 (4-byte header length)."""
    data = np.random.RandomState(2).randn(3, 8).astype(np.float32)
    path = str(tmp_path / "v2.npy")
    with open(path, "wb") as f:
        np.lib.format.write_array(f, data, version=(2, 0))
    store = native_io.PackedStore(path)
    assert store.native
    out = store.gather(np.array([2, 0], np.int64))
    np.testing.assert_array_equal(out, data[[2, 0]])
    store.close()


def test_non_f32_rejected_gracefully(tmp_path, have_native):
    """Non-float32 packed file: native open fails, falls back to numpy."""
    path = str(tmp_path / "f64.npy")
    np.save(path, np.zeros((4, 3), np.float64))
    store = native_io.PackedStore(path)
    assert not store.native  # numpy fallback
    out = store.gather(np.array([1], np.int64))
    assert out.shape == (1, 3)
