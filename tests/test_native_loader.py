"""Native loader: compiled output must match the NumPy reference path."""

import numpy as np
import pytest

from r3d_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("g++ unavailable / native build failed")
    return True


def test_probe(tmp_path, lib_ok):
    x = np.random.RandomState(0).randn(37, 11).astype(np.float32)
    p = tmp_path / "a.npy"
    np.save(p, x)
    shape, ws = native.probe(str(p))
    assert shape == (37, 11) and ws == 4


@pytest.mark.parametrize("stride", [1, 3])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_load_sliced_matches_numpy(tmp_path, lib_ok, stride, dtype):
    rng = np.random.RandomState(1)
    x = rng.randn(50, 16).astype(dtype)
    p = tmp_path / f"b_{stride}_{dtype.__name__}.npy"
    np.save(p, x)
    observed = 33
    out_rows = 64
    res = native.load_sliced(str(p), observed, stride, out_rows, 16)
    assert res is not None
    arr, n = res
    ref = x[:observed][::stride].astype(np.float32)
    assert n == len(ref)
    np.testing.assert_allclose(arr[:n], ref, rtol=1e-6)
    assert np.all(arr[n:] == 0)


def test_load_sliced_transposed(tmp_path, lib_ok):
    """breakfast/50salads layout: stored [C, S], loaded as [S, C]."""
    rng = np.random.RandomState(2)
    x = rng.randn(12, 40).astype(np.float32)  # [C, S]
    p = tmp_path / "c.npy"
    np.save(p, x)
    res = native.load_sliced(str(p), 30, 2, 32, 12, transpose=True)
    assert res is not None
    arr, n = res
    ref = x.T[:30][::2]
    assert n == len(ref)
    np.testing.assert_allclose(arr[:n], ref, rtol=1e-6)


def test_load_sliced_ndim_depth(tmp_path, lib_ok):
    """depth streams are [S, H, W]; rows flatten to H*W."""
    rng = np.random.RandomState(3)
    x = rng.randn(20, 8, 6).astype(np.float32)
    p = tmp_path / "d.npy"
    np.save(p, x)
    res = native.load_sliced(str(p), 15, 1, 16, 48)
    arr, n = res
    np.testing.assert_allclose(arr[:n], x[:15].reshape(15, 48), rtol=1e-6)


def test_load_batch(tmp_path, lib_ok):
    rng = np.random.RandomState(4)
    paths, lens, refs = [], [], []
    for i in range(5):
        s = int(rng.randint(20, 40))
        x = rng.randn(s, 8).astype(np.float32)
        p = tmp_path / f"v{i}.npy"
        np.save(p, x)
        obs = int(0.7 * s)
        paths.append(str(p))
        lens.append(obs)
        refs.append(x[:obs])
    out_rows = 32
    res = native.load_batch(paths, lens, 1, out_rows, 8)
    assert res is not None
    batch, rows = res
    for i, ref in enumerate(refs):
        assert rows[i] == len(ref)
        np.testing.assert_allclose(batch[i, : rows[i]], ref, rtol=1e-6)
        assert np.all(batch[i, rows[i] :] == 0)


def test_missing_file_returns_none(lib_ok):
    assert native.load_sliced("/nonexistent.npy", 10, 1, 8, 4) is None
