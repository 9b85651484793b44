"""Async native field dumper tests (C++ worker-thread writer)."""

import numpy as np
import pytest

from sopht_mpi_tpu.utils.native_io import AsyncFieldDumper, _npy_header


def test_npy_header_roundtrip(tmp_path):
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "x.npy"
    with open(path, "wb") as f:
        f.write(_npy_header(arr))
        f.write(arr.tobytes())
    np.testing.assert_array_equal(np.load(path), arr)


def test_async_dump_roundtrip(tmp_path):
    dumper = AsyncFieldDumper()
    rng = np.random.default_rng(0)
    arrays = {
        f"f{i}.npy": rng.standard_normal((16, 8, 4)).astype(np.float32)
        for i in range(8)
    }
    for name, arr in arrays.items():
        dumper.dump(str(tmp_path / name), arr)
    dumper.flush()
    assert dumper.failed() == 0
    assert dumper.pending() == 0
    for name, arr in arrays.items():
        np.testing.assert_array_equal(np.load(tmp_path / name), arr)
    dumper.close()


def test_native_build_available():
    """The image ships g++; the native path should actually be exercised."""
    dumper = AsyncFieldDumper()
    assert dumper.is_native
    dumper.close()


def test_dump_float64_and_int(tmp_path):
    dumper = AsyncFieldDumper()
    a = np.arange(10, dtype=np.float64)
    b = np.arange(6, dtype=np.int32).reshape(2, 3)
    dumper.dump(str(tmp_path / "a.npy"), a)
    dumper.dump(str(tmp_path / "b.npy"), b)
    dumper.flush()
    np.testing.assert_array_equal(np.load(tmp_path / "a.npy"), a)
    np.testing.assert_array_equal(np.load(tmp_path / "b.npy"), b)
    dumper.close()
