"""Four-step MXU FFT vs jnp.fft oracles (both precisions, both paddings)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.parallel.mxu_fft import (
    _best_factors,
    fft_padded,
    ifft_truncated,
)


def test_best_factors():
    assert _best_factors(512) == (16, 32)
    assert _best_factors(64) == (8, 8)
    m1, m2 = _best_factors(96)
    assert m1 * m2 == 96


@pytest.mark.parametrize("m,axis,shape", [
    (64, 0, (32, 6, 5)),
    (128, 1, (4, 64, 5)),
    (512, 0, (256, 12, 7)),
    (96, 2, (3, 4, 48)),
])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_fft_padded_matches_jnp(m, axis, shape, dtype):
    rng = np.random.default_rng(42)
    x = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        dtype
    )
    ref = np.fft.fft(x, n=m, axis=axis)
    out = np.asarray(fft_padded(jnp.asarray(x), axis, m))
    tol = 1e-5 if dtype == np.complex64 else 1e-12
    np.testing.assert_allclose(out, ref, atol=tol * np.abs(ref).max())


@pytest.mark.parametrize("m,axis", [(64, 0), (512, 1), (96, 2)])
@pytest.mark.parametrize("dtype", [np.complex64, np.complex128])
def test_ifft_truncated_matches_jnp(m, axis, dtype):
    rng = np.random.default_rng(43)
    shape = [5, 6, 7]
    shape[axis] = m
    f = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        dtype
    )
    ref = np.fft.ifft(f, axis=axis)
    sl = [slice(None)] * 3
    sl[axis] = slice(0, m // 2)
    out = np.asarray(ifft_truncated(jnp.asarray(f), axis, m // 2))
    tol = 1e-5 if dtype == np.complex64 else 1e-12
    np.testing.assert_allclose(
        out, ref[tuple(sl)], atol=tol * np.abs(ref).max()
    )


def test_unsupported_sizes_fall_back():
    """Odd / small sizes fall back to jnp.fft exactly."""
    rng = np.random.default_rng(44)
    x = (rng.standard_normal((9, 4)) + 0j).astype(np.complex128)
    ref = np.fft.fft(x, n=18, axis=0)
    out = np.asarray(fft_padded(jnp.asarray(x), 0, 18))
    np.testing.assert_allclose(out, ref, atol=1e-12)
