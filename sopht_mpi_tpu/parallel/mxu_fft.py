"""Four-step FFT on the MXU (matmul-based Cooley-Tukey).

XLA's built-in TPU FFT streams each length-M axis pass at ~100 GB/s on a
v5e and cannot exploit the structure of the free-space Poisson convolution
(zero-padded inputs, truncated outputs). This module implements the classic
four-step decomposition M = M1*M2:

    n = n1 + M1*n2,  k = k2 + M2*k1
    X[k2 + M2 k1] = sum_n1 W_M1[k1, n1] * T[n1, k2] *
                    (sum_n2 W_M2[k2, n2] x[n1 + M1 n2])
    T[n1, k2] = exp(-2 pi i n1 k2 / M)

i.e. two small DFT matmuls (MXU work, einsum at HIGHEST precision for f32
fidelity) and one twiddle multiply, instead of log2(M) streaming passes.
The domain-doubling structure is exploited natively:

- ``n_nonzero = M/2`` (zero-padded upper half) drops half of the W_M2
  columns on the forward transform;
- ``out_len = M/2`` (truncated free-space result) drops half of the W_M1
  rows on the inverse.

Used by the unbounded Poisson solvers for the non-minor (y, z) axis passes
of the doubled-domain transforms (ops/poisson.py). The reference's
counterpart of all of this is FFTW via mpi4py-fft (fft_mpi_3d.py:21-30).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _best_factors(m: int) -> tuple[int, int]:
    """Factor m = m1 * m2 with m1 <= m2, m1 as close to sqrt(m) as
    possible, and m2 even when achievable (needed for the half-input
    optimization)."""
    best = None
    for m1 in range(int(np.sqrt(m)), 0, -1):
        if m % m1 == 0:
            best = (m1, m // m1)
            break
    return best


@functools.lru_cache(maxsize=None)
def _dft_mats(m: int, cols: int, rows: int, dtype=np.float32):
    """Real/imag parts of the DFT matrix W[k, n] = exp(-2 pi i k n / m),
    truncated to ``rows`` output rows and ``cols`` input columns."""
    k = np.arange(rows)[:, None]
    n = np.arange(cols)[None, :]
    ang = 2.0 * np.pi * k * n / m
    # cache NUMPY arrays: caching jnp arrays would capture traced constants
    # created inside a jit trace and leak them into later traces
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


@functools.lru_cache(maxsize=None)
def _twiddle(m: int, m1: int, m2: int, k2_len: int, dtype=np.float32):
    """T[n1, k2] = exp(-2 pi i n1 k2 / m), shape (m1, k2_len)."""
    n1 = np.arange(m1)[:, None]
    k2 = np.arange(k2_len)[None, :]
    ang = 2.0 * np.pi * n1 * k2 / m
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _cmatmul(cr, ci, xr, xi):
    """(C - iS)(xr + i xi) contracted over the shared first axis of x:
    einsum 'kn,n...->k...' at HIGHEST precision (full f32 on MXU)."""
    e = lambda a, b: jnp.einsum(
        "kn,n...->k...",
        a.astype(b.dtype),
        b,
        preferred_element_type=b.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    # W = C - iS
    yr = e(cr, xr) + e(ci, xi)
    yi = e(cr, xi) - e(ci, xr)
    return yr, yi


def _supported(m: int) -> bool:
    m1, m2 = _best_factors(m)
    return m >= 64 and m1 >= 4 and m2 % 2 == 0


def fft_padded(x, axis: int, m: int):
    """FFT of length ``m`` along ``axis`` of a signal zero-padded from
    ``x.shape[axis]`` (must be m//2) to m. Equivalent to
    ``jnp.fft.fft(x, n=m, axis=axis)``."""
    n_in = x.shape[axis]
    if not (_supported(m) and 2 * n_in == m):
        return jnp.fft.fft(x, n=m, axis=axis)
    m1, m2 = _best_factors(m)
    xm = jnp.moveaxis(x, axis, 0)
    batch = xm.shape[1:]
    # n = n1 + m1*n2; nonzero n < m/2 <=> n2 < m2/2 (m2 even)
    xr_ = jnp.real(xm).reshape(m2 // 2, m1, *batch)
    xi_ = jnp.imag(xm).reshape(m2 // 2, m1, *batch)
    rdt = np.dtype(xr_.dtype)

    # step 1: DFT over n2 (m2-point, half input columns)
    c2, s2 = _dft_mats(m2, m2 // 2, m2, rdt)
    yr, yi = _cmatmul(c2, s2, xr_, xi_)  # (m2=k2, m1=n1, *batch)

    # step 2: twiddle T[n1, k2]
    tc, ts = _twiddle(m, m1, m2, m2, rdt)
    tc = tc.T[:, :, *(None,) * len(batch)]  # (k2, n1, 1...)
    ts = ts.T[:, :, *(None,) * len(batch)]
    yr, yi = yr * tc + yi * ts, yi * tc - yr * ts

    # step 3: DFT over n1 (m1-point): move n1 first
    yr = jnp.moveaxis(yr, 1, 0)  # (n1, k2, *batch)
    yi = jnp.moveaxis(yi, 1, 0)
    c1, s1 = _dft_mats(m1, m1, m1, rdt)
    zr, zi = _cmatmul(c1, s1, yr, yi)  # (k1, k2, *batch)

    out = jax.lax.complex(zr, zi).reshape(m, *batch)  # k = m2*k1 + k2
    return jnp.moveaxis(out, 0, axis)


def ifft_truncated(f, axis: int, out_len: int):
    """First ``out_len`` entries (must be m//2) of
    ``jnp.fft.ifft(f, axis=axis)`` for m = f.shape[axis]."""
    m = f.shape[axis]
    if not (_supported(m) and 2 * out_len == m):
        out = jnp.fft.ifft(f, axis=axis)
        return jax.lax.slice_in_dim(out, 0, out_len, axis=axis)
    m1, m2 = _best_factors(m)
    fm = jnp.moveaxis(f, axis, 0)
    batch = fm.shape[1:]
    # IFFT = conj(FFT(conj(.)))/m; FFT with full input, truncated output.
    # k = m2*k1 + k2 on input; output index n = n1 + m1*n2 with n < m/2
    # <=> n2 < m2/2.
    xr_ = jnp.real(fm).reshape(m1, m2, *batch)  # (k1, k2, *batch)
    xi_ = (-jnp.imag(fm)).reshape(m1, m2, *batch)  # conj
    rdt = np.dtype(xr_.dtype)

    # step 1: DFT over k1 (m1-point): result indexed by n1
    c1, s1 = _dft_mats(m1, m1, m1, rdt)
    yr, yi = _cmatmul(c1, s1, xr_, xi_)  # (n1, k2, *batch)

    # step 2: twiddle T[n1, k2]
    tc, ts = _twiddle(m, m1, m2, m2, rdt)
    tc = tc[:, :, *(None,) * len(batch)]
    ts = ts[:, :, *(None,) * len(batch)]
    yr, yi = yr * tc + yi * ts, yi * tc - yr * ts

    # step 3: DFT over k2 (m2-point), keep only n2 < m2/2 output rows
    yr = jnp.moveaxis(yr, 1, 0)  # (k2, n1, *batch)
    yi = jnp.moveaxis(yi, 1, 0)
    c2, s2 = _dft_mats(m2, m2, m2 // 2, rdt)
    zr, zi = _cmatmul(c2, s2, yr, yi)  # (n2, n1, *batch)

    # n = n1 + m1*n2 -> flatten (n2, n1); conj and normalize
    out = jax.lax.complex(zr, -zi).reshape(out_len, *batch) / m
    return jnp.moveaxis(out, 0, axis)
