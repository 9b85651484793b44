"""Pallas TPU kernels for the doubled-domain FFT passes.

The four-step MXU FFT (mxu_fft.py) is already ~2x XLA's FFT, but each pass
still materializes real/imag intermediates in HBM between its einsum
stages (~200 GB/s effective). These kernels fuse a whole axis pass -
reshape -> DFT matmul -> twiddle-folded DFT matmul -> reshape - inside
VMEM, so every element is read from and written to HBM exactly once per
pass. The spectrum lives in SPLIT real/imag float32 pairs end to end
(complex arrays are only touched at the tiny pre-padding stage), and the
free-space Green's multiply is folded into the inverse pass's load.

Math (same decomposition as mxu_fft.py): m = m1*m2,
    n = n1 + m1*n2,  k = k2 + m2*k1
forward (zero-padded input, n < m/2 <=> n2 < m2/2):
    step 1: contract n2 with W2[k2, n2], n2 < m2/2
    step 2: contract n1 with A_f[k2, k1, n1] = W1[k1, n1] T[n1, k2]
inverse (truncated output, n < m/2):
    step 1: contract k1 with A_i[k2, n1, k1] = W1*[n1, k1] T*[n1, k2]
    step 2: contract k2 with W2*[n2, k2] / m, n2 < m2/2

Layout contract: arrays are (batch A, L, B) with the transform along the
middle axis; the kernel grids over (A, B tiles). A z-axis pass uses the
(1, Z, Y*X) view (free reshape); a y-axis pass uses (Z, Y, X) directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sopht_mpi_tpu.parallel.mxu_fft import _best_factors

_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _fwd_mats(m: int):
    """(W2r, W2i (m2, m2/2)), (Ar, Ai (m2, m1, m1)) as float32 numpy."""
    m1, m2 = _best_factors(m)
    k2 = np.arange(m2)[:, None]
    n2 = np.arange(m2 // 2)[None, :]
    w2 = np.exp(-2j * np.pi * k2 * n2 / m2)
    k1 = np.arange(m1)[:, None]
    n1 = np.arange(m1)[None, :]
    w1 = np.exp(-2j * np.pi * k1 * n1 / m1)  # (k1, n1)
    t = np.exp(-2j * np.pi * np.arange(m1)[:, None] * np.arange(m2)[None, :] / m)
    a = w1[None, :, :] * np.transpose(t)[:, None, :]  # (k2, k1, n1)
    f32 = lambda x: x.astype(np.float32)
    return (f32(w2.real), f32(w2.imag)), (f32(a.real), f32(a.imag))


@functools.lru_cache(maxsize=None)
def _inv_mats(m: int):
    """(Ar, Ai (m2, m1, m1) [k2, n1, k1]), (W2r, W2i (m2/2, m2) with 1/m)."""
    m1, m2 = _best_factors(m)
    n1 = np.arange(m1)[:, None]
    k1 = np.arange(m1)[None, :]
    w1 = np.exp(+2j * np.pi * n1 * k1 / m1)  # (n1, k1)
    t = np.exp(+2j * np.pi * np.arange(m1)[:, None] * np.arange(m2)[None, :] / m)
    # A_i[k2, n1, k1] = W1[n1, k1] * T[n1, k2]: T broadcasts over k1 (last)
    a = w1[None, :, :] * np.transpose(t)[:, :, None]  # (k2, n1, k1)
    n2 = np.arange(m2 // 2)[:, None]
    k2 = np.arange(m2)[None, :]
    w2 = np.exp(+2j * np.pi * n2 * k2 / m2) / m
    f32 = lambda x: x.astype(np.float32)
    return (f32(a.real), f32(a.imag)), (f32(w2.real), f32(w2.imag))


def _mm(a, x):
    return jax.lax.dot(a, x, precision=_HIGHEST,
                       preferred_element_type=jnp.float32)


def _mm3(a, x):
    """3-pass bf16 matmul: a@x = ah@xh + ah@xl + al@xh with f32
    accumulation (drops the O(2^-16) al@xl term)."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda p, q: jax.lax.dot(p, q, preferred_element_type=jnp.float32)
    return d(ah, xh) + d(ah, xl) + d(al, xh)


def _mm_conv(a, x, fast):
    """Matmul used by the fused conv(+curl) kernels. ``fast`` (a
    trace-time static threaded from the owning solver's ``fast_spectral``
    config) selects the 3-pass bf16 hi/lo matmuls for these kernels
    ONLY - the one compute-bound pass of the solve. Measured at 256^3:
    conv pass 21.4 -> 18.0 ms, full-solve relative error 6.6e-6 vs the
    6-pass HIGHEST emulation's ~1e-7 (the reference's FFTW float32 is
    ~1e-7; round 4 made 3-pass the TPU default after observable-level
    physics validation - see poisson.DEFAULT_FAST_SPECTRAL; pass
    ``fast_spectral=False`` for the HIGHEST tier).
    The bandwidth-bound x/y passes keep HIGHEST always - 3-pass
    would cost accuracy there for no wall-time return (1-pass bf16
    measured only 1.5x on this pass: mixed MXU/BW/issue-bound)."""
    return _mm3(a, x) if fast else _mm(a, x)


def _cmm(mr, mi, xr, xi):
    """2D complex matmul (mr + i mi)(xr + i xi) on the MXU."""
    return _mm(mr, xr) - _mm(mi, xi), _mm(mr, xi) + _mm(mi, xr)


def _pack(r, i):
    """Real block form of a complex matrix: (W)(x) as
    [[Wr, -Wi], [Wi, Wr]] @ [xr; xi]. ONE double-size MXU matmul replaces
    the 4 small ones of _cmm - measured 1.5x faster on the fused conv pass
    (the per-slice matrices are tiny, so op count dominates)."""
    return np.block([[r, -i], [i, r]]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _packed_fwd_mats(m: int):
    """P1 (2m2, m2): packed half-input W2. PA (m2, 2m1, 2m1): packed
    per-k2 twiddled W1."""
    (w2r, w2i), (ar, ai) = _fwd_mats(m)
    m1, m2 = _best_factors(m)
    p1 = _pack(w2r, w2i)
    pa = np.stack([_pack(ar[c], ai[c]) for c in range(m2)])
    return p1, pa


@functools.lru_cache(maxsize=None)
def _packed_inv_mats(m: int):
    """PA (m2, 2m1, 2m1): packed per-k2 inverse step-1. P2 (m2, 2m2):
    packed half-output W2 inverse (1/m folded in)."""
    (ar, ai), (w2r, w2i) = _inv_mats(m)
    m1, m2 = _best_factors(m)
    pa = np.stack([_pack(ar[c], ai[c]) for c in range(m2)])
    p2 = _pack(w2r, w2i)
    return pa, p2


def _cat(a, b):
    return jnp.concatenate([a, b], axis=0)


def _fwd_kernel(m, m1, m2, p1_ref, pa_ref, xr_ref, xi_ref, or_ref, oi_ref):
    """Input blocks are pre-split 4D (1, m2/2, m1, bt); contractions run as
    per-slice packed-complex 2D matmuls (Mosaic does not support
    sublane-splitting shape casts inside kernels)."""
    bt = xr_ref.shape[3]
    p1 = p1_ref[...]
    # step 1 (contract n2; one packed matmul per n1 slice)
    # y (n1, 2m2, bt): rows [0:m2] = re over k2, [m2:] = im
    y = jnp.stack(
        [_mm(p1, _cat(xr_ref[0, :, j, :], xi_ref[0, :, j, :]))
         for j in range(m1)]
    )
    # step 2 (contract n1; one packed matmul per k2 slice) -> z (k1, bt)
    zr_sl, zi_sl = [], []
    for c in range(m2):
        z = _mm(pa_ref[c], _cat(y[:, c, :], y[:, m2 + c, :]))  # (2m1, bt)
        zr_sl.append(z[:m1])
        zi_sl.append(z[m1:])
    # k = m2*k1 + k2: stack k2 inside k1 then merge (a no-op view)
    or_ref[0] = jnp.stack(zr_sl, axis=1).reshape(m, bt)
    oi_ref[0] = jnp.stack(zi_sl, axis=1).reshape(m, bt)


def _inv_kernel(m, m1, m2, with_greens, *refs):
    """Input blocks pre-split 4D (1, m1=k1, m2=k2, bt); optional greens
    block with the same view multiplies on load."""
    if with_greens:
        pa_ref, p2_ref, g_ref, xr_ref, xi_ref, or_ref, oi_ref = refs
    else:
        pa_ref, p2_ref, xr_ref, xi_ref, or_ref, oi_ref = refs
    bt = xr_ref.shape[3]
    # step 1 (contract k1; one packed matmul per k2 slice)
    y_sl = []
    for c in range(m2):
        xr_c = xr_ref[0, :, c, :]  # (k1, bt)
        xi_c = xi_ref[0, :, c, :]
        if with_greens:
            g_c = g_ref[0, :, c, :]
            xr_c = xr_c * g_c
            xi_c = xi_c * g_c
        y_sl.append(_mm(pa_ref[c], _cat(xr_c, xi_c)))  # (2m1, bt)
    y = jnp.stack(y_sl)  # (k2, 2m1, bt): [:, :m1] = re over n1, [:, m1:] = im
    # step 2 (contract k2; one packed matmul per n1 slice) -> (2*(m2/2), bt)
    p2 = p2_ref[...]
    zr_sl, zi_sl = [], []
    for j in range(m1):
        o = _mm(p2, _cat(y[:, j, :], y[:, m1 + j, :]))  # (m2, bt)
        zr_sl.append(o[: m2 // 2])
        zi_sl.append(o[m2 // 2:])
    # n = n1 + m1*n2: stack n1 inside n2 then merge (a no-op view)
    or_ref[0] = jnp.stack(zr_sl, axis=1).reshape(m // 2, bt)
    oi_ref[0] = jnp.stack(zi_sl, axis=1).reshape(m // 2, bt)


def _pick_btile(b: int, budget_elems: int):
    """Largest valid Mosaic lane tile: a divisor of b that is a multiple
    of 128, or the full axis (b itself) if it fits the budget. Returns
    None when no valid tile exists (callers fall back to the mxu path)."""
    for bt in range(min(b, budget_elems), 127, -1):
        if b % bt == 0 and bt % 128 == 0:
            return bt
    if b <= budget_elems:
        return b
    return None


def _pass_budget(m: int) -> int:
    return max(128, (3 * 512 * 1024) // (4 * m))


def pass_tile_ok(b: int, m: int) -> bool:
    """Whether a middle-axis pass of length m over lane batch b admits a
    valid VMEM tile."""
    return _pick_btile(b, _pass_budget(m)) is not None


def _conv_budget(m: int) -> int:
    """Lane-tile budget of the fused fwd+greens+inv pass (larger VMEM
    working set than a single pass): bt=512 at m<=512 measures fastest;
    m=1024 needs bt=128 (256 overflows scoped vmem by ~1 MB)."""
    return 512 if m <= 512 else 128


def conv_pass_tile_ok(b: int, m: int) -> bool:
    """Whether the fused ``fft_greens_ifft_pass`` admits a valid tile -
    STRICTER than :func:`pass_tile_ok`; support gates must use this for
    the greens pass or risk a trace-time assert instead of a fallback."""
    return _pick_btile(b, _conv_budget(m)) is not None


def _fft_pass_padded_impl(xr, xi, axis_len_out: int):
    """Forward padded FFT along the MIDDLE axis of (A, L, B) float32 pairs:
    input L = m/2 (zero-padded semantics), output L = m = axis_len_out."""
    m = axis_len_out
    m1, m2 = _best_factors(m)
    a_dim, l_in, b = xr.shape
    assert 2 * l_in == m
    bt = _pick_btile(b, _pass_budget(m))
    assert bt is not None, (b, m)
    kern = functools.partial(_fwd_kernel, m, m1, m2)
    p1, pa = _packed_fwd_mats(m)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, j: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    # pre-split the transform axis outside the kernel (free view):
    # n = n1 + m1*n2 -> (n2, n1)
    xr4 = xr.reshape(a_dim, m2 // 2, m1, b)
    xi4 = xi.reshape(a_dim, m2 // 2, m1, b)
    in_spec = pl.BlockSpec(
        (1, m2 // 2, m1, bt), lambda i, j: (i, 0, 0, j),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, m, bt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(a_dim, b // bt),
        in_specs=[mat_spec(p1), mat_spec(pa), in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((a_dim, m, b), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(jnp.asarray(p1), jnp.asarray(pa), xr4, xi4)


def _ifft_pass_truncated_impl(xr, xi, greens=None):
    """Inverse FFT along the MIDDLE axis of (A, m, B) float32 pairs,
    keeping the first m/2 outputs. ``greens`` (float32, shape (A, m, B) or
    (1, m, B)) is an optional real spectral multiplier folded into the
    load; with a leading axis of 1 every A-block reads the SAME copy (no
    broadcast materialization, 1/A the HBM reads)."""
    a_dim, m, b = xr.shape
    m1, m2 = _best_factors(m)
    bt = _pick_btile(b, _pass_budget(m))
    assert bt is not None, (b, m)
    kern = functools.partial(_inv_kernel, m, m1, m2, greens is not None)
    pa, p2 = _packed_inv_mats(m)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, j: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    # pre-split k = m2*k1 + k2 -> (k1, k2) outside the kernel (free view)
    split = lambda arr: arr.reshape(arr.shape[0], m1, m2, b)
    in_spec = pl.BlockSpec(
        (1, m1, m2, bt), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, m // 2, bt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )
    mats = [jnp.asarray(pa), jnp.asarray(p2)]
    if greens is None:
        data = [split(xr), split(xi)]
        data_specs = [in_spec, in_spec]
    else:
        shared = greens.shape[0] == 1
        g_spec = pl.BlockSpec(
            (1, m1, m2, bt),
            (lambda i, j: (0, 0, 0, j)) if shared else
            (lambda i, j: (i, 0, 0, j)),
            memory_space=pltpu.VMEM,
        )
        data = [split(greens), split(xr), split(xi)]
        data_specs = [g_spec, in_spec, in_spec]
    return pl.pallas_call(
        kern,
        grid=(a_dim, b // bt),
        in_specs=[mat_spec(a) for a in mats] + data_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((a_dim, m // 2, b), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(*mats, *data)


def _conv_kernel(m, m1, m2, fast, p1_ref, paf_ref, pai_ref, p2_ref, g_ref,
                 xr_ref, xi_ref, or_ref, oi_ref):
    """Fused padded-forward -> greens multiply -> truncated-inverse along
    the middle axis, never materializing the doubled spectrum: the full
    length-m column exists only as per-k2 VMEM slices."""
    bt = xr_ref.shape[3]
    p1 = p1_ref[...]
    # forward step 1 (contract n2) -> y (n1, 2m2, bt)
    y = jnp.stack(
        [_mm_conv(p1, _cat(xr_ref[0, :, j, :], xi_ref[0, :, j, :]), fast)
         for j in range(m1)]
    )
    # forward step 2 (contract n1) + greens + inverse step 1 (contract k1),
    # per k2 slice
    y2_sl = []
    for c in range(m2):
        z = _mm_conv(paf_ref[c], _cat(y[:, c, :], y[:, m2 + c, :]),
                     fast)  # (2m1, bt)
        g_c = g_ref[0, :, c, :]
        z = z * _cat(g_c, g_c)
        y2_sl.append(_mm_conv(pai_ref[c], z, fast))  # (2m1, bt)
    y2 = jnp.stack(y2_sl)  # (k2, 2m1, bt)
    # inverse step 2 (contract k2, keep n2 < m2/2)
    p2 = p2_ref[...]
    zr_sl, zi_sl = [], []
    for j in range(m1):
        o = _mm_conv(p2, _cat(y2[:, j, :], y2[:, m1 + j, :]), fast)  # (m2, bt)
        zr_sl.append(o[: m2 // 2])
        zi_sl.append(o[m2 // 2:])
    or_ref[0] = jnp.stack(zr_sl, axis=1).reshape(m // 2, bt)
    oi_ref[0] = jnp.stack(zi_sl, axis=1).reshape(m // 2, bt)


def _fft_greens_ifft_pass_impl(xr, xi, greens, fast=False):
    """Fused ``ifft_pass_truncated(*fft_pass_padded(xr, xi, m), greens)``
    along the MIDDLE axis of (A, m/2, B) float32 pairs. ``greens`` is the
    real multiplier, shape (1, m, B) (one copy shared across A blocks).
    Peak HBM is in+out+greens - the (A, m, B) doubled spectrum of the
    separate-pass path never exists (at 512^3 that transient alone is
    4.3 GB/component). Wall-time measured neutral vs the separate passes.
    """
    a_dim, l_in, b = xr.shape
    m = 2 * l_in
    m1, m2 = _best_factors(m)
    bt = _pick_btile(b, _conv_budget(m))
    assert bt is not None, (b, m)
    p1, paf = _packed_fwd_mats(m)
    pai, p2 = _packed_inv_mats(m)
    kern = functools.partial(_conv_kernel, m, m1, m2, fast)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda j, i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec(
        (1, m2 // 2, m1, bt), lambda j, i: (i, 0, 0, j),
        memory_space=pltpu.VMEM,
    )
    # grid order (B tile, A): A iterates INNERMOST, so for a fixed B tile
    # the shared greens block index is unchanged across the A sweep and
    # Pallas skips the redundant fetches - at 256^3 c=3 this removes
    # 2/3 of the greens HBM reads (~536 MB/pass)
    g_spec = pl.BlockSpec(
        (1, m1, m2, bt), lambda j, i: (0, 0, 0, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, l_in, bt), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM
    )
    mats = [p1, paf, pai, p2]
    return pl.pallas_call(
        kern,
        grid=(b // bt, a_dim),
        in_specs=[mat_spec(a) for a in mats] + [g_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((a_dim, l_in, b), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(*[jnp.asarray(a) for a in mats],
      greens.reshape(1, m1, m2, b),
      xr.reshape(a_dim, m2 // 2, m1, b),
      xi.reshape(a_dim, m2 // 2, m1, b))


def _conv_curl_budget(m: int) -> int:
    """Lane-tile budget of the 3-component curl-mixing conv pass: its
    VMEM working set is ~3x :func:`_conv_budget`'s (all three components
    share every block so the cross-component curl can mix in VMEM).
    bt=256 at m=512 overflows scoped vmem by 4.6 MB (measured); 128 fits."""
    return 128


def conv_curl_pass_tile_ok(b: int, m: int) -> bool:
    """Whether :func:`fft_greens_curl_ifft_pass` admits a valid tile.
    m=1024 overflows scoped vmem by 282 KB even at the minimum bt=128
    (measured) - nz=512-class grids must take the unfused path."""
    return m <= 512 and _pick_btile(b, _conv_curl_budget(m)) is not None


def _conv_curl_kernel(m, m1, m2, fast, p1_ref, paf_ref, pai_ref, p2_ref,
                      sz_ref, g_ref, syx_ref, xr_ref, xi_ref, or_ref,
                      oi_ref):
    """``_conv_kernel`` for a 3-component block with the spectral
    central-difference curl mixed in at the full-spectral point: between
    the Green's multiply and the inverse step the per-k2 VMEM slices hold
    psi_hat = G * omega_hat for ALL components, so
    ``u_hat = i s x psi_hat`` (s = the FD symbols ``sin(2 pi k/M)/dx``)
    costs only VPU elementwise work - the streamfunction and the separate
    real-space curl pass never exist."""
    bt = xr_ref.shape[3]
    p1 = p1_ref[...]
    # forward step 1 (contract n2) per component -> y (n1, 2m2, bt)
    ys = [
        jnp.stack(
            [_mm_conv(p1, _cat(xr_ref[comp, :, j, :],
                             xi_ref[comp, :, j, :]), fast)
             for j in range(m1)]
        )
        for comp in range(3)
    ]
    sy = syx_ref[0:1, :]  # (1, bt): i-symbol along the (flattened) y freq
    sx = syx_ref[1:2, :]  # (1, bt): i-symbol along the bulk x freq
    y2 = [[], [], []]
    for c in range(m2):
        g_c = g_ref[0, :, c, :]  # (m1, bt)
        sz_c = sz_ref[:, c].reshape(m1, 1)  # i-symbol at k = m2*k1 + c
        # forward step 2 + greens -> psi_hat (split re/im) per component
        pr, pi_ = [], []
        for comp in range(3):
            z = _mm_conv(
                paf_ref[c], _cat(ys[comp][:, c, :], ys[comp][:, m2 + c, :]),
                fast,
            )  # (2m1, bt)
            pr.append(z[:m1] * g_c)
            pi_.append(z[m1:] * g_c)
        # u = i (s x psi): re(u) = -(s x im(psi)), im(u) = s x re(psi)
        # component order (x, y, z): u_x = i(sy psi_z - sz psi_y), ...
        ur = (
            sz_c * pi_[1] - sy * pi_[2],
            sx * pi_[2] - sz_c * pi_[0],
            sy * pi_[0] - sx * pi_[1],
        )
        ui = (
            sy * pr[2] - sz_c * pr[1],
            sz_c * pr[0] - sx * pr[2],
            sx * pr[1] - sy * pr[0],
        )
        for comp in range(3):
            y2[comp].append(
                _mm_conv(pai_ref[c], _cat(ur[comp], ui[comp]), fast)
            )
    # inverse step 2 (contract k2, keep n2 < m2/2) per component
    p2 = p2_ref[...]
    for comp in range(3):
        yc = jnp.stack(y2[comp])  # (k2, 2m1, bt)
        zr_sl, zi_sl = [], []
        for j in range(m1):
            o = _mm_conv(p2, _cat(yc[:, j, :], yc[:, m1 + j, :]),
                         fast)  # (m2, bt)
            zr_sl.append(o[: m2 // 2])
            zi_sl.append(o[m2 // 2:])
        or_ref[comp] = jnp.stack(zr_sl, axis=1).reshape(m // 2, bt)
        oi_ref[comp] = jnp.stack(zi_sl, axis=1).reshape(m // 2, bt)


def _fft_greens_curl_ifft_pass_impl(xr, xi, greens, sym_z, sym_yx,
                                    fast=False):
    """Fused padded-forward -> greens -> spectral-FD-curl -> truncated
    inverse along the MIDDLE axis of (3, m/2, B) float32 pairs.

    ``greens`` is the real multiplier, shape (1, m, B). ``sym_z`` (m,) and
    ``sym_yx`` (2, B) carry the central-difference curl symbols
    ``sin(2 pi k / M_axis) / dx`` of the transform axis and of the two
    axes flattened into B (rows: the B-major axis, then the B-minor /
    lane axis). Output: the three mixed components ``u = i s x (g * x^)``,
    inverse-transformed and truncated - i.e. the velocity of the
    Biot-Savart recovery with the real-space curl pass deleted.
    """
    a_dim, l_in, b = xr.shape
    assert a_dim == 3, a_dim
    m = 2 * l_in
    m1, m2 = _best_factors(m)
    bt = _pick_btile(b, _conv_curl_budget(m))
    assert bt is not None, (b, m)
    p1, paf = _packed_fwd_mats(m)
    pai, p2 = _packed_inv_mats(m)
    kern = functools.partial(_conv_curl_kernel, m, m1, m2, fast)
    mat_spec = lambda shape: pl.BlockSpec(
        shape, lambda j: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec(
        (3, m2 // 2, m1, bt), lambda j: (0, 0, 0, j),
        memory_space=pltpu.VMEM,
    )
    g_spec = pl.BlockSpec(
        (1, m1, m2, bt), lambda j: (0, 0, 0, j), memory_space=pltpu.VMEM
    )
    syx_spec = pl.BlockSpec(
        (2, bt), lambda j: (0, j), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (3, l_in, bt), lambda j: (0, 0, j), memory_space=pltpu.VMEM
    )
    mats = [p1, paf, pai, p2]
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[mat_spec(a.shape) for a in mats]
        + [mat_spec((m1, m2)), g_spec, syx_spec, in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((3, l_in, b), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(*[jnp.asarray(a) for a in mats],
      # k = m2*k1 + k2 -> row k1, column k2 (free view)
      sym_z.astype(jnp.float32).reshape(m1, m2),
      greens.reshape(1, m1, m2, b),
      sym_yx.astype(jnp.float32),
      xr.reshape(a_dim, m2 // 2, m1, b),
      xi.reshape(a_dim, m2 // 2, m1, b))


def _conv_curl_ref(xr, xi, greens, sym_z, sym_yx):
    """jnp formulation of :func:`_fft_greens_curl_ifft_pass_impl` (the
    parity oracle and the VJP formulation)."""
    l_in, b = xr.shape[1], xr.shape[2]
    m = 2 * l_in
    psi = jnp.fft.fft(_pad_mid(_c_(xr, xi), m), axis=1) * greens  # (3, m, b)
    sz = sym_z.reshape(m, 1)
    sy = sym_yx[0].reshape(1, b)
    sx = sym_yx[1].reshape(1, b)
    u_hat = 1j * jnp.stack(
        [
            sy * psi[2] - sz * psi[1],
            sz * psi[0] - sx * psi[2],
            sx * psi[1] - sy * psi[0],
        ]
    )
    u = jnp.fft.ifft(u_hat, axis=1)[:, :l_in]
    return jnp.real(u).astype(xr.dtype), jnp.imag(u).astype(xr.dtype)


_fft_greens_curl_ifft_pass_vjp = jax.custom_vjp(
    _fft_greens_curl_ifft_pass_impl, nondiff_argnums=(5,)
)


def _fft_greens_curl_ifft_pass_fwd(xr, xi, greens, sym_z, sym_yx, fast):
    return (
        _fft_greens_curl_ifft_pass_impl(xr, xi, greens, sym_z, sym_yx, fast),
        (xr, xi, greens, sym_z, sym_yx),
    )


def _fft_greens_curl_ifft_pass_bwd(fast, res, ct):
    # the analytic jnp adjoint is exact regardless of the forward matmul
    # emulation mode
    return jax.vjp(_conv_curl_ref, *res)[1](ct)


_fft_greens_curl_ifft_pass_vjp.defvjp(
    _fft_greens_curl_ifft_pass_fwd, _fft_greens_curl_ifft_pass_bwd
)


def fft_greens_curl_ifft_pass(xr, xi, greens, sym_z, sym_yx, fast=False):
    return _fft_greens_curl_ifft_pass_vjp(xr, xi, greens, sym_z, sym_yx,
                                          fast)


fft_greens_curl_ifft_pass.__doc__ = _fft_greens_curl_ifft_pass_impl.__doc__


# ---------------------------------------------------------------------------
# minor-axis r2c / c2r passes as lane-contraction matmuls
#
# The split variants separate the kx = m/2 Nyquist column from the bulk
# spectrum: the bulk keeps m/2 lanes (a power of two for the production
# grids, so the y/z middle passes tile without Mosaic's pad-to-384 waste on
# fx = m/2 + 1 lanes) and the single Nyquist column rides a cheap jnp side
# path. This is also what makes 512^3 (fx = 513, no valid 128-multiple
# tile) eligible for the fused Pallas pipeline.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _r2c_mats(n_in: int, m: int):
    """x real (.., n_in) zero-padded to m: X[k] = sum_n x[n] W^{nk},
    k <= m/2. Returns C (n_in, fx), S (n_in, fx) with X = xC + i xS."""
    fx = m // 2 + 1
    n = np.arange(n_in)[:, None]
    k = np.arange(fx)[None, :]
    ang = 2.0 * np.pi * n * k / m
    return (
        np.cos(ang).astype(np.float32),
        (-np.sin(ang)).astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def _c2r_mats(m: int, n_out: int):
    """Hermitian inverse: y[n] = (1/m) sum'_k w_k (Xr cos - Xi sin),
    w = 2 except for k = 0 and k = m/2. Returns Cw, Sw (fx, n_out) with
    y = Xr Cw + Xi Sw."""
    fx = m // 2 + 1
    k = np.arange(fx)[:, None]
    n = np.arange(n_out)[None, :]
    ang = 2.0 * np.pi * k * n / m
    w = np.full((fx, 1), 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    return (
        (w * np.cos(ang) / m).astype(np.float32),
        (-w * np.sin(ang) / m).astype(np.float32),
    )


def _r2c_kernel(c_ref, s_ref, x_ref, or_ref, oi_ref):
    x = x_ref[...]
    or_ref[...] = _mm(x, c_ref[...])
    oi_ref[...] = _mm(x, s_ref[...])


def _c2r_kernel(cw_ref, sw_ref, xr_ref, xi_ref, o_ref):
    o_ref[...] = _mm(xr_ref[...], cw_ref[...]) + _mm(xi_ref[...], sw_ref[...])


def _pick_rtile(r: int) -> int:
    for rt in (512, 256, 128, 64, 32, 16, 8):
        if r % rt == 0:
            return rt
    return r


def _rfft_pass_padded_impl(x, m: int):
    """r2c of the MINOR axis of a real 2D view (R, n_in), zero-padded to m.
    Returns split (R, m/2+1) float32 pairs. Lane-contraction matmul: the
    transform axis is already minor, so the MXU contracts at full width."""
    r_dim, n_in = x.shape
    fx = m // 2 + 1
    c, s = _r2c_mats(n_in, m)
    rt = _pick_rtile(r_dim)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _r2c_kernel,
        grid=(r_dim // rt,),
        in_specs=[
            mat_spec(c),
            mat_spec(s),
            pl.BlockSpec((rt, n_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, fx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ] * 2,
        out_shape=[jax.ShapeDtypeStruct((r_dim, fx), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(jnp.asarray(c), jnp.asarray(s), x)


def _irfft_pass_truncated_impl(xr, xi, m: int, n_out: int):
    """c2r of the MINOR axis from split (R, m/2+1) pairs, keeping the first
    ``n_out`` real outputs of the length-m inverse."""
    r_dim, fx = xr.shape
    cw, sw = _c2r_mats(m, n_out)
    rt = _pick_rtile(r_dim)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    in_spec = pl.BlockSpec((rt, fx), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _c2r_kernel,
        grid=(r_dim // rt,),
        in_specs=[mat_spec(cw), mat_spec(sw), in_spec, in_spec],
        out_specs=pl.BlockSpec(
            (rt, n_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r_dim, n_out), jnp.float32),
        interpret=_use_interpret(),
    )(jnp.asarray(cw), jnp.asarray(sw), xr, xi)


def _r2c_split_kernel(cb_ref, sb_ref, cs_ref, ss_ref, x_ref,
                      obr_ref, obi_ref, osr_ref, osi_ref):
    x = x_ref[...]
    obr_ref[...] = _mm(x, cb_ref[...])
    obi_ref[...] = _mm(x, sb_ref[...])
    osr_ref[...] = _mm(x, cs_ref[...])
    osi_ref[...] = _mm(x, ss_ref[...])


def _c2r_merge_kernel(cwb_ref, swb_ref, cws_ref, sws_ref,
                      br_ref, bi_ref, sr_ref, si_ref, o_ref):
    o_ref[...] = (
        _mm(br_ref[...], cwb_ref[...])
        + _mm(bi_ref[...], swb_ref[...])
        + sr_ref[...] * cws_ref[...]  # outer product via broadcast (VPU)
        + si_ref[...] * sws_ref[...]
    )


def _rfft_pass_padded_split_impl(x, m: int):
    """r2c of the MINOR axis of a real 2D view (R, n_in), zero-padded to m,
    with the Nyquist column split off: returns
    ``(bulk_r, bulk_i, side_r, side_i)`` of shapes (R, m/2) and (R, 1)."""
    r_dim, n_in = x.shape
    mh = m // 2
    c, s = _r2c_mats(n_in, m)
    cb, sb = np.ascontiguousarray(c[:, :mh]), np.ascontiguousarray(s[:, :mh])
    cs, ss = np.ascontiguousarray(c[:, mh:]), np.ascontiguousarray(s[:, mh:])
    rt = _pick_rtile(r_dim)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    blk = lambda cols: pl.BlockSpec(
        (rt, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _r2c_split_kernel,
        grid=(r_dim // rt,),
        in_specs=[mat_spec(cb), mat_spec(sb), mat_spec(cs), mat_spec(ss),
                  blk(n_in)],
        out_specs=[blk(mh), blk(mh), blk(1), blk(1)],
        out_shape=[jax.ShapeDtypeStruct((r_dim, mh), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((r_dim, 1), jnp.float32)] * 2,
        interpret=_use_interpret(),
    )(jnp.asarray(cb), jnp.asarray(sb), jnp.asarray(cs), jnp.asarray(ss), x)


def _irfft_pass_merge_impl(br, bi, sr, si, m: int, n_out: int):
    """c2r of the MINOR axis from split bulk (R, m/2) / Nyquist (R, 1)
    float32 pairs, keeping the first ``n_out`` real outputs."""
    r_dim, mh = br.shape
    assert 2 * mh == m
    cw, sw = _c2r_mats(m, n_out)
    cwb, swb = np.ascontiguousarray(cw[:mh]), np.ascontiguousarray(sw[:mh])
    cws, sws = np.ascontiguousarray(cw[mh:]), np.ascontiguousarray(sw[mh:])
    rt = _pick_rtile(r_dim)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    blk = lambda cols: pl.BlockSpec(
        (rt, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _c2r_merge_kernel,
        grid=(r_dim // rt,),
        in_specs=[mat_spec(cwb), mat_spec(swb), mat_spec(cws), mat_spec(sws),
                  blk(mh), blk(mh), blk(1), blk(1)],
        out_specs=blk(n_out),
        out_shape=jax.ShapeDtypeStruct((r_dim, n_out), jnp.float32),
        interpret=_use_interpret(),
    )(jnp.asarray(cwb), jnp.asarray(swb), jnp.asarray(cws), jnp.asarray(sws),
      br, bi, sr, si)


def _c2r_merge_velocity_kernel(ny, nz, cwb_ref, swb_ref, cws_ref, sws_ref,
                               fsv_ref, br_ref, bi_ref, sr_ref, si_ref,
                               o_ref, max_ref):
    """``_c2r_merge_kernel`` over (3, rt, .) component-stacked blocks with
    the velocity-recovery epilogue fused in: width-1 wall-ring zeroing
    (curl_3d parity), per-component free-stream add, and the per-block
    ``max |u|_1`` CFL reduction - the final c2r pass writes the FINISHED
    velocity, so no elementwise pass ever re-reads it."""
    j = pl.program_id(0)
    rt, n_out = o_ref.shape[1], o_ref.shape[2]
    rows = j * rt + jax.lax.broadcasted_iota(jnp.int32, (rt, 1), 0)
    z = rows // ny
    y = rows - z * ny
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, n_out), 1)
    interior = (
        (z > 0) & (z < nz - 1) & (y > 0) & (y < ny - 1)
        & (cols > 0) & (cols < n_out - 1)
    )
    cwb, swb = cwb_ref[...], swb_ref[...]
    cws, sws = cws_ref[...], sws_ref[...]
    comps = []
    for c in range(3):
        u = (
            _mm(br_ref[c], cwb)
            + _mm(bi_ref[c], swb)
            + sr_ref[c] * cws
            + si_ref[c] * sws
        )
        u = jnp.where(interior, u, 0.0) + fsv_ref[c, 0]
        o_ref[c] = u
        comps.append(u)
    m = jnp.max(jnp.abs(comps[0]) + jnp.abs(comps[1]) + jnp.abs(comps[2]))
    # (8,1) output blocks shared by 8 grid steps (Mosaic sublane tiling)
    max_ref[pl.dslice(j % 8, 1), :] = m.reshape(1, 1)


def _merge_velocity_rtile(rows: int, mh: int, n_out: int):
    """Row tile for the epilogue merge: rows//rt must be a positive
    multiple of 8 (the l1-max output rides (8,1) sublane blocks), and the
    3-component blocks + the (mh, n_out) c2r matrices must fit scoped
    vmem. Calibration (probed on v5e): with cost = rt*(2mh + n_out) +
    mh*n_out, good points are 262144 (rt=256 at the production 256^3
    shape) and 360448 (rt=64 at the nx=512 shape); failures at 458752
    from BOTH shapes (rt=128 at nx=512: +860K; rt=512 at 256^3: +1.4M)."""
    budget = 64 * (2 * 512 + 512) + 512 * 512  # = 360448, largest probed-good
    for rt in (256, 128, 64, 32, 16, 8):
        if (
            rows % rt == 0
            and (rows // rt) % 8 == 0
            and rt * (2 * mh + n_out) + mh * n_out <= budget
        ):
            return rt
    return None


def _irfft_pass_merge_velocity_impl(br, bi, sr, si, fsv, m, n_out, ny, nz):
    """c2r merge of a 3-component velocity spectrum (see
    :func:`_c2r_merge_velocity_kernel`): inputs are (3, nz*ny, m/2) bulk
    and (3, nz*ny, 1) Nyquist float32 pairs plus the (3,) free-stream
    vector; returns ``(u (3, nz*ny, n_out), l1_max scalar)``."""
    rows, mh = br.shape[1], br.shape[2]
    assert 2 * mh == m and rows == nz * ny
    cw, sw = _c2r_mats(m, n_out)
    cwb, swb = np.ascontiguousarray(cw[:mh]), np.ascontiguousarray(sw[:mh])
    cws, sws = np.ascontiguousarray(cw[mh:]), np.ascontiguousarray(sw[mh:])
    rt = _merge_velocity_rtile(rows, mh, n_out)
    assert rt is not None, (rows, mh, n_out)
    n_steps = rows // rt
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    blk = lambda cols: pl.BlockSpec(
        (3, rt, cols), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    kern = functools.partial(_c2r_merge_velocity_kernel, ny, nz)
    u, plane_max = pl.pallas_call(
        kern,
        grid=(n_steps,),
        in_specs=[mat_spec(cwb), mat_spec(swb), mat_spec(cws), mat_spec(sws),
                  pl.BlockSpec((3, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  blk(mh), blk(mh), blk(1), blk(1)],
        out_specs=[blk(n_out),
                   pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((3, rows, n_out), jnp.float32),
                   jax.ShapeDtypeStruct((n_steps, 1), jnp.float32)],
        interpret=_use_interpret(),
    )(jnp.asarray(cwb), jnp.asarray(swb), jnp.asarray(cws), jnp.asarray(sws),
      fsv.reshape(3, 1), br, bi, sr, si)
    return u, jnp.max(plane_max)


def _merge_velocity_ref(br, bi, sr, si, fsv, m, n_out, ny, nz):
    """jnp formulation of :func:`_irfft_pass_merge_velocity_impl` (VJP
    formulation; built on the already-differentiable irfft_pass_merge)."""
    rows = br.shape[1]
    u = irfft_pass_merge(
        br.reshape(3 * rows, -1), bi.reshape(3 * rows, -1),
        sr.reshape(3 * rows, 1), si.reshape(3 * rows, 1), m, n_out,
    ).reshape(3, nz, ny, n_out)
    ring = lambda n: (jnp.arange(n) > 0) & (jnp.arange(n) < n - 1)
    mask = (ring(nz)[:, None, None] & ring(ny)[None, :, None]
            & ring(n_out)[None, None, :])
    u = jnp.where(mask, u, 0.0) + fsv.reshape(3, 1, 1, 1)
    return (
        u.reshape(3, rows, n_out),
        jnp.max(jnp.sum(jnp.abs(u), axis=0)),
    )


_merge_velocity_vjp = jax.custom_vjp(
    _irfft_pass_merge_velocity_impl, nondiff_argnums=(5, 6, 7, 8)
)


def _merge_velocity_fwd(br, bi, sr, si, fsv, m, n_out, ny, nz):
    return (
        _irfft_pass_merge_velocity_impl(br, bi, sr, si, fsv, m, n_out,
                                        ny, nz),
        (br, bi, sr, si, fsv),
    )


def _merge_velocity_bwd(m, n_out, ny, nz, res, ct):
    return jax.vjp(
        lambda *a: _merge_velocity_ref(*a, m, n_out, ny, nz), *res
    )[1](ct)


_merge_velocity_vjp.defvjp(_merge_velocity_fwd, _merge_velocity_bwd)


def merge_velocity_epilogue_ok(rows: int, mh: int, n_out: int) -> bool:
    """Whether the epilogue-fused c2r merge admits a valid row tile."""
    return _merge_velocity_rtile(rows, mh, n_out) is not None


def irfft_pass_merge_velocity(br, bi, sr, si, fsv, m, n_out, ny, nz):
    return _merge_velocity_vjp(br, bi, sr, si, fsv, m, n_out, ny, nz)


irfft_pass_merge_velocity.__doc__ = _irfft_pass_merge_velocity_impl.__doc__


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def pallas_fft_supported(m: int) -> bool:
    """Axis lengths the fused kernels are validated/tuned for. The upper
    cap matters: at m = 2048 the packed per-slice matrices alone are
    ~8 MB of VMEM (vs 0.5 MB at m = 1024), which would overflow scoped
    vmem at trace time instead of falling back - sizes beyond 1024
    (doubled, i.e. grids beyond 512 cells/axis) take the einsum path."""
    m1, m2 = _best_factors(m)
    return 64 <= m <= 1024 and m1 >= 4 and m2 % 2 == 0


# ---------------------------------------------------------------------------
# reverse-mode rules
#
# The pass kernels are (bi)linear maps; Pallas kernels define no transpose
# rules, so each public entry point is a jax.custom_vjp whose primal is the
# fused kernel and whose backward pass is the ANALYTIC adjoint expressed
# with jnp.fft (XLA path). This makes jax.grad flow through the production
# Poisson pipeline (the repo-advertised differentiability the reference
# cannot offer; VJP math: real inner product <.,.>_R, adjoint of y = A x is
# x_ct = A^H ct, with zero-padding adjoint = truncation and vice versa).
# Primal inputs ride the residuals only for their static shapes (and for
# the bilinear greens cotangents); XLA DCEs unused residual data.
# ---------------------------------------------------------------------------


def _c_(r, i):
    return r + 1j * i


def _ri(z, like):
    return jnp.real(z).astype(like.dtype), jnp.imag(z).astype(like.dtype)


def _pad_mid(z, m):
    return jnp.pad(z, ((0, 0), (0, m - z.shape[1]), (0, 0)))


_fft_pass_padded_vjp = jax.custom_vjp(_fft_pass_padded_impl, nondiff_argnums=(2,))


def _fft_pass_padded_fwd(xr, xi, m):
    return _fft_pass_padded_impl(xr, xi, m), None


def _fft_pass_padded_bwd(m, _, ct):
    ctr, cti = ct
    x_ct = m * jnp.fft.ifft(_c_(ctr, cti), axis=1)[:, : m // 2]
    return _ri(x_ct, ctr)


_fft_pass_padded_vjp.defvjp(_fft_pass_padded_fwd, _fft_pass_padded_bwd)


def fft_pass_padded(xr, xi, axis_len_out: int):
    return _fft_pass_padded_vjp(xr, xi, axis_len_out)


fft_pass_padded.__doc__ = _fft_pass_padded_impl.__doc__


def _ifft_pass_truncated_p(xr, xi, greens):
    return _ifft_pass_truncated_impl(xr, xi, greens)


_ifft_pass_truncated_vjp = jax.custom_vjp(_ifft_pass_truncated_p)


def _ifft_pass_truncated_fwd(xr, xi, greens):
    return _ifft_pass_truncated_impl(xr, xi, greens), (xr, xi, greens)


def _ifft_pass_truncated_bwd(res, ct):
    xr, xi, greens = res
    ctr, cti = ct
    m = xr.shape[1]
    # adjoint of trunc . ifft: q = (1/m) fft(pad(ct))
    q = jnp.fft.fft(_pad_mid(_c_(ctr, cti), m), axis=1) / m
    if greens is None:
        return (*_ri(q, xr), None)
    x_ct = q * greens
    g_ct = jnp.real(jnp.conj(_c_(xr, xi)) * q)
    if greens.shape[0] == 1 and xr.shape[0] != 1:
        g_ct = jnp.sum(g_ct, axis=0, keepdims=True)
    return (*_ri(x_ct, xr), g_ct.astype(greens.dtype))


_ifft_pass_truncated_vjp.defvjp(_ifft_pass_truncated_fwd, _ifft_pass_truncated_bwd)


def ifft_pass_truncated(xr, xi, greens=None):
    return _ifft_pass_truncated_vjp(xr, xi, greens)


ifft_pass_truncated.__doc__ = _ifft_pass_truncated_impl.__doc__


_fft_greens_ifft_pass_vjp = jax.custom_vjp(
    _fft_greens_ifft_pass_impl, nondiff_argnums=(3,)
)


def _fft_greens_ifft_pass_fwd(xr, xi, greens, fast):
    return (
        _fft_greens_ifft_pass_impl(xr, xi, greens, fast),
        (xr, xi, greens),
    )


def _fft_greens_ifft_pass_bwd(fast, res, ct):
    xr, xi, greens = res
    ctr, cti = ct
    l = xr.shape[1]
    m = 2 * l
    # y = trunc . ifft . D_g . fft . pad  is self-adjoint up to the same
    # composition: x_ct = trunc(ifft(g * fft(pad(ct))))
    ctf = jnp.fft.fft(_pad_mid(_c_(ctr, cti), m), axis=1)
    x_ct = jnp.fft.ifft(greens * ctf, axis=1)[:, :l]
    # bilinear part: g_ct = Re(conj(fft(pad(x))) * (1/m) fft(pad(ct)))
    s = jnp.fft.fft(_pad_mid(_c_(xr, xi), m), axis=1)
    g_ct = jnp.real(jnp.conj(s) * ctf) / m
    if greens.shape[0] == 1 and xr.shape[0] != 1:
        g_ct = jnp.sum(g_ct, axis=0, keepdims=True)
    return (*_ri(x_ct, xr), g_ct.astype(greens.dtype))


_fft_greens_ifft_pass_vjp.defvjp(_fft_greens_ifft_pass_fwd, _fft_greens_ifft_pass_bwd)


def fft_greens_ifft_pass(xr, xi, greens, fast=False):
    return _fft_greens_ifft_pass_vjp(xr, xi, greens, fast)


fft_greens_ifft_pass.__doc__ = _fft_greens_ifft_pass_impl.__doc__


_rfft_pass_padded_vjp = jax.custom_vjp(_rfft_pass_padded_impl, nondiff_argnums=(1,))


def _rfft_pass_padded_fwd(x, m):
    return _rfft_pass_padded_impl(x, m), x


def _rfft_pass_padded_bwd(m, x, ct):
    ctr, cti = ct
    n_in = x.shape[1]
    z = jnp.pad(_c_(ctr, cti), ((0, 0), (0, m - ctr.shape[1])))
    return (jnp.real(m * jnp.fft.ifft(z, axis=1))[:, :n_in].astype(x.dtype),)


_rfft_pass_padded_vjp.defvjp(_rfft_pass_padded_fwd, _rfft_pass_padded_bwd)


def rfft_pass_padded(x, m: int):
    return _rfft_pass_padded_vjp(x, m)


rfft_pass_padded.__doc__ = _rfft_pass_padded_impl.__doc__


def _c2r_ct_weights(m, fx, dtype):
    w = np.full((1, fx), 2.0, dtype=np.float64)
    w[0, 0] = 1.0
    w[0, -1] = 1.0
    return jnp.asarray(w / m, dtype)


_irfft_pass_truncated_vjp = jax.custom_vjp(
    _irfft_pass_truncated_impl, nondiff_argnums=(2, 3)
)


def _irfft_pass_truncated_fwd(xr, xi, m, n_out):
    return _irfft_pass_truncated_impl(xr, xi, m, n_out), None


def _irfft_pass_truncated_bwd(m, n_out, _, ct):
    fx = m // 2 + 1
    F = jnp.fft.fft(jnp.pad(ct.astype(jnp.complex64), ((0, 0), (0, m - n_out))), axis=1)[:, :fx]
    w = _c2r_ct_weights(m, fx, ct.dtype)
    return (w * jnp.real(F)).astype(ct.dtype), (w * jnp.imag(F)).astype(ct.dtype)


_irfft_pass_truncated_vjp.defvjp(_irfft_pass_truncated_fwd, _irfft_pass_truncated_bwd)


def irfft_pass_truncated(xr, xi, m: int, n_out: int):
    return _irfft_pass_truncated_vjp(xr, xi, m, n_out)


irfft_pass_truncated.__doc__ = _irfft_pass_truncated_impl.__doc__


_rfft_pass_padded_split_vjp = jax.custom_vjp(
    _rfft_pass_padded_split_impl, nondiff_argnums=(1,)
)


def _rfft_pass_padded_split_fwd(x, m):
    return _rfft_pass_padded_split_impl(x, m), x


def _rfft_pass_padded_split_bwd(m, x, ct):
    br, bi, sr, si = ct
    n_in = x.shape[1]
    z = jnp.concatenate([_c_(br, bi), _c_(sr, si)], axis=1)  # (R, m/2+1)
    z = jnp.pad(z, ((0, 0), (0, m - z.shape[1])))
    return (jnp.real(m * jnp.fft.ifft(z, axis=1))[:, :n_in].astype(x.dtype),)


_rfft_pass_padded_split_vjp.defvjp(
    _rfft_pass_padded_split_fwd, _rfft_pass_padded_split_bwd
)


def rfft_pass_padded_split(x, m: int):
    return _rfft_pass_padded_split_vjp(x, m)


rfft_pass_padded_split.__doc__ = _rfft_pass_padded_split_impl.__doc__


_irfft_pass_merge_vjp = jax.custom_vjp(
    _irfft_pass_merge_impl, nondiff_argnums=(4, 5)
)


def _irfft_pass_merge_fwd(br, bi, sr, si, m, n_out):
    return _irfft_pass_merge_impl(br, bi, sr, si, m, n_out), None


def _irfft_pass_merge_bwd(m, n_out, _, ct):
    fx = m // 2 + 1
    mh = m // 2
    F = jnp.fft.fft(jnp.pad(ct.astype(jnp.complex64), ((0, 0), (0, m - n_out))), axis=1)[:, :fx]
    w = _c2r_ct_weights(m, fx, ct.dtype)
    xr_ct = (w * jnp.real(F)).astype(ct.dtype)
    xi_ct = (w * jnp.imag(F)).astype(ct.dtype)
    return (xr_ct[:, :mh], xi_ct[:, :mh], xr_ct[:, mh:], xi_ct[:, mh:])


_irfft_pass_merge_vjp.defvjp(_irfft_pass_merge_fwd, _irfft_pass_merge_bwd)


def irfft_pass_merge(br, bi, sr, si, m: int, n_out: int):
    return _irfft_pass_merge_vjp(br, bi, sr, si, m, n_out)


irfft_pass_merge.__doc__ = _irfft_pass_merge_impl.__doc__


# ---------------------------------------------------------------------------
# fused edge passes: x-r2c folded into the y-forward pass, and the
# y-inverse folded into the x-c2r merge. Removes the (A, ny, bx) split
# intermediate on each side of the 3D convolve (~0.8 GB of HBM traffic per
# side per component-triple at 256^3 -> the PLAN item-6 "solve is ~13%
# above its BW floor" headroom). Single lane tile (bt = bx): the r2c
# contraction reads the full x extent once per A row.
# ---------------------------------------------------------------------------


def _r2c_fwd_kernel(m, m1, m2, cb_ref, sb_ref, cs_ref, ss_ref, p1_ref,
                    pa_ref, x_ref, or_ref, oi_ref, osr_ref, osi_ref):
    """x block (1, m2/2, m1, nx) real -> bulk y-spectrum (1, m, bx) pair +
    r2c Nyquist side column (1, m2/2, m1, 1) pair (natural row order under
    the host-side merge view)."""
    p1 = p1_ref[...]
    cb = cb_ref[...]
    sb = sb_ref[...]
    y_sl, sr_sl, si_sl = [], [], []
    for j in range(m1):
        xj = x_ref[0, :, j, :]  # (m2/2, nx) real rows n = j (mod m1)
        tr = _mm(xj, cb)  # r2c bulk: (m2/2, bx)
        ti = _mm(xj, sb)
        sr_sl.append(_mm(xj, cs_ref[...]))  # (m2/2, 1)
        si_sl.append(_mm(xj, ss_ref[...]))
        y_sl.append(_mm(p1, _cat(tr, ti)))  # y step 1: (2m2, bx)
    y = jnp.stack(y_sl)
    zr_sl, zi_sl = [], []
    for c in range(m2):
        z = _mm(pa_ref[c], _cat(y[:, c, :], y[:, m2 + c, :]))
        zr_sl.append(z[:m1])
        zi_sl.append(z[m1:])
    or_ref[0] = jnp.stack(zr_sl, axis=1).reshape(m, or_ref.shape[2])
    oi_ref[0] = jnp.stack(zi_sl, axis=1).reshape(m, oi_ref.shape[2])
    osr_ref[0] = jnp.stack(sr_sl, axis=1)
    osi_ref[0] = jnp.stack(si_sl, axis=1)


def _inv_c2r_kernel(m, m1, m2, pa_ref, p2_ref, cwb_ref, swb_ref, cws_ref,
                    sws_ref, xr_ref, xi_ref, sr_ref, si_ref, o_ref):
    """Bulk y-spectrum blocks (1, m1, m2, bx) pair + side-solution column
    (1, ny, 1) pair -> real (1, ny, nx) output."""
    y_sl = []
    for c in range(m2):
        y_sl.append(
            _mm(pa_ref[c], _cat(xr_ref[0, :, c, :], xi_ref[0, :, c, :]))
        )
    y = jnp.stack(y_sl)  # (k2, 2m1, bx)
    p2 = p2_ref[...]
    zr_sl, zi_sl = [], []
    for j in range(m1):
        o = _mm(p2, _cat(y[:, j, :], y[:, m1 + j, :]))  # (m2, bx)
        zr_sl.append(o[: m2 // 2])
        zi_sl.append(o[m2 // 2:])
    ny = m // 2
    zr = jnp.stack(zr_sl, axis=1).reshape(ny, xr_ref.shape[3])
    zi = jnp.stack(zi_sl, axis=1).reshape(ny, xi_ref.shape[3])
    o_ref[0] = (
        _mm(zr, cwb_ref[...])
        + _mm(zi, swb_ref[...])
        + sr_ref[0] * cws_ref[...]
        + si_ref[0] * sws_ref[...]
    )


def _fused_edge_vmem_ok(ny: int, nx: int, my: int) -> bool:
    """Conservative single-buffer estimate for the fused edge kernels; the
    pipeline double-buffers, and scoped vmem is 16 MB."""
    bx = 2 * nx // 2  # = nx: bulk width of the doubled minor axis
    m1, m2 = _best_factors(my)
    elems = (
        ny * nx  # x block / output block
        + 2 * nx * bx  # cb/sb or cwb/swb
        + m2 * 4 * m1 * m1  # pa packed
        + m1 * 2 * m2 * bx  # y intermediate
        + 2 * my * bx  # bulk pair
        + 2 * ny * bx  # z pair (inverse)
    )
    return 4 * elems <= 6 * 1024 * 1024


# NEGATIVE RESULT (256^3 solve shapes, v5e, measured via the chained-scan
# recipe): the fused edge roundtrip costs 16.3 ms vs 14.0 ms for the
# separate passes, despite saving ~1.6 GB of HBM traffic (floor 10.8 ms).
# The single-lane-tile, one-A-row-per-grid-step structure is
# compute-bound: the r2c contraction runs as m1 narrow (m2/2, nx) matmuls
# per row and the kernel loses the (A, B-tile) pipelining of the separate
# passes. Kept behind this flag (correct, tested, differentiable) in case
# other shapes/hardware flip the trade.
USE_FUSED_EDGE_PASSES = False


def fused_edge_pass_ok(ny: int, nx: int, my: int, mx: int) -> bool:
    """Whether the fused r2c+y-fwd / y-inv+c2r kernels support this size
    (and the measured-slower path is enabled; see the flag above)."""
    return (
        USE_FUSED_EDGE_PASSES
        and pallas_fft_supported(my)
        and mx == 2 * nx
        and (my // 2) % _best_factors(my)[0] == 0
        and _fused_edge_vmem_ok(ny, nx, my)
    )


def _rfft_fft_pass_fused_impl(x, mx: int, my: int):
    """Fused ``rfft_pass_padded_split`` (minor axis, zero-padded to mx) +
    ``fft_pass_padded`` (middle axis, zero-padded to my) of a real
    (A, ny, nx) array with ny = my/2. Returns (bulk_r, bulk_i) of shape
    (A, my, mx/2) and the r2c Nyquist side column (side_r, side_i) of
    shape (A, ny, 1)."""
    a_dim, ny, nx = x.shape
    assert 2 * ny == my
    m1, m2 = _best_factors(my)
    bx = mx // 2
    c, s = _r2c_mats(nx, mx)
    cb, sb = np.ascontiguousarray(c[:, :bx]), np.ascontiguousarray(s[:, :bx])
    cs, ss = np.ascontiguousarray(c[:, bx:]), np.ascontiguousarray(s[:, bx:])
    p1, pa = _packed_fwd_mats(my)
    kern = functools.partial(_r2c_fwd_kernel, my, m1, m2)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    x4 = x.reshape(a_dim, m2 // 2, m1, nx)
    in_spec = pl.BlockSpec(
        (1, m2 // 2, m1, nx), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    bulk_spec = pl.BlockSpec(
        (1, my, bx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    side_spec = pl.BlockSpec(
        (1, m2 // 2, m1, 1), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    br, bi, sr, si = pl.pallas_call(
        kern,
        grid=(a_dim,),
        in_specs=[mat_spec(cb), mat_spec(sb), mat_spec(cs), mat_spec(ss),
                  mat_spec(p1), mat_spec(pa), in_spec],
        out_specs=[bulk_spec, bulk_spec, side_spec, side_spec],
        out_shape=[
            jax.ShapeDtypeStruct((a_dim, my, bx), jnp.float32),
            jax.ShapeDtypeStruct((a_dim, my, bx), jnp.float32),
            jax.ShapeDtypeStruct((a_dim, m2 // 2, m1, 1), jnp.float32),
            jax.ShapeDtypeStruct((a_dim, m2 // 2, m1, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(jnp.asarray(cb), jnp.asarray(sb), jnp.asarray(cs), jnp.asarray(ss),
      jnp.asarray(p1), jnp.asarray(pa), x4)
    return br, bi, sr.reshape(a_dim, ny, 1), si.reshape(a_dim, ny, 1)


def _ifft_irfft_pass_fused_impl(br, bi, sr, si, mx: int, nx: int):
    """Fused ``ifft_pass_truncated`` (middle axis) + ``irfft_pass_merge``
    (minor axis): bulk y-spectrum (A, my, bx) pair + side-solution column
    (A, ny, 1) pair -> real (A, ny, nx)."""
    a_dim, my, bx = br.shape
    assert 2 * bx == mx
    ny = my // 2
    m1, m2 = _best_factors(my)
    pa, p2 = _packed_inv_mats(my)
    cw, sw = _c2r_mats(mx, nx)
    cwb, swb = np.ascontiguousarray(cw[:bx]), np.ascontiguousarray(sw[:bx])
    cws, sws = np.ascontiguousarray(cw[bx:]), np.ascontiguousarray(sw[bx:])
    kern = functools.partial(_inv_c2r_kernel, my, m1, m2)
    mat_spec = lambda arr: pl.BlockSpec(
        arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    split = lambda arr: arr.reshape(a_dim, m1, m2, bx)
    bulk_spec = pl.BlockSpec(
        (1, m1, m2, bx), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    side_spec = pl.BlockSpec(
        (1, ny, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kern,
        grid=(a_dim,),
        in_specs=[mat_spec(pa), mat_spec(p2), mat_spec(cwb), mat_spec(swb),
                  mat_spec(cws), mat_spec(sws), bulk_spec, bulk_spec,
                  side_spec, side_spec],
        out_specs=pl.BlockSpec(
            (1, ny, nx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((a_dim, ny, nx), jnp.float32),
        interpret=_use_interpret(),
    )(jnp.asarray(pa), jnp.asarray(p2), jnp.asarray(cwb), jnp.asarray(swb),
      jnp.asarray(cws), jnp.asarray(sws), split(br), split(bi), sr, si)


def _rfft_fft_fused_ref(x, mx, my):
    z = jnp.fft.rfft(x, n=mx, axis=2)
    bulk = jnp.fft.fft(z[..., : mx // 2], n=my, axis=1)
    side = z[..., mx // 2:]
    return (
        jnp.real(bulk).astype(x.dtype), jnp.imag(bulk).astype(x.dtype),
        jnp.real(side).astype(x.dtype), jnp.imag(side).astype(x.dtype),
    )


_rfft_fft_pass_fused_vjp = jax.custom_vjp(
    _rfft_fft_pass_fused_impl, nondiff_argnums=(1, 2)
)


def _rfft_fft_pass_fused_fwd(x, mx, my):
    return _rfft_fft_pass_fused_impl(x, mx, my), x


def _rfft_fft_pass_fused_bwd(mx, my, x, ct):
    _, vjp = jax.vjp(lambda a: _rfft_fft_fused_ref(a, mx, my), x)
    return vjp(ct)


_rfft_fft_pass_fused_vjp.defvjp(_rfft_fft_pass_fused_fwd, _rfft_fft_pass_fused_bwd)


def rfft_fft_pass_fused(x, mx: int, my: int):
    return _rfft_fft_pass_fused_vjp(x, mx, my)


rfft_fft_pass_fused.__doc__ = _rfft_fft_pass_fused_impl.__doc__


def _ifft_irfft_fused_ref(br, bi, sr, si, mx, nx):
    my = br.shape[1]
    bulk = jnp.fft.ifft(br + 1j * bi, axis=1)[:, : my // 2]
    z = jnp.concatenate([bulk, sr + 1j * si], axis=2)
    return jnp.fft.irfft(z, n=mx, axis=2)[:, :, :nx].astype(br.dtype)


_ifft_irfft_pass_fused_vjp = jax.custom_vjp(
    _ifft_irfft_pass_fused_impl, nondiff_argnums=(4, 5)
)


def _ifft_irfft_pass_fused_fwd(br, bi, sr, si, mx, nx):
    return _ifft_irfft_pass_fused_impl(br, bi, sr, si, mx, nx), (br, bi, sr, si)


def _ifft_irfft_pass_fused_bwd(mx, nx, res, ct):
    _, vjp = jax.vjp(lambda a, b, c, d: _ifft_irfft_fused_ref(a, b, c, d, mx, nx), *res)
    return vjp(ct)


_ifft_irfft_pass_fused_vjp.defvjp(_ifft_irfft_pass_fused_fwd, _ifft_irfft_pass_fused_bwd)


def ifft_irfft_pass_fused(br, bi, sr, si, mx: int, nx: int):
    return _ifft_irfft_pass_fused_vjp(br, bi, sr, si, mx, nx)


ifft_irfft_pass_fused.__doc__ = _ifft_irfft_pass_fused_impl.__doc__
