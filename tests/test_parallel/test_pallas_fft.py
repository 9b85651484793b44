"""Pallas fused FFT-pass kernels vs numpy oracles (interpret mode on CPU;
the same kernels compile natively on TPU and carry the production Poisson
path there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.parallel.pallas_fft import (
    fft_pass_padded,
    ifft_pass_truncated,
    irfft_pass_truncated,
    rfft_pass_padded,
)


@pytest.mark.parametrize("m", [64, 128])
def test_fft_pass_padded(m):
    rng = np.random.default_rng(1)
    a_dim, b = 3, 12
    x = (
        rng.standard_normal((a_dim, m // 2, b))
        + 1j * rng.standard_normal((a_dim, m // 2, b))
    ).astype(np.complex64)
    zr, zi = fft_pass_padded(jnp.asarray(x.real), jnp.asarray(x.imag), m)
    ref = np.fft.fft(x, n=m, axis=1)
    np.testing.assert_allclose(
        np.asarray(zr) + 1j * np.asarray(zi),
        ref,
        atol=2e-6 * np.abs(ref).max(),
    )


@pytest.mark.parametrize("with_greens", [False, True])
@pytest.mark.parametrize("m", [64, 128])
def test_ifft_pass_truncated(m, with_greens):
    rng = np.random.default_rng(2)
    a_dim, b = 2, 12
    f = (
        rng.standard_normal((a_dim, m, b))
        + 1j * rng.standard_normal((a_dim, m, b))
    ).astype(np.complex64)
    g = rng.standard_normal((a_dim, m, b)).astype(np.float32)
    yr, yi = ifft_pass_truncated(
        jnp.asarray(f.real),
        jnp.asarray(f.imag),
        jnp.asarray(g) if with_greens else None,
    )
    ref = np.fft.ifft(f * g if with_greens else f, axis=1)[:, : m // 2]
    np.testing.assert_allclose(
        np.asarray(yr) + 1j * np.asarray(yi),
        ref,
        atol=2e-6 * np.abs(ref).max(),
    )


def test_rfft_irfft_pass_roundtrip():
    rng = np.random.default_rng(3)
    r_dim, n = 24, 64
    m = 2 * n
    x = rng.standard_normal((r_dim, n)).astype(np.float32)
    fr, fi = rfft_pass_padded(jnp.asarray(x), m)
    ref = np.fft.rfft(x, n=m, axis=1)
    np.testing.assert_allclose(
        np.asarray(fr) + 1j * np.asarray(fi),
        ref,
        atol=2e-6 * np.abs(ref).max(),
    )
    y = irfft_pass_truncated(fr, fi, m, n)
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-6 * np.abs(x).max())


def test_pallas_convolve_matches_reference_path():
    """The all-Pallas free-space convolution equals the mxu/jnp solve."""
    from sopht_mpi_tpu.ops.poisson import (
        _pallas_convolve_local,
        _padded_rfftn_local,
        _truncated_irfftn_local,
    )

    rng = np.random.default_rng(4)
    n = 32
    rhs = jnp.asarray(rng.standard_normal((3, n, n, n)), jnp.float32)
    greens = jnp.asarray(
        rng.standard_normal((2 * n, 2 * n, n + 1)), jnp.float32
    )
    from sopht_mpi_tpu.ops.poisson import split_pallas_greens

    out = _pallas_convolve_local(
        rhs, split_pallas_greens(greens), (2 * n, 2 * n, 2 * n)
    )
    ref = jnp.stack(
        [
            _truncated_irfftn_local(
                _padded_rfftn_local(rhs[c], (2 * n, 2 * n, 2 * n)) * greens,
                (n, n, n),
            )
            for c in range(3)
        ]
    )
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(ref),
        atol=5e-6 * float(jnp.abs(ref).max()),
    )


def test_pallas_convolve_2d():
    from sopht_mpi_tpu.ops.poisson import (
        _pallas_convolve_local,
        _padded_rfftn_local,
        _truncated_irfftn_local,
    )

    rng = np.random.default_rng(5)
    n = 64
    rhs = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    greens = jnp.asarray(rng.standard_normal((2 * n, n + 1)), jnp.float32)
    from sopht_mpi_tpu.ops.poisson import split_pallas_greens

    out = _pallas_convolve_local(rhs, split_pallas_greens(greens), (2 * n, 2 * n))
    ref = _truncated_irfftn_local(
        _padded_rfftn_local(rhs, (2 * n, 2 * n)) * greens, (n, n)
    )
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(ref),
        atol=5e-6 * float(jnp.abs(ref).max()),
    )


def test_rfft_split_and_merge_roundtrip():
    """Nyquist-split r2c kernel + merging c2r kernel: split spectra agree
    with np.fft.rfft and the roundtrip restores the input."""
    from sopht_mpi_tpu.parallel.pallas_fft import (
        irfft_pass_merge,
        rfft_pass_padded_split,
    )

    rng = np.random.default_rng(6)
    r_dim, n = 24, 64
    m = 2 * n
    x = rng.standard_normal((r_dim, n)).astype(np.float32)
    br, bi, sr, si = rfft_pass_padded_split(jnp.asarray(x), m)
    ref = np.fft.rfft(x, n=m, axis=1)
    np.testing.assert_allclose(
        np.asarray(br) + 1j * np.asarray(bi), ref[:, : m // 2],
        atol=2e-6 * np.abs(ref).max(),
    )
    np.testing.assert_allclose(
        np.asarray(sr) + 1j * np.asarray(si), ref[:, m // 2 :],
        atol=2e-6 * np.abs(ref).max(),
    )
    y = irfft_pass_merge(br, bi, sr, si, m, n)
    np.testing.assert_allclose(np.asarray(y), x, atol=2e-6 * np.abs(x).max())


def test_pallas_fft_supported_range():
    """Sizes outside the validated/tuned window fall back instead of
    risking a trace-time scoped-vmem overflow (m=2048 packed mats ~8 MB)."""
    from sopht_mpi_tpu.parallel.pallas_fft import pallas_fft_supported

    assert pallas_fft_supported(64)
    assert pallas_fft_supported(512)
    assert pallas_fft_supported(1024)
    assert not pallas_fft_supported(32)
    assert not pallas_fft_supported(2048)


@pytest.mark.parametrize("m", [64, 256, 1024])
def test_fft_greens_ifft_pass_sizes(m):
    """The fused fwd*greens*inv pass across the supported size range -
    m=1024 is the 512^3 production configuration."""
    from sopht_mpi_tpu.parallel.pallas_fft import fft_greens_ifft_pass

    rng = np.random.default_rng(m)
    a_dim, b = 2, 16
    xr = rng.standard_normal((a_dim, m // 2, b)).astype(np.float32)
    xi = rng.standard_normal((a_dim, m // 2, b)).astype(np.float32)
    g = rng.standard_normal((1, m, b)).astype(np.float32)
    or_, oi = fft_greens_ifft_pass(
        jnp.asarray(xr), jnp.asarray(xi), jnp.asarray(g)
    )
    x = xr + 1j * xi
    ref = np.fft.ifft(np.fft.fft(x, n=m, axis=1) * g, axis=1)[:, : m // 2]
    np.testing.assert_allclose(
        np.asarray(or_) + 1j * np.asarray(oi), ref,
        atol=5e-5 * np.abs(ref).max(),
    )


def test_fused_edge_passes_match_reference(monkeypatch):
    """The fused r2c+y-fwd / y-inv+c2r edge kernels (off by default - a
    measured negative result at 256^3, see pallas_fft.py) stay correct:
    full 3D convolve parity with the fused edges forced on."""
    import sopht_mpi_tpu.parallel.pallas_fft as pf
    from sopht_mpi_tpu.ops.poisson import (
        _pallas_convolve_local,
        _padded_rfftn_local,
        split_pallas_greens,
    )

    monkeypatch.setattr(pf, "USE_FUSED_EDGE_PASSES", True)
    n = 32
    doubled = (2 * n, 2 * n, 2 * n)
    assert pf.fused_edge_pass_ok(n, n, 2 * n, 2 * n)
    rng = np.random.default_rng(8)
    rhs = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal(doubled), jnp.float32)
    greens = jnp.real(_padded_rfftn_local(kernel, doubled)[..., : n + 1])
    out = _pallas_convolve_local(
        rhs, split_pallas_greens(greens), doubled
    )
    monkeypatch.setattr(pf, "USE_FUSED_EDGE_PASSES", False)
    ref = _pallas_convolve_local(
        rhs, split_pallas_greens(greens), doubled
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=5e-5 * float(jnp.abs(ref).max()),
    )


@pytest.mark.parametrize("m", [64, 128])
def test_fft_greens_curl_ifft_pass(m):
    """The 3-component curl-mixing conv kernel matches its jnp
    formulation (forward AND reverse mode)."""
    from sopht_mpi_tpu.parallel.pallas_fft import (
        _conv_curl_ref,
        fft_greens_curl_ifft_pass,
    )

    rng = np.random.default_rng(11)
    l_in = m // 2
    my, bxl = 16, 8  # B = 128: one lane tile
    b = my * bxl
    dx = 0.02
    xr = jnp.asarray(rng.standard_normal((3, l_in, b)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((3, l_in, b)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, m, b)), jnp.float32)
    sym = lambda n: np.sin(2 * np.pi * np.arange(n) / n) / dx
    sym_z = jnp.asarray(sym(m), jnp.float32)
    sym_yx = jnp.asarray(
        np.stack([np.repeat(sym(my), bxl), np.tile(sym(2 * bxl)[:bxl], my)]),
        jnp.float32,
    )
    out = fft_greens_curl_ifft_pass(xr, xi, g, sym_z, sym_yx)
    ref = _conv_curl_ref(xr, xi, g, sym_z, sym_yx)
    scale = float(jnp.abs(ref[0]).max())
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=5e-6 * scale)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=5e-6 * scale)
    # reverse mode rides the jnp formulation
    loss = lambda f, a: jnp.sum(f(a, xi, g, sym_z, sym_yx)[0] ** 2)
    gk = jax.grad(lambda a: loss(fft_greens_curl_ifft_pass, a))(xr)
    gr = jax.grad(lambda a: loss(_conv_curl_ref, a))(xr)
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(gr),
        atol=5e-6 * float(jnp.abs(gr).max()),
    )


def test_velocity_from_vorticity_fused_matches_solve_plus_curl():
    """Solver-level parity: the in-kernel spectral FD curl + in-merge
    epilogue (ring zero, free-stream add, CFL max) equals
    ``curl_3d(vector_field_solve(omega), 0.5/dx) + U_inf``."""
    import sopht_mpi_tpu.ops.poisson as poisson_mod
    from sopht_mpi_tpu.ops.stencils_3d import curl_3d

    old = poisson_mod.FORCE_PALLAS_CONVOLVE
    poisson_mod.FORCE_PALLAS_CONVOLVE = True
    try:
        nz, ny, nx = 32, 32, 64  # anisotropic: axis symbols must not mix up
        solver = poisson_mod.UnboundedPoissonSolver3D(
            nz, ny, nx, x_range=1.0
        )
        assert solver.fused_curl_supported(jnp.float32)
        rng = np.random.default_rng(12)
        w = jnp.asarray(rng.standard_normal((3, nz, ny, nx)), jnp.float32)
        fsv = jnp.asarray([1.0, -0.5, 0.25], jnp.float32)
        u_ref = curl_3d(solver.vector_field_solve(w), 0.5 / solver.dx)
        u_ref = u_ref + fsv[:, None, None, None]
        u, l1_max = solver.velocity_from_vorticity_fused(
            w, free_stream=fsv
        )
        tol = 5e-6 * max(1.0, float(jnp.abs(u_ref).max()))
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   atol=tol)
        np.testing.assert_allclose(
            float(l1_max),
            float(jnp.max(jnp.sum(jnp.abs(u_ref), axis=0))),
            atol=tol,
        )
    finally:
        poisson_mod.FORCE_PALLAS_CONVOLVE = old


def test_fast_spectral_matmuls_conv_pass_accuracy(monkeypatch):
    """Opt-in 3-pass bf16 conv-kernel matmuls (fast=True) stay
    within their documented ~1e-5 relative error of the 6-pass HIGHEST
    path (measured 6.6e-6 at 256^3 on hardware)."""
    import sopht_mpi_tpu.parallel.pallas_fft as pf

    rng = np.random.default_rng(21)
    m, b = 64, 128
    xr = jnp.asarray(rng.standard_normal((2, m // 2, b)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, m // 2, b)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, m, b)), jnp.float32)
    ref = pf.fft_greens_ifft_pass(xr, xi, g)
    fast = pf.fft_greens_ifft_pass(xr, xi, g, fast=True)
    scale = float(jnp.abs(ref[0]).max())
    np.testing.assert_allclose(np.asarray(fast[0]), np.asarray(ref[0]),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(fast[1]), np.asarray(ref[1]),
                               atol=3e-5 * scale)


def test_enable_fast_spectral_sets_construction_default(monkeypatch):
    """enable_fast_spectral changes what fast_spectral=None means for
    solvers built AFTER the call; explicit ctor args override, already
    built solvers keep their mode, and two solvers with different modes
    coexist (VERDICT r03 weak #4: no trace-time global state)."""
    import sopht_mpi_tpu
    import sopht_mpi_tpu.ops.poisson as poisson_mod

    monkeypatch.setattr(poisson_mod, "DEFAULT_FAST_SPECTRAL", False)
    before = poisson_mod.UnboundedPoissonSolver2D(16, 16)
    assert before.fast_spectral is False
    sopht_mpi_tpu.enable_fast_spectral()
    try:
        assert poisson_mod.DEFAULT_FAST_SPECTRAL is True
        after = poisson_mod.UnboundedPoissonSolver2D(16, 16)
        assert after.fast_spectral is True
        # the already-built solver is unaffected by the flip
        assert before.fast_spectral is False
        # explicit parameter overrides the default either way
        off = poisson_mod.UnboundedPoissonSolver2D(16, 16, fast_spectral=False)
        assert off.fast_spectral is False
    finally:
        sopht_mpi_tpu.enable_fast_spectral(False)
    assert poisson_mod.DEFAULT_FAST_SPECTRAL is False
    on = poisson_mod.UnboundedPoissonSolver2D(16, 16, fast_spectral=True)
    assert on.fast_spectral is True


def test_production_tile_choices_are_pinned():
    """The measured-optimal / probed-safe tile picks for the production
    shapes must not silently regress (bt=512 measured 20.8 ms vs 24.3 at
    bt=256 and 30.0 at bt=128 for the 256^3 conv pass; the curl/merge
    tiles are scoped-vmem-probed - see PLAN.md and the budget docstrings)."""
    from sopht_mpi_tpu.parallel.pallas_fft import (
        _conv_budget,
        _conv_curl_budget,
        _merge_velocity_rtile,
        _pick_btile,
        conv_curl_pass_tile_ok,
    )

    b_256 = 512 * 256  # my*bx at 256^3
    assert _pick_btile(b_256, _conv_budget(512)) == 512
    assert _pick_btile(b_256, _conv_curl_budget(512)) == 128
    # m=1024 overflows scoped vmem even at bt=128 (hardware-probed)
    assert not conv_curl_pass_tile_ok(1024 * 512, 1024)
    # epilogue merge: production 256^3 keeps rt=256; nx=512 drops to 64
    assert _merge_velocity_rtile(256 * 256, 256, 256) == 256
    assert _merge_velocity_rtile(256 * 256, 512, 512) == 64
