"""Reverse-mode rules of the Pallas FFT passes and stencil kernels
(interpret mode on CPU): each custom VJP must match the gradient of the
mathematically identical jnp formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.parallel.pallas_fft import (
    fft_greens_ifft_pass,
    fft_pass_padded,
    ifft_pass_truncated,
    irfft_pass_merge,
    irfft_pass_truncated,
    rfft_pass_padded,
    rfft_pass_padded_split,
)


def _tree_loss(out, seed):
    """Deterministic weighted-sum loss over an arbitrary output pytree."""
    leaves = jax.tree_util.tree_leaves(out)
    total = 0.0
    for i, leaf in enumerate(leaves):
        rng = np.random.default_rng(seed + i)
        w = jnp.asarray(rng.standard_normal(leaf.shape), leaf.dtype)
        total = total + jnp.sum(leaf * w)
    return total


def _check_grads(pallas_fn, jnp_fn, args, atol, seed=100):
    g_pal = jax.grad(lambda *a: _tree_loss(pallas_fn(*a), seed), argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(lambda *a: _tree_loss(jnp_fn(*a), seed), argnums=tuple(range(len(args))))(*args)
    for gp, gr in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr),
            atol=atol * max(1.0, float(jnp.abs(gr).max())),
        )


def test_fft_pass_padded_grad():
    m = 64
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((2, m // 2, 8)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, m // 2, 8)), jnp.float32)

    def ref(xr, xi):
        z = jnp.fft.fft(xr + 1j * xi, n=m, axis=1)
        return jnp.real(z), jnp.imag(z)

    _check_grads(lambda a, b: fft_pass_padded(a, b, m), ref, (xr, xi), 1e-4)


@pytest.mark.parametrize("with_greens", [False, True])
def test_ifft_pass_truncated_grad(with_greens):
    m = 64
    rng = np.random.default_rng(1)
    xr = jnp.asarray(rng.standard_normal((2, m, 8)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, m, 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, m, 8)), jnp.float32)

    def ref(xr, xi, g=None):
        f = xr + 1j * xi
        if g is not None:
            f = f * g
        z = jnp.fft.ifft(f, axis=1)[:, : m // 2]
        return jnp.real(z), jnp.imag(z)

    if with_greens:
        _check_grads(ifft_pass_truncated, ref, (xr, xi, g), 1e-4)
    else:
        _check_grads(lambda a, b: ifft_pass_truncated(a, b), ref, (xr, xi), 1e-4)


def test_fft_greens_ifft_pass_grad():
    m = 64
    rng = np.random.default_rng(2)
    xr = jnp.asarray(rng.standard_normal((2, m // 2, 8)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, m // 2, 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, m, 8)), jnp.float32)

    def ref(xr, xi, g):
        z = jnp.fft.fft(xr + 1j * xi, n=m, axis=1)
        z = jnp.fft.ifft(z * g, axis=1)[:, : m // 2]
        return jnp.real(z), jnp.imag(z)

    _check_grads(fft_greens_ifft_pass, ref, (xr, xi, g), 1e-4)


def test_rfft_pass_padded_grad():
    m, n_in = 64, 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((16, n_in)), jnp.float32)

    def ref(x):
        z = jnp.fft.rfft(x, n=m, axis=1)
        return jnp.real(z), jnp.imag(z)

    _check_grads(lambda a: rfft_pass_padded(a, m), ref, (x,), 1e-4)


def test_irfft_pass_truncated_grad():
    m, n_out = 64, 32
    fx = m // 2 + 1
    rng = np.random.default_rng(4)
    xr = jnp.asarray(rng.standard_normal((16, fx)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((16, fx)), jnp.float32)

    def ref(xr, xi):
        return jnp.fft.irfft(xr + 1j * xi, n=m, axis=1)[:, :n_out]

    _check_grads(
        lambda a, b: irfft_pass_truncated(a, b, m, n_out), ref, (xr, xi), 1e-4
    )


def test_rfft_split_and_merge_grad():
    m, n_in, n_out = 64, 32, 32
    mh = m // 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((16, n_in)), jnp.float32)

    def ref_split(x):
        z = jnp.fft.rfft(x, n=m, axis=1)
        return (
            jnp.real(z)[:, :mh], jnp.imag(z)[:, :mh],
            jnp.real(z)[:, mh:], jnp.imag(z)[:, mh:],
        )

    _check_grads(lambda a: rfft_pass_padded_split(a, m), ref_split, (x,), 1e-4)

    br = jnp.asarray(rng.standard_normal((16, mh)), jnp.float32)
    bi = jnp.asarray(rng.standard_normal((16, mh)), jnp.float32)
    sr = jnp.asarray(rng.standard_normal((16, 1)), jnp.float32)
    si = jnp.asarray(rng.standard_normal((16, 1)), jnp.float32)

    def ref_merge(br, bi, sr, si):
        z = jnp.concatenate([br + 1j * bi, sr + 1j * si], axis=1)
        return jnp.fft.irfft(z, n=m, axis=1)[:, :n_out]

    _check_grads(
        lambda a, b, c, d: irfft_pass_merge(a, b, c, d, m, n_out),
        ref_merge, (br, bi, sr, si), 1e-4,
    )


def test_pallas_stencil_grads():
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        curl_3d_pallas,
        diffusion_timestep_vector_3d_pallas,
        rotational_curl_add_3d_pallas,
    )
    from sopht_mpi_tpu.ops.stencils_3d import (
        curl_3d,
        diffusion_timestep_vector_3d,
        update_vorticity_from_velocity_forcing_3d,
    )
    from sopht_mpi_tpu.ops.elementwise import cross_product_3d

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((3, 8, 8, 128)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((3, 8, 8, 128)), jnp.float32)
    p = jnp.asarray(0.3, jnp.float32)

    _check_grads(
        lambda a, b: diffusion_timestep_vector_3d_pallas(a, b, interpret=True),
        diffusion_timestep_vector_3d, (w, p), 1e-4,
    )
    _check_grads(
        lambda a, b: curl_3d_pallas(a, b, interpret=True),
        curl_3d, (w, p), 1e-4,
    )
    # fused curl with free-stream add and the CFL l1-max side output
    fsv = jnp.asarray([1.0, 0.5, -0.2], jnp.float32)

    def ref_full(a, b, c):
        out = curl_3d(a, b) + c[:, None, None, None]
        return out, jnp.max(jnp.sum(jnp.abs(out), axis=0))

    _check_grads(
        lambda a, b, c: curl_3d_pallas(
            a, b, add_vector=c, interpret=True, compute_l1_max=True
        ),
        ref_full, (w, p, fsv), 1e-4,
    )
    _check_grads(
        lambda a, b, c: rotational_curl_add_3d_pallas(a, b, c, interpret=True),
        lambda a, b, c: update_vorticity_from_velocity_forcing_3d(
            a, cross_product_3d(b, a), c
        ),
        (w, u, p), 1e-4,
    )
