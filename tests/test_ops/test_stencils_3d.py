"""3D stencil ops vs numpy oracles + sharded/unsharded parity (the role of
tests/test_numeric/test_eulerian_grid_ops/test_stencil_ops_3d/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.ops import (
    advection_timestep_eno3_3d,
    advection_timestep_eno3_vector_3d,
    curl_3d,
    diffusion_flux_3d,
    diffusion_timestep_vector_3d,
    divergence_3d,
    laplacian_filter_3d,
    laplacian_filter_vector_3d,
    penalise_field_boundary_3d,
    update_vorticity_from_penalised_velocity_3d,
    update_vorticity_from_velocity_forcing_3d,
)
from sopht_mpi_tpu.parallel import (
    create_mesh,
    shard_scalar_field,
    shard_vector_field,
)
from sopht_mpi_tpu.utils import get_real_t, get_test_tol


def _rand(shape, precision, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.dtype(get_real_t(precision)))


def test_diffusion_flux_3d_vs_numpy(precision):
    f = _rand((12, 10, 8), precision)
    pf = 0.2
    out = np.asarray(diffusion_flux_3d(jnp.asarray(f), pf))
    ref = np.zeros_like(f)
    c = f[1:-1, 1:-1, 1:-1]
    ref[1:-1, 1:-1, 1:-1] = pf * (
        f[2:, 1:-1, 1:-1] + f[:-2, 1:-1, 1:-1]
        + f[1:-1, 2:, 1:-1] + f[1:-1, :-2, 1:-1]
        + f[1:-1, 1:-1, 2:] + f[1:-1, 1:-1, :-2]
        - 6.0 * c
    )
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision))


def test_curl_3d_vs_numpy(precision):
    v = _rand((3, 10, 10, 10), precision, 2)
    pf = 5.0
    out = np.asarray(curl_3d(jnp.asarray(v), pf))
    ref = np.zeros_like(v)
    inner = (slice(1, -1),) * 3

    def d(comp, ax):
        lo = [slice(1, -1)] * 3
        hi = [slice(1, -1)] * 3
        lo[ax] = slice(0, -2)
        hi[ax] = slice(2, None)
        return v[comp][tuple(hi)] - v[comp][tuple(lo)]

    # components (x,y,z); grid axes (z,y,x) = (0,1,2)
    ref[0][inner] = pf * (d(2, 1) - d(1, 0))  # dwz/dy - dwy/dz
    ref[1][inner] = pf * (d(0, 0) - d(2, 2))  # dwx/dz - dwz/dx
    ref[2][inner] = pf * (d(1, 2) - d(0, 1))  # dwy/dx - dwx/dy
    np.testing.assert_allclose(out, ref, atol=10 * get_test_tol(precision))


def test_divergence_of_curl_is_small():
    """div(curl(psi)) must vanish to round-off in the interior (the
    divergence-free diagnostic contract, flow_simulators_mpi_3d.py:451)."""
    psi = _rand((3, 24, 24, 24), "double", 3)
    vel = curl_3d(jnp.asarray(psi), 0.5 / 0.1)
    div = np.asarray(divergence_3d(vel, 1.0 / 0.1))
    # central-difference curl and divergence commute discretely
    assert np.abs(div[3:-3, 3:-3, 3:-3]).max() < 1e-10


def test_update_vorticity_from_penalised_velocity(precision):
    w = _rand((3, 8, 8, 8), precision, 4)
    u = _rand((3, 8, 8, 8), precision, 5)
    up = _rand((3, 8, 8, 8), precision, 6)
    pf = 0.7
    out = np.asarray(
        update_vorticity_from_penalised_velocity_3d(
            jnp.asarray(w), jnp.asarray(up), jnp.asarray(u), pf
        )
    )
    ref = w + np.asarray(curl_3d(jnp.asarray(up - u), pf))
    np.testing.assert_allclose(out, ref, atol=10 * get_test_tol(precision))


def test_advection_3d_conservation():
    n = 24
    rng = np.random.default_rng(7)
    q = np.zeros((n, n, n))
    q[8:16, 8:16, 8:16] = rng.standard_normal((8, 8, 8))
    u = rng.standard_normal((3, n, n, n))
    new = np.asarray(
        advection_timestep_eno3_3d(jnp.asarray(q), jnp.asarray(u), 0.01)
    )
    np.testing.assert_allclose(new.sum(), q.sum(), atol=1e-10)


def test_vector_variants_match_scalar(precision):
    v = _rand((3, 10, 10, 10), precision, 8)
    u = _rand((3, 10, 10, 10), precision, 9)
    out = np.asarray(
        advection_timestep_eno3_vector_3d(jnp.asarray(v), jnp.asarray(u), 0.02)
    )
    for c in range(3):
        ref = np.asarray(
            advection_timestep_eno3_3d(jnp.asarray(v[c]), jnp.asarray(u), 0.02)
        )
        np.testing.assert_allclose(out[c], ref, atol=get_test_tol(precision))
    out2 = np.asarray(diffusion_timestep_vector_3d(jnp.asarray(v), 0.05))
    for c in range(3):
        ref = v[c] + np.asarray(diffusion_flux_3d(jnp.asarray(v[c]), 0.05))
        np.testing.assert_allclose(out2[c], ref, atol=get_test_tol(precision))


class TestLaplacianFilter:
    def test_constant_field_unchanged(self):
        f = jnp.full((16, 16, 16), 3.7)
        for ftype in ("multiplicative", "convolution"):
            out = np.asarray(laplacian_filter_3d(f, 2, ftype))
            # interior: high-pass of a constant is zero -> field unchanged
            np.testing.assert_allclose(out[2:-2, 2:-2, 2:-2], 3.7, atol=1e-6)

    def test_nyquist_mode_removed(self):
        """The +-1 checkerboard along x is the highest mode; one
        multiplicative order with only-x variation removes it entirely."""
        n = 16
        x = np.arange(n)
        f = np.tile(((-1.0) ** x)[None, None, :], (n, n, 1))
        out = np.asarray(laplacian_filter_3d(jnp.asarray(f), 1, "convolution"))
        assert np.abs(out[4:-4, 4:-4, 4:-4]).max() < 1e-12

    def test_order_zero_noop(self):
        f = _rand((8, 8, 8), "double", 11)
        out = np.asarray(laplacian_filter_3d(jnp.asarray(f), 0, "multiplicative"))
        np.testing.assert_array_equal(out, f)

    def test_vector_variant(self):
        v = _rand((3, 8, 8, 8), "double", 12)
        out = np.asarray(laplacian_filter_vector_3d(jnp.asarray(v), 2, "multiplicative"))
        for c in range(3):
            ref = np.asarray(
                laplacian_filter_3d(jnp.asarray(v[c]), 2, "multiplicative")
            )
            np.testing.assert_allclose(out[c], ref, atol=1e-14)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_matches_single_device_3d(mesh_shape):
    mesh = create_mesh(3, mesh_shape)
    q = _rand((16, 16, 16), "double", 13)
    v = _rand((3, 16, 16, 16), "double", 14)
    qs = shard_scalar_field(jnp.asarray(q), mesh)
    vs = shard_vector_field(jnp.asarray(v), mesh)

    scalar_cases = [
        lambda a, b: diffusion_flux_3d(a, 0.1),
        lambda a, b: advection_timestep_eno3_3d(a, b, 0.05),
        lambda a, b: penalise_field_boundary_3d(a, 3),
    ]
    for fn in scalar_cases:
        single = np.asarray(fn(jnp.asarray(q), jnp.asarray(v)))
        multi = np.asarray(jax.jit(fn)(qs, vs))
        np.testing.assert_allclose(multi, single, atol=1e-12)

    vector_cases = [
        lambda a: curl_3d(a, 2.0),
        lambda a: divergence_3d(a, 10.0),
        lambda a: laplacian_filter_vector_3d(a, 2, "multiplicative"),
        lambda a: update_vorticity_from_velocity_forcing_3d(a, a, 0.3),
    ]
    for fn in vector_cases:
        single = np.asarray(fn(jnp.asarray(v)))
        multi = np.asarray(jax.jit(fn)(vs))
        np.testing.assert_allclose(multi, single, atol=1e-12)
