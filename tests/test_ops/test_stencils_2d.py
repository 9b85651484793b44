"""2D stencil ops vs numpy oracles + sharded/unsharded parity.

Plays the role of the reference's distributed-vs-serial oracle pattern
(tests/test_numeric/test_eulerian_grid_ops/test_stencil_ops_2d/): the
single-device result is the 'serial kernel', the 8-virtual-device result is
the 'MPI kernel', and numpy expressions are the independent ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.ops import (
    advection_flux_conservative_eno3_2d,
    advection_timestep_eno3_2d,
    brinkmann_penalise_2d,
    char_func_from_level_set_via_sine_heaviside_2d,
    diffusion_flux_2d,
    diffusion_timestep_2d,
    outplane_field_curl_2d,
    penalise_field_boundary_2d,
    update_vorticity_from_velocity_forcing_2d,
)
from sopht_mpi_tpu.parallel import (
    create_mesh,
    shard_scalar_field,
    shard_vector_field,
)
from sopht_mpi_tpu.utils import get_real_t, get_test_tol


def _rand_field(shape, precision, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.dtype(get_real_t(precision)))


def test_diffusion_flux_vs_numpy(precision):
    f = _rand_field((32, 16), precision)
    prefactor = 0.1
    out = np.asarray(diffusion_flux_2d(jnp.asarray(f), prefactor))
    ref = np.zeros_like(f)
    ref[1:-1, 1:-1] = prefactor * (
        f[2:, 1:-1] + f[:-2, 1:-1] + f[1:-1, 2:] + f[1:-1, :-2]
        - 4.0 * f[1:-1, 1:-1]
    )
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision))


def test_diffusion_timestep(precision):
    f = _rand_field((16, 16), precision)
    out = np.asarray(diffusion_timestep_2d(jnp.asarray(f), 0.05))
    ref = f + np.asarray(diffusion_flux_2d(jnp.asarray(f), 0.05))
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision))


def test_curl_vs_numpy(precision):
    psi = _rand_field((24, 16), precision)
    prefactor = 0.5 / 0.1
    out = np.asarray(outplane_field_curl_2d(jnp.asarray(psi), prefactor))
    ref = np.zeros((2, *psi.shape), dtype=psi.dtype)
    ref[0, 1:-1, 1:-1] = prefactor * (psi[2:, 1:-1] - psi[:-2, 1:-1])
    ref[1, 1:-1, 1:-1] = -prefactor * (psi[1:-1, 2:] - psi[1:-1, :-2])
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision) * 10)


def test_update_vorticity_from_velocity_forcing(precision):
    w = _rand_field((16, 16), precision, 1)
    fvec = _rand_field((2, 16, 16), precision, 2)
    prefactor = 0.25
    out = np.asarray(
        update_vorticity_from_velocity_forcing_2d(
            jnp.asarray(w), jnp.asarray(fvec), prefactor
        )
    )
    ref = w.copy()
    ref[1:-1, 1:-1] += prefactor * (
        (fvec[1, 1:-1, 2:] - fvec[1, 1:-1, :-2])
        - (fvec[0, 2:, 1:-1] - fvec[0, :-2, 1:-1])
    )
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision))


def test_advection_flux_smooth_field_accuracy():
    """Conservative ENO3 flux divergence of a smooth compact field matches
    the analytical d(u q)/dx + d(v q)/dy with 3rd-order convergence."""
    errors = []
    for n in (64, 128):
        dx = 1.0 / n
        x = (np.arange(n) + 0.5) * dx
        X, Y = np.meshgrid(x, x)
        q = np.exp(-((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.01)
        u = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        v = -np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)
        # analytical divergence of (u q, v q)
        dqdx = q * (-(2 * (X - 0.5)) / 0.01)
        dqdy = q * (-(2 * (Y - 0.5)) / 0.01)
        dudx = 2 * np.pi * np.cos(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        dvdy = -2 * np.pi * np.cos(2 * np.pi * X) * np.cos(2 * np.pi * Y)
        exact = u * dqdx + v * dqdy + q * (dudx + dvdy)
        flux = np.asarray(
            advection_flux_conservative_eno3_2d(
                jnp.asarray(q), jnp.asarray(np.stack([u, v])), 1.0 / dx
            )
        )
        interior = (slice(4, -4), slice(4, -4))
        # L2 norm: ENO schemes locally drop order at stencil-switch points,
        # so max-norm understates the convergence rate on smooth data.
        diff = flux[interior] - exact[interior]
        errors.append(np.sqrt(np.mean(diff**2)))
    order = np.log2(errors[0] / errors[1])
    assert order > 2.2, f"ENO3 convergence order {order} too low ({errors})"


def test_advection_conservation():
    """Total advected quantity is conserved for a compactly supported field
    (fluxes telescope)."""
    n = 64
    rng = np.random.default_rng(3)
    q = np.zeros((n, n))
    q[20:40, 20:40] = rng.standard_normal((20, 20))
    u = rng.standard_normal((2, n, n))
    new = np.asarray(
        advection_timestep_eno3_2d(jnp.asarray(q), jnp.asarray(u), 0.01)
    )
    np.testing.assert_allclose(new.sum(), q.sum(), atol=1e-10)


def test_penalise_field_boundary(precision):
    width = 4
    f = _rand_field((32, 32), precision, 5) + 2.0
    out = np.asarray(penalise_field_boundary_2d(jnp.asarray(f), width))
    ramp = np.sin(0.5 * np.pi * np.arange(width) / width)
    # interior untouched
    np.testing.assert_array_equal(
        out[width:-width, width:-width], f[width:-width, width:-width]
    )
    # x-front band of a row far from y walls: clamped then ramped
    row = 16
    np.testing.assert_allclose(
        out[row, :width], f[row, width - 1] * ramp,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        out[row, -width:], f[row, -width] * ramp[::-1],
        rtol=1e-5,
    )
    # width=0 no-op
    np.testing.assert_array_equal(
        np.asarray(penalise_field_boundary_2d(jnp.asarray(f), 0)), f
    )


def test_brinkmann_penalise(precision):
    u = _rand_field((2, 16, 16), precision, 6)
    chi = np.abs(_rand_field((16, 16), precision, 7))
    ub = _rand_field((2, 16, 16), precision, 8)
    k = 12.0
    out = np.asarray(
        brinkmann_penalise_2d(jnp.asarray(u), k, jnp.asarray(chi), jnp.asarray(ub))
    )
    ref = (u + k * chi * ub) / (1.0 + k * chi)
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision))


def test_char_func_from_level_set(precision):
    phi = _rand_field((16, 16), precision, 9)
    w = 0.5
    out = np.asarray(
        char_func_from_level_set_via_sine_heaviside_2d(jnp.asarray(phi), w)
    )
    ref = np.clip(
        0.5 * (1 + phi / w + np.sin(np.pi * phi / w) / np.pi), 0.0, 1.0
    )
    np.testing.assert_allclose(out, ref, atol=get_test_tol(precision))
    assert out[phi > w].min() == 1.0
    assert out[phi < -w].max() == 0.0


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_sharded_matches_single_device(mesh_shape):
    """All 2D stencil ops: 8-device sharded == single device (the
    scatter/compute/gather oracle of the reference test suite)."""
    mesh = create_mesh(2, mesh_shape)
    q = _rand_field((32, 32), "double", 10)
    u = _rand_field((2, 32, 32), "double", 11)

    qs = shard_scalar_field(jnp.asarray(q), mesh)
    us = shard_vector_field(jnp.asarray(u), mesh)

    cases = [
        (lambda a, b: diffusion_flux_2d(a, 0.1), q),
        (lambda a, b: advection_timestep_eno3_2d(a, b, 0.05), q),
        (lambda a, b: outplane_field_curl_2d(a, 5.0), q),
        (lambda a, b: update_vorticity_from_velocity_forcing_2d(a, b, 0.3), q),
        (lambda a, b: penalise_field_boundary_2d(a, 3), q),
    ]
    for fn, base in cases:
        single = np.asarray(fn(jnp.asarray(base), jnp.asarray(u)))
        multi = np.asarray(jax.jit(fn)(qs, us))
        np.testing.assert_allclose(multi, single, atol=1e-12)
