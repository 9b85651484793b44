"""Rigid-body dynamics stepper tests (the two-way-coupling consumer the
reference inherits from PyElastica's rigid bodies + PositionVerlet;
contract at /root/reference/sopht_mpi/simulator/immersed_body/rigid_body/
rigid_body_flow_interaction_mpi.py:10-64)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.models.rigid_body import (
    Cylinder,
    RigidBodyState,
    Sphere,
    rigid_body_position_verlet_step,
)


def _scan_steps(state, dt, n, force, torque, mass, inertia):
    def body(s, _):
        return (
            rigid_body_position_verlet_step(s, dt, force, torque, mass, inertia),
            None,
        )

    return jax.lax.scan(body, state, None, length=n)[0]


def test_sphere_mass_inertia():
    s = Sphere(center=np.zeros(3), radius=0.5, density=3.0, dtype=jnp.float64)
    np.testing.assert_allclose(s.mass, 3.0 * 4 / 3 * np.pi * 0.125)
    np.testing.assert_allclose(s.inertia_body, 0.4 * s.mass * 0.25)
    c = Cylinder(center=np.zeros(2), radius=0.5, density=3.0, dtype=jnp.float64)
    np.testing.assert_allclose(c.mass, 3.0 * np.pi * 0.25)
    np.testing.assert_allclose(c.inertia_body[2], 0.5 * c.mass * 0.25)


def test_ballistic_trajectory_exact():
    """Constant force, no torque: position-Verlet is exact for quadratic
    trajectories; x(T) = x0 + v0 T + a T^2 / 2."""
    mass = 2.0
    force = jnp.asarray([0.0, 0.0, -9.81 * mass], jnp.float64)
    state = RigidBodyState.create(
        np.array([0.0, 0.0, 10.0]), velocity=np.array([1.0, 0.0, 2.0]),
        dtype=jnp.float64,
    )
    dt, n = 0.01, 100
    out = _scan_steps(state, dt, n, force, jnp.zeros(3), mass, jnp.ones(3))
    T = dt * n
    expected = np.array([0.0, 0.0, 10.0]) + np.array([1.0, 0.0, 2.0]) * T
    expected[2] += -9.81 / 2 * T**2
    np.testing.assert_allclose(np.asarray(out.position), expected, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out.velocity), [1.0, 0.0, 2.0 - 9.81 * T], rtol=1e-12
    )


def test_free_rotation_conserves_momentum_and_orthonormality():
    """Torque-free rotation of an asymmetric body: angular momentum
    (global frame) and kinetic energy are conserved; the director stays
    orthonormal."""
    inertia = jnp.asarray([1.0, 2.0, 3.0], jnp.float64)
    state = RigidBodyState.create(
        np.zeros(3), omega=np.array([0.3, 1.0, 0.2]), dtype=jnp.float64
    )

    def ang_mom(s):
        q = s.director
        return q @ (np.asarray(inertia) * (q.T @ s.omega))

    def energy(s):
        q = s.director
        wl = q.T @ s.omega
        return 0.5 * float(wl @ (np.asarray(inertia) * wl))

    L0, E0 = np.asarray(ang_mom(state)), energy(state)
    out = _scan_steps(
        state, 1e-3, 2000, jnp.zeros(3), jnp.zeros(3), 1.0, inertia
    )
    np.testing.assert_allclose(np.asarray(ang_mom(out)), L0, atol=2e-3)
    np.testing.assert_allclose(energy(out), E0, rtol=1e-4)
    q = np.asarray(out.director)
    np.testing.assert_allclose(q @ q.T, np.eye(3), atol=1e-10)


def test_constant_torque_spin_up_isotropic():
    """Isotropic body + constant torque about z: omega_z = (T/I) t
    (gyroscopic term vanishes); rotation angle matches alpha t^2 / 2."""
    inertia = jnp.full(3, 2.0, jnp.float64)
    torque = jnp.asarray([0.0, 0.0, 0.5], jnp.float64)
    state = RigidBodyState.create(np.zeros(3), dtype=jnp.float64)
    dt, n = 1e-3, 1000
    out = _scan_steps(state, dt, n, jnp.zeros(3), torque, 1.0, inertia)
    T = dt * n
    alpha = 0.5 / 2.0
    np.testing.assert_allclose(float(out.omega[2]), alpha * T, rtol=1e-12)
    # director rotation angle about z
    ang = np.arctan2(float(out.director[1, 0]), float(out.director[0, 0]))
    np.testing.assert_allclose(ang, 0.5 * alpha * T**2, rtol=1e-5)


def test_forcing_grid_tracks_rotated_state():
    """Sphere forcing grid markers rotate with the director and advect
    with the COM; velocities include omega x r."""
    from sopht_mpi_tpu.models.immersed_body.forcing_grids import (
        SphereForcingGrid,
    )

    s = Sphere(center=np.array([0.5, 0.5, 0.5]), radius=0.1, dtype=jnp.float64)
    grid = SphereForcingGrid(rigid_body=s, num_forcing_points_along_equator=8)
    # rotate 90 degrees about z
    c, sn = 0.0, 1.0
    q = jnp.asarray([[c, -sn, 0.0], [sn, c, 0.0], [0.0, 0.0, 1.0]], jnp.float64)
    state = s.state._replace(
        director=q,
        velocity=jnp.asarray([1.0, 0.0, 0.0], jnp.float64),
        omega=jnp.asarray([0.0, 0.0, 2.0], jnp.float64),
    )
    pos = np.asarray(grid.lag_positions(state))
    r = pos - np.array([0.5, 0.5, 0.5])[:, None]
    local = np.asarray(grid._local_points)
    np.testing.assert_allclose(r, np.asarray(q) @ local, atol=1e-14)
    vel = np.asarray(grid.lag_velocities(state))
    expected_v = np.array([1.0, 0.0, 0.0])[:, None] + np.cross(
        np.array([0.0, 0.0, 2.0])[None], r.T
    ).T
    np.testing.assert_allclose(vel, expected_v, atol=1e-14)
    # loads: uniform force field -> zero net torque about COM for symmetric
    # marker sets is not guaranteed; instead check Newton's 3rd law sign
    f = np.ones((3, pos.shape[1]))
    forces, torques = grid.body_loads(state, jnp.asarray(f))
    np.testing.assert_allclose(
        np.asarray(forces)[:, 0], -f.sum(axis=1), rtol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(torques)[:, 0],
        -np.cross(r.T, f.T).sum(axis=0),
        atol=1e-12,
    )


@pytest.mark.parametrize("precision", ["double"])
def test_sedimenting_sphere_gravity_only_limit(precision):
    """Two-way sanity: a dense sphere under gravity+buoyancy with NO flow
    coupling falls ballistically with the reduced gravity - the dynamics
    path the FSI builder composes (full Stokes validation lives in
    examples/3d/sedimenting_sphere.py)."""
    rho_s, rho_f, g = 10.0, 1.0, 9.81
    s = Sphere(center=np.zeros(3), radius=0.1, density=rho_s, dtype=jnp.float64)
    force = jnp.asarray([0.0, 0.0, -(rho_s - rho_f) / rho_s * g * s.mass])
    out = _scan_steps(
        s.state, 0.01, 50, force, jnp.zeros(3), s.mass,
        jnp.asarray(s.inertia_body),
    )
    T = 0.5
    np.testing.assert_allclose(
        float(out.velocity[2]), -(rho_s - rho_f) / rho_s * g * T, rtol=1e-12
    )
