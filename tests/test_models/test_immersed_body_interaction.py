"""Immersed-body interaction integration tests (the role of the
reference's tests/test_simulator/immersed_body/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.models import (
    CircularCylinderForcingGrid,
    Cylinder,
    RigidBodyFlowInteraction,
    Sphere,
    SphereForcingGrid,
    UnboundedFlowSimulator2D,
)
from sopht_mpi_tpu.parallel import create_mesh


def _make_cylinder_case(mesh=None, n=64):
    sim = UnboundedFlowSimulator2D(
        grid_size=(n, 2 * n),
        x_range=1.0,
        kinematic_viscosity=1e-4,
        flow_type="navier_stokes_with_forcing",
        with_free_stream_flow=True,
        real_t=jnp.float64,
        mesh=mesh,
    )
    cyl = Cylinder(center=(0.2, 0.25), radius=0.05, dtype=jnp.float64)
    grid = CircularCylinderForcingGrid(cyl, 30)
    interactor = RigidBodyFlowInteraction(
        sim, cyl, grid,
        virtual_boundary_stiffness_coeff=-1e4,
        virtual_boundary_damping_coeff=-10.0,
    )
    return sim, cyl, interactor


def test_cylinder_interaction_decelerates_flow_and_drags_body():
    sim, cyl, interactor = _make_cylinder_case()
    U = (1.0, 0.0)
    # start with uniform flow
    sim.velocity_field = sim.velocity_field.at[0].set(1.0)
    for _ in range(20):
        dt = sim.compute_stable_timestep()
        interactor.time_step(dt=dt)
        interactor()
        sim.time_step(dt=dt, free_stream_velocity=U)
        sim.velocity_field = sim.velocity_field.at[0].add(0.0)  # no-op keep
        # keep velocity uniform-ish outside; interaction reads updated field

    # velocity at the cylinder center must be decelerated vs free stream
    iy = int(0.25 / sim.dx)
    ix = int(0.2 / sim.dx)
    u_center = float(sim.velocity_field[0, iy, ix])
    assert u_center < 0.7, f"flow not decelerated at body: {u_center}"

    # body force (Newton's 3rd law transfer) points downstream (+x drag)
    interactor.compute_flow_forces_and_torques()
    fx = float(interactor.body_flow_forces[0, 0])
    assert fx > 0.0, f"drag should be downstream, got {fx}"

    # markers track the body: grid deviation small
    assert interactor.get_grid_deviation_error_l2_norm() < 5e-3


def test_lag_grid_spacing_warnings(caplog):
    """Reference warns on too-coarse/too-fine Lagrangian grids
    (test_immersed_body_interaction_mpi.py:57-80)."""
    sim = UnboundedFlowSimulator2D(
        grid_size=(32, 32), x_range=1.0, kinematic_viscosity=1e-4,
        flow_type="navier_stokes_with_forcing", real_t=jnp.float32,
    )
    cyl = Cylinder(center=(0.5, 0.5), radius=0.2)
    import logging
    with caplog.at_level(logging.WARNING, logger="sopht_mpi_tpu"):
        RigidBodyFlowInteraction(
            sim, cyl, CircularCylinderForcingGrid(cyl, 4),
            virtual_boundary_stiffness_coeff=-1e4,
            virtual_boundary_damping_coeff=-10.0,
        )
    assert "too coarse" in caplog.text
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="sopht_mpi_tpu"):
        RigidBodyFlowInteraction(
            sim, cyl, CircularCylinderForcingGrid(cyl, 500),
            virtual_boundary_stiffness_coeff=-1e4,
            virtual_boundary_damping_coeff=-10.0,
        )
    assert "too fine" in caplog.text


def test_sphere_forcing_grid_geometry():
    sph = Sphere(center=(0.5, 0.5, 0.5), radius=0.1, dtype=jnp.float64)
    grid = SphereForcingGrid(sph, num_forcing_points_along_equator=16)
    pos = np.asarray(grid.compute_lag_grid_position_field())
    r = np.sqrt(((pos - 0.5) ** 2).sum(axis=0))
    np.testing.assert_allclose(r, 0.1, atol=1e-12)
    # rotating sphere: surface speed = omega x r
    sph.state = sph.state._replace(omega=jnp.asarray([0.0, 0.0, 2.0]))
    vel = np.asarray(grid.compute_lag_grid_velocity_field())
    expected_speed = 2.0 * np.sqrt(((pos[:2] - 0.5) ** 2).sum(axis=0))
    np.testing.assert_allclose(
        np.sqrt((vel**2).sum(axis=0)), expected_speed, atol=1e-12
    )


def test_interaction_sharded_matches_single():
    mesh = create_mesh(2, (8, 1))
    results = []
    for m in (None, mesh):
        sim, cyl, interactor = _make_cylinder_case(mesh=m)
        sim.velocity_field = sim.velocity_field.at[0].set(1.0)
        for _ in range(5):
            dt = 1e-4
            interactor.time_step(dt=dt)
            interactor()
            sim.time_step(dt=dt, free_stream_velocity=(1.0, 0.0))
        results.append(
            (
                np.asarray(sim.vorticity_field),
                np.asarray(interactor.global_lag_grid_forcing_field),
            )
        )
    np.testing.assert_allclose(results[0][0], results[1][0], atol=1e-10)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-10)
