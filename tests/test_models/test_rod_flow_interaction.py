"""Cosserat rod <-> flow coupling tests (counterpart of the reference's
test_mpi_cosserat_rod_flow_interaction.py, re-targeted at the replicated-
marker design)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sopht_mpi_tpu.models import (
    CosseratRod,
    CosseratRodElementCentricForcingGrid,
    CosseratRodFlowInteraction,
    CosseratRodSurfaceForcingGrid,
    UnboundedFlowSimulator2D,
    UnboundedFlowSimulator3D,
)


def straight_rod(n_elem=8, start=(1.0, 1.0, 0.0), direction=(0.0, 1.0, 0.0)):
    return CosseratRod.straight_rod(
        n_elem,
        np.asarray(start),
        np.asarray(direction),
        np.array([0.0, 0.0, 1.0]),
        base_length=1.0,
        base_radius=0.05,
        density=1e3,
        youngs_modulus=1e5,
        shear_modulus=1e5 / 1.5,
    )


def test_element_centric_grid_kinematics_and_transfer():
    rod = straight_rod()
    grid = CosseratRodElementCentricForcingGrid(cosserat_rod=rod)
    assert grid.num_lag_nodes == rod.n_elems
    pos = np.asarray(grid.compute_lag_grid_position_field())
    expected = 0.5 * (
        np.asarray(rod.position_collection[:2, 1:])
        + np.asarray(rod.position_collection[:2, :-1])
    )
    np.testing.assert_allclose(pos, expected)
    # forces: each marker's force split to adjacent nodes with minus sign
    lag_forcing = np.random.default_rng(0).standard_normal(
        (2, grid.num_lag_nodes)
    )
    forces, torques = grid.transfer_forcing_from_grid_to_body(
        jnp.asarray(lag_forcing)
    )
    np.testing.assert_allclose(
        np.asarray(forces[:2]).sum(axis=1), -lag_forcing.sum(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(torques), 0.0)


def test_surface_grid_markers_on_surface():
    rod = straight_rod()
    grid = CosseratRodSurfaceForcingGrid(
        cosserat_rod=rod, surface_grid_density_for_largest_element=8
    )
    pos = np.asarray(grid.compute_lag_grid_position_field())
    assert pos.shape == (3, grid.num_lag_nodes)
    # distance from the rod centerline equals the radius
    centers = 0.5 * (
        np.asarray(rod.position_collection[:, 1:])
        + np.asarray(rod.position_collection[:, :-1])
    )
    arm = pos - centers[:, np.asarray(grid._np_elem_idx)]
    np.testing.assert_allclose(
        np.linalg.norm(arm, axis=0), 0.05, rtol=1e-6
    )
    # force transfer conserves total force
    lag_forcing = np.random.default_rng(1).standard_normal(
        (3, grid.num_lag_nodes)
    )
    forces, torques = grid.transfer_forcing_from_grid_to_body(
        jnp.asarray(lag_forcing)
    )
    assert forces.shape == (3, rod.n_elems + 1)
    assert torques.shape == (3, rod.n_elems)
    np.testing.assert_allclose(
        np.asarray(forces).sum(axis=1), -lag_forcing.sum(axis=1), rtol=1e-6
    )


@pytest.mark.parametrize("precision", ["single"], indirect=True)
def test_rod_flow_interaction_2d_step(precision):
    """Full 2D FSI loop: interactor + rod substep + flow step stay finite
    and produce a nonzero coupling force with a moving rod in fluid."""
    grid_size = (32, 32)
    flow_sim = UnboundedFlowSimulator2D(
        grid_size=grid_size,
        x_range=1.0,
        kinematic_viscosity=1e-3,
        flow_type="navier_stokes_with_forcing",
        real_t=jnp.float32,
    )
    rod = straight_rod(n_elem=8, start=(0.5, 0.3, 0.0))
    interactor = CosseratRodFlowInteraction(
        flow_sim=flow_sim,
        cosserat_rod=rod,
        virtual_boundary_stiffness_coeff=-1e3,
        virtual_boundary_damping_coeff=-1e0,
        forcing_grid_cls=CosseratRodElementCentricForcingGrid,
    )
    # impose a background flow so a velocity mismatch exists
    flow_sim.velocity_field = jnp.ones_like(flow_sim.velocity_field)
    dt = 1e-3
    for _ in range(3):
        interactor.time_step(dt)
        interactor()
        flow_sim.time_step(dt)
    assert np.isfinite(np.asarray(flow_sim.velocity_field)).all()
    forcing = np.asarray(interactor.global_lag_grid_forcing_field)
    assert np.abs(forcing).max() > 0.0
    # flow force transfer populates rod-shaped buffers
    interactor.compute_flow_forces_and_torques()
    assert interactor.body_flow_forces.shape == (3, rod.n_elems + 1)
    assert interactor.body_flow_torques.shape == (3, rod.n_elems)
    assert np.isfinite(np.asarray(interactor.body_flow_forces)).all()


@pytest.mark.parametrize("precision", ["single"], indirect=True)
def test_rod_flow_interaction_3d_surface_grid(precision):
    grid_size = (16, 16, 16)
    flow_sim = UnboundedFlowSimulator3D(
        grid_size=grid_size,
        x_range=1.0,
        kinematic_viscosity=1e-3,
        flow_type="navier_stokes_with_forcing",
        real_t=jnp.float32,
    )
    rod = straight_rod(n_elem=6, start=(0.5, 0.3, 0.5), direction=(0, 1, 0))
    interactor = CosseratRodFlowInteraction(
        flow_sim=flow_sim,
        cosserat_rod=rod,
        virtual_boundary_stiffness_coeff=-1e3,
        virtual_boundary_damping_coeff=-1e0,
        forcing_grid_cls=CosseratRodSurfaceForcingGrid,
        surface_grid_density_for_largest_element=4,
    )
    flow_sim.velocity_field = jnp.ones_like(flow_sim.velocity_field)
    dt = 1e-3
    interactor.time_step(dt)
    interactor()
    flow_sim.time_step(dt)
    assert np.isfinite(np.asarray(flow_sim.velocity_field)).all()
    interactor.compute_flow_forces_and_torques()
    assert np.isfinite(np.asarray(interactor.body_flow_torques)).all()


def test_edge_grid_kinematics_and_transfer():
    """CosseratRodEdgeForcingGrid: 3*n markers (centers + both lateral
    edges offset by the radius along the in-plane normal); edge forces
    produce torques, symmetric edge forces produce none."""
    from sopht_mpi_tpu.models import CosseratRodEdgeForcingGrid

    rod = straight_rod()  # along +y in the x-y plane
    grid = CosseratRodEdgeForcingGrid(cosserat_rod=rod)
    n = rod.n_elems
    assert grid.num_lag_nodes == 3 * n
    pos = np.asarray(grid.compute_lag_grid_position_field())
    assert pos.shape == (2, 3 * n)
    centers = 0.5 * (
        np.asarray(rod.position_collection[:2, 1:])
        + np.asarray(rod.position_collection[:2, :-1])
    )
    np.testing.assert_allclose(pos[:, :n], centers, atol=1e-12)
    # rod tangent +y -> normal z x t = (-1, 0)*t_y = (-t_y, t_x) = (-1, 0)
    radius = 0.05
    np.testing.assert_allclose(
        pos[:, n : 2 * n], centers + np.array([[-radius], [0.0]]), atol=1e-7
    )
    np.testing.assert_allclose(
        pos[:, 2 * n :], centers + np.array([[radius], [0.0]]), atol=1e-7
    )
    # velocities at rest: zero everywhere
    vel = np.asarray(grid.compute_lag_grid_velocity_field())
    np.testing.assert_allclose(vel, 0.0, atol=1e-12)

    # symmetric (+edge == -edge) forcing: zero net torque, force conserved
    rng = np.random.default_rng(2)
    edge = rng.standard_normal((2, n))
    lag_forcing = np.concatenate([rng.standard_normal((2, n)), edge, edge], axis=1)
    forces, torques = grid.transfer_forcing_from_grid_to_body(
        jnp.asarray(lag_forcing)
    )
    assert forces.shape == (3, n + 1)
    assert torques.shape == (3, n)
    np.testing.assert_allclose(
        np.asarray(forces[:2]).sum(axis=1), -lag_forcing.sum(axis=1), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(torques), 0.0, atol=1e-12)

    # antisymmetric edge pair along the tangent: pure couple. +edge gets
    # +F t̂, -edge gets -F t̂ -> torque_z per element = arm x F + (-arm) x (-F)
    # = 2 * (arm_x F_y - arm_y F_x); body force = -lag forcing flips sign.
    f_t = np.zeros((2, n))
    f_t[1] = 1.0  # along +y (the tangent)
    lag_forcing = np.concatenate([np.zeros((2, n)), f_t, -f_t], axis=1)
    forces, torques = grid.transfer_forcing_from_grid_to_body(
        jnp.asarray(lag_forcing)
    )
    np.testing.assert_allclose(np.asarray(forces), 0.0, atol=1e-12)
    # arm = radius*(-1, 0); body force on +edge = -t̂ -> lab torque_z =
    # arm_x * (-1) - 0 = radius (per element, doubled by the -edge);
    # returned torques are material-frame: tau_i = d_i . tau_lab
    expected_tz_lab = 2.0 * radius * -1.0 * -1.0
    tau_lab = np.zeros((3, n))
    tau_lab[2] = expected_tz_lab
    expected_material = np.einsum(
        "ijn,jn->in", np.asarray(rod.director_collection), tau_lab
    )
    np.testing.assert_allclose(
        np.asarray(torques), expected_material, rtol=1e-6, atol=1e-12
    )


@pytest.mark.parametrize("precision", ["single"], indirect=True)
def test_rod_flow_interaction_2d_edge_grid_step(precision):
    """Full 2D FSI loop through the edge forcing grid."""
    from sopht_mpi_tpu.models import CosseratRodEdgeForcingGrid

    grid_size = (32, 32)
    flow_sim = UnboundedFlowSimulator2D(
        grid_size=grid_size,
        x_range=1.0,
        kinematic_viscosity=1e-3,
        flow_type="navier_stokes_with_forcing",
        real_t=jnp.float32,
    )
    rod = straight_rod(n_elem=8, start=(0.5, 0.3, 0.0))
    interactor = CosseratRodFlowInteraction(
        flow_sim=flow_sim,
        cosserat_rod=rod,
        virtual_boundary_stiffness_coeff=-1e3,
        virtual_boundary_damping_coeff=-1e0,
        forcing_grid_cls=CosseratRodEdgeForcingGrid,
    )
    flow_sim.velocity_field = jnp.ones_like(flow_sim.velocity_field)
    dt = 1e-3
    for _ in range(3):
        interactor.time_step(dt)
        interactor()
        flow_sim.time_step(dt)
    assert np.isfinite(np.asarray(flow_sim.velocity_field)).all()
    forcing = np.asarray(interactor.global_lag_grid_forcing_field)
    assert forcing.shape == (2, 3 * rod.n_elems)
    assert np.abs(forcing).max() > 0.0
    interactor.compute_flow_forces_and_torques()
    assert interactor.body_flow_forces.shape == (3, rod.n_elems + 1)
    assert interactor.body_flow_torques.shape == (3, rod.n_elems)
    assert np.isfinite(np.asarray(interactor.body_flow_forces)).all()
