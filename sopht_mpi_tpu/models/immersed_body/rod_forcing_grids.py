"""Forcing grids for Cosserat rods.

Counterparts of the rod forcing-grid classes the reference imports from the
external ``sopht`` package (``CosseratRodElementCentricForcingGrid``,
``CosseratRodSurfaceForcingGrid``; reference usage
/root/reference/examples/2d_examples/FlowPastRodCase/flow_past_rod.py:11-14
and .../3d_examples/FlowPastRodCase/flow_past_rod_case.py:10,:131-132).

Functional design: all marker kinematics are pure jnp expressions on the
rod state pytree, so the full FSI interaction jits. The per-point element
index/angle bookkeeping of the surface grid is precomputed as static
arrays (radii are time-invariant), leaving only vectorized gathers at
call time - the TPU-friendly replacement for the reference's per-element
Python loops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from sopht_mpi_tpu.models.immersed_body.forcing_grids import (
    ImmersedBodyForcingGrid,
)


class CosseratRodElementCentricForcingGrid(ImmersedBodyForcingGrid):
    """2D grid with one marker per rod element (element centers).

    Forces are transferred back to the two adjacent nodes with equal
    weights; no torques (the marker sits on the centerline).
    """

    grid_dim = 2

    def __init__(self, cosserat_rod, **kwargs):
        self.rod = cosserat_rod
        self.num_lag_nodes = cosserat_rod.n_elems

    @property
    def position_field(self):
        return self.compute_lag_grid_position_field()

    # pure state-based kernels (jit/scan-safe; used by the fused on-device
    # FSI loop, models/fsi.py)

    def lag_positions(self, rod_state):
        pos = rod_state.position
        return 0.5 * (pos[:2, 1:] + pos[:2, :-1])

    def lag_velocities(self, rod_state):
        vel = rod_state.velocity
        return 0.5 * (vel[:2, 1:] + vel[:2, :-1])

    def body_loads(self, rod_state, lag_grid_forcing_field):
        n = lag_grid_forcing_field.shape[1]
        dtype = lag_grid_forcing_field.dtype
        forces = jnp.zeros((3, n + 1), dtype)
        half = -0.5 * lag_grid_forcing_field  # force ON body = -lag forcing
        forces = forces.at[:2, :-1].add(half)
        forces = forces.at[:2, 1:].add(half)
        torques = jnp.zeros((3, n), dtype)
        return forces, torques

    # stateful wrappers (reference API surface)

    def compute_lag_grid_position_field(self):
        return self.lag_positions(self.rod.state)

    def compute_lag_grid_velocity_field(self):
        return self.lag_velocities(self.rod.state)

    def transfer_forcing_from_grid_to_body(self, lag_grid_forcing_field):
        return self.body_loads(self.rod.state, lag_grid_forcing_field)

    def get_maximum_lagrangian_grid_spacing(self):
        return float(jnp.max(self.rod.lengths))


class CosseratRodSurfaceForcingGrid(ImmersedBodyForcingGrid):
    """3D grid with markers on the rod's lateral surface: one ring per
    element, with the ring point count scaled by the element radius
    relative to the largest element
    (``surface_grid_density_for_largest_element`` points on the largest
    ring; reference usage flow_past_rod_case.py:131-132).

    Marker kinematics include the element's rigid rotation
    (``v = v_elem + omega_lab x arm``); force transfer splits each
    marker's force between the adjacent nodes and accumulates the
    material-frame torque about the element center.
    """

    grid_dim = 3

    def __init__(
        self,
        cosserat_rod,
        surface_grid_density_for_largest_element: int,
        with_cap: bool = False,
        **kwargs,
    ):
        self.rod = cosserat_rod
        radii = np.asarray(cosserat_rod.params.radius)
        n_elems = cosserat_rod.n_elems
        r_max = float(radii.max())
        density = int(surface_grid_density_for_largest_element)

        elem_idx = []
        angles = []
        for k in range(n_elems):
            n_theta = max(1, int(np.ceil(density * radii[k] / r_max)))
            th = np.linspace(0.0, 2.0 * np.pi, n_theta, endpoint=False)
            elem_idx.extend([k] * n_theta)
            angles.extend(th.tolist())
        self._elem_idx = jnp.asarray(np.asarray(elem_idx, np.int32))
        self._np_elem_idx = np.asarray(elem_idx, np.int64)
        dtype = np.dtype(cosserat_rod.state.position.dtype)
        angles = np.asarray(angles, dtype)
        self._cos_t = jnp.asarray(np.cos(angles))
        self._sin_t = jnp.asarray(np.sin(angles))
        self._radius = jnp.asarray(radii[self._np_elem_idx].astype(dtype))
        self.num_lag_nodes = len(elem_idx)

        ring_counts = np.bincount(self._np_elem_idx, minlength=n_elems)
        lengths = np.asarray(cosserat_rod.params.rest_lengths)
        self._max_spacing = float(
            max(
                lengths.max(),
                (2.0 * np.pi * radii / np.maximum(ring_counts, 1)).max(),
            )
        )

    # -- marker kinematics ----------------------------------------------------

    def _element_frames(self, state=None):
        """(centers, velocities, omega_lab, d1, d2) gathered per marker."""
        if state is None:
            state = self.rod.state
        idx = self._elem_idx
        centers = 0.5 * (state.position[:, 1:] + state.position[:, :-1])
        vels = 0.5 * (state.velocity[:, 1:] + state.velocity[:, :-1])
        # omega in lab frame: w_lab = Q^T w_material
        omega_lab = jnp.einsum("jin,jn->in", state.director, state.omega)
        d1 = state.director[0]  # (3, n): material axis 1 in lab frame
        d2 = state.director[1]
        return (
            centers[:, idx],
            vels[:, idx],
            omega_lab[:, idx],
            d1[:, idx],
            d2[:, idx],
        )

    def _moment_arms(self, state=None):
        _, _, _, d1, d2 = self._element_frames(state)
        return self._radius * (self._cos_t * d1 + self._sin_t * d2)

    @property
    def position_field(self):
        return self.compute_lag_grid_position_field()

    # pure state-based kernels (jit/scan-safe; used by the fused on-device
    # FSI loop, models/fsi.py)

    def lag_positions(self, rod_state):
        centers, _, _, d1, d2 = self._element_frames(rod_state)
        arm = self._radius * (self._cos_t * d1 + self._sin_t * d2)
        return centers + arm

    def lag_velocities(self, rod_state):
        centers, vels, omega_lab, d1, d2 = self._element_frames(rod_state)
        arm = self._radius * (self._cos_t * d1 + self._sin_t * d2)
        return vels + jnp.cross(omega_lab, arm, axis=0)

    def body_loads(self, rod_state, lag_grid_forcing_field):
        n = rod_state.omega.shape[1]
        dtype = lag_grid_forcing_field.dtype
        body_force = -lag_grid_forcing_field  # Newton's third law
        # accumulate per-element force, split half-half to adjacent nodes
        elem_force = (
            jnp.zeros((3, n), dtype).at[:, self._elem_idx].add(body_force)
        )
        forces = jnp.zeros((3, n + 1), dtype)
        forces = forces.at[:, :-1].add(0.5 * elem_force)
        forces = forces.at[:, 1:].add(0.5 * elem_force)
        # material-frame torque about element centers
        arm = self._moment_arms(rod_state)
        torque_lab = jnp.cross(arm, body_force, axis=0)
        elem_torque_lab = (
            jnp.zeros((3, n), dtype).at[:, self._elem_idx].add(torque_lab)
        )
        torques = jnp.einsum(
            "ijn,jn->in", rod_state.director, elem_torque_lab
        )
        return forces, torques

    # stateful wrappers (reference API surface)

    def compute_lag_grid_position_field(self):
        return self.lag_positions(self.rod.state)

    def compute_lag_grid_velocity_field(self):
        return self.lag_velocities(self.rod.state)

    def transfer_forcing_from_grid_to_body(self, lag_grid_forcing_field):
        return self.body_loads(self.rod.state, lag_grid_forcing_field)

    def get_maximum_lagrangian_grid_spacing(self):
        return self._max_spacing
