"""Immersed body <-> flow interaction.

Counterpart of ``ImmersedBodyFlowInteractionMPI`` and its concrete
subclasses (/root/reference/sopht_mpi/simulator/immersed_body/
immersed_body_flow_interaction_mpi.py:10-202,
rigid_body_flow_interaction_mpi.py, cosserat_rod_flow_interaction_mpi.py).

Bridges a flow simulator and a body's forcing grid through the penalty
virtual-boundary forcing. The reference's master-rank ownership,
view-buffers and auto-ghosting disappear: markers are replicated and the
velocity field needs no halo pass (ops read the global sharded array).

Usage mirrors the reference examples (flow_past_cylinder.py:149-155)::

    interactor = RigidBodyFlowInteraction(flow_sim, cylinder, forcing_grid, ...)
    ...
    interactor.time_step(dt)   # integrate position mismatch
    interactor()               # penalty force -> flow_sim.eul_grid_forcing_field
    flow_sim.time_step(dt)
"""

from __future__ import annotations

import logging

import jax.numpy as jnp
import numpy as np

from sopht_mpi_tpu.ops.virtual_boundary import (
    VirtualBoundaryForcingParams,
    compute_interaction_force_on_eul_and_lag_grid,
    compute_interaction_force_on_lag_grid,
    init_virtual_boundary_state,
    virtual_boundary_time_step,
)

logger = logging.getLogger("sopht_mpi_tpu")


class ImmersedBodyFlowInteraction:
    """Base interactor between a flow simulator and a forcing grid."""

    def __init__(
        self,
        flow_sim,
        forcing_grid,
        virtual_boundary_stiffness_coeff: float,
        virtual_boundary_damping_coeff: float,
        eul_grid_coord_shift=None,
        interp_kernel_width=None,
        delta_kind="cosine",
        start_time=0.0,
        body_dim=3,
    ):
        self.flow_sim = flow_sim
        self.forcing_grid = forcing_grid
        grid_dim = forcing_grid.grid_dim
        dx = flow_sim.dx

        # relative-resolution warnings (reference :46-80)
        max_lag_grid_dx = forcing_grid.get_maximum_lagrangian_grid_spacing()
        grid_type = type(forcing_grid).__name__
        if max_lag_grid_dx > 2 * dx:
            logger.warning(
                f"For {grid_type}: Eulerian grid spacing (dx): {dx}"
                f"\nMax Lagrangian grid spacing: {max_lag_grid_dx} > 2 * dx"
                "\nThe Lagrangian grid of the body is too coarse relative to"
                "\nthe Eulerian grid of the flow, which can lead to unexpected"
                "\nconvergence. Please make the Lagrangian grid finer."
            )
        elif max_lag_grid_dx < 0.5 * dx:
            logger.warning(
                f"For {grid_type}: Eulerian grid spacing (dx): {dx}"
                f"\nMax Lagrangian grid spacing: {max_lag_grid_dx} < 0.5 * dx"
                "\nThe Lagrangian grid of the body is too fine relative to"
                "\nthe Eulerian grid of the flow, which corresponds to redundant"
                "\nforcing points. Please make the Lagrangian grid coarser."
            )
        else:
            logger.info(
                f"For {grid_type}: Lagrangian grid is resolved almost the "
                "same as the Eulerian grid of the flow."
            )

        # rescale coeffs by the Lagrangian spacing (reference :84-86)
        scale = max_lag_grid_dx ** (grid_dim - 1)
        self.params = VirtualBoundaryForcingParams(
            virtual_boundary_stiffness_coeff=virtual_boundary_stiffness_coeff * scale,
            virtual_boundary_damping_coeff=virtual_boundary_damping_coeff * scale,
            grid_dim=grid_dim,
            dx=dx,
            eul_grid_coord_shift=eul_grid_coord_shift,
            interp_kernel_width=interp_kernel_width or 2,
            delta_kind=delta_kind,
        )
        dtype = np.dtype(flow_sim.real_t)
        self.state = init_virtual_boundary_state(
            forcing_grid.num_lag_nodes, grid_dim, dtype=dtype,
            start_time=start_time,
        )
        self._velocity_mismatch = jnp.zeros(
            (grid_dim, forcing_grid.num_lag_nodes), dtype=dtype
        )
        self.global_lag_grid_forcing_field = jnp.zeros(
            (grid_dim, forcing_grid.num_lag_nodes), dtype=dtype
        )
        self.body_flow_forces = jnp.zeros((3, body_dim), dtype=dtype)
        self.body_flow_torques = jnp.zeros((3, body_dim), dtype=dtype)

    # -- interaction --------------------------------------------------------

    def compute_interaction_on_lag_grid(self):
        """Penalty force on the Lagrangian grid only (reference :139-151)."""
        pos = self.forcing_grid.compute_lag_grid_position_field()
        vel = self.forcing_grid.compute_lag_grid_velocity_field()
        interaction = compute_interaction_force_on_lag_grid(
            self.state, self.flow_sim.velocity_field, pos, vel, self.params
        )
        self.global_lag_grid_forcing_field = interaction.lag_forcing
        self._velocity_mismatch = interaction.velocity_mismatch
        return interaction

    def compute_full_interaction(self):
        """Full interaction: penalty force plus spreading onto the flow's
        forcing field (reference :153-166)."""
        pos = self.forcing_grid.compute_lag_grid_position_field()
        vel = self.forcing_grid.compute_lag_grid_velocity_field()
        eul_forcing, interaction = compute_interaction_force_on_eul_and_lag_grid(
            self.state,
            self.flow_sim.eul_grid_forcing_field,
            self.flow_sim.velocity_field,
            pos,
            vel,
            self.params,
        )
        self.flow_sim.eul_grid_forcing_field = eul_forcing
        self.global_lag_grid_forcing_field = interaction.lag_forcing
        self._velocity_mismatch = interaction.velocity_mismatch
        return interaction

    def __call__(self):
        self.compute_full_interaction()

    def time_step(self, dt):
        """Integrate the position mismatch (uses the mismatch from the most
        recent interaction computation, like the reference's buffers)."""
        self.state = virtual_boundary_time_step(
            self.state, self._velocity_mismatch, dt
        )

    # -- diagnostics / body coupling ----------------------------------------

    def compute_flow_forces_and_torques(self):
        """Force/torque transfer onto the body (reference :168-175)."""
        self.compute_interaction_on_lag_grid()
        self.body_flow_forces, self.body_flow_torques = (
            self.forcing_grid.transfer_forcing_from_grid_to_body(
                self.global_lag_grid_forcing_field
            )
        )

    @property
    def position_mismatch(self):
        """Penalty position-mismatch field (the IBM state to checkpoint for
        exact FSI restarts, reference
        flow_past_freely_rotating_rod_case.py:199-246)."""
        return self.state.position_mismatch

    @position_mismatch.setter
    def position_mismatch(self, value):
        self.state = self.state._replace(
            position_mismatch=jnp.asarray(value, self.state.position_mismatch.dtype)
        )

    def get_grid_deviation_error_l2_norm(self) -> float:
        """L2 norm of the flow-body grid deviation (reference :177-202)."""
        num = max(self.forcing_grid.num_lag_nodes, 1)
        return float(
            jnp.linalg.norm(self.state.position_mismatch) / np.sqrt(num)
        )


class RigidBodyFlowInteraction(ImmersedBodyFlowInteraction):
    """Rigid body interactor: body forces/torques shape (3, 1)
    (reference rigid_body_flow_interaction_mpi.py:10-64)."""

    def __init__(self, flow_sim, rigid_body, forcing_grid, **kwargs):
        self.rigid_body = rigid_body
        super().__init__(flow_sim, forcing_grid, body_dim=1, **kwargs)


class CosseratRodFlowInteraction(ImmersedBodyFlowInteraction):
    """Cosserat rod interactor: body forces on nodes (3, n_elems+1),
    torques on elements (3, n_elems)
    (reference cosserat_rod_flow_interaction_mpi.py:10-68). The master-rank
    / EmptyForcingGrid split of the reference disappears - markers are
    replicated.

    :param forcing_grid_cls: e.g. ``CosseratRodElementCentricForcingGrid``
        (2D) or ``CosseratRodSurfaceForcingGrid`` (3D); extra kwargs (e.g.
        ``surface_grid_density_for_largest_element``) are forwarded.
    """

    def __init__(
        self,
        flow_sim,
        cosserat_rod,
        virtual_boundary_stiffness_coeff,
        virtual_boundary_damping_coeff,
        forcing_grid_cls,
        **kwargs,
    ):
        self.cosserat_rod = cosserat_rod
        grid_kwargs = {
            k: kwargs.pop(k)
            for k in list(kwargs)
            if k
            in (
                "surface_grid_density_for_largest_element",
                "with_cap",
                "num_forcing_points",
            )
        }
        forcing_grid = forcing_grid_cls(cosserat_rod=cosserat_rod, **grid_kwargs)
        super().__init__(
            flow_sim,
            forcing_grid,
            virtual_boundary_stiffness_coeff,
            virtual_boundary_damping_coeff,
            body_dim=cosserat_rod.n_elems,
            **kwargs,
        )
        dtype = np.dtype(flow_sim.real_t)
        self.body_flow_forces = jnp.zeros((3, cosserat_rod.n_elems + 1), dtype)
        self.body_flow_torques = jnp.zeros((3, cosserat_rod.n_elems), dtype)
