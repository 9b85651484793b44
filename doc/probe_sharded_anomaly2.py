"""Second-stage isolation of the mesh-(1,1) anomaly: the sharded stencil
kernels standalone are fast (probe_sharded_anomaly.py: 4-5 ms), yet the
full FSI step on a (1,1) mesh costs ~3.5 s. Time the step's sub-chains
under the mesh (everything large threaded through the scanned pytree like
the real carry - a closure constant of Green's-function size blows the
axon relay's remote-compile request limit with HTTP 413):

  F flow-only step (no IBM) on mesh(1,1)  [forcing field zero]
  G interaction force (E->L gather + L->E scatter) alone on mesh(1,1)
  H Poisson vector solve alone on mesh(1,1)
  I penalise_field_boundary jnp op alone on mesh(1,1)

Run alone on the real chip:  python doc/probe_sharded_anomaly2.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sopht_mpi_tpu.parallel import create_mesh
    from sopht_mpi_tpu.utils.profiling import measure_op_time
    from sopht_mpi_tpu.models import (
        Sphere,
        SphereForcingGrid,
        RigidBodyFlowInteraction,
        UnboundedFlowSimulator3D,
    )

    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])

    flow_sim = UnboundedFlowSimulator3D(
        grid_size=(256, 256, 256),
        x_range=1.0,
        kinematic_viscosity=0.25 * 2.0 / 100.0,
        flow_type="navier_stokes_with_forcing",
        with_free_stream_flow=True,
        real_t=jnp.float32,
        mesh=mesh,
    )
    sphere = Sphere(center=np.array([0.5, 0.5, 0.5]), radius=0.125,
                    dtype=jnp.float32)
    forcing_grid = SphereForcingGrid(
        rigid_body=sphere, num_forcing_points_along_equator=120)
    interactor = RigidBodyFlowInteraction(
        flow_sim=flow_sim, rigid_body=sphere, forcing_grid=forcing_grid,
        virtual_boundary_stiffness_coeff=-1e4,
        virtual_boundary_damping_coeff=-1e1,
    )

    state = flow_sim._get_state()
    greens = flow_sim._poisson_greens
    pack = {"state": state, "greens": greens}

    # F: flow-only step
    def flow_step(p):
        s = flow_sim._step_fn.__wrapped__(
            p["state"], jnp.float32(1e-4), jnp.zeros(3, jnp.float32),
            p["greens"])
        return {"state": s, "greens": p["greens"]}

    t = measure_op_time(flow_step, pack, iters=5)
    print(f"{'F flow-only step mesh(1,1)':<40s} {t*1e3:9.2f} ms", flush=True)

    # G: interaction force alone
    from sopht_mpi_tpu.ops.virtual_boundary import (
        compute_interaction_force_on_eul_and_lag_grid,
        init_virtual_boundary_state,
    )

    lag_pos = interactor.forcing_grid.compute_lag_grid_position_field()
    lag_vel = interactor.forcing_grid.compute_lag_grid_velocity_field()
    vb_state = init_virtual_boundary_state(lag_pos.shape[1], 3, jnp.float32)
    params = interactor.params

    def interaction(p):
        s = p["state"]
        eul, _ = compute_interaction_force_on_eul_and_lag_grid(
            vb_state, s.eul_grid_forcing_field, s.velocity_field,
            lag_pos, lag_vel, params, reset_eul_grid_forcing_field=True,
        )
        return {"state": s._replace(eul_grid_forcing_field=eul),
                "greens": p["greens"]}

    t = measure_op_time(interaction, pack, iters=5)
    print(f"{'G interaction (gather+scatter) mesh(1,1)':<40s} {t*1e3:9.2f} ms",
          flush=True)

    # H: Poisson vector solve alone
    solver = flow_sim.unbounded_poisson_solver

    def solve(p):
        s = p["state"]
        out = solver.vector_field_solve(s.primary_field, p["greens"])
        return {"state": s._replace(primary_field=out),
                "greens": p["greens"]}

    t = measure_op_time(solve, pack, iters=5)
    print(f"{'H Poisson vector solve mesh(1,1)':<40s} {t*1e3:9.2f} ms",
          flush=True)

    # I: jnp penalise boundary
    from sopht_mpi_tpu.ops.stencils_3d import (
        penalise_field_boundary_vector_3d,
    )

    def pen(p):
        s = p["state"]
        out = penalise_field_boundary_vector_3d(s.primary_field, 2)
        return {"state": s._replace(primary_field=out),
                "greens": p["greens"]}

    t = measure_op_time(pen, pack, iters=5)
    print(f"{'I penalise boundary jnp mesh(1,1)':<40s} {t*1e3:9.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
