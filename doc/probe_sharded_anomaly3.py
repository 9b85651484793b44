"""Third-stage isolation: components are individually fine (probe 2:
F 52 + G 17 ms), but the full FSI step on mesh(1,1) is ~3.5 s. The full
step's unique ingredient is the l1-max CFL reduction riding the sharded
curl (compute_l1_max=True) plus the dt-control scalar chain. Bisect:

  J full FSI step via measure_op_time (no donate)  - reproduce?
  K flow _step_l1_fn (l1-max path) alone on mesh(1,1)
  L sharded curl compute_l1_max=True standalone
  M full FSI step with dt control replaced by a fixed dt

Run alone on the real chip:  python doc/probe_sharded_anomaly3.py
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
    from sopht_mpi_tpu.parallel.mesh import shard_vector_field
    from sopht_mpi_tpu.utils.profiling import measure_op_time

    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])

    # L first (cheapest to build)
    from sopht_mpi_tpu.ops import pallas_stencils_sharded as sh

    v = shard_vector_field(jnp.ones((3, 256, 256, 256), jnp.float32), mesh)

    def curl_l1(x):
        out, _ = sh.curl_3d_sharded(x, jnp.float32(0.5), mesh,
                                    compute_l1_max=True)
        return out

    t = measure_op_time(curl_l1, v, iters=5)
    print(f"{'L sharded curl l1max standalone':<44s} {t*1e3:9.2f} ms",
          flush=True)

    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.models import scan_steps

    step, (carry,) = _build_fsi_case(grid_size=(256, 256, 256), mesh=mesh)

    # K: the l1 flow step alone
    from sopht_mpi_tpu.models import (
        Sphere,
        SphereForcingGrid,
        RigidBodyFlowInteraction,
        UnboundedFlowSimulator3D,
    )

    flow_sim = UnboundedFlowSimulator3D(
        grid_size=(256, 256, 256),
        x_range=1.0,
        kinematic_viscosity=0.25 * 2.0 / 100.0,
        flow_type="navier_stokes_with_forcing",
        with_free_stream_flow=True,
        real_t=jnp.float32,
        mesh=mesh,
    )
    state = flow_sim._get_state()
    greens = flow_sim._poisson_greens
    pack = {"state": state, "greens": greens}

    def step_l1(p):
        s, _l1 = flow_sim._step_l1_fn.__wrapped__(
            p["state"], jnp.float32(1e-4), jnp.zeros(3, jnp.float32),
            p["greens"])
        return {"state": s, "greens": p["greens"]}

    t = measure_op_time(step_l1, pack, iters=5)
    print(f"{'K flow step_l1 mesh(1,1)':<44s} {t*1e3:9.2f} ms", flush=True)

    # J: the full FSI step through measure_op_time's scan (no donate)
    def full(c):
        return step(c)[0]

    t = measure_op_time(full, carry, iters=3)
    print(f"{'J full FSI step mesh(1,1) (scan, no-donate)':<44s} "
          f"{t*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
