"""Isolate the mesh-(1,1) anomaly (PLAN.md round-4 #1): which component
of the 256^3 rigid-FSI step blows up from ~40 ms meshless to ~1553 ms on
a (1,1) mesh?

Forks probed (each its own timing, serialized on the one chip):
  A meshless, pallas, sparse IBM      (the bench configuration, ~40 ms)
  B meshless, pallas, dense IBM       (round-2 figure ~46 ms)
  C mesh(1,1), pallas (sharded shard_map stencils; Poisson stays local
    because mesh.size==1), dense IBM (sparse auto-disables under mesh)
  D mesh(1,1), use_pallas=False (jnp ops under SPMD)
  E sharded stencil ops standalone on a (1,1) mesh at 256^3

Run alone on the real chip:  python doc/probe_sharded_anomaly.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_steps(step, carry, steps=5, label=""):
    import jax
    from sopht_mpi_tpu.models import scan_steps

    carry, _ = scan_steps(step, carry, steps, donate=True)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    carry, _ = scan_steps(step, carry, steps, donate=True)
    jax.block_until_ready(carry)
    t1 = time.perf_counter()
    sec = (t1 - t0) / steps
    print(f"{label:<44s} {sec * 1e3:9.2f} ms/step", flush=True)
    return sec


def build_and_time(mesh, label, steps=5, **kw):
    from __graft_entry__ import _build_fsi_case

    step, (carry,) = _build_fsi_case(grid_size=(256, 256, 256), mesh=mesh,
                                     **kw)
    return time_steps(step, carry, steps, label)


def probe_ops(mesh):
    """Standalone sharded stencil ops at 256^3 on the mesh."""
    import jax
    import jax.numpy as jnp

    from sopht_mpi_tpu.ops import pallas_stencils_sharded as sh
    from sopht_mpi_tpu.parallel.mesh import shard_vector_field
    from sopht_mpi_tpu.utils.profiling import measure_op_time

    v = shard_vector_field(
        jnp.ones((3, 256, 256, 256), dtype=jnp.float32), mesh)

    def diff(x):
        return sh.diffusion_timestep_vector_3d_sharded(x, 0.1, mesh)

    t = measure_op_time(jax.jit(diff), v, iters=10)
    print(f"{'sharded diffusion_vector standalone':<44s} {t*1e3:9.2f} ms",
          flush=True)

    def curl(x):
        return sh.curl_3d_sharded(x, 0.5, mesh)

    t = measure_op_time(jax.jit(curl), v, iters=10)
    print(f"{'sharded curl standalone':<44s} {t*1e3:9.2f} ms", flush=True)

    def rot(x):
        return sh.rotational_curl_add_3d_sharded(x, v, 0.5, mesh)

    t = measure_op_time(jax.jit(rot), v, iters=10)
    print(f"{'sharded rotational standalone':<44s} {t*1e3:9.2f} ms",
          flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from sopht_mpi_tpu.parallel import create_mesh

    build_and_time(None, "A meshless pallas sparse-IBM")
    build_and_time(None, "B meshless pallas dense-IBM", sparse_forcing=False)
    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])
    build_and_time(mesh, "C mesh(1,1) pallas-sharded dense-IBM")
    try:
        from __graft_entry__ import _build_fsi_case

        step, (carry,) = _build_fsi_case(
            grid_size=(256, 256, 256), mesh=mesh)
        # D requires a use_pallas knob on the builder; probe op-level
        # instead when absent.
    except Exception:
        pass
    probe_ops(mesh)


if __name__ == "__main__":
    main()
