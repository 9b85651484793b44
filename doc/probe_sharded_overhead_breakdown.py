"""Break down the residual mesh-(1,1) wrapper overhead (round 4:
46.1 vs 40.2 ms/step at 256^3 after the fused sharded diffusion+penalise
kernel and the replicated sparse-window IBM landed): time each sharded
stencil op standalone against its unsharded twin on the real chip.

Run alone (the chip is exclusive):  python doc/probe_sharded_overhead_breakdown.py
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

    from sopht_mpi_tpu.ops import pallas_stencils_3d as ps
    from sopht_mpi_tpu.ops import pallas_stencils_sharded as pss
    from sopht_mpi_tpu.parallel import create_mesh, shard_vector_field
    from sopht_mpi_tpu.utils.profiling import measure_op_time

    n = 256
    shape = (3, n, n, n)
    mesh = create_mesh(3, (1, 1), devices=jax.devices()[:1])
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ws = shard_vector_field(w, mesh)
    us = shard_vector_field(u, mesh)
    a = jnp.float32(0.3)

    def t(label, fn, arg):
        ms = measure_op_time(fn, arg) * 1e3
        print(f"{label:<44s} {ms:7.2f} ms", flush=True)
        return ms

    t("diffusion unsharded", lambda f: ps.diffusion_timestep_vector_3d_pallas(f, a), w)
    t("diffusion sharded", lambda f: pss.diffusion_timestep_vector_3d_sharded(f, a, mesh), ws)
    t("diffpen unsharded (w=2)",
      lambda f: ps.diffusion_penalise_vector_3d_pallas(f, a, 2), w)
    t("diffpen sharded  (w=2)",
      lambda f: pss.diffusion_penalise_vector_3d_sharded(f, a, 2, mesh), ws)
    t("curl+l1 unsharded",
      lambda f: ps.curl_3d_pallas(f, a, compute_l1_max=True)[0], w)
    t("curl+l1 sharded",
      lambda f: pss.curl_3d_sharded(f, a, mesh, compute_l1_max=True)[0], ws)
    t("rotational unsharded",
      lambda fg: (ps.rotational_curl_add_3d_pallas(fg[0], fg[1], a), fg[1]),
      (w, u))
    t("rotational sharded",
      lambda fg: (pss.rotational_curl_add_3d_sharded(fg[0], fg[1], a, mesh),
                  fg[1]),
      (ws, us))


if __name__ == "__main__":
    main()
