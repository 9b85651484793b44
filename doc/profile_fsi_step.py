"""Reproducible cost-structure profile of the flagship 256^3 FSI step.

Prints the per-op device times that PLAN.md's "Measured cost structure"
sections record, using the honest tunnel-safe methodology
(utils.profiling.measure_op_time: scan-amortized, output-chained, one
device->host fetch). Run on the real chip; serialize with any other TPU
work (the chip is exclusive).

    python doc/profile_fsi_step.py            # default HIGHEST path
    PROFILE_FAST=1 python doc/profile_fsi_step.py   # BENCH_FAST config

Methodology note (hard-won, see PLAN.md): STANDALONE op times overstate
in-situ cost - ops overlap when chained (the real-space curl pass costs
4.65 ms standalone but ~1.2 ms pipelined behind the solve tail). Ablate
chains (e.g. the "solve + curl" row) before acting on any single number.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if os.environ.get("PROFILE_FAST"):
        import sopht_mpi_tpu

        sopht_mpi_tpu.enable_fast_spectral()

    from __graft_entry__ import _build_fsi_case
    from sopht_mpi_tpu.ops import poisson as poisson_mod
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        curl_3d_pallas,
        diffusion_penalise_vector_3d_pallas,
        rotational_curl_add_3d_pallas,
    )
    from sopht_mpi_tpu.utils.profiling import measure_op_time

    N = int(os.environ.get("PROFILE_GRID", "256"))
    row = lambda label, t: print(f"{label:<42s} {t * 1e3:8.2f} ms")

    fsi_step, (carry,) = _build_fsi_case(grid_size=(N, N, N))
    row("full fused FSI step",
        measure_op_time(lambda c: fsi_step(c)[0], carry, iters=10,
                        repeats=3))

    solver = poisson_mod.UnboundedPoissonSolver3D(N, N, N, x_range=1.0)
    greens = solver.fourier_greens_times_dx_pow_dim
    key = jax.random.PRNGKey(1)
    w = jax.random.normal(key, (3, N, N, N), dtype=jnp.float32)
    fsv = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

    # greens ride the measured pytree: jit constants that large are
    # rejected by the remote compiler (HTTP 413)
    row("vector Poisson solve",
        measure_op_time(
            lambda wg: (solver.vector_field_solve(wg[0], wg[1]), wg[1]),
            (w, greens), iters=5, repeats=3))

    def solve_plus_curl(wg):
        x, g = wg
        psi = solver.vector_field_solve(x, g)
        u, _ = curl_3d_pallas(psi, 0.5 / solver.dx, add_vector=fsv,
                              compute_l1_max=True)
        return u, g

    row("solve + curl CHAINED (ablation)",
        measure_op_time(solve_plus_curl, (w, greens), iters=5, repeats=3))

    if solver.fused_curl_supported(jnp.float32):
        def fused_recovery(wg):
            x, g = wg
            u, _ = solver.velocity_from_vorticity_fused(x, g, fsv)
            return u, g

        row("fused spectral-curl recovery",
            measure_op_time(fused_recovery, (w, greens), iters=5,
                            repeats=3))

    row("curl pass standalone (+fsv,+l1max)",
        measure_op_time(
            lambda x: curl_3d_pallas(x, 0.5 / solver.dx, add_vector=fsv,
                                     compute_l1_max=True)[0],
            w, iters=10, repeats=3))
    row("rotational transport standalone",
        measure_op_time(
            lambda x: rotational_curl_add_3d_pallas(x, w, 0.5),
            w, iters=10, repeats=3))
    row("diffusion+penalise standalone",
        measure_op_time(
            lambda x: diffusion_penalise_vector_3d_pallas(x, 0.1, 2),
            w, iters=10, repeats=3))


if __name__ == "__main__":
    main()
