"""Rod-FSI step time on a (1,1) mesh: sparse window vs dense
(VERDICT r04 next #2 'done' criterion - show the dense-pass cost removed
under a mesh at the production rod config).

Measures the fused rod-FSI step at the rod benchmark config
((256, 64, 256), reference-faithful sizing) in four arms:
meshless/mesh-(1,1) x sparse/dense, with the tunnel-safe scan-amortized
protocol. Run on the real chip (exclusive):

    python doc/probe_rod_mesh11.py
    ROD_GRID=128 python doc/probe_rod_mesh11.py   # faster smoke
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from __graft_entry__ import _build_rod_bench_case
    from sopht_mpi_tpu.parallel import create_mesh
    from sopht_mpi_tpu.utils.profiling import measure_op_time

    G = int(os.environ.get("ROD_GRID", "256"))
    grid = (G, max(8, G // 4), G)
    n_cells = grid[0] * grid[1] * grid[2]

    results = {}
    for mesh_label, mesh in (("meshless", None),
                             ("mesh-(1,1)", create_mesh(3, (1, 1)))):
        for sparse_label, sparse in (("sparse", None), ("dense", False)):
            step, (carry,) = _build_rod_bench_case(
                grid_size=grid, mesh=mesh, sparse_forcing=sparse
            )
            t = measure_op_time(
                lambda c: step(c)[0], carry, iters=5, repeats=3
            )
            key = f"{mesh_label} {sparse_label}"
            results[key] = t
            print(
                f"{key:<22s} {t * 1e3:8.2f} ms/step "
                f"({n_cells / t / 1e6:6.1f} Mcells/s)",
                flush=True,
            )
    d_meshless = results["meshless dense"] - results["meshless sparse"]
    d_mesh = results["mesh-(1,1) dense"] - results["mesh-(1,1) sparse"]
    print(
        f"\nsparse saves {d_meshless * 1e3:.2f} ms meshless and "
        f"{d_mesh * 1e3:.2f} ms on the (1,1) mesh "
        "(round 4 rejected rod windows under a mesh entirely - the whole "
        "sparse saving is new there)"
    )


if __name__ == "__main__":
    main()
