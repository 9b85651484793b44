"""Pod-ready driver: the fused flow-past-sphere FSI case over ALL devices.

The TPU analogue of the reference's cluster submission scripts
(/root/reference/doc/clusters/submit_expanse.sh runs
flow_past_sphere_case.py on 512 MPI ranks): one SPMD program, identical
on every host, launched by your pod orchestrator. The bootstrap is the
`MPI.Compute_dims` + `rank_distribution` analogue
(parallel/distributed.py): `initialize_distributed()` no-ops on a single
host and wires the JAX distributed runtime on a pod;
`auto_mesh` factors all devices slab-first over the shardable grid axes.

Smoke-run without hardware (8 virtual CPU devices):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python doc/tpu/pod_flow_past_sphere.py --grid-size-x 64 \\
        --nondim-time 0.2

Real pod (every host runs the same command):

    python doc/tpu/pod_flow_past_sphere.py --grid-size-x 512
"""

import argparse
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "examples",
        "3d",
    ),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--grid-size-x", type=int, default=256)
    parser.add_argument("--nondim-time", type=float, default=5.0)
    parser.add_argument("--window", type=int, default=100)
    parser.add_argument(
        "--overlap-chunks", type=int, default=None,
        help="comm/compute pipelining request of the sharded Poisson "
        "transposes (default: fft.DEFAULT_OVERLAP_CHUNKS; pass 1 for the "
        "unpipelined control arm of the SCALING.md overlap protocol)",
    )
    args = parser.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # some TPU plugins force-register themselves via sitecustomize and
        # override the env var; the config update after import wins
        jax.config.update("jax_platforms", "cpu")

    from sopht_mpi_tpu.parallel import auto_mesh, initialize_distributed
    from sopht_mpi_tpu.utils import logger

    initialize_distributed()  # single-host no-op; pod: JAX runtime up
    n = args.grid_size_x
    grid_size = (n, n, n)
    mesh = auto_mesh(3, grid_size)
    logger.info(
        f"devices: {jax.device_count()} "
        f"({jax.process_count()} hosts), mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))}, grid {grid_size}"
    )

    from flow_past_sphere import flow_past_sphere_fused_case

    times, cds = flow_past_sphere_fused_case(
        nondim_time=args.nondim_time,
        grid_size=grid_size,
        window=args.window,
        mesh=mesh,
        overlap_chunks=args.overlap_chunks,
    )
    if times:
        logger.info(f"done: t*={times[-1]:.2f} Cd={cds[-1]:.4f}")
    else:
        logger.warning("no scan windows ran (nondim_time <= 0?)")


if __name__ == "__main__":
    main()
