"""Multi-host bootstrap and automatic process-grid factoring.

TPU-pod counterpart of the reference's ``MPIConstruct2D/3D`` startup logic
(/root/reference/sopht_mpi/utils/mpi_utils_3d.py:7-83): where the reference
calls ``MPI.Compute_dims(world_size, rank_distribution)`` to factor ranks
over the distributable grid axes and ``Create_cart`` to build the topology,
this module factors ``jax.device_count()`` over the shardable mesh axes
(z/y in 3D, y/x in 2D; x always stays FFT-aligned-local in 3D, matching
the reference's default ``rank_distribution=[0,...,0,1]``) and initialises
the JAX distributed runtime on pods.
"""

from __future__ import annotations

import os


# env hints that a multi-host JAX runtime is expected; mirrors what
# jax.distributed.initialize auto-detects (TPU pod metadata, coordinator
# address for manual clusters)
_DIST_ENV_HINTS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    # Cloud TPU VM runtime signals: jax.distributed auto-detects pod
    # topology via the metadata server, so the coordinator env vars above
    # are typically ABSENT on a plain `gcloud compute tpus tpu-vm` slice
    "TPU_WORKER_ID",
    "CLOUD_TPU_TASK_ID",
)


def initialize_distributed(**kwargs) -> bool:
    """Initialise the JAX distributed runtime when running multi-host.

    Safe to call unconditionally at the top of a driver script (the
    reference's scripts are likewise identical on every rank):

    - explicit kwargs (``coordinator_address=...``) -> always initialise;
    - a pod/cluster env hint present -> ``jax.distributed.initialize()``
      with auto-detection;
    - plain single-host run -> no-op.

    Returns whether the distributed runtime was (or already is) live.
    """
    import jax

    if getattr(jax.distributed, "is_initialized", None) and (
        jax.distributed.is_initialized()
    ):
        if kwargs:
            raise RuntimeError(
                "jax.distributed is already initialized; the explicit "
                f"configuration {sorted(kwargs)} cannot be applied"
            )
        return True
    if not kwargs and not any(
        os.environ.get(k) is not None for k in _DIST_ENV_HINTS
    ):
        return False
    if kwargs:
        jax.distributed.initialize(**kwargs)
        return True
    try:
        jax.distributed.initialize()
    except Exception as e:  # single-host TPU VM without pod metadata
        from sopht_mpi_tpu.utils import logger

        logger.warning(
            f"jax.distributed auto-initialization failed ({e!r}); "
            "continuing single-host"
        )
        return False
    return True


def compute_mesh_dims(
    grid_dim: int,
    n_devices: int,
    grid_size: tuple[int, ...] | None = None,
) -> tuple[int, int]:
    """Factor ``n_devices`` over the two shardable mesh axes.

    The reference's ``MPI.Compute_dims`` + even-divisibility check
    (mpi_utils_2d.py:47-58): prefer a slab on the leading axis (one ICI
    ring of halo traffic, and the layout every example defaults to), fall
    back to the most balanced pencil whose axes divide the grid (on a
    balance tie, more devices on the leading axis). Raises when no
    factorization divides the grid evenly.

    :param grid_size: optional global grid shape used for divisibility;
        without it the slab shape is returned directly.
    """
    if grid_dim not in (2, 3):
        raise ValueError(f"Invalid grid dim {grid_dim}")
    if n_devices < 1:
        raise ValueError("n_devices must be positive")
    if grid_size is None:
        return (n_devices, 1)
    # the two shardable grid axes: (z, y) in 3D, (y, x) in 2D
    s0, s1 = int(grid_size[0]), int(grid_size[1])
    candidates = []
    for a in range(n_devices, 0, -1):
        if n_devices % a:
            continue
        b = n_devices // a
        if s0 % a == 0 and s1 % b == 0:
            # rank by balance (the Compute_dims criterion), slab-first on tie
            candidates.append((abs(a - b), -a, (a, b)))
    if not candidates:
        raise RuntimeError(
            f"grid {grid_size[:2]} not evenly divisible over any "
            f"{n_devices}-device mesh factorization"
        )
    slab = (n_devices, 1)
    if any(c[2] == slab for c in candidates):
        return slab
    candidates.sort()
    return candidates[0][2]


def auto_mesh(grid_dim: int, grid_size: tuple[int, ...] | None = None,
              devices=None):
    """``create_mesh`` with the process grid factored automatically
    (slab-first, divisibility-aware) over all available devices."""
    import jax

    from sopht_mpi_tpu.parallel.mesh import create_mesh

    if devices is None:
        devices = jax.devices()
    shape = compute_mesh_dims(grid_dim, len(devices), grid_size)
    return create_mesh(grid_dim, shape, devices)
