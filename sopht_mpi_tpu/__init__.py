"""sopht_mpi_tpu: TPU-native elastohydrodynamic solver.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the MPI solver
`fankiat/sopht-mpi` (incompressible Navier-Stokes in vorticity form on an
unbounded uniform 2D/3D grid, two-way coupled to Cosserat rods and rigid
bodies via a penalty immersed-boundary method).

Architecture (TPU-first, not a port):
- Fields are globally-shaped ``jax.Array`` s with ``NamedSharding`` over a
  ``jax.sharding.Mesh`` of TPU devices; there are no ghost cells and no
  explicit halo choreography - stencils are shifted-slice jnp ops that XLA's
  SPMD partitioner turns into ICI halo exchanges automatically, with Pallas
  kernels for the hot paths.
- The whole timestep (flow + IBM coupling + structural dynamics) is one
  jitted SPMD program.
- The distributed FFT Poisson solve uses per-axis local FFTs with
  ``lax.all_to_all`` pencil transposes under ``shard_map``.
- Lagrangian markers are replicated across devices (num markers << num grid
  cells); spreading is a masked scatter-add merged with ``psum``.

Reference capability map: see SURVEY.md at the repo root.
"""

from sopht_mpi_tpu import ops, parallel, utils, models

__version__ = "0.1.0"


def enable_fast_spectral(enable: bool = True) -> None:
    """Opt into the fast spectral-solve mode (both flags together):

    - ``parallel.pallas_fft.FAST_SPECTRAL_MATMULS``: 3-pass bf16 hi/lo
      matmuls in the fused conv kernel (solve rel err ~6.6e-6 vs the
      default 6-pass HIGHEST emulation's ~1e-7);
    - ``ops.poisson.USE_FUSED_SPECTRAL_CURL``: velocity-recovery curl
      mixed inside that kernel (numerically exact; a measured win only
      under the 3-pass matmuls).

    Measured at 256^3 FSI on one v5e chip: 40.6 -> 36.4 ms/step (~+11%);
    sphere-drag validation identical to ~3e-4 (Cd 1.3376 vs 1.3380).
    Call BEFORE building simulators/steps (the flags are read at trace
    time). The default path stays accuracy-parity with the reference's
    float32 FFTW."""
    from sopht_mpi_tpu.ops import poisson as _poisson
    from sopht_mpi_tpu.parallel import pallas_fft as _pf

    _pf.FAST_SPECTRAL_MATMULS = bool(enable)
    _poisson.USE_FUSED_SPECTRAL_CURL = bool(enable)
