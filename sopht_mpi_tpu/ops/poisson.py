"""Unbounded (free-space) Poisson solvers via Green's-function convolution.

TPU-native counterpart of the reference's
``UnboundedPoissonSolverMPI2D/3D`` (/root/reference/sopht_mpi/numeric/
eulerian_grid_ops/poisson_solver_2d/UnboundedPoissonSolverMPI2D.py,
poisson_solver_3d/UnboundedPoissonSolverMPI3D.py): Hockney-Eastwood domain
doubling + FFT convolution with the even-reflected free-space Green's
function. Solves ``-del^2(solution) = rhs`` on an unbounded domain.

Differences from the reference (deliberate, TPU-native):
- The bespoke ``MPIDomainDoublingCommunicator`` redistribution (2D :156-352,
  3D :190-382) disappears: doubling is ``jnp.pad`` on a sharded array and
  the truncation is a slice - XLA emits whatever data movement is needed.
- Distributed FFTs are the pencil ``all_to_all`` pipeline in
  parallel/fft.py instead of FFTW+MPI.
- The Fourier Green's function of the even-reflected kernel is real
  (even symmetry), so we store only its real part: the spectral multiply is
  complex*real - half the memory traffic of the reference's complex product
  (UnboundedPoissonSolverMPI2D.py:56-58).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sopht_mpi_tpu.parallel.fft import (
    distributed_irfftn,
    distributed_rfftn,
)


def _even_reflected_axis_dist(n_doubled: int, dx: float, axis_range: float, dtype):
    """Per-axis distance ``min(x, 2 L - x)`` on the doubled grid."""
    x = np.arange(n_doubled, dtype=np.float64) * dx
    return np.minimum(x, 2.0 * axis_range - x).astype(dtype)


class UnboundedPoissonSolver2D:
    """Free-space Poisson solver on a 2D (ny, nx) grid.

    Green's function ``-log(r)/(2 pi)`` with the reference's origin
    regularization ``-(2 log(dx/sqrt(pi)) - 1)/(4 pi)``
    (UnboundedPoissonSolverMPI2D.py:95-101).
    """

    grid_dim = 2

    def __init__(self, grid_size_y, grid_size_x, x_range=1.0,
                 real_t=jnp.float32, mesh=None):
        self.grid_size_y = grid_size_y
        self.grid_size_x = grid_size_x
        self.x_range = x_range
        self.y_range = x_range * (grid_size_y / grid_size_x)
        self.dx = float(x_range / grid_size_x)
        self.real_t = real_t
        self.mesh = mesh

        dy = _even_reflected_axis_dist(
            2 * grid_size_y, self.dx, self.y_range, np.float64
        )
        dxs = _even_reflected_axis_dist(
            2 * grid_size_x, self.dx, self.x_range, np.float64
        )
        r = np.sqrt(dy[:, None] ** 2 + dxs[None, :] ** 2)
        with np.errstate(divide="ignore"):
            greens = -np.log(r) / (2.0 * np.pi)
        greens[0, 0] = -(2.0 * np.log(self.dx / np.sqrt(np.pi)) - 1.0) / (
            4.0 * np.pi
        )
        self._init_fourier_greens(greens.astype(np.dtype(real_t)))

    def _init_fourier_greens(self, greens: np.ndarray):
        """Forward-transform the (real-spectrum) Green's function once,
        scaled by dx^dim (the convolution quadrature weight)."""
        from sopht_mpi_tpu.parallel.mesh import shard_scalar_field

        g = shard_scalar_field(jnp.asarray(greens), self.mesh)
        ghat = distributed_rfftn(g, self.mesh)
        scale = self.dx**self.grid_dim
        self.fourier_greens_times_dx_pow_dim = jnp.real(ghat) * scale

    def solve(self, rhs_field, greens=None):
        """Solve ``-del^2(solution) = rhs`` for an unbounded domain.

        Pure function of ``rhs_field`` (shape (ny, nx)); safe to call under
        jit and grad.

        :param greens: optional explicit Fourier Green's function
            (``self.fourier_greens_times_dx_pow_dim``). Pass it as a traced
            jit argument to keep the large array out of the compiled
            program's constants (it is ~(2N)^dim/2 floats).
        """
        if greens is None:
            greens = self.fourier_greens_times_dx_pow_dim
        ny, nx = self.grid_size_y, self.grid_size_x
        doubled = jnp.pad(rhs_field, ((0, ny), (0, nx)))
        fhat = distributed_rfftn(doubled, self.mesh)
        fhat = fhat * greens
        sol = distributed_irfftn(fhat, nx=2 * nx, mesh=self.mesh)
        return sol[:ny, :nx]


class UnboundedPoissonSolver3D:
    """Free-space Poisson solver on a 3D (nz, ny, nx) grid.

    Green's function ``1/(4 pi r)`` with origin regularization
    ``1/(4 pi dx)`` (UnboundedPoissonSolverMPI3D.py:101-118).
    """

    grid_dim = 3

    def __init__(self, grid_size_z, grid_size_y, grid_size_x, x_range=1.0,
                 real_t=jnp.float32, mesh=None):
        self.grid_size_z = grid_size_z
        self.grid_size_y = grid_size_y
        self.grid_size_x = grid_size_x
        self.x_range = x_range
        self.y_range = x_range * (grid_size_y / grid_size_x)
        self.z_range = x_range * (grid_size_z / grid_size_x)
        self.dx = float(x_range / grid_size_x)
        self.real_t = real_t
        self.mesh = mesh

        dz = _even_reflected_axis_dist(
            2 * grid_size_z, self.dx, self.z_range, np.float64
        )
        dy = _even_reflected_axis_dist(
            2 * grid_size_y, self.dx, self.y_range, np.float64
        )
        dxs = _even_reflected_axis_dist(
            2 * grid_size_x, self.dx, self.x_range, np.float64
        )
        r = np.sqrt(
            dz[:, None, None] ** 2 + dy[None, :, None] ** 2
            + dxs[None, None, :] ** 2
        )
        with np.errstate(divide="ignore"):
            greens = 1.0 / (4.0 * np.pi * r)
        greens[0, 0, 0] = 1.0 / (4.0 * np.pi * self.dx)
        UnboundedPoissonSolver2D._init_fourier_greens(
            self, greens.astype(np.dtype(real_t))
        )

    def solve(self, rhs_field, greens=None):
        """Solve ``-del^2(solution) = rhs`` (shape (nz, ny, nx)).

        :param greens: optional explicit Fourier Green's function; see
            :meth:`UnboundedPoissonSolver2D.solve`.
        """
        if greens is None:
            greens = self.fourier_greens_times_dx_pow_dim
        nz, ny, nx = self.grid_size_z, self.grid_size_y, self.grid_size_x
        doubled = jnp.pad(rhs_field, ((0, nz), (0, ny), (0, nx)))
        fhat = distributed_rfftn(doubled, self.mesh)
        fhat = fhat * greens
        sol = distributed_irfftn(fhat, nx=2 * nx, mesh=self.mesh)
        return sol[:nz, :ny, :nx]

    def vector_field_solve(self, rhs_vector_field, greens=None):
        """Component-wise solve for a (3, nz, ny, nx) vector field
        (UnboundedPoissonSolverMPI3D.py:169-187)."""
        return jnp.stack(
            [self.solve(rhs_vector_field[c], greens) for c in range(3)]
        )
