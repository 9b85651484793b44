"""Distributed real FFTs over a TPU device mesh.

TPU-native replacement for the reference's ``mpi4py-fft`` layer
(``FFTMPI2D/3D``, /root/reference/sopht_mpi/numeric/eulerian_grid_ops/
poisson_solver_2d/fft_mpi_2d.py, poisson_solver_3d/fft_mpi_3d.py), which
wraps FFTW with MPI all-to-all transposes. Here each device runs local
XLA FFTs along its unsharded axes and ``lax.all_to_all`` over the ICI
performs the pencil transposes, all inside ``shard_map`` so the whole
pipeline lives in one jitted SPMD program.

Layouts (see parallel/mesh.py for grid conventions):

2D real field (Ny, Nx) sharded P('y', 'x') with mesh ('y','x'), x axis size 1:
    rfft(x, local) -> pad x-freq to multiple of py -> all_to_all over 'y'
    (split x-freq, concat y) -> fft(y, local).
    Fourier layout: (Ny, Fxp) complex, sharded P(None, 'y').

3D real field (Nz, Ny, Nx) sharded P('z','y',None) with mesh ('z','y'):
    rfft(x, local) -> pad x-freq to multiple of py -> all_to_all over 'y' ->
    fft(y, local) -> all_to_all over 'z' (split y, concat z) -> fft(z, local).
    Fourier layout: (Nz, Ny, Fxp) complex, sharded P(None, 'z', 'y').

The x-frequency axis is zero-padded from ``Nx//2+1`` to the next multiple of
``py`` so the all_to_all split is even; padded columns stay exactly zero
through every (linear) stage and are sliced off on the way back.

Normalization follows the FFTW/numpy convention the reference relies on
(fft_mpi_2d.py:31-45): forward unnormalized, inverse normalized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _cpad(n: int, mult: int) -> int:
    """Round n up to a multiple of mult."""
    return ((n + mult - 1) // mult) * mult


def padded_rfft_size(nx: int, mesh: Mesh | None, grid_dim: int) -> int:
    """Global size of the (padded) x-frequency axis for a given mesh."""
    nxf = nx // 2 + 1
    if mesh is None:
        return nxf
    py = mesh.shape["y"]
    return _cpad(nxf, py)


def fourier_partition_spec(grid_dim: int) -> P:
    """PartitionSpec of the Fourier-domain layout.

    In 2D the (trivial, size-1) 'x' mesh axis is placed on the untouched Ny
    axis so every mesh axis is consumed by the shard_map output spec."""
    if grid_dim == 2:
        return P("x", "y")
    elif grid_dim == 3:
        return P(None, "z", "y")
    raise ValueError(f"Invalid grid dim {grid_dim}")


# ---------------------------------------------------------------------------
# 2D
# ---------------------------------------------------------------------------


def _rfft2_local(field, *, py: int, fxp: int):
    fhat = jnp.fft.rfft(field, axis=1)
    fhat = jnp.pad(fhat, ((0, 0), (0, fxp - fhat.shape[1])))
    if py > 1:
        fhat = lax.all_to_all(fhat, "y", split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(fhat, axis=0)


def _irfft2_local(fourier, *, py: int, nx: int):
    fhat = jnp.fft.ifft(fourier, axis=0)
    if py > 1:
        fhat = lax.all_to_all(fhat, "y", split_axis=0, concat_axis=1, tiled=True)
    fhat = fhat[:, : nx // 2 + 1]
    return jnp.fft.irfft(fhat, n=nx, axis=1)


# ---------------------------------------------------------------------------
# 3D
# ---------------------------------------------------------------------------


def _rfft3_local(field, *, pz: int, py: int, fxp: int):
    fhat = jnp.fft.rfft(field, axis=2)
    fhat = jnp.pad(fhat, ((0, 0), (0, 0), (0, fxp - fhat.shape[2])))
    if py > 1:
        fhat = lax.all_to_all(fhat, "y", split_axis=2, concat_axis=1, tiled=True)
    fhat = jnp.fft.fft(fhat, axis=1)
    if pz > 1:
        fhat = lax.all_to_all(fhat, "z", split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(fhat, axis=0)


def _irfft3_local(fourier, *, pz: int, py: int, nx: int):
    fhat = jnp.fft.ifft(fourier, axis=0)
    if pz > 1:
        fhat = lax.all_to_all(fhat, "z", split_axis=0, concat_axis=1, tiled=True)
    fhat = jnp.fft.ifft(fhat, axis=1)
    if py > 1:
        fhat = lax.all_to_all(fhat, "y", split_axis=1, concat_axis=2, tiled=True)
    fhat = fhat[:, :, : nx // 2 + 1]
    return jnp.fft.irfft(fhat, n=nx, axis=2)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def distributed_rfftn(field, mesh: Mesh | None):
    """Forward real FFT of a sharded grid field (unnormalized).

    Single-device (or meshless) path uses plain XLA ``rfftn``; multi-device
    path runs the pencil pipeline described in the module docstring.
    """
    grid_dim = field.ndim
    if mesh is None or mesh.size == 1:
        # rfftn with x treated as the innermost transform to match layouts
        out = jnp.fft.rfft(field, axis=grid_dim - 1)
        for ax in range(grid_dim - 2, -1, -1):
            out = jnp.fft.fft(out, axis=ax)
        return out

    spec = _grid_spec(grid_dim)
    fxp = padded_rfft_size(field.shape[-1], mesh, grid_dim)
    if grid_dim == 2:
        if mesh.shape["x"] > 1:
            # Parity with the reference 2D solver, which supports only slab
            # decomposition (UnboundedPoissonSolverMPI2D.py:180-186).
            raise NotImplementedError(
                "2D distributed FFT supports only slab (y-axis) sharding"
            )
        fn = functools.partial(_rfft2_local, py=mesh.shape["y"], fxp=fxp)
    else:
        fn = functools.partial(
            _rfft3_local, pz=mesh.shape["z"], py=mesh.shape["y"], fxp=fxp
        )
    return shard_map(
        fn, mesh=mesh, in_specs=spec, out_specs=fourier_partition_spec(grid_dim)
    )(field)


def distributed_irfftn(fourier, nx: int, mesh: Mesh | None):
    """Inverse of :func:`distributed_rfftn` (normalized). ``nx`` is the
    global size of the last (real) axis."""
    grid_dim = fourier.ndim
    if mesh is None or mesh.size == 1:
        out = fourier
        for ax in range(grid_dim - 2, -1, -1):
            out = jnp.fft.ifft(out, axis=ax)
        return jnp.fft.irfft(out[..., : nx // 2 + 1], n=nx, axis=grid_dim - 1)

    if grid_dim == 2:
        if mesh.shape["x"] > 1:
            raise NotImplementedError(
                "2D distributed FFT supports only slab (y-axis) sharding"
            )
        fn = functools.partial(_irfft2_local, py=mesh.shape["y"], nx=nx)
    else:
        fn = functools.partial(
            _irfft3_local, pz=mesh.shape["z"], py=mesh.shape["y"], nx=nx
        )
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=fourier_partition_spec(grid_dim),
        out_specs=_grid_spec(grid_dim),
    )(fourier)


def _grid_spec(grid_dim: int) -> P:
    if grid_dim == 2:
        return P("y", "x")
    return P("z", "y", None)
