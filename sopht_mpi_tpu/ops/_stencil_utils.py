"""Shared stencil machinery: axis slicing helpers and the ENO3 face flux.

These replace the reference's pystencils-JIT C kernels (generated in the
external ``sopht`` package, wrapped per-op under
/root/reference/sopht_mpi/numeric/eulerian_grid_ops/). Ops are written as
shifted-slice jnp expressions on globally-shaped arrays: XLA fuses the
elementwise chains and, for sharded arrays, its SPMD partitioner emits the
halo exchanges the reference performed with explicit Isend/Irecv ghost
communication.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def axslice(a, lo, hi, axis: int):
    """a[..., lo:hi, ...] along ``axis`` (static bounds; hi may be None)."""
    if hi is None:
        hi = a.shape[axis]
    elif hi < 0:
        hi = a.shape[axis] + hi
    if lo < 0:
        lo = a.shape[axis] + lo
    return lax.slice_in_dim(a, lo, hi, axis=axis)


def pad_axis(a, lo: int, hi: int, axis: int):
    """Zero-pad ``a`` along ``axis`` by (lo, hi)."""
    cfg = [(0, 0)] * a.ndim
    cfg[axis] = (lo, hi)
    return jnp.pad(a, cfg)


def pad_all(a, width: int, start_axis: int = 0):
    """Zero-pad all axes from ``start_axis`` on by ``width``."""
    cfg = [(0, 0)] * start_axis + [(width, width)] * (a.ndim - start_axis)
    return jnp.pad(a, cfg)


def laplacian_interior(field, ndim_offset: int = 0):
    """Discrete (undivided) Laplacian on the interior (shape shrinks by 2 on
    every grid axis). ``ndim_offset`` grid axes lead the array (e.g. a vector
    component axis)."""
    grid_axes = range(ndim_offset, field.ndim)
    center = field
    for ax in grid_axes:
        center = axslice(center, 1, -1, ax)
    out = -2.0 * len(list(grid_axes)) * center
    for ax in grid_axes:
        plus = field
        minus = field
        for ax2 in grid_axes:
            if ax2 == ax:
                plus = axslice(plus, 2, None, ax2)
                minus = axslice(minus, 0, -2, ax2)
            else:
                plus = axslice(plus, 1, -1, ax2)
                minus = axslice(minus, 1, -1, ax2)
        out = out + plus + minus
    return out


def central_diff_interior(field, axis: int, ndim_offset: int = 0):
    """Undivided central difference f[i+1]-f[i-1] along ``axis``, restricted
    to the interior of every grid axis (shape shrinks by 2 on each)."""
    plus = field
    minus = field
    for ax in range(ndim_offset, field.ndim):
        if ax == axis:
            plus = axslice(plus, 2, None, ax)
            minus = axslice(minus, 0, -2, ax)
        else:
            plus = axslice(plus, 1, -1, ax)
            minus = axslice(minus, 1, -1, ax)
    return plus - minus


def _eno3_left_biased(gm2, gm1, g0, gp1, gp2):
    """Left-biased (positive-wind) 3rd-order ENO face value at i+1/2.

    Standard ENO stencil selection (Shu 1997): start from cell i, extend to
    the side with the smaller undivided difference, then pick reconstruction
    coefficients for the chosen 3-cell stencil.
    """
    sixth = 1.0 / 6.0
    d1l = g0 - gm1
    d1r = gp1 - g0
    d2a = g0 - 2.0 * gm1 + gm2  # stencil {i-2, i-1, i}
    d2b = gp1 - 2.0 * g0 + gm1  # stencil {i-1, i, i+1}
    d2c = gp2 - 2.0 * gp1 + g0  # stencil {i, i+1, i+2}
    f_r2 = sixth * (2.0 * gm2 - 7.0 * gm1 + 11.0 * g0)
    f_r1 = sixth * (-gm1 + 5.0 * g0 + 2.0 * gp1)
    f_r0 = sixth * (2.0 * g0 + 5.0 * gp1 - gp2)
    take_left = jnp.abs(d1l) < jnp.abs(d1r)
    left_branch = jnp.where(jnp.abs(d2a) < jnp.abs(d2b), f_r2, f_r1)
    right_branch = jnp.where(jnp.abs(d2b) < jnp.abs(d2c), f_r1, f_r0)
    return jnp.where(take_left, left_branch, right_branch)


def eno3_divergence_interior(field, velocity_axis_component, axis: int):
    """Per-cell conservative ENO3 flux divergence along one axis:
    ``F_{i+1/2} - F_{i-1/2}`` (undivided), same shape as ``field``.

    Face fluxes use 3rd-order ENO reconstruction of the cell flux
    ``g = u * q``, upwinded by the face velocity ``0.5 (u_i + u_{i+1})``.
    The domain is zero-padded (matching the reference, whose never-exchanged
    ghost cells at physical walls hold zeros; see
    advection_flux_mpi_2d.py which applies no wall band-zeroing).
    """
    u = velocity_axis_component
    g = pad_axis(field * u, 3, 3, axis)
    up = pad_axis(u, 3, 3, axis)
    n = field.shape[axis]

    # faces j+1/2 for padded j in [2, n+2] (n+1 faces bracketing real cells)
    def cell(off):  # g at padded index (j + off) for j in [2, n+2]
        return axslice(g, 2 + off, 2 + off + n + 1, axis)

    u_face = 0.5 * (
        axslice(up, 2, 2 + n + 1, axis) + axslice(up, 3, 3 + n + 1, axis)
    )
    f_pos = _eno3_left_biased(cell(-2), cell(-1), cell(0), cell(1), cell(2))
    f_neg = _eno3_left_biased(cell(3), cell(2), cell(1), cell(0), cell(-1))
    f_face = jnp.where(u_face >= 0.0, f_pos, f_neg)
    return axslice(f_face, 1, None, axis) - axslice(f_face, 0, -1, axis)
