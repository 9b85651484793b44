"""Sharded moving-window primitives for the sparse IBM forcing path.

The sparse-window FSI fast path (models/fsi.py) does all marker math on a
small ``(3, Wz, Wy, Wx)`` window tracking the body support. On a device
mesh the window work runs REPLICATED per chip (the reference's Lagrangian
posture - its structural solve runs on one rank and the per-rank marker
loops are O(markers) at any rank count,
/root/reference/sopht_mpi/numeric/immersed_boundary_ops/
VirtualBoundaryForcingMPI.py:333-429); only two touches of the sharded
grid remain, provided here:

- :func:`gather_window_replicated` - extract a window with a TRACED start
  from a sharded field as a replicated array. Each shard contributes its
  masked overlap and a ``psum`` over the mesh axes replicates the result
  (GSPMD would otherwise all-gather the WHOLE field for a dynamic-start
  slice of a sharded operand).
- :func:`add_window_into_field` - the adjoint placement: add a replicated
  window into a sharded field at a traced start, each shard adding only
  its masked overlap. No collective at all.

Masking uses clipped index gathers (`jnp.take` + `where`), so a window
partially (or not at all) overlapping a shard contributes exactly its
overlap - semantics identical to the meshless ``dynamic_slice`` /
``dynamic_update_slice`` pair for any in-domain window start.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from sopht_mpi_tpu.parallel.mesh import mesh_axis_names


def _masked_axis_gather(arr, axis: int, start, length: int):
    """``arr[start : start + length]`` along ``axis`` with out-of-range
    rows ZERO (not clamped) - ``start`` may be traced and out of range in
    either direction."""
    n = arr.shape[axis]
    idx = start + jnp.arange(length, dtype=jnp.int32)
    valid = (idx >= 0) & (idx < n)
    out = jnp.take(arr, jnp.clip(idx, 0, n - 1), axis=axis)
    mask_shape = [1] * out.ndim
    mask_shape[axis] = length
    return jnp.where(valid.reshape(mask_shape), out, jnp.zeros((), out.dtype))


def gather_window_replicated(field, start_xyz, wshape, mesh):
    """Extract ``field[:, sz:sz+Wz, sy:sy+Wy, sx:sx+Wx]`` (3D vector
    field, grid axes (z, y, x) sharded over mesh axes ("z", "y")) as a
    REPLICATED ``(c, Wz, Wy, Wx)`` array. ``start_xyz`` is a traced
    ``(3,)`` int array in MARKER component order (x, y, z), matching the
    sparse-path window starts in models/fsi.py; it must be within the
    domain (callers clip, as the meshless ``dynamic_slice`` path does)."""
    wz, wy, wx = (int(w) for w in wshape)
    az, ay = mesh_axis_names(3)[:2]

    def local(fld, start):
        nzl, nyl = fld.shape[1], fld.shape[2]
        z_off = lax.axis_index(az) * nzl
        y_off = lax.axis_index(ay) * nyl
        part = _masked_axis_gather(fld, 1, start[2] - z_off, wz)
        part = _masked_axis_gather(part, 2, start[1] - y_off, wy)
        part = _masked_axis_gather(part, 3, start[0], wx)
        return lax.psum(part, (az, ay))

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, az, ay, None), P()),
        out_specs=P(),
        check_vma=False,
    )(field, start_xyz)


def windowed_e2l_mm_sharded(field, axis_mats, start_xyz, wshape, dx, mesh):
    """Separable-matmul E->L interpolation against a (moving) window of a
    SHARDED field WITHOUT materializing the window: each shard contracts
    its overlap block of the field with correspondingly shifted (and
    drop-masked) A-matrix column blocks, and ONE ``psum`` of the
    ``(c, n_markers)`` result replaces the window-sized collective.

    Bytes per call: ``c * n_markers`` floats instead of the
    ``c * Wz * Wy * Wx`` window exchange - the 'shard-local window
    accumulation' of VERDICT r04 next #1(a); at 256^3 / 4.6k markers that
    is ~55 KB vs ~4.5 MB per touch. Exactness: every window cell belongs
    to exactly one shard; each shard's block covers its whole overlap
    (block start clipped so a min(W, local)-length block always contains
    it) and block cells outside the window get zero A-weight.

    ``axis_mats`` are the (n, W_axis) window-coordinate matrices from
    ``axis_delta_weight_matrices`` (replicated); ``start_xyz`` the traced
    (x, y, z) window start. Result matches
    ``eulerian_to_lagrangian_interpolation_mm`` on the gathered window up
    to float summation order."""
    from sopht_mpi_tpu.ops.ibm import eulerian_to_lagrangian_interpolation_mm

    wz, wy, wx = (int(w) for w in wshape)
    az_name, ay_name = mesh_axis_names(3)[:2]

    def local(fld, a_z, a_y, a_x, start):
        c, nzl, nyl, nxl = fld.shape
        z_off = lax.axis_index(az_name) * nzl
        y_off = lax.axis_index(ay_name) * nyl
        lz, ly, lx = min(wz, nzl), min(wy, nyl), min(wx, nxl)

        def block_start(w0, length, n_local):
            # local-coord block of static `length` covering the overlap
            # [max(0, w0), min(n_local, w0 + W)): start at the overlap's
            # first row, clipped so the block stays in bounds
            return jnp.clip(jnp.maximum(w0, 0), 0, n_local - length)

        sz = block_start(start[2] - z_off, lz, nzl)
        sy = block_start(start[1] - y_off, ly, nyl)
        sx = block_start(start[0], lx, nxl)
        zero = jnp.zeros((), sz.dtype)
        fblk = lax.dynamic_slice(fld, (zero, sz, sy, sx), (c, lz, ly, lx))
        azb = _masked_axis_gather(a_z, 1, sz + z_off - start[2], lz)
        ayb = _masked_axis_gather(a_y, 1, sy + y_off - start[1], ly)
        axb = _masked_axis_gather(a_x, 1, sx - start[0], lx)
        part = eulerian_to_lagrangian_interpolation_mm(
            fblk, (azb, ayb, axb), dx
        )
        return lax.psum(part, (az_name, ay_name))

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, az_name, ay_name, None), P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(field, *axis_mats, start_xyz)


def add_window_into_field(field, window, start_xyz, mesh):
    """Add a replicated ``(c, Wz, Wy, Wx)`` window into a sharded 3D
    vector ``field`` at traced start ``start_xyz`` ((x, y, z) component
    order). Each shard adds its masked overlap - no collective."""
    az, ay = mesh_axis_names(3)[:2]

    def local(fld, win, start):
        nzl, nyl, nxl = fld.shape[1], fld.shape[2], fld.shape[3]
        z_off = lax.axis_index(az) * nzl
        y_off = lax.axis_index(ay) * nyl
        part = _masked_axis_gather(win, 1, z_off - start[2], nzl)
        part = _masked_axis_gather(part, 2, y_off - start[1], nyl)
        part = _masked_axis_gather(part, 3, -start[0], nxl)
        return fld + part.astype(fld.dtype)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, az, ay, None), P(), P()),
        out_specs=P(None, az, ay, None),
        check_vma=False,
    )(field, window, start_xyz)
