"""Pallas TPU kernels for the hot 3D Navier-Stokes stencils.

The jnp shifted-slice stencils (stencils_3d.py) are correct and fuse well
under XLA, but at 256^3 each pass still runs at ~85-100 GB/s because XLA
materializes shifted copies. These Pallas kernels stream the fields one
z-plane per grid step with the z-neighbors mapped as overlapping block
views, computing each output plane from VMEM-resident planes:

- ``diffusion_timestep_vector_3d_pallas``  (= stencils_3d.diffusion_timestep_vector_3d)
- ``curl_3d_pallas``                        (= stencils_3d.curl_3d)
- ``rotational_curl_add_3d_pallas``         (= vorticity + prefac*curl(u x w),
  fusing the cross product into the curl pass - the rotational-form
  transport of flow_simulators_mpi_3d.py:395-413)

Exact-parity contracts with the jnp ops (same wall-ring semantics):
diffusion leaves the width-1 ring unchanged; curl zeroes the ring; the
rotational update leaves the vorticity ring unchanged.

All kernels fall back to the jnp ops when the per-plane working set would
not fit VMEM or when not running on TPU (``interpret=True`` used in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sopht_mpi_tpu.ops import stencils_3d as _jnp_ops

# per-plane VMEM working set cap: inputs (<=7 vector planes) + output
_VMEM_BYTES_CAP = 10 * 1024 * 1024


def _plane_fits(shape, n_vector_planes: int) -> bool:
    ny, nx = shape[-2], shape[-1]
    return 3 * ny * nx * 4 * (n_vector_planes + 1) <= _VMEM_BYTES_CAP


def _ring_mask(ny, nx, dtype):
    """(ny, nx) mask: 1 in the in-plane interior, 0 on the edge ring."""
    row = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    interior = (
        (row > 0) & (row < ny - 1) & (col > 0) & (col < nx - 1)
    )
    return interior.astype(dtype)


def _inplane_dy(p):
    """Centered difference along y (axis -2) of a (3, ny, nx) plane,
    zero on the y edges."""
    ny = p.shape[-2]
    interior = p[:, 2:, :] - p[:, :-2, :]
    return jnp.pad(interior, ((0, 0), (1, 1), (0, 0)))


def _inplane_dx(p):
    nx = p.shape[-1]
    interior = p[:, :, 2:] - p[:, :, :-2]
    return jnp.pad(interior, ((0, 0), (0, 0), (1, 1)))


# ---------------------------------------------------------------------------
# diffusion
# ---------------------------------------------------------------------------


def _diffusion_kernel(prefac_ref, f_zm, f_c, f_zp, out_ref):
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    c = f_c[:, 0]  # (3, ny, nx)
    ny, nx = c.shape[-2], c.shape[-1]
    p = prefac_ref[0, 0]

    lap = (
        f_zm[:, 0]
        + f_zp[:, 0]
        - 6.0 * c
        + jnp.pad(c[:, 2:, :] + c[:, :-2, :], ((0, 0), (1, 1), (0, 0)))
        + jnp.pad(c[:, :, 2:] + c[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    )
    # neighbor terms lost to the zero-padding only affect the wall ring,
    # which the mask zeroes anyway (flux = 0 on the ring)
    mask = _ring_mask(ny, nx, c.dtype)
    on_z_wall = jnp.logical_or(i == 0, i == nz - 1)
    flux = jnp.where(on_z_wall, 0.0, 1.0) * p * mask * lap
    out_ref[:, 0] = c + flux


def _diffusion_timestep_vector_3d_impl(vector_field, nu_dt_by_dx2, interpret):
    """Pallas version of ``diffusion_timestep_vector_3d`` (exact parity)."""
    _, nz, ny, nx = vector_field.shape
    if not _plane_fits(vector_field.shape, 3):
        yt = _pick_stencil_ytiles(
            vector_field.shape, 3, vector_field.dtype.itemsize
        )
        if yt is not None:
            return _diffusion_tiled(vector_field, nu_dt_by_dx2, yt, interpret)
        return _jnp_ops.diffusion_timestep_vector_3d(vector_field, nu_dt_by_dx2)
    prefac = jnp.asarray(nu_dt_by_dx2, vector_field.dtype).reshape(1, 1)
    plane = lambda off: pl.BlockSpec(
        (3, 1, ny, nx),
        lambda i: (0, jnp.clip(i + off, 0, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _diffusion_kernel,
        grid=(nz,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane(-1),
            plane(0),
            plane(+1),
        ],
        out_specs=pl.BlockSpec(
            (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(vector_field.shape, vector_field.dtype),
        interpret=interpret,
    )(prefac, vector_field, vector_field, vector_field)


# ---------------------------------------------------------------------------
# curl (and fused rotational transport)
# ---------------------------------------------------------------------------


def _curl_planes(q_zm, q_c, q_zp, prefac):
    """prefac * curl of a vector plane stack; zero on the in-plane ring.
    Components (x, y, z) over in-plane axes (y = -2, x = -1)."""
    dq_dy = _inplane_dy(q_c)
    dq_dx = _inplane_dx(q_c)
    dq_dz = q_zp - q_zm
    curl_x = dq_dy[2] - dq_dz[1]
    curl_y = dq_dz[0] - dq_dx[2]
    curl_z = dq_dx[1] - dq_dy[0]
    ny, nx = q_c.shape[-2], q_c.shape[-1]
    mask = _ring_mask(ny, nx, q_c.dtype)
    return prefac * mask * jnp.stack([curl_x, curl_y, curl_z])


def _curl_kernel(with_l1max, prefac_ref, add_ref, f_zm, f_c, f_zp, *out_refs):
    if with_l1max:
        out_ref, max_ref = out_refs
    else:
        (out_ref,) = out_refs
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    p = prefac_ref[0, 0]
    curl = _curl_planes(f_zm[:, 0], f_c[:, 0], f_zp[:, 0], p)
    on_z_wall = jnp.logical_or(i == 0, i == nz - 1)
    # SMEM permits only scalar loads; add each component's scalar directly
    w = jnp.where(on_z_wall, 0.0, 1.0)
    comps = []
    for c in range(3):
        o = w * curl[c] + add_ref[c, 0]
        out_ref[c, 0] = o
        comps.append(o)
    if with_l1max:
        # per-plane max of |u|_1: the CFL reduction rides out of this pass
        # so the next step's dt control costs no extra velocity read.
        # Output blocks must be (8,128)-tiled: 8 planes share one (8, 1)
        # block, each grid step storing its row via a dynamic sublane
        # slice.
        m = jnp.max(jnp.abs(comps[0]) + jnp.abs(comps[1])
                    + jnp.abs(comps[2]))
        max_ref[pl.dslice(i % 8, 1), :] = m.reshape(1, 1)


def _curl_3d_impl(field, prefactor, add_vector, interpret, compute_l1_max):
    """Pallas version of ``curl_3d`` (exact parity incl. zeroed ring).

    ``add_vector`` (3,) is an optional per-component constant added to every
    cell of the result - folding the free-stream update
    (flow_simulators_mpi_3d.py velocity += U_inf) into this pass saves a
    full read+write of the velocity field.

    ``compute_l1_max=True`` additionally returns the global
    ``max(|u_x|+|u_y|+|u_z|)`` of the result (the CFL control quantity),
    reduced per plane inside the kernel - and returns ``(field, l1_max)``.
    """
    _, nz, ny, nx = field.shape
    if not _plane_fits(field.shape, 3):
        yt = _pick_stencil_ytiles(field.shape, 3, field.dtype.itemsize)
        if yt is not None:
            if add_vector is None:
                add_vector = jnp.zeros(3, field.dtype)
            return _curl_tiled(
                field, prefactor, add_vector, yt, interpret, compute_l1_max
            )
        out = _jnp_ops.curl_3d(field, prefactor)
        if add_vector is not None:
            out = out + add_vector[:, None, None, None]
        if compute_l1_max:
            return out, jnp.max(jnp.sum(jnp.abs(out), axis=0))
        return out
    prefac = jnp.asarray(prefactor, field.dtype).reshape(1, 1)
    if add_vector is None:
        add_vector = jnp.zeros(3, field.dtype)
    add = jnp.asarray(add_vector, field.dtype).reshape(3, 1)
    plane = lambda off: pl.BlockSpec(
        (3, 1, ny, nx),
        lambda i: (0, jnp.clip(i + off, 0, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [
        pl.BlockSpec(
            (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        )
    ]
    out_shape = [jax.ShapeDtypeStruct(field.shape, field.dtype)]
    if compute_l1_max:
        out_specs.append(
            pl.BlockSpec((8, 1), lambda i: (i // 8, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nz, 1), field.dtype))
    res = pl.pallas_call(
        functools.partial(_curl_kernel, compute_l1_max),
        grid=(nz,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane(-1),
            plane(0),
            plane(+1),
        ],
        out_specs=out_specs if compute_l1_max else out_specs[0],
        out_shape=out_shape if compute_l1_max else out_shape[0],
        interpret=interpret,
    )(prefac, add, field, field, field)
    if compute_l1_max:
        velocity, plane_max = res
        return velocity, jnp.max(plane_max)
    return res


def _rotational_kernel(prefac_ref, w_zm, w_c, w_zp, u_zm, u_c, u_zp, out_ref):
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    p = prefac_ref[0, 0]

    def cross(u, w):
        return jnp.stack(
            [
                u[1] * w[2] - u[2] * w[1],
                u[2] * w[0] - u[0] * w[2],
                u[0] * w[1] - u[1] * w[0],
            ]
        )

    q_zm = cross(u_zm[:, 0], w_zm[:, 0])
    q_c = cross(u_c[:, 0], w_c[:, 0])
    q_zp = cross(u_zp[:, 0], w_zp[:, 0])
    curl = _curl_planes(q_zm, q_c, q_zp, p)
    on_z_wall = jnp.logical_or(i == 0, i == nz - 1)
    out_ref[:, 0] = w_c[:, 0] + jnp.where(on_z_wall, 0.0, 1.0) * curl


def _rotational_curl_add_3d_impl(vorticity, velocity, prefactor, interpret):
    """Fused rotational-form transport: ``w + prefac * curl(u x w)``
    (= ``update_vorticity_from_velocity_forcing_3d(w, cross_product_3d(u, w),
    prefac)``) in one streaming pass."""
    _, nz, ny, nx = vorticity.shape
    if not _plane_fits(vorticity.shape, 6):
        yt = _pick_stencil_ytiles(
            vorticity.shape, 6, vorticity.dtype.itemsize
        )
        if yt is not None:
            return _rotational_tiled(
                vorticity, velocity, prefactor, yt, interpret
            )
        from sopht_mpi_tpu.ops.elementwise import cross_product_3d

        q = cross_product_3d(velocity, vorticity)
        return _jnp_ops.update_vorticity_from_velocity_forcing_3d(
            vorticity, q, prefactor
        )
    prefac = jnp.asarray(prefactor, vorticity.dtype).reshape(1, 1)
    plane = lambda off: pl.BlockSpec(
        (3, 1, ny, nx),
        lambda i: (0, jnp.clip(i + off, 0, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        _rotational_kernel,
        grid=(nz,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        ]
        + [plane(o) for o in (-1, 0, 1)] * 2,
        out_specs=pl.BlockSpec(
            (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(vorticity.shape, vorticity.dtype),
        interpret=interpret,
    )(prefac, vorticity, vorticity, vorticity, velocity, velocity, velocity)


# ---------------------------------------------------------------------------
# y-tiled variants (512^2-plane support)
#
# At 512^2 planes the whole-plane working sets above exceed scoped VMEM
# (_plane_fits fails) and round 1-3 fell back to the jnp ops - the 31%
# per-cell 512^3 regression of VERDICT r03. Block index maps move in
# units of the block shape, so a +-1-row halo cannot ride the y-tile
# block itself; instead each kernel takes two extra 8-ROW STRIP inputs
# whose index maps address the neighboring y-tile's edge rows at
# 8-sublane block granularity (rows % 8 == 0). The strips cost
# 2*8/rows extra reads (~6% at rows=128) vs the 3x z-neighbor reads the
# whole-plane kernels already pay. Wall semantics stay exact: the ring
# masks take GLOBAL row indices (j * rows + r), so the garbage rows a
# clipped strip would contribute at the physical wall are zeroed exactly
# where the whole-plane kernels zero them.
# ---------------------------------------------------------------------------

# explicit double-buffered VMEM budget for the y-tiled stencil kernels
# (strips excluded: <2% of the tile bytes at the sizes that tile)
_STENCIL_TILED_BUDGET = 12 * 1024 * 1024


def _pick_stencil_ytiles(shape, n_tile_inputs: int, itemsize: int = 4):
    """Smallest y-tile count whose (n_tile_inputs + 1 out, double-buffered)
    working set fits scoped VMEM with >= 16 rows per 8-aligned tile;
    None -> jnp fallback. nyt == 1 never returned (the whole-plane kernels
    already cover it without strip reads)."""
    _, nz, ny, nx = shape
    for yt in (2, 4, 8, 16, 32):
        if ny % yt:
            continue
        rows = ny // yt
        if rows < 16 or rows % 8:
            break
        if (2 * (n_tile_inputs + 1) * 3 * rows * nx * itemsize
                <= _STENCIL_TILED_BUDGET):
            return yt
    return None


def _tiled_ring_mask(rows, nx, j, ny, dtype):
    """(rows, nx) in-plane interior mask of y-tile ``j`` in GLOBAL row
    coordinates (the _ring_mask of the whole plane, restricted to the
    tile)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0) + j * rows
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 1)
    interior = (row > 0) & (row < ny - 1) & (col > 0) & (col < nx - 1)
    return interior.astype(dtype)


def _ext_rows(center, up, dn):
    """(3, rows, nx) tile extended with its two y-halo rows from the 8-row
    neighbor strips -> (3, rows + 2, nx)."""
    return jnp.concatenate([up[:, -1:, :], center, dn[:, :1, :]], axis=1)


def _ytile_specs(nz, ny, nx, rows):
    """(tile(off), strip_up, strip_dn) BlockSpec builders for grid
    (nz, ny // rows): ``tile(off)`` is the (3, 1, rows, nx) y-tile at
    z-plane i+off (clipped), the strips are the 8-row edge blocks of the
    y-neighbor tiles at the CENTER z-plane (clipped at the global walls -
    the global-row ring mask zeroes the rows those duplicates feed)."""
    nyb8 = ny // 8
    r8 = rows // 8
    tile = lambda off: pl.BlockSpec(
        (3, 1, rows, nx),
        lambda i, j, off=off: (0, jnp.clip(i + off, 0, nz - 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    strip_up = pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j: (0, i, jnp.clip(j * r8 - 1, 0, nyb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    strip_dn = pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j: (0, i, jnp.clip((j + 1) * r8, 0, nyb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    return tile, strip_up, strip_dn


def _diffusion_tiled_kernel(ny, prefac_ref, f_zm, f_c, f_zp, f_up, f_dn,
                            out_ref):
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    j = pl.program_id(1)
    c = f_c[:, 0]
    rows, nx = c.shape[-2], c.shape[-1]
    p = prefac_ref[0, 0]
    ext = _ext_rows(c, f_up[:, 0], f_dn[:, 0])
    # y-neighbor pair grouped first: bit-identical to the whole-plane
    # kernel's jnp.pad(c[2:] + c[:-2]) association
    lap = (
        f_zm[:, 0]
        + f_zp[:, 0]
        - 6.0 * c
        + (ext[:, 2:, :] + ext[:, :-2, :])
        + jnp.pad(c[:, :, 2:] + c[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    )
    mask = _tiled_ring_mask(rows, nx, j, ny, c.dtype)
    on_z_wall = jnp.logical_or(i == 0, i == nz - 1)
    out_ref[:, 0] = c + jnp.where(on_z_wall, 0.0, 1.0) * p * mask * lap


def _diffusion_tiled(vector_field, nu_dt_by_dx2, yt, interpret):
    _, nz, ny, nx = vector_field.shape
    rows = ny // yt
    prefac = jnp.asarray(nu_dt_by_dx2, vector_field.dtype).reshape(1, 1)
    tile, s_up, s_dn = _ytile_specs(nz, ny, nx, rows)
    f = vector_field
    return pl.pallas_call(
        functools.partial(_diffusion_tiled_kernel, ny),
        grid=(nz, yt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            tile(-1), tile(0), tile(+1), s_up, s_dn,
        ],
        out_specs=pl.BlockSpec(
            (3, 1, rows, nx), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        interpret=interpret,
    )(prefac, f, f, f, f, f)


def _curl_tiled_kernel(ny, with_l1max, prefac_ref, add_ref, f_zm, f_c, f_zp,
                       f_up, f_dn, *out_refs):
    if with_l1max:
        out_ref, max_ref = out_refs
    else:
        (out_ref,) = out_refs
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    j = pl.program_id(1)
    nyt = pl.num_programs(1)
    p = prefac_ref[0, 0]
    c = f_c[:, 0]
    rows, nx = c.shape[-2], c.shape[-1]
    ext = _ext_rows(c, f_up[:, 0], f_dn[:, 0])
    dq_dy = ext[:, 2:, :] - ext[:, :-2, :]
    dq_dx = _inplane_dx(c)
    dq_dz = f_zp[:, 0] - f_zm[:, 0]
    mask = _tiled_ring_mask(rows, nx, j, ny, c.dtype)
    curl = p * mask * jnp.stack(
        [dq_dy[2] - dq_dz[1], dq_dz[0] - dq_dx[2], dq_dx[1] - dq_dy[0]]
    )
    on_z_wall = jnp.logical_or(i == 0, i == nz - 1)
    w = jnp.where(on_z_wall, 0.0, 1.0)
    comps = []
    for comp in range(3):
        o = w * curl[comp] + add_ref[comp, 0]
        out_ref[comp, 0] = o
        comps.append(o)
    if with_l1max:
        # (nz, nyt) per-(plane, tile) maxima; rows of 8 planes share one
        # (8, nyt) block. The block persists across the j sweep (same
        # block index), so lane j accumulates via read-modify-write with
        # a j == 0 reset (|u|_1 >= 0, so zeros never win the final max).
        m = jnp.max(
            jnp.abs(comps[0]) + jnp.abs(comps[1]) + jnp.abs(comps[2])
        )
        prev = max_ref[pl.dslice(i % 8, 1), :]
        base = jnp.where(j == 0, jnp.zeros_like(prev), prev)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nyt), 1)
        max_ref[pl.dslice(i % 8, 1), :] = jnp.where(lane == j, m, base)


def _curl_tiled(field, prefactor, add_vector, yt, interpret, compute_l1_max):
    _, nz, ny, nx = field.shape
    rows = ny // yt
    prefac = jnp.asarray(prefactor, field.dtype).reshape(1, 1)
    add = jnp.asarray(add_vector, field.dtype).reshape(3, 1)
    tile, s_up, s_dn = _ytile_specs(nz, ny, nx, rows)
    out_specs = [
        pl.BlockSpec(
            (3, 1, rows, nx), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    out_shape = [jax.ShapeDtypeStruct(field.shape, field.dtype)]
    if compute_l1_max:
        out_specs.append(
            pl.BlockSpec((8, yt), lambda i, j: (i // 8, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((nz, yt), field.dtype))
    res = pl.pallas_call(
        functools.partial(_curl_tiled_kernel, ny, compute_l1_max),
        grid=(nz, yt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            tile(-1), tile(0), tile(+1), s_up, s_dn,
        ],
        out_specs=out_specs if compute_l1_max else out_specs[0],
        out_shape=out_shape if compute_l1_max else out_shape[0],
        interpret=interpret,
    )(prefac, add, field, field, field, field, field)
    if compute_l1_max:
        velocity, tile_max = res
        return velocity, jnp.max(tile_max)
    return res


def _rotational_tiled_kernel(ny, prefac_ref, w_zm, w_c, w_zp, u_zm, u_c,
                             u_zp, w_up, w_dn, u_up, u_dn, out_ref):
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    j = pl.program_id(1)
    p = prefac_ref[0, 0]

    def cross(u, w):
        return jnp.stack(
            [
                u[1] * w[2] - u[2] * w[1],
                u[2] * w[0] - u[0] * w[2],
                u[0] * w[1] - u[1] * w[0],
            ]
        )

    wc = w_c[:, 0]
    rows, nx = wc.shape[-2], wc.shape[-1]
    # q = u x w on the y-extended center plane (halo rows included), and
    # on the center rows of the z-neighbors
    q_ext = cross(
        _ext_rows(u_c[:, 0], u_up[:, 0], u_dn[:, 0]),
        _ext_rows(wc, w_up[:, 0], w_dn[:, 0]),
    )
    q_zm = cross(u_zm[:, 0], w_zm[:, 0])
    q_zp = cross(u_zp[:, 0], w_zp[:, 0])
    # center-plane q recomputed from the unsliced tiles rather than sliced
    # out of q_ext: a sublane-offset slice feeding the lane-pad concat in
    # _inplane_dx trips Mosaic ("offset mismatch on non-concat dimension")
    q_c = cross(u_c[:, 0], wc)
    dq_dy = q_ext[:, 2:, :] - q_ext[:, :-2, :]
    dq_dx = _inplane_dx(q_c)
    dq_dz = q_zp - q_zm
    mask = _tiled_ring_mask(rows, nx, j, ny, wc.dtype)
    curl = p * mask * jnp.stack(
        [dq_dy[2] - dq_dz[1], dq_dz[0] - dq_dx[2], dq_dx[1] - dq_dy[0]]
    )
    on_z_wall = jnp.logical_or(i == 0, i == nz - 1)
    out_ref[:, 0] = wc + jnp.where(on_z_wall, 0.0, 1.0) * curl


def _rotational_tiled(vorticity, velocity, prefactor, yt, interpret):
    _, nz, ny, nx = vorticity.shape
    rows = ny // yt
    prefac = jnp.asarray(prefactor, vorticity.dtype).reshape(1, 1)
    tile, s_up, s_dn = _ytile_specs(nz, ny, nx, rows)
    w, u = vorticity, velocity
    return pl.pallas_call(
        functools.partial(_rotational_tiled_kernel, ny),
        grid=(nz, yt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        + [tile(o) for o in (-1, 0, 1)] * 2
        + [s_up, s_dn, s_up, s_dn],
        out_specs=pl.BlockSpec(
            (3, 1, rows, nx), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
        interpret=interpret,
    )(prefac, w, w, w, u, u, u, w, w, u, u)


# ---------------------------------------------------------------------------
# reverse-mode rules
#
# The streaming kernels match their jnp counterparts exactly (parity
# tests), so each public entry point is a jax.custom_vjp whose primal is
# the Pallas kernel and whose backward pass is the VJP of the identical
# jnp formulation - jax.grad flows through the TPU production step.
# ---------------------------------------------------------------------------


_diffusion_vjp = jax.custom_vjp(
    _diffusion_timestep_vector_3d_impl, nondiff_argnums=(2,)
)


def _diffusion_fwd(v, p, interpret):
    return _diffusion_timestep_vector_3d_impl(v, p, interpret), (v, p)


def _diffusion_bwd(interpret, res, ct):
    v, p = res
    _, vjp = jax.vjp(_jnp_ops.diffusion_timestep_vector_3d, v, p)
    return vjp(ct)


_diffusion_vjp.defvjp(_diffusion_fwd, _diffusion_bwd)


def diffusion_timestep_vector_3d_pallas(vector_field, nu_dt_by_dx2, *, interpret=None):
    """Pallas ``diffusion_timestep_vector_3d`` (exact parity), with a VJP
    via the jnp formulation. ``interpret=None`` auto-selects interpret mode
    off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _diffusion_vjp(vector_field, nu_dt_by_dx2, interpret)


def _curl_ref(field, prefactor, add_vector, compute_l1_max):
    out = _jnp_ops.curl_3d(field, prefactor)
    out = out + add_vector[:, None, None, None]
    if compute_l1_max:
        return out, jnp.max(jnp.sum(jnp.abs(out), axis=0))
    return out


_curl_vjp = jax.custom_vjp(_curl_3d_impl, nondiff_argnums=(3, 4))


def _curl_fwd(field, prefactor, add_vector, interpret, compute_l1_max):
    return (
        _curl_3d_impl(field, prefactor, add_vector, interpret, compute_l1_max),
        (field, prefactor, add_vector),
    )


def _curl_bwd(interpret, compute_l1_max, res, ct):
    field, prefactor, add_vector = res
    _, vjp = jax.vjp(
        lambda f, p, a: _curl_ref(f, p, a, compute_l1_max),
        field, prefactor, add_vector,
    )
    return vjp(ct)


_curl_vjp.defvjp(_curl_fwd, _curl_bwd)


def curl_3d_pallas(field, prefactor, add_vector=None, *, interpret=None,
                   compute_l1_max=False):
    """Pallas ``curl_3d`` with optional fused free-stream add and in-kernel
    CFL ``max|u|_1`` reduction (exact parity), with a VJP via the jnp
    formulation. See ``_curl_3d_impl`` for the kernel details."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if add_vector is None:
        add_vector = jnp.zeros(3, field.dtype)
    return _curl_vjp(field, prefactor, add_vector, interpret, compute_l1_max)


def _rotational_ref(w, u, p):
    from sopht_mpi_tpu.ops.elementwise import cross_product_3d

    return _jnp_ops.update_vorticity_from_velocity_forcing_3d(
        w, cross_product_3d(u, w), p
    )


_rotational_vjp = jax.custom_vjp(
    _rotational_curl_add_3d_impl, nondiff_argnums=(3,)
)


def _rotational_fwd(w, u, p, interpret):
    return _rotational_curl_add_3d_impl(w, u, p, interpret), (w, u, p)


def _rotational_bwd(interpret, res, ct):
    w, u, p = res
    _, vjp = jax.vjp(_rotational_ref, w, u, p)
    return vjp(ct)


_rotational_vjp.defvjp(_rotational_fwd, _rotational_bwd)


def rotational_curl_add_3d_pallas(
    vorticity, velocity, prefactor, *, interpret=None
):
    """Fused rotational-form transport ``w + prefac * curl(u x w)`` (exact
    parity with the jnp composition), with a VJP via that composition."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _rotational_vjp(vorticity, velocity, prefactor, interpret)


# ---------------------------------------------------------------------------
# Laplacian (vorticity-stabilisation) filter
# (= stencils_3d.laplacian_filter_vector_3d; reference
# laplacian_filter_mpi_3d.py:14-421). The jnp path runs 3 shifted-slice
# passes per directional high-pass; these kernels stream one z-plane per
# grid step and apply a whole filter application (multiplicative
# H_z H_y H_x with the per-pass wall clearing, or a k-fold directional
# pass) with exactly one HBM read + write of the field.
# ---------------------------------------------------------------------------


def _hp_x(p):
    """0.25 (2f - f[x+1] - f[x-1]) interior in x, zero at the x edges, of a
    (3, ny, nx) plane stack."""
    inner = 0.25 * (2.0 * p[:, :, 1:-1] - p[:, :, 2:] - p[:, :, :-2])
    return jnp.pad(inner, ((0, 0), (0, 0), (1, 1)))


def _hp_y(p):
    inner = 0.25 * (2.0 * p[:, 1:-1, :] - p[:, 2:, :] - p[:, :-2, :])
    return jnp.pad(inner, ((0, 0), (1, 1), (0, 0)))


def _notwall(j, nz, dtype):
    """1 if unclipped plane index j is strictly interior, else 0 (the
    reference's per-pass clearing zeroes the z-wall planes; out-of-range
    clipped loads are zeroed by the same flag)."""
    return jnp.where((j <= 0) | (j >= nz - 1), 0.0, 1.0).astype(dtype)


def _mult_filter_kernel(with_subtract, *refs):
    if with_subtract:
        f_zm, f_c, f_zp, orig, out_ref = refs
    else:
        f_zm, f_c, f_zp, out_ref = refs
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    c = f_c[:, 0]
    ny, nx = c.shape[-2], c.shape[-1]
    mask = _ring_mask(ny, nx, c.dtype)

    def t(p, j):
        # clear(Hy(clear(Hx(p)))): in-plane ring zero + z-wall plane zero
        q = mask * _hp_x(p)
        q = mask * _hp_y(q)
        return _notwall(j, nz, c.dtype) * q

    t_zm = t(f_zm[:, 0], i - 1)
    t_c = t(c, i)
    t_zp = t(f_zp[:, 0], i + 1)
    hz = 0.25 * (2.0 * t_c - t_zm - t_zp)
    res = _notwall(i, nz, c.dtype) * mask * hz
    out_ref[:, 0] = (orig[:, 0] - res) if with_subtract else res


def _mult_filter_pass(buf, orig, interpret):
    """One multiplicative filter application (clear.Hz.clear.Hy.clear.Hx);
    with ``orig`` given, returns ``orig - H(buf)`` (the final subtraction
    fused into the last pass)."""
    _, nz, ny, nx = buf.shape
    plane = lambda off: pl.BlockSpec(
        (3, 1, ny, nx),
        lambda i, off=off: (0, jnp.clip(i + off, 0, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    with_subtract = orig is not None
    in_specs = [plane(-1), plane(0), plane(+1)]
    args = [buf, buf, buf]
    if with_subtract:
        in_specs.append(plane(0))
        args.append(orig)
    return pl.pallas_call(
        functools.partial(_mult_filter_kernel, with_subtract),
        grid=(nz,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(buf.shape, buf.dtype),
        interpret=interpret,
    )(*args)


def _conv_inplane_kernel(k, use_x, f_c, out_ref):
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    c = f_c[:, 0]
    ny, nx = c.shape[-2], c.shape[-1]
    mask = _ring_mask(ny, nx, c.dtype)
    nw = _notwall(i, nz, c.dtype)
    buf = c
    for _ in range(k):
        buf = nw * (mask * (_hp_x(buf) if use_x else _hp_y(buf)))
    out_ref[:, 0] = c - buf


def _conv_z_kernel(k, *refs):
    planes, out_ref = refs[:-1], refs[-1]
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    c = planes[k][:, 0]
    ny, nx = c.shape[-2], c.shape[-1]
    mask = _ring_mask(ny, nx, c.dtype)
    cur = {off: planes[off + k][:, 0] for off in range(-k, k + 1)}
    for step in range(1, k + 1):
        reach = k - step
        cur = {
            off: _notwall(i + off, nz, c.dtype)
            * mask
            * (0.25 * (2.0 * cur[off] - cur[off - 1] - cur[off + 1]))
            for off in range(-reach, reach + 1)
        }
    out_ref[:, 0] = c - cur[0]


def _conv_z_single_kernel(with_subtract, *refs):
    """One z high-pass application (clear . H_z); with ``orig`` given,
    returns ``orig - H_z(buf)`` (the stage's final subtraction fused)."""
    if with_subtract:
        f_zm, f_c, f_zp, orig, out_ref = refs
    else:
        f_zm, f_c, f_zp, out_ref = refs
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    c = f_c[:, 0]
    ny, nx = c.shape[-2], c.shape[-1]
    mask = _ring_mask(ny, nx, c.dtype)
    hz = 0.25 * (2.0 * c - f_zm[:, 0] - f_zp[:, 0])
    res = _notwall(i, nz, c.dtype) * mask * hz
    out_ref[:, 0] = (orig[:, 0] - res) if with_subtract else res


def _conv_filter_stage(field, k, stage, interpret):
    """One convolution-filter stage ``field - H_axis^k field`` (stage in
    {"x", "y", "z"}), clears applied between applications. The z stage is
    one fused 2k+1-plane kernel when that (double-buffered) working set
    fits scoped VMEM, else k sequential 3-plane passes."""
    _, nz, ny, nx = field.shape
    plane = lambda off: pl.BlockSpec(
        (3, 1, ny, nx),
        lambda i, off=off: (0, jnp.clip(i + off, 0, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )

    def call(kern, in_specs, args):
        return pl.pallas_call(
            kern,
            grid=(nz,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(field.shape, field.dtype),
            interpret=interpret,
        )(*args)

    if stage in ("x", "y"):
        kern = functools.partial(_conv_inplane_kernel, k, stage == "x")
        return call(kern, [plane(0)], [field])
    # factor 2 models Pallas's input double-buffering (an 11-plane k=5
    # stage measured 18 MB of scoped vmem against the 16 MB limit)
    if _plane_fits((3, nz, ny, nx), 2 * (2 * k + 2)):
        kern = functools.partial(_conv_z_kernel, k)
        return call(
            kern, [plane(off) for off in range(-k, k + 1)], [field] * (2 * k + 1)
        )
    buf = field
    for it in range(k):
        last = it == k - 1
        in_specs = [plane(-1), plane(0), plane(+1)]
        args = [buf, buf, buf]
        if last:
            in_specs.append(plane(0))
            args.append(field)
        buf = call(
            functools.partial(_conv_z_single_kernel, last), in_specs, args
        )
    return buf


def _laplacian_filter_vector_3d_impl(
    vector_field, filter_order, filter_type, interpret
):
    if filter_order == 0:
        return vector_field
    # minimum working sets: multiplicative pass = 4 planes; convolution's
    # z stage degrades to sequential 3-plane passes (5 with the fused
    # subtract), so the fused-vs-sequential choice lives in the stage
    n_planes = 5 if filter_type == "convolution" else 4
    if not _plane_fits(vector_field.shape, n_planes):
        return _jnp_ops.laplacian_filter_vector_3d(
            vector_field, filter_order, filter_type
        )
    if filter_type == "multiplicative":
        buf = vector_field
        for it in range(filter_order):
            last = it == filter_order - 1
            buf = _mult_filter_pass(
                buf, vector_field if last else None, interpret
            )
        return buf
    elif filter_type == "convolution":
        out = vector_field
        for stage in ("x", "y", "z"):
            out = _conv_filter_stage(out, filter_order, stage, interpret)
        return out
    raise ValueError("Invalid filter type")


_laplacian_filter_vjp = jax.custom_vjp(
    _laplacian_filter_vector_3d_impl, nondiff_argnums=(1, 2, 3)
)


def _laplacian_filter_fwd(v, order, ftype, interpret):
    return _laplacian_filter_vector_3d_impl(v, order, ftype, interpret), v


def _laplacian_filter_bwd(order, ftype, interpret, v, ct):
    _, vjp = jax.vjp(
        lambda f: _jnp_ops.laplacian_filter_vector_3d(f, order, ftype), v
    )
    return vjp(ct)


_laplacian_filter_vjp.defvjp(_laplacian_filter_fwd, _laplacian_filter_bwd)


def laplacian_filter_vector_3d_pallas(
    vector_field, filter_order: int, filter_type: str, *, interpret=None
):
    """Pallas ``laplacian_filter_vector_3d`` (exact parity incl. the
    per-pass wall clearing), one HBM read+write per filter application,
    with a VJP via the jnp formulation."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _laplacian_filter_vjp(
        vector_field, int(filter_order), filter_type, interpret
    )


# ---------------------------------------------------------------------------
# boundary penalisation (sponge zone)
# (= stencils_3d.penalise_field_boundary_vector_3d; reference
# penalise_field_boundary_mpi_3d.py). The sequential x/y/z clamp+ramp
# composition is separable: out[z,y,x] = r(z) r(y) r(x) * f[s(z),s(y),s(x)]
# with s = clip(i, w-1, n-w) and r the sine ramp (1 in the interior) - so
# one streaming pass computes it, where the jnp concatenation form costs
# ~8.7 ms standalone / ~4 ms in-situ at 256^3. The fused
# diffusion+penalise kernel removes the pass entirely on the no-filter
# Navier-Stokes path.
# ---------------------------------------------------------------------------


def _ramp_vals(width: int):
    import numpy as _np

    return [
        float(_np.sin(0.5 * _np.pi * k / width)) for k in range(width)
    ]


def _penalise_y_inplane(p, ramp_vals):
    """y-only clamp+ramp of a (3, rows, nx) tile (full y extent)."""
    w = len(ramp_vals)
    ny = p.shape[-2]
    lo = p[:, w - 1 : w, :]
    hi = p[:, ny - w : ny - w + 1, :]
    return jnp.concatenate(
        [lo * r for r in ramp_vals]
        + [p[:, w : ny - w, :]]
        + [hi * r for r in reversed(ramp_vals)],
        axis=1,
    )


def _penalise_inplane(p, ramp_vals):
    """Separable in-plane (y then x) clamp+ramp of a (3, ny, nx) plane."""
    return _penalise_x_inplane(_penalise_y_inplane(p, ramp_vals), ramp_vals)


def _z_ramp_weight(i, nz, ramp_vals, dtype):
    wz = jnp.ones((), dtype)
    for k, r in enumerate(ramp_vals):
        wz = jnp.where(i == k, r, wz)
        wz = jnp.where(i == nz - 1 - k, r, wz)
    return wz


def _select_plane(planes, offset, delta):
    """planes: dict off -> (3, ny, nx); select planes[offset + delta] where
    ``delta`` is a traced scalar in the dict's key range."""
    keys = sorted(planes.keys())
    out = planes[keys[0]]
    for k in keys[1:]:
        out = jnp.where(delta == k - offset, planes[k], out)
    return out


def _penalise_x_inplane(p, ramp_vals):
    """x-only clamp+ramp of a (3, rows, nx) tile (full x extent)."""
    w = len(ramp_vals)
    nx = p.shape[-1]
    lo = p[:, :, w - 1 : w]
    hi = p[:, :, nx - w : nx - w + 1]
    return jnp.concatenate(
        [lo * r for r in ramp_vals]
        + [p[:, :, w : nx - w]]
        + [hi * r for r in reversed(ramp_vals)],
        axis=2,
    )


def _penalise_kernel(w, ramp_vals, ny, *refs):
    """Grid (nz, y-tiles): y handled mask/select-wise so a plane can split
    into row tiles (512^2 planes exceed scoped VMEM whole). The clamp
    source rows (absolute w-1 and ny-w) are static LOCAL slices - they are
    only read in the first/last tile, where those local offsets are
    correct; elsewhere the masks zero their contribution."""
    planes_refs, out_ref = refs[:-1], refs[-1]
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    j = pl.program_id(1)
    reach = w - 1
    planes = {
        off: planes_refs[off + reach][:, 0] for off in range(-reach, reach + 1)
    }
    c = planes[0]
    rows = c.shape[1]
    delta = jnp.clip(i, w - 1, nz - w) - i  # source-plane offset
    src = _select_plane(planes, 0, delta)
    q = _penalise_x_inplane(src, ramp_vals)
    # y: per-absolute-row weight + clamped row source
    abs_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + j * rows
    wy = jnp.ones((rows, 1), c.dtype)
    for k, r in enumerate(ramp_vals):
        wy = jnp.where(abs_r == k, r, wy)
        wy = jnp.where(abs_r == ny - 1 - k, r, wy)
    row_lo = q[:, w - 1 : w, :]        # valid only in tile 0 (masked off elsewhere)
    row_hi = q[:, rows - w : rows - w + 1, :]  # valid only in the last tile
    m_lo = (abs_r < w)[None]
    m_hi = (abs_r > ny - 1 - w)[None]
    y_src = jnp.where(m_lo, row_lo, jnp.where(m_hi, row_hi, q))
    out_ref[:, 0] = (
        _z_ramp_weight(i, nz, ramp_vals, c.dtype) * wy[None] * y_src
    )


def _diffusion_at(planes, off, prefac, nz, i):
    """Diffusion output at plane offset ``off`` (a static int) from the
    loaded plane dict; the wall-flux mask never applies because the
    clamped source plane is strictly interior."""
    c = planes[off]
    ny, nx = c.shape[-2], c.shape[-1]
    lap = (
        planes[off - 1]
        + planes[off + 1]
        - 6.0 * c
        + jnp.pad(c[:, 2:, :] + c[:, :-2, :], ((0, 0), (1, 1), (0, 0)))
        + jnp.pad(c[:, :, 2:] + c[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    )
    return c + prefac * _ring_mask(ny, nx, c.dtype) * lap


def _diffusion_penalise_kernel(w, ramp_vals, prefac_ref, *refs):
    planes_refs, out_ref = refs[:-1], refs[-1]
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    planes = {off: planes_refs[off + w][:, 0] for off in range(-w, w + 1)}
    p = prefac_ref[0, 0]
    delta = jnp.clip(i, w - 1, nz - w) - i
    # diffusion output at the clamped source plane: its three z-neighbors
    # all lie in the loaded window (|delta| <= w-1)
    d_planes = {
        off: _diffusion_at(planes, off, p, nz, i)
        for off in range(-(w - 1), w)
    }
    src = _select_plane(d_planes, 0, delta)
    q = _penalise_inplane(src, ramp_vals)
    out_ref[:, 0] = _z_ramp_weight(i, nz, ramp_vals, src.dtype) * q


# explicit double-buffered VMEM budget for the tiled penalise kernel
_PENALISE_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_penalise_ytiles(ny, nx, width, itemsize):
    """Smallest y-tile count whose (2w-1 in + 1 out, double-buffered)
    working set fits scoped VMEM; None -> jnp fallback."""
    for yt in (1, 2, 4, 8, 16):
        if ny % yt:
            continue
        rows = ny // yt
        if rows < 2 * width:
            break
        if 2 * (2 * width) * 3 * rows * nx * itemsize <= _PENALISE_VMEM_BUDGET:
            return yt
    return None


def _penalise_vector_3d_impl(vector_field, width, interpret):
    if width == 0:
        return vector_field
    _, nz, ny, nx = vector_field.shape
    reach = width - 1
    yt = _pick_penalise_ytiles(ny, nx, width, vector_field.dtype.itemsize)
    if (
        yt is None
        or nz <= 2 * width
        or ny <= 2 * width
        or nx <= 2 * width
    ):
        return _jnp_ops.penalise_field_boundary_vector_3d(vector_field, width)
    rows = ny // yt
    ramp_vals = _ramp_vals(width)
    plane = lambda off: pl.BlockSpec(
        (3, 1, rows, nx),
        lambda i, j, off=off: (0, jnp.clip(i + off, 0, nz - 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_penalise_kernel, width, ramp_vals, ny),
        grid=(nz, yt),
        in_specs=[plane(off) for off in range(-reach, reach + 1)],
        out_specs=pl.BlockSpec(
            (3, 1, rows, nx), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(vector_field.shape, vector_field.dtype),
        interpret=interpret,
    )(*([vector_field] * (2 * reach + 1)))


_penalise_vjp = jax.custom_vjp(_penalise_vector_3d_impl, nondiff_argnums=(1, 2))


def _penalise_fwd(v, width, interpret):
    return _penalise_vector_3d_impl(v, width, interpret), v


def _penalise_bwd(width, interpret, v, ct):
    _, vjp = jax.vjp(
        lambda f: _jnp_ops.penalise_field_boundary_vector_3d(f, width), v
    )
    return vjp(ct)


_penalise_vjp.defvjp(_penalise_fwd, _penalise_bwd)


def penalise_field_boundary_vector_3d_pallas(
    vector_field, width: int, *, interpret=None
):
    """Pallas ``penalise_field_boundary_vector_3d`` (exact parity), one
    streaming pass, with a VJP via the jnp formulation."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _penalise_vjp(vector_field, int(width), interpret)


def diffusion_penalise_supported(shape, width: int) -> bool:
    _, nz, ny, nx = shape
    return (
        width > 0
        and (
            _plane_fits(shape, 2 * width + 1)
            or _pick_stencil_ytiles(shape, 2 * width + 1) is not None
        )
        and nz > 2 * width
        and ny > 2 * width
        and nx > 2 * width
    )


def _diffusion_penalise_tiled_kernel(w, ramp_vals, ny, prefac_ref, *refs):
    """y-tiled fused diffusion + sponge penalisation (512^2-plane
    support): diffusion of the z-CLAMPED source plane with y-halo seam
    strips (loaded AT the clamped plane by the index maps), then the
    separable clamp+ramp with the y side handled in absolute-row
    mask/select form (same scheme as _penalise_kernel)."""
    planes_refs = refs[: 2 * w + 1]
    s_up, s_dn, out_ref = refs[2 * w + 1:]
    i = pl.program_id(0)
    nz = pl.num_programs(0)
    j = pl.program_id(1)
    planes = {off: planes_refs[off + w][:, 0] for off in range(-w, w + 1)}
    p = prefac_ref[0, 0]
    c = planes[0]
    rows, nx = c.shape[-2], c.shape[-1]
    delta = jnp.clip(i, w - 1, nz - w) - i  # z-clamp source offset
    c_src = _select_plane(planes, 0, delta)
    zm_src = _select_plane(planes, -1, delta)
    zp_src = _select_plane(planes, +1, delta)
    ext = _ext_rows(c_src, s_up[:, 0], s_dn[:, 0])
    lap = (
        zm_src
        + zp_src
        - 6.0 * c_src
        + (ext[:, 2:, :] + ext[:, :-2, :])
        + jnp.pad(
            c_src[:, :, 2:] + c_src[:, :, :-2], ((0, 0), (0, 0), (1, 1))
        )
    )
    # no z-wall flux check needed: the clamped source plane is strictly
    # interior for w >= 2, and at w == 1 the z-ramp zeroes wall planes
    mask = _tiled_ring_mask(rows, nx, j, ny, c.dtype)
    d = c_src + p * mask * lap
    # separable penalisation: x clamp+ramp, then y in absolute-row form
    q = _penalise_x_inplane(d, ramp_vals)
    abs_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + j * rows
    wy = jnp.ones((rows, 1), c.dtype)
    for k, r in enumerate(ramp_vals):
        wy = jnp.where(abs_r == k, r, wy)
        wy = jnp.where(abs_r == ny - 1 - k, r, wy)
    row_lo = q[:, w - 1 : w, :]           # valid only in tile 0
    row_hi = q[:, rows - w : rows - w + 1, :]  # valid only in the last tile
    m_lo = (abs_r < w)[None]
    m_hi = (abs_r > ny - 1 - w)[None]
    y_src = jnp.where(m_lo, row_lo, jnp.where(m_hi, row_hi, q))
    out_ref[:, 0] = (
        _z_ramp_weight(i, nz, ramp_vals, c.dtype) * wy[None] * y_src
    )


def _diffusion_penalise_tiled(vector_field, nu_dt_by_dx2, width, yt,
                              interpret):
    _, nz, ny, nx = vector_field.shape
    rows = ny // yt
    ramp_vals = _ramp_vals(width)
    prefac = jnp.asarray(nu_dt_by_dx2, vector_field.dtype).reshape(1, 1)
    w = width
    tile = lambda off: pl.BlockSpec(
        (3, 1, rows, nx),
        lambda i, j, off=off: (0, jnp.clip(i + off, 0, nz - 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    # seam strips loaded AT the z-clamped source plane
    nyb8 = ny // 8
    r8 = rows // 8
    zsrc = lambda i: jnp.clip(i, w - 1, nz - w)
    s_up = pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j: (0, zsrc(i), jnp.clip(j * r8 - 1, 0, nyb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    s_dn = pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j: (0, zsrc(i), jnp.clip((j + 1) * r8, 0, nyb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    f = vector_field
    return pl.pallas_call(
        functools.partial(_diffusion_penalise_tiled_kernel, w, ramp_vals, ny),
        grid=(nz, yt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM)
        ]
        + [tile(off) for off in range(-w, w + 1)]
        + [s_up, s_dn],
        out_specs=pl.BlockSpec(
            (3, 1, rows, nx), lambda i, j: (0, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        interpret=interpret,
    )(prefac, *([f] * (2 * w + 1)), f, f)


def _diffusion_penalise_impl(vector_field, nu_dt_by_dx2, width, interpret):
    if not diffusion_penalise_supported(vector_field.shape, width):
        out = _jnp_ops.diffusion_timestep_vector_3d(vector_field, nu_dt_by_dx2)
        return _jnp_ops.penalise_field_boundary_vector_3d(out, width)
    if not _plane_fits(vector_field.shape, 2 * width + 1):
        yt = _pick_stencil_ytiles(
            vector_field.shape, 2 * width + 1, vector_field.dtype.itemsize
        )
        # rows must hold distinct in-tile clamp rows (w-1 and rows-w)
        if yt is not None and (vector_field.shape[2] // yt) >= 2 * width:
            return _diffusion_penalise_tiled(
                vector_field, nu_dt_by_dx2, width, yt, interpret
            )
        out = _jnp_ops.diffusion_timestep_vector_3d(vector_field, nu_dt_by_dx2)
        return _jnp_ops.penalise_field_boundary_vector_3d(out, width)
    _, nz, ny, nx = vector_field.shape
    ramp_vals = _ramp_vals(width)
    prefac = jnp.asarray(nu_dt_by_dx2, vector_field.dtype).reshape(1, 1)
    plane = lambda off: pl.BlockSpec(
        (3, 1, ny, nx),
        lambda i, off=off: (0, jnp.clip(i + off, 0, nz - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(_diffusion_penalise_kernel, width, ramp_vals),
        grid=(nz,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        ]
        + [plane(off) for off in range(-width, width + 1)],
        out_specs=pl.BlockSpec(
            (3, 1, ny, nx), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(vector_field.shape, vector_field.dtype),
        interpret=interpret,
    )(prefac, *([vector_field] * (2 * width + 1)))


_diffusion_penalise_vjp = jax.custom_vjp(
    _diffusion_penalise_impl, nondiff_argnums=(2, 3)
)


def _diffusion_penalise_fwd(v, p, width, interpret):
    return _diffusion_penalise_impl(v, p, width, interpret), (v, p)


def _diffusion_penalise_bwd(width, interpret, res, ct):
    v, p = res
    _, vjp = jax.vjp(
        lambda f, q: _jnp_ops.penalise_field_boundary_vector_3d(
            _jnp_ops.diffusion_timestep_vector_3d(f, q), width
        ),
        v, p,
    )
    return vjp(ct)


_diffusion_penalise_vjp.defvjp(_diffusion_penalise_fwd, _diffusion_penalise_bwd)


def diffusion_penalise_vector_3d_pallas(
    vector_field, nu_dt_by_dx2, width: int, *, interpret=None
):
    """Fused ``penalise_field_boundary_vector_3d(diffusion_timestep_vector_3d(
    f, p), width)`` in one streaming pass (the no-filter Navier-Stokes
    transport tail), with a VJP via the jnp composition."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _diffusion_penalise_vjp(
        vector_field, nu_dt_by_dx2, int(width), interpret
    )
