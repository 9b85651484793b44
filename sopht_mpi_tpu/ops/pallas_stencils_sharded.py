"""Per-shard Pallas streaming stencils under ``shard_map`` (3D).

VERDICT r03 next #1: the production plane-streaming kernels
(pallas_stencils_3d.py) ran single-device only, so a sharded simulator
fell back to the ~3x-slower jnp ops for the hot NS stencils. Each public
op here is a ``shard_map`` over the 3D mesh ('z', 'y') that:

1. exchanges the width-1 halos with ``lax.ppermute`` - whole z-planes
   along 'z', single y-rows along 'y'. This is the reference's
   MPIGhostCommunicator3D role (52 MPI subarray datatypes,
   /root/reference/sopht_mpi/utils/mpi_utils_3d.py:86-1142) collapsed to
   two collective permutes per field: these 3-point stencils need no
   corner/edge/vertex ghosts (outputs at a (z, y) shard corner read only
   axis-aligned neighbors), matching the reference's edge-only
   ``full_exchange=False`` mode (mpi_utils_2d.py:107-116).
2. runs a per-shard y-tiled Pallas kernel (the pallas_stencils_3d tile +
   8-row-seam-strip structure) whose wall semantics use GLOBAL
   coordinates (``z0 + i``, ``y0 + j*rows + r``), so physical-wall
   behavior is exactly the single-device kernels' while shard seams are
   true interior. The wraparound ppermute delivers garbage at the
   physical walls - consumed only by wall cells the global masks zero.
3. needs no reverse ghost-sum: stencil outputs are owner-computed.

Reverse mode: each op is a ``jax.custom_vjp`` whose backward pass is the
VJP of the identical global jnp formulation (XLA SPMD emits its own
halos for the shifted slices), mirroring the single-device kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from sopht_mpi_tpu.ops import stencils_3d as _jnp_ops
from sopht_mpi_tpu.ops.pallas_stencils_3d import (
    _STENCIL_TILED_BUDGET,
    _inplane_dx,
    _penalise_x_inplane,
    _ramp_vals,
    _select_plane,
)

_VSPEC = P(None, "z", "y", None)


def _pick_shard_ytiles(local_shape, n_tile_inputs: int, itemsize: int):
    """y-tile count for a (3, nzl, nyl, nx) shard; unlike the unsharded
    picker, yt == 1 is allowed (the seam halos then come entirely from
    the ppermuted neighbor rows). None -> shapes unsupported."""
    _, nzl, nyl, nx = local_shape
    if nzl < 1 or nyl < 8 or nyl % 8:
        return None
    for yt in (1, 2, 4, 8, 16, 32):
        if nyl % yt:
            continue
        rows = nyl // yt
        if rows < 8 or rows % 8:
            break
        if (2 * (n_tile_inputs + 1) * 3 * rows * nx * itemsize
                <= _STENCIL_TILED_BUDGET):
            return yt
    return None


def sharded_stencil_ytiles(global_shape, mesh, n_tile_inputs: int,
                           itemsize: int = 4):
    """yt for the per-shard kernels of a (3, nz, ny, nx) GLOBAL field on
    ``mesh`` ('z', 'y'), or None when the local shapes do not tile."""
    _, nz, ny, nx = global_shape
    pz, py = mesh.shape["z"], mesh.shape["y"]
    if nz % pz or ny % py:
        return None
    return _pick_shard_ytiles((3, nz // pz, ny // py, nx), n_tile_inputs,
                              itemsize)


# ---------------------------------------------------------------------------
# halo exchange (inside shard_map)
# ---------------------------------------------------------------------------


def _perm(n: int, shift: int):
    return [(i, (i + shift) % n) for i in range(n)]


def _ghost_z(f, pz: int):
    """(3, nzl+2, nyl, nx): f with one ppermuted ghost plane per z side
    (wraparound garbage at the physical walls - wall-masked)."""
    last, first = f[:, -1:], f[:, :1]
    if pz > 1:
        lo = lax.ppermute(last, "z", _perm(pz, +1))   # prev shard's last
        hi = lax.ppermute(first, "z", _perm(pz, -1))  # next shard's first
    else:
        lo, hi = last, first
    return jnp.concatenate([lo, f, hi], axis=1)


def _halo_y_rows(f, py: int):
    """((3, nzl, 1, nx) ylo, yhi): the y-neighbor shards' edge rows."""
    last, first = f[:, :, -1:, :], f[:, :, :1, :]
    if py > 1:
        ylo = lax.ppermute(last, "y", _perm(py, +1))
        yhi = lax.ppermute(first, "y", _perm(py, -1))
    else:
        ylo, yhi = last, first
    return ylo, yhi


def _shard_coords(nzl: int, nyl: int):
    """(1, 2) int32 [z0_plane, y0_row] global offsets of this shard."""
    return jnp.stack(
        [lax.axis_index("z") * nzl, lax.axis_index("y") * nyl]
    ).astype(jnp.int32).reshape(1, 2)


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------


def _specs(nzl, nyl, nx, rows):
    """BlockSpec builders over grid (nzl, yt) for: z-ghosted main-array
    tiles (``gtile(off)`` reads ghosted plane i+1+off), 8-row seam strips
    at the center z plane, ppermuted neighbor-row inputs, and the output
    tile."""
    nyb8 = nyl // 8
    r8 = rows // 8
    gtile = lambda off: pl.BlockSpec(
        (3, 1, rows, nx),
        lambda i, j, off=off: (0, i + 1 + off, j, 0),
        memory_space=pltpu.VMEM,
    )
    s_up = pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j: (0, i + 1, jnp.clip(j * r8 - 1, 0, nyb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    s_dn = pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j: (0, i + 1, jnp.clip((j + 1) * r8, 0, nyb8 - 1), 0),
        memory_space=pltpu.VMEM,
    )
    yrow = pl.BlockSpec(
        (3, 1, 1, nx), lambda i, j: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.BlockSpec(
        (3, 1, rows, nx), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )
    return gtile, s_up, s_dn, yrow, out, smem


def _ext_rows_sharded(c, s_up, s_dn, ylo, yhi, j, nyt):
    """(3, rows+2, nx): center tile extended with its y-halo rows - from
    the in-shard seam strips, or from the ppermuted neighbor rows at the
    shard's own y edges."""
    up = jnp.where(j == 0, ylo[:, 0], s_up[:, 0, 7:8, :])
    dn = jnp.where(j == nyt - 1, yhi[:, 0], s_dn[:, 0, 0:1, :])
    return jnp.concatenate([up, c, dn], axis=1)


def _global_masks(rows, nx, i, j, coord_ref, NZ, NY, dtype):
    """(on_global_z_wall scalar weight, (rows, nx) global interior mask)."""
    z0 = coord_ref[0, 0]
    y0 = coord_ref[0, 1]
    gz = z0 + i
    on_z_wall = jnp.logical_or(gz == 0, gz == NZ - 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0) + y0 + j * rows
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 1)
    interior = (row > 0) & (row < NY - 1) & (col > 0) & (col < nx - 1)
    return jnp.where(on_z_wall, 0.0, 1.0), interior.astype(dtype)


# ---------------------------------------------------------------------------
# diffusion
# ---------------------------------------------------------------------------


def _diffusion_sharded_kernel(NZ, NY, prefac_ref, coord_ref, f_zm, f_c,
                              f_zp, s_up, s_dn, ylo, yhi, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nyt = pl.num_programs(1)
    c = f_c[:, 0]
    rows, nx = c.shape[-2], c.shape[-1]
    p = prefac_ref[0, 0]
    ext = _ext_rows_sharded(c, s_up, s_dn, ylo, yhi, j, nyt)
    lap = (
        f_zm[:, 0]
        + f_zp[:, 0]
        - 6.0 * c
        + (ext[:, 2:, :] + ext[:, :-2, :])
        + jnp.pad(c[:, :, 2:] + c[:, :, :-2], ((0, 0), (0, 0), (1, 1)))
    )
    wz, mask = _global_masks(rows, nx, i, j, coord_ref, NZ, NY, c.dtype)
    out_ref[:, 0] = c + wz * p * mask * lap


def _diffusion_sharded_impl(vector_field, nu_dt_by_dx2, mesh, yt, interpret):
    _, nz, ny, nx = vector_field.shape
    pz, py = mesh.shape["z"], mesh.shape["y"]
    nzl, nyl = nz // pz, ny // py
    rows = nyl // yt
    gtile, s_up, s_dn, yrow, out, smem = _specs(nzl, nyl, nx, rows)
    kern = functools.partial(_diffusion_sharded_kernel, nz, ny)

    def body(f):
        fg = _ghost_z(f, pz)
        ylo, yhi = _halo_y_rows(f, py)
        prefac = jnp.asarray(nu_dt_by_dx2, f.dtype).reshape(1, 1)
        return pl.pallas_call(
            kern,
            grid=(nzl, yt),
            in_specs=[smem((1, 1)), smem((1, 2)),
                      gtile(-1), gtile(0), gtile(+1), s_up, s_dn,
                      yrow, yrow],
            out_specs=out,
            out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
            interpret=interpret,
        )(prefac, _shard_coords(nzl, nyl), fg, fg, fg, fg, fg, ylo, yhi)

    return shard_map(
        body, mesh=mesh, in_specs=_VSPEC, out_specs=_VSPEC, check_vma=False
    )(vector_field)


# ---------------------------------------------------------------------------
# curl (+ optional free-stream add and global CFL max)
# ---------------------------------------------------------------------------


def _curl_sharded_kernel(NZ, NY, with_l1max, prefac_ref, coord_ref, add_ref,
                         f_zm, f_c, f_zp, s_up, s_dn, ylo, yhi, *out_refs):
    if with_l1max:
        out_ref, max_ref = out_refs
    else:
        (out_ref,) = out_refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    nyt = pl.num_programs(1)
    p = prefac_ref[0, 0]
    c = f_c[:, 0]
    rows, nx = c.shape[-2], c.shape[-1]
    ext = _ext_rows_sharded(c, s_up, s_dn, ylo, yhi, j, nyt)
    dq_dy = ext[:, 2:, :] - ext[:, :-2, :]
    dq_dx = _inplane_dx(c)
    dq_dz = f_zp[:, 0] - f_zm[:, 0]
    wz, mask = _global_masks(rows, nx, i, j, coord_ref, NZ, NY, c.dtype)
    curl = p * mask * jnp.stack(
        [dq_dy[2] - dq_dz[1], dq_dz[0] - dq_dx[2], dq_dx[1] - dq_dy[0]]
    )
    comps = []
    for comp in range(3):
        o = wz * curl[comp] + add_ref[comp, 0]
        out_ref[comp, 0] = o
        comps.append(o)
    if with_l1max:
        m = jnp.max(
            jnp.abs(comps[0]) + jnp.abs(comps[1]) + jnp.abs(comps[2])
        )
        prev = max_ref[pl.dslice(i % 8, 1), :]
        base = jnp.where(j == 0, jnp.zeros_like(prev), prev)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, nyt), 1)
        max_ref[pl.dslice(i % 8, 1), :] = jnp.where(lane == j, m, base)


def _curl_sharded_impl(field, prefactor, add_vector, mesh, yt, interpret,
                       compute_l1_max):
    _, nz, ny, nx = field.shape
    pz, py = mesh.shape["z"], mesh.shape["y"]
    nzl, nyl = nz // pz, ny // py
    rows = nyl // yt
    gtile, s_up, s_dn, yrow, out, smem = _specs(nzl, nyl, nx, rows)
    kern = functools.partial(_curl_sharded_kernel, nz, ny, compute_l1_max)

    def body(f):
        fg = _ghost_z(f, pz)
        ylo, yhi = _halo_y_rows(f, py)
        prefac = jnp.asarray(prefactor, f.dtype).reshape(1, 1)
        add = jnp.asarray(add_vector, f.dtype).reshape(3, 1)
        out_specs = [out]
        out_shape = [jax.ShapeDtypeStruct(f.shape, f.dtype)]
        if compute_l1_max:
            out_specs.append(
                pl.BlockSpec((8, yt), lambda i, j: (i // 8, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((nzl, yt), f.dtype))
        res = pl.pallas_call(
            kern,
            grid=(nzl, yt),
            in_specs=[smem((1, 1)), smem((1, 2)), smem((3, 1)),
                      gtile(-1), gtile(0), gtile(+1), s_up, s_dn,
                      yrow, yrow],
            out_specs=out_specs if compute_l1_max else out_specs[0],
            out_shape=out_shape if compute_l1_max else out_shape[0],
            interpret=interpret,
        )(prefac, _shard_coords(nzl, nyl), add, fg, fg, fg, fg, fg, ylo, yhi)
        if compute_l1_max:
            velocity, tile_max = res
            return velocity, lax.pmax(jnp.max(tile_max), ("z", "y"))
        return res

    out_specs = (_VSPEC, P()) if compute_l1_max else _VSPEC
    res = shard_map(
        body, mesh=mesh, in_specs=_VSPEC, out_specs=out_specs,
        check_vma=False,
    )(field)
    return res


# ---------------------------------------------------------------------------
# fused rotational-form transport
# ---------------------------------------------------------------------------


def _rotational_sharded_kernel(NZ, NY, prefac_ref, coord_ref,
                               w_zm, w_c, w_zp, u_zm, u_c, u_zp,
                               ws_up, ws_dn, us_up, us_dn,
                               w_ylo, w_yhi, u_ylo, u_yhi, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nyt = pl.num_programs(1)
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
    q_ext = cross(
        _ext_rows_sharded(u_c[:, 0], us_up, us_dn, u_ylo, u_yhi, j, nyt),
        _ext_rows_sharded(wc, ws_up, ws_dn, w_ylo, w_yhi, j, nyt),
    )
    q_zm = cross(u_zm[:, 0], w_zm[:, 0])
    q_zp = cross(u_zp[:, 0], w_zp[:, 0])
    # center-plane q recomputed unsliced (Mosaic offset rule; see the
    # y-tiled kernel in pallas_stencils_3d.py)
    q_c = cross(u_c[:, 0], wc)
    dq_dy = q_ext[:, 2:, :] - q_ext[:, :-2, :]
    dq_dx = _inplane_dx(q_c)
    dq_dz = q_zp - q_zm
    wz, mask = _global_masks(rows, nx, i, j, coord_ref, NZ, NY, wc.dtype)
    curl = p * mask * jnp.stack(
        [dq_dy[2] - dq_dz[1], dq_dz[0] - dq_dx[2], dq_dx[1] - dq_dy[0]]
    )
    out_ref[:, 0] = wc + wz * curl


def _rotational_sharded_impl(vorticity, velocity, prefactor, mesh, yt,
                             interpret):
    _, nz, ny, nx = vorticity.shape
    pz, py = mesh.shape["z"], mesh.shape["y"]
    nzl, nyl = nz // pz, ny // py
    rows = nyl // yt
    gtile, s_up, s_dn, yrow, out, smem = _specs(nzl, nyl, nx, rows)
    kern = functools.partial(_rotational_sharded_kernel, nz, ny)

    def body(w, u):
        wg = _ghost_z(w, pz)
        ug = _ghost_z(u, pz)
        w_ylo, w_yhi = _halo_y_rows(w, py)
        u_ylo, u_yhi = _halo_y_rows(u, py)
        prefac = jnp.asarray(prefactor, w.dtype).reshape(1, 1)
        return pl.pallas_call(
            kern,
            grid=(nzl, yt),
            in_specs=[smem((1, 1)), smem((1, 2))]
            + [gtile(o) for o in (-1, 0, 1)] * 2
            + [s_up, s_dn, s_up, s_dn]
            + [yrow] * 4,
            out_specs=out,
            out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
            interpret=interpret,
        )(prefac, _shard_coords(nzl, nyl), wg, wg, wg, ug, ug, ug,
          wg, wg, ug, ug, w_ylo, w_yhi, u_ylo, u_yhi)

    return shard_map(
        body, mesh=mesh, in_specs=(_VSPEC, _VSPEC), out_specs=_VSPEC,
        check_vma=False,
    )(vorticity, velocity)


# ---------------------------------------------------------------------------
# public API (custom VJPs via the global jnp formulations)
# ---------------------------------------------------------------------------


def _interp(interpret):
    return jax.default_backend() != "tpu" if interpret is None else interpret


_diff_vjp = jax.custom_vjp(_diffusion_sharded_impl, nondiff_argnums=(2, 3, 4))


def _diff_fwd(v, p, mesh, yt, interpret):
    return _diffusion_sharded_impl(v, p, mesh, yt, interpret), (v, p)


def _diff_bwd(mesh, yt, interpret, res, ct):
    v, p = res
    return jax.vjp(_jnp_ops.diffusion_timestep_vector_3d, v, p)[1](ct)


_diff_vjp.defvjp(_diff_fwd, _diff_bwd)


def diffusion_timestep_vector_3d_sharded(vector_field, nu_dt_by_dx2, mesh,
                                         *, interpret=None):
    """Sharded-Pallas ``diffusion_timestep_vector_3d`` (parity with the
    jnp op to fp reassociation; VJP via the jnp formulation)."""
    yt = sharded_stencil_ytiles(
        vector_field.shape, mesh, 3, vector_field.dtype.itemsize
    )
    if yt is None:
        return _jnp_ops.diffusion_timestep_vector_3d(
            vector_field, nu_dt_by_dx2
        )
    return _diff_vjp(vector_field, nu_dt_by_dx2, mesh, yt, _interp(interpret))


def _curl_ref_g(field, prefactor, add_vector, compute_l1_max):
    out = _jnp_ops.curl_3d(field, prefactor)
    out = out + add_vector[:, None, None, None]
    if compute_l1_max:
        return out, jnp.max(jnp.sum(jnp.abs(out), axis=0))
    return out


_curl_vjp = jax.custom_vjp(_curl_sharded_impl, nondiff_argnums=(3, 4, 5, 6))


def _curl_fwd(f, p, a, mesh, yt, interpret, l1):
    return _curl_sharded_impl(f, p, a, mesh, yt, interpret, l1), (f, p, a)


def _curl_bwd(mesh, yt, interpret, l1, res, ct):
    f, p, a = res
    return jax.vjp(lambda x, q, b: _curl_ref_g(x, q, b, l1), f, p, a)[1](ct)


_curl_vjp.defvjp(_curl_fwd, _curl_bwd)


def curl_3d_sharded(field, prefactor, mesh, add_vector=None, *,
                    interpret=None, compute_l1_max=False):
    """Sharded-Pallas ``curl_3d`` with optional fused free-stream add and
    global (pmax-reduced) CFL ``max |u|_1``."""
    yt = sharded_stencil_ytiles(field.shape, mesh, 3, field.dtype.itemsize)
    if add_vector is None:
        add_vector = jnp.zeros(3, field.dtype)
    if yt is None:
        return _curl_ref_g(field, prefactor, add_vector, compute_l1_max)
    return _curl_vjp(field, prefactor, add_vector, mesh, yt,
                     _interp(interpret), compute_l1_max)


def _rot_ref_g(w, u, p):
    from sopht_mpi_tpu.ops.elementwise import cross_product_3d

    return _jnp_ops.update_vorticity_from_velocity_forcing_3d(
        w, cross_product_3d(u, w), p
    )


_rot_vjp = jax.custom_vjp(_rotational_sharded_impl, nondiff_argnums=(3, 4, 5))


def _rot_fwd(w, u, p, mesh, yt, interpret):
    return _rotational_sharded_impl(w, u, p, mesh, yt, interpret), (w, u, p)


def _rot_bwd(mesh, yt, interpret, res, ct):
    return jax.vjp(_rot_ref_g, *res)[1](ct)


_rot_vjp.defvjp(_rot_fwd, _rot_bwd)


def rotational_curl_add_3d_sharded(vorticity, velocity, prefactor, mesh, *,
                                   interpret=None):
    """Sharded-Pallas fused rotational-form transport
    ``w + prefac * curl(u x w)``."""
    yt = sharded_stencil_ytiles(
        vorticity.shape, mesh, 6, vorticity.dtype.itemsize
    )
    if yt is None:
        return _rot_ref_g(vorticity, velocity, prefactor)
    return _rot_vjp(vorticity, velocity, prefactor, mesh, yt,
                    _interp(interpret))


# ---------------------------------------------------------------------------
# fused diffusion + boundary penalisation (sponge zone)
#
# Sharded analogue of pallas_stencils_3d._diffusion_penalise_tiled_kernel:
# the separable sponge out[z,y,x] = r(z) r(y) r(x) * d[s(z), s(y), s(x)]
# (d = diffusion output, s = clip(i, w-1, N-w), r the sine ramp) rides the
# diffusion pass, removing the whole-field jnp penalise pass that cost
# ~11 ms/step at 256^3 under a mesh (PLAN.md round-4 overhead breakdown).
#
# The z-clamp source offset delta = s(gz) - gz is nonzero ONLY on z-wall
# shards and |delta| <= w-1, so the kernel loads the ghosted z planes at
# offsets -w..+w and selects the source planes in-kernel from the global
# coordinate (SMEM). The clamp sources are strictly in-shard whenever
# nzl >= 2w (gated). The y clamp rows (global w-1 and NY-w) are in-tile
# static slices valid exactly where the global row masks are nonzero -
# the meshless tiled kernel's scheme with shard-global row coordinates.
# ---------------------------------------------------------------------------


def _diffpen_sharded_kernel(NZ, NY, w, ramp_vals, prefac_ref, coord_ref,
                            *refs):
    n_sel = 2 * w - 1  # seam-strip / y-row plane-select window
    planes_refs = refs[: 2 * w + 1]
    k = 2 * w + 1
    sup_refs = refs[k : k + n_sel]
    sdn_refs = refs[k + n_sel : k + 2 * n_sel]
    ylo_refs = refs[k + 2 * n_sel : k + 3 * n_sel]
    yhi_refs = refs[k + 3 * n_sel : k + 4 * n_sel]
    out_ref = refs[-1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nyt = pl.num_programs(1)
    p = prefac_ref[0, 0]
    z0 = coord_ref[0, 0]
    y0 = coord_ref[0, 1]
    reach = w - 1

    planes = {off: planes_refs[off + w][:, 0] for off in range(-w, w + 1)}
    c = planes[0]
    rows, nx = c.shape[-2], c.shape[-1]

    gz = z0 + i
    delta = jnp.clip(gz, w - 1, NZ - w) - gz  # in [-(w-1), w-1]
    c_src = _select_plane(planes, 0, delta)
    zm_src = _select_plane(planes, -1, delta)
    zp_src = _select_plane(planes, +1, delta)
    sel = lambda refs_: _select_plane(
        {off: refs_[off + reach][:, 0] for off in range(-reach, reach + 1)},
        0, delta,
    )
    s_up, s_dn = sel(sup_refs), sel(sdn_refs)
    ylo, yhi = sel(ylo_refs), sel(yhi_refs)

    up = jnp.where(j == 0, ylo, s_up[:, 7:8, :])
    dn = jnp.where(j == nyt - 1, yhi, s_dn[:, 0:1, :])
    ext = jnp.concatenate([up, c_src, dn], axis=1)
    lap = (
        zm_src
        + zp_src
        - 6.0 * c_src
        + (ext[:, 2:, :] + ext[:, :-2, :])
        + jnp.pad(
            c_src[:, :, 2:] + c_src[:, :, :-2], ((0, 0), (0, 0), (1, 1))
        )
    )
    # in-plane interior mask at the (unshifted in y/x) source rows; the
    # z-clamped source plane is strictly interior for w >= 2, and at
    # w == 1 the z-ramp zeroes the wall planes wholesale
    abs_r2 = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 0) + y0 + j * rows
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, nx), 1)
    interior = (
        (abs_r2 > 0) & (abs_r2 < NY - 1) & (col > 0) & (col < nx - 1)
    ).astype(c.dtype)
    d = c_src + p * interior * lap

    # separable penalisation: x clamp+ramp, then y in absolute-row form
    q = _penalise_x_inplane(d, ramp_vals)
    abs_r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + y0 + j * rows
    wy = jnp.ones((rows, 1), c.dtype)
    for k_, r in enumerate(ramp_vals):
        wy = jnp.where(abs_r == k_, r, wy)
        wy = jnp.where(abs_r == NY - 1 - k_, r, wy)
    row_lo = q[:, w - 1 : w, :]  # valid only in y-shard 0, tile 0
    row_hi = q[:, rows - w : rows - w + 1, :]  # last shard, last tile
    m_lo = (abs_r < w)[None]
    m_hi = (abs_r > NY - 1 - w)[None]
    y_src = jnp.where(m_lo, row_lo, jnp.where(m_hi, row_hi, q))

    wz = jnp.ones((), c.dtype)
    for k_, r in enumerate(ramp_vals):
        wz = jnp.where(gz == k_, r, wz)
        wz = jnp.where(gz == NZ - 1 - k_, r, wz)
    out_ref[:, 0] = wz * wy[None] * y_src


def _diffpen_sharded_impl(vector_field, nu_dt_by_dx2, width, mesh, yt,
                          interpret):
    _, nz, ny, nx = vector_field.shape
    pz, py = mesh.shape["z"], mesh.shape["y"]
    nzl, nyl = nz // pz, ny // py
    rows = nyl // yt
    w = width
    reach = w - 1
    nyb8 = nyl // 8
    r8 = rows // 8
    kern = functools.partial(
        _diffpen_sharded_kernel, nz, ny, w, _ramp_vals(w)
    )
    gtile = lambda off: pl.BlockSpec(
        (3, 1, rows, nx),
        lambda i, j, off=off: (0, jnp.clip(i + 1 + off, 0, nzl + 1), j, 0),
        memory_space=pltpu.VMEM,
    )
    s_up = lambda d: pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j, d=d: (
            0, jnp.clip(i + 1 + d, 0, nzl + 1),
            jnp.clip(j * r8 - 1, 0, nyb8 - 1), 0,
        ),
        memory_space=pltpu.VMEM,
    )
    s_dn = lambda d: pl.BlockSpec(
        (3, 1, 8, nx),
        lambda i, j, d=d: (
            0, jnp.clip(i + 1 + d, 0, nzl + 1),
            jnp.clip((j + 1) * r8, 0, nyb8 - 1), 0,
        ),
        memory_space=pltpu.VMEM,
    )
    yrow = lambda d: pl.BlockSpec(
        (3, 1, 1, nx),
        lambda i, j, d=d: (0, jnp.clip(i + d, 0, nzl - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    smem = lambda shape: pl.BlockSpec(
        shape, lambda i, j: (0, 0), memory_space=pltpu.SMEM
    )
    out = pl.BlockSpec(
        (3, 1, rows, nx), lambda i, j: (0, i, j, 0), memory_space=pltpu.VMEM
    )
    offs = list(range(-reach, reach + 1))

    def body(f):
        fg = _ghost_z(f, pz)
        ylo, yhi = _halo_y_rows(f, py)
        prefac = jnp.asarray(nu_dt_by_dx2, f.dtype).reshape(1, 1)
        return pl.pallas_call(
            kern,
            grid=(nzl, yt),
            in_specs=[smem((1, 1)), smem((1, 2))]
            + [gtile(off) for off in range(-w, w + 1)]
            + [s_up(d) for d in offs]
            + [s_dn(d) for d in offs]
            + [yrow(d) for d in offs] * 2,
            out_specs=out,
            out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
            interpret=interpret,
        )(
            prefac, _shard_coords(nzl, nyl),
            *([fg] * (2 * w + 1)),
            *([fg] * len(offs)),
            *([fg] * len(offs)),
            *([ylo] * len(offs)),
            *([yhi] * len(offs)),
        )

    return shard_map(
        body, mesh=mesh, in_specs=_VSPEC, out_specs=_VSPEC, check_vma=False
    )(vector_field)


def _diffpen_ref_g(vector_field, nu_dt_by_dx2, width):
    out = _jnp_ops.diffusion_timestep_vector_3d(vector_field, nu_dt_by_dx2)
    return _jnp_ops.penalise_field_boundary_vector_3d(out, width)


_diffpen_vjp = jax.custom_vjp(
    _diffpen_sharded_impl, nondiff_argnums=(2, 3, 4, 5)
)


def _diffpen_fwd(v, p, width, mesh, yt, interpret):
    return _diffpen_sharded_impl(v, p, width, mesh, yt, interpret), (v, p)


def _diffpen_bwd(width, mesh, yt, interpret, res, ct):
    v, p = res
    return jax.vjp(
        lambda f, q: _diffpen_ref_g(f, q, width), v, p
    )[1](ct)


_diffpen_vjp.defvjp(_diffpen_fwd, _diffpen_bwd)


def _diffpen_sharded_plan(global_shape, mesh, width: int, itemsize: int):
    """The y-tile count when the fused sharded diffusion+penalise kernel
    handles this (shape, mesh, sponge width), else None - the SINGLE
    predicate behind both :func:`diffusion_penalise_sharded_supported`
    and the op's own fallback decision."""
    if width <= 0:
        return None
    _, nz, ny, nx = global_shape
    if nz <= 2 * width or ny <= 2 * width or nx <= 2 * width:
        return None
    yt = sharded_stencil_ytiles(global_shape, mesh, 2 * width + 1, itemsize)
    if yt is None:
        return None
    pz, py = mesh.shape["z"], mesh.shape["y"]
    nzl, rows = nz // pz, (ny // py) // yt
    # clamp sources strictly in-shard / in-tile (see module comment)
    if nzl < 2 * width or rows < 2 * width:
        return None
    return yt


def diffusion_penalise_sharded_supported(global_shape, mesh, width: int,
                                         itemsize: int = 4):
    """True when the fused sharded diffusion+penalise kernel handles this
    (shape, mesh, sponge width); callers fall back to the separate
    diffusion kernel + jnp penalise otherwise."""
    return _diffpen_sharded_plan(global_shape, mesh, width, itemsize) \
        is not None


def diffusion_penalise_vector_3d_sharded(vector_field, nu_dt_by_dx2,
                                         width: int, mesh, *,
                                         interpret=None):
    """Sharded-Pallas fused ``penalise(diffusion(f))`` (exact parity with
    the sequential jnp ops; VJP via the jnp formulation)."""
    yt = _diffpen_sharded_plan(
        vector_field.shape, mesh, width, vector_field.dtype.itemsize
    )
    if yt is None:
        return _diffpen_ref_g(vector_field, nu_dt_by_dx2, width)
    return _diffpen_vjp(vector_field, nu_dt_by_dx2, int(width), mesh, yt,
                        _interp(interpret))
