"""Per-shard Pallas stencils (shard_map + ppermute halos) vs the
single-device jnp ops on the assembled global array - the reference's
distributed-vs-serial oracle contract (SURVEY section 4) for the sharded
production kernel path (VERDICT r03 next #1). Interpret mode on 8
virtual CPU devices; the same kernels compile natively per shard on TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sopht_mpi_tpu.ops.pallas_stencils_sharded as pss
from sopht_mpi_tpu.ops import (
    cross_product_3d,
    curl_3d,
    diffusion_timestep_vector_3d,
    update_vorticity_from_velocity_forcing_3d,
)
from sopht_mpi_tpu.parallel import create_mesh, shard_vector_field

MESH_SHAPES = [(8, 1), (4, 2), (2, 4)]
SHAPE = (3, 16, 32, 128)


@pytest.fixture
def fields64():
    w = jax.random.normal(jax.random.PRNGKey(5), SHAPE, jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(6), SHAPE, jnp.float64)
    return w, u


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sharded_diffusion_matches_single_device(fields64, mesh_shape):
    w, _ = fields64
    mesh = create_mesh(3, mesh_shape)
    assert pss.sharded_stencil_ytiles(SHAPE, mesh, 3, 8) is not None
    a = jnp.float64(0.37)
    ref = diffusion_timestep_vector_3d(w, a)
    out = pss.diffusion_timestep_vector_3d_sharded(
        shard_vector_field(w, mesh), a, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sharded_curl_with_add_and_global_l1max(fields64, mesh_shape):
    from sopht_mpi_tpu.ops.elementwise import add_fixed_val

    w, _ = fields64
    mesh = create_mesh(3, mesh_shape)
    a = jnp.float64(8.0)
    fsv = jnp.asarray([1.0, -0.5, 0.25], jnp.float64)
    ref = add_fixed_val(curl_3d(w, a), fsv)
    out, l1 = pss.curl_3d_sharded(
        shard_vector_field(w, mesh), a, mesh, add_vector=fsv,
        compute_l1_max=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)
    # the CFL quantity is pmax-reduced to a replicated global scalar
    np.testing.assert_allclose(
        float(l1), float(jnp.max(jnp.sum(jnp.abs(ref), axis=0))), atol=1e-13
    )


@pytest.mark.parametrize("mesh_shape", MESH_SHAPES)
def test_sharded_rotational_matches_single_device(fields64, mesh_shape):
    w, u = fields64
    mesh = create_mesh(3, mesh_shape)
    a = jnp.float64(0.05)
    ref = update_vorticity_from_velocity_forcing_3d(
        w, cross_product_3d(u, w), a
    )
    out = pss.rotational_curl_add_3d_sharded(
        shard_vector_field(w, mesh), shard_vector_field(u, mesh), a, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sharded_multi_ytile_path(fields64, monkeypatch):
    """Force yt > 1 so the in-shard seam strips are exercised alongside
    the ppermuted shard-edge rows."""
    w, u = fields64
    mesh = create_mesh(3, (2, 1))
    monkeypatch.setattr(pss, "_STENCIL_TILED_BUDGET", 600_000)
    yt = pss.sharded_stencil_ytiles(SHAPE, mesh, 6, 8)
    assert yt is not None and yt > 1
    a = jnp.float64(0.05)
    ref = update_vorticity_from_velocity_forcing_3d(
        w, cross_product_3d(u, w), a
    )
    out = pss.rotational_curl_add_3d_sharded(
        shard_vector_field(w, mesh), shard_vector_field(u, mesh), a, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sharded_untileable_shapes_fall_back(fields64):
    """Shards too thin to tile (nyl < 8) take the jnp ops unchanged."""
    w, _ = fields64
    mesh = create_mesh(3, (1, 8))
    assert pss.sharded_stencil_ytiles(SHAPE, mesh, 3, 8) is None
    a = jnp.float64(0.37)
    ref = diffusion_timestep_vector_3d(w, a)
    out = pss.diffusion_timestep_vector_3d_sharded(
        shard_vector_field(w, mesh), a, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (2, 1)])
@pytest.mark.parametrize("width", [1, 2, 3])
def test_sharded_diffusion_penalise_matches_single_device(
    fields64, mesh_shape, width
):
    """Fused sharded diffusion+penalise == jnp penalise(diffusion(f)) on
    the assembled global array, across pencil meshes (wall + interior
    shards in both axes) and sponge widths."""
    from sopht_mpi_tpu.ops import penalise_field_boundary_vector_3d

    w, _ = fields64
    mesh = create_mesh(3, mesh_shape)
    a = jnp.float64(0.37)
    # the kernel engages whenever the shards are thick enough for the
    # in-shard clamp (z AND y, after y-tiling); parity must hold either
    # way (fallback = jnp ops)
    nzl = SHAPE[1] // mesh_shape[0]
    yt = pss.sharded_stencil_ytiles(SHAPE, mesh, 2 * width + 1, 8)
    rows = (SHAPE[2] // mesh_shape[1]) // yt if yt else 0
    expect_kernel = (
        yt is not None and nzl >= 2 * width and rows >= 2 * width
    )
    assert (
        pss.diffusion_penalise_sharded_supported(SHAPE, mesh, width, 8)
        == expect_kernel
    )
    ref = penalise_field_boundary_vector_3d(
        diffusion_timestep_vector_3d(w, a), width
    )
    out = pss.diffusion_penalise_vector_3d_sharded(
        shard_vector_field(w, mesh), a, width, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sharded_diffusion_penalise_multi_ytile(fields64, monkeypatch):
    """yt > 1 exercises the in-tile y clamp-row slices (valid only in the
    masked-active tiles) alongside the seam strips."""
    from sopht_mpi_tpu.ops import penalise_field_boundary_vector_3d

    w, _ = fields64
    mesh = create_mesh(3, (2, 1))
    monkeypatch.setattr(pss, "_STENCIL_TILED_BUDGET", 900_000)
    yt = pss.sharded_stencil_ytiles(SHAPE, mesh, 5, 8)
    assert yt is not None and yt > 1
    a = jnp.float64(0.37)
    ref = penalise_field_boundary_vector_3d(
        diffusion_timestep_vector_3d(w, a), 2
    )
    out = pss.diffusion_penalise_vector_3d_sharded(
        shard_vector_field(w, mesh), a, 2, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sharded_diffusion_penalise_unsupported_falls_back(fields64):
    """Shards too thin in z for the in-shard clamp (nzl < 2w) take the
    sequential jnp ops unchanged."""
    from sopht_mpi_tpu.ops import penalise_field_boundary_vector_3d

    w, _ = fields64
    mesh = create_mesh(3, (8, 1))  # nzl = 2 < 2*width
    assert not pss.diffusion_penalise_sharded_supported(SHAPE, mesh, 2, 8)
    a = jnp.float64(0.37)
    ref = penalise_field_boundary_vector_3d(
        diffusion_timestep_vector_3d(w, a), 2
    )
    out = pss.diffusion_penalise_vector_3d_sharded(
        shard_vector_field(w, mesh), a, 2, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_sharded_diffusion_penalise_grads_flow(fields64):
    from sopht_mpi_tpu.ops import penalise_field_boundary_vector_3d

    w, _ = fields64
    mesh = create_mesh(3, (4, 2))
    a = jnp.float64(0.37)
    ws = shard_vector_field(w, mesh)

    def loss(f):
        return jnp.sum(
            pss.diffusion_penalise_vector_3d_sharded(f, a, 2, mesh) ** 2
        )

    def loss_ref(f):
        return jnp.sum(
            penalise_field_boundary_vector_3d(
                diffusion_timestep_vector_3d(f, a), 2
            ) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(ws)), np.asarray(jax.grad(loss_ref)(w)),
        atol=1e-12,
    )


def test_sharded_grads_flow(fields64):
    """The custom VJPs (global jnp formulations) are reachable through
    the shard_map primal."""
    w, u = fields64
    mesh = create_mesh(3, (4, 2))
    a = jnp.float64(0.05)
    ws = shard_vector_field(w, mesh)
    us = shard_vector_field(u, mesh)

    def loss(f):
        return jnp.sum(
            pss.rotational_curl_add_3d_sharded(f, us, a, mesh) ** 2
        )

    def loss_ref(f):
        return jnp.sum(
            update_vorticity_from_velocity_forcing_3d(
                f, cross_product_3d(u, f), a
            ) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(ws)), np.asarray(jax.grad(loss_ref)(w)),
        atol=1e-12,
    )


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1)])
def test_sharded_full_ns_step_matches_jnp_fork(mesh_shape):
    """A full sharded navier_stokes_with_forcing step through the sharded
    Pallas fork == the sharded jnp fork (same mesh), float32."""
    import sopht_mpi_tpu.ops.poisson as poisson_mod
    from sopht_mpi_tpu.models import UnboundedFlowSimulator3D

    def run(use_pallas):
        mesh = create_mesh(3, mesh_shape)
        sim = UnboundedFlowSimulator3D(
            grid_size=(16, 32, 128),
            x_range=1.0,
            kinematic_viscosity=1e-3,
            flow_type="navier_stokes_with_forcing",
            with_free_stream_flow=True,
            real_t=jnp.float32,
            mesh=mesh,
            use_pallas=use_pallas,
        )
        rng = np.random.default_rng(11)
        sim.primary_field = shard_vector_field(
            jnp.asarray(
                0.1 * rng.standard_normal(sim.primary_field.shape),
                jnp.float32,
            ),
            mesh,
        )
        for _ in range(2):
            sim.time_step(1e-3, free_stream_velocity=(1.0, 0.5, 0.0))
        return np.asarray(sim.primary_field), np.asarray(sim.velocity_field)

    w_ref, u_ref = run(False)
    w_pal, u_pal = run(True)
    np.testing.assert_allclose(
        w_pal, w_ref, atol=2e-5 * max(1.0, np.abs(w_ref).max())
    )
    np.testing.assert_allclose(
        u_pal, u_ref, atol=2e-5 * max(1.0, np.abs(u_ref).max())
    )


def test_sharded_step_hlo_pins_halo_collectives():
    """The compiled sharded-Pallas step contains the ppermute halo
    collectives (collective-permute) - the kernels really run per-shard
    rather than via a gather."""
    from sopht_mpi_tpu.models.flow.simulator_3d import (
        FlowState3D,
        flow_step_3d,
    )
    from sopht_mpi_tpu.models import UnboundedFlowSimulator3D

    mesh = create_mesh(3, (4, 2))
    sim = UnboundedFlowSimulator3D(
        grid_size=(16, 32, 128),
        x_range=1.0,
        kinematic_viscosity=1e-3,
        flow_type="navier_stokes",
        real_t=jnp.float32,
        mesh=mesh,
        use_pallas=True,
    )
    state = FlowState3D(sim.primary_field, sim.velocity_field, None)
    compiled = (
        jax.jit(
            lambda st, g: sim._step_fn(
                st, jnp.float32(1e-3), jnp.zeros(3, jnp.float32), g
            )
        )
        .lower(state, sim._poisson_greens)
        .compile()
    )
    hlo = compiled.as_text()
    assert "collective-permute" in hlo
    # the pencil FFT transposes are still there too
    assert "all-to-all" in hlo
