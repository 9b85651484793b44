"""Pallas TPU stencil kernels vs the jnp reference ops (interpret mode on
CPU; the same kernels compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.ops import (
    cross_product_3d,
    curl_3d,
    diffusion_timestep_vector_3d,
    update_vorticity_from_velocity_forcing_3d,
)
from sopht_mpi_tpu.ops.pallas_stencils_3d import (
    curl_3d_pallas,
    diffusion_timestep_vector_3d_pallas,
    rotational_curl_add_3d_pallas,
)


@pytest.fixture
def fields():
    n = 16
    w = jax.random.normal(jax.random.PRNGKey(0), (3, n, n, n), jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(1), (3, n, n, n), jnp.float64)
    return w, u


def test_pallas_diffusion_matches_jnp(fields):
    w, _ = fields
    a = jnp.float64(0.37)
    ref = diffusion_timestep_vector_3d(w, a)
    out = diffusion_timestep_vector_3d_pallas(w, a, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_curl_matches_jnp(fields):
    w, _ = fields
    a = jnp.float64(8.0)
    ref = curl_3d(w, a)
    out = curl_3d_pallas(w, a, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_rotational_matches_jnp(fields):
    w, u = fields
    a = jnp.float64(0.05)
    ref = update_vorticity_from_velocity_forcing_3d(
        w, cross_product_3d(u, w), a
    )
    out = rotational_curl_add_3d_pallas(w, u, a, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_fallback_for_oversized_planes(fields):
    """Fields whose planes exceed the VMEM cap fall back to the jnp ops."""
    w, _ = fields
    import sopht_mpi_tpu.ops.pallas_stencils_3d as m

    cap = m._VMEM_BYTES_CAP
    try:
        m._VMEM_BYTES_CAP = 1  # force fallback
        a = jnp.float64(0.37)
        ref = diffusion_timestep_vector_3d(w, a)
        out = diffusion_timestep_vector_3d_pallas(w, a, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
    finally:
        m._VMEM_BYTES_CAP = cap


def test_pallas_curl_with_free_stream_add(fields):
    """add_vector folds the free-stream update into the curl pass."""
    from sopht_mpi_tpu.ops.elementwise import add_fixed_val

    w, _ = fields
    a = jnp.float64(0.25)
    fsv = jnp.asarray([1.0, -0.5, 0.25], jnp.float64)
    ref = add_fixed_val(curl_3d(w, a), fsv)
    out = curl_3d_pallas(w, a, add_vector=fsv, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("filter_type", ["multiplicative", "convolution"])
@pytest.mark.parametrize("order", [1, 2, 5])
def test_pallas_laplacian_filter_matches_jnp(order, filter_type):
    from sopht_mpi_tpu.ops import laplacian_filter_vector_3d
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        laplacian_filter_vector_3d_pallas,
    )

    # anisotropic shape catches axis mixups
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 12, 8, 16), jnp.float64)
    ref = laplacian_filter_vector_3d(w, order, filter_type)
    out = laplacian_filter_vector_3d_pallas(
        w, order, filter_type, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_laplacian_filter_order_zero_and_grad():
    from sopht_mpi_tpu.ops import laplacian_filter_vector_3d
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        laplacian_filter_vector_3d_pallas,
    )

    w = jax.random.normal(jax.random.PRNGKey(4), (3, 8, 8, 8), jnp.float32)
    assert (
        laplacian_filter_vector_3d_pallas(w, 0, "multiplicative", interpret=True)
        is w
    )
    g_pal = jax.grad(
        lambda f: jnp.sum(
            laplacian_filter_vector_3d_pallas(
                f, 2, "multiplicative", interpret=True
            )
            ** 2
        )
    )(w)
    g_ref = jax.grad(
        lambda f: jnp.sum(laplacian_filter_vector_3d(f, 2, "multiplicative") ** 2)
    )(w)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-5)


def test_pallas_laplacian_filter_sequential_z_stage(monkeypatch):
    """With a VMEM cap too small for the fused 2k+1-plane z stage, the
    convolution filter degrades to sequential 3-plane z passes and still
    matches the jnp reference."""
    import sopht_mpi_tpu.ops.pallas_stencils_3d as mod
    from sopht_mpi_tpu.ops import laplacian_filter_vector_3d

    monkeypatch.setattr(mod, "_VMEM_BYTES_CAP", 20_000)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 12, 8, 16), jnp.float64)
    ref = laplacian_filter_vector_3d(w, 5, "convolution")
    out = mod.laplacian_filter_vector_3d_pallas(
        w, 5, "convolution", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("width", [1, 2, 3])
def test_pallas_penalise_matches_jnp(width):
    from sopht_mpi_tpu.ops import penalise_field_boundary_vector_3d
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        penalise_field_boundary_vector_3d_pallas,
    )

    w = jax.random.normal(jax.random.PRNGKey(6), (3, 12, 10, 16), jnp.float64)
    ref = penalise_field_boundary_vector_3d(w, width)
    out = penalise_field_boundary_vector_3d_pallas(w, width, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-14)
    # width 0 no-op
    assert (
        penalise_field_boundary_vector_3d_pallas(w, 0, interpret=True) is w
    )


@pytest.mark.parametrize("width", [1, 2, 3])
def test_pallas_diffusion_penalise_fused_matches_jnp(width):
    from sopht_mpi_tpu.ops import (
        diffusion_timestep_vector_3d,
        penalise_field_boundary_vector_3d,
    )
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        diffusion_penalise_vector_3d_pallas,
    )

    w = jax.random.normal(jax.random.PRNGKey(7), (3, 12, 10, 16), jnp.float64)
    p = jnp.float64(0.21)
    ref = penalise_field_boundary_vector_3d(
        diffusion_timestep_vector_3d(w, p), width
    )
    out = diffusion_penalise_vector_3d_pallas(w, p, width, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_diffusion_penalise_grad():
    from sopht_mpi_tpu.ops import (
        diffusion_timestep_vector_3d,
        penalise_field_boundary_vector_3d,
    )
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        diffusion_penalise_vector_3d_pallas,
        penalise_field_boundary_vector_3d_pallas,
    )

    w = jax.random.normal(jax.random.PRNGKey(8), (3, 8, 8, 8), jnp.float32)
    p = jnp.float32(0.1)
    g1 = jax.grad(
        lambda f: jnp.sum(
            diffusion_penalise_vector_3d_pallas(f, p, 2, interpret=True) ** 2
        )
    )(w)
    g1r = jax.grad(
        lambda f: jnp.sum(
            penalise_field_boundary_vector_3d(
                diffusion_timestep_vector_3d(f, p), 2
            )
            ** 2
        )
    )(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g1r), atol=1e-5)
    g2 = jax.grad(
        lambda f: jnp.sum(
            penalise_field_boundary_vector_3d_pallas(f, 2, interpret=True) ** 2
        )
    )(w)
    g2r = jax.grad(
        lambda f: jnp.sum(penalise_field_boundary_vector_3d(f, 2) ** 2)
    )(w)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g2r), atol=1e-5)


def test_pallas_penalise_y_tiled(monkeypatch):
    """With a VMEM budget too small for a whole plane, the penalise kernel
    splits into y row tiles and still matches the jnp reference (the
    512^2-plane configuration)."""
    import sopht_mpi_tpu.ops.pallas_stencils_3d as mod
    from sopht_mpi_tpu.ops import penalise_field_boundary_vector_3d

    w = jax.random.normal(jax.random.PRNGKey(9), (3, 10, 32, 24), jnp.float64)
    for width in (1, 2, 3):
        budget = 2 * (2 * width) * 3 * 8 * 24 * 8 + 64  # forces yt = 4
        monkeypatch.setattr(mod, "_PENALISE_VMEM_BUDGET", budget)
        assert mod._pick_penalise_ytiles(32, 24, width, 8) == 4
        ref = penalise_field_boundary_vector_3d(w, width)
        out = mod.penalise_field_boundary_vector_3d_pallas(
            w, width, interpret=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-14)


# ---------------------------------------------------------------------------
# y-tiled variants (512^2-plane support; VERDICT r03 next #2): planes that
# exceed the whole-plane VMEM cap split into y-tiles with 8-row halo
# strips. Forced here by shrinking the whole-plane cap; parity must hold
# to fp-reassociation level (XLA FMA fusion differs between the two
# program shapes) including at the tile seams and the physical walls.
# ---------------------------------------------------------------------------


@pytest.fixture
def tiled_fields(monkeypatch):
    import sopht_mpi_tpu.ops.pallas_stencils_3d as m

    monkeypatch.setattr(m, "_VMEM_BYTES_CAP", 0)  # force the tiled path
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 8, 32, 256), jnp.float64)
    u = jax.random.normal(jax.random.PRNGKey(3), (3, 8, 32, 256), jnp.float64)
    assert m._pick_stencil_ytiles(w.shape, 3, 8) is not None
    return w, u


def test_pallas_tiled_diffusion_matches_jnp(tiled_fields):
    w, _ = tiled_fields
    a = jnp.float64(0.37)
    ref = diffusion_timestep_vector_3d(w, a)
    out = diffusion_timestep_vector_3d_pallas(w, a, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_tiled_curl_matches_jnp_with_add_and_l1max(tiled_fields):
    from sopht_mpi_tpu.ops.elementwise import add_fixed_val

    w, _ = tiled_fields
    a = jnp.float64(8.0)
    fsv = jnp.asarray([1.0, -0.5, 0.25], jnp.float64)
    ref = add_fixed_val(curl_3d(w, a), fsv)
    out, l1 = curl_3d_pallas(
        w, a, add_vector=fsv, interpret=True, compute_l1_max=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)
    np.testing.assert_allclose(
        float(l1), float(jnp.max(jnp.sum(jnp.abs(ref), axis=0))), atol=1e-13
    )
    out2 = curl_3d_pallas(w, a, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(curl_3d(w, a)), atol=1e-13
    )


def test_pallas_tiled_rotational_matches_jnp(tiled_fields):
    w, u = tiled_fields
    a = jnp.float64(0.05)
    ref = update_vorticity_from_velocity_forcing_3d(
        w, cross_product_3d(u, w), a
    )
    out = rotational_curl_add_3d_pallas(w, u, a, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_pallas_tiled_grads_flow(tiled_fields):
    """The custom VJPs (jnp formulations) are reachable through the tiled
    primal path."""
    w, u = tiled_fields
    a = jnp.float64(0.05)

    def loss(f):
        return jnp.sum(rotational_curl_add_3d_pallas(f, u, a,
                                                     interpret=True) ** 2)

    def loss_ref(f):
        return jnp.sum(
            update_vorticity_from_velocity_forcing_3d(
                f, cross_product_3d(u, f), a
            ) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss)(w)), np.asarray(jax.grad(loss_ref)(w)),
        atol=1e-12,
    )


def test_pallas_tiled_untileable_shape_falls_back(monkeypatch):
    """ny too small for 8-aligned >=16-row tiles -> jnp fallback survives."""
    import sopht_mpi_tpu.ops.pallas_stencils_3d as m

    monkeypatch.setattr(m, "_VMEM_BYTES_CAP", 0)
    w = jax.random.normal(jax.random.PRNGKey(4), (3, 6, 12, 64), jnp.float64)
    assert m._pick_stencil_ytiles(w.shape, 3, 8) is None
    a = jnp.float64(0.37)
    ref = diffusion_timestep_vector_3d(w, a)
    out = diffusion_timestep_vector_3d_pallas(w, a, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


@pytest.mark.parametrize("width", [1, 2, 3])
def test_pallas_tiled_diffusion_penalise_fused_matches_jnp(width, monkeypatch):
    """The y-tiled fused diffusion+penalise (512^2-plane support) equals
    the jnp composition, including the z-clamp near walls and the in-tile
    y clamp rows."""
    from sopht_mpi_tpu.ops import (
        diffusion_timestep_vector_3d,
        penalise_field_boundary_vector_3d,
    )
    from sopht_mpi_tpu.ops.pallas_stencils_3d import (
        diffusion_penalise_supported,
        diffusion_penalise_vector_3d_pallas,
    )
    import sopht_mpi_tpu.ops.pallas_stencils_3d as m

    w = jax.random.normal(jax.random.PRNGKey(9), (3, 10, 32, 256), jnp.float64)
    a = jnp.float64(0.1)
    ref = penalise_field_boundary_vector_3d(
        diffusion_timestep_vector_3d(w, a), width
    )
    monkeypatch.setattr(m, "_VMEM_BYTES_CAP", 0)  # force the tiled path
    assert diffusion_penalise_supported(w.shape, width)
    out = diffusion_penalise_vector_3d_pallas(w, a, width, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)
