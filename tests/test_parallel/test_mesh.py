"""Mesh/sharding-layer tests (the role of the reference's
tests/test_utils/test_mpi_utils_2d.py / _3d.py: process-grid setup,
scatter-then-gather round trips, divisibility guards)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.parallel import (
    check_grid_divisibility,
    create_mesh,
    mesh_axis_names,
    scalar_field_sharding,
    shard_scalar_field,
    shard_vector_field,
    vector_field_sharding,
)


@pytest.mark.parametrize("grid_dim", [2, 3])
def test_create_mesh_default_is_slab(grid_dim):
    mesh = create_mesh(grid_dim)
    assert mesh.axis_names == mesh_axis_names(grid_dim)
    shape = mesh.devices.shape
    assert shape[0] == len(jax.devices())
    assert all(s == 1 for s in shape[1:])


def test_create_mesh_pencil_3d():
    mesh = create_mesh(3, (4, 2))
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"z": 4, "y": 2}


def test_create_mesh_too_many_devices():
    with pytest.raises(ValueError):
        create_mesh(2, (128, 1))


@pytest.mark.parametrize(
    "grid_dim,mesh_shape,grid_size",
    [
        (2, (8, 1), (16, 12)),
        (3, (4, 2), (8, 6, 5)),
    ],
)
def test_scatter_gather_roundtrip(grid_dim, mesh_shape, grid_size):
    """Sharding then reassembling a field is lossless (the reference's
    scatter-then-gather contract, test_mpi_utils_2d.py:14-80)."""
    mesh = create_mesh(grid_dim, mesh_shape)
    rng = np.random.default_rng(11)
    field = rng.standard_normal(grid_size)
    sharded = shard_scalar_field(jnp.asarray(field), mesh)
    assert sharded.sharding == scalar_field_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded), field)

    vec = rng.standard_normal((grid_dim, *grid_size))
    sharded_v = shard_vector_field(jnp.asarray(vec), mesh)
    assert sharded_v.sharding == vector_field_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded_v), vec)


def test_grid_divisibility_guard():
    mesh = create_mesh(3, (4, 2))
    check_grid_divisibility((8, 4, 7), mesh)  # z%4==0, y%2==0: ok (x free)
    with pytest.raises(RuntimeError):
        check_grid_divisibility((6, 4, 8), mesh)  # z=6 not divisible by 4
    with pytest.raises(RuntimeError):
        check_grid_divisibility((8, 3, 8), mesh)  # y=3 not divisible by 2


def test_sharded_stencil_matches_single_device():
    """A shifted-slice stencil on a sharded array equals the single-device
    result (XLA inserts the halo exchange)."""
    from sopht_mpi_tpu.ops import diffusion_flux_2d

    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.standard_normal((32, 16)), jnp.float64)
    ref = diffusion_flux_2d(field, jnp.float64(0.1))
    mesh = create_mesh(2, (8, 1))
    sharded = shard_scalar_field(field, mesh)
    out = jax.jit(diffusion_flux_2d)(sharded, jnp.float64(0.1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)
