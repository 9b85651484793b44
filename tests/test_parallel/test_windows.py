"""Sharded moving-window primitives vs the meshless dynamic-slice oracle
(the grid touches of the sparse IBM forcing path, round 5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopht_mpi_tpu.parallel import create_mesh, shard_vector_field
from sopht_mpi_tpu.parallel.windows import (
    add_window_into_field,
    gather_window_replicated,
)


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1), (1, 8), (2, 4)])
def test_window_gather_and_add_match_dynamic_slice(mesh_shape):
    rng = np.random.default_rng(0)
    nz, ny, nx = 16, 24, 20
    f = jnp.asarray(rng.standard_normal((3, nz, ny, nx)), jnp.float32)
    wshape = (7, 9, 5)
    mesh = create_mesh(3, mesh_shape)
    fs = shard_vector_field(f, mesh)
    # starts in (x, y, z) component order, incl. domain corners (the
    # meshless path's dynamic_slice clamp never triggers for in-domain
    # starts - window_mats clips them - so these are exact pairs)
    for s in [(0, 0, 0), (3, 5, 2), (nx - 5, ny - 9, nz - 7), (8, 11, 6)]:
        start = jnp.asarray(s, jnp.int32)
        win = jax.jit(
            lambda a, st: gather_window_replicated(a, st, wshape, mesh)
        )(fs, start)
        ref = jax.lax.dynamic_slice(f, (0, s[2], s[1], s[0]), (3,) + wshape)
        np.testing.assert_array_equal(np.asarray(win), np.asarray(ref))

        wadd = jnp.asarray(rng.standard_normal((3,) + wshape), jnp.float32)
        out = jax.jit(
            lambda a, w, st: add_window_into_field(a, w, st, mesh)
        )(fs, wadd, start)
        ref2 = jax.lax.dynamic_update_slice(
            f, ref + wadd, (0, s[2], s[1], s[0])
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref2))


def test_window_gather_gradients_flow():
    """The psum-gather and masked add are linear; grads must match the
    meshless formulation exactly."""
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal((3, 8, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 4, 4, 4)), jnp.float32)
    start = jnp.asarray((2, 3, 1), jnp.int32)
    mesh = create_mesh(3, (4, 2))
    fs = shard_vector_field(f, mesh)

    def loss_sharded(a, wd):
        win = gather_window_replicated(a, start, (4, 4, 4), mesh)
        out = add_window_into_field(a, wd, start, mesh)
        return jnp.sum(win**2) + jnp.sum(out**2)

    def loss_ref(a, wd):
        win = jax.lax.dynamic_slice(a, (0, 1, 3, 2), (3, 4, 4, 4))
        out = jax.lax.dynamic_update_slice(a, win + wd, (0, 1, 3, 2))
        return jnp.sum(win**2) + jnp.sum(out**2)

    ga, gw = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(fs, w)
    ra, rw = jax.grad(loss_ref, argnums=(0, 1))(f, w)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-6)
