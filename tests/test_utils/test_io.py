"""IO round-trip tests (counterpart of the reference's test_mpi_io_2d/3d.py
write-then-read contracts, SURVEY.md section 4)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sopht_mpi_tpu.models import CosseratRod
from sopht_mpi_tpu.utils import (
    CosseratRodIO,
    FieldBinding,
    FieldIO,
    load_rod_state,
    save_rod_state,
)
from sopht_mpi_tpu.utils.types import get_real_t


class Holder:
    pass


@pytest.mark.parametrize("dim", [2, 3])
def test_eulerian_scalar_and_vector_roundtrip(tmp_path, dim, precision):
    real_t = get_real_t(precision)
    rng = np.random.default_rng(5)
    n = 8
    grid_size = (n,) * dim
    holder = Holder()
    holder.scalar = jnp.asarray(rng.standard_normal(grid_size), real_t)
    holder.vector = jnp.asarray(
        rng.standard_normal((dim, *grid_size)), real_t
    )

    io = FieldIO(dim=dim, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.zeros(dim), dx=np.full(dim, 0.1), grid_size=np.array(grid_size)
    )
    io.add_as_eulerian_fields_for_io(
        scalar=FieldBinding(holder, "scalar"),
        vector=FieldBinding(holder, "vector"),
    )
    f = str(tmp_path / "flow.h5")
    io.save(f, time=1.5)
    assert os.path.exists(f)
    assert os.path.exists(str(tmp_path / "flow_eulerian.xmf"))

    saved_scalar = np.asarray(holder.scalar).copy()
    saved_vector = np.asarray(holder.vector).copy()
    holder.scalar = jnp.zeros_like(holder.scalar)
    holder.vector = jnp.zeros_like(holder.vector)
    time = io.load(f)
    assert time == pytest.approx(1.5)
    np.testing.assert_allclose(np.asarray(holder.scalar), saved_scalar)
    np.testing.assert_allclose(np.asarray(holder.vector), saved_vector)


def test_load_validates_grid_parameters(tmp_path, precision):
    real_t = get_real_t(precision)
    holder = Holder()
    holder.scalar = jnp.zeros((8, 8), real_t)
    io = FieldIO(dim=2, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.zeros(2), dx=np.full(2, 0.1), grid_size=np.array([8, 8])
    )
    io.add_as_eulerian_fields_for_io(scalar=FieldBinding(holder, "scalar"))
    f = str(tmp_path / "flow.h5")
    io.save(f)
    # a mismatched grid must be rejected on load (restart consistency)
    io2 = FieldIO(dim=2, real_dtype=real_t)
    io2.define_eulerian_grid(
        origin=np.ones(2), dx=np.full(2, 0.1), grid_size=np.array([8, 8])
    )
    io2.add_as_eulerian_fields_for_io(scalar=FieldBinding(holder, "scalar"))
    with pytest.raises(AssertionError):
        io2.load(f)


def test_lagrangian_fields_roundtrip(tmp_path, precision):
    real_t = get_real_t(precision)
    rng = np.random.default_rng(7)
    n_nodes = 12
    holder = Holder()
    holder.grid = jnp.asarray(rng.standard_normal((2, n_nodes)), real_t)
    holder.force = jnp.asarray(rng.standard_normal((2, n_nodes)), real_t)
    holder.radius = jnp.asarray(rng.random(n_nodes), real_t)

    io = FieldIO(dim=2, real_dtype=real_t)
    io.add_as_lagrangian_fields_for_io(
        lagrangian_grid=FieldBinding(holder, "grid"),
        lagrangian_grid_name="markers",
        lagrangian_grid_connect=True,
        force=FieldBinding(holder, "force"),
        radius=FieldBinding(holder, "radius"),
    )
    f = str(tmp_path / "lag.h5")
    io.save(f, time=0.25)
    assert os.path.exists(str(tmp_path / "lag_markers.xmf"))

    saved = {
        k: np.asarray(getattr(holder, k)).copy()
        for k in ("grid", "force", "radius")
    }
    for k in saved:
        setattr(holder, k, jnp.zeros_like(getattr(holder, k)))
    time = io.load(f)
    assert time == pytest.approx(0.25)
    for k in saved:
        np.testing.assert_allclose(np.asarray(getattr(holder, k)), saved[k])


def test_cosserat_rod_io_and_state_checkpoint(tmp_path):
    rod = CosseratRod.straight_rod(
        10,
        np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
        np.array([0.0, 1.0, 0.0]),
        base_length=1.0,
        base_radius=0.02,
        density=1e3,
        youngs_modulus=1e6,
        shear_modulus=1e4,
    )
    rod_io = CosseratRodIO(cosserat_rod=rod, real_dtype=np.float64)
    f = str(tmp_path / "rod.h5")
    rod_io.save(f, time=2.0)
    assert os.path.exists(str(tmp_path / "rod_rod.xmf"))

    # full state checkpoint/restore (ea.save_state/load_state parity)
    rod.velocity_collection = (
        np.random.default_rng(1).standard_normal((3, 11))
    )
    sf = str(tmp_path / "rod_state.h5")
    save_rod_state(rod, sf, time=3.0)
    rod2 = CosseratRod.straight_rod(
        10,
        np.ones(3),
        np.array([0.0, 1.0, 0.0]),
        np.array([1.0, 0.0, 0.0]),
        base_length=1.0,
        base_radius=0.02,
        density=1e3,
        youngs_modulus=1e6,
        shear_modulus=1e4,
    )
    t = load_rod_state(rod2, sf)
    assert t == pytest.approx(3.0)
    np.testing.assert_allclose(
        np.asarray(rod2.velocity_collection),
        np.asarray(rod.velocity_collection),
    )
    np.testing.assert_allclose(
        np.asarray(rod2.position_collection),
        np.asarray(rod.position_collection),
    )
