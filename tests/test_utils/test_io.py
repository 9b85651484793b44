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


@pytest.mark.parametrize("dim", [2, 3])
def test_multiple_fields_anisotropic_grid_roundtrip(tmp_path, dim, precision):
    """Several Eulerian fields (mixed scalar/vector) on an ANISOTROPIC
    grid round-trip together (reference test_mpi_io_2d/3d.py multi-field +
    aspect-ratio matrices)."""
    real_t = get_real_t(precision)
    rng = np.random.default_rng(11)
    grid_size = (4, 8) if dim == 2 else (4, 6, 8)
    holder = Holder()
    holder.vort = jnp.asarray(rng.standard_normal(grid_size), real_t)
    holder.press = jnp.asarray(rng.standard_normal(grid_size), real_t)
    holder.vel = jnp.asarray(rng.standard_normal((dim, *grid_size)), real_t)

    io = FieldIO(dim=dim, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.arange(dim, dtype=float),
        dx=np.full(dim, 0.05),
        grid_size=np.array(grid_size),
    )
    io.add_as_eulerian_fields_for_io(
        vort=FieldBinding(holder, "vort"),
        press=FieldBinding(holder, "press"),
        vel=FieldBinding(holder, "vel"),
    )
    f = str(tmp_path / "multi.h5")
    io.save(f, time=4.25)
    saved = {k: np.asarray(getattr(holder, k)).copy()
             for k in ("vort", "press", "vel")}
    for k in saved:
        setattr(holder, k, jnp.zeros_like(getattr(holder, k)))
    assert io.load(f) == pytest.approx(4.25)
    for k in saved:
        np.testing.assert_allclose(np.asarray(getattr(holder, k)), saved[k])


def test_multiple_lagrangian_grids_roundtrip(tmp_path, precision):
    """Two Lagrangian grids (one polyline-connected) with their own fields
    in one file; each gets its own XDMF sidecar (reference mpi_io.py
    multi-grid + Polyline paths)."""
    real_t = get_real_t(precision)
    rng = np.random.default_rng(13)
    holder = Holder()
    holder.rod_pos = jnp.asarray(rng.standard_normal((3, 9)), real_t)
    holder.rod_radius = jnp.asarray(rng.random(9), real_t)
    holder.sph_pos = jnp.asarray(rng.standard_normal((3, 5)), real_t)
    holder.sph_force = jnp.asarray(rng.standard_normal((3, 5)), real_t)

    io = FieldIO(dim=3, real_dtype=real_t)
    io.add_as_lagrangian_fields_for_io(
        lagrangian_grid=FieldBinding(holder, "rod_pos"),
        lagrangian_grid_name="rod",
        lagrangian_grid_connect=True,
        radius=FieldBinding(holder, "rod_radius"),
    )
    io.add_as_lagrangian_fields_for_io(
        lagrangian_grid=FieldBinding(holder, "sph_pos"),
        lagrangian_grid_name="sphere",
        force=FieldBinding(holder, "sph_force"),
    )
    f = str(tmp_path / "two_grids.h5")
    io.save(f, time=0.5)
    assert os.path.exists(str(tmp_path / "two_grids_rod.xmf"))
    assert os.path.exists(str(tmp_path / "two_grids_sphere.xmf"))

    saved = {k: np.asarray(getattr(holder, k)).copy()
             for k in ("rod_pos", "rod_radius", "sph_pos", "sph_force")}
    for k in saved:
        setattr(holder, k, jnp.zeros_like(getattr(holder, k)))
    assert io.load(f) == pytest.approx(0.5)
    for k in saved:
        np.testing.assert_allclose(np.asarray(getattr(holder, k)), saved[k])


@pytest.mark.parametrize("mismatch", ["origin", "dx", "grid_size"])
def test_load_rejects_each_mismatched_grid_parameter(tmp_path, mismatch):
    """Every grid parameter is validated independently on load (restart
    consistency, reference mpi_io.py:483-494)."""
    real_t = get_real_t("single")
    holder = Holder()
    holder.scalar = jnp.zeros((8, 8), real_t)

    def build(origin, dx, grid_size, field_shape=(8, 8)):
        holder.scalar = jnp.zeros(field_shape, real_t)
        io = FieldIO(dim=2, real_dtype=real_t)
        io.define_eulerian_grid(
            origin=origin, dx=dx, grid_size=np.array(grid_size)
        )
        io.add_as_eulerian_fields_for_io(
            scalar=FieldBinding(holder, "scalar")
        )
        return io

    f = str(tmp_path / "flow.h5")
    build(np.zeros(2), np.full(2, 0.1), (8, 8)).save(f)
    kwargs = dict(origin=np.zeros(2), dx=np.full(2, 0.1), grid_size=(8, 8))
    if mismatch == "origin":
        kwargs["origin"] = np.full(2, 0.3)
    elif mismatch == "dx":
        kwargs["dx"] = np.full(2, 0.2)
    else:
        kwargs["grid_size"] = (16, 16)
        kwargs["field_shape"] = (16, 16)
    io2 = build(**kwargs)
    with pytest.raises(AssertionError):
        io2.load(f)


def test_load_missing_field_raises(tmp_path):
    """Loading a file that lacks a registered field fails loudly instead
    of silently leaving stale state."""
    real_t = get_real_t("single")
    holder = Holder()
    holder.a = jnp.zeros((4, 4), real_t)
    io = FieldIO(dim=2, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.zeros(2), dx=np.full(2, 0.1), grid_size=np.array([4, 4])
    )
    io.add_as_eulerian_fields_for_io(a=FieldBinding(holder, "a"))
    f = str(tmp_path / "one.h5")
    io.save(f)

    holder.b = jnp.zeros((4, 4), real_t)
    io2 = FieldIO(dim=2, real_dtype=real_t)
    io2.define_eulerian_grid(
        origin=np.zeros(2), dx=np.full(2, 0.1), grid_size=np.array([4, 4])
    )
    io2.add_as_eulerian_fields_for_io(
        a=FieldBinding(holder, "a"), b=FieldBinding(holder, "b")
    )
    with pytest.raises(KeyError):
        io2.load(f)


def test_on_disk_dtype_matches_real_dtype(tmp_path, precision):
    """Datasets are written in the declared real dtype (the reference
    parametrizes its whole IO matrix over precision)."""
    import h5py

    real_t = get_real_t(precision)
    holder = Holder()
    holder.s = jnp.ones((4, 4), real_t)
    io = FieldIO(dim=2, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.zeros(2), dx=np.full(2, 0.1), grid_size=np.array([4, 4])
    )
    io.add_as_eulerian_fields_for_io(s=FieldBinding(holder, "s"))
    f = str(tmp_path / "dtype.h5")
    io.save(f)
    with h5py.File(f, "r") as h:
        assert h["Eulerian/Scalar/s"].dtype == np.dtype(real_t)


def test_xdmf_sidecars_reference_h5_and_dims(tmp_path):
    """The XDMF sidecars point at the h5 file and carry the grid dims
    (ParaView contract; reference mpi_io.py:556-749)."""
    real_t = get_real_t("single")
    holder = Holder()
    holder.s = jnp.zeros((4, 6, 8), real_t)
    holder.markers = jnp.zeros((3, 7), real_t)
    io = FieldIO(dim=3, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.zeros(3), dx=np.full(3, 0.1), grid_size=np.array([4, 6, 8])
    )
    io.add_as_eulerian_fields_for_io(s=FieldBinding(holder, "s"))
    io.add_as_lagrangian_fields_for_io(
        lagrangian_grid=FieldBinding(holder, "markers"),
        lagrangian_grid_name="markers",
    )
    f = str(tmp_path / "viz.h5")
    io.save(f, time=1.0)
    eul = (tmp_path / "viz_eulerian.xmf").read_text()
    assert "viz.h5" in eul
    assert 'Dimensions="4    6    8"' in eul  # 3DCORECTMesh topology
    assert "3DCORECTMesh" in eul and "ORIGIN_DXDYDZ" in eul
    lag = (tmp_path / "viz_markers.xmf").read_text()
    assert "viz.h5" in lag and "7" in lag


def test_eulerian_sharded_save_load_roundtrip(tmp_path, precision):
    """Round 5 (VERDICT r04 next #7): the scale-out per-shard Eulerian
    dump - every process writes only the shards it addresses, streamed
    block-by-block (no global host gather) - round-trips on a (4, 2)
    virtual mesh, re-uploading each block straight to its device, and
    refuses a layout-mismatched restart loudly."""
    import jax
    import pytest as _pytest

    from sopht_mpi_tpu.parallel import (
        create_mesh,
        shard_scalar_field,
        shard_vector_field,
    )

    real_t = get_real_t(precision)
    rng = np.random.default_rng(7)
    grid_size = (8, 8, 16)
    mesh = create_mesh(3, (4, 2))
    holder = Holder()
    holder.scalar = shard_scalar_field(
        jnp.asarray(rng.standard_normal(grid_size), real_t), mesh
    )
    holder.vector = shard_vector_field(
        jnp.asarray(rng.standard_normal((3, *grid_size)), real_t), mesh
    )
    io = FieldIO(dim=3, real_dtype=real_t)
    io.define_eulerian_grid(
        origin=np.zeros(3), dx=np.full(3, 0.1), grid_size=np.array(grid_size)
    )
    io.add_as_eulerian_fields_for_io(
        scalar=FieldBinding(holder, "scalar"),
        vector=FieldBinding(holder, "vector"),
    )
    base = str(tmp_path / "flow_sharded")
    io.save_eulerian_sharded(base, time=2.5)
    assert os.path.exists(base + ".proc0.h5")

    saved_scalar = np.asarray(holder.scalar).copy()
    saved_vector = np.asarray(holder.vector).copy()
    holder.scalar = shard_scalar_field(jnp.zeros(grid_size, real_t), mesh)
    holder.vector = shard_vector_field(jnp.zeros((3, *grid_size), real_t), mesh)
    time = io.load_eulerian_sharded(base)
    assert time == pytest.approx(2.5)
    np.testing.assert_allclose(np.asarray(holder.scalar), saved_scalar)
    np.testing.assert_allclose(np.asarray(holder.vector), saved_vector)
    # restored arrays keep their mesh shardings (no host re-shard)
    assert holder.scalar.sharding.device_set == set(mesh.devices.flat)

    # a different-layout restart must fail loudly, not mis-assemble
    other = create_mesh(3, (8, 1))
    holder.scalar = shard_scalar_field(jnp.zeros(grid_size, real_t), other)
    holder.vector = shard_vector_field(
        jnp.zeros((3, *grid_size), real_t), other
    )
    with _pytest.raises(ValueError, match="different mesh/layout"):
        io.load_eulerian_sharded(base)
