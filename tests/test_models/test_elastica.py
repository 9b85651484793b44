"""Cosserat rod validation tests.

The reference relies on the external PyElastica test suite for structural
dynamics; its own tests only exercise the coupling (SURVEY.md section 4).
Since this framework re-implements the rod, we validate against analytical
mechanics instead (the same oracles PyElastica itself uses): Timoshenko
cantilever deflection, axial stretch, rigid free fall, SO(3) kinematics
round-trips, and energy conservation of free oscillation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sopht_mpi_tpu.models.elastica import (
    AnalyticalLinearDamper,
    BaseSystemCollection,
    CosseratRod,
    EndpointForces,
    GravityForces,
    OneEndFixedBC,
    PositionVerlet,
    compute_strains,
    exp_rotate,
    extend_stepper_interface,
    relative_rotation_vectors,
)

E, G, L, R, RHO = 1e6, 1e4, 3.0, 0.25, 5e3
AREA = np.pi * R * R
I_SECOND = np.pi / 4 * R**4
ALPHA = 4.0 / 3.0


def build_sim(n_elem, forces_cfg, damping, dt, fixed=True):
    sim = BaseSystemCollection()
    rod = CosseratRod.straight_rod(
        n_elem,
        np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
        np.array([0.0, 1.0, 0.0]),
        L,
        R,
        RHO,
        youngs_modulus=E,
        shear_modulus=G,
    )
    sim.append(rod)
    if fixed:
        sim.constrain(rod).using(
            OneEndFixedBC,
            constrained_position_idx=(0,),
            constrained_director_idx=(0,),
        )
    for cls, kwargs in forces_cfg:
        sim.add_forcing_to(rod).using(cls, **kwargs)
    if damping:
        sim.dampen(rod).using(
            AnalyticalLinearDamper, damping_constant=damping, time_step=dt
        )
    sim.finalize()
    return sim, rod


def test_timoshenko_cantilever_deflection():
    """Clamped rod with transverse tip force relaxes to the analytical
    Timoshenko beam deflection (PyElastica's canonical validation)."""
    n_elem = 20
    dt = 0.01 * L / n_elem
    force = 15.0
    sim, rod = build_sim(
        n_elem,
        [
            (
                EndpointForces,
                dict(
                    start_force=np.zeros(3),
                    end_force=np.array([0.0, force, 0.0]),
                ),
            )
        ],
        damping=0.2,
        dt=dt,
    )
    sim.run_steps(0.0, dt, int(50.0 / dt))
    tip = float(rod.position_collection[1, -1])
    tip_analytical = force / (ALPHA * G * AREA) * L + force / (E * I_SECOND) * (
        L**3 / 2 - L**3 / 6
    )
    assert tip == pytest.approx(tip_analytical, rel=0.08)
    # full deflection profile (looser: boundary-layer effects at the clamp)
    s = np.asarray(rod.position_collection[2])
    y_analytical = force / (ALPHA * G * AREA) * s + force / (E * I_SECOND) * (
        L * s**2 / 2 - s**3 / 6
    )
    np.testing.assert_allclose(
        np.asarray(rod.position_collection[1]),
        y_analytical,
        atol=0.1 * abs(tip_analytical),
    )


def test_axial_stretch():
    """End force along the rod: dL = F L / (E A)."""
    n_elem = 10
    dt = 0.01 * L / n_elem
    force = 100.0
    sim, rod = build_sim(
        n_elem,
        [
            (
                EndpointForces,
                dict(
                    start_force=np.zeros(3),
                    end_force=np.array([0.0, 0.0, force]),
                ),
            )
        ],
        damping=0.3,
        dt=dt,
    )
    sim.run_steps(0.0, dt, int(30.0 / dt))
    stretch = float(rod.position_collection[2, -1]) - L
    assert stretch == pytest.approx(force * L / (E * AREA), rel=0.02)


def test_free_fall_is_rigid_translation():
    """Unconstrained rod under gravity falls rigidly: x = g t^2 / 2."""
    n_elem = 8
    dt = 1e-4
    g = -9.81
    sim, rod = build_sim(
        n_elem,
        [(GravityForces, dict(acc_gravity=np.array([0.0, g, 0.0])))],
        damping=0.0,
        dt=dt,
        fixed=False,
    )
    t_final = 1.0
    nsteps = int(t_final / dt)
    sim.run_steps(0.0, dt, nsteps)
    y = np.asarray(rod.position_collection[1])
    # all nodes displaced equally, by g t^2 / 2
    np.testing.assert_allclose(y, y[0], atol=1e-10)
    assert y[0] == pytest.approx(0.5 * g * t_final**2, rel=1e-2)


def test_rotation_exp_log_roundtrip():
    """exp_rotate then relative rotation recovers the rotation vector with
    the kinematically consistent sign (Q_{k+1} Q_k^T = exp(-hat(phi)))."""
    rng = np.random.default_rng(3)
    q0 = np.tile(np.eye(3)[:, :, None], (1, 1, 2))
    phi = np.zeros((3, 2))
    phi[:, 1] = 0.3 * rng.standard_normal(3)
    q = exp_rotate(jnp.asarray(q0), jnp.asarray(phi))
    # orthonormality preserved
    qtq = np.einsum("ijn,ikn->jkn", np.asarray(q), np.asarray(q))
    np.testing.assert_allclose(
        qtq, np.broadcast_to(np.eye(3)[:, :, None], qtq.shape), atol=1e-12
    )
    rv = np.asarray(relative_rotation_vectors(q))
    np.testing.assert_allclose(rv[:, 0], -phi[:, 1], atol=1e-12)


def test_curvature_of_circular_arc():
    """Directors laid on a circular arc give kappa = (0, k, 0) in the
    material frame (bend about d2)."""
    n, kap = 16, 0.5
    rod = CosseratRod.straight_rod(
        n,
        np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
        np.array([0.0, 1.0, 0.0]),
        L,
        R,
        RHO,
        youngs_modulus=E,
        shear_modulus=G,
    )
    s_nodes = np.linspace(0, L, n + 1)
    th_n = kap * s_nodes
    pos = np.stack(
        [np.zeros(n + 1), (1 - np.cos(th_n)) / kap, np.sin(th_n) / kap]
    )
    s_el = 0.5 * (s_nodes[:-1] + s_nodes[1:])
    th = kap * s_el
    d3 = np.stack([np.zeros(n), np.sin(th), np.cos(th)])
    d1 = np.stack([np.zeros(n), np.cos(th), -np.sin(th)])
    d2 = np.cross(d3.T, d1.T).T
    rod.position_collection = pos
    rod.director_collection = np.stack([d1, d2, d3])
    _, kappa = compute_strains(rod.state, rod.params)
    kappa = np.asarray(kappa)
    np.testing.assert_allclose(kappa[1], kap, rtol=1e-3)
    np.testing.assert_allclose(kappa[[0, 2]], 0.0, atol=1e-10)


def test_undamped_oscillation_energy_bounded():
    """Free oscillation of a deflected cantilever neither decays nor blows
    up without damping (symplectic stepping keeps energy bounded)."""
    n_elem = 10
    dt = 0.005 * L / n_elem
    force = 5.0
    sim, rod = build_sim(
        n_elem,
        [
            (
                EndpointForces,
                dict(
                    start_force=np.zeros(3),
                    end_force=np.array([0.0, force, 0.0]),
                ),
            )
        ],
        damping=0.05,
        dt=dt,
    )
    # settle to deflected state, then release (rebuild without force/damper)
    sim.run_steps(0.0, dt, int(20.0 / dt))
    sim2 = BaseSystemCollection()
    sim2.append(rod)
    sim2.constrain(rod).using(
        OneEndFixedBC,
        constrained_position_idx=(0,),
        constrained_director_idx=(0,),
    )
    sim2.finalize()

    def kinetic(r):
        v = np.asarray(r.velocity_collection)
        m = np.asarray(r.mass)
        return 0.5 * float(np.sum(m * np.sum(v * v, axis=0)))

    tips = []
    for _ in range(40):
        sim2.run_steps(0.0, dt, 200)
        tips.append(float(rod.position_collection[1, -1]))
    tips = np.asarray(tips)
    # oscillates around a reduced mean without blowing up
    assert np.all(np.isfinite(tips))
    assert tips.max() < 0.2  # static deflection ~0.02; blow-up would exceed
    assert tips.min() > -0.2
    assert kinetic(rod) < 1e3


def test_rod_state_save_load_roundtrip():
    rod = CosseratRod.straight_rod(
        8,
        np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
        np.array([0.0, 1.0, 0.0]),
        L,
        R,
        RHO,
        youngs_modulus=E,
        shear_modulus=G,
    )
    arrays = rod.get_state_arrays()
    rod2 = CosseratRod.straight_rod(
        8,
        np.ones(3),
        np.array([0.0, 1.0, 0.0]),
        np.array([1.0, 0.0, 0.0]),
        L,
        R,
        RHO,
        youngs_modulus=E,
        shear_modulus=G,
    )
    rod2.set_state_arrays(arrays)
    np.testing.assert_array_equal(
        np.asarray(rod2.position_collection), np.asarray(rod.position_collection)
    )
    np.testing.assert_array_equal(
        np.asarray(rod2.director_collection), np.asarray(rod.director_collection)
    )


def test_general_constraint_allows_axial_rotation():
    """GeneralConstraint with a free rotational axis lets the rod spin
    about its tangent while staying clamped in translation
    (the freely-rotating-rod case's boundary condition)."""
    from sopht_mpi_tpu.models.elastica import GeneralConstraint

    n_elem = 8
    dt = 1e-4
    sim = BaseSystemCollection()
    rod = CosseratRod.straight_rod(
        n_elem,
        np.zeros(3),
        np.array([0.0, 0.0, 1.0]),
        np.array([0.0, 1.0, 0.0]),
        L,
        R,
        RHO,
        youngs_modulus=E,
        shear_modulus=G,
    )
    sim.append(rod)
    sim.constrain(rod).using(
        GeneralConstraint,
        constrained_position_idx=(0,),
        constrained_director_idx=(0,),
        translational_constraint_selector=np.array([True, True, True]),
        rotational_constraint_selector=np.array([True, True, False]),
    )
    sim.finalize()
    # rod tangent is lab z; the selector frees lab-z rotation, so an axial
    # spin must NOT be suppressed
    rod.omega_collection = (
        np.zeros((3, n_elem)) + np.array([0.0, 0.0, 2.0])[:, None]
    )
    sim.run_steps(0.0, dt, 200)
    omega = np.asarray(rod.omega_collection)
    assert abs(omega[2, 0]) > 1.0  # axial spin survives at the clamp
    # clamped translation: root node stays put
    np.testing.assert_allclose(
        np.asarray(rod.position_collection[:, 0]), 0.0, atol=1e-12
    )
    # transverse rotations at the clamp are suppressed
    np.testing.assert_allclose(omega[:2, 0], 0.0, atol=1e-12)
