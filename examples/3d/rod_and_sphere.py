"""3D mixed soft/rigid FSI: an oscillating flexible rod and a rigid sphere
in the same viscous stream (BASELINE.json config 5).

The reference composes multiple immersed bodies by stacking interactors in
its driver loop - each adds its penalty forcing to the shared
``eul_grid_forcing_field`` before the flow step (the pattern of
/root/reference/examples/3d_examples/FlowPastRodCase/
flow_past_rod_case.py:129-152 with a second interactor appended). Here the
whole mixed system - rod position-Verlet substeps with in-trace flow
loads, the fixed sphere's penalty interaction, both spreads, and the flow
step - is ONE fused device-scanned function
(``models.fsi.build_multi_body_fsi_step``).

Physics-long TPU validation (64x64x128, n_elem=16, t=3.0,
doc/validation_rod_and_sphere_64x64x128.csv): the rod settles into a
small-amplitude bending equilibrium (tip x-deflection band ~0.02 of
x_range at Cauchy 0.1) and the sphere's drag settles to Cd ~= 0.55 -
roughly half the isolated-sphere value at this Re, as expected for a
body shielded in the rod's wake (sphere at x=0.65 x_range directly
downstream of the rod at x=0.25 x_range).

Run:  python examples/3d/rod_and_sphere.py --grid-size-x 64 --final-time 1
"""

import argparse

import numpy as np


def rod_and_sphere_case(
    n_elem=8,
    grid_size=(32, 32, 64),
    surface_grid_density_for_largest_element=8,
    cauchy_number=0.1,
    mass_ratio=100.0,
    reynolds=100.0,
    coupling_stiffness=-2e5,
    coupling_damping=-1e2,
    precision="single",
    mesh=None,
    final_time=1.0,
    window=20,
):
    """Returns (times, rod tip positions, sphere drag coefficients)."""
    import jax.numpy as jnp
    from sopht_mpi_tpu.models import (
        AnalyticalLinearDamper,
        BaseSystemCollection,
        CosseratRod,
        CosseratRodFlowInteraction,
        CosseratRodSurfaceForcingGrid,
        FixedRigidBody,
        OneEndFixedBC,
        RigidBodyFlowInteraction,
        RodBody,
        Sphere,
        SphereForcingGrid,
        UnboundedFlowSimulator3D,
        build_multi_body_fsi_step,
        init_multi_body_fsi_carry,
        scan_steps,
    )
    from sopht_mpi_tpu.utils import get_real_t, logger

    grid_size_z, grid_size_y, grid_size_x = grid_size
    real_t = get_real_t(precision)
    rho_f = 1.0
    u_free_stream = 1.0
    x_range = 1.8
    y_range = grid_size_y / grid_size_x * x_range
    z_range = grid_size_z / grid_size_x * x_range
    # the rod must FIT the domain's z extent: it hangs from 0.85*z_range,
    # so base_length = 0.5*z_range leaves the tip at 0.35*z_range - well
    # interior for any grid aspect (a unit-length rod like the flow-past-
    # rod benchmark would poke through the floor at the default
    # nz = nx/2 aspect)
    base_length = 0.5 * z_range
    velocity_free_stream = np.array([u_free_stream, 0.0, 0.0])

    # ---- flexible rod (hanging across the stream; same nondim groups as
    # the flow-past-rod case) ----
    collection = BaseSystemCollection()
    start = np.array([0.25 * x_range, 0.5 * y_range, 0.85 * z_range])
    direction = np.array([0.0, 0.0, -1.0])
    normal = np.array([0.0, 1.0, 0.0])
    base_diameter = base_length / 5.0
    base_radius = base_diameter / 2.0
    base_area = np.pi * base_radius**2
    rho_s = mass_ratio * rho_f
    moment_of_inertia = np.pi / 4 * base_radius**4
    youngs_modulus = (
        rho_f * u_free_stream**2 * base_length**3 * base_diameter
    ) / (cauchy_number * moment_of_inertia)
    # stretch-stiffening as in flow_past_rod.py (experimental filament)
    exp_radius, exp_length = 0.2e-3, 25e-3
    stretch_bending_ratio = (
        np.pi * exp_radius**2 * exp_length**2 / (np.pi / 4 * exp_radius**4)
    )
    es_eb = stretch_bending_ratio * moment_of_inertia / (
        base_area * base_length**2
    )
    rod = CosseratRod.straight_rod(
        n_elem,
        start,
        direction,
        normal,
        base_length,
        base_radius,
        rho_s,
        youngs_modulus=youngs_modulus,
        shear_modulus=youngs_modulus / 1.5,
    )
    rod.params = rod.params._replace(
        shear_diag=rod.params.shear_diag.at[2].mul(es_eb)
    )
    collection.append(rod)
    collection.constrain(rod).using(
        OneEndFixedBC,
        constrained_position_idx=(0,),
        constrained_director_idx=(0,),
    )
    dl = base_length / n_elem
    axial_wave_speed = np.sqrt(youngs_modulus * es_eb / rho_s)
    rod_dt = min(0.01 * dl, 0.3 * dl / axial_wave_speed)
    collection.dampen(rod).using(
        AnalyticalLinearDamper, damping_constant=1e-3, time_step=rod_dt
    )
    collection.finalize()

    # ---- flow ----
    kinematic_viscosity = u_free_stream * base_diameter / reynolds
    flow_sim = UnboundedFlowSimulator3D(
        grid_size=grid_size,
        x_range=x_range,
        kinematic_viscosity=kinematic_viscosity,
        flow_type="navier_stokes_with_forcing",
        with_free_stream_flow=True,
        real_t=real_t,
        mesh=mesh,
        filter_vorticity=True,
        filter_setting_dict={"order": 1, "type": "multiplicative"},
    )

    # ---- bodies: rod + fixed rigid sphere downstream of it ----
    rod_interactor = CosseratRodFlowInteraction(
        flow_sim=flow_sim,
        cosserat_rod=rod,
        virtual_boundary_stiffness_coeff=coupling_stiffness,
        virtual_boundary_damping_coeff=coupling_damping,
        forcing_grid_cls=CosseratRodSurfaceForcingGrid,
        surface_grid_density_for_largest_element=(
            surface_grid_density_for_largest_element
        ),
    )
    sphere_diameter = 0.4 * base_length
    sphere = Sphere(
        center=np.array([0.65 * x_range, 0.5 * y_range, 0.5 * z_range]),
        radius=sphere_diameter / 2.0,
        dtype=real_t,
    )
    sphere_grid = SphereForcingGrid(
        rigid_body=sphere,
        num_forcing_points_along_equator=max(
            8, int(1.875 * sphere_diameter / x_range * grid_size_x)
        ),
    )
    sphere_interactor = RigidBodyFlowInteraction(
        flow_sim=flow_sim,
        rigid_body=sphere,
        forcing_grid=sphere_grid,
        virtual_boundary_stiffness_coeff=coupling_stiffness,
        virtual_boundary_damping_coeff=coupling_damping,
    )
    bodies = (
        RodBody(rod_interactor, collection),
        FixedRigidBody(sphere_interactor),
    )

    # ---- fused scan ----
    step = build_multi_body_fsi_step(
        flow_sim,
        bodies,
        dt_prefac=0.25,
        free_stream_fn=lambda t: jnp.asarray(velocity_free_stream, real_t),
        sub_dt=rod_dt,
    )
    carry = init_multi_body_fsi_carry(flow_sim, bodies, step)
    sparse = getattr(step, "uses_sparse_forcing", False)
    if sparse:
        logger.info("per-body sparse IBM forcing windows engaged")

    drag_scale = (
        0.5 * rho_f * u_free_stream**2 * 0.25 * np.pi * sphere_diameter**2
    )
    times, tips, drags = [], [], []
    while float(carry.time) < final_time:
        carry, diag = scan_steps(step, carry, window, donate=True)
        if sparse:
            lag_sums, windows_ok = diag
            if not bool(jnp.all(windows_ok)):
                raise RuntimeError(
                    "a body's sparse forcing window failed to cover its "
                    "support; rerun with "
                    "build_multi_body_fsi_step(..., sparse_forcing=False)"
                )
        else:
            lag_sums = diag
        t = float(carry.time)
        tip = np.asarray(carry.body_states[0].position[:, -1])
        # sphere drag from the summed Lagrangian forcing (force on body =
        # -sum lag forcing; reference flow_past_sphere_case.py:140-147)
        drag = -float(np.asarray(lag_sums[1])[-1, 0]) / drag_scale
        times.append(t)
        tips.append(tip)
        drags.append(drag)
        logger.info(
            f"time: {t:.3f}, rod tip: {tip.round(4)}, sphere Cd: {drag:.3f}"
        )
    return np.asarray(times), np.asarray(tips), np.asarray(drags)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--final-time", type=float, default=1.0)
    parser.add_argument("--grid-size-x", type=int, default=64)
    parser.add_argument("--n-elem", type=int, default=None)
    parser.add_argument("--n-devices", type=int, default=1)
    parser.add_argument("--precision", default="single")
    parser.add_argument(
        "--fast", action="store_true",
        help="fast spectral mode (sopht_mpi_tpu.enable_fast_spectral)",
    )
    parser.add_argument(
        "--no-fast", dest="no_fast", action="store_true",
        help="force the 6-pass HIGHEST spectral tier (~1e-7 solve error, "
        "~11%% slower at 256^3); default = auto (fast tier on TPU)",
    )
    args = parser.parse_args()

    if args.no_fast:
        import sopht_mpi_tpu

        sopht_mpi_tpu.enable_fast_spectral(False)
    elif args.fast:
        import sopht_mpi_tpu

        sopht_mpi_tpu.enable_fast_spectral()

    mesh = None
    if args.n_devices > 1:
        from sopht_mpi_tpu.parallel import create_mesh

        mesh = create_mesh(3, (args.n_devices, 1))
    nx = args.grid_size_x
    rod_and_sphere_case(
        n_elem=args.n_elem or nx // 8,
        grid_size=(nx // 2, nx // 2, nx),
        surface_grid_density_for_largest_element=nx // 8,
        final_time=args.final_time,
        precision=args.precision,
        mesh=mesh,
    )
