"""Flapping-filament re-validation: fused rod FSI with DYNAMIC substeps."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
sys.path.insert(0, "/root/repo/examples/2d")

import flow_past_rod as fpr
from sopht_mpi_tpu.models import (
    AnalyticalLinearDamper, BaseSystemCollection, CosseratRod,
    CosseratRodElementCentricForcingGrid, CosseratRodFlowInteraction,
    GravityForces, OneEndFixedBC, UnboundedFlowSimulator2D,
    build_rod_fsi_step, init_rod_fsi_carry, scan_steps,
)
from sopht_mpi_tpu.utils import get_real_t

grid_size = (256, 512)
reynolds = 200.0
nondim_bending_stiffness = 1.5e-3
nondim_mass_ratio = 1.5
froude = 0.5
velocity_free_stream = 1.0
rho_f = 1.0
base_length = 1.0
x_range = 6.0 * base_length
grid_size_y, grid_size_x = grid_size
y_range = grid_size_y / grid_size_x * x_range
real_t = get_real_t("single")

collection = BaseSystemCollection()
n_elem = grid_size_x // 8
start = np.array([base_length, 0.501 * y_range, 0.0])
base_radius = 0.01
base_area = np.pi * base_radius**2
rod_line_density = nondim_mass_ratio * rho_f * base_length * 1.0
density = rod_line_density / base_area
moi = np.pi / 4 * base_radius**4
youngs = nondim_bending_stiffness * (rho_f * base_length**3) / moi
rod = CosseratRod.straight_rod(
    n_elem, start, np.array([1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0]),
    base_length, base_radius, density, youngs_modulus=youngs,
    shear_modulus=youngs / 1.5,
)
tip_start = np.asarray(rod.position_collection[(0, 1), -1])
collection.append(rod)
collection.constrain(rod).using(
    OneEndFixedBC, constrained_position_idx=(0,), constrained_director_idx=(0,))
g = froude * velocity_free_stream**2 / base_length
collection.add_forcing_to(rod).using(
    GravityForces, acc_gravity=np.array([g, 0.0, 0.0]))
dl = base_length / n_elem
rod_dt = 0.01 * dl
collection.dampen(rod).using(
    AnalyticalLinearDamper, damping_constant=0.5e-3, time_step=rod_dt)
collection.finalize()

nu = base_length * velocity_free_stream / reynolds
flow_sim = UnboundedFlowSimulator2D(
    grid_size=grid_size, x_range=x_range, kinematic_viscosity=nu,
    flow_type="navier_stokes_with_forcing", with_free_stream_flow=True,
    real_t=real_t)
interactor = CosseratRodFlowInteraction(
    flow_sim=flow_sim, cosserat_rod=rod,
    virtual_boundary_stiffness_coeff=-8e4,
    virtual_boundary_damping_coeff=-30.0,
    forcing_grid_cls=CosseratRodElementCentricForcingGrid)

def free_stream(t):
    ramp = jnp.exp(-t / 1.0)
    return jnp.asarray([velocity_free_stream * (1.0 - ramp),
                        0.5 * velocity_free_stream * ramp], real_t)

step = build_rod_fsi_step(
    flow_sim, interactor, collection, dt_prefac=0.5,
    free_stream_fn=free_stream, rod_dt=rod_dt, max_rod_substeps=8)
carry = init_rod_fsi_carry(flow_sim, interactor, rod)

t0 = time.perf_counter()
tips = []
while float(carry.time) < 25.0:
    carry, _ = scan_steps(step, carry, 100, donate=True)
    tip = (np.asarray(carry.rod_state.position[(0, 1), -1]) - tip_start)
    tips.append((float(carry.time), tip[0], tip[1]))
el = time.perf_counter() - t0
ys = [t[2] for t in tips if t[0] > 12.0]
print(f"wall {el:.0f}s; tip-y amplitude over t*>12: [{min(ys):+.3f}, {max(ys):+.3f}] L")
