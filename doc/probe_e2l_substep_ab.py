"""A/B: substep E->L interpolation, windowed separable-matmul vs plain
XLA support gather, at the 256^3-class rod-bench shapes (window
(181, 64, 181) ~ 2.1M cells, 2560 markers). Sets the
fsi._GATHER_SUBSTEP_WINDOW_CELLS crossover: the mm costs
O(n * window_cells) MACs per call while the gather reads only
n * (2w)^3 cells of the full field. Run on the real chip:
``python doc/probe_e2l_substep_ab.py``."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from sopht_mpi_tpu.ops.virtual_boundary import (
    VirtualBoundaryForcingParams, VirtualBoundaryState,
    compute_interaction_force_on_lag_grid,
)
from sopht_mpi_tpu.ops.ibm import (
    axis_delta_weight_matrices, nearest_grid_index_and_support,
    eulerian_to_lagrangian_interpolation_mm,
)

nz, ny, nx = 256, 64, 256
Wz, Wy, Wx = 181, 64, 181
n = 2560
dx = 1.8 / nx
rng = np.random.default_rng(0)
vel = jnp.asarray(rng.standard_normal((3, nz, ny, nx)), jnp.float32)
# markers inside a box well interior
pos = np.empty((3, n), np.float32)
pos[0] = rng.uniform(0.3, 0.9, n)   # x
pos[1] = rng.uniform(0.1, 0.3, n)   # y
pos[2] = rng.uniform(0.3, 0.9, n)   # z
lagp = jnp.asarray(pos)
lagv = jnp.zeros((3, n), jnp.float32)
params = VirtualBoundaryForcingParams(
    virtual_boundary_stiffness_coeff=-2e5,
    virtual_boundary_damping_coeff=-1e2,
    grid_dim=3, dx=dx, eul_grid_coord_shift=dx / 2, interp_kernel_width=2,
    delta_kind="cosine",
)
state = VirtualBoundaryState(position_mismatch=jnp.zeros((3, n), jnp.float32), time=jnp.zeros(()))

n_xyz = jnp.asarray([nx, ny, nz], jnp.int32)
w_xyz = jnp.asarray([Wx, Wy, Wz], jnp.int32)

def windowed(lagp, vel):
    _, sidx, sdisp = nearest_grid_index_and_support(
        lagp, params.dx, params.eul_grid_coord_shift, params.interp_kernel_width)
    mins = sidx.min(axis=(1, 2)); start = jnp.clip(mins - 2, 0, n_xyz - w_xyz)
    shifted = sidx - start[:, None, None]
    mats = axis_delta_weight_matrices(shifted, sdisp, params.dx, (Wz, Wy, Wx), "cosine")
    zero = jnp.zeros((), start.dtype)
    win = jax.lax.dynamic_slice(vel, (zero, start[2], start[1], start[0]), (3, Wz, Wy, Wx))
    return eulerian_to_lagrangian_interpolation_mm(win, mats, params.dx)

def gathered(lagp, vel):
    out = compute_interaction_force_on_lag_grid(state, vel, lagp, lagv, params)
    return out.flow_velocity

jw = jax.jit(windowed); jg = jax.jit(gathered)
a = jw(lagp, vel); b = jg(lagp, vel)
jax.block_until_ready((a, b))
print("max diff:", float(jnp.abs(a - b).max()), flush=True)

for name, f in [("window_mm", jw), ("gather", jg)]:
    f(lagp, vel).block_until_ready()
    t0 = time.perf_counter()
    N = 57
    for _ in range(N):
        r = f(lagp, vel)
    r.block_until_ready()
    t1 = time.perf_counter()
    print(f"{name}: {(t1-t0)/N*1e3:.4f} ms/call  (x19 = {(t1-t0)/N*19*1e3:.2f} ms/step)", flush=True)
