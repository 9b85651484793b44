"""Small API-contract tests: kernel-support constants (the reference
asserts these in every op test) and the EmptyForcingGrid stub."""

import jax.numpy as jnp
import numpy as np

from sopht_mpi_tpu.models import EmptyForcingGrid
from sopht_mpi_tpu.ops import stencils_2d, stencils_3d
from sopht_mpi_tpu.ops.ibm import INTERP_KERNEL_WIDTH


def test_kernel_support_constants():
    """Stencil support widths match the reference's kernel_support values
    (diffusion/curl/divergence = 1, ENO3 advection = 2, IBM delta = 2;
    SURVEY.md section 2.2)."""
    for mod in (stencils_2d, stencils_3d):
        assert mod.DIFFUSION_KERNEL_SUPPORT == 1
        assert mod.ADVECTION_ENO3_KERNEL_SUPPORT == 2
        assert mod.CURL_KERNEL_SUPPORT == 1
    assert stencils_3d.DIVERGENCE_KERNEL_SUPPORT == 1
    assert stencils_3d.LAPLACIAN_FILTER_KERNEL_SUPPORT == 1
    assert INTERP_KERNEL_WIDTH == 2


def test_empty_forcing_grid_is_noop():
    """Zero-node grid (the reference's non-master-rank stub,
    immersed_body_forcing_grid.py:4-26)."""
    grid = EmptyForcingGrid(grid_dim=2)
    assert grid.num_lag_nodes == 0
    assert grid.compute_lag_grid_position_field().shape == (2, 0)
    assert grid.compute_lag_grid_velocity_field().shape == (2, 0)
    forces, torques = grid.transfer_forcing_from_grid_to_body(
        jnp.zeros((2, 0))
    )
    np.testing.assert_array_equal(np.asarray(forces), 0.0)
    assert grid.get_maximum_lagrangian_grid_spacing() == 0.0
