"""Elementwise field ops.

Counterparts of the sopht pystencils elementwise kernels the reference
imports (set/add/copy/saxpby/cross/complex-product; see SURVEY.md section
2.2). Under XLA these are trivial fused jnp expressions - they exist as
named functions for API parity and readability.
"""

from __future__ import annotations

import jax.numpy as jnp


def set_fixed_val(field, fixed_val):
    return jnp.full_like(field, fixed_val)


def add_fixed_val(field, fixed_vals):
    """Add per-component constants to a vector field (used for free-stream
    velocity, flow_simulators_mpi_2d.py:225-236)."""
    vals = jnp.asarray(fixed_vals, dtype=field.dtype)
    return field + vals.reshape((-1,) + (1,) * (field.ndim - 1))


def saxpby(field_1, field_1_prefac, field_2, field_2_prefac):
    return field_1_prefac * field_1 + field_2_prefac * field_2


def cross_product_3d(field_1, field_2):
    """Elementwise cross product of two (3, nz, ny, nx) vector fields,
    components ordered (x, y, z)."""
    x1, y1, z1 = field_1[0], field_1[1], field_1[2]
    x2, y2, z2 = field_2[0], field_2[1], field_2[2]
    return jnp.stack(
        [y1 * z2 - z1 * y2, z1 * x2 - x1 * z2, x1 * y2 - y1 * x2]
    )
