"""Literal-constant unit oracles derived BY HAND from the reference's
kernel definitions (VERDICT r03 next #7): expected outputs on tiny grids
are hand-evaluated from the reference's exact arithmetic and pinned as
literal constants, so parity with the reference's formulas no longer
rests solely on integration-level physics.

Sources of the hand evaluations (formulas copied onto paper, not code):
- sponge penalisation: /root/reference/sopht_mpi/numeric/eulerian_grid_ops/
  stencil_ops_2d/penalise_field_boundary_mpi_2d.py:44-171 (clamp band to
  its inner-edge cell, multiply by sin((pi/2)/(width dx) * distance);
  x first, then y)
- Laplacian filter: .../stencil_ops_3d/laplacian_filter_mpi_3d.py:62-99
  (flux = 0.25 (2 f0 - f+1 - f-1) per axis) and :267-385 (multiplicative
  x->y->z with per-pass boundary clearing; convolution per-axis)
- delta weights: /root/reference/sopht_mpi/numeric/immersed_boundary_ops/
  EulerianLagrangianGridCommunicatorMPI2D.py:389-518 (cosine and
  Peskin 2002 eq. 6.27)
- diffusion flux: prefactor * 5-point laplacian with the physical-wall
  band zeroed (.../stencil_ops_2d/diffusion_flux_mpi_2d.py:118-140)
- ENO3 reconstruction: the serial kernels live in the external `sopht`
  dependency (not in the reference tree), so the pinned constants are
  hand-evaluated from the published 3rd-order ENO cell-face coefficients
  (Shu 1997: (2,-7,11)/6, (-1,5,2)/6, (2,5,-1)/6 with undivided-difference
  stencil selection) that sopht's pystencils kernel implements
  (import site: .../stencil_ops_2d/advection_flux_mpi_2d.py:8).
"""

import jax.numpy as jnp
import numpy as np

# sin(pi/4): the width=2 sponge ramp's only nontrivial constant
S = 0.7071067811865476


def test_sponge_penalise_2d_literal_ramp_and_clamp():
    from sopht_mpi_tpu.ops import penalise_field_boundary_2d

    # f[y, x] = x: exercises the clamp (band cells take the edge cell's
    # VALUE before ramping) and both ramps
    f = jnp.tile(jnp.arange(6.0), (6, 1))
    out = np.asarray(penalise_field_boundary_2d(f, 2))
    # x-pass (reference order: x first): cols -> [1*0, 1*S, 2, 3, 4*S, 4*0]
    row = np.array([0.0, S, 2.0, 3.0, 4.0 * S, 0.0])
    # y-pass: rows scaled by [0, S, 1, 1, S, 0], clamped to row 1 / row 4
    # (all rows equal here, so the clamp is value-neutral)
    expected = np.array([0.0, S, 1.0, 1.0, S, 0.0])[:, None] * row[None, :]
    np.testing.assert_allclose(out, expected, atol=1e-6)
    # corner literal: (1,1) cell = 1 * S * S = 0.5 exactly
    np.testing.assert_allclose(out[1, 1], 0.5, atol=1e-7)


def test_sponge_penalise_2d_literal_clamp_sources():
    from sopht_mpi_tpu.ops import penalise_field_boundary_2d

    # f[y, x] = y * 10 (constant along x): the x-pass clamp must copy the
    # x-band from column 1 / column -2 (same values here), the y-pass must
    # copy rows 0-1 from ROW 1 and rows -2..-1 from ROW -2 before ramping
    f = (10.0 * jnp.arange(6.0))[:, None] * jnp.ones((1, 6))
    out = np.asarray(penalise_field_boundary_2d(f, 2))
    col = np.array([0.0, 10.0 * S, 20.0, 30.0, 40.0 * S, 0.0])
    expected = col[:, None] * np.array([0.0, S, 1.0, 1.0, S, 0.0])[None, :]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_laplacian_filter_3d_multiplicative_literal_spike():
    from sopht_mpi_tpu.ops import laplacian_filter_3d

    # unit spike at (2,2,2) of a 6^3 grid: one multiplicative application
    # is separable, out = delta - s(z) s(y) s(x) with s(0) = 0.5,
    # s(+-1) = -0.25 (hand evaluation of Hz Hy Hx delta; the per-pass
    # wall clearing never touches cells in [1,3]^3)
    f = jnp.zeros((6, 6, 6)).at[2, 2, 2].set(1.0)
    out = np.asarray(laplacian_filter_3d(f, 1, "multiplicative"))
    s = np.array([-0.25, 0.5, -0.25])
    expected = np.zeros((6, 6, 6))
    expected[1:4, 1:4, 1:4] = -s[:, None, None] * s[None, :, None] * s[None, None, :]
    expected[2, 2, 2] += 1.0
    np.testing.assert_allclose(out, expected, atol=1e-7)
    # literal spot values
    np.testing.assert_allclose(out[2, 2, 2], 0.875, atol=1e-7)  # 1 - 0.5^3
    np.testing.assert_allclose(out[2, 2, 1], 0.0625, atol=1e-7)  # -0.5*0.5*(-0.25)
    np.testing.assert_allclose(out[2, 1, 1], -0.03125, atol=1e-7)
    np.testing.assert_allclose(out[1, 1, 1], 0.015625, atol=1e-7)  # -(-0.25)^3


def test_laplacian_filter_3d_convolution_literal_spike():
    from sopht_mpi_tpu.ops import laplacian_filter_3d

    # convolution type, order 1: out = (I - Hz)(I - Hy)(I - Hx) delta =
    # separable t(z) t(y) t(x) with t(0) = 0.5, t(+-1) = 0.25
    f = jnp.zeros((6, 6, 6)).at[2, 2, 2].set(1.0)
    out = np.asarray(laplacian_filter_3d(f, 1, "convolution"))
    t = np.array([0.25, 0.5, 0.25])
    expected = np.zeros((6, 6, 6))
    expected[1:4, 1:4, 1:4] = t[:, None, None] * t[None, :, None] * t[None, None, :]
    np.testing.assert_allclose(out, expected, atol=1e-7)
    np.testing.assert_allclose(out[2, 2, 2], 0.125, atol=1e-7)  # 0.5^3
    np.testing.assert_allclose(out[1, 1, 1], 0.015625, atol=1e-7)  # 0.25^3


def test_cosine_delta_weights_literal():
    from sopht_mpi_tpu.ops.ibm import (
        cosine_delta_weights_1d,
        interpolation_weights,
    )

    # per-axis factor at |d| = dx/2: (0.25/dx)(1 + cos(pi/4))
    for dx in (1.0, 0.5):
        w = float(cosine_delta_weights_1d(jnp.asarray(0.5 * dx), dx))
        np.testing.assert_allclose(w, (0.25 / dx) * (1.0 + S), atol=1e-6)
    # full 2D tensor weight at displacement (0.5, -0.5), dx = 1:
    # 0.0625 (1 + cos(pi/4))^2 = 0.18213834764831845
    disp = jnp.asarray([0.5, -0.5]).reshape(2, 1, 1)
    w2 = np.asarray(interpolation_weights(disp, 1.0, kind="cosine"))
    np.testing.assert_allclose(w2.ravel()[0], 0.18213834764831845, atol=1e-6)
    # zero displacement: (0.25 * 2)^2 = 0.25
    disp0 = jnp.zeros((2, 1, 1))
    w0 = np.asarray(interpolation_weights(disp0, 1.0, kind="cosine"))
    np.testing.assert_allclose(w0.ravel()[0], 0.25, atol=1e-7)


def test_peskin_delta_weights_literal():
    from sopht_mpi_tpu.ops.ibm import (
        interpolation_weights,
        peskin_delta_weights_1d,
    )

    dx = 1.0
    # r = 0:   0.125 (3 + sqrt(1)) = 0.5
    # r = 0.5: 0.125 (2 + sqrt(2))
    # r = 1.5: 0.125 (2 - sqrt(2))
    # r = 2:   0 (outside support)
    vals = np.asarray(
        peskin_delta_weights_1d(jnp.asarray([0.0, 0.5, -1.5, 2.0]), dx)
    )
    np.testing.assert_allclose(vals[0], 0.5, atol=1e-7)
    np.testing.assert_allclose(vals[1], 0.125 * (2.0 + np.sqrt(2.0)), atol=1e-7)
    np.testing.assert_allclose(vals[2], 0.125 * (2.0 - np.sqrt(2.0)), atol=1e-7)
    np.testing.assert_allclose(vals[3], 0.0, atol=1e-7)
    # 2D weight at (0.5, 1.5): 0.125^2 (2+sqrt2)(2-sqrt2) = 0.03125 EXACTLY
    disp = jnp.asarray([0.5, 1.5]).reshape(2, 1, 1)
    w2 = np.asarray(interpolation_weights(disp, dx, kind="peskin"))
    np.testing.assert_allclose(w2.ravel()[0], 0.03125, atol=1e-7)


def test_diffusion_flux_2d_literal_spike():
    from sopht_mpi_tpu.ops import diffusion_flux_2d

    # unit spike at (3,3) of an 8x8 grid, prefactor 0.7: flux is the
    # 5-point laplacian scaled - -4*0.7 at the spike, +0.7 at the four
    # neighbors; the physical-wall band (width ghost+1 = 2 in the
    # reference, width 1+1 here on the ghost-free global grid) is zeroed
    f = jnp.zeros((8, 8)).at[3, 3].set(1.0)
    out = np.asarray(diffusion_flux_2d(f, jnp.float32(0.7)))
    expected = np.zeros((8, 8))
    expected[3, 3] = -2.8
    for dy, dx_ in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        expected[3 + dy, 3 + dx_] = 0.7
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_eno3_face_reconstruction_literal_constants():
    from sopht_mpi_tpu.ops._stencil_utils import _eno3_left_biased

    def face(vals):
        g = [jnp.asarray(float(v)) for v in vals]
        return float(_eno3_left_biased(*g))

    # stencil {i-1, i, i+1} (f_r1 = (-gm1 + 5 g0 + 2 gp1)/6):
    # g = [0,0,1,2,4]: d1l=1, d1r=1 -> right side; d2b=0 < d2c=1 -> f_r1
    np.testing.assert_allclose(face([0, 0, 1, 2, 4]), 1.5, atol=1e-7)
    # stencil {i-2, i-1, i} (f_r2 = (2 gm2 - 7 gm1 + 11 g0)/6):
    # g = [1,1,1,3,9]: d1l=0 < d1r=2 -> left side; d2a=0 < d2b=2 -> f_r2
    np.testing.assert_allclose(face([1, 1, 1, 3, 9]), 1.0, atol=1e-7)
    # stencil {i, i+1, i+2} (f_r0 = (2 g0 + 5 gp1 - gp2)/6):
    # g = [4,2,1,1,2]: d1l=-1, d1r=0 -> right side; d2b=1, d2c=1 (ties
    # pick f_r0) -> (2 + 5 - 2)/6 = 5/6
    np.testing.assert_allclose(face([4, 2, 1, 1, 2]), 5.0 / 6.0, atol=1e-7)
