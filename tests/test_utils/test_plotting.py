"""Plotter2D smoke test (the reference's MPIPlotter2D surface)."""

import os

import numpy as np


def test_plotter2d_renders(tmp_path):
    from sopht_mpi_tpu.utils import Plotter2D, lab_cmap

    assert lab_cmap is not None
    plotter = Plotter2D(fig_size=(4, 4), title="t")
    x, y = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
    field = np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    plotter.contourf(x, y, field)
    plotter.plot([0.2, 0.8], [0.5, 0.5], color="k")
    plotter.scatter([0.5], [0.5], s=4)
    out = str(tmp_path / "snap.png")
    plotter.savefig(out)
    plotter.clearfig()
    assert os.path.getsize(out) > 1000
