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


def test_plotter2d_sharded_field_and_reuse(tmp_path):
    """Sharded jax fields render via the host gather; clearfig allows
    figure reuse across frames (the reference's per-frame clearfig loop,
    mpi_utils_2d.py:777-809) incl. repeated colorbars."""
    import jax.numpy as jnp

    from sopht_mpi_tpu.parallel import create_mesh, shard_scalar_field
    from sopht_mpi_tpu.utils import Plotter2D

    plotter = Plotter2D(fig_size=(4, 4))
    x, y = np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16))
    mesh = create_mesh(2, (8, 1))
    field = shard_scalar_field(
        jnp.asarray(np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y),
                    jnp.float32),
        mesh,
    )
    sizes = []
    for i in range(3):  # multi-frame reuse: contourf+colorbar every frame
        plotter.contourf(jnp.asarray(x), jnp.asarray(y), field)
        out = str(tmp_path / f"frame_{i}.png")
        plotter.savefig(out)
        sizes.append(os.path.getsize(out))
        plotter.clearfig()
    assert all(s > 1000 for s in sizes)


def test_lab_cmap_diverging_endpoints():
    """The colormap keeps the reference lab_cmap's structure: blue low end,
    white center, orange high end (lab_cmap.py:1-14)."""
    from sopht_mpi_tpu.utils import lab_cmap

    lo = np.asarray(lab_cmap(0.0))
    mid = np.asarray(lab_cmap(0.5))
    hi = np.asarray(lab_cmap(1.0))
    assert lo[2] > lo[0]  # blue dominates red at the low end
    np.testing.assert_allclose(mid[:3], 1.0, atol=0.02)  # white center
    assert hi[0] > hi[2]  # red/orange dominates blue at the high end


def test_clearfig_before_any_contourf_is_safe():
    from sopht_mpi_tpu.utils import Plotter2D

    plotter = Plotter2D(fig_size=(2, 2))
    plotter.clearfig()  # no colorbar yet - must not raise
    plotter.plot([0, 1], [0, 1])
    plotter.clearfig()


def test_compile_video_assembles_frames(tmp_path, monkeypatch):
    """The post-loop movie assembly (the reference examples' ffmpeg step)
    writes a playable artifact; without ffmpeg it falls back to a GIF."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sopht_mpi_tpu.utils import compile_video

    monkeypatch.chdir(tmp_path)
    for i in range(3):
        fig = plt.figure()
        plt.plot([0, 1], [0, i])
        fig.savefig(f"snap_{i:04d}.png")
        plt.close(fig)
    out = compile_video("snap_*.png", output="flow.mp4", fps=5)
    assert out is not None and os.path.getsize(out) > 0
    assert compile_video("nomatch_*.png") is None
