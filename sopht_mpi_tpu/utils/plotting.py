"""Plotting helpers: diverging orange-blue colormap and a field plotter.

Counterpart of the reference's ``lab_cmap`` (sopht_mpi/utils/lab_cmap.py)
and ``MPIPlotter2D`` (mpi_utils_2d.py:715-841). In the single-controller
model no gather choreography is needed - fields are pulled to host with
``np.asarray``. Like the reference, intended for debug-scale snapshots.
"""

from __future__ import annotations

import os

import numpy as np


def _build_lab_cmap():
    from matplotlib.colors import LinearSegmentedColormap

    # diverging blue -> white -> orange (the reference's lab palette spirit)
    return LinearSegmentedColormap.from_list(
        "lab_cmap",
        [
            (0.0, (0.0, 0.27, 0.62)),
            (0.5, (1.0, 1.0, 1.0)),
            (1.0, (0.93, 0.41, 0.0)),
        ],
    )


try:  # matplotlib optional
    lab_cmap = _build_lab_cmap()
except Exception:  # pragma: no cover
    lab_cmap = None


class Plotter2D:
    """Minimal matplotlib wrapper mirroring MPIPlotter2D's surface
    (contourf/scatter/plot/savefig/clearfig). Fields may be sharded jax
    arrays; they are gathered to host for rendering. Debug-scale only
    (the reference warns the same, mpi_utils_2d.py:721-723)."""

    def __init__(self, fig_size=(10, 10), title=""):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self._plt = plt
        self.fig = plt.figure(frameon=True, dpi=150, figsize=fig_size)
        self.ax = self.fig.add_subplot(111)
        self.ax.set_title(title)
        self.ax.set_aspect(aspect="equal")

    def contourf(self, x, y, field, *args, **kwargs):
        kwargs.setdefault("cmap", lab_cmap)
        cobj = self.ax.contourf(
            np.asarray(x), np.asarray(y), np.asarray(field), *args, **kwargs
        )
        self._cbar = self.fig.colorbar(mappable=cobj, ax=self.ax)

    def scatter(self, x, y, *args, **kwargs):
        self.ax.scatter(np.asarray(x), np.asarray(y), *args, **kwargs)

    def plot(self, x, y, *args, **kwargs):
        self.ax.plot(np.asarray(x), np.asarray(y), *args, **kwargs)

    def savefig(self, file_name, *args, **kwargs):
        self.fig.savefig(
            file_name, bbox_inches="tight", pad_inches=0, *args, **kwargs
        )

    def clearfig(self):
        # remove the colorbar BEFORE clearing the axes (removing it after
        # cla() trips matplotlib's gridspec bookkeeping)
        if getattr(self, "_cbar", None) is not None:
            try:
                self._cbar.remove()
            except (AttributeError, KeyError):  # already detached
                pass
            self._cbar = None
        self.ax.cla()


def compile_video(frame_glob: str, output: str = "flow.mp4", fps: int = 10):
    """Assemble saved snapshot frames into a movie - the role of the
    reference examples' post-loop ffmpeg call
    (flow_past_cylinder.py:172-179). Uses ffmpeg when present; otherwise
    falls back to an animated GIF via Pillow (rewriting ``output``'s
    extension), so headless images without ffmpeg still produce a movie.

    :param frame_glob: glob matching the frames in order, e.g.
        ``"snap_*.png"`` (lexicographic sort = temporal order for
        zero-padded indices).
    :returns: the path actually written, or None when no frames matched.
    """
    import glob
    import shutil
    import subprocess

    frames = sorted(glob.glob(frame_glob))
    if not frames:
        return None
    if shutil.which("ffmpeg"):
        # concat demuxer: robust to arbitrary frame names
        list_file = output + ".frames.txt"

        def _entry(path):
            # concat-demuxer quoting: single quotes in the path must be
            # closed, escaped, reopened ('\'' idiom), or such paths break
            # the list parse
            quoted = os.path.abspath(path).replace("'", "'\\''")
            return f"file '{quoted}'\n"

        try:
            with open(list_file, "w") as f:
                for fr in frames:
                    f.write(_entry(fr))
                    f.write(f"duration {1.0 / fps}\n")
                # the demuxer ignores the duration after the LAST entry
                # unless the file is listed once more (ffmpeg slideshow
                # quirk) - without this the final frame flashes by
                f.write(_entry(frames[-1]))
            proc = subprocess.run(
                ["ffmpeg", "-y", "-f", "concat", "-safe", "0",
                 "-i", list_file,
                 "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
                 "-pix_fmt", "yuv420p", output],
                capture_output=True, text=True,
            )
        finally:
            if os.path.exists(list_file):
                os.remove(list_file)
        if proc.returncode == 0:
            return output
        # a present-but-failing ffmpeg (codec build, unwritable output)
        # must not crash a finished run: log and degrade to the GIF path
        from sopht_mpi_tpu.utils.logging_utils import logger

        logger.warning(
            f"ffmpeg failed (rc={proc.returncode}): "
            f"{proc.stderr.strip().splitlines()[-1] if proc.stderr else ''}"
            " - falling back to an animated GIF"
        )
    # Pillow GIF fallback - optional too: a host with neither ffmpeg nor
    # Pillow must not raise at the end of an otherwise-finished run
    try:
        from PIL import Image
    except ImportError:
        from sopht_mpi_tpu.utils.logging_utils import logger

        logger.warning(
            "movie assembly skipped: neither ffmpeg nor Pillow available "
            f"(frames remain on disk: {frame_glob})"
        )
        return None

    gif = os.path.splitext(output)[0] + ".gif"
    imgs = []
    for fr in frames:
        with Image.open(fr) as im:
            imgs.append(im.convert("P"))  # convert() copies; file closes
    imgs[0].save(
        gif, save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return gif
