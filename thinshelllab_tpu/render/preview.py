"""Headless preview renderer (replaces the reference's Taichi GGUI window,
engine/render_engine.TaichiRender): painter's-algorithm triangle raster via
matplotlib, saving per-frame PNGs and stitching a GIF."""
from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import Poly3DCollection  # noqa: E402


def default_colors(spec):
    """Per-vertex colors following the reference palette
    (BaseScene.get_colors:1477-1487)."""
    colors = np.zeros((spec.NV, 3))
    palette = [
        (1.0, 1.0, 1.0),
        (0.23, 0.66, 0.9),
        (0.33, 0.33, 0.33),
    ]
    agent = [(0.22, 0.72, 0.52), (1.0, 0.334, 0.52)]
    cloth_offsets = set(spec.cloth.offsets)
    ci = 0
    ai = 0
    for b in range(spec.n_bodies):
        vs, ve = spec.body_v_start[b], spec.body_v_end[b]
        if vs in cloth_offsets:
            colors[vs:ve] = palette[min(ci, 2)]
            ci += 1
        elif any(vs == off for off in spec.gripper.pad_offset):
            colors[vs:ve] = agent[ai % 2]
            ai += 1
        else:
            colors[vs:ve] = (0.7, 0.65, 0.6)
    return colors


class PreviewRenderer:
    def __init__(self, spec, save_dir: str, camera=((-0.2, 0.2, 0.05), (0, 0, 0)),
                 lims=None, fit_pos=None):
        self.spec = spec
        self.save_dir = save_dir
        self.colors = default_colors(spec)
        self.camera = camera
        if lims is None and fit_pos is not None:
            p = np.asarray(fit_pos)
            lo, hi = p.min(axis=0), p.max(axis=0)
            c = 0.5 * (lo + hi)
            half = max(float((hi - lo).max()) * 0.6, 0.01)
            lims = tuple((float(c[d] - half), float(c[d] + half)) for d in range(3))
        self.lims = lims or ((-0.08, 0.08), (-0.08, 0.08), (-0.03, 0.06))
        self.saved = []
        os.makedirs(save_dir, exist_ok=True)

    def set_save_dir(self, d):
        self.save_dir = d
        self.saved = []
        os.makedirs(d, exist_ok=True)

    def render(self, pos: np.ndarray, name: str):
        pos = np.asarray(pos)
        faces = np.asarray(self.spec.faces)
        fig = plt.figure(figsize=(6, 6), dpi=100)
        ax = fig.add_subplot(projection="3d")
        tris = pos[faces]
        # painter order by camera-depth of centroids
        cam = np.asarray(self.camera[0])
        cent = tris.mean(axis=1)
        order = np.argsort(-np.linalg.norm(cent - cam, axis=1))
        fc = self.colors[faces[:, 0]]
        coll = Poly3DCollection(tris[order], facecolors=fc[order],
                                edgecolors="none")
        ax.add_collection3d(coll)
        ax.set_xlim(*self.lims[0])
        ax.set_ylim(*self.lims[1])
        ax.set_zlim(*self.lims[2])
        ax.view_init(elev=20, azim=-60)
        ax.set_axis_off()
        path = os.path.join(self.save_dir, f"{name}.png")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        self.saved.append(path)
        return path

    def end_rendering(self, tag=0, duration=0.02):
        """Stitch saved frames into a GIF (reference TaichiRender:151-194)."""
        try:
            import imageio.v2 as imageio
        except ImportError:
            import imageio
        frames = [imageio.imread(p) for p in self.saved]
        if not frames:
            return None
        gif = os.path.join(self.save_dir, f"GIF_{tag}.gif")
        imageio.mimsave(gif, frames, format="GIF", duration=duration)
        return gif
