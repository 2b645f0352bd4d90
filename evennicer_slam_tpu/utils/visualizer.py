"""Per-iteration visual diagnostics: GT / rendered / residual panels.

Rebuild of reference src/utils/Visualizer.py:11-313 on matplotlib: 2x3 grids
(depth + color rows) for plain frames, 3x3 including low-res GT events,
predicted events, and residuals for the event pipeline; written to
``{tracking,mapping}_vis/{frame:05d}_{iter:04d}.jpg`` gated by
``vis_freq`` x ``vis_inside_freq``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Visualizer:
    def __init__(
        self,
        freq: int,
        inside_freq: int,
        vis_dir: str,
        renderer,
        verbose: bool = False,
    ):
        self.freq = freq
        self.inside_freq = inside_freq
        self.vis_dir = vis_dir
        self.renderer = renderer
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)

    def should_vis(self, idx: int, it: int) -> bool:
        return idx % self.freq == 0 and it % self.inside_freq == 0

    def vis(
        self,
        idx: int,
        it: int,
        gt_depth,
        gt_color,
        c2w,
        grids,
        decoders,
        gt_event=None,
        pred_event=None,
    ):
        if not self.should_vis(idx, it):
            return None
        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        gt_depth = np.asarray(gt_depth)
        gt_color = np.asarray(gt_color)
        depth, _, color = self.renderer.render_img(
            decoders, grids, jnp.asarray(np.asarray(c2w)[:3]), "color",
            gt_depth=jnp.asarray(gt_depth),
        )
        depth = np.asarray(depth)
        color = np.clip(np.asarray(color), 0, 1)
        depth_res = np.abs(gt_depth - depth)
        depth_res[gt_depth == 0] = 0
        color_res = np.abs(gt_color - color).mean(-1)

        with_events = gt_event is not None and pred_event is not None
        rows = 3 if with_events else 2
        fig, axs = plt.subplots(rows, 3, figsize=(12, 3.2 * rows))
        vmax = max(gt_depth.max(), 1e-6)
        for ax, img, title, kw in [
            (axs[0, 0], gt_depth, "GT depth", dict(cmap="plasma", vmin=0, vmax=vmax)),
            (axs[0, 1], depth, "rendered depth", dict(cmap="plasma", vmin=0, vmax=vmax)),
            (axs[0, 2], depth_res, "depth residual", dict(cmap="plasma", vmin=0, vmax=vmax)),
            (axs[1, 0], gt_color, "GT color", {}),
            (axs[1, 1], color, "rendered color", {}),
            (axs[1, 2], np.clip(color_res, 0, 1), "color residual", dict(cmap="plasma")),
        ]:
            ax.imshow(img, **kw)
            ax.set_title(title)
            ax.axis("off")
        if with_events:
            ge = _event_rgb(np.asarray(gt_event))
            pe = _event_rgb(np.asarray(pred_event))
            res = np.abs(ge.astype(float) - pe.astype(float)).astype(np.uint8)
            for ax, img, title in [
                (axs[2, 0], ge, "GT events (lo-res)"),
                (axs[2, 1], pe, "predicted events"),
                (axs[2, 2], res, "event residual"),
            ]:
                ax.imshow(img)
                ax.set_title(title)
                ax.axis("off")
        fig.tight_layout()
        path = os.path.join(self.vis_dir, f"{idx:05d}_{it:04d}.jpg")
        fig.savefig(path, dpi=80)
        plt.close(fig)
        # panel upload to an active wandb run (reference Visualizer logs
        # per-stage images, src/utils/Visualizer.py:180-213)
        try:
            import wandb

            if wandb.run is not None:
                tag = os.path.basename(self.vis_dir)
                wandb.log({f"{tag}/panel": wandb.Image(path)})
        except Exception:
            pass
        if self.verbose:
            print("Saved visualization at", path)
        return path


def _event_rgb(ev: np.ndarray) -> np.ndarray:
    """[-,+] polarity channels -> displayable RGB (neg red, pos green),
    matching the reference's event_to_image scaling (src/event_net.py:125-127)."""
    h, w = ev.shape[:2]
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.clip(ev[..., 0] * 50, 0, 255).astype(np.uint8)
    img[..., 1] = np.clip(ev[..., 1] * 50, 0, 255).astype(np.uint8)
    return img
