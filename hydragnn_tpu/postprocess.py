"""Postprocessing: output denormalization and visualization.

Reference parity: ``hydragnn/postprocess/postprocess.py:13-54``
(min/max denormalization of predictions) and a matplotlib ``Visualizer``
(``postprocess/visualizer.py:24-742``) subset: parity scatter plots,
error histograms, and loss-history curves per head.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


def output_denormalize(y_minmax: Sequence[Sequence[float]], true_values, predicted_values):
    """Undo [0,1] min/max normalization per head
    (``postprocess.py:13-26``)."""
    out_t, out_p = [], []
    for ihead, (t, p) in enumerate(zip(true_values, predicted_values)):
        ymin, ymax = float(y_minmax[ihead][0]), float(y_minmax[ihead][1])
        scale = ymax - ymin
        out_t.append(np.asarray(t) * scale + ymin)
        out_p.append(np.asarray(p) * scale + ymin)
    return out_t, out_p


class Visualizer:
    """Matplotlib plots per head (reference ``visualizer.py`` subset)."""

    def __init__(self, log_dir: str, output_names: Optional[List[str]] = None):
        self.log_dir = log_dir
        self.output_names = output_names
        os.makedirs(log_dir, exist_ok=True)

    def _plt(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt

    def create_parity_plot(self, true_values, predicted_values):
        plt = self._plt()
        n = len(true_values)
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 4), squeeze=False)
        for i, (t, p) in enumerate(zip(true_values, predicted_values)):
            ax = axes[0][i]
            t = np.asarray(t).ravel()
            p = np.asarray(p).ravel()
            ax.scatter(t, p, s=4, alpha=0.5)
            lo, hi = min(t.min(), p.min()), max(t.max(), p.max())
            ax.plot([lo, hi], [lo, hi], "k--", lw=1)
            name = self.output_names[i] if self.output_names else f"head {i}"
            ax.set_title(name)
            ax.set_xlabel("true")
            ax.set_ylabel("predicted")
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "parity_plot.png"), dpi=120)
        plt.close(fig)

    def create_error_histograms(self, true_values, predicted_values):
        plt = self._plt()
        n = len(true_values)
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 4), squeeze=False)
        for i, (t, p) in enumerate(zip(true_values, predicted_values)):
            err = (np.asarray(p) - np.asarray(t)).ravel()
            axes[0][i].hist(err, bins=50)
            name = self.output_names[i] if self.output_names else f"head {i}"
            axes[0][i].set_title(f"{name} error")
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "error_histogram.png"), dpi=120)
        plt.close(fig)

    def create_scatter_plots(self, true_values, predicted_values):
        """2D-histogram density contours of predicted vs true per head
        (reference Visualizer 2D hist contour plots, visualizer.py)."""
        plt = self._plt()
        n = len(true_values)
        fig, axes = plt.subplots(1, n, figsize=(4 * n, 4), squeeze=False)
        for i, (t, p) in enumerate(zip(true_values, predicted_values)):
            t = np.asarray(t).ravel()
            p = np.asarray(p).ravel()
            h, xe, ye = np.histogram2d(t, p, bins=40)
            xc = 0.5 * (xe[:-1] + xe[1:])
            yc = 0.5 * (ye[:-1] + ye[1:])
            axes[0][i].contourf(xc, yc, h.T, levels=10, cmap="viridis")
            lo, hi = float(min(t.min(), p.min())), float(max(t.max(), p.max()))
            axes[0][i].plot([lo, hi], [lo, hi], "w--", lw=1)
            name = self.output_names[i] if self.output_names else f"head {i}"
            axes[0][i].set_title(f"{name} density")
            axes[0][i].set_xlabel("true")
            axes[0][i].set_ylabel("predicted")
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "scatter_contour.png"), dpi=120)
        plt.close(fig)

    def plot_history(self, history: List[Dict[str, float]]):
        plt = self._plt()
        fig, ax = plt.subplots(figsize=(5, 4))
        for key in ("train", "val", "test"):
            ax.plot([h["epoch"] for h in history], [h[key] for h in history],
                    label=key)
        ax.set_yscale("log")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "history.png"), dpi=120)
        plt.close(fig)
