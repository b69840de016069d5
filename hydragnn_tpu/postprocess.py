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

    # --- extended surface (reference visualizer.py full-742-LoC parity) ---

    def create_global_analysis(self, true_values, predicted_values):
        """Per head: predicted-vs-true 2D-histogram density contour next to
        the conditional mean |error| over true-value bins (the reference
        ``create_plot_global_analysis`` + ``__hist2d_contour`` +
        ``__err_condmean``, visualizer.py:83-279)."""
        plt = self._plt()
        n = len(true_values)
        fig, axes = plt.subplots(2, n, figsize=(4 * n, 8), squeeze=False)
        for i, (t, p) in enumerate(zip(true_values, predicted_values)):
            t = np.asarray(t).ravel()
            p = np.asarray(p).ravel()
            h, xe, ye = np.histogram2d(t, p, bins=40)
            xc = 0.5 * (xe[:-1] + xe[1:])
            yc = 0.5 * (ye[:-1] + ye[1:])
            axes[0][i].contour(xc, yc, h.T, levels=8, cmap="magma")
            lo, hi = float(min(t.min(), p.min())), float(max(t.max(), p.max()))
            axes[0][i].plot([lo, hi], [lo, hi], "k--", lw=1)
            name = self.output_names[i] if self.output_names else f"head {i}"
            axes[0][i].set_title(f"{name} density contour")
            # conditional mean absolute error per true-value bin
            err = np.abs(p - t)
            bins = np.linspace(t.min(), t.max() + 1e-12, 25)
            idx = np.clip(np.digitize(t, bins) - 1, 0, len(bins) - 2)
            sums = np.bincount(idx, weights=err, minlength=len(bins) - 1)
            cnts = np.maximum(np.bincount(idx, minlength=len(bins) - 1), 1)
            centers = 0.5 * (bins[:-1] + bins[1:])
            axes[1][i].plot(centers, sums / cnts, "o-")
            axes[1][i].set_xlabel("true")
            axes[1][i].set_ylabel("mean |error|")
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "global_analysis.png"), dpi=120)
        plt.close(fig)

    def create_parity_plot_vector(self, true_values, predicted_values, dims):
        """Component-wise parity for vector heads (reference
        ``create_parity_plot_vector`` / ``..._per_node_vector``,
        visualizer.py:467-613)."""
        plt = self._plt()
        heads = [i for i, d in enumerate(dims) if d > 1]
        if not heads:
            return
        maxd = max(dims[i] for i in heads)
        fig, axes = plt.subplots(
            len(heads), maxd, figsize=(3.2 * maxd, 3.2 * len(heads)),
            squeeze=False,
        )
        for r, i in enumerate(heads):
            t = np.asarray(true_values[i]).reshape(-1, dims[i])
            p = np.asarray(predicted_values[i]).reshape(-1, dims[i])
            for c in range(dims[i]):
                ax = axes[r][c]
                ax.scatter(t[:, c], p[:, c], s=3, alpha=0.4)
                lo = float(min(t[:, c].min(), p[:, c].min()))
                hi = float(max(t[:, c].max(), p[:, c].max()))
                ax.plot([lo, hi], [lo, hi], "k--", lw=1)
                name = (
                    self.output_names[i] if self.output_names else f"head {i}"
                )
                ax.set_title(f"{name}[{c}]")
        fig.tight_layout()
        fig.savefig(
            os.path.join(self.log_dir, "parity_plot_vector.png"), dpi=120
        )
        plt.close(fig)

    def create_error_histogram_per_node_count(
        self, errors, nodes_per_sample
    ):
        """Error distribution grouped by graph size (reference
        ``create_error_histogram_per_node``, visualizer.py:387-466)."""
        plt = self._plt()
        errors = np.asarray(errors).ravel()
        nodes = np.asarray(nodes_per_sample).ravel()
        qs = np.quantile(nodes, [0.0, 1 / 3, 2 / 3, 1.0])
        fig, axes = plt.subplots(1, 3, figsize=(12, 4), squeeze=False)
        for i in range(3):
            m = (nodes >= qs[i]) & (nodes <= qs[i + 1])
            axes[0][i].hist(errors[m], bins=40)
            axes[0][i].set_title(
                f"{int(qs[i])} <= nodes <= {int(qs[i + 1])}"
            )
        fig.tight_layout()
        fig.savefig(
            os.path.join(self.log_dir, "error_by_graph_size.png"), dpi=120
        )
        plt.close(fig)

    def num_nodes_plot(self, nodes_per_sample):
        """Graph-size histogram (reference ``num_nodes_plot``,
        visualizer.py:734-742)."""
        plt = self._plt()
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.hist(np.asarray(nodes_per_sample).ravel(), bins=30)
        ax.set_xlabel("nodes per graph")
        ax.set_ylabel("count")
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "num_nodes.png"), dpi=120)
        plt.close(fig)

    def plot_task_history(self, history, task_names=None):
        """Per-task loss curves (reference ``plot_history``'s per-head
        panels, visualizer.py:629-691); entries carry ``*_tasks`` lists."""
        rows = [h for h in history if "train_tasks" in h or "test_tasks" in h]
        if not rows:
            return
        key = "train_tasks" if "train_tasks" in rows[0] else "test_tasks"
        ntask = len(rows[0][key])
        plt = self._plt()
        fig, axes = plt.subplots(
            1, ntask, figsize=(4 * ntask, 4), squeeze=False
        )
        for t in range(ntask):
            axes[0][t].plot(
                [h["epoch"] for h in rows], [h[key][t] for h in rows]
            )
            axes[0][t].set_yscale("log")
            name = (
                task_names[t]
                if task_names and t < len(task_names)
                else f"task {t}"
            )
            axes[0][t].set_title(name)
            axes[0][t].set_xlabel("epoch")
        fig.tight_layout()
        fig.savefig(os.path.join(self.log_dir, "task_history.png"), dpi=120)
        plt.close(fig)
