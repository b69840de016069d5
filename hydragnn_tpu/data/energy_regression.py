"""Per-element atomic-energy linear regression.

Reference parity: ``hydragnn/preprocess/energy_linear_regression.py``
(``solve_least_squares_svd`` :19): fit total energy ~ sum_Z n_Z * e_Z by
least squares over the dataset and subtract the baseline per sample --
the standard MLIP energy-reference removal.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def solve_least_squares_svd(
    composition: np.ndarray, energies: np.ndarray
) -> np.ndarray:
    """x minimizing ||A x - b|| via SVD with small-singular-value cutoff
    (reference :19-55 semantics)."""
    u, s, vt = np.linalg.svd(composition, full_matrices=False)
    cutoff = max(composition.shape) * np.finfo(np.float64).eps * (s[0] if len(s) else 1.0)
    s_inv = np.where(s > cutoff, 1.0 / np.where(s > cutoff, s, 1.0), 0.0)
    return vt.T @ (s_inv * (u.T @ energies))


def fit_linear_energies(
    samples: Sequence[GraphSample], num_elements: int = 118
) -> np.ndarray:
    """Returns per-element reference energies e[Z-1]."""
    rows, b = [], []
    for s in samples:
        z = np.clip(np.round(np.asarray(s.x[:, 0])).astype(int), 1, num_elements)
        rows.append(np.bincount(z - 1, minlength=num_elements))
        b.append(float(s.energy))
    A = np.asarray(rows, np.float64)
    return solve_least_squares_svd(A, np.asarray(b, np.float64))


def subtract_linear_energies(
    samples: Sequence[GraphSample], coeffs: np.ndarray
) -> None:
    for s in samples:
        z = np.clip(np.round(np.asarray(s.x[:, 0])).astype(int), 1, len(coeffs))
        baseline = float(coeffs[z - 1].sum())
        s.energy = np.float32(float(s.energy) - baseline)
