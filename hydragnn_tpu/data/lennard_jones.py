"""Synthetic Lennard-Jones MLIP dataset.

The capability analogue of the reference's LennardJones example data
generator (``examples/LennardJones/LJ_data.py:192,347``): perturbed cubic
lattices with LJ total energy and per-atom forces, used for energy/force
training and equivariance tests.  (Supports optional PBC via minimum-image
shifts when ``periodic=True``.)
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def lj_energy_forces(pos: np.ndarray, eps: float, sigma: float, cutoff: float,
                     cell: Optional[np.ndarray] = None):
    """Total LJ energy and forces with a radial cutoff (minimum image if
    ``cell`` given)."""
    n = pos.shape[0]
    diff = pos[None, :, :] - pos[:, None, :]  # r_j - r_i
    if cell is not None:
        frac = diff @ np.linalg.inv(cell)
        frac -= np.round(frac)
        diff = frac @ cell
    dist = np.linalg.norm(diff, axis=-1)
    np.fill_diagonal(dist, np.inf)
    within = dist < cutoff
    inv = np.where(within, sigma / np.where(within, dist, 1.0), 0.0)
    inv6 = inv**6
    inv12 = inv6**2
    e_pair = 4.0 * eps * (inv12 - inv6)
    energy = 0.5 * e_pair.sum()
    # dE/dr_ij magnitude: 4 eps (-12 inv12 + 6 inv6)/r
    with np.errstate(divide="ignore", invalid="ignore"):
        coef = np.where(
            within, 4.0 * eps * (-12.0 * inv12 + 6.0 * inv6) / np.where(within, dist, 1.0), 0.0
        )
    # force on i: sum_j coef * (unit vector from j to i)... derive:
    # E = sum_{i<j} phi(|r_i - r_j|); F_i = -dE/dr_i = sum_j phi'(r) * (r_j - r_i)/r
    unit = np.where(within[..., None], diff / np.where(within, dist, 1.0)[..., None], 0.0)
    forces = (coef[..., None] * unit).sum(axis=1)
    return float(energy), forces.astype(np.float32)


def lennard_jones_data(
    number_configurations: int = 100,
    cells_per_dim: int = 2,
    spacing: float = 1.2,
    perturbation: float = 0.05,
    eps: float = 1.0,
    sigma: float = 1.0,
    cutoff: float = 3.0,
    periodic: bool = False,
    seed: int = 7,
) -> List[GraphSample]:
    rng = np.random.default_rng(seed)
    base = (
        np.stack(
            np.meshgrid(*([np.arange(cells_per_dim)] * 3), indexing="ij"), axis=-1
        ).reshape(-1, 3)
        * spacing
    )
    n = base.shape[0]
    cell = np.eye(3, dtype=np.float64) * (cells_per_dim * spacing) if periodic else None
    samples = []
    for _ in range(number_configurations):
        pos = base + rng.normal(0, perturbation, (n, 3))
        energy, forces = lj_energy_forces(pos, eps, sigma, cutoff, cell)
        samples.append(
            GraphSample(
                x=np.ones((n, 1), np.float32),
                pos=pos.astype(np.float32),
                energy=np.float32(energy),
                forces=forces,
                cell=None if cell is None else cell.astype(np.float32),
            )
        )
    return samples
