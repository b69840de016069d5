"""Deterministic synthetic BCC-lattice dataset.

Re-derivation of the reference test-fixture generator
(``tests/deterministic_graph_data.py:20-173``): random BCC supercells with
integer node types f, nodal outputs x (KNN-smoothed f), x^2 + f, x^3, and
graph output sum(x) + sum(x^2 + f) + sum(x^3).  The reference writes LSMS
text files and re-parses them; here samples are produced directly (the
LSMS text reader in data/lsms.py covers the file format itself).

Column layout of ``x_raw`` matches the reference LSMS table
(``deterministic_graph_data.py:136-146`` minus id/pos): after the LSMS
charge-density update (``lsmsdataset.py:66-81``: col1 -= col0) the usable
feature columns are [f, x, x^2, x^3] here indexed 0..3; the reference
config's ``column_index`` [0, 6, 7] maps to our indices [0, 2, 3].
"""

from __future__ import annotations

from typing import List

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def _knn_mean(pos: np.ndarray, values: np.ndarray, k: int) -> np.ndarray:
    """Uniform-weight KNN regression prediction at the training points
    (sklearn KNeighborsRegressor semantics: the k nearest include self)."""
    n = pos.shape[0]
    k = min(k, n)
    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    nn_idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return values[nn_idx].mean(axis=1)


def deterministic_graph_data(
    number_configurations: int = 500,
    unit_cell_x_range=(1, 3),
    unit_cell_y_range=(1, 3),
    unit_cell_z_range=(1, 2),
    number_types: int = 3,
    number_neighbors: int = 2,
    linear_only: bool = False,
    seed: int = 97,
) -> List[GraphSample]:
    rng = np.random.default_rng(seed)
    ucx = rng.integers(unit_cell_x_range[0], unit_cell_x_range[1], number_configurations)
    ucy = rng.integers(unit_cell_y_range[0], unit_cell_y_range[1], number_configurations)
    ucz = rng.integers(unit_cell_z_range[0], unit_cell_z_range[1], number_configurations)

    samples = []
    for c in range(number_configurations):
        nx, ny, nz = int(ucx[c]), int(ucy[c]), int(ucz[c])
        n = 2 * nx * ny * nz
        # BCC: corner at (x,y,z), body center at (+0.5,+0.5,+0.5)
        corners = np.stack(
            np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"),
            axis=-1,
        ).reshape(-1, 3).astype(np.float64)
        pos = np.empty((n, 3), np.float64)
        pos[0::2] = corners
        pos[1::2] = corners + 0.5

        f = rng.integers(0, number_types, (n, 1)).astype(np.float64)
        if linear_only:
            x_out = f.copy()
        else:
            x_out = _knn_mean(pos, f, number_neighbors)
        x2_out = x_out**2 + f
        x3_out = x_out**3

        if linear_only:
            total = float(x_out.sum())
        else:
            total = float(x_out.sum() + x2_out.sum() + x3_out.sum())

        # Configured node-feature columns, matching reference ``data.x`` for
        # the unit_test config after LSMS parse (column_index [0,6,7]) and
        # charge-density update (col1 -= col0): [f, x^2, x^3].
        x_raw = np.concatenate([f, x2_out - f, x3_out], axis=1).astype(np.float32)
        samples.append(
            GraphSample(
                x=x_raw,  # selection applied later by pipeline.select_variables
                pos=pos.astype(np.float32),
                x_raw=x_raw,
                y_raw=np.asarray([total], np.float32),
            )
        )
    return samples
