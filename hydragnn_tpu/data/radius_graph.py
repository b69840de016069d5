"""Host-side radius-graph construction (preprocessing).

Re-derivation of the reference's PyG ``RadiusGraph`` wrapper
(``hydragnn/preprocess/graph_samples_checks_and_updates.py:112-141``) and
the edge-length attribute path (``Distance(norm=False, cat=True)`` +
global-max normalization, ``abstractrawdataset.py:358-387``).

PBC variant (vesin semantics, ``graph_samples_checks_and_updates.py:144-417``)
lives in data/pbc.py.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def radius_graph(
    pos: np.ndarray,
    radius: float,
    max_neighbours: Optional[int] = None,
    loop: bool = False,
) -> np.ndarray:
    """Directed edges (j -> i) for all pairs with ||r_i - r_j|| <= radius.

    Neighbours of each receiver are sorted by distance and truncated at
    ``max_neighbours`` (vesin/reference semantics: keep the closest).
    Returns edge_index [2, e] with rows (senders, receivers).
    """
    n = pos.shape[0]
    if n == 0:
        return np.zeros((2, 0), dtype=np.int64)
    if not loop:
        from hydragnn_tpu.native import radius_graph_open_native

        native = radius_graph_open_native(pos, radius, max_neighbours)
        if native is not None:
            return native
    diff = pos[None, :, :] - pos[:, None, :]  # [i, j, 3]: r_j - r_i
    dist = np.linalg.norm(diff, axis=-1)  # [i, j]
    within = dist <= radius
    if not loop:
        np.fill_diagonal(within, False)

    senders: List[int] = []
    receivers: List[int] = []
    for i in range(n):
        nbrs = np.nonzero(within[i])[0]
        if max_neighbours is not None and len(nbrs) > max_neighbours:
            order = np.argsort(dist[i, nbrs], kind="stable")
            nbrs = nbrs[order[:max_neighbours]]
        senders.extend(int(j) for j in nbrs)
        receivers.extend([i] * len(nbrs))
    return np.asarray([senders, receivers], dtype=np.int64).reshape(2, -1)


def add_spherical_coordinates(samples: List[GraphSample]) -> None:
    """PyG ``Spherical(norm=False, cat=False)`` analogue (reference
    ``abstractrawdataset.py:130-137``): edge_attr = (rho, theta, phi) of
    the edge vector."""
    for s in samples:
        vec = s.pos[s.edge_index[1]] - s.pos[s.edge_index[0]]
        if s.edge_shifts is not None:
            vec = vec + s.edge_shifts
        rho = np.linalg.norm(vec, axis=-1)
        theta = np.arctan2(vec[:, 1], vec[:, 0])
        theta = np.where(theta < 0, theta + 2 * np.pi, theta)
        safe = np.where(rho > 0, rho, 1.0)
        phi = np.arccos(np.clip(vec[:, 2] / safe, -1.0, 1.0))
        s.edge_attr = np.stack([rho, theta, phi], axis=-1).astype(np.float32)


def add_point_pair_features(samples: List[GraphSample]) -> None:
    """PyG ``PointPairFeatures(cat=False)`` analogue (reference
    ``abstractrawdataset.py:137``): edge_attr = the 4 rotation-invariant
    point-pair features (Rusu et al. PPF)

        [ ||d||, angle(n_i, d), angle(n_j, d), angle(n_i, n_j) ]

    with angle(a, b) = atan2(||a x b||, a.b).  Requires per-node normals
    in ``sample.norm`` [n, 3] (PyG's ``data.norm`` requirement)."""
    for s in samples:
        if s.norm is None:
            raise ValueError(
                "PointPairFeatures requires per-node normals (sample.norm)"
            )
        snd, rcv = s.edge_index[0], s.edge_index[1]
        d = s.pos[rcv] - s.pos[snd]
        if s.edge_shifts is not None:
            d = d + s.edge_shifts
        n_i, n_j = s.norm[snd], s.norm[rcv]

        def angle(a, b):
            return np.arctan2(
                np.linalg.norm(np.cross(a, b), axis=-1),
                np.sum(a * b, axis=-1),
            )

        s.edge_attr = np.stack(
            [np.linalg.norm(d, axis=-1), angle(n_i, d), angle(n_j, d),
             angle(n_i, n_j)],
            axis=-1,
        ).astype(np.float32)


def add_edge_lengths(samples: List[GraphSample], normalize_max: bool = True) -> float:
    """Append edge length as (or to) edge_attr; divide by the global max
    across the dataset (reference ``abstractrawdataset.py:366-387`` /
    ``serialized_dataset_loader.py:152-173``). Returns the max length."""
    max_len = 0.0
    lengths = []
    for s in samples:
        vec = s.pos[s.edge_index[1]] - s.pos[s.edge_index[0]]
        if s.edge_shifts is not None:
            vec = vec + s.edge_shifts
        ln = np.linalg.norm(vec, axis=-1, keepdims=True)
        lengths.append(ln)
        if ln.size:
            max_len = max(max_len, float(ln.max()))
    denom = max_len if (normalize_max and max_len > 0) else 1.0
    for s, ln in zip(samples, lengths):
        attr = ln / denom
        if s.edge_attr is not None:
            attr = np.concatenate([s.edge_attr, attr], axis=-1)
        s.edge_attr = attr.astype(np.float32)
    return max_len
