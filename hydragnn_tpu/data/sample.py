"""Host-side single-graph sample (numpy), the pre-padding analogue of a PyG
``Data`` object in the reference pipeline."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class GraphSample:
    x: np.ndarray  # [n, F] node features
    pos: np.ndarray  # [n, 3]
    edge_index: Optional[np.ndarray] = None  # [2, e] (senders; receivers)
    edge_attr: Optional[np.ndarray] = None  # [e, Fe]
    edge_shifts: Optional[np.ndarray] = None  # [e, 3]
    cell: Optional[np.ndarray] = None  # [3, 3]
    y_graph: Optional[np.ndarray] = None  # [sum graph-head dims]
    y_node: Optional[np.ndarray] = None  # [n, sum node-head dims]
    graph_attr: Optional[np.ndarray] = None  # [A]
    dataset_id: int = 0
    norm: Optional[np.ndarray] = None  # [n, 3] vertex normals (PPF transform)
    pe: Optional[np.ndarray] = None  # [n, pe_dim]
    rel_pe: Optional[np.ndarray] = None  # [e, pe_dim]
    energy: Optional[float] = None
    forces: Optional[np.ndarray] = None  # [n, 3]
    # raw packed features before Variables_of_interest selection
    # (mirrors reference data.x columns / data.y before update_predicted_values)
    x_raw: Optional[np.ndarray] = None
    y_raw: Optional[np.ndarray] = None
    # DimeNet triplets: local edge indices of (k->j, j->i) pairs
    trip_kj: Optional[np.ndarray] = None  # [T]
    trip_ji: Optional[np.ndarray] = None  # [T]

    @property
    def num_triplets(self) -> int:
        return 0 if self.trip_kj is None else int(self.trip_kj.shape[0])

    @property
    def num_nodes(self) -> int:
        return int(self.x.shape[0])

    @property
    def num_edges(self) -> int:
        return 0 if self.edge_index is None else int(self.edge_index.shape[1])
