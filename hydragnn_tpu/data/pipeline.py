"""Variables-of-interest selection, target packing, and dataset splitting.

Mirrors the reference preprocessing semantics:
  * ``update_predicted_values`` (``graph_samples_checks_and_updates.py:604-645``)
    -- but instead of one flat ``data.y`` + ``y_loc`` offsets, targets are
    packed per level into ``y_graph`` / ``y_node`` (see graphs.py).
  * ``update_atom_features`` (``:648-659``): input column selection.
  * ``split_dataset`` (``preprocess/load_data.py:337-357``): random split
    with perc_train, remainder split 50/50 into val/test.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def select_variables(
    samples: Sequence[GraphSample],
    var_config: Dict,
    node_feature_dims: Sequence[int],
    graph_feature_dims: Sequence[int],
) -> None:
    """In-place: build y_graph/y_node from raw features and prune x to the
    configured input features.  ``x_raw`` columns are the configured node
    features concatenated in order (reference ``data.x`` post-parse)."""
    out_types = var_config["type"]
    out_index = var_config["output_index"]
    input_feats = var_config["input_node_features"]

    node_offsets = np.concatenate([[0], np.cumsum(node_feature_dims)]).astype(int)
    graph_offsets = np.concatenate([[0], np.cumsum(graph_feature_dims)]).astype(int)
    # input column ranges from feature indices
    in_cols: List[int] = []
    for fi in input_feats:
        in_cols.extend(range(node_offsets[fi], node_offsets[fi] + node_feature_dims[fi]))

    for s in samples:
        x_raw = s.x_raw if s.x_raw is not None else s.x
        y_raw = s.y_raw
        g_parts, n_parts = [], []
        for t, idx in zip(out_types, out_index):
            if t == "graph":
                lo, hi = graph_offsets[idx], graph_offsets[idx] + graph_feature_dims[idx]
                g_parts.append(np.asarray(y_raw[lo:hi], np.float32).reshape(-1))
            elif t == "node":
                lo, hi = node_offsets[idx], node_offsets[idx] + node_feature_dims[idx]
                n_parts.append(np.asarray(x_raw[:, lo:hi], np.float32))
            else:
                raise ValueError(f"Unknown output type {t}")
        s.y_graph = np.concatenate(g_parts) if g_parts else None
        s.y_node = np.concatenate(n_parts, axis=1) if n_parts else None
        s.x = np.asarray(x_raw[:, in_cols], np.float32)


def normalize_minmax(
    samples: Sequence[GraphSample],
    node_feature_dims: Sequence[int],
    graph_feature_dims: Sequence[int],
) -> Dict[str, np.ndarray]:
    """Dataset-wide per-feature min/max normalization to [0, 1] of raw node
    features and graph targets (reference legacy raw loader
    ``preprocess/raw_dataset_loader.py:193-260``, applied unconditionally on
    the LSMS/'unit_test' path).  Returns the minmax tables used later for
    ``denormalize_output`` (``postprocess/postprocess.py:13-26``)."""
    n_nf, n_gf = len(node_feature_dims), len(graph_feature_dims)
    node_offsets = np.concatenate([[0], np.cumsum(node_feature_dims)]).astype(int)
    graph_offsets = np.concatenate([[0], np.cumsum(graph_feature_dims)]).astype(int)
    minmax_node = np.full((2, n_nf), np.inf)
    minmax_node[1] *= -1
    minmax_graph = np.full((2, n_gf), np.inf)
    minmax_graph[1] *= -1
    for s in samples:
        x_raw = s.x_raw if s.x_raw is not None else s.x
        for i in range(n_nf):
            cols = x_raw[:, node_offsets[i] : node_offsets[i + 1]]
            minmax_node[0, i] = min(minmax_node[0, i], cols.min())
            minmax_node[1, i] = max(minmax_node[1, i], cols.max())
        for i in range(n_gf):
            vals = s.y_raw[graph_offsets[i] : graph_offsets[i + 1]]
            minmax_graph[0, i] = min(minmax_graph[0, i], vals.min())
            minmax_graph[1, i] = max(minmax_graph[1, i], vals.max())

    def _div(num, den):
        return num / den if den != 0 else num

    for s in samples:
        x_raw = (s.x_raw if s.x_raw is not None else s.x).astype(np.float32).copy()
        y_raw = np.asarray(s.y_raw, np.float32).copy()
        for i in range(n_nf):
            lo, hi = node_offsets[i], node_offsets[i + 1]
            x_raw[:, lo:hi] = _div(
                x_raw[:, lo:hi] - minmax_node[0, i],
                minmax_node[1, i] - minmax_node[0, i],
            )
        for i in range(n_gf):
            lo, hi = graph_offsets[i], graph_offsets[i + 1]
            y_raw[lo:hi] = _div(
                y_raw[lo:hi] - minmax_graph[0, i],
                minmax_graph[1, i] - minmax_graph[0, i],
            )
        s.x_raw = x_raw
        s.x = x_raw
        s.y_raw = y_raw
    return {"minmax_node_feature": minmax_node, "minmax_graph_feature": minmax_graph}


def split_dataset(
    samples: Sequence[GraphSample], perc_train: float, seed: int = 0
) -> Tuple[List[GraphSample], List[GraphSample], List[GraphSample]]:
    idx = np.arange(len(samples))
    rng = np.random.default_rng(seed)
    rng.shuffle(idx)
    n_train = int(len(samples) * perc_train)
    n_val = int(len(samples) * (1.0 - perc_train) * 0.5)
    train = [samples[i] for i in idx[:n_train]]
    val = [samples[i] for i in idx[n_train : n_train + n_val]]
    test = [samples[i] for i in idx[n_train + n_val :]]
    return train, val, test


def compute_lap_pe(samples: Sequence[GraphSample], k: int) -> None:
    """Laplacian-eigenvector positional encodings + relative PE for GPS
    (reference ``serialized_dataset_loader.py:88-94,183-189``):
    pe = eigenvectors 1..k of the symmetric normalized Laplacian,
    rel_pe = |pe[src] - pe[dst]| per edge."""
    for s in samples:
        n = s.num_nodes
        A = np.zeros((n, n))
        src, dst = s.edge_index
        A[src, dst] = 1.0
        A[dst, src] = 1.0
        deg = A.sum(1)
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
        L = np.eye(n) - dinv[:, None] * A * dinv[None, :]
        _, vecs = np.linalg.eigh(L)
        pe = np.zeros((n, k), np.float32)
        avail = min(k, max(n - 1, 0))
        if avail > 0:
            pe[:, :avail] = vecs[:, 1 : 1 + avail]
        s.pe = pe
        s.rel_pe = np.abs(pe[src] - pe[dst]).astype(np.float32)


def normalize_rotation(samples: Sequence[GraphSample]) -> None:
    """PyG ``NormalizeRotation(max_points=-1, sort=False)`` analogue
    (reference ``abstractrawdataset.py:330-333``, config flag
    ``Dataset.rotational_invariance``): rotate each sample onto the
    principal axes of its centered positions (and rotate forces with it)."""
    for s in samples:
        pos = np.asarray(s.pos, np.float64)
        c = pos - pos.mean(0, keepdims=True)
        _, _, vt = np.linalg.svd(c, full_matrices=False)
        R = vt.T  # columns = principal directions
        if np.linalg.det(R) < 0:
            R[:, -1] *= -1
        s.pos = (c @ R).astype(np.float32)
        if s.forces is not None:
            s.forces = (np.asarray(s.forces, np.float64) @ R).astype(np.float32)


def sort_edges_by_receiver(samples: Sequence[GraphSample]) -> None:
    """In-place per-sample edge sort by receiver.  Because batched node ids
    are consecutive per graph, this makes the collated batch's receivers
    globally non-decreasing, enabling XLA's fast sorted-segment lowering on
    TPU (~1.7x over scatter).  Must run before triplet construction."""
    for s in samples:
        if s.edge_index is None or s.num_edges == 0:
            continue
        order = np.argsort(s.edge_index[1], kind="stable")
        s.edge_index = s.edge_index[:, order]
        if s.edge_attr is not None:
            s.edge_attr = s.edge_attr[order]
        if s.edge_shifts is not None:
            s.edge_shifts = s.edge_shifts[order]
        if s.rel_pe is not None:
            s.rel_pe = s.rel_pe[order]
        if s.trip_kj is not None:
            inv = np.empty(s.num_edges, np.int64)
            inv[order] = np.arange(s.num_edges)
            s.trip_kj = inv[s.trip_kj]
            s.trip_ji = inv[s.trip_ji]


def compositional_stratified_split(
    samples: Sequence[GraphSample], perc_train: float, seed: int = 0
) -> Tuple[List[GraphSample], List[GraphSample], List[GraphSample]]:
    """Stratified train/val/test split by element-composition category
    (reference ``utils/datasets/compositional_data_splitting.py:19-160``):
    samples are grouped by the set of node types present and each group is
    split proportionally so every composition appears in every split."""
    groups: Dict = {}
    for i, s in enumerate(samples):
        key = tuple(sorted(set(np.asarray(s.x[:, 0]).astype(int).tolist())))
        groups.setdefault(key, []).append(i)
    rng = np.random.default_rng(seed)
    tr, va, te = [], [], []
    for key in sorted(groups):
        idx = np.asarray(groups[key])
        rng.shuffle(idx)
        n_tr = int(round(len(idx) * perc_train))
        n_va = int(round(len(idx) * (1 - perc_train) * 0.5))
        tr.extend(idx[:n_tr])
        va.extend(idx[n_tr : n_tr + n_va])
        te.extend(idx[n_tr + n_va :])
    return (
        [samples[i] for i in tr],
        [samples[i] for i in va],
        [samples[i] for i in te],
    )


def gather_degree_histogram(samples: Sequence[GraphSample]) -> List[int]:
    """In-degree histogram over the dataset for PNA
    (reference ``gather_deg``, ``graph_samples_checks_and_updates.py:526-565``)."""
    max_deg = 0
    degs = []
    for s in samples:
        d = np.bincount(s.edge_index[1], minlength=s.num_nodes)
        degs.append(d)
        if d.size:
            max_deg = max(max_deg, int(d.max()))
    hist = np.zeros(max_deg + 1, np.int64)
    for d in degs:
        hist += np.bincount(d, minlength=max_deg + 1)
    return hist.tolist()


def graph_size_stats(samples: Sequence[GraphSample]) -> Dict[str, float]:
    n_nodes = [s.num_nodes for s in samples]
    n_edges = [s.num_edges for s in samples]
    return {
        "max_nodes": int(max(n_nodes)),
        "min_nodes": int(min(n_nodes)),
        "max_edges": int(max(n_edges)),
        "avg_num_neighbors": float(sum(n_edges) / max(sum(n_nodes), 1)),
        "variable_size": len(set(n_nodes)) > 1,
    }
