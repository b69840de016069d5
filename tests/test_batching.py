"""Padded batching/collation invariants."""

import numpy as np

from hydragnn_tpu.data.batching import PaddedBatcher, collate, compute_batch_dims
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.data.synthetic import deterministic_graph_data


def _samples(n=20):
    samples = deterministic_graph_data(n, seed=3)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
        s.y_graph = s.y_raw
        s.y_node = s.x[:, :1]
    return samples


def test_collate_masks_and_offsets():
    samples = _samples(6)
    dims = compute_batch_dims(samples, 6)
    b = collate(samples, *dims)
    n_real = sum(s.num_nodes for s in samples)
    e_real = sum(s.num_edges for s in samples)
    assert int(b.node_mask.sum()) == n_real
    assert int(b.edge_mask.sum()) == e_real
    assert int(b.graph_mask.sum()) == 6
    # padding edges point at the padding node
    assert (b.senders[~b.edge_mask] == b.x.shape[0] - 1).all()
    # padding nodes belong to the padding graph
    assert (b.node_graph[~b.node_mask] == b.graph_mask.shape[0] - 1).all()
    # per-graph targets land in the right rows
    np.testing.assert_allclose(b.y_graph[:6, 0], [s.y_raw[0] for s in samples])


def test_edge_index_offsets_preserved():
    samples = _samples(3)
    dims = compute_batch_dims(samples, 3)
    b = collate(samples, *dims)
    off = 0
    eoff = 0
    for s in samples:
        e = s.num_edges
        np.testing.assert_array_equal(
            np.asarray(b.senders[eoff : eoff + e]), s.edge_index[0] + off
        )
        off += s.num_nodes
        eoff += e


def test_batcher_static_shapes_and_coverage():
    samples = _samples(10)
    loader = PaddedBatcher(samples, 4, shuffle=True, seed=0)
    shapes = set()
    total_graphs = 0
    for b in loader:
        shapes.add((b.x.shape, b.senders.shape, b.graph_mask.shape))
        total_graphs += int(b.graph_mask.sum())
    assert len(shapes) == 1  # every batch identical padded shape
    assert total_graphs == 10
