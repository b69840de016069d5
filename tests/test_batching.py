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


def test_bucketed_batching_reduces_qm9_padding_waste(tmp_path):
    """QM9 has a wide size spread (3-29 atoms); 4 buckets should cut padded
    node-slot waste substantially vs one global padded shape (SURVEY 7.1)."""
    from hydragnn_tpu.data.batching import (
        BucketedBatcher,
        PaddedBatcher,
        compute_batch_dims,
        padding_waste,
    )
    from hydragnn_tpu.data.qm9 import load_qm9_directory, synthesize_qm9_directory
    from hydragnn_tpu.data.radius_graph import radius_graph

    root = str(tmp_path / "qm9")
    synthesize_qm9_directory(root, 96, seed=2)
    samples = load_qm9_directory(root)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 7.0, 20)
        s.y_graph = s.y_raw[:1]

    flat = PaddedBatcher(samples, 8, dims=compute_batch_dims(samples, 8))
    bucketed = BucketedBatcher(samples, 8, num_buckets=4)
    w_flat = padding_waste(flat)
    w_bucket = padding_waste(bucketed)
    assert len(bucketed) >= len(flat)
    assert w_bucket < w_flat - 0.08, (w_flat, w_bucket)
    # every sample still delivered exactly once per epoch
    n = sum(int(np.asarray(b.graph_mask).sum()) for b in bucketed)
    assert n == len(samples)


def test_bucketed_batcher_epoch_shuffling_and_dp_grouping():
    """Bucketed loaders shuffle per epoch and group correctly under the
    data-parallel trainer (same-shape pooling)."""
    import jax

    from hydragnn_tpu.data.batching import BucketedBatcher
    from hydragnn_tpu.data.pipeline import normalize_minmax, select_variables
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.synthetic import deterministic_graph_data
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.dp import DataParallelTrainer, make_mesh

    samples = deterministic_graph_data(24, seed=4)
    var = {"input_node_features": [0], "output_index": [0], "type": ["graph"]}
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    # vary sizes so buckets differ
    for i, s in enumerate(samples):
        if i % 2 == 0:
            keep = max(3, s.num_nodes // 2)
            s.x = s.x[:keep]
            s.pos = s.pos[:keep]
            s.y_node = s.y_node[:keep] if s.y_node is not None else None
        s.edge_index = radius_graph(s.pos, 2.0, 100)
    loader = BucketedBatcher(samples, 2, num_buckets=2, shuffle=True, seed=5)
    assert len(loader.padded_dims()) == 2
    first = [np.asarray(b.y_graph).sum() for b in loader]
    loader.set_epoch(1)
    second = [np.asarray(b.y_graph).sum() for b in loader]
    assert len(first) == len(second)
    assert not np.allclose(first, second)  # order changed across epochs

    cfg = StackConfig(
        input_dim=1, hidden_dim=8, output_dim=(1,), output_type=("graph",),
        graph_branches=normalize_branches(
            {"num_sharedlayers": 1, "dim_sharedlayers": 8,
             "num_headlayers": 1, "dim_headlayers": [8]}
        ),
        task_weights=(1.0,), num_conv_layers=1,
    )
    model = create_model("GIN", cfg)
    tr = DataParallelTrainer(
        model, {"type": "Adam", "learning_rate": 1e-3}, make_mesh(8)
    )
    state = tr.init_state(next(iter(loader)))
    state, loss, _ = tr.run_epoch(state, loader)
    assert np.isfinite(loss)


def test_prefetch_worker_pool_matches_serial():
    """Multi-worker prefetch builds the same batches in the same order as
    the serial iterator (HydraDataLoader pool analogue)."""
    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.prefetch import PrefetchLoader
    from hydragnn_tpu.data.synthetic import deterministic_graph_data
    from hydragnn_tpu.data.pipeline import normalize_minmax, select_variables
    from hydragnn_tpu.data.radius_graph import radius_graph

    samples = deterministic_graph_data(20, seed=3)
    var = {"input_node_features": [0], "output_index": [0], "type": ["graph"]}
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
    dims = compute_batch_dims(samples, 8)
    base = PaddedBatcher(samples, 8, shuffle=True, seed=5, dims=dims)
    pool = PrefetchLoader(
        PaddedBatcher(samples, 8, shuffle=True, seed=5, dims=dims),
        depth=2,
        workers=4,
    )
    base.set_epoch(3)
    pool.set_epoch(3)
    serial = list(base)
    parallel = list(pool)
    assert len(serial) == len(parallel)
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
        np.testing.assert_array_equal(
            np.asarray(a.senders), np.asarray(b.senders)
        )


def test_epoch_samples_oversampling():
    """PaddedBatcher(epoch_samples=k): fixed per-epoch draw count
    (reference create_dataloaders oversampling, load_data.py:240-249) —
    subsamples when k < n, cycles fresh permutations when k > n."""
    from hydragnn_tpu.data.synthetic import deterministic_graph_data

    samples = deterministic_graph_data(10, seed=0)
    for s in samples:
        from hydragnn_tpu.data.radius_graph import radius_graph

        s.edge_index = radius_graph(s.pos, 2.0, 100)
        s.y_graph = np.zeros(1, np.float32)

    # oversample: 25 draws from 10 samples
    ld = PaddedBatcher(samples, 5, shuffle=True, epoch_samples=25)
    chunks = ld.batch_indices(0)
    flat = np.concatenate(chunks)
    assert len(flat) == 25 and len(ld) == 5
    counts = np.bincount(flat, minlength=10)
    assert counts.min() >= 2 and counts.max() <= 3  # minimal repetition
    # subsample: 4 draws, no repeats
    ld2 = PaddedBatcher(samples, 2, shuffle=True, epoch_samples=4)
    flat2 = np.concatenate(ld2.batch_indices(1))
    assert len(flat2) == 4 == len(np.unique(flat2))
    # epochs differ
    assert not np.array_equal(flat2, np.concatenate(ld2.batch_indices(2)))
    # batches still collate
    b = next(iter(ld2))
    assert b.x.shape[0] > 0
