from hydragnn_tpu.data.sample import GraphSample
from hydragnn_tpu.data.batching import PaddedBatcher, collate, compute_batch_dims
from hydragnn_tpu.data.radius_graph import radius_graph, add_edge_lengths

__all__ = [
    "GraphSample",
    "PaddedBatcher",
    "collate",
    "compute_batch_dims",
    "radius_graph",
    "add_edge_lengths",
]
