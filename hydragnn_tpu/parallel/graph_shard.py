"""Graph (edge/node) partitioning across chips -- the framework's headline
scaling capability (SURVEY.md section 2.2 'SP/CP' row: the reference does
NOT partition individual graphs; each graph must fit one rank).

A padded GraphBatch's node arrays, edge arrays, and graph arrays are
sharded along their leading dimension over a ``graph`` mesh axis
(``NamedSharding(P('graph'))``) while parameters stay replicated.  The
existing jitted train step then runs unchanged: XLA partitions the
gather (``x[senders]``) and segment-scatter (``.at[receivers].add``) and
inserts the boundary-node exchanges (all-gather / reduce-scatter /
collective-permute over ICI) automatically -- the 'annotate shardings,
let XLA insert collectives' recipe.

Locality is controlled on the host: ``reorder_for_locality`` renumbers
nodes so each device's node block and the edges it owns (grouped by
receiver block) mostly coincide, minimizing cross-shard traffic.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydragnn_tpu.graphs import GraphBatch

_NODE_LEAVES = ("x", "pos", "node_graph", "node_mask", "y_node", "pe", "forces")
_EDGE_LEAVES = (
    "senders",
    "receivers",
    "edge_mask",
    "edge_attr",
    "edge_shifts",
    "rel_pe",
    "trip_kj",
    "trip_ji",
    "trip_mask",
)
_GRAPH_LEAVES = (
    "graph_mask",
    "n_per_graph",
    "cell",
    "y_graph",
    "graph_attr",
    "dataset_id",
    "energy",
)


def make_graph_mesh(n_devices: int, devices=None) -> Mesh:
    from jax.experimental import mesh_utils

    devices = devices if devices is not None else jax.devices()[:n_devices]
    return Mesh(mesh_utils.create_device_mesh((n_devices,), devices=devices), ("graph",))


def pad_to_multiple(batch: GraphBatch, multiple: int) -> GraphBatch:
    """Host-side: grow padding so every sharded leading dim divides the mesh."""

    def _pad_leading(arr, new_len, fill):
        if arr is None:
            return None
        arr = np.asarray(arr)
        if arr.shape[0] == new_len:
            return arr
        pad = np.full((new_len - arr.shape[0],) + arr.shape[1:], fill, arr.dtype)
        return np.concatenate([arr, pad], axis=0)

    def _round(x):
        return ((x + multiple - 1) // multiple) * multiple

    n, e, g = batch.n_node, batch.n_edge, batch.n_graph
    n2, e2, g2 = _round(n), _round(e), _round(g)
    kw = {}
    for f in _NODE_LEAVES:
        v = getattr(batch, f)
        fill = False if f == "node_mask" else (g2 - 1 if f == "node_graph" else 0)
        kw[f] = _pad_leading(v, n2, fill)
    for f in _EDGE_LEAVES:
        v = getattr(batch, f)
        if f in ("senders", "receivers"):
            fill = n2 - 1
        elif f in ("trip_kj", "trip_ji"):
            fill = e2 - 1
        elif f in ("edge_mask", "trip_mask"):
            fill = False
        else:
            fill = 0
        if v is not None and f in ("trip_kj", "trip_ji", "trip_mask"):
            kw[f] = _pad_leading(v, _round(v.shape[0]), fill)
        else:
            kw[f] = _pad_leading(v, e2, fill)
    for f in _GRAPH_LEAVES:
        v = getattr(batch, f)
        fill = False if f == "graph_mask" else 0
        kw[f] = _pad_leading(v, g2, fill)
    return GraphBatch(**kw)


def shard_batch(batch: GraphBatch, mesh: Mesh) -> GraphBatch:
    """device_put each leaf with its leading-dim sharding."""
    spec = NamedSharding(mesh, P("graph"))

    def _put(v):
        return None if v is None else jax.device_put(np.asarray(v), spec)

    kw = {}
    for f in _NODE_LEAVES + _EDGE_LEAVES + _GRAPH_LEAVES:
        kw[f] = _put(getattr(batch, f))
    return GraphBatch(**kw)


def reorder_for_locality(batch: GraphBatch, n_shards: int) -> GraphBatch:
    """Host-side edge reordering: group edges by the shard of their
    receiver so each device's edge block scatters mostly into its own node
    block (the boundary set is what rides ICI)."""
    e = batch.n_edge
    block = batch.n_node // n_shards + (batch.n_node % n_shards > 0)
    owner = np.asarray(batch.receivers) // max(block, 1)
    order = np.argsort(owner, kind="stable")

    def _edge_perm(v):
        return None if v is None else np.asarray(v)[order]

    kw = {f: getattr(batch, f) for f in _NODE_LEAVES + _GRAPH_LEAVES}
    for f in _EDGE_LEAVES:
        v = getattr(batch, f)
        if f in ("trip_kj", "trip_ji", "trip_mask"):
            # triplet edge ids must be remapped through the permutation
            if v is None:
                kw[f] = None
            elif f == "trip_mask":
                kw[f] = np.asarray(v)
            else:
                inv = np.empty(e, np.int64)
                inv[order] = np.arange(e)
                kw[f] = inv[np.asarray(v)].astype(np.int32)
        else:
            kw[f] = _edge_perm(v)
    return GraphBatch(**kw)
