"""Statically-shaped batched-graph container (the TPU-native analogue of
PyG ``Data``/``Batch`` used throughout the reference, e.g.
``hydragnn/models/Base.py:697-846``).

Design notes (TPU-first, not a port):

* All arrays are padded to static shapes so that every train/eval step hits
  the same XLA executable.  Variable node/edge counts (which the reference
  handles with dynamic torch tensors) become masks.
* Following the jraph padding convention, a batch always reserves at least
  one padding graph (the last graph slot) and one padding node (the last
  node slot):

    - padding nodes have ``node_graph == n_graph - 1``
    - padding edges have ``senders == receivers == n_node - 1``

  so segment-reductions dump garbage only into padding slots, which are
  masked out of every loss/statistic.
* Targets: the reference packs all heads into a flat ``data.y`` plus a
  ``y_loc`` offset table and recovers per-head slices with host-side index
  math every step (``train_validate_test.py:494-557``).  Here targets are
  packed **per level** at batch-build time: graph-head targets are columns
  of ``y_graph [n_graph, sum(graph head dims)]`` and node-head targets are
  columns of ``y_node [n_node, sum(node head dims)]`` -- static-shape
  friendly and zero per-step index math.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class GraphBatch:
    """A padded batch of graphs as a JAX pytree.

    Shapes: N = padded node count, E = padded edge count, G = padded graph
    count (>= real graphs + 1).
    """

    # --- node level ---
    x: jnp.ndarray  # [N, F_in] invariant node features
    pos: jnp.ndarray  # [N, 3] positions (zeros if absent)
    node_graph: jnp.ndarray  # [N] int32: node -> graph id (padding -> G-1)
    node_mask: jnp.ndarray  # [N] bool

    # --- edge level (COO; messages flow senders -> receivers) ---
    senders: jnp.ndarray  # [E] int32 (reference edge_index[0])
    receivers: jnp.ndarray  # [E] int32 (reference edge_index[1])
    edge_mask: jnp.ndarray  # [E] bool

    # --- graph level ---
    graph_mask: jnp.ndarray  # [G] bool
    n_per_graph: jnp.ndarray  # [G] int32: real node count per graph

    # --- optional fields ---
    edge_attr: Optional[jnp.ndarray] = None  # [E, F_e]
    edge_shifts: Optional[jnp.ndarray] = None  # [E, 3] PBC cell shifts (Cartesian)
    cell: Optional[jnp.ndarray] = None  # [G, 3, 3] lattice vectors (rows)
    y_graph: Optional[jnp.ndarray] = None  # [G, sum graph-head dims]
    y_node: Optional[jnp.ndarray] = None  # [N, sum node-head dims]
    graph_attr: Optional[jnp.ndarray] = None  # [G, A] conditioning features
    dataset_id: Optional[jnp.ndarray] = None  # [G] int32 branch/dataset id
    pe: Optional[jnp.ndarray] = None  # [N, pe_dim] Laplacian PE (for GPS)
    rel_pe: Optional[jnp.ndarray] = None  # [E, pe_dim] relative PE (for GPS)
    energy: Optional[jnp.ndarray] = None  # [G] reference total energy (MLIP)
    forces: Optional[jnp.ndarray] = None  # [N, 3] reference forces (MLIP)
    # DimeNet triplets (padded): edge ids of (k->j) and (j->i); padding points
    # at the padding edge E-1 (reference computes these dynamically,
    # DIMEStack.py:233-279 -- here they are static per batch)
    trip_kj: Optional[jnp.ndarray] = None  # [T] int32
    trip_ji: Optional[jnp.ndarray] = None  # [T] int32
    trip_mask: Optional[jnp.ndarray] = None  # [T] bool

    # static (non-pytree) metadata: edges sorted by receiver enables the
    # fast sorted-segment lowering on TPU (set by the batcher)
    edges_sorted: bool = struct.field(pytree_node=False, default=False)

    # --- optional Pallas aggregation plans (ops/pallas_segment.py) ---
    # receiver-side: per node tile, block offsets / counts / local ids
    agg_rcv_off: Optional[jnp.ndarray] = None  # [T, MB] int32
    agg_rcv_nb: Optional[jnp.ndarray] = None  # [T] int32
    agg_rcv_sid: Optional[jnp.ndarray] = None  # [T, MB, TE] int32
    # sender-side: permutation to sender-sorted order + its plan
    agg_snd_perm: Optional[jnp.ndarray] = None  # [E] int32
    agg_snd_off: Optional[jnp.ndarray] = None
    agg_snd_nb: Optional[jnp.ndarray] = None
    agg_snd_sid: Optional[jnp.ndarray] = None
    # fused gather->combine->reduce window plans (ops/fused_gather.py):
    # per-tile node window start + window-local ids of the OTHER endpoint
    agg_rcv_lot: Optional[jnp.ndarray] = None  # [T, MB, TE] int32
    agg_rcv_win: Optional[jnp.ndarray] = None  # [T] int32
    agg_snd_lot: Optional[jnp.ndarray] = None  # [T, MB, TE] int32
    agg_snd_win: Optional[jnp.ndarray] = None  # [T] int32
    # dense per-tile adjacency blocks (ops/fused_gather.py adjacency
    # path): A[t, n, j] = multiplicity of edges (window node j -> tile
    # node n); uint8, one per plan side.  The one-hot select/segment
    # matrices of the LINEAR segment-sum paths are plan constants, so
    # building them once here replaces per-block one-hot construction +
    # two MXU passes per call with ONE [TN, W] x [W, F] matmul
    agg_rcv_adj: Optional[jnp.ndarray] = None  # [T, TN, W] uint8
    agg_snd_adj: Optional[jnp.ndarray] = None  # [T, TN, W] uint8
    rcv_count: Optional[jnp.ndarray] = None  # [N] real in-degree (float32)
    snd_count: Optional[jnp.ndarray] = None  # [N] real out-degree (float32)
    # edge-gather plans (ops/fused_gather.py edge_gather_raw): per block of
    # TE consecutive batch-order edges, a node-window start + window-local
    # endpoint ids (-1 = masked edge), one plan per endpoint.  Replaces
    # XLA's serial row gather (~17 ns/row) for node->edge gathers and the
    # gather legs of the segment-sum transposes.  Static width = agg_meta[6].
    eg_snd_win: Optional[jnp.ndarray] = None  # [NB] int32
    eg_snd_lot: Optional[jnp.ndarray] = None  # [NB, TE] int32
    eg_rcv_win: Optional[jnp.ndarray] = None  # [NB] int32
    eg_rcv_lot: Optional[jnp.ndarray] = None  # [NB, TE] int32
    # neighbor-slot plan (ops/slot_minmax.py): window-local id of the d-th
    # in-neighbor (sender) of each receiver-tile row, -1 pad.  Lets the
    # segment extrema run as Dmax one-hot MXU gathers + trivial VPU
    # reductions in NODE space instead of Hillis-Steele scans over the
    # edge stream (the r04 PNA hot spot).  Slot count = agg_meta[7];
    # agg_nbr_nd bounds the slot loop per tile.
    agg_nbr_lot: Optional[jnp.ndarray] = None  # [T, Dmax, TN] int32
    agg_nbr_nd: Optional[jnp.ndarray] = None  # [T] int32
    # (tile_nodes, tile_edges, max_blocks) -- static so jit sees constants
    agg_meta: Optional[tuple] = struct.field(pytree_node=False, default=None)

    # --- giant-graph halo view (parallel/halo.py) ---
    # When set, this batch is ONE SHARD of a node-partitioned giant graph
    # inside shard_map: node arrays are [block + S*h] (local block followed
    # by halo copies of remote nodes), edges are local, and the stack
    # refreshes the halo region from the owner shards with one tiled
    # all_to_all before each conv layer (models/base.py halo_refresh).
    halo_send_idx: Optional[jnp.ndarray] = None  # [S, h] local rows to send
    halo_send_mask: Optional[jnp.ndarray] = None  # [S, h]
    halo_axis: Optional[str] = struct.field(pytree_node=False, default=None)

    # ------------------------------------------------------------------
    @property
    def n_node(self) -> int:
        return self.x.shape[0]

    @property
    def n_edge(self) -> int:
        return self.senders.shape[0]

    @property
    def n_graph(self) -> int:
        return self.graph_mask.shape[0]

    @property
    def num_real_graphs(self) -> jnp.ndarray:
        return jnp.sum(self.graph_mask.astype(jnp.int32))

    @property
    def num_real_nodes(self) -> jnp.ndarray:
        return jnp.sum(self.node_mask.astype(jnp.int32))

    @property
    def num_real_edges(self) -> jnp.ndarray:
        return jnp.sum(self.edge_mask.astype(jnp.int32))

    def in_degree(self) -> jnp.ndarray:
        """Per-node count of incoming (real) edges. [N] int32."""
        ones = self.edge_mask.astype(jnp.int32)
        return jnp.zeros((self.n_node,), jnp.int32).at[self.receivers].add(ones)

    def edge_vectors(self) -> jnp.ndarray:
        """Relative edge vectors r_j - r_i (+ PBC shift), [E, 3].

        Mirrors reference ``get_edge_vectors_and_lengths`` semantics
        (``hydragnn/utils/model/operations.py``): vec = pos[receiver] -
        pos[sender] + shift.
        """
        vec = self.pos[self.receivers] - self.pos[self.senders]
        if self.edge_shifts is not None:
            vec = vec + self.edge_shifts
        return vec


def graph_segment_mean(
    values: jnp.ndarray, graph: "GraphBatch", node_values_masked: bool = False
) -> jnp.ndarray:
    """Mean-pool node values per graph, padding-correct. [N,F] -> [G,F].

    Equivalent of reference ``global_mean_pool`` (``Base.py:733-738``) but
    mask-aware: divides by the true per-graph node count.
    """
    vals = jnp.where(graph.node_mask[:, None], values, 0.0)
    summed = jnp.zeros((graph.n_graph, values.shape[-1]), values.dtype)
    summed = summed.at[graph.node_graph].add(vals)
    counts = jnp.maximum(graph.n_per_graph.astype(values.dtype), 1.0)[:, None]
    return summed / counts
