"""Padded static-shape batching.

The TPU replacement for the reference's PyG dataloader collation
(``hydragnn/preprocess/load_data.py:226-334``): every batch is padded to
fixed (n_node, n_edge, n_graph) so each step reuses one compiled
executable.  Follows the jraph convention of one reserved padding graph /
node (see graphs.py docstring).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from hydragnn_tpu.data.sample import GraphSample
from hydragnn_tpu.graphs import GraphBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_triplets(edge_index: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Enumerate DimeNet triplets on the host: for every edge (j->i) pair it
    with every edge (k->j), k != i (reference ``DIMEStack.py:233-279``
    semantics, host numpy instead of sparse torch).  Returns local edge-id
    arrays (idx_kj, idx_ji)."""
    src, dst = edge_index
    e = src.shape[0]
    kj_list, ji_list = [], []
    in_edges = {}  # node -> list of edge ids with dst == node
    for eid in range(e):
        in_edges.setdefault(int(dst[eid]), []).append(eid)
    for ji in range(e):
        j, i = int(src[ji]), int(dst[ji])
        for kj in in_edges.get(j, ()):
            if int(src[kj]) != i:
                kj_list.append(kj)
                ji_list.append(ji)
    return (
        np.asarray(kj_list, np.int64).reshape(-1),
        np.asarray(ji_list, np.int64).reshape(-1),
    )


def compute_batch_dims(
    samples: Sequence[GraphSample],
    batch_size: int,
    node_multiple: int = 8,
    edge_multiple: int = 8,
) -> Tuple[int, int, int]:
    """Static (n_node, n_edge, n_graph) covering any batch of ``batch_size``
    samples, rounded up to TPU-friendly multiples, +1 padding slot each."""
    max_n = max(s.num_nodes for s in samples)
    max_e = max(max(s.num_edges, 1) for s in samples)
    n_node = _round_up(batch_size * max_n + 1, node_multiple)
    n_edge = _round_up(batch_size * max_e + 1, edge_multiple)
    n_graph = batch_size + 1
    return n_node, n_edge, n_graph


def compute_triplet_dim(
    samples: Sequence[GraphSample], batch_size: int, multiple: int = 8
) -> int:
    max_t = max(max(s.num_triplets, 1) for s in samples)
    return _round_up(batch_size * max_t + 1, multiple)


def _build_agg_plans(senders, receivers, edge_mask, n_node, TN, TE, MB,
                     W=None, max_deg_global=None):
    """Pallas aggregation plans (ops/pallas_segment.py) for both edge
    endpoints; returns GraphBatch field dict.  When ``W`` (static window
    width) is given, also builds the fused-kernel window plans
    (ops/fused_gather.py) -- window fields stay None if any tile's span
    exceeds W, so the models fall back to the unfused path."""
    from hydragnn_tpu.native import plan_segment_tiles_native
    from hydragnn_tpu.ops.pallas_segment import plan_segment_tiles

    def _plan(rcv, msk):
        native = plan_segment_tiles_native(rcv, msk, n_node, TN, TE, MB)
        if native is not None:
            return native
        return plan_segment_tiles(rcv, msk, n_node, TN, TE, MB)

    rp = _plan(receivers, edge_mask)
    key = np.where(edge_mask, senders, n_node - 1).astype(np.int64)
    perm = np.argsort(key, kind="stable").astype(np.int32)
    sp = _plan(key[perm].astype(np.int32), edge_mask[perm])
    n_tiles = n_node // TN

    def _required(p):
        # last in-bounds row any DMA window of this plan touches
        nb, off = p["blocks_per_tile"], p["block_offsets"]
        ends = [
            int(off[t, nb[t] - 1]) + TE for t in range(len(nb)) if nb[t] > 0
        ]
        return max(ends, default=0)

    # when the batch's edge arrays already span ``required`` rows the kernel
    # skips its safety concat-pad — a full [E, F] HBM copy per call that
    # profiling showed dominating the copy/pad time of every Pallas config
    required = max(_required(rp), _required(sp))
    rcv_count = np.bincount(
        receivers[edge_mask], minlength=n_node
    ).astype(np.float32)
    snd_count = np.bincount(
        senders[edge_mask], minlength=n_node
    ).astype(np.float32)
    # max segment length either plan's scans can see: segments are
    # contiguous runs of one endpoint, so a block never holds a run longer
    # than the max endpoint degree.  The min/max kernels bound their
    # Hillis-Steele doubling steps by this instead of log2(TE) (degree-16
    # molecular batches: 5 steps instead of 9).  Rounded up to a power of
    # two so near-identical batches share one compiled kernel.
    # advisor r04: derive the scan bound from the DATASET-global max
    # degree when the batcher provides it, so batches whose max degree
    # crosses a power-of-two boundary share one compiled executable
    max_seg = int(max(rcv_count.max(initial=1.0), snd_count.max(initial=1.0), 1.0))
    if max_deg_global is not None:
        max_seg = max(max_seg, int(max_deg_global))
    max_scan = 1
    while max_scan < max_seg:
        max_scan *= 2
    max_scan = min(max_scan, TE)
    fields = {
        "agg_rcv_off": rp["block_offsets"],
        "agg_rcv_nb": rp["blocks_per_tile"],
        "agg_rcv_sid": rp["sid_blocks"].reshape(n_tiles, MB, TE),
        "agg_snd_perm": perm,
        "agg_snd_off": sp["block_offsets"],
        "agg_snd_nb": sp["blocks_per_tile"],
        "agg_snd_sid": sp["sid_blocks"].reshape(n_tiles, MB, TE),
        "rcv_count": rcv_count,
        "snd_count": snd_count,
        "agg_meta": (TN, TE, MB, required, None, max_scan),
    }
    nbr_dmax = None  # set when the window-plan neighbor slots are built
    if W is not None and W <= n_node:
        from hydragnn_tpu.ops.fused_gather import needed_window, plan_windows

        # window-op MXU time is linear in W: shrink the worst-case bound
        # to the batch's true max endpoint span, rounded up to 32 rows so
        # near-identical batches of a dataset share one compiled width
        need = max(
            needed_window(senders, rp["block_offsets"], rp["sid_blocks"]),
            needed_window(
                receivers[perm], sp["block_offsets"], sp["sid_blocks"]
            ),
        )
        W = min(W, max(-(-need // 32) * 32, 32))
        # rcv plan: the "other" endpoint is the sender (batch edge order);
        # snd plan: the receiver, in sender-sorted order
        rw = plan_windows(
            senders, rp["block_offsets"], rp["sid_blocks"], n_node, W
        )
        sw = plan_windows(
            receivers[perm], sp["block_offsets"], sp["sid_blocks"], n_node, W
        )
        if rw is not None and sw is not None:
            fields.update(
                agg_rcv_lot=rw["lot"],
                agg_rcv_win=rw["win_start"],
                agg_snd_lot=sw["lot"],
                agg_snd_win=sw["win_start"],
                agg_meta=(TN, TE, MB, required, W, max_scan),
            )
            # dense per-tile adjacency blocks (linear segment-sum fast
            # path, ops/fused_gather.py adjacency_segsum): A[t, n, j] =
            # #edges (window node j -> tile node n).  uint8 with a
            # saturation check — duplicate PBC image edges beyond 255
            # per pair would overflow, so skip the fast path then.
            def _adj(dst, other, win):
                t = dst // TN
                j = other - win[t]
                A = np.zeros((n_tiles, TN, W), np.int32)
                np.add.at(A, (t, dst - t * TN, j), 1)
                return A.astype(np.uint8) if A.max() <= 255 else None


            ra = _adj(
                receivers[edge_mask], senders[edge_mask], rw["win_start"]
            )
            sa = _adj(
                senders[edge_mask], receivers[edge_mask], sw["win_start"]
            )
            if ra is not None and sa is not None:
                fields.update(agg_rcv_adj=ra, agg_snd_adj=sa)
            # neighbor-slot plan (ops/slot_minmax.py): the d-th in-
            # neighbor of each receiver-tile row in window-local coords.
            # Slot count = batch max in-degree rounded to 8 so nearby
            # batches share one compiled kernel.  Stored as dmax for the
            # stable agg_meta[7] slot appended at the end.
            dmax = int(-(-max(int(rcv_count.max(initial=1.0)), 1) // 8) * 8)
            rcv_r = receivers[edge_mask].astype(np.int64)
            snd_r = senders[edge_mask].astype(np.int64)
            t_r = rcv_r // TN
            row_r = rcv_r - t_r * TN
            # batch edge order is receiver-sorted, so the within-receiver
            # slot index is just position minus run start (searchsorted).
            # Layout [T, Dmax, TN]: TN=128 on the lane axis.
            d_r = np.arange(len(rcv_r)) - np.searchsorted(
                rcv_r, rcv_r, side="left"
            )
            nbr = np.full((n_tiles, dmax, TN), -1, np.int32)
            nbr[t_r, d_r, row_r] = snd_r - rw["win_start"][t_r]
            # per-tile slot bound: kernels loop d < nbr_nd[t] only
            nd = np.zeros((n_tiles,), np.int32)
            if len(rcv_r):
                np.maximum.at(nd, t_r, (d_r + 1).astype(np.int32))
            fields.update(agg_nbr_lot=nbr, agg_nbr_nd=nd)
            nbr_dmax = dmax
    # --- edge-gather plans (ops/fused_gather.py edge_gather_raw) ---
    # XLA's row gather costs ~17 ns/row on TPU regardless of width, so a
    # node->edge gather at E=262k is ~4.5 ms; force training stacks many
    # per step.  Blocks of TE consecutive BATCH-ORDER edges have both
    # endpoints confined to a bounded contiguous node window (samples are
    # packed contiguously and edges are receiver-sorted), so the gather is
    # one [W, TE]-one-hot MXU matmul per block.  Plans for both endpoints;
    # masked (padding) edges get local id -1 (gather output 0 there, which
    # every consumer masks downstream).
    def _egather_plan(endpoint, TE_, Wg=None, cap=2048):
        """Per-block window starts + window-local ids; with ``Wg`` given,
        rebuild with that (shared) static width so both directions use the
        one compiled kernel width and every [w, w+Wg) DMA stays in bounds."""
        E = len(endpoint)
        NB = -(-E // TE_)
        ep = np.where(edge_mask, endpoint.astype(np.int64), -1)
        ep = np.concatenate([ep, np.full(NB * TE_ - E, -1, np.int64)])
        ep2 = ep.reshape(NB, TE_)
        valid = ep2 >= 0
        has = valid.any(axis=1)
        lo = np.where(valid, ep2, np.iinfo(np.int64).max).min(axis=1)
        hi = np.where(valid, ep2, -1).max(axis=1)
        lo = np.where(has, lo, 0)
        hi = np.where(has, hi, 0)
        w = (lo // 8) * 8  # Mosaic: sublane slice starts divisible by 8
        if Wg is None:
            span = int(np.max(hi - w + 1, initial=1))
            # 128-row buckets (was 32): fewer distinct compiled widths
            # across a dataset's batches (advisor r04 recompile note)
            Wg = max(-(-span // 128) * 128, 128)
        if Wg > cap or Wg > n_node:
            return None
        w = np.minimum(w, n_node - Wg)
        lot = ep2 - w[:, None]
        cover = valid & (lot >= 0) & (lot < Wg)
        if not np.array_equal(cover, valid):
            return None  # widened start clamp pushed an edge out of window
        lot = np.where(cover, lot, -1)
        return {
            "win": w.astype(np.int32),
            "lot": lot.astype(np.int32),
            "W": Wg,
        }

    gs = _egather_plan(senders, TE)
    gr = _egather_plan(receivers, TE)
    if gs is not None and gr is not None:
        # one static width for both directions (one compiled kernel);
        # rebuild the narrower plan so its start clamp uses the SHARED
        # width -- otherwise a tail block's window can run past n_node
        Wg = max(gs["W"], gr["W"])
        if gs["W"] != Wg:
            gs = _egather_plan(senders, TE, Wg=Wg)
        if gr["W"] != Wg:
            gr = _egather_plan(receivers, TE, Wg=Wg)
    if gs is not None and gr is not None:
        fields.update(
            eg_snd_win=gs["win"], eg_snd_lot=gs["lot"],
            eg_rcv_win=gr["win"], eg_rcv_lot=gr["lot"],
            agg_meta=fields["agg_meta"] + (Wg,),
        )
    elif nbr_dmax is not None:
        # hold agg_meta[6] (edge-gather width) stable so the slot count
        # can live at the fixed index 7
        fields["agg_meta"] = fields["agg_meta"] + (None,)
    if nbr_dmax is not None:
        fields["agg_meta"] = fields["agg_meta"] + (nbr_dmax,)
    return fields


def collate(
    samples: Sequence[GraphSample],
    n_node: int,
    n_edge: int,
    n_graph: int,
    n_triplet: Optional[int] = None,
    agg_plan: Optional[Tuple[int, int, int]] = None,
) -> GraphBatch:
    """Pack samples into one padded GraphBatch (host-side numpy)."""
    bs = len(samples)
    assert bs < n_graph, "need >=1 padding graph"
    tot_nodes = sum(s.num_nodes for s in samples)
    tot_edges = sum(s.num_edges for s in samples)
    assert tot_nodes < n_node, f"nodes {tot_nodes} overflow padding {n_node}"
    assert tot_edges <= n_edge, f"edges {tot_edges} overflow padding {n_edge}"

    f_in = samples[0].x.shape[1] if samples[0].x.ndim == 2 else 1
    x = np.zeros((n_node, f_in), np.float32)
    pos = np.zeros((n_node, 3), np.float32)
    node_graph = np.full((n_node,), n_graph - 1, np.int32)
    node_mask = np.zeros((n_node,), bool)
    senders = np.full((n_edge,), n_node - 1, np.int32)
    receivers = np.full((n_edge,), n_node - 1, np.int32)
    edge_mask = np.zeros((n_edge,), bool)
    graph_mask = np.zeros((n_graph,), bool)
    n_per_graph = np.zeros((n_graph,), np.int32)
    dataset_id = np.zeros((n_graph,), np.int32)

    def _opt(field, shape, dtype=np.float32):
        if getattr(samples[0], field) is None:
            return None
        return np.zeros(shape, dtype)

    ea0 = samples[0].edge_attr
    edge_attr = None if ea0 is None else np.zeros((n_edge, ea0.shape[1]), np.float32)
    es0 = samples[0].edge_shifts
    edge_shifts = None if es0 is None else np.zeros((n_edge, 3), np.float32)
    cell = (
        None
        if samples[0].cell is None
        else np.tile(np.eye(3, dtype=np.float32), (n_graph, 1, 1))
    )
    yg0 = samples[0].y_graph
    y_graph = None if yg0 is None else np.zeros((n_graph, yg0.shape[-1]), np.float32)
    yn0 = samples[0].y_node
    y_node = (
        None
        if yn0 is None
        else np.zeros((n_node, yn0.reshape(yn0.shape[0], -1).shape[-1]), np.float32)
    )
    ga0 = samples[0].graph_attr
    graph_attr = (
        None if ga0 is None else np.zeros((n_graph, np.asarray(ga0).size), np.float32)
    )
    pe0 = samples[0].pe
    pe = None if pe0 is None else np.zeros((n_node, pe0.shape[-1]), np.float32)
    rpe0 = samples[0].rel_pe
    rel_pe = None if rpe0 is None else np.zeros((n_edge, rpe0.shape[-1]), np.float32)
    energy = None if samples[0].energy is None else np.zeros((n_graph,), np.float32)
    forces = None if samples[0].forces is None else np.zeros((n_node, 3), np.float32)

    with_trip = n_triplet is not None and samples[0].trip_kj is not None
    if with_trip:
        trip_kj = np.full((n_triplet,), n_edge - 1, np.int32)
        trip_ji = np.full((n_triplet,), n_edge - 1, np.int32)
        trip_mask = np.zeros((n_triplet,), bool)
        trip_off = 0
    else:
        trip_kj = trip_ji = trip_mask = None

    node_off = 0
    edge_off = 0
    for g, s in enumerate(samples):
        n, e = s.num_nodes, s.num_edges
        sl = slice(node_off, node_off + n)
        x[sl] = s.x.reshape(n, -1)
        pos[sl] = s.pos
        node_graph[sl] = g
        node_mask[sl] = True
        el = slice(edge_off, edge_off + e)
        if e:
            senders[el] = s.edge_index[0] + node_off
            receivers[el] = s.edge_index[1] + node_off
            edge_mask[el] = True
            if edge_attr is not None:
                edge_attr[el] = s.edge_attr
            if edge_shifts is not None and s.edge_shifts is not None:
                edge_shifts[el] = s.edge_shifts
            if rel_pe is not None:
                rel_pe[el] = s.rel_pe
        graph_mask[g] = True
        n_per_graph[g] = n
        dataset_id[g] = s.dataset_id
        if cell is not None and s.cell is not None:
            cell[g] = s.cell
        if y_graph is not None:
            y_graph[g] = s.y_graph
        if y_node is not None:
            y_node[sl] = s.y_node.reshape(n, -1)
        if graph_attr is not None:
            graph_attr[g] = np.asarray(s.graph_attr).reshape(-1)
        if pe is not None:
            pe[sl] = s.pe
        if energy is not None:
            energy[g] = s.energy
        if forces is not None:
            forces[sl] = s.forces
        if with_trip and s.num_triplets:
            t = s.num_triplets
            trip_kj[trip_off : trip_off + t] = s.trip_kj + edge_off
            trip_ji[trip_off : trip_off + t] = s.trip_ji + edge_off
            trip_mask[trip_off : trip_off + t] = True
            trip_off += t
        node_off += n
        edge_off += e

    edges_sorted = bool(np.all(np.diff(receivers.astype(np.int64)) >= 0))
    agg_fields = {}
    if agg_plan is not None and edges_sorted:
        agg_fields = _build_agg_plans(
            senders, receivers, edge_mask, n_node, *agg_plan
        )
    return GraphBatch(
        edges_sorted=edges_sorted,
        **agg_fields,
        x=x,
        pos=pos,
        node_graph=node_graph,
        node_mask=node_mask,
        senders=senders,
        receivers=receivers,
        edge_mask=edge_mask,
        graph_mask=graph_mask,
        n_per_graph=n_per_graph,
        edge_attr=edge_attr,
        edge_shifts=edge_shifts,
        cell=cell,
        y_graph=y_graph,
        y_node=y_node,
        graph_attr=graph_attr,
        dataset_id=dataset_id,
        pe=pe,
        rel_pe=rel_pe,
        energy=energy,
        forces=forces,
        trip_kj=trip_kj,
        trip_ji=trip_ji,
        trip_mask=trip_mask,
    )


class PaddedBatcher:
    """Minimal epoch iterator yielding fixed-shape GraphBatches.

    The analogue of the reference's DataLoader+DistributedSampler
    (``load_data.py:252-334``); sharding over hosts/devices is layered on
    top in ``parallel``.
    """

    def __init__(
        self,
        samples: Sequence[GraphSample],
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        dims: Optional[Tuple[int, int, int]] = None,
        n_triplet: Optional[int] = None,
        use_pallas_agg: bool = False,
        tile_nodes: int = 128,
        tile_edges: int = 512,
        epoch_samples: Optional[int] = None,
    ):
        # a DistributedShuffleView (data/distshuffle.py) stays LAZY: its
        # epoch-seeded global permutation changes which samples this rank
        # serves, so static dims/plans must come from the GLOBAL dataset
        self._view = samples if hasattr(samples, "set_epoch") else None
        self.samples = samples if self._view is not None else list(samples)
        # sizing set: every sample any epoch could hand this rank
        sizing = (
            self._view.dataset if self._view is not None else self.samples
        )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        # fixed draw count per epoch (reference create_dataloaders
        # oversampling=True -> RandomSampler(num_samples=...),
        # load_data.py:240-249): < len subsamples, > len cycles fresh
        # permutations so repeats are minimal
        self.epoch_samples = epoch_samples
        self.epoch = 0
        self.dims = dims or compute_batch_dims(sizing, batch_size)
        if n_triplet is not None:
            self.n_triplet = n_triplet
        elif self.samples[0].trip_kj is not None:
            self.n_triplet = compute_triplet_dim(sizing, batch_size)
        else:
            self.n_triplet = None

        self.agg_plan = None
        if use_pallas_agg:
            # round node padding up to the tile and bound blocks-per-tile by
            # the dataset's max degree (fixed across batches for jit); the
            # +tile_edges edge slack keeps every plan DMA window in-bounds so
            # the kernels never concat-pad the [E, F] edge tensors (plan
            # windows end < real_edges + TE, see _build_agg_plans)
            n_node, n_edge, n_graph = self.dims
            n_node = _round_up(n_node, tile_nodes)
            n_edge = _round_up(n_edge + tile_edges, 8)
            self.dims = (n_node, n_edge, n_graph)
            max_deg = 1
            for s in sizing:
                if s.num_edges:
                    d = np.bincount(s.edge_index[1]).max()
                    d2 = np.bincount(s.edge_index[0]).max()
                    max_deg = max(max_deg, int(d), int(d2))
            mb = int(np.ceil((tile_nodes * max_deg + 8) / tile_edges)) + 1
            # static fused-kernel window width: valid for every batch of
            # this dataset (ops/fused_gather.py); None -> unfused path
            from hydragnn_tpu.ops.fused_gather import static_window_width

            max_g = max(s.num_nodes for s in sizing)
            W = static_window_width(max_g, tile_nodes)
            if W is not None and W > n_node:
                W = None
            self.agg_plan = (tile_nodes, tile_edges, mb, W, max_deg)

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if self._view is not None:
            # cross-host global reshuffle: re-derive which GLOBAL samples
            # this rank serves (reference DistributedSampler.set_epoch)
            self._view.set_epoch(epoch)

    def __len__(self) -> int:
        n = (
            len(self.samples)
            if self.epoch_samples is None
            else self.epoch_samples
        )
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def batch_indices(self, epoch: int):
        """Per-epoch list of sample-index chunks (one per batch) — lets a
        worker pool build batches concurrently (data/prefetch.py)."""
        idx = np.arange(len(self.samples))
        if self.epoch_samples is not None:
            rng = np.random.default_rng(self.seed + epoch)
            n, k = len(self.samples), self.epoch_samples
            parts = [rng.permutation(n) for _ in range(-(-k // n))]
            idx = np.concatenate(parts)[:k]
        elif self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        chunks = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                break
            chunks.append(chunk)
        return chunks

    def build(self, chunk) -> GraphBatch:
        n_node, n_edge, n_graph = self.dims
        return collate(
            [self.samples[i] for i in chunk],
            n_node,
            n_edge,
            n_graph,
            n_triplet=self.n_triplet,
            agg_plan=self.agg_plan,
        )

    def __iter__(self) -> Iterator[GraphBatch]:
        for chunk in self.batch_indices(self.epoch):
            yield self.build(chunk)


class BucketedBatcher:
    """Size-bucketed epoch iterator (SURVEY section 7.1 design note): samples
    are partitioned into ``num_buckets`` groups by node count, each bucket
    padded only to ITS OWN maximum — jit compiles one executable per bucket
    shape, and padding waste on wide-size-spread datasets (QM9: 3-29 atoms)
    drops accordingly.  Same interface as :class:`PaddedBatcher`.
    """

    def __init__(
        self,
        samples: Sequence[GraphSample],
        batch_size: int,
        num_buckets: int = 4,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        use_pallas_agg: bool = False,
        tile_nodes: int = 128,
        tile_edges: int = 512,
    ):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

        kw = dict(
            drop_last=drop_last,
            use_pallas_agg=use_pallas_agg,
            tile_nodes=tile_nodes,
            tile_edges=tile_edges,
        )
        if hasattr(samples, "set_epoch") and hasattr(samples, "dataset"):
            # cross-host composition (reference reshuffles globally
            # regardless of loader, load_data.py:264-282): bucket the
            # GLOBAL dataset by size ONCE (bucket membership is static —
            # padded dims per bucket must agree across ranks/epochs),
            # then give each bucket its own epoch-seeded global
            # reshuffle view so the rank -> sample assignment still
            # changes every epoch WITHIN every bucket
            from hydragnn_tpu.data.distshuffle import DistributedShuffleView

            base = samples.dataset
            world, rank = samples.world, samples.rank
            seed0 = samples.seed
            order = np.argsort(
                [s.num_nodes for s in base], kind="stable"
            )
            num_buckets = max(1, min(num_buckets, len(order)))
            bounds = np.linspace(0, len(order), num_buckets + 1).astype(int)
            self.buckets = []
            for b in range(num_buckets):
                idx = order[bounds[b] : bounds[b + 1]]
                if not len(idx):
                    continue
                view = DistributedShuffleView(
                    base, world=world, rank=rank,
                    seed=seed0 + 104729 * b, subset=idx,
                )
                self.buckets.append(
                    PaddedBatcher(
                        view, batch_size, shuffle=shuffle,
                        seed=seed + 7919 * b, **kw,
                    )
                )
            return

        order = np.argsort([s.num_nodes for s in samples], kind="stable")
        samples = [samples[i] for i in order]
        num_buckets = max(1, min(num_buckets, len(samples)))
        bounds = np.linspace(0, len(samples), num_buckets + 1).astype(int)
        self.buckets: List[PaddedBatcher] = []
        for b in range(num_buckets):
            group = samples[bounds[b] : bounds[b + 1]]
            if not group:
                continue
            self.buckets.append(
                PaddedBatcher(
                    group,
                    batch_size,
                    shuffle=shuffle,
                    seed=seed + 7919 * b,
                    **kw,
                )
            )

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        for b in self.buckets:
            b.set_epoch(epoch)

    def __len__(self) -> int:
        return sum(len(b) for b in self.buckets)

    def __iter__(self) -> Iterator[GraphBatch]:
        batches = [(bi, j) for bi, b in enumerate(self.buckets) for j in range(len(b))]
        if self.shuffle:
            rng = np.random.default_rng(self.seed + 31 * self.epoch + 1)
            rng.shuffle(batches)
        iters = [iter(b) for b in self.buckets]
        for bi, _ in batches:
            yield next(iters[bi])

    def padded_dims(self) -> List[Tuple[int, int, int]]:
        return [b.dims for b in self.buckets]


def padding_waste(loader) -> float:
    """Fraction of padded node slots that hold no real node over one epoch
    (the bucketing before/after metric)."""
    total = 0
    used = 0
    for batch in loader:
        total += int(np.asarray(batch.node_mask).shape[0])
        used += int(np.asarray(batch.node_mask).sum())
    return 1.0 - used / max(total, 1)
