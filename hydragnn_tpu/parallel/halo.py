"""Edge-partitioned aggregation with explicit halo exchange over ICI.

The headline graph-parallel capability (SURVEY.md §2.2 'SP/CP' row; the
reference never partitions a single graph — each graph must fit one rank).
`parallel/graph_shard.py` already gets correctness by annotating leading-dim
shardings and letting XLA insert collectives, but for the node-feature
gather XLA's only general plan is an **all-gather of the full node array**
(it cannot prove which rows each shard needs), so comm volume is N·F per
device per layer.

This module plans the communication on the host instead, where the edge
list is known:

  * nodes are split into S contiguous blocks; every edge is owned by the
    shard of its RECEIVER, so the segment-sum is entirely local;
  * each shard's in-edges read senders that are mostly local (after
    `graph_shard.reorder_for_locality`-style node numbering, i.e. graphs
    laid out contiguously); the few remote senders form the **halo**;
  * the halo rows are exchanged with ONE tiled `lax.all_to_all` of shape
    [S·h, F] (h = max rows any pair exchanges), so comm volume is S·h·F
    — typically a small fraction of the all-gather's N·F;
  * edges are split host-side into a local-sender group and a halo-sender
    group: the local partial sum has no data dependency on the all_to_all,
    so XLA's latency-hiding scheduler overlaps the exchange with the local
    aggregation (the graph analogue of overlapping context-parallel
    attention with its ring exchange);
  * the whole thing is plain differentiable JAX — the transpose of
    all_to_all is the reverse exchange, so `jax.grad` through a halo
    aggregation emits exactly one reverse all_to_all.

`comm_bytes()` reports planned bytes/device/layer for both strategies so
benchmarks can anchor the claim (BENCH/HALO artifacts).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydragnn_tpu.graphs import GraphBatch


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class HaloPlan:
    """Host-built static-shape communication plan for one padded batch.

    All per-shard arrays are stacked on a leading S axis so they shard over
    the mesh with `P('graph')`.
    """

    n_shards: int
    block: int  # nodes per shard (padded N = S * block)
    e_local: int  # padded local-sender edges per shard
    e_halo: int  # padded halo-sender edges per shard
    h: int  # halo rows exchanged per (src, dst) shard pair

    # shard s sends x_local[send_idx[s, t]] to shard t
    send_idx: np.ndarray  # [S, S, h] int32 into the local block
    send_mask: np.ndarray  # [S, S, h] bool

    # local-sender edges: gather from the local block
    loc_gather: np.ndarray  # [S, e_local] int32 into [block]
    loc_rcv: np.ndarray  # [S, e_local] int32 into [block]
    loc_mask: np.ndarray  # [S, e_local] bool
    loc_eid: np.ndarray  # [S, e_local] int32 original edge id (host use)

    # halo-sender edges: gather from the received halo [S*h]
    halo_gather: np.ndarray  # [S, e_halo] int32 into [S*h]
    halo_rcv: np.ndarray  # [S, e_halo] int32 into [block]
    halo_mask: np.ndarray  # [S, e_halo] bool
    halo_eid: np.ndarray  # [S, e_halo] int32 original edge id (host use)

    def comm_bytes(self, feat_dim: int, dtype_bytes: int = 4) -> dict:
        """Planned comm volume per device per aggregation, vs all-gather."""
        n = self.n_shards * self.block
        return {
            "halo_bytes": self.n_shards * self.h * feat_dim * dtype_bytes,
            "allgather_bytes": n * feat_dim * dtype_bytes,
            "halo_fraction_of_allgather": (
                self.n_shards * self.h / max(n, 1)
            ),
        }


def build_halo_plan(
    batch: GraphBatch, n_shards: int, align: int = 8
) -> HaloPlan:
    """Plan the halo exchange for a padded batch whose node count divides
    ``n_shards`` (use `graph_shard.pad_to_multiple` first if needed)."""
    S = n_shards
    N = int(batch.node_mask.shape[0])
    assert N % S == 0, f"padded node count {N} must divide n_shards {S}"
    block = N // S
    snd = np.asarray(batch.senders, np.int64)
    rcv = np.asarray(batch.receivers, np.int64)
    em = np.asarray(batch.edge_mask, bool)

    e_own = rcv // block  # owner shard of each edge
    s_own = snd // block  # owner shard of each edge's sender

    per_shard = []
    needed: list[list[np.ndarray]] = []  # needed[s][t] = global ids s needs from t
    for s in range(S):
        es = np.where(em & (e_own == s))[0]
        local = es[s_own[es] == s]
        remote = es[s_own[es] != s]
        need_t = []
        for t in range(S):
            ids = np.unique(snd[remote[s_own[remote] == t]])
            need_t.append(ids)
        needed.append(need_t)
        per_shard.append((local, remote))

    e_local = _round_up(max((len(l) for l, _ in per_shard), default=1) or 1, align)
    e_halo = _round_up(max((len(r) for _, r in per_shard), default=1) or 1, align)
    h = _round_up(
        max(
            (len(needed[s][t]) for s in range(S) for t in range(S)),
            default=1,
        )
        or 1,
        align,
    )

    send_idx = np.zeros((S, S, h), np.int32)
    send_mask = np.zeros((S, S, h), bool)
    for t in range(S):  # shard t sends to shard s what s needs from t
        for s in range(S):
            ids = needed[s][t]
            send_idx[t, s, : len(ids)] = (ids - t * block).astype(np.int32)
            send_mask[t, s, : len(ids)] = True

    loc_gather = np.zeros((S, e_local), np.int32)
    loc_rcv = np.full((S, e_local), block - 1, np.int32)
    loc_mask = np.zeros((S, e_local), bool)
    loc_eid = np.zeros((S, e_local), np.int32)
    halo_gather = np.zeros((S, e_halo), np.int32)
    halo_rcv = np.full((S, e_halo), block - 1, np.int32)
    halo_mask = np.zeros((S, e_halo), bool)
    halo_eid = np.zeros((S, e_halo), np.int32)
    for s, (local, remote) in enumerate(per_shard):
        loc_gather[s, : len(local)] = (snd[local] - s * block).astype(np.int32)
        loc_rcv[s, : len(local)] = (rcv[local] - s * block).astype(np.int32)
        loc_mask[s, : len(local)] = True
        loc_eid[s, : len(local)] = local.astype(np.int32)
        # position of remote sender (owner t, k-th id needed from t) = t*h + k
        lut = {}
        for t in range(S):
            for k, gid in enumerate(needed[s][t]):
                lut[int(gid)] = t * h + k
        halo_gather[s, : len(remote)] = np.asarray(
            [lut[int(g)] for g in snd[remote]], np.int32
        )
        halo_rcv[s, : len(remote)] = (rcv[remote] - s * block).astype(np.int32)
        halo_mask[s, : len(remote)] = True
        halo_eid[s, : len(remote)] = remote.astype(np.int32)

    return HaloPlan(
        n_shards=S,
        block=block,
        e_local=e_local,
        e_halo=e_halo,
        h=h,
        send_idx=send_idx,
        send_mask=send_mask,
        loc_gather=loc_gather,
        loc_rcv=loc_rcv,
        loc_mask=loc_mask,
        loc_eid=loc_eid,
        halo_gather=halo_gather,
        halo_rcv=halo_rcv,
        halo_mask=halo_mask,
        halo_eid=halo_eid,
    )


def plan_device_arrays(plan: HaloPlan, mesh: Mesh) -> dict:
    """device_put the plan's stacked arrays sharded over the 'graph' axis."""
    spec = NamedSharding(mesh, P("graph"))
    return {
        k: jax.device_put(getattr(plan, k), spec)
        for k in (
            "send_idx",
            "send_mask",
            "loc_gather",
            "loc_rcv",
            "loc_mask",
            "halo_gather",
            "halo_rcv",
            "halo_mask",
        )
    }


def halo_segment_sum_local(
    x_local: jnp.ndarray,  # [block, F] this shard's node features
    p: dict,  # per-device plan slices (leading dim 1 from shard_map)
    block: int,
    axis_name: str = "graph",
) -> jnp.ndarray:
    """Per-device body: masked segment-sum of gathered sender rows into the
    local node block, with one all_to_all for remote senders.  Call inside
    shard_map; differentiable (the transpose emits the reverse exchange)."""
    send_idx = p["send_idx"][0]  # [S, h]
    send_mask = p["send_mask"][0]
    S, h = send_idx.shape
    F = x_local.shape[-1]

    # local partial first: no dependency on the exchange, so XLA overlaps
    loc_g = p["loc_gather"][0]
    part = jax.ops.segment_sum(
        jnp.where(p["loc_mask"][0][:, None], x_local[loc_g], 0),
        p["loc_rcv"][0],
        block,
        indices_are_sorted=False,
    )

    send = jnp.where(send_mask[:, :, None], x_local[send_idx], 0)  # [S, h, F]
    recv = jax.lax.all_to_all(
        send.reshape(S * h, F), axis_name, 0, 0, tiled=True
    )  # [S*h, F]; block t = rows this shard needs from shard t

    halo_g = p["halo_gather"][0]
    part = part + jax.ops.segment_sum(
        jnp.where(p["halo_mask"][0][:, None], recv[halo_g], 0),
        p["halo_rcv"][0],
        block,
        indices_are_sorted=False,
    )
    return part


def make_halo_aggregate(mesh: Mesh, plan: HaloPlan):
    """Returns jitted f(x [N, F]) -> [N, F] computing the masked
    sender-gather segment-sum at receivers, edge-partitioned over the mesh
    with explicit halo exchange."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax import shard_map

    dev_plan = plan_device_arrays(plan, mesh)
    spec = P("graph")

    @jax.jit
    def agg(x):
        def body(x_local, *pvals):
            p = dict(zip(sorted(dev_plan), pvals))
            return halo_segment_sum_local(x_local, p, plan.block)

        keys = sorted(dev_plan)
        f = shard_map(
            body,
            mesh=mesh,
            in_specs=(spec,) + tuple(spec for _ in keys),
            out_specs=spec,
        )
        return f(x, *(dev_plan[k] for k in keys))

    return agg


def make_halo_train_fns(
    sample, n_shards: int, hidden: int = 64, layers: int = 2, seed: int = 0
):
    """Build (step, init, plan) for training a message-passing network on
    ONE giant graph node-partitioned over a ``graph`` mesh (the capability
    the reference lacks — examples/giant_graph).  ``step(params)`` returns
    (loss, grads): the forward runs under shard_map with one halo
    all_to_all per layer, gradients arrive via the linear transposes (one
    reverse exchange per layer) plus a psum, all on-device."""
    from jax import shard_map

    from hydragnn_tpu.data.batching import collate
    from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
    from hydragnn_tpu.parallel.graph_shard import make_graph_mesh, pad_to_multiple

    sort_edges_by_receiver([sample])
    fy = sample.y_node.shape[-1]
    fin = sample.x.shape[-1]
    batch = collate(
        [sample],
        _round_up(sample.num_nodes + 1, n_shards * 8),
        _round_up(sample.num_edges, 8),
        2,
    )
    batch = pad_to_multiple(batch, n_shards)
    plan = build_halo_plan(batch, n_shards)
    mesh = make_graph_mesh(n_shards)
    dev_plan = plan_device_arrays(plan, mesh)
    keys = sorted(dev_plan)
    spec = P("graph")
    sh = NamedSharding(mesh, spec)
    x_sh = jax.device_put(np.asarray(batch.x, np.float32), sh)
    y_sh = jax.device_put(np.asarray(batch.y_node, np.float32), sh)
    m_sh = jax.device_put(np.asarray(batch.node_mask), sh)

    def init():
        rng = np.random.default_rng(seed)

        def w(shape, fan_in):
            return jnp.asarray(
                rng.normal(0, (2.0 / fan_in) ** 0.5, shape), jnp.float32
            )

        params = {"embed": w((fin, hidden), fin), "out": w((hidden, fy), hidden),
                  "out_b": jnp.zeros((fy,), jnp.float32)}
        for i in range(layers):
            params[f"w_self_{i}"] = w((hidden, hidden), hidden)
            params[f"w_agg_{i}"] = w((hidden, hidden), hidden)
            params[f"b_{i}"] = jnp.zeros((hidden,), jnp.float32)
        return params

    def fwd_local(params, x_loc, y_loc, m_loc, *pvals):
        p = dict(zip(keys, pvals))
        h = jax.nn.relu(x_loc @ params["embed"])
        for i in range(layers):
            a = halo_segment_sum_local(h, p, plan.block)
            h = jax.nn.relu(
                h @ params[f"w_self_{i}"] + a @ params[f"w_agg_{i}"]
                + params[f"b_{i}"]
            )
        pred = h @ params["out"] + params["out_b"]
        se = jnp.sum(jnp.where(m_loc[:, None], (pred - y_loc) ** 2, 0.0))
        n = jnp.sum(m_loc.astype(jnp.float32))
        se = jax.lax.psum(se, "graph")
        n = jax.lax.psum(n, "graph")
        return se / jnp.maximum(n, 1.0) / fy

    loss_fn = shard_map(
        fwd_local,
        mesh=mesh,
        in_specs=(P(), spec, spec, spec) + tuple(spec for _ in keys),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def step(params):
        return jax.value_and_grad(
            lambda prm: loss_fn(prm, x_sh, y_sh, m_sh, *(dev_plan[k] for k in keys))
        )(params)

    return step, init, plan


# ---------------------------------------------------------------------------
# giant-graph halo view for the PRODUCTION ConvStack (models/base.py):
# node-partition one graph and run the standard model families on it
# ---------------------------------------------------------------------------


def build_stack_halo_view(
    sample, n_shards: int, align: int = 8, aggregate_at: str = "receivers",
    with_triplets: bool = False,
):
    """Partition one GraphSample — or a LIST of samples (a batch of
    giants, VERDICT r02 item 5a) — into a stacked [S, ...] GraphBatch of
    per-shard local views for shard_map over a ``graph`` mesh axis.  With
    K samples the view carries K real graphs; pooling/losses segment by
    the real graph ids and psum partial per-graph sums across shards.

    Each shard's node arrays are [block + S*h]: its local block followed by
    HALO COPIES of the remote nodes its in-edges read.  Static per-node
    inputs (x, pos, pe) are host-filled for the halo rows, so layer 0 needs
    no exchange; the stack refreshes halo FEATURES before every later conv
    (models/base.py halo_refresh) and psums the pooling — the standard
    model families then run unchanged on a graph no single device could
    batch — including GPS global attention (local queries attend over
    all-gathered keys/values; models/gps.py halo branch) and MLIP force
    training (position exchange inside the force gradient).

    ``aggregate_at`` must match the model family's message-aggregation
    side so every aggregation is shard-local: "receivers" for the
    receiver-aggregating convs (GIN/PNA/GAT/SAGE/MFC/CGCNN/SchNet/
    PNAPlus), "senders" for the sender-aggregating geometric family
    (EGNN/PaiNN/PNAEq) — edges then live on their SENDER's shard and the
    halo holds remote receivers."""
    from hydragnn_tpu.data.batching import collate
    from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
    from hydragnn_tpu.parallel.graph_shard import pad_to_multiple

    assert aggregate_at in ("receivers", "senders")
    S = n_shards
    samples = sample if isinstance(sample, (list, tuple)) else [sample]
    K = len(samples)
    sort_edges_by_receiver(samples)
    n_trip = None
    if with_triplets:
        assert aggregate_at == "receivers"
        n_trip = _round_up(
            max(sum(t.num_triplets for t in samples), 1), align
        )
    batch = collate(
        samples,
        _round_up(sum(t.num_nodes for t in samples) + 1, S * align),
        _round_up(max(sum(t.num_edges for t in samples), 1), align),
        K + 1,
        n_triplet=n_trip,
    )
    batch = pad_to_multiple(batch, S)
    plan_batch = batch
    if aggregate_at == "senders":
        # plan with the roles swapped: edges are owned by their sender's
        # shard; the plan's "receiver" side is the true sender
        plan_batch = batch.replace(
            senders=batch.receivers, receivers=batch.senders
        )
    E_orig = int(np.asarray(batch.senders).shape[0])
    ghost_kj = None
    if with_triplets:
        # DimeNet on the halo view (VERDICT r02 item 5b): a triplet
        # (kj -> ji) owned by shard(i) needs edge kj's per-layer state,
        # which is a pure function of node features at (k, j) + rbf(kj) —
        # so shard(i) can COMPUTE a bitwise-identical GHOST COPY of kj
        # locally, provided k and j are in its node space.  j is ji's
        # sender (already in the halo); k joins it via ghost planner edges
        # (k -> i) appended before planning.  The ghost slots' receivers
        # are then repointed at j so geometry/rbf are kj's own; their
        # aggregation contributions land on HALO node rows, which the
        # per-layer refresh overwrites and every mask ignores.
        snd0 = np.asarray(batch.senders, np.int64)
        rcv0 = np.asarray(batch.receivers, np.int64)
        em0 = np.asarray(batch.edge_mask, bool)
        Nn = int(np.asarray(batch.node_mask).shape[0])
        blk = Nn // S
        tk = np.asarray(batch.trip_kj, np.int64)
        tj = np.asarray(batch.trip_ji, np.int64)
        tm = np.asarray(batch.trip_mask, bool)
        e_own0 = rcv0 // blk
        # unique (shard, remote kj) pairs -> one ghost edge each
        ghost_kj = {}
        g_snd, g_rcv = [], []
        for a in np.where(tm)[0]:
            kj, ji = int(tk[a]), int(tj[a])
            s_ = int(e_own0[ji])
            if int(e_own0[kj]) != s_ and (s_, kj) not in ghost_kj:
                ghost_kj[(s_, kj)] = E_orig + len(g_snd)
                g_snd.append(int(snd0[kj]))
                g_rcv.append(int(rcv0[ji]))  # any i local to s_
        if g_snd:
            plan_batch = plan_batch.replace(
                senders=np.concatenate(
                    [np.asarray(plan_batch.senders, np.int64), g_snd]
                ).astype(np.int32),
                receivers=np.concatenate(
                    [np.asarray(plan_batch.receivers, np.int64), g_rcv]
                ).astype(np.int32),
                edge_mask=np.concatenate(
                    [np.asarray(plan_batch.edge_mask, bool),
                     np.ones(len(g_snd), bool)]
                ),
            )
    plan = build_halo_plan(plan_batch, S, align=align)
    h, block = plan.h, plan.block
    N = S * block
    pad_node = N - 1

    # global node id of every halo slot: position block + t*h + k on shard s
    # holds what shard t sends to s (send_idx[t, s, k] + t*block)
    ext_ids = np.full((S, S * h), pad_node, np.int64)
    for t in range(S):
        for s in range(S):
            ids = plan.send_idx[t, s].astype(np.int64) + t * block
            m = plan.send_mask[t, s]
            ext_ids[s, t * h : (t + 1) * h][m] = ids[m]

    def node_field(arr, halo_valid=True):
        """[S, block + S*h, ...]: local slice + gathered halo copies."""
        arr = np.asarray(arr)
        out = []
        for s in range(S):
            loc = arr[s * block : (s + 1) * block]
            halo = arr[ext_ids[s]] if halo_valid else np.zeros_like(arr[ext_ids[s]])
            out.append(np.concatenate([loc, halo], axis=0))
        return np.stack(out)

    nm = np.asarray(batch.node_mask)
    x_sh = node_field(batch.x)
    pos_sh = node_field(batch.pos)
    mask_sh = node_field(nm, halo_valid=False)  # halo rows masked out
    # real graph ids for local real rows; halo/padding rows -> pad graph K
    ng_sh = node_field(np.asarray(batch.node_graph), halo_valid=False)
    node_graph_sh = np.where(mask_sh, ng_sh, K).astype(np.int32)
    y_node_sh = (
        node_field(batch.y_node) if batch.y_node is not None else None
    )
    pe_sh = node_field(batch.pe) if batch.pe is not None else None
    forces_sh = node_field(batch.forces) if batch.forces is not None else None

    gather_side = np.stack(
        [
            np.concatenate([plan.loc_gather[s], block + plan.halo_gather[s]])
            for s in range(S)
        ]
    ).astype(np.int32)
    local_side = np.concatenate(
        [plan.loc_rcv, plan.halo_rcv], axis=1
    ).astype(np.int32)
    if aggregate_at == "receivers":
        senders_sh, receivers_sh = gather_side, local_side
    else:  # senders: the plan's local side IS the true sender
        senders_sh, receivers_sh = local_side, gather_side
    emask_sh = np.concatenate([plan.loc_mask, plan.halo_mask], axis=1)
    # original edge ids -> per-shard edge_attr / shifts if present
    eid_sh = np.concatenate([plan.loc_eid, plan.halo_eid], axis=1)
    trip_fields = {}
    if ghost_kj is not None:
        # ghost eids represent their remote kj edge for attrs/geometry
        ghost_of = {v: kj for (s_, kj), v in ghost_kj.items()}
        attr_eid = np.vectorize(lambda e: ghost_of.get(int(e), int(e)))(
            eid_sh
        ).astype(np.int64)
        # repoint ghost receivers at j (kj's receiver) in s-space and build
        # per-shard triplet slot arrays
        snd0 = np.asarray(batch.senders, np.int64)
        rcv0 = np.asarray(batch.receivers, np.int64)
        Nn = np.asarray(batch.node_mask).shape[0]
        blk = Nn // S
        node_lut = []
        for s_ in range(S):
            lut = {}
            for slot, gid in enumerate(ext_ids[s_]):
                lut.setdefault(int(gid), block + slot)
            node_lut.append(lut)

        def node_idx(s_, g):
            g = int(g)
            if g // blk == s_:
                return g - s_ * blk
            return node_lut[s_][g]

        slot_lut = [dict() for _ in range(S)]
        for s_ in range(S):
            for slot in range(eid_sh.shape[1]):
                if emask_sh[s_, slot]:
                    slot_lut[s_][int(eid_sh[s_, slot])] = slot
        for (s_, kj), geid in ghost_kj.items():
            slot = slot_lut[s_][geid]
            j = int(rcv0[kj])
            receivers_sh[s_, slot] = node_idx(s_, j)
        tk = np.asarray(batch.trip_kj, np.int64)
        tj = np.asarray(batch.trip_ji, np.int64)
        tm = np.asarray(batch.trip_mask, bool)
        e_own0 = rcv0 // blk
        per_trip = [[] for _ in range(S)]
        for a in np.where(tm)[0]:
            kj, ji = int(tk[a]), int(tj[a])
            s_ = int(e_own0[ji])
            kj_eid = kj if int(e_own0[kj]) == s_ else ghost_kj[(s_, kj)]
            per_trip[s_].append(
                (slot_lut[s_][kj_eid], slot_lut[s_][ji])
            )
        T = _round_up(max(max(len(t) for t in per_trip), 1), align)
        trip_kj_sh = np.zeros((S, T), np.int32)
        trip_ji_sh = np.zeros((S, T), np.int32)
        trip_mask_sh = np.zeros((S, T), bool)
        for s_, rows in enumerate(per_trip):
            for a, (ks, js) in enumerate(rows):
                trip_kj_sh[s_, a] = ks
                trip_ji_sh[s_, a] = js
                trip_mask_sh[s_, a] = True
        trip_fields = dict(
            trip_kj=trip_kj_sh, trip_ji=trip_ji_sh, trip_mask=trip_mask_sh
        )
    else:
        attr_eid = eid_sh
    edge_attr_sh = (
        np.asarray(batch.edge_attr)[attr_eid]
        if batch.edge_attr is not None
        else None
    )
    shifts_sh = (
        np.asarray(batch.edge_shifts)[attr_eid]
        if batch.edge_shifts is not None
        else None
    )

    # pad_to_multiple may have widened the graph dim: keep K real + 1 pad
    graph_mask_sh = np.tile(
        np.asarray(batch.graph_mask)[: K + 1][None], (S, 1)
    )
    # per-shard LOCAL real node counts per graph (pooling psums these)
    n_per_graph_sh = np.stack(
        [
            np.bincount(
                ng_sh[s_][mask_sh[s_]].astype(np.int64), minlength=K + 1
            ).astype(np.int32)
            for s_ in range(S)
        ]
    )
    # graph-level targets are replicated: every shard carries the full
    # [K+1, F] target table (graph heads are identical across shards
    # after the psum'd pooling)
    y_graph_sh = (
        np.tile(np.asarray(batch.y_graph)[: K + 1][None], (S, 1, 1))
        if batch.y_graph is not None
        else None
    )
    energy_sh = (
        np.tile(
            np.asarray(batch.energy)[: K + 1][None], (S, 1)
        ).astype(np.float32)
        if batch.energy is not None
        else None
    )

    view = GraphBatch(
        x=x_sh.astype(np.float32),
        pos=pos_sh.astype(np.float32),
        node_graph=node_graph_sh,
        node_mask=mask_sh,
        senders=senders_sh,
        receivers=receivers_sh,
        edge_mask=emask_sh,
        graph_mask=graph_mask_sh,
        n_per_graph=n_per_graph_sh,
        edge_attr=edge_attr_sh,
        edge_shifts=shifts_sh,
        y_graph=y_graph_sh,
        y_node=y_node_sh,
        energy=energy_sh,
        pe=pe_sh,
        forces=forces_sh,
        halo_send_idx=plan.send_idx.astype(np.int32),
        halo_send_mask=plan.send_mask,
        halo_axis="graph",
        **trip_fields,
    )
    return view, plan, batch


def shard_stack_view(view, mesh: Mesh):
    spec = NamedSharding(mesh, P("graph"))

    def put(v):
        return None if v is None else jax.device_put(np.asarray(v), spec)

    return jax.tree.map(put, view)


def make_stack_halo_train_fns(model, tx, mesh: Mesh, view, mlip=None):
    """Jitted (train_step, eval_loss) for a ConvStack on a halo view.

    Per-task reduction: graph-head losses are identical on every shard
    after the psum'd pooling (take /S then psum); node-head losses are
    means over each shard's local real nodes (weight by node count).  The
    per-shard weighted total is differentiated, and psum of its gradients
    equals the gradient of the exact global loss."""
    import dataclasses

    from jax import shard_map

    from hydragnn_tpu.train.loop import TrainState

    sync_model = type(model)(
        cfg=dataclasses.replace(model.cfg, bn_sync_axis="graph")
    )
    S = mesh.shape["graph"]
    weights = sync_model.cfg.loss_weights
    types = sync_model.cfg.output_type
    dev_view = shard_stack_view(view, mesh)

    def local_loss(params, batch_stats, b, rng, train):
        if mlip is not None:
            from hydragnn_tpu.models.mlip import energy_force_loss

            _, (e_l, epa_l, f_l), new_bs, _, _ = energy_force_loss(
                sync_model, params, batch_stats, b, mlip, train=train, rng=rng
            )
            nn_loc = b.num_real_nodes.astype(jnp.float32)
            nn_tot = jax.lax.psum(nn_loc, "graph")
            # energy terms are identical on every shard (psum'd total
            # energy); the force term is a mean over local real nodes
            local = (
                float(mlip.get("energy_weight", 0.0)) * e_l / S
                + float(mlip.get("energy_peratom_weight", 0.0)) * epa_l / S
                + float(mlip.get("force_weight", 0.0)) * f_l * nn_loc / nn_tot
            )
            rep = jnp.stack(
                [e_l, epa_l, jax.lax.psum(f_l * nn_loc, "graph") / nn_tot]
            )
            return local, (rep, new_bs)
        if train:
            out, mutated = sync_model.apply(
                {"params": params, "batch_stats": batch_stats},
                b, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            new_bs = mutated["batch_stats"]
        else:
            out = sync_model.apply(
                {"params": params, "batch_stats": batch_stats}, b, train=False
            )
            new_bs = batch_stats
        _, tasks = sync_model.loss(out, b)
        nn_loc = b.num_real_nodes.astype(jnp.float32)
        nn_tot = jax.lax.psum(nn_loc, "graph")
        parts = []
        rep = []
        for w, t_, typ in zip(weights, tasks, types):
            if typ == "graph":
                parts.append(w * t_ / S)
                rep.append(t_)  # identical on every shard
            else:
                parts.append(w * t_ * nn_loc / nn_tot)
                rep.append(jax.lax.psum(t_ * nn_loc, "graph") / nn_tot)
        return sum(parts), (jnp.stack(rep), new_bs)

    def train_body(state, stacked):
        b = jax.tree.map(lambda v: v[0], stacked)
        rng = jax.random.fold_in(jax.random.PRNGKey(0), state.step)
        rng = jax.random.fold_in(rng, jax.lax.axis_index("graph"))
        (local, (tasks, new_bs)), grads = jax.value_and_grad(
            lambda p: local_loss(p, state.batch_stats, b, rng, True),
            has_aux=True,
        )(state.params)
        grads = jax.lax.psum(grads, "graph")
        loss = jax.lax.psum(local, "graph")
        new_bs = jax.tree.map(
            lambda s_: jax.lax.pmean(s_, "graph")
            if jnp.issubdtype(s_.dtype, jnp.floating)
            else jax.lax.pmax(s_, "graph"),
            new_bs,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return (
            TrainState(
                params=new_params, batch_stats=new_bs,
                opt_state=new_opt, step=state.step + 1,
            ),
            loss, tasks,
        )

    def eval_body(state, stacked):
        b = jax.tree.map(lambda v: v[0], stacked)
        local, (tasks, _) = local_loss(
            state.params, state.batch_stats, b, None, False
        )
        return jax.lax.psum(local, "graph"), tasks

    spec = P("graph")
    train_step = jax.jit(
        shard_map(
            train_body, mesh=mesh,
            in_specs=(P(), spec), out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )
    eval_loss = jax.jit(
        shard_map(
            eval_body, mesh=mesh,
            in_specs=(P(), spec), out_specs=(P(), P()),
            check_vma=False,
        )
    )
    return train_step, eval_loss, dev_view
