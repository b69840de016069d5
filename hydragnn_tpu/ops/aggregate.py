"""High-level edge->node aggregation with automatic kernel dispatch.

``aggregate(graph, data, op, at)`` is the one entry point convs use:
  * if the batch carries Pallas plans (PaddedBatcher(build_agg_plans=True)),
    sum/mean run through the tiled one-hot SpMM kernel
    (ops/pallas_segment.py) with a custom VJP whose backward is a plain
    gather -- no scatters in either direction;
  * otherwise falls back to the XLA segment ops (sorted lowering when the
    batch is receiver-sorted).

Sender-side aggregation (EGNN/PaiNN/PNAEq families) routes through the
precomputed sender-sort permutation so it hits the same sorted kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.ops.segment import (
    segment_mean,
    segment_sum,
)


# The four aggregation primitives are linear maps, declared to JAX as
# ``linear_call`` pairs (fun, fun_transpose).  linear_call never
# differentiates the bodies: the JVP of a linear map is the map itself and
# the transpose is the supplied partner, so these compose under AD to ANY
# order — in particular the MLIP force path's grad-of-grad
# (energy_force_loss, models/mlip.py) works where a jax.custom_vjp would
# raise on the forward-mode pass of reverse-over-reverse.
#
# Masking convention: segment sums mask padding edges on the way in, and
# their transposes mask the gathered cotangents; the node->edge gathers
# are unmasked forward (padding edges read real rows, downstream consumers
# mask) with masked-sum transposes — padding-edge cotangents are always
# downstream-masked, so the pairing is exact on every path that reaches
# the loss.


_XLA_GATHER_NS_PER_ROW = 17.0  # measured on v5e, width-independent
_MXU_FLOPS_PER_NS = 138e3  # ~70% of v5e bf16 peak on the one-hot dots


def _eg_plan(graph, at, F=None, dtype=None):
    """(win, lot, Wg) for the edge-gather kernel, or None when the batch
    carries no edge-gather plan (ops/fused_gather.py edge_gather_raw) or
    the kernel would lose to XLA's row gather.  The kernel's cost is MXU
    flops LINEAR in table width (F * Wg * 2 per edge row, x3 dots for the
    exact fp32 split); XLA's gather is ~constant ns/row — wide fp32
    tables (MACE's m-major features) are cheaper through XLA."""
    from hydragnn_tpu.ops.fused_gather import has_edge_gather

    if not has_edge_gather(graph):
        return None
    Wg = int(graph.agg_meta[6])
    if F is not None:
        ndots = 3 if dtype == jnp.float32 else 1
        if F * Wg * 2 * ndots / _MXU_FLOPS_PER_NS > _XLA_GATHER_NS_PER_ROW:
            return None
    if at == "senders":
        return (graph.eg_snd_win, graph.eg_snd_lot, Wg)
    return (graph.eg_rcv_win, graph.eg_rcv_lot, Wg)


def _ws_graph(graph, F, dtype):
    """The batch itself when the "wsum" sender segment-sum beats the
    permutation-gather + sorted-plan composition at this width, else
    None.  Same linear-in-width MXU cost vs the perm gather's constant
    ~17 ns/row (plus the sorted segment sum both variants share)."""
    from hydragnn_tpu.ops.fused_gather import has_window_plans

    if not has_window_plans(graph):
        return None
    W = int(graph.agg_meta[4])
    nd = 2 if dtype == jnp.float32 else 1
    if F * W * 2 * nd / _MXU_FLOPS_PER_NS > _XLA_GATHER_NS_PER_ROW:
        return None
    return graph


def _eg_gather(eg, table, idx, edge_mask):
    """Masked node->edge gather: the Pallas one-hot kernel when a plan is
    present, else the XLA row gather.  Both read 0 on padding edges."""
    if eg is None:
        return jnp.where(edge_mask[:, None], table[idx], 0)
    from hydragnn_tpu.ops.fused_gather import edge_gather_raw

    win, lot, Wg = eg
    return edge_gather_raw(table, win, lot, idx.shape[0], Wg)


def _pallas_segsum(data, off, nb, sid, gather_idx, edge_mask, n_node, meta,
                   eg=None):
    """Masked sorted-segment sum [E, F] -> [N, F] (receiver plan);
    transpose = masked gather at ``gather_idx`` (Pallas edge-gather kernel
    when the batch carries a plan)."""
    from jax.custom_derivatives import linear_call

    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    def fwd(res, d):
        off_, nb_, sid_ = res[:3]
        # no input mask: the tile plan already excludes padding edges
        return segment_sum_pallas_raw(d, off_, nb_, sid_, n_node, meta)

    def trans(res, ct):
        gidx, em = res[3], res[4]
        # padding edges contribute nothing forward -> zero cotangent
        if eg is None:
            return jnp.where(em[:, None], ct[gidx], 0)
        return _eg_gather((res[5], res[6], eg[2]), ct, gidx, em)

    res = (off, nb, sid, gather_idx, edge_mask) + (
        (eg[0], eg[1]) if eg is not None else ()
    )
    return linear_call(fwd, trans, res, data)


def _pallas_segsum_perm(data, perm, off, nb, sid, gather_idx, edge_mask,
                        n_node, meta, eg=None, ws_graph=None):
    """Sender-side variant.  With ``ws_graph`` (a batch with window plans)
    the forward reduces BATCH-ORDER edge data straight onto the senders
    via the receiver plan's "wsum" pass -- no edge->edge permutation
    gather (an XLA row gather, ~17 ns/row).  Otherwise the sort
    permutation is applied inside, so the transpose is a single gather by
    the original (unsorted) index -- no scatter in either direction."""
    from jax.custom_derivatives import linear_call

    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    def fwd(res, d):
        if ws_graph is not None:
            from hydragnn_tpu.ops.fused_gather import segsum_senders_raw

            return segsum_senders_raw(ws_graph, d)
        perm_, off_, nb_, sid_ = res[:4]
        return segment_sum_pallas_raw(d[perm_], off_, nb_, sid_, n_node, meta)

    def trans(res, ct):
        gidx, em = res[4], res[5]
        if eg is None:
            return jnp.where(em[:, None], ct[gidx], 0)
        return _eg_gather((res[6], res[7], eg[2]), ct, gidx, em)

    res = (perm, off, nb, sid, gather_idx, edge_mask) + (
        (eg[0], eg[1]) if eg is not None else ()
    )
    return linear_call(fwd, trans, res, data)


def _gather_rows(x, idx, perm, off, nb, sid, edge_mask, n_node, meta,
                 eg=None, ws_graph=None):
    """Node->edge gather whose transpose is the sorted Pallas segment sum
    (sender plan) instead of an XLA scatter-add.  With an edge-gather plan
    the forward runs the Pallas one-hot kernel (padding edges read 0 --
    its exact adjoint is the plan-masked segment sum); otherwise the
    forward is the plain XLA row gather (padding edges read real rows,
    downstream consumers mask)."""
    from jax.custom_derivatives import linear_call

    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    def fwd(res, v):
        idx_, em_ = res[0], res[5]
        if eg is None:
            return v[idx_]
        return _eg_gather((res[6], res[7], eg[2]), v, idx_, em_)

    def trans(res, ct):
        if ws_graph is not None:
            from hydragnn_tpu.ops.fused_gather import segsum_senders_raw

            return segsum_senders_raw(ws_graph, ct)
        perm_, off_, nb_, sid_ = res[1:5]
        return segment_sum_pallas_raw(ct[perm_], off_, nb_, sid_, n_node, meta)

    res = (idx, perm, off, nb, sid, edge_mask) + (
        (eg[0], eg[1]) if eg is not None else ()
    )
    return linear_call(fwd, trans, res, x)


def _gather_rows_noperm(x, idx, off, nb, sid, edge_mask, n_node, meta,
                        eg=None):
    """Receiver-side gather; transpose = sorted Pallas sum (receiver plan)."""
    from jax.custom_derivatives import linear_call

    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    def fwd(res, v):
        idx_, em_ = res[0], res[4]
        if eg is None:
            return v[idx_]
        return _eg_gather((res[5], res[6], eg[2]), v, idx_, em_)

    def trans(res, ct):
        off_, nb_, sid_ = res[1:4]
        return segment_sum_pallas_raw(ct, off_, nb_, sid_, n_node, meta)

    res = (idx, off, nb, sid, edge_mask) + (
        (eg[0], eg[1]) if eg is not None else ()
    )
    return linear_call(fwd, trans, res, x)




def _pad_cols(x):
    """Pad the feature dim up to a multiple of 128 (lane tile).  XLA's
    serial scatter on narrow tensors costs ~10x more than running the
    Pallas kernels on the padded width (a 1-column scatter-add measured
    2.6 ms vs 0.2 ms padded at E=262k on v5e) — first conv layers of
    1-feature inputs hit exactly this."""
    cols = x.shape[-1]
    pad = (-cols) % 128
    if pad == 0:
        return x, cols
    return jnp.pad(x, ((0, 0), (0, pad))), cols


def gather_nodes(graph: GraphBatch, x: jnp.ndarray, at: str = "senders"):
    """x[senders or receivers] whose BACKWARD (a scatter-add in plain XLA)
    runs through the sorted Pallas segment-sum kernel."""
    assert at in ("senders", "receivers")
    idx = graph.senders if at == "senders" else graph.receivers
    use_pallas = (
        graph.agg_meta is not None
        and x.ndim == 2
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        return x[idx]
    xp, cols = _pad_cols(x)
    if at == "senders":
        if graph.agg_snd_off is None:
            return x[idx]
        out = _gather_rows(
            xp, idx, graph.agg_snd_perm, graph.agg_snd_off,
            graph.agg_snd_nb, graph.agg_snd_sid,
            graph.edge_mask, graph.n_node, graph.agg_meta,
            eg=_eg_plan(graph, "senders", xp.shape[1], xp.dtype),
            ws_graph=_ws_graph(graph, xp.shape[1], xp.dtype),
        )
    else:
        out = _gather_rows_noperm(
            xp,
            idx,
            graph.agg_rcv_off,
            graph.agg_rcv_nb,
            graph.agg_rcv_sid,
            graph.edge_mask,
            graph.n_node,
            graph.agg_meta,
            eg=_eg_plan(graph, "receivers", xp.shape[1], xp.dtype),
        )
    return out[:, :cols] if cols != out.shape[-1] else out


def neighbor_reduce(graph: GraphBatch, x: jnp.ndarray, op: str = "sum"):
    """sum/mean of x over in-neighbours: sum_{e: rcv=n} x[snd[e]] -- the
    GIN/SAGE/MFC message+aggregate.  With window plans this is ONE fused
    Pallas kernel each way (no [E, F] intermediate in HBM,
    ops/fused_gather.py); otherwise the gather + segment composition."""
    from hydragnn_tpu.ops.fused_gather import gather_segsum, has_window_plans

    assert op in ("sum", "mean")
    if (
        has_window_plans(graph)
        and x.ndim == 2
        and jnp.issubdtype(x.dtype, jnp.floating)
    ):
        xp, cols = _pad_cols(x)
        s = gather_segsum(graph, xp, "senders")
        if cols != s.shape[-1]:
            s = s[:, :cols]
        if op == "mean":
            s = s / jnp.maximum(graph.rcv_count, 1.0).astype(s.dtype)[:, None]
        return s
    return aggregate(graph, gather_nodes(graph, x, "senders"), op, "receivers")


def segment_minmax(graph: GraphBatch, data: jnp.ndarray):
    """(min, max) masked segment extrema at receivers in ONE pass over the
    edge data (the op is HBM-bound; PNA needs both), with a scatter-free
    backward: cotangents flow to extremal edges (split evenly among ties),
    tie counts computed with compares + the Pallas sum — no scatter
    anywhere.  The Pallas forward's end-select is exact (bf16 direct, fp32
    3-way split), so the d == out[receivers] comparison holds bitwise.

    Tie semantics: exact ties (only duplicate PBC image edges in practice)
    split the cotangent evenly — the textbook subgradient, matching numpy
    ground truth and the manual composition of jax's own segment-op VJPs.
    jax's fused gather+scatter-extremal AD picks a different (also valid)
    subgradient at such ties, so grads may differ from the XLA fallback
    path at tied entries; both are correct."""
    from hydragnn_tpu.ops.segment import segment_max, segment_min

    use_pallas = (
        graph.agg_meta is not None
        and data.ndim == 2
        and jnp.issubdtype(data.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        kw = dict(
            mask=graph.edge_mask, indices_are_sorted=graph.edges_sorted
        )
        return (
            segment_min(data, graph.receivers, graph.n_node, **kw),
            segment_max(data, graph.receivers, graph.n_node, **kw),
        )
    data, _mm_cols = _pad_cols(data)

    def _seg2(edge_vals):
        """One fused Pallas sum over feature-concatenated halves."""
        return _pallas_segsum(
            edge_vals,
            graph.agg_rcv_off,
            graph.agg_rcv_nb,
            graph.agg_rcv_sid,
            graph.receivers,
            graph.edge_mask,
            graph.n_node,
            graph.agg_meta,
            eg=_eg_plan(
                graph, "receivers", edge_vals.shape[1], edge_vals.dtype
            ),
        )

    # custom_jvp (not custom_vjp) so the op composes under grad-of-grad
    # (MLIP force training): the tangent map is tie-averaged and built
    # from linear_call sums, so JAX can transpose it — the transpose IS
    # the even-split cotangent rule.
    @jax.custom_jvp
    def _mm(d):
        from hydragnn_tpu.ops.pallas_segment import segment_minmax_pallas_raw

        out = segment_minmax_pallas_raw(
            d, graph.agg_rcv_off, graph.agg_rcv_nb, graph.agg_rcv_sid,
            graph.n_node, graph.agg_meta,
        )
        return out[:, 1, :], out[:, 0, :]

    @_mm.defjvp
    def _mm_jvp(primals, tangents):
        (d,) = primals
        (td,) = tangents
        mn, mx = _mm(d)
        em = graph.edge_mask[:, None]
        sel_mn = (d == mn[graph.receivers]) & em
        sel_mx = (d == mx[graph.receivers]) & em
        # both tie counts in one Pallas sum pass (concat on features)
        ties = _seg2(
            jnp.concatenate(
                [sel_mn.astype(d.dtype), sel_mx.astype(d.dtype)], axis=-1
            )
        )
        inv = 1.0 / jnp.maximum(jax.lax.stop_gradient(ties), 1.0)
        i_mn, i_mx = jnp.split(inv[graph.receivers], 2, axis=-1)
        w_mn = jnp.where(sel_mn, i_mn, 0.0)
        w_mx = jnp.where(sel_mx, i_mx, 0.0)
        tboth = _seg2(jnp.concatenate([w_mn * td, w_mx * td], axis=-1))
        t_mn, t_mx = jnp.split(tboth, 2, axis=-1)
        return (mn, mx), (t_mn, t_mx)

    mn, mx = _mm(data)
    if _mm_cols != data.shape[-1]:
        mn, mx = mn[:, :_mm_cols], mx[:, :_mm_cols]
    return mn, mx


def segment_extreme(graph: GraphBatch, data: jnp.ndarray, op: str = "max"):
    """Masked segment max/min at receivers (see :func:`segment_minmax`)."""
    assert op in ("max", "min")
    mn, mx = segment_minmax(graph, data)
    return mx if op == "max" else mn


def aggregate(
    graph: GraphBatch,
    data: jnp.ndarray,  # [E, F] edge values
    op: str = "sum",
    at: str = "receivers",
) -> jnp.ndarray:
    """Masked segment reduction of edge values to nodes. [E, F] -> [N, F]."""
    assert at in ("receivers", "senders")
    idx = graph.receivers if at == "receivers" else graph.senders
    use_pallas = (
        graph.agg_meta is not None
        and data.ndim == 2
        and jnp.issubdtype(data.dtype, jnp.floating)
        and op in ("sum", "mean")
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        data_p, cols = _pad_cols(data)
        if at == "receivers":
            s = _pallas_segsum(
                data_p,
                graph.agg_rcv_off,
                graph.agg_rcv_nb,
                graph.agg_rcv_sid,
                graph.receivers,
                graph.edge_mask,
                graph.n_node,
                graph.agg_meta,
                eg=_eg_plan(graph, "receivers", data_p.shape[1], data_p.dtype),
            )
        elif graph.agg_snd_off is not None:
            s = _pallas_segsum_perm(
                data_p,
                graph.agg_snd_perm,
                graph.agg_snd_off,
                graph.agg_snd_nb,
                graph.agg_snd_sid,
                graph.senders,
                graph.edge_mask,
                graph.n_node,
                graph.agg_meta,
                eg=_eg_plan(graph, "senders", data_p.shape[1], data_p.dtype),
                ws_graph=_ws_graph(graph, data_p.shape[1], data_p.dtype),
            )
        else:
            s = None
        if s is not None:
            if cols != s.shape[-1]:
                s = s[:, :cols]
            if op == "mean":
                cnt = graph.rcv_count if at == "receivers" else graph.snd_count
                s = s / jnp.maximum(cnt, 1.0).astype(s.dtype)[:, None]
            return s

    sorted_ = graph.edges_sorted and at == "receivers"
    if op == "sum":
        return segment_sum(
            data, idx, graph.n_node, mask=graph.edge_mask,
            indices_are_sorted=sorted_,
        )
    if op == "mean":
        return segment_mean(
            data, idx, graph.n_node, mask=graph.edge_mask,
            indices_are_sorted=sorted_,
        )
    raise ValueError(f"unsupported op {op}")
