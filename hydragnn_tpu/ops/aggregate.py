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


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _pallas_segsum(data, off, nb, sid, gather_idx, edge_mask, n_node, meta):
    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    return segment_sum_pallas_raw(data, off, nb, sid, n_node, meta)


def _pallas_segsum_fwd(data, off, nb, sid, gather_idx, edge_mask, n_node, meta):
    out = _pallas_segsum(data, off, nb, sid, gather_idx, edge_mask, n_node, meta)
    return out, (gather_idx, edge_mask)


def _pallas_segsum_bwd(n_node, meta, res, g):
    gather_idx, edge_mask = res
    # d/d data of sum-at-index = gather of cotangent rows; padding edges
    # contributed nothing forward, so their cotangent must be zeroed
    gd = jnp.where(edge_mask[:, None], g[gather_idx], 0)
    return (gd, None, None, None, None, None)


_pallas_segsum.defvjp(_pallas_segsum_fwd, _pallas_segsum_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _pallas_segsum_perm(data, perm, off, nb, sid, gather_idx, edge_mask, n_node, meta):
    """Sender-side variant: the sort permutation is applied INSIDE the
    custom vjp so the backward is a single gather of cotangents by the
    original (unsorted) index -- no permutation scatter."""
    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    return segment_sum_pallas_raw(data[perm], off, nb, sid, n_node, meta)


def _pallas_segsum_perm_fwd(
    data, perm, off, nb, sid, gather_idx, edge_mask, n_node, meta
):
    out = _pallas_segsum_perm(
        data, perm, off, nb, sid, gather_idx, edge_mask, n_node, meta
    )
    return out, (gather_idx, edge_mask)


def _pallas_segsum_perm_bwd(n_node, meta, res, g):
    gather_idx, edge_mask = res
    gd = jnp.where(edge_mask[:, None], g[gather_idx], 0)
    return (gd, None, None, None, None, None, None)


_pallas_segsum_perm.defvjp(_pallas_segsum_perm_fwd, _pallas_segsum_perm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _gather_rows(x, idx, perm, off, nb, sid, edge_mask, n_node, meta):
    return x[idx]


def _gather_rows_fwd(x, idx, perm, off, nb, sid, edge_mask, n_node, meta):
    return x[idx], (perm, off, nb, sid, edge_mask)


def _gather_rows_bwd(n_node, meta, res, g):
    perm, off, nb, sid, edge_mask = res
    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    g = jnp.where(edge_mask[:, None], g, 0)
    gx = segment_sum_pallas_raw(g[perm], off, nb, sid, n_node, meta)
    return (gx, None, None, None, None, None, None)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gather_rows_noperm(x, idx, off, nb, sid, edge_mask, n_node, meta):
    return x[idx]


def _gather_rows_noperm_fwd(x, idx, off, nb, sid, edge_mask, n_node, meta):
    return x[idx], (off, nb, sid, edge_mask)


def _gather_rows_noperm_bwd(n_node, meta, res, g):
    off, nb, sid, edge_mask = res
    from hydragnn_tpu.ops.pallas_segment import segment_sum_pallas_raw

    g = jnp.where(edge_mask[:, None], g, 0)
    gx = segment_sum_pallas_raw(g, off, nb, sid, n_node, meta)
    return (gx, None, None, None, None, None)


_gather_rows_noperm.defvjp(_gather_rows_noperm_fwd, _gather_rows_noperm_bwd)


def gather_nodes(graph: GraphBatch, x: jnp.ndarray, at: str = "senders"):
    """x[senders or receivers] whose BACKWARD (a scatter-add in plain XLA)
    runs through the sorted Pallas segment-sum kernel."""
    assert at in ("senders", "receivers")
    idx = graph.senders if at == "senders" else graph.receivers
    use_pallas = (
        graph.agg_meta is not None
        and x.ndim == 2
        and x.shape[-1] % 128 == 0
        and jnp.issubdtype(x.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        return x[idx]
    if at == "senders":
        if graph.agg_snd_off is None:
            return x[idx]
        perm, off, nb, sid = (
            graph.agg_snd_perm,
            graph.agg_snd_off,
            graph.agg_snd_nb,
            graph.agg_snd_sid,
        )
    else:
        return _gather_rows_noperm(
            x,
            idx,
            graph.agg_rcv_off,
            graph.agg_rcv_nb,
            graph.agg_rcv_sid,
            graph.edge_mask,
            graph.n_node,
            graph.agg_meta,
        )
    return _gather_rows(
        x, idx, perm, off, nb, sid, graph.edge_mask, graph.n_node, graph.agg_meta
    )


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
        and data.shape[-1] % 128 == 0
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

    @jax.custom_vjp
    def _mm(d):
        from hydragnn_tpu.ops.pallas_segment import segment_minmax_pallas_raw

        out = segment_minmax_pallas_raw(
            d, graph.agg_rcv_off, graph.agg_rcv_nb, graph.agg_rcv_sid,
            graph.n_node, graph.agg_meta,
        )
        return out[:, 1, :], out[:, 0, :]

    def _fwd(d):
        out = _mm(d)
        return out, (d, out)

    def _bwd(res, g):
        d, (mn, mx) = res
        g_mn, g_mx = g
        em = graph.edge_mask[:, None]
        sel_mn = (d == mn[graph.receivers]) & em
        sel_mx = (d == mx[graph.receivers]) & em
        # both tie counts in one Pallas sum pass (concat on features)
        ties = _pallas_segsum(
            jnp.concatenate(
                [sel_mn.astype(d.dtype), sel_mx.astype(d.dtype)], axis=-1
            ),
            graph.agg_rcv_off,
            graph.agg_rcv_nb,
            graph.agg_rcv_sid,
            graph.receivers,
            graph.edge_mask,
            graph.n_node,
            graph.agg_meta,
        )
        t_mn, t_mx = jnp.split(ties, 2, axis=-1)
        gd = jnp.where(
            sel_mn, g_mn[graph.receivers] / jnp.maximum(t_mn, 1.0)[graph.receivers], 0.0
        ) + jnp.where(
            sel_mx, g_mx[graph.receivers] / jnp.maximum(t_mx, 1.0)[graph.receivers], 0.0
        )
        return (gd,)

    _mm.defvjp(_fwd, _bwd)
    return _mm(data)


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
        and data.shape[-1] % 128 == 0
        and jnp.issubdtype(data.dtype, jnp.floating)
        and op in ("sum", "mean")
        and jax.default_backend() == "tpu"
    )
    if use_pallas:
        if at == "receivers":
            s = _pallas_segsum(
                data,
                graph.agg_rcv_off,
                graph.agg_rcv_nb,
                graph.agg_rcv_sid,
                graph.receivers,
                graph.edge_mask,
                graph.n_node,
                graph.agg_meta,
            )
        elif graph.agg_snd_off is not None:
            s = _pallas_segsum_perm(
                data,
                graph.agg_snd_perm,
                graph.agg_snd_off,
                graph.agg_snd_nb,
                graph.agg_snd_sid,
                graph.senders,
                graph.edge_mask,
                graph.n_node,
                graph.agg_meta,
            )
        else:
            s = None
        if s is not None:
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
