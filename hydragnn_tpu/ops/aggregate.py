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


def segment_extreme(graph: GraphBatch, data: jnp.ndarray, op: str = "max"):
    """Masked segment max/min at receivers with a scatter-free backward:
    cotangents flow to extremal edges (split evenly among ties), computed
    with compares + the Pallas sum — no scatter in the VJP."""
    assert op in ("max", "min")
    from hydragnn_tpu.ops.segment import segment_max, segment_min

    fn = segment_max if op == "max" else segment_min

    use_pallas = (
        graph.agg_meta is not None
        and data.ndim == 2
        and data.shape[-1] % 128 == 0
        and jnp.issubdtype(data.dtype, jnp.floating)
        and jax.default_backend() == "tpu"
    )
    if not use_pallas:
        return fn(
            data,
            graph.receivers,
            graph.n_node,
            mask=graph.edge_mask,
            indices_are_sorted=graph.edges_sorted,
        )

    @jax.custom_vjp
    def _ext(d):
        return fn(
            d, graph.receivers, graph.n_node, mask=graph.edge_mask,
            indices_are_sorted=graph.edges_sorted,
        )

    def _fwd(d):
        out = _ext(d)
        return out, (d, out)

    def _bwd(res, g):
        d, out = res
        sel = (d == out[graph.receivers]) & graph.edge_mask[:, None]
        self_f = sel.astype(d.dtype)
        ties = _pallas_segsum(
            self_f,
            graph.agg_rcv_off,
            graph.agg_rcv_nb,
            graph.agg_rcv_sid,
            graph.receivers,
            graph.edge_mask,
            graph.n_node,
            graph.agg_meta,
        )
        gd = jnp.where(
            sel, g[graph.receivers] / jnp.maximum(ties, 1.0)[graph.receivers], 0.0
        )
        return (gd,)

    _ext.defvjp(_fwd, _bwd)
    return _ext(data)


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
