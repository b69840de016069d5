"""Fused GATv2 attention: SDDMM logits -> segment softmax -> weighted
aggregate without [E, H*F] HBM intermediates (VERDICT r03 item 3).

The reference leans on PyG's compiled ``GATv2Conv``
(``hydragnn/models/GATStack.py:16,176``); the r03 implementation here was
all-XLA gather/scatter (models/invariant.py) whose [E, heads*F] tensors
and row-gathers dominate.  This module runs the whole edge pipeline in
two Pallas passes over each receiver tile's edge blocks:

  kernel A: gather x_l rows through the sender window, add the tile-side
    x_r rows, leaky-relu, contract with the attention vectors (one MXU
    matmul against a head-block-diagonal matrix) -> per-edge logits;
    segmented ONLINE max + sum-of-exp per receiver (the flash-attention
    merge) -> per-node (m_e, d_e);
  [node-level XLA: merge the self-loop logit (PyG add_self_loops)];
  kernel B: recompute logits, alpha = exp(logit - m_tot)/d_tot (x the
    dropout mask stream when training), weighted segment-sum of the
    gathered x_l rows -> the edge part of the output.

AD: jax.custom_jvp whose tangents are the jvp of the numerically
identical XLA composition — exact to every order (force-training safe);
backward therefore runs at XLA speed while the forward runs fused.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 3.0e38
_HP = 128  # head lane padding


def head_block_matrix(att: jnp.ndarray) -> jnp.ndarray:
    """att [H, F] -> [H*F, _HP] with column h carrying att[h] on its own
    feature block (the SDDMM contraction as one matmul)."""
    H, F = att.shape
    cols = []
    for h in range(H):
        col = jnp.zeros((H * F,), att.dtype)
        col = col.at[h * F : (h + 1) * F].set(att[h])
        cols.append(col)
    z = jnp.zeros((H * F, _HP - H), att.dtype)
    return jnp.concatenate([jnp.stack(cols, axis=1), z], axis=1)


def _lrelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _logits_blk(x_blk, xr_blk, attm, slope):
    z = _lrelu(x_blk + xr_blk, slope)
    return jax.lax.dot_general(
        z.astype(jnp.bfloat16), attm.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TE, _HP]


def gat_edge_attention(
    graph,
    xl: jnp.ndarray,  # [N, H*F]
    xr: jnp.ndarray,  # [N, H*F]
    att: jnp.ndarray,  # [H, F]
    slope: float,
    self_logit: jnp.ndarray,  # [N, _HP] (pad columns = -inf-ish)
    mask: Optional[jnp.ndarray] = None,  # [E, _HP] dropout/keep over alpha
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(out_edges, m_tot, d_tot); see module docstring."""
    H, F = att.shape
    attm = head_block_matrix(att)

    @jax.custom_jvp
    def f(xl_, xr_, attm_, selfl_, *maybe_mask):
        mk = maybe_mask[0] if maybe_mask else None
        return _gat_fused_core(
            graph, xl_, xr_, attm_, slope, selfl_, mk, H, F,
            interpret=interpret,
        )

    @f.defjvp
    def f_jvp(primals, tangents):
        y = f(*primals)
        _, ty = jax.jvp(
            lambda *a: _gat_xla_ref(graph, *a, slope=slope, H=H, F=F),
            primals, tangents,
        )
        return y, ty

    args = (xl, xr, attm, self_logit) + ((mask,) if mask is not None else ())
    return f(*args)


def _gat_xla_ref(graph, xl, xr, attm, self_logit, *maybe_mask, slope, H, F):
    """The XLA twin (tangent carrier + CPU fallback)."""
    from hydragnn_tpu.ops import segment_max, segment_sum
    from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes

    mask = maybe_mask[0] if maybe_mask else None
    N = graph.n_node
    xl_e = gather_nodes(graph, xl, "senders")
    xr_e = gather_nodes(graph, xr, "receivers")
    logits = jax.lax.dot_general(
        _lrelu((xl_e + xr_e).astype(jnp.float32), slope),
        attm.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    neg = -_BIG
    lm = jnp.where(graph.edge_mask[:, None], logits, neg)
    m_e = segment_max(
        lm, graph.receivers, N, mask=graph.edge_mask, empty_value=neg,
        indices_are_sorted=graph.edges_sorted,
    )
    m_tot = jnp.maximum(m_e, self_logit)
    # exponent <= 0 for every VALID row (m is the segment max), so the
    # clamp is exact; without it, padding edges evaluate exp(+BIG) whose
    # cotangent is inf * 0 = NaN through the where
    exp_e = jnp.where(
        graph.edge_mask[:, None],
        jnp.exp(jnp.minimum(logits - m_tot[graph.receivers], 0.0)),
        0.0,
    )
    d_e = segment_sum(
        exp_e, graph.receivers, N, indices_are_sorted=graph.edges_sorted
    )
    d_tot = jnp.maximum(
        d_e + jnp.exp(jnp.minimum(self_logit - m_tot, 0.0)), 1e-16
    )
    alpha = exp_e / d_tot[graph.receivers]
    if mask is not None:
        alpha = alpha * mask
    parts = [
        alpha[:, h : h + 1] * xl_e[:, h * F : (h + 1) * F] for h in range(H)
    ]
    weighted = jnp.concatenate(parts, axis=-1)
    out_edges = aggregate(graph, weighted, "sum", "receivers")
    # dtype parity with the fused primal (custom_jvp requires it)
    return out_edges.astype(xl.dtype), m_tot, d_tot


def _gat_fused_core(graph, xl, xr, attm, slope, self_logit, mask, H, F,
                    interpret=False):
    """Kernel A (online softmax stats) + node merge + kernel B (weighted
    aggregate)."""
    m_e, d_e = _gat_stats_kernel(
        graph, xl, xr, attm, slope, interpret=interpret
    )
    m_tot = jnp.maximum(m_e, self_logit)
    # rescale the edge sum-of-exp from its own max to the merged max;
    # empty segments (m_e = -BIG) contribute exp(-inf) = 0
    scale = jnp.where(m_e > -_BIG / 2, jnp.exp(m_e - m_tot), 0.0)
    d_tot = jnp.maximum(d_e * scale + jnp.exp(self_logit - m_tot), 1e-16)
    out_edges = _gat_aggregate_kernel(
        graph, xl, xr, attm, slope, m_tot, d_tot, mask, H, F,
        interpret=interpret,
    )
    return out_edges, m_tot, d_tot


def _plan(graph):
    return (graph.agg_rcv_off, graph.agg_rcv_nb, graph.agg_rcv_sid,
            graph.agg_rcv_lot, graph.agg_rcv_win)


def _gat_stats_kernel(graph, xl, xr, attm, slope, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    off, nb, sid, lot, win = _plan(graph)
    TN, TE, MB = graph.agg_meta[0], graph.agg_meta[1], graph.agg_meta[2]
    W = int(graph.agg_meta[4])
    n_node = graph.n_node
    T = n_node // TN
    HF = xl.shape[1]

    def kernel(off_ref, nb_ref, win_ref, sid_ref, lot_ref,
               xr_ref, attm_ref, xl_hbm, o_ref, xl_scr, sem):
        t = pl.program_id(0)
        nblk = nb_ref[t]
        o_ref[:, :_HP] = jnp.full((TN, _HP), -_BIG, o_ref.dtype)
        o_ref[:, _HP:] = jnp.zeros((TN, _HP), o_ref.dtype)

        def win_dma():
            start = pl.multiple_of(win_ref[t], 8)
            return pltpu.make_async_copy(
                xl_hbm.at[pl.ds(start, W), :], xl_scr, sem
            )

        @pl.when(nblk > 0)
        def _run():
            win_dma().start()
            win_dma().wait()

            def body(b, carry):
                m_acc, d_acc = carry
                sid_b = sid_ref[0, pl.ds(b, 1), :]
                lot_b = lot_ref[0, pl.ds(b, 1), :]
                rows_tn = jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0)
                oh_tile = (rows_tn == sid_b).astype(jnp.bfloat16)
                rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, TE), 0)
                oh_win = (rows_w == lot_b).astype(jnp.bfloat16)

                def sel(oh, vals):
                    return jax.lax.dot_general(
                        oh, vals.astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def red(oh, vals):
                    return jax.lax.dot_general(
                        oh, vals.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                x_blk = sel(oh_win, xl_scr[:])
                xr_blk = sel(oh_tile, xr_ref[:])
                logits = _logits_blk(x_blk, xr_blk, attm_ref[:], slope)

                # per-node block max via the segmented scan + end select
                sid_col = (
                    jax.lax.dot_general(
                        oh_tile,
                        (jax.lax.broadcasted_iota(
                            jnp.int32, (TN, 1), 0
                        ) + 1).astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) - 1.0
                )
                valid = sid_col >= 0.0
                x = jnp.where(valid, logits, -_BIG)
                s = 1
                while s < TE:
                    sid_shift = jnp.concatenate(
                        [jnp.full((s, 1), -2.0, jnp.float32), sid_col[:-s]],
                        0,
                    )
                    same = (sid_shift == sid_col) & valid
                    sh = jnp.concatenate(
                        [jnp.full((s, _HP), -_BIG, jnp.float32), x[:-s]], 0
                    )
                    x = jnp.maximum(x, jnp.where(same, sh, -_BIG))
                    s *= 2
                sid_next = jnp.concatenate(
                    [sid_col[1:], jnp.full((1, 1), -3.0, jnp.float32)], 0
                )
                end_col = (sid_col != sid_next) & valid
                bmax = red(
                    oh_tile, jnp.where(end_col, jnp.maximum(x, -1e30), 0.0)
                )
                has = red(oh_tile, end_col.astype(jnp.float32)) > 0.5
                bmax = jnp.where(has, bmax, -_BIG)
                # broadcast each segment's block max back to its rows
                y = jnp.where(end_col, x, -_BIG)
                s = 1
                while s < TE:
                    sid_shift = jnp.concatenate(
                        [sid_col[s:], jnp.full((s, 1), -4.0, jnp.float32)],
                        0,
                    )
                    same = (sid_shift == sid_col) & valid
                    sh = jnp.concatenate(
                        [y[s:], jnp.full((s, _HP), -_BIG, jnp.float32)], 0
                    )
                    y = jnp.maximum(y, jnp.where(same, sh, -_BIG))
                    s *= 2
                e = jnp.where(valid, jnp.exp(logits - y), 0.0)
                bsum = red(oh_tile, e)  # sum exp at block max

                m_new = jnp.maximum(m_acc, bmax)
                old_ok = m_acc > -_BIG / 2
                blk_ok = bmax > -_BIG / 2
                d_new = (
                    jnp.where(
                        old_ok, d_acc * jnp.exp(m_acc - m_new), 0.0
                    )
                    + jnp.where(blk_ok, bsum * jnp.exp(bmax - m_new), 0.0)
                )
                return (m_new, d_new)

            m0 = jnp.full((TN, _HP), -_BIG, jnp.float32)
            d0 = jnp.zeros((TN, _HP), jnp.float32)
            m_f, d_f = jax.lax.fori_loop(0, nblk, body, (m0, d0))
            o_ref[:, :_HP] = m_f.astype(o_ref.dtype)
            o_ref[:, _HP:] = d_f.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
                pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
                pl.BlockSpec((HF, _HP), lambda t, *_: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TN, 2 * _HP), lambda t, *_: (t, 0)),
            scratch_shapes=[
                pltpu.VMEM((W, HF), xl.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, 2 * _HP), jnp.float32),
        interpret=interpret,
    )(off, nb, win, sid, lot, xr, attm, xl)
    return out[:, :_HP], out[:, _HP:]


def _gat_aggregate_kernel(graph, xl, xr, attm, slope, m_tot, d_tot, mask,
                          H, F, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    off, nb, sid, lot, win = _plan(graph)
    TN, TE, MB = graph.agg_meta[0], graph.agg_meta[1], graph.agg_meta[2]
    W = int(graph.agg_meta[4])
    n_node = graph.n_node
    T = n_node // TN
    HF = xl.shape[1]
    E_req = graph.agg_meta[3]
    use_mask = mask is not None
    if use_mask:
        if mask.shape[0] < E_req + TE:
            mask = jnp.concatenate(
                [
                    mask,
                    jnp.zeros(
                        (E_req + TE - mask.shape[0], mask.shape[1]),
                        mask.dtype,
                    ),
                ]
            )

    def kernel(off_ref, nb_ref, win_ref, sid_ref, lot_ref,
               xr_ref, attm_ref, md_ref, xl_hbm, *rest):
        if use_mask:
            mask_hbm, o_ref, xl_scr, mask_scr, sem, sem_m = rest
        else:
            mask_hbm = mask_scr = sem_m = None
            o_ref, xl_scr, sem = rest
        t = pl.program_id(0)
        nblk = nb_ref[t]
        o_ref[:, :] = jnp.zeros((TN, HF), o_ref.dtype)

        def win_dma():
            start = pl.multiple_of(win_ref[t], 8)
            return pltpu.make_async_copy(
                xl_hbm.at[pl.ds(start, W), :], xl_scr, sem
            )

        def mask_dma(b, slot):
            st = pl.multiple_of(off_ref[t, b], 8)
            return pltpu.make_async_copy(
                mask_hbm.at[pl.ds(st, TE), :], mask_scr.at[slot], sem_m
            )

        @pl.when(nblk > 0)
        def _run():
            win_dma().start()
            if use_mask:
                mask_dma(0, 0).start()
            win_dma().wait()

            def body(b, acc):
                if use_mask:
                    @pl.when(b + 1 < nblk)
                    def _pf():
                        mask_dma(b + 1, (b + 1) % 2).start()
                    mask_dma(b, b % 2).wait()
                sid_b = sid_ref[0, pl.ds(b, 1), :]
                lot_b = lot_ref[0, pl.ds(b, 1), :]
                rows_tn = jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0)
                oh_tile = (rows_tn == sid_b).astype(jnp.bfloat16)
                rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, TE), 0)
                oh_win = (rows_w == lot_b).astype(jnp.bfloat16)

                def sel(oh, vals):
                    return jax.lax.dot_general(
                        oh, vals.astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def red(oh, vals):
                    return jax.lax.dot_general(
                        oh, vals.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                x_blk = sel(oh_win, xl_scr[:])
                xr_blk = sel(oh_tile, xr_ref[:])
                logits = _logits_blk(x_blk, xr_blk, attm_ref[:], slope)
                md = sel(oh_tile, md_ref[:])  # [TE, 2*_HP]
                m_row = md[:, :_HP]
                d_row = md[:, _HP:]
                sid_col = (
                    jax.lax.dot_general(
                        oh_tile,
                        (jax.lax.broadcasted_iota(
                            jnp.int32, (TN, 1), 0
                        ) + 1).astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) - 1.0
                )
                valid = sid_col >= 0.0
                alpha = jnp.where(
                    valid,
                    jnp.exp(logits - m_row)
                    / jnp.maximum(d_row, 1e-16),
                    0.0,
                )
                if use_mask:
                    alpha = alpha * mask_scr[b % 2].astype(jnp.float32)
                parts = []
                for h in range(H):
                    parts.append(
                        alpha[:, h : h + 1]
                        * x_blk[:, h * F : (h + 1) * F]
                    )
                weighted = jnp.concatenate(parts, axis=-1)
                return acc + red(oh_tile, weighted)

            acc = jax.lax.fori_loop(
                0, nblk, body, jnp.zeros((TN, HF), jnp.float32)
            )
            o_ref[:, :] = acc.astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
        pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
        pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
        pl.BlockSpec((HF, _HP), lambda t, *_: (0, 0)),
        pl.BlockSpec((TN, 2 * _HP), lambda t, *_: (t, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [pltpu.VMEM((W, HF), xl.dtype)]
    operands = [xr, attm,
                jnp.concatenate([m_tot, d_tot], axis=-1), xl]
    if use_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(mask)
        scratch.append(pltpu.VMEM((2, TE, mask.shape[1]), mask.dtype))
        scratch.append(pltpu.SemaphoreType.DMA)
        scratch.append(pltpu.SemaphoreType.DMA)
    else:
        scratch.append(pltpu.SemaphoreType.DMA)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, HF), xl.dtype),
        interpret=interpret,
    )(off, nb, win, sid, lot, *operands)
    return out
