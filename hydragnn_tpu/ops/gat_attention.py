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

AD: dual, selected like ops/mace_tp.py by ``StackConfig.force_grad``:

  * ``impl="vjp"`` (plain training, the default): jax.custom_vjp whose
    backward is ONE more fused pass (``_gat_backward_kernel``).  The
    softmax-backward segment sum S_i = sum_e alpha_e g_e + alpha_s g_s
    collapses to the node-level headwise dot <ct_i, out_i> (out is
    linear in alpha with per-edge logit-gradients g_e = <ct_i, x_j>),
    so the kernel only needs per-edge dl = alpha*g - p*S:
      - d xr   : receiver-tile reduce of ds = (dl @ attm^T) * lrelu'(s)
      - d xl   : window-row reduce of (alpha*ct + ds), combined across
                 overlapping tile windows on the XLA side (the same
                 trick as fused_gather's "wsum" mode)
      - d attm : z^T @ dl accumulated across the whole grid
    Forward-mode through this impl fails LOUDLY (custom_vjp), exactly
    like the MACE kernel's vjp variant.
  * ``impl="jvp"`` (force training / grad-of-grad): jax.custom_jvp
    whose tangents are the jvp of the numerically identical XLA
    composition — exact to every order; backward then runs at XLA
    speed while the forward runs fused.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 3.0e38
_HP = 128  # head lane padding
_WPAD = 128  # zero guard rows around window-partial outputs (combine)


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
    return _dot_split(z, attm)  # [TE, _HP]


def _dot_split(z, attm):
    """z @ attm with a hi/lo bf16 split of z (~2^-18 relative): the attm
    matmul is a minor cost next to the window gathers, and near-fp32
    logits keep softmax weights consistent between the kernels and fp32
    references."""
    hi = z.astype(jnp.bfloat16)
    lo = (z - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    am = attm.astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        hi, am, dimension_numbers=dn, preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        lo, am, dimension_numbers=dn, preferred_element_type=jnp.float32
    )


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
    """ONE kernel pass: online segmented softmax stats AND the weighted
    aggregate, flash-attention style — the running [TN, HF] output
    accumulator rescales by exp(m_old - m_new) per head whenever a block
    raises a segment max, so the r04 two-pass form's second full window
    gather + logit recompute (~415 MFLOP/block at H*F=1536) disappears.
    The self-loop logit merges at the very end inside the kernel (it only
    shifts m/d and rescales the accumulated edge part)."""
    return _gat_fwd_merged_kernel(
        graph, xl, xr, attm, slope, self_logit, mask, H, F,
        interpret=interpret,
    )


def _plan(graph):
    return (graph.agg_rcv_off, graph.agg_rcv_nb, graph.agg_rcv_sid,
            graph.agg_rcv_lot, graph.agg_rcv_win)


def _gat_fwd_merged_kernel(graph, xl, xr, attm, slope, self_logit, mask,
                           H, F, interpret=False):
    """Forward GATv2 attention in one pass over each receiver tile's edge
    blocks.  Per block: gather x_l rows (window one-hot), add tile x_r,
    leaky-relu, contract with the head-block attention matrix -> logits;
    segmented block max (forward scan + end-select broadcast), block
    sum-of-exp AND block weighted sum at the block max; merge into the
    running (m, d, acc) with flash-style exp rescales (acc lives in a
    VMEM scratch, rescaled read-modify-write — a [TN, HF] fori carry
    would blow the scoped-vmem budget).  Ends with the self-loop merge
    and the division, so it returns the final
    (out_edges [N, HF], m_tot [N, _HP], d_tot [N, _HP])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    off, nb, sid, lot, win = _plan(graph)
    TN, TE, MB = graph.agg_meta[0], graph.agg_meta[1], graph.agg_meta[2]
    W = int(graph.agg_meta[4])
    max_scan = TE
    if len(graph.agg_meta) > 5 and graph.agg_meta[5] is not None:
        max_scan = min(TE, int(graph.agg_meta[5]))
    n_node = graph.n_node
    T = n_node // TN
    HF = xl.shape[1]
    E_req = graph.agg_meta[3]
    use_mask = mask is not None
    if use_mask and mask.shape[0] < E_req + TE:
        mask = jnp.concatenate(
            [
                mask,
                jnp.zeros(
                    (E_req + TE - mask.shape[0], mask.shape[1]), mask.dtype
                ),
            ]
        )

    def kernel(off_ref, nb_ref, win_ref, sid_ref, lot_ref,
               xr_ref, attm_ref, self_ref, xl_hbm, *rest):
        if use_mask:
            mask_hbm = rest[0]
            o_ref, md_ref = rest[1:3]
            xl_scr, acc_scr, mask_scr, sem, sem_m = rest[3:8]
        else:
            mask_hbm = mask_scr = sem_m = None
            o_ref, md_ref = rest[0:2]
            xl_scr, acc_scr, sem = rest[2:5]
        t = pl.program_id(0)
        nblk = nb_ref[t]
        acc_scr[:, :] = jnp.zeros((TN, HF), jnp.float32)
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

        selfl = self_ref[:, :].astype(jnp.float32)

        def finalize(m_f, d_f):
            m_tot = jnp.maximum(m_f, selfl)
            scale = jnp.where(m_f > -_BIG / 2, jnp.exp(m_f - m_tot), 0.0)
            d_tot = jnp.maximum(
                d_f * scale + jnp.exp(selfl - m_tot), 1e-16
            )
            w = scale / d_tot  # [TN, _HP] per-head rescale of the acc
            for h in range(H):
                o_ref[:, h * F : (h + 1) * F] = (
                    acc_scr[:, h * F : (h + 1) * F] * w[:, h : h + 1]
                ).astype(o_ref.dtype)
            md_ref[:, :_HP] = m_tot
            md_ref[:, _HP:] = d_tot

        @pl.when(nblk == 0)
        def _empty():
            finalize(
                jnp.full((TN, _HP), -_BIG, jnp.float32),
                jnp.zeros((TN, _HP), jnp.float32),
            )

        @pl.when(nblk > 0)
        def _run():
            win_dma().start()
            if use_mask:
                mask_dma(0, 0).start()
            win_dma().wait()

            def body(b, carry):
                m_acc, d_acc = carry
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
                # forward segmented max scan (extrema at segment ends)
                x = jnp.where(valid, logits, -_BIG)
                s = 1
                while s < max_scan:
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
                while s < max_scan:
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
                bsum = red(oh_tile, e)  # sum of exp at the block max
                # weighted sum at the block max (dropout mask applies to
                # the aggregate only, exactly like the two-pass form)
                ew = e
                if use_mask:
                    ew = ew * mask_scr[b % 2][:].astype(jnp.float32)
                parts = []
                for h in range(H):
                    parts.append(
                        ew[:, h : h + 1] * x_blk[:, h * F : (h + 1) * F]
                    )
                bout = red(oh_tile, jnp.concatenate(parts, axis=-1))

                m_new = jnp.maximum(m_acc, bmax)
                old_ok = m_acc > -_BIG / 2
                blk_ok = bmax > -_BIG / 2
                r_old = jnp.where(old_ok, jnp.exp(m_acc - m_new), 0.0)
                r_blk = jnp.where(blk_ok, jnp.exp(bmax - m_new), 0.0)
                d_new = d_acc * r_old + bsum * r_blk
                # rescale the accumulated output per head and add this
                # block's contribution (VMEM read-modify-write)
                for h in range(H):
                    acc_scr[:, h * F : (h + 1) * F] = (
                        acc_scr[:, h * F : (h + 1) * F]
                        * r_old[:, h : h + 1]
                        + bout[:, h * F : (h + 1) * F]
                        * r_blk[:, h : h + 1]
                    )
                return (m_new, d_new)

            m0 = jnp.full((TN, _HP), -_BIG, jnp.float32)
            d0 = jnp.zeros((TN, _HP), jnp.float32)
            m_f, d_f = jax.lax.fori_loop(0, nblk, body, (m0, d0))
            finalize(m_f, d_f)

    in_specs = [
        pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
        pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
        pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
        pl.BlockSpec((HF, _HP), lambda t, *_: (0, 0)),
        pl.BlockSpec((TN, _HP), lambda t, *_: (t, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [xr, attm, self_logit, xl]
    scratch = [
        pltpu.VMEM((W, HF), xl.dtype),
        pltpu.VMEM((TN, HF), jnp.float32),
    ]
    if use_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(mask)
        scratch.append(pltpu.VMEM((2, TE, mask.shape[1]), mask.dtype))
        scratch.append(pltpu.SemaphoreType.DMA)
        scratch.append(pltpu.SemaphoreType.DMA)
    else:
        scratch.append(pltpu.SemaphoreType.DMA)
    out, md = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
                pl.BlockSpec((TN, 2 * _HP), lambda t, *_: (t, 0)),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_node, HF), xl.dtype),
            jax.ShapeDtypeStruct((n_node, 2 * _HP), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 2**20
        ),
        interpret=interpret,
    )(off, nb, win, sid, lot, *operands)
    return out, md[:, :_HP], md[:, _HP:]


# ---------------------------------------------------------------------------
# Fused backward (custom_vjp impl) + the full-output op
# ---------------------------------------------------------------------------


def _expand_heads(a, H, F):
    """[.., H] per-head scalars -> [.., H*F] by block broadcast."""
    return jnp.concatenate(
        [a[..., h : h + 1] * jnp.ones((1, F), a.dtype) for h in range(H)],
        axis=-1,
    )


def _gat_backward_kernel(graph, xl, xr, attm, slope, md, s_tot, mask, ct,
                         H, F, interpret=False):
    """One fused pass per receiver tile: recompute logits/p from the saved
    (m, d) stats, form dl = alpha*g - p*S, and reduce its three
    consumers.  Returns (dxr [N, HF], win_part [T*W, HF], dattm [HF, _HP]);
    win_part carries the d/d xl partial sums on window rows (combine with
    fused_gather._combine_window)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    off, nb, sid, lot, win = _plan(graph)
    TN, TE, MB = graph.agg_meta[0], graph.agg_meta[1], graph.agg_meta[2]
    W = int(graph.agg_meta[4])
    n_node = graph.n_node
    T = n_node // TN
    HF = xl.shape[1]
    E_req = graph.agg_meta[3]
    attm_t = attm.T  # [_HP, HF]
    use_mask = mask is not None
    if use_mask and mask.shape[0] < E_req + TE:
        mask = jnp.concatenate(
            [
                mask,
                jnp.zeros((E_req + TE - mask.shape[0], mask.shape[1]),
                          mask.dtype),
            ]
        )

    def kernel(off_ref, nb_ref, win_ref, sid_ref, lot_ref,
               xr_ref, ct_ref, md_ref, s_ref, attm_ref, attmt_ref,
               xl_hbm, *rest):
        if use_mask:
            (mask_hbm, dxr_ref, ow_ref, datt_ref,
             xl_scr, dxr_scr, ow_scr, mask_scr, sem, sem_m) = rest
        else:
            mask_hbm = mask_scr = sem_m = None
            (dxr_ref, ow_ref, datt_ref,
             xl_scr, dxr_scr, ow_scr, sem) = rest
        t = pl.program_id(0)
        nblk = nb_ref[t]
        dxr_ref[:, :] = jnp.zeros((TN, HF), dxr_ref.dtype)
        # zero-guard-padded window partials: the pallas combine reads
        # aligned [TN, TF] slices with no masking (see fused_gather
        # combine_window_pallas)
        ow_ref[:, :] = jnp.zeros((W + 2 * _WPAD, HF), ow_ref.dtype)

        @pl.when(t == 0)
        def _init_datt():
            datt_ref[:, :] = jnp.zeros((HF, _HP), datt_ref.dtype)

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
            # fp32 VMEM accumulators (outputs are bf16 to halve the HBM
            # write + the _combine_window re-reads)
            dxr_scr[:, :] = jnp.zeros((TN, HF), jnp.float32)
            ow_scr[:, :] = jnp.zeros((W, HF), jnp.float32)
            headmask = (
                jax.lax.broadcasted_iota(jnp.int32, (1, _HP), 1) < H
            ).astype(jnp.float32)

            def body(b, _):
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

                x_blk = sel(oh_win, xl_scr[:])  # [TE, HF]
                xr_blk = sel(oh_tile, xr_ref[:])
                ct_blk = sel(oh_tile, ct_ref[:])
                s = x_blk + xr_blk
                z = _lrelu(s, slope)
                logits = _dot_split(z, attm_ref[:])  # [TE, _HP]
                md_blk = sel(oh_tile, md_ref[:])
                m_row = md_blk[:, :_HP]
                d_row = md_blk[:, _HP:]
                s_row = sel(oh_tile, s_ref[:])  # [TE, _HP]
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
                p = jnp.where(
                    valid,
                    jnp.exp(logits - m_row) / jnp.maximum(d_row, 1e-16),
                    0.0,
                )
                if use_mask:
                    alpha = p * mask_scr[b % 2].astype(jnp.float32)
                else:
                    alpha = p
                # per-edge logit gradient g_h = <ct_i, x_j> headwise
                m_ct = ct_blk * x_blk
                g_cols = [
                    jnp.sum(m_ct[:, h * F : (h + 1) * F], axis=1,
                            keepdims=True)
                    for h in range(H)
                ]
                g_pad = jnp.concatenate(
                    g_cols + [jnp.zeros((TE, _HP - H), jnp.float32)], axis=1
                )
                dl = (alpha * g_pad - p * s_row) * headmask
                ds = jax.lax.dot_general(
                    dl.astype(jnp.bfloat16),
                    attmt_ref[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [TE, HF]
                ds = ds * jnp.where(s >= 0, 1.0, slope)
                w_val = jnp.concatenate(
                    [
                        alpha[:, h : h + 1] * ct_blk[:, h * F : (h + 1) * F]
                        for h in range(H)
                    ],
                    axis=-1,
                ) + ds
                # accumulate in VMEM scratch (fori_loop carries of this
                # size are copied every iteration — first version's
                # profile), write bf16 once per tile at the end
                dxr_scr[:, :] = dxr_scr[:, :] + red(oh_tile, ds)
                ow_scr[:, :] = ow_scr[:, :] + jax.lax.dot_general(
                    oh_win, w_val.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                datt_ref[:, :] = datt_ref[:, :] + jax.lax.dot_general(
                    z.astype(jnp.bfloat16), dl.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0

            jax.lax.fori_loop(0, nblk, body, 0)
            dxr_ref[:, :] = dxr_scr[:, :].astype(dxr_ref.dtype)
            ow_ref[_WPAD : _WPAD + W, :] = ow_scr[:, :].astype(ow_ref.dtype)

    in_specs = [
        pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
        pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
        pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
        pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
        pl.BlockSpec((TN, 2 * _HP), lambda t, *_: (t, 0)),
        pl.BlockSpec((TN, _HP), lambda t, *_: (t, 0)),
        pl.BlockSpec((HF, _HP), lambda t, *_: (0, 0)),
        pl.BlockSpec((_HP, HF), lambda t, *_: (0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [xr, ct, jnp.concatenate([md[0], md[1]], axis=-1), s_tot,
                attm, attm_t, xl]
    scratch = [
        pltpu.VMEM((W, HF), xl.dtype),
        pltpu.VMEM((TN, HF), jnp.float32),
        pltpu.VMEM((W, HF), jnp.float32),
    ]
    if use_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(mask)
        scratch.append(pltpu.VMEM((2, TE, mask.shape[1]), mask.dtype))
        scratch.append(pltpu.SemaphoreType.DMA)
        scratch.append(pltpu.SemaphoreType.DMA)
    else:
        scratch.append(pltpu.SemaphoreType.DMA)

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(T,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((TN, HF), lambda t, *_: (t, 0)),
                pl.BlockSpec((W + 2 * _WPAD, HF), lambda t, *_: (t, 0)),
                pl.BlockSpec((HF, _HP), lambda t, *_: (0, 0)),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_node, HF), jnp.bfloat16),
            jax.ShapeDtypeStruct((T * (W + 2 * _WPAD), HF), jnp.bfloat16),
            jax.ShapeDtypeStruct((HF, _HP), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(off, nb, win, sid, lot, *operands)
    return outs


def _self_merge(out_edges, xl, self_pad, m_tot, d_tot, smask, H, F):
    """Node-level self-loop term: out += alpha_s (.) xl (PyG
    add_self_loops), dropout applied AFTER normalization."""
    p_s = jnp.exp(self_pad[:, :H] - m_tot[:, :H]) / jnp.maximum(
        d_tot[:, :H], 1e-16
    )
    alpha_s = p_s * smask[:, :H] if smask is not None else p_s
    return (
        out_edges.astype(jnp.float32)
        + _expand_heads(alpha_s, H, F) * xl.astype(jnp.float32)
    )


def _gat_full_xla(graph, xl, xr, attm, self_pad, emask, smask, slope, H, F):
    """XLA twin of the FULL op (edge attention + self loop)."""
    args = (xl, xr, attm, self_pad) + ((emask,) if emask is not None else ())
    out_e, m_tot, d_tot = _gat_xla_ref(graph, *args, slope=slope, H=H, F=F)
    return _self_merge(out_e, xl, self_pad, m_tot, d_tot, smask, H, F).astype(
        xl.dtype
    )


def gat_attention(
    graph,
    xl: jnp.ndarray,  # [N, H*F]
    xr: jnp.ndarray,  # [N, H*F]
    att: jnp.ndarray,  # [H, F]
    slope: float,
    self_logits: jnp.ndarray,  # [N, H]
    edge_mask: Optional[jnp.ndarray] = None,  # [E, _HP] dropout over alpha
    self_mask: Optional[jnp.ndarray] = None,  # [N, H] dropout over alpha_s
    impl: str = "vjp",
    interpret: bool = False,
) -> jnp.ndarray:
    """Full fused GATv2 attention output [N, H*F] including the self-loop
    term; AD per the module docstring (reference GATStack.py:16,176)."""
    H, F = att.shape
    N = xl.shape[0]
    attm = head_block_matrix(att)
    self_pad = jnp.concatenate(
        [
            self_logits.astype(jnp.float32),
            jnp.full((N, _HP - H), -_BIG, jnp.float32),
        ],
        axis=-1,
    )
    has_e = edge_mask is not None
    has_s = self_mask is not None

    def unpack(masks):
        em = masks[0] if has_e else None
        sm = masks[-1] if has_s else None
        return em, sm

    if impl == "jvp":

        @jax.custom_jvp
        def f(xl_, xr_, attm_, selfp_, *masks):
            em, sm = unpack(masks)
            out_e, m, d = _gat_fused_core(
                graph, xl_, xr_, attm_, slope, selfp_, em, H, F,
                interpret=interpret,
            )
            return _self_merge(out_e, xl_, selfp_, m, d, sm, H, F).astype(
                xl_.dtype
            )

        @f.defjvp
        def f_jvp(primals, tangents):
            y = f(*primals)
            _, ty = jax.jvp(
                lambda xl_, xr_, attm_, selfp_, *mk: _gat_full_xla(
                    graph, xl_, xr_, attm_,
                    selfp_, *unpack(mk), slope=slope, H=H, F=F
                ),
                primals, tangents,
            )
            return y, ty

        masks = (() if not has_e else (edge_mask,)) + (
            () if not has_s else (self_mask,)
        )
        return f(xl, xr, attm, self_pad, *masks)

    assert impl == "vjp", impl

    @jax.custom_vjp
    def f(xl_, xr_, attm_, selfp_, *masks):
        return _fwd(xl_, xr_, attm_, selfp_, *masks)[0]

    def _fwd(xl_, xr_, attm_, selfp_, *masks):
        em, sm = unpack(masks)
        out_e, m, d = _gat_fused_core(
            graph, xl_, xr_, attm_, slope, selfp_, em, H, F,
            interpret=interpret,
        )
        out32 = _self_merge(out_e, xl_, selfp_, m, d, sm, H, F)
        res = (xl_, xr_, attm_, selfp_, masks, m, d, out32)
        return out32.astype(xl_.dtype), res

    def _bwd(res, ct):
        from hydragnn_tpu.ops.fused_gather import combine_window_pallas

        xl_, xr_, attm_, selfp_, masks, m, d, out32 = res
        em, sm = unpack(masks)
        ct32 = ct.astype(jnp.float32)
        xl32 = xl_.astype(jnp.float32)
        # S_i,h = sum_e alpha g + alpha_s g_s  ==  <ct_i, out_i> headwise
        s_h = jnp.sum(
            (ct32 * out32).reshape(N, H, F), axis=-1
        )  # [N, H]
        s_pad = jnp.concatenate(
            [s_h, jnp.zeros((N, _HP - H), jnp.float32)], axis=-1
        )
        # self-loop legs (node-level)
        p_s = jnp.exp(selfp_[:, :H] - m[:, :H]) / jnp.maximum(
            d[:, :H], 1e-16
        )
        alpha_s = p_s * sm[:, :H] if sm is not None else p_s
        g_s = jnp.sum((ct32 * xl32).reshape(N, H, F), axis=-1)  # [N, H]
        dsl = alpha_s * g_s - p_s * s_h  # [N, H]
        d_selfp = jnp.concatenate(
            [dsl, jnp.zeros((N, _HP - H), jnp.float32)], axis=-1
        )
        dxl_self = _expand_heads(alpha_s, H, F) * ct32
        # the fused edge pass (ct in bf16: the kernel's one-hot gathers
        # round to bf16 anyway, so the fp32 stream would be wasted HBM)
        dxr, win_part, dattm = _gat_backward_kernel(
            graph, xl_, xr_, attm_, slope, (m, d), s_pad, em,
            ct32.astype(jnp.bfloat16), H, F, interpret=interpret,
        )
        TN = graph.agg_meta[0]
        W = int(graph.agg_meta[4])
        dxl = (
            combine_window_pallas(
                win_part, graph.agg_rcv_win, N, TN, W, pad=_WPAD,
                interpret=interpret,
            )
            + dxl_self
        )
        grads = (
            dxl.astype(xl_.dtype),
            dxr.astype(xr_.dtype),
            dattm.astype(attm_.dtype),
            d_selfp.astype(selfp_.dtype),
        )
        # dropout masks are rng streams, never differentiated
        mask_grads = tuple(jnp.zeros_like(mk) for mk in masks)
        return grads + mask_grads

    f.defvjp(_fwd, _bwd)
    masks = (() if not has_e else (edge_mask,)) + (
        () if not has_s else (self_mask,)
    )
    return f(xl, xr, attm, self_pad, *masks)
