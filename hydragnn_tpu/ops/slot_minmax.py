"""Neighbor-slot segment extrema (TPU): per-receiver min/max as Dmax
one-hot MXU gathers + trivial VPU reductions in NODE space.

The r04 PNA hot spot was the segmented Hillis-Steele scan over the EDGE
stream inside window_gather_reduce_raw (profiling/BYTES_pna.json: 77% of
the 44.8 ms step in the two scan kernels — pure VPU shift/compare/select
work over [TE, TF] blocks).  When the message has no edge term it
decomposes:

    min/max_{e: rcv e = n} (h_i[n] + h_j[snd e]) = h_i[n] +/- M(h_j)[n]

so the segment extremum reduces to M: a per-node extremum over in-
neighbors of a NODE table — an op over N rows, not E.  The batcher's
neighbor-slot plan (data/batching.py agg_nbr_lot, [T, Dmax, TN] window-
local sender ids with -1 padding) turns M into, per receiver tile,

    per CHUNK of 8 slots: G = onehot(nbr-chunk) @ window  (ONE MXU
    matmul over [8*TN, W] — small per-slot matmuls paid a heavy MXU
    launch/utilization penalty); then per slot: mn/mx/tie-count
    updates on [TN, TF] slices (VPU)

with the window DMA'd once per tile.  The plan is consumed pre-flattened
d-major ([T, Dmax/8, 8*TN]) so the chunk one-hot builds directly on the
lane axis with no in-kernel reshape.  The backward scatters cotangents
to extremal slots through the TRANSPOSED one-hot matmuls onto the window
rows, combined across overlapping tile windows in XLA (the established
_combine_window path).  Invalid slots gather zero rows AND scatter
through zero columns, so they are self-masking everywhere except the
primal extremum (handled with the +/-BIG sentinel and a ones-vector
validity matmul).

Replaces the reference's torch_scatter scatter_min/scatter_max on the
PNA aggregator path (``hydragnn/models/PNAStack.py:19-70``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 3.0e38
_VMEM_BUDGET = 10 * 2**20


def _has_slots(graph) -> bool:
    return (
        graph.agg_meta is not None
        and len(graph.agg_meta) > 7
        and graph.agg_meta[7] is not None
        and graph.agg_nbr_lot is not None
        and graph.agg_meta[4] is not None
    )


def _pick_tf(F, W, n_win, itemsize, extra_f32_cols=8):
    for t in (512, 256, 128):
        if F % t == 0 and (
            n_win * W * itemsize + 128 * extra_f32_cols * 4
        ) * t <= _VMEM_BUDGET:
            return t
    return None


def _sel(oh, vals, barrier):
    """One-hot gather [W, TN]^T x [W, TF] -> [TN, TF] fp32; exact (bf16
    direct, fp32 3-way split; ``barrier`` blocks XLA's bf16 dot-merger in
    interpret mode — Mosaic performs no such rewrite)."""
    def dot(a, v):
        return jax.lax.dot_general(
            a, v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if vals.dtype == jnp.bfloat16:
        return dot(oh, vals)
    v = vals.astype(jnp.float32)
    hi = v.astype(jnp.bfloat16)
    rem = v - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    d1, d2, d3 = dot(oh, hi), dot(oh, mid), dot(oh, lo)
    if barrier:
        d1, d2, d3 = jax.lax.optimization_barrier((d1, d2, d3))
    return d1 + d2 + d3


def slot_minmax_raw(graph, v: jnp.ndarray, interpret: bool = False):
    """(mn, mx, cnt_mn, cnt_mx) of v over in-neighbors, each [N, F] fp32.
    Empty segments carry the +/-BIG sentinel in mn/mx (caller replaces).
    Tie counts merge ONLINE with the extrema accumulators — exact-equal
    slots accumulate, strictly-better slots reset to 1."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TN = graph.agg_meta[0]
    W = int(graph.agg_meta[4])
    Dmax = int(graph.agg_meta[7])
    DC = 8  # slots per MXU chunk (Dmax is a multiple of 8 by the plan)
    NC = Dmax // DC
    nbr, nd, win = graph.agg_nbr_lot, graph.agg_nbr_nd, graph.agg_rcv_win
    nbr2 = nbr.reshape(nbr.shape[0], NC, DC * TN)  # d-major chunks
    n_node = v.shape[0]
    F = v.shape[1]
    T = n_node // TN
    TF = _pick_tf(F, W, 1, v.dtype.itemsize)
    assert TF is not None, f"F={F} must be a multiple of 128"

    def kernel(win_ref, nd_ref, nbr_ref, v_hbm, o_ref, win_scr, sem):
        f = pl.program_id(0)
        t = pl.program_id(1)
        start = pl.multiple_of(win_ref[t], 8)
        dma = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start, W), pl.ds(f * TF, TF)], win_scr, sem
        )
        dma.start()
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, DC * TN), 0)
        ones_w = jnp.ones((W, 1), jnp.bfloat16)
        dma.wait()

        def body(c, carry):
            mn, mx, cmn, cmx = carry
            row = nbr_ref[0, pl.ds(c, 1), :]  # [1, DC*TN]
            oh = (rows_w == row).astype(jnp.bfloat16)  # [W, DC*TN]
            G = _sel(oh, win_scr[:], interpret)  # [DC*TN, TF] fp32
            M = jax.lax.dot_general(  # [DC*TN, 1] slot validity
                oh, ones_w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for d in range(DC):
                g = G[d * TN : (d + 1) * TN, :]
                valid = M[d * TN : (d + 1) * TN, :] > 0.5
                gmn = jnp.where(valid, g, _BIG)
                gmx = jnp.where(valid, g, -_BIG)
                cmn = jnp.where(
                    gmn < mn, 1.0, cmn + (gmn == mn).astype(jnp.float32)
                )
                mn = jnp.minimum(mn, gmn)
                cmx = jnp.where(
                    gmx > mx, 1.0, cmx + (gmx == mx).astype(jnp.float32)
                )
                mx = jnp.maximum(mx, gmx)
            return mn, mx, cmn, cmx

        init = (
            jnp.full((TN, TF), _BIG, jnp.float32),
            jnp.full((TN, TF), -_BIG, jnp.float32),
            jnp.zeros((TN, TF), jnp.float32),
            jnp.zeros((TN, TF), jnp.float32),
        )
        nchunks = (nd_ref[t] + DC - 1) // DC
        mn, mx, cmn, cmx = jax.lax.fori_loop(0, nchunks, body, init)
        o_ref[:, 0 * TF : 1 * TF] = mn
        o_ref[:, 1 * TF : 2 * TF] = mx
        o_ref[:, 2 * TF : 3 * TF] = cmn
        o_ref[:, 3 * TF : 4 * TF] = cmx

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(F // TF, T),
            in_specs=[
                pl.BlockSpec((1, NC, DC * TN), lambda f, t, *_: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TN, 4 * TF), lambda f, t, *_: (t, f)),
            scratch_shapes=[
                pltpu.VMEM((W, TF), v.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, 4 * F), jnp.float32),
        interpret=interpret,
    )(win, nd, nbr2, v)
    packed = out.reshape(n_node, F // TF, 4, TF)
    return tuple(packed[:, :, r, :].reshape(n_node, F) for r in range(4))


def slot_tangent_raw(graph, v, tj, mn_j, mx_j, inv_mn, inv_mx,
                     interpret: bool = False):
    """(sum_d w_mn_d * tj_d, sum_d w_mx_d * tj_d), [N, F] each, with
    w = (g_d == extremum) * inv_ties — the h_j part of the tie-averaged
    tangent.  Invalid slots self-mask (tj_d gathers 0)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TN = graph.agg_meta[0]
    W = int(graph.agg_meta[4])
    Dmax = int(graph.agg_meta[7])
    DC = 8
    NC = Dmax // DC
    nbr, nd, win = graph.agg_nbr_lot, graph.agg_nbr_nd, graph.agg_rcv_win
    nbr2 = nbr.reshape(nbr.shape[0], NC, DC * TN)
    n_node, F = v.shape
    T = n_node // TN
    TF = _pick_tf(F, W, 2, max(v.dtype.itemsize, tj.dtype.itemsize))
    assert TF is not None, f"F={F} must be a multiple of 128"

    def kernel(win_ref, nd_ref, nbr_ref, mn_ref, mx_ref, ivn_ref, ivx_ref,
               v_hbm, tj_hbm, o_ref, v_scr, tj_scr, sems):
        f = pl.program_id(0)
        t = pl.program_id(1)
        start = pl.multiple_of(win_ref[t], 8)
        d1 = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start, W), pl.ds(f * TF, TF)], v_scr, sems.at[0]
        )
        d2 = pltpu.make_async_copy(
            tj_hbm.at[pl.ds(start, W), pl.ds(f * TF, TF)], tj_scr,
            sems.at[1],
        )
        d1.start()
        d2.start()
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, DC * TN), 0)
        mn = mn_ref[:, :].astype(jnp.float32)
        mx = mx_ref[:, :].astype(jnp.float32)
        wn = ivn_ref[:, :].astype(jnp.float32)
        wx = ivx_ref[:, :].astype(jnp.float32)
        d1.wait()
        d2.wait()

        def body(c, carry):
            an, ax = carry
            row = nbr_ref[0, pl.ds(c, 1), :]
            oh = (rows_w == row).astype(jnp.bfloat16)
            G = _sel(oh, v_scr[:], interpret)
            TJ = _sel(oh, tj_scr[:], interpret)
            for d in range(DC):
                g = G[d * TN : (d + 1) * TN, :]
                tjd = TJ[d * TN : (d + 1) * TN, :]
                an = an + jnp.where(g == mn, wn, 0.0) * tjd
                ax = ax + jnp.where(g == mx, wx, 0.0) * tjd
            return an, ax

        nchunks = (nd_ref[t] + DC - 1) // DC
        an, ax = jax.lax.fori_loop(
            0, nchunks, body,
            (jnp.zeros((TN, TF), jnp.float32),
             jnp.zeros((TN, TF), jnp.float32)),
        )
        o_ref[:, :TF] = an
        o_ref[:, TF:] = ax

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(F // TF, T),
            in_specs=[
                pl.BlockSpec((1, NC, DC * TN), lambda f, t, *_: (t, 0, 0)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TN, 2 * TF), lambda f, t, *_: (t, f)),
            scratch_shapes=[
                pltpu.VMEM((W, TF), v.dtype),
                pltpu.VMEM((W, TF), tj.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, 2 * F), jnp.float32),
        interpret=interpret,
    )(win, nd, nbr2, mn_j, mx_j, inv_mn, inv_mx, v, tj)
    packed = out.reshape(n_node, F // TF, 2, TF)
    return (
        packed[:, :, 0, :].reshape(n_node, F),
        packed[:, :, 1, :].reshape(n_node, F),
    )


def slot_transpose_raw(graph, v, mn_j, mx_j, tn, tx,
                       interpret: bool = False):
    """Transpose of the slot-weighted tangent sum: cotangent to the
    sender table, ct_v[j] = sum_{(n, d): nbr = j} (w_mn * tn + w_mx * tx)
    [n].  Per tile the per-slot weighted cotangent scatters onto the
    window rows through the transposed one-hot matmul; overlapping tile
    windows combine in XLA (_combine_window)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hydragnn_tpu.ops.fused_gather import combine_window_pallas

    TN = graph.agg_meta[0]
    W = int(graph.agg_meta[4])
    Dmax = int(graph.agg_meta[7])
    DC = 8
    NC = Dmax // DC
    nbr, nd, win = graph.agg_nbr_lot, graph.agg_nbr_nd, graph.agg_rcv_win
    nbr2 = nbr.reshape(nbr.shape[0], NC, DC * TN)
    n_node, F = v.shape
    T = n_node // TN
    TF = _pick_tf(F, W, 2, v.dtype.itemsize)
    assert TF is not None, f"F={F} must be a multiple of 128"
    out_dt = v.dtype  # window partials at input precision (combine fp32)
    PAD = 128  # zero guard rows so the combine's slices never clamp

    def kernel(win_ref, nd_ref, nbr_ref, mn_ref, mx_ref, tn_ref, tx_ref,
               v_hbm, o_ref, v_scr, sem):
        f = pl.program_id(0)
        t = pl.program_id(1)
        start = pl.multiple_of(win_ref[t], 8)
        dma = pltpu.make_async_copy(
            v_hbm.at[pl.ds(start, W), pl.ds(f * TF, TF)], v_scr, sem
        )
        dma.start()
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, DC * TN), 0)
        mn = mn_ref[:, :].astype(jnp.float32)
        mx = mx_ref[:, :].astype(jnp.float32)
        tn_ = tn_ref[:, :].astype(jnp.float32)
        tx_ = tx_ref[:, :].astype(jnp.float32)
        dma.wait()

        def scatter(oh, e):  # [W, DC*TN] x [DC*TN, TF] -> [W, TF]
            if out_dt == jnp.bfloat16:
                return jax.lax.dot_general(
                    oh, e.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            hi = e.astype(jnp.bfloat16)
            lo = (e - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dd = lambda a, b: jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d1, d2 = dd(oh, hi), dd(oh, lo)
            if interpret:  # block XLA's bf16 dot-merger (see _sel)
                d1, d2 = jax.lax.optimization_barrier((d1, d2))
            return d1 + d2

        def body(c, acc):
            row = nbr_ref[0, pl.ds(c, 1), :]
            oh = (rows_w == row).astype(jnp.bfloat16)
            G = _sel(oh, v_scr[:], interpret)  # [DC*TN, TF]
            parts = []
            for d in range(DC):
                g = G[d * TN : (d + 1) * TN, :]
                parts.append(
                    jnp.where(g == mn, tn_, 0.0)
                    + jnp.where(g == mx, tx_, 0.0)
                )
            e = jnp.concatenate(parts, axis=0)  # [DC*TN, TF]
            return acc + scatter(oh, e)

        nchunks = (nd_ref[t] + DC - 1) // DC
        acc = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((W, TF), jnp.float32)
        )
        o_ref[:PAD, :] = jnp.zeros((PAD, TF), o_ref.dtype)
        o_ref[PAD : PAD + W, :] = acc.astype(o_ref.dtype)
        o_ref[PAD + W :, :] = jnp.zeros((PAD, TF), o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(F // TF, T),
            in_specs=[
                pl.BlockSpec((1, NC, DC * TN), lambda f, t, *_: (t, 0, 0)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (W + 2 * PAD, TF), lambda f, t, *_: (t, f)
            ),
            scratch_shapes=[
                pltpu.VMEM((W, TF), v.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((T * (W + 2 * PAD), F), out_dt),
        interpret=interpret,
    )(win, nd, nbr2, mn_j, mx_j, tn, tx, v)
    return combine_window_pallas(
        out, win, n_node, TN, W, pad=PAD, interpret=interpret
    )


def fused_minmax_slots(graph, h_i: jnp.ndarray, h_j: jnp.ndarray,
                       interpret: bool = False):
    """(min h, max h) at receivers for h = h_i[rcv] + h_j[snd] via the
    neighbor-slot decomposition min h = h_i + M_min(h_j).  Same AD
    contract as ops/fused_gather.py fused_minmax (custom_jvp with
    linear_call tangents, tie-averaged, stop-gradient residuals)."""
    from jax.custom_derivatives import linear_call

    dt = h_i.dtype
    deg_ok = (graph.rcv_count > 0)[:, None]

    @jax.custom_jvp
    def _mm(hi_, hj_):
        mnr, mxr, cmn, cmx = slot_minmax_raw(graph, hj_, interpret=interpret)
        # dt-rounded h_j extrema (exact: inputs are dt values); sentinel
        # rows (empty segments) forced to 0 via deg_ok
        mnj = jnp.where(deg_ok, mnr, 0.0).astype(dt)
        mxj = jnp.where(deg_ok, mxr, 0.0).astype(dt)
        mn = jnp.where(
            deg_ok, hi_.astype(jnp.float32) + mnj.astype(jnp.float32), 0.0
        ).astype(dt)
        mx = jnp.where(
            deg_ok, hi_.astype(jnp.float32) + mxj.astype(jnp.float32), 0.0
        ).astype(dt)
        return mn, mx, mnj, mxj, cmn, cmx

    def _mm_jvp(primals, tangents):
        sg = jax.lax.stop_gradient
        present = tuple(
            not isinstance(tg, jax.custom_derivatives.SymbolicZero)
            for tg in tangents
        )
        mn, mx, mnj, mxj, cmn, cmx = _mm(*primals)
        hj_ = sg(primals[1])
        inv_mn = (1.0 / jnp.maximum(sg(cmn), 1.0)).astype(dt)
        inv_mx = (1.0 / jnp.maximum(sg(cmx), 1.0)).astype(dt)
        res = (hj_, sg(mnj), sg(mxj), inv_mn, inv_mx)

        def _expand(res_, tans):
            it = iter(tans)
            return tuple(
                next(it) if p else jnp.zeros_like(pr)
                for p, pr in zip(present, (res_[0], res_[0]))
            )

        def tfwd(res_, tans):
            hj_t, mnj_, mxj_, ivn, ivx = res_
            ti, tj = _expand(res_, tans)
            pmn, pmx = slot_tangent_raw(
                graph, hj_t, tj.astype(hj_t.dtype), mnj_, mxj_, ivn, ivx,
                interpret=interpret,
            )
            t_mn = jnp.where(
                deg_ok, ti.astype(jnp.float32) + pmn, 0.0
            ).astype(dt)
            t_mx = jnp.where(
                deg_ok, ti.astype(jnp.float32) + pmx, 0.0
            ).astype(dt)
            return (t_mn, t_mx)

        def ttrans(res_, cts):
            hj_t, mnj_, mxj_, ivn, ivx = res_
            cC, cD = cts
            ct_ti = jnp.where(
                deg_ok,
                cC.astype(jnp.float32) + cD.astype(jnp.float32),
                0.0,
            ).astype(dt)
            tn_ = (ivn.astype(jnp.float32) * cC.astype(jnp.float32)).astype(
                dt
            )
            tx_ = (ivx.astype(jnp.float32) * cD.astype(jnp.float32)).astype(
                dt
            )
            ct_tj = slot_transpose_raw(
                graph, hj_t, mnj_, mxj_, tn_, tx_, interpret=interpret
            ).astype(dt)
            return tuple(
                c for c, p in zip((ct_ti, ct_tj), present) if p
            )

        prim_out = (mn, mx, mnj, mxj, cmn, cmx)
        zt = tuple(
            jnp.zeros_like(a) for a in (mnj, mxj, cmn, cmx)
        )
        if not any(present):
            return prim_out, (
                jnp.zeros_like(mn), jnp.zeros_like(mx)
            ) + zt
        tans = tuple(tg for tg, p in zip(tangents, present) if p)
        t_out = linear_call(tfwd, ttrans, res, tans)
        return prim_out, tuple(t_out) + zt

    _mm.defjvp(_mm_jvp, symbolic_zeros=True)
    return _mm(h_i, h_j)[:2]
