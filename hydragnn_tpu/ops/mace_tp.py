"""Fused MACE interaction kernel: gather -> uvu tensor product -> segment
sum in one Pallas pass (VERDICT r03 item 2).

The reference hot spot (``hydragnn/utils/model/mace_utils/modules/
blocks.py:372-404``: per-edge weighted TP + scatter) ran here as the
m-major XLA unroll (models/mace.py weighted_tp_mmajor) whose edge-space
intermediates and gather/scatter legs were ~42 of the 59 ms MACE step
(profiling/BYTES_mace.json).  This kernel keeps the edge dimension
entirely in VMEM:

  per receiver tile: DMA the sender window of the m-major node features
  once; per edge block: DMA the radial weights + SH streams, gather the
  block's sender rows with the window one-hot matmul, evaluate the
  scalar-unrolled CG product on [TE, mul] column blocks (VPU), and
  reduce the messages onto the tile with the segment one-hot matmul.

AD surface (two variants, selected by the caller):

  * ``impl="vjp"`` — jax.custom_vjp: kernel forward, kernel d/d-x
    (window-reduce "wsum" shape: transposed product computed on the tile
    side, reduced onto the sender window), XLA gathers for the edge-
    space d/d-w and d/d-sh.  Correct for reverse-mode including a SINGLE
    force grad (calculator inference); reverse-over-reverse raises
    JAX's custom_vjp-jvp error LOUDLY.
  * ``impl="jvp"`` — jax.custom_jvp: kernel forward, tangents via the
    fully-XLA trilinear (models/mace.py weighted_tp_mmajor composition),
    so every higher derivative (force TRAINING's reverse-over-reverse)
    is exact; backward runs at XLA speed.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tp_terms(irreps_in, max_l_sh: int, max_l_out: int, mul: int):
    """Static term table of the uvu product in m-major layout.

    Returns (terms, Din, Dout, P, out_ls, in_off, sh_off) with terms =
    [(c, x_col, sh_col, w_col, out_col)] where each *_col indexes a
    ``mul``-wide column block (x/w/out) or a single SH lane (sh)."""
    from hydragnn_tpu.equivariant.core import clebsch_gordan, tp_instructions

    paths = tp_instructions(irreps_in, max_l_sh, max_l_out)
    counts: Dict[int, int] = {}
    for _, _, l3 in paths:
        counts[l3] = counts.get(l3, 0) + 1
    out_ls = sorted(counts)
    in_ls = sorted(l for _, l in irreps_in)
    in_off = {}
    off = 0
    for l in in_ls:
        in_off[l] = off
        off += (2 * l + 1) * mul
    Din = off
    out_off = {}
    off = 0
    for l in out_ls:
        out_off[l] = off
        off += (2 * l + 1) * mul
    Dout = off
    sh_off = {l: l * l for l in range(max_l_sh + 1)}
    terms: List[Tuple[float, int, int, int, int]] = []
    for p, (l1, l2, l3) in enumerate(paths):
        C = clebsch_gordan(l1, l2, l3) / math.sqrt(counts[l3])
        nz = np.argwhere(np.abs(C) > 1e-12)
        for i, j, k in nz:
            terms.append(
                (
                    float(C[i, j, k]),
                    in_off[l1] + int(i) * mul,
                    sh_off[l2] + int(j),
                    p * mul,
                    out_off[l3] + int(k) * mul,
                )
            )
    return terms, Din, Dout, len(paths), out_ls, in_off, sh_off


def _rcv_plan(g):
    return (g.agg_rcv_off, g.agg_rcv_nb, g.agg_rcv_sid, g.agg_rcv_lot,
            g.agg_rcv_win)


def _tp_eval_streamed(terms, mul, x_blk, sh_blk, w_blk, D_out, acc, red_fn,
                      transpose=False):
    """Scalar-unrolled product streamed per OUTPUT column block: each
    mul-wide output block's terms sum into one [rows, mul] fp32
    temporary, immediately reduced and accumulated into the fp32 VMEM
    scratch ``acc`` by a STATIC slice read-modify-write.  ``sh_blk`` /
    ``w_blk`` are column-slice LOADERS over the stream scratch refs —
    whole-block loads (and a giant fori carry) held multi-MB tensors in
    vector registers and blew Mosaic's 16 MB scoped-vmem budget twice.

    ``transpose=True`` runs d/d-x: swap the roles of the x and out
    columns (``x_blk`` is then the gathered output cotangent)."""
    by_out: Dict[int, list] = {}
    for c, xc, shc, wc, oc in terms:
        src, dst = (oc, xc) if transpose else (xc, oc)
        by_out.setdefault(dst, []).append((c, src, shc, wc))
    # NOTE: caching x*w across dst groups (terms of one CG path share
    # (src, wc)) was tried in r05 and REVERTED — the long-lived cached
    # [rows, mul] tensors blew Mosaic's register allocation (compile ran
    # 17+ minutes, vs ~3 for this form) for a projected ~1.5 ms gain
    for dst in sorted(by_out):
        a = None
        for c, src, shc, wc in by_out[dst]:
            t = (c * sh_blk(shc)) * (
                x_blk[:, src : src + mul].astype(jnp.float32)
                * w_blk(wc).astype(jnp.float32)
            )
            a = t if a is None else a + t
        # accumulate IN the fp32 VMEM scratch ref (static slice: a plain
        # read-modify-write, no scatter, no giant fori carry in vregs)
        acc[:, dst : dst + mul] += red_fn(a)


_SH_PAD = 128  # SH stream padded to one lane tile


def _kernel_common(graph, Fs):
    off, nb, sid, lot, win = _rcv_plan(graph)
    TN, TE, MB = graph.agg_meta[0], graph.agg_meta[1], graph.agg_meta[2]
    W = int(graph.agg_meta[4])
    n_node = graph.n_node
    T = (n_node + TN - 1) // TN
    return off, nb, sid, lot, win, TN, TE, MB, W, n_node, T


def _pad_streams(graph, sh_flat, w_flat):
    """Edge streams padded to lane multiples and to the plan's DMA reach."""
    E_req = graph.agg_meta[3]
    TE = graph.agg_meta[1]

    def prep(x, lanes):
        pad_c = (-x.shape[1]) % lanes
        if pad_c:
            x = jnp.pad(x, ((0, 0), (0, pad_c)))
        if x.shape[0] < E_req:
            x = jnp.concatenate(
                [x, jnp.zeros((E_req + TE - x.shape[0], x.shape[1]), x.dtype)]
            )
        return x

    return prep(sh_flat, _SH_PAD), prep(w_flat, 128)


def mace_tp_scatter_raw(
    graph,
    up_m: jnp.ndarray,  # [N, Din] m-major node features
    sh_flat: jnp.ndarray,  # [E, S] concat SH columns
    w_flat: jnp.ndarray,  # [E, P*mul] radial path weights
    terms,
    mul: int,
    Din: int,
    Dout: int,
    ct_mode: bool = False,
    interpret: bool = False,
):
    """Forward (``ct_mode=False``): out[n] = sum_{e: rcv=n} TP(x[snd e],
    sh_e, w_e) as one fused kernel.  ``ct_mode=True`` computes the d/d-x
    cotangent instead: ``up_m`` is then the [N, Dout] output cotangent
    (receiver-aligned -> cheap tile side), and the transposed product is
    reduced onto the sender WINDOW rows, combined across overlapping
    tile windows in XLA ([N, Din])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hydragnn_tpu.ops.fused_gather import _combine_window

    off, nb, sid, lot, win, TN, TE, MB, W, n_node, T = _kernel_common(
        graph, None
    )
    sh_p, w_p = _pad_streams(graph, sh_flat, w_flat)
    Sw = sh_p.shape[1]
    Pw = w_p.shape[1]
    in_dtype = up_m.dtype

    def kernel(off_ref, nb_ref, win_ref, sid_ref, lot_ref,
               tbl_hbm, sh_hbm, w_hbm, o_ref,
               tbl_scr, sh_scr, w_scr, acc_scr, sem_tbl, sem_es):
        t = pl.program_id(0)
        nblk = nb_ref[t]

        acc_scr[:, :] = jnp.zeros(acc_scr.shape, acc_scr.dtype)

        def tbl_dma():
            if ct_mode:
                # cotangent table is TILE-aligned: [TN, Dout] rows
                return pltpu.make_async_copy(
                    tbl_hbm.at[pl.ds(t * TN, TN), :], tbl_scr, sem_tbl
                )
            start = pl.multiple_of(win_ref[t], 8)
            return pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(start, W), :], tbl_scr, sem_tbl
            )

        def es_dma(hbm, scr, b, slot, sem):
            st = pl.multiple_of(off_ref[t, b], 8)
            return pltpu.make_async_copy(
                hbm.at[pl.ds(st, TE), :], scr.at[slot], sem
            )

        @pl.when(nblk > 0)
        def _run():
            tbl_dma().start()
            es_dma(sh_hbm, sh_scr, 0, 0, sem_es.at[0]).start()
            es_dma(w_hbm, w_scr, 0, 0, sem_es.at[1]).start()
            tbl_dma().wait()

            def body(b, _):
                @pl.when(b + 1 < nblk)
                def _pf():
                    es_dma(
                        sh_hbm, sh_scr, b + 1, (b + 1) % 2, sem_es.at[0]
                    ).start()
                    es_dma(
                        w_hbm, w_scr, b + 1, (b + 1) % 2, sem_es.at[1]
                    ).start()

                es_dma(sh_hbm, sh_scr, b, b % 2, sem_es.at[0]).wait()
                es_dma(w_hbm, w_scr, b, b % 2, sem_es.at[1]).wait()
                sid_b = sid_ref[0, pl.ds(b, 1), :]  # [1, TE]
                lot_b = lot_ref[0, pl.ds(b, 1), :]
                rows_tn = jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0)
                oh_tile = (rows_tn == sid_b).astype(jnp.bfloat16)
                rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, TE), 0)
                oh_win = (rows_w == lot_b).astype(jnp.bfloat16)

                def sel(oh, vals):  # [K, TE]^T x [K, D] -> [TE, D] bf16
                    # Mosaic rejects bf16 matmul OUTPUT: accumulate fp32,
                    # cast after (one-hot selection of bf16 values: exact)
                    r = jax.lax.dot_general(
                        oh, vals.astype(jnp.bfloat16),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return r.astype(jnp.bfloat16)

                def red(oh, vals):  # [K, TE] x [TE, D] -> [K, D]
                    return jax.lax.dot_general(
                        oh, vals.astype(jnp.bfloat16),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                # per-term SLICE loads from the stream scratch (whole-
                # block loads held the [TE, P*mul] tensors in vregs and
                # blew the scoped-vmem budget)
                slot = b % 2

                def sh_load(col):
                    return sh_scr[slot, :, col : col + 1].astype(
                        jnp.float32
                    )

                def w_load(col):
                    return w_scr[slot, :, col : col + mul]

                if ct_mode:
                    ct_blk = sel(oh_tile, tbl_scr[:])  # [TE, Dout] bf16
                    _tp_eval_streamed(
                        terms, mul, ct_blk, sh_load, w_load, Din, acc_scr,
                        lambda a: red(oh_win, a), transpose=True,
                    )
                else:
                    x_blk = sel(oh_win, tbl_scr[:])  # [TE, Din] bf16
                    _tp_eval_streamed(
                        terms, mul, x_blk, sh_load, w_load, Dout, acc_scr,
                        lambda a: red(oh_tile, a),
                    )
                return 0

            jax.lax.fori_loop(0, nblk, body, 0)

        o_ref[:, :] = acc_scr[:, :].astype(o_ref.dtype)

    tbl_rows = TN if ct_mode else W
    out_rows, out_cols = (W, Din) if ct_mode else (TN, Dout)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, MB, TE), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((out_rows, out_cols), lambda t, *_: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((tbl_rows, up_m.shape[1]), up_m.dtype),
            pltpu.VMEM((2, TE, Sw), sh_p.dtype),
            pltpu.VMEM((2, TE, Pw), w_p.dtype),
            pltpu.VMEM((out_rows, out_cols), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # ct_mode window partials in the INPUT dtype (bf16 under mixed-
        # precision training): in-kernel accumulation is fp32 scratch and
        # the overlap combine re-accumulates fp32, so only the <=6-window
        # partial is rounded — halves the [T*W, Din] HBM traffic that
        # dominated the r04 backward kernel (BYTES_mace layer_1.5)
        out_shape=jax.ShapeDtypeStruct((T * out_rows, out_cols), in_dtype),
        # the unrolled per-term TP keeps ~1.5 MB more live vector state
        # than Mosaic's default 16 MB scoped budget; v5e VMEM accommodates
        # the raised cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 2**20
        ),
        interpret=interpret,
    )(off, nb, win, sid, lot, up_m, sh_p, w_p)
    if ct_mode:
        return _combine_window(out, win, n_node, TN, W)
    return out[:n_node]


def _has_eg(graph) -> bool:
    """Edge-gather plan present: the disjoint-block kernels below apply."""
    return (
        graph.agg_meta is not None
        and len(graph.agg_meta) > 6
        and graph.agg_meta[6] is not None
        and graph.eg_snd_lot is not None
        and graph.eg_rcv_lot is not None
    )


def _pad_rows_cols(x, lanes, rows):
    """Pad an edge stream to ``lanes`` column multiples and ``rows`` rows
    (the disjoint-block kernels read [b*TE, (b+1)*TE) per block)."""
    pad_c = (-x.shape[1]) % lanes
    if pad_c:
        x = jnp.pad(x, ((0, 0), (0, pad_c)))
    if x.shape[0] < rows:
        x = jnp.concatenate(
            [x, jnp.zeros((rows - x.shape[0], x.shape[1]), x.dtype)]
        )
    return x


def _sel_exact_dot(oh, vals, barrier=False):
    """Gather rows through a one-hot [K, TE] matrix: [K, TE]^T x [K, D]
    -> [TE, D].  Exact for bf16 inputs directly; fp32 via the 3-way bf16
    split (hi+mid+lo covers the 24-bit mantissa; one-hot rows sum exactly
    one term).

    ``barrier=True`` (interpret mode): the kernel body compiles through
    XLA there, whose dot-merger rewrites dot(a)+dot(b)+dot(c) into
    dot(a+b+c) with the SUM IN BF16 — destroying the split's exactness.
    An optimization_barrier between the dots blocks the rewrite; Mosaic
    (the real-TPU compiler) performs no such algebraic merge."""
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


def _edge_bwd_call(graph, up_m, ct, stream, body, out_cols, out_dtype,
                   interpret=False):
    """Shared scaffold of the disjoint-block edge-space backward kernels:
    grid over the NB edge blocks of the edge-gather plan (blocks tile the
    edge axis disjointly — block-aligned output writes never overlap),
    double-buffered [Wg, Din]/[Wg, Dout] window DMAs for the sender x and
    receiver ct tables, one-hot MXU gathers, then ``body(x_blk, ct_blk,
    stream_blk, o_ref)`` evaluates the per-edge cotangent on VMEM blocks.

    Replaces the r04 ``_ct_edge_xla`` XLA leg — the MACE step's top cost
    (~19 ms of gathers, [E, P*mul] products, concats and converts at
    profiling/BYTES_mace.json mace_tp.py:439) — with one fused pass.
    Reference semantics: the autograd backward of the per-edge weighted TP
    (``hydragnn/utils/model/mace_utils/modules/blocks.py:372-404``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TE = graph.agg_meta[1]
    Wg = int(graph.agg_meta[6])
    snd_win, snd_lot = graph.eg_snd_win, graph.eg_snd_lot
    rcv_win, rcv_lot = graph.eg_rcv_win, graph.eg_rcv_lot
    NB = snd_lot.shape[0]
    E = graph.n_edge
    stream_p = _pad_rows_cols(stream, 128, NB * TE)
    Sw = stream_p.shape[1]
    slot3 = snd_lot.reshape(NB, 1, TE)
    rlot3 = rcv_lot.reshape(NB, 1, TE)

    def kernel(sw_ref, rw_ref, slot_ref, rlot_ref, st_ref, x_hbm, ct_hbm,
               o_ref, xw_scr, cw_scr, sems):
        b = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma(hbm, scr, wref, bb, slot, sem_i):
            st = pl.multiple_of(wref[bb], 8)
            return pltpu.make_async_copy(
                hbm.at[pl.ds(st, Wg), :], scr.at[slot], sems.at[sem_i, slot]
            )

        @pl.when(b == 0)
        def _first():
            dma(x_hbm, xw_scr, sw_ref, 0, 0, 0).start()
            dma(ct_hbm, cw_scr, rw_ref, 0, 0, 1).start()

        @pl.when(b + 1 < nb)
        def _pf():
            dma(x_hbm, xw_scr, sw_ref, b + 1, (b + 1) % 2, 0).start()
            dma(ct_hbm, cw_scr, rw_ref, b + 1, (b + 1) % 2, 1).start()

        dma(x_hbm, xw_scr, sw_ref, b, b % 2, 0).wait()
        dma(ct_hbm, cw_scr, rw_ref, b, b % 2, 1).wait()

        rows_w = jax.lax.broadcasted_iota(jnp.int32, (Wg, TE), 0)
        oh_s = (rows_w == slot_ref[0, 0, :]).astype(jnp.bfloat16)
        oh_r = (rows_w == rlot_ref[0, 0, :]).astype(jnp.bfloat16)
        # gathered blocks kept at the INPUT precision (bf16 under mixed-
        # precision training, fp32 tables stay fp32 — the 3-way-split
        # select is exact); terms upcast [TE, mul] column slices to fp32
        bdt = (
            jnp.bfloat16 if up_m.dtype == jnp.bfloat16 else jnp.float32
        )
        x_blk = _sel_exact_dot(
            oh_s, xw_scr[b % 2][:], barrier=interpret
        ).astype(bdt)
        ct_blk = _sel_exact_dot(
            oh_r, cw_scr[b % 2][:], barrier=interpret
        ).astype(bdt)
        body(x_blk, ct_blk, st_ref, o_ref)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((1, 1, TE), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, TE), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((TE, Sw), lambda b, *_: (b, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((TE, out_cols), lambda b, *_: (b, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, Wg, up_m.shape[1]), up_m.dtype),
            pltpu.VMEM((2, Wg, ct.shape[1]), ct.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB * TE, out_cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 2**20
        ),
        interpret=interpret,
    )(snd_win, rcv_win, slot3, rlot3, stream_p, up_m, ct)
    return out[:E]


def mace_ct_w_raw(graph, up_m, ct, sh_flat, terms, mul, Pcols,
                  interpret=False):
    """d/d-w of the fused TP+scatter in ONE disjoint-block pass:

        ct_w[e, wc+u] = sum_{terms with this wc} C * sh[e, shc]
                        * x[snd e, xc+u] * ct[rcv e, oc+u]

    Streams sh per block; x and ct arrive through the window one-hot
    gathers.  Output [E, Pcols-padded] in ``up_m.dtype`` (fp32 in-VMEM
    accumulation).  Padding edges (window id -1) read zero rows from both
    gathers, so their cotangent rows are exactly 0 — same contract as the
    XLA leg's edge-mask where."""
    Pw = -(-Pcols // 128) * 128
    by_wc: Dict[int, list] = {}
    for c, xc, shc, wc, oc in terms:
        by_wc.setdefault(wc, []).append((c, xc, shc, oc))

    def body(x_blk, ct_blk, sh_ref, o_ref):
        # zero-init covers padding columns and any path without terms;
        # real path blocks overwrite below (VMEM-local, cheap)
        o_ref[:, :] = jnp.zeros((x_blk.shape[0], Pw), o_ref.dtype)
        for wc in sorted(by_wc):
            sub = by_wc[wc]
            a = None
            cache: Dict[Tuple[int, int], jnp.ndarray] = {}
            for c, xc, shc, oc in sub:
                xct = cache.get((xc, oc))
                if xct is None:
                    xct = x_blk[:, xc : xc + mul].astype(
                        jnp.float32
                    ) * ct_blk[:, oc : oc + mul].astype(jnp.float32)
                    cache[(xc, oc)] = xct
                t = (c * sh_ref[:, shc : shc + 1].astype(jnp.float32)) * xct
                a = t if a is None else a + t
            o_ref[:, wc : wc + mul] = a.astype(o_ref.dtype)

    return _edge_bwd_call(
        graph, up_m, ct, sh_flat, body, Pw, up_m.dtype, interpret=interpret
    )[:, :Pcols]


def mace_ct_sh_raw(graph, up_m, ct, w_flat, terms, mul, S,
                   interpret=False):
    """d/d-sh: ct_sh[e, shc] = sum_terms C * sum_u x[snd,xc+u] *
    ct[rcv,oc+u] * w[e,wc+u].  A SEPARATE kernel from :func:`mace_ct_w_raw`
    so energy-only training (positions not differentiated — the sh
    cotangent chain is dead) lets XLA DCE the whole call; force inference
    (single reverse grad through positions) pays for it only then."""
    Sw = 128  # lane-tile output; caller slices [:, :S]
    by_sh: Dict[int, list] = {}
    for c, xc, shc, wc, oc in terms:
        by_sh.setdefault(shc, []).append((c, xc, wc, oc))

    def body(x_blk, ct_blk, w_ref, o_ref):
        o_ref[:, :] = jnp.zeros((x_blk.shape[0], Sw), o_ref.dtype)
        for shc in sorted(by_sh):
            a = None
            for c, xc, wc, oc in by_sh[shc]:
                xct = x_blk[:, xc : xc + mul].astype(jnp.float32) * ct_blk[
                    :, oc : oc + mul
                ].astype(jnp.float32)
                t = c * jnp.sum(
                    xct * w_ref[:, wc : wc + mul].astype(jnp.float32),
                    axis=1, keepdims=True,
                )
                a = t if a is None else a + t
            o_ref[:, shc : shc + 1] = a

    return _edge_bwd_call(
        graph, up_m, ct, w_flat, body, Sw, jnp.float32, interpret=interpret
    )[:, :S]


def _tp_xla(graph, up_m, sh_flat, w_flat, irreps_in, max_l_sh, max_l_out,
            mul):
    """The differentiable XLA composition (gather -> m-major unrolled
    product -> pallas segment sum), shared by the jvp-variant tangents
    and the CPU/no-plan fallback."""
    from hydragnn_tpu.models.mace import weighted_tp_mmajor
    from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes

    x_e = gather_nodes(graph, up_m, "senders")
    mji, _ = weighted_tp_mmajor(
        x_e, sh_flat, w_flat, irreps_in, max_l_sh, max_l_out, mul
    )
    return aggregate(graph, mji, "sum", "receivers")


def _ct_edge_xla(graph, ct, up_m, sh_flat, w_flat, terms, mul, P, S):
    """Edge-space cotangents d/d-w and d/d-sh via the scatter-free
    gathers: both need per-edge products of gathered x and gathered ct —
    genuinely [E, *] quantities (they feed the per-edge radial MLP /
    SH backward), so this is compulsory edge traffic."""
    from hydragnn_tpu.ops.aggregate import gather_nodes

    # edge-space compute dtype follows the inputs: the r04 kernel round
    # left these legs as the MACE step's top cost (fp32 edge tensors,
    # profiling/BYTES_mace.json) — bf16 halves the traffic and matches
    # mixed-precision training gradients
    et = up_m.dtype
    x_e = gather_nodes(graph, up_m, "senders").astype(et)
    ct_e = gather_nodes(graph, ct.astype(et), "receivers")
    sh_f = sh_flat.astype(et)
    w_f = w_flat.astype(et)
    E = x_e.shape[0]
    ct_w_cols: Dict[int, jnp.ndarray] = {}
    ct_sh_cols: Dict[int, jnp.ndarray] = {}
    for c, xc, shc, wc, oc in terms:
        xi = x_e[:, xc : xc + mul]
        cto = ct_e[:, oc : oc + mul]
        xct = xi * cto
        sh_col = sh_f[:, shc : shc + 1]
        ct_w_cols[wc] = ct_w_cols.get(wc, 0.0) + (
            jnp.asarray(c, et) * sh_col
        ) * xct
        contrib = c * jnp.sum(
            (xct * w_f[:, wc : wc + mul]).astype(jnp.float32),
            axis=1, keepdims=True,
        )
        ct_sh_cols[shc] = ct_sh_cols.get(shc, 0.0) + contrib
    zero_w = jnp.zeros((E, mul), et)
    ct_w = jnp.concatenate(
        [ct_w_cols.get(p * mul, zero_w) for p in range(P)], axis=-1
    )
    zero_s = jnp.zeros((E, 1), jnp.float32)
    ct_sh = jnp.concatenate(
        [ct_sh_cols.get(s, zero_s) for s in range(S)], axis=-1
    )
    em = graph.edge_mask[:, None]
    return (
        jnp.where(em, ct_w, 0.0).astype(w_flat.dtype),
        jnp.where(em, ct_sh, 0.0).astype(sh_flat.dtype),
    )


def weighted_tp_scatter_fused(
    graph,
    up_m: jnp.ndarray,  # [N, Din]
    sh_flat: jnp.ndarray,  # [E, S]
    h3a: jnp.ndarray,  # [E, Ha] radial hidden + trailing ones column
    wla: jnp.ndarray,  # [Ha, P*mul] last radial Dense (bias as last row)
    irreps_in,
    max_l_sh: int,
    max_l_out: int,
    mul: int,
    impl: str = "vjp",
    interpret: bool = False,
):
    """Fused gather->TP->scatter with the LAST RADIAL DENSE folded into
    every kernel pass: w[e] = h3a[e] @ wla is computed per block in VMEM
    (forward, d/d-x, d/d-w->h3a/wla, d/d-sh), so neither w nor ct_w ever
    exists in HBM — the r04 profile's tp_w_3 dot_generals (~4 ms,
    700+ MB each, BYTES_mace linear.py:287) disappear.  Reference
    semantics: conv_tp_weights MLP feeding the weighted TP
    (``hydragnn/utils/model/mace_utils/modules/blocks.py:372-404``)."""
    terms, Din, Dout, P, out_ls, _, _ = tp_terms(
        irreps_in, max_l_sh, max_l_out, mul
    )
    S = sh_flat.shape[1]

    def _w_of(h3, wlv, dt):
        return jnp.dot(h3, wlv).astype(dt)

    def fwd_kernel(x, sh, h3, wlv):
        # one XLA dot materializes w (bandwidth-optimal, ~1 ms at bench
        # shapes) feeding the forward stream — measured FASTER than
        # recomputing w per block inside the kernel (the recompute
        # serializes with the per-term VPU loop in fwd AND ct_x); only
        # the BACKWARD contraction stays fused (ct_w never exists in HBM)
        return mace_tp_scatter_raw(
            graph, x, sh, _w_of(h3, wlv, x.dtype), terms, mul, Din, Dout,
            interpret=interpret,
        )

    if impl == "jvp":
        @jax.custom_jvp
        def f(x, sh, h3, wlv):
            return fwd_kernel(x, sh, h3, wlv)

        @f.defjvp
        def f_jvp(primals, tangents):
            x, sh, h3, wlv = primals
            tx, tsh, th3, twl = tangents
            y = f(x, sh, h3, wlv)
            w = _w_of(h3, wlv, x.dtype)
            tw = (jnp.dot(th3, wlv) + jnp.dot(h3, twl)).astype(x.dtype)
            xla = lambda a, b, c: _tp_xla(
                graph, a, b, c, irreps_in, max_l_sh, max_l_out, mul
            )
            ty = xla(tx, sh, w) + xla(x, tsh, w) + xla(x, sh, tw)
            return y, ty

        return f(up_m, sh_flat, h3a, wla)

    @jax.custom_vjp
    def f(x, sh, h3, wlv):
        return fwd_kernel(x, sh, h3, wlv)

    def f_fwd(x, sh, h3, wlv):
        return fwd_kernel(x, sh, h3, wlv), (x, sh, h3, wlv)

    def f_bwd(res, ct):
        # ct_w through the fused disjoint-block kernel, the small Dense
        # transpose contractions through XLA dots — measured FASTER than
        # contracting wl inside the kernel (in-kernel matmuls serialize
        # with the per-term VPU loop; XLA's bandwidth-bound dots overlap
        # with the surrounding kernels: 43.3 vs 46.9 ms MACE step)
        x, sh, h3, wlv = res
        ct_b = ct.astype(x.dtype)
        w_mat = _w_of(h3, wlv, x.dtype)
        ct_x = mace_tp_scatter_raw(
            graph, ct_b, sh, w_mat, terms, mul, Din, Dout,
            ct_mode=True, interpret=interpret,
        ).astype(x.dtype)
        if _has_eg(graph):
            ct_w = mace_ct_w_raw(
                graph, x, ct_b, sh, terms, mul, P * mul,
                interpret=interpret,
            )
            ct_sh = mace_ct_sh_raw(
                graph, x, ct_b, w_mat, terms, mul, S,
                interpret=interpret,
            ).astype(sh.dtype)
        else:
            ct_w, ct_sh = _ct_edge_xla(
                graph, ct, x, sh, w_mat, terms, mul, P, S
            )
        ct_h3 = jnp.dot(ct_w, wlv.T)
        ct_wl = jnp.dot(h3.T, ct_w)
        return (
            ct_x, ct_sh, ct_h3.astype(h3.dtype), ct_wl.astype(wlv.dtype),
        )

    f.defvjp(f_fwd, f_bwd)
    return f(up_m, sh_flat, h3a, wla)


def weighted_tp_scatter(
    graph,
    up_m: jnp.ndarray,
    sh_flat: jnp.ndarray,
    w_flat: jnp.ndarray,
    irreps_in,
    max_l_sh: int,
    max_l_out: int,
    mul: int,
    impl: str = "vjp",
    interpret: bool = False,
):
    """Fused gather->TP->scatter with the AD variant chosen by ``impl``
    (see module docstring).  Output: [N, Dout] m-major over ascending
    out_ls (same layout as weighted_tp_mmajor + aggregate)."""
    terms, Din, Dout, P, out_ls, _, _ = tp_terms(
        irreps_in, max_l_sh, max_l_out, mul
    )
    S = sh_flat.shape[1]
    args = (up_m, sh_flat, w_flat)

    def fwd_kernel(x, sh, w):
        return mace_tp_scatter_raw(
            graph, x, sh, w, terms, mul, Din, Dout, interpret=interpret
        )

    if impl == "jvp":
        @jax.custom_jvp
        def f(x, sh, w):
            return fwd_kernel(x, sh, w)

        @f.defjvp
        def f_jvp(primals, tangents):
            x, sh, w = primals
            tx, tsh, tw = tangents
            y = f(x, sh, w)
            # trilinear: tangent = same map with one slot replaced; the
            # XLA composition keeps every further derivative exact
            xla = lambda a, b, c: _tp_xla(
                graph, a, b, c, irreps_in, max_l_sh, max_l_out, mul
            )
            ty = xla(tx, sh, w) + xla(x, tsh, w) + xla(x, sh, tw)
            return y, ty

        return f(*args)

    @jax.custom_vjp
    def f(x, sh, w):
        return fwd_kernel(x, sh, w)

    def f_fwd(x, sh, w):
        return fwd_kernel(x, sh, w), (x, sh, w)

    def f_bwd(res, ct):
        x, sh, w = res
        ct_x = mace_tp_scatter_raw(
            graph, ct.astype(x.dtype), sh, w, terms, mul, Din, Dout,
            ct_mode=True, interpret=interpret,
        ).astype(x.dtype)
        if _has_eg(graph):
            ct_b = ct.astype(x.dtype)
            ct_w = mace_ct_w_raw(
                graph, x, ct_b, sh, terms, mul, P * mul,
                interpret=interpret,
            ).astype(w.dtype)
            ct_sh = mace_ct_sh_raw(
                graph, x, ct_b, w, terms, mul, S, interpret=interpret
            ).astype(sh.dtype)
        else:
            ct_w, ct_sh = _ct_edge_xla(
                graph, ct, x, sh, w, terms, mul, P, S
            )
        return ct_x, ct_sh, ct_w

    f.defvjp(f_fwd, f_bwd)
    return f(*args)
