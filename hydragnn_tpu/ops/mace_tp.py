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
        out_shape=jax.ShapeDtypeStruct(
            (T * out_rows, out_cols),
            in_dtype if not ct_mode else jnp.float32,
        ),
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
        ct_w, ct_sh = _ct_edge_xla(
            graph, ct, x, sh, w, terms, mul, P, S
        )
        return ct_x, ct_sh, ct_w

    f.defvjp(f_fwd, f_bwd)
    return f(*args)
