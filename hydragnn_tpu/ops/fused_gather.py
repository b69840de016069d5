"""Fused gather -> combine -> segment-reduce Pallas kernel (TPU).

The remaining HBM cost of message passing after ops/pallas_segment.py is
the EDGE-SPACE INTERMEDIATES: node->edge gathers materialize [E, F]
tensors that the segment kernels then re-read, and every elementwise op
between them (h_i + h_j, h*h, tie indicators, cotangent weighting) is
another [E, F] read+write.  This module removes edge space from HBM
entirely for messages of the form

    h[e] = combine(tables_win[snd[e]], tables_tile[rcv[e]], edge[e])

followed by segment reductions (sum / min / max) onto the receiver tiles:

  * the reduce-aligned endpoint is gathered with the per-tile one-hot
    [TN, TE] MXU matmul of ops/pallas_segment.py;
  * the OTHER endpoint (random within the tile's graphs) is gathered from
    a per-tile node WINDOW: because samples are packed contiguously
    (data/batching.py collate) and edges are sorted by the aligned
    endpoint, both endpoints of every edge in a tile lie in one
    contiguous node range of bounded width W -- the kernel DMAs that
    [W, TF] window into VMEM once per tile and gathers rows with a
    [W, TE] one-hot matmul (the standard TPU vectorized-gather trick);
  * ``combine`` is an arbitrary traced elementwise function evaluated on
    [TE, TF] VMEM blocks (the "fused edge MLP" hook), and each requested
    reduction lands on the [TN, TF] output tile -- sums via one-hot
    matmuls, extrema via the segmented Hillis-Steele scan of
    ops/pallas_segment.py.

The TRANSPOSE of "gather at senders -> segment-sum at receivers" is
"gather at receivers -> segment-sum at senders": the same kernel run on
the sender-sorted plan with the window covering receivers.  All AD
wrappers below exploit that symmetry, so backward passes fuse too.

Replaces the reference's gather/scatter message path (PyG propagate +
torch_scatter, e.g. reference hydragnn/models/PNAStack.py forward) with
a single kernel; this is the "fused gather -> edge-MLP -> segment"
kernel named by BASELINE.md's north star.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 3.0e38  # finite +/-inf sentinel, safe in fp32 arithmetic
_VMEM_BUDGET = 10 * 2**20  # leave headroom under the ~16 MB/core VMEM


# ---------------------------------------------------------------------------
# Host-side window planning
# ---------------------------------------------------------------------------


def plan_windows(
    other: np.ndarray,  # [E] the NON-aligned endpoint, in the plan's edge order
    plan_off: np.ndarray,  # [T, MB] block offsets (plan_segment_tiles)
    plan_sid: np.ndarray,  # [T*MB, TE] or [T, MB, TE] local ids (-1 invalid)
    n_node: int,
    W: int,  # static window width (multiple of 8), fixed by the batcher
) -> Optional[dict]:
    """Per-tile node windows covering the other endpoint of every valid
    edge, plus window-local ids per (tile, block, row).  Returns None when
    any tile's endpoint span exceeds ``W`` (caller falls back to the
    unfused path)."""
    off = np.asarray(plan_off, np.int64)  # [T, MB]
    T, MB = off.shape
    sid = np.asarray(plan_sid).reshape(T, MB, -1)
    TE = sid.shape[2]
    if W % 8 != 0 or W > n_node:
        return None
    # offsets are unclipped (may run past E by < TE); extend with zeros
    other_ext = np.concatenate(
        [np.asarray(other, np.int64), np.zeros(TE, np.int64)]
    )
    idx = np.minimum(off[..., None] + np.arange(TE), len(other_ext) - 1)
    vals = other_ext[idx]  # [T, MB, TE]
    valid = sid >= 0
    lo = np.where(valid, vals, np.iinfo(np.int64).max).min(axis=(1, 2))
    hi = np.where(valid, vals, np.iinfo(np.int64).min).max(axis=(1, 2))
    has = valid.any(axis=(1, 2))
    lo = np.where(has, lo, 0)
    hi = np.where(has, hi, 0)
    w = (lo // 8) * 8  # Mosaic: sublane slice starts divisible by 8
    if int(np.max(hi - w + 1, initial=1)) > W:
        return None
    # keep the [w, w+W) DMA in bounds; n_node and W are multiples of 8
    w = np.minimum(w, n_node - W)
    lot = vals - w[:, None, None]
    lot = np.where(valid & (lot >= 0) & (lot < W), lot, -1).astype(np.int32)
    return {"win_start": w.astype(np.int32), "lot": lot}


def needed_window(
    other: np.ndarray, plan_off: np.ndarray, plan_sid: np.ndarray
) -> int:
    """Smallest static W (multiple of 8) whose per-tile windows cover the
    other endpoint of every valid edge, accounting for the 8-row
    down-alignment of the window start.  Window-op MXU time is linear in
    W, so the batcher shrinks the worst-case ``static_window_width``
    bound to (a bucket-rounding of) this data-driven value."""
    off = np.asarray(plan_off, np.int64)
    T, MB = off.shape
    sid = np.asarray(plan_sid).reshape(T, MB, -1)
    TE = sid.shape[2]
    other_ext = np.concatenate(
        [np.asarray(other, np.int64), np.zeros(TE, np.int64)]
    )
    idx = np.minimum(off[..., None] + np.arange(TE), len(other_ext) - 1)
    vals = other_ext[idx]
    valid = sid >= 0
    if not valid.any():
        return 8
    lo = np.where(valid, vals, np.iinfo(np.int64).max).min(axis=(1, 2))
    hi = np.where(valid, vals, np.iinfo(np.int64).min).max(axis=(1, 2))
    has = valid.any(axis=(1, 2))
    span = np.where(has, hi - (lo // 8) * 8 + 1, 1)
    return int(-(-int(span.max()) // 8) * 8)


def static_window_width(
    max_graph_nodes: int, tile_nodes: int = 128, cap: int = 2048
) -> Optional[int]:
    """Static W bound valid for every batch of a dataset: a tile's rows
    span [a, a+TN); the graphs containing them cover at most
    TN + 2*(max_g - 1) contiguous node rows, +8 for down-alignment of the
    window start.  None when that exceeds ``cap`` (window gathers cost
    MXU time linear in W; past ~2k rows the fused path stops paying)."""
    need = tile_nodes + 2 * max(int(max_graph_nodes) - 1, 0) + 8
    # window ops cost ~linearly in W; round to the 8-row sublane tile
    # only (128-rounding cost ~16% extra on every window matmul at the
    # bench shapes)
    W = int(-(-need // 8) * 8)
    return W if W <= cap else None


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _pick_tf(F, tile_features, n_wt, W, n_es, TE, R, itemsizes, Rw=0):
    """Largest feature tile dividing F that keeps the kernel's VMEM
    (window scratch + double-buffered edge streams + output block +
    window-reduce accumulators) under budget."""
    cands = sorted(
        {t for t in (tile_features, 512, 256, 128) if F % t == 0},
        reverse=True,
    )
    win_b, es_b = itemsizes
    for tf in cands:
        vmem = (
            n_wt * W * win_b + n_es * 2 * TE * es_b + R * 128 * 4
            + Rw * W * 2 * 4
        ) * tf
        if vmem <= _VMEM_BUDGET:
            return tf
    return cands[-1] if cands else None


def _combine_window(out_win, win_start, n_node, TN, W):
    """[T*W, F] per-tile window partial sums -> [N, F] global sums: node n
    collects from every tile whose window covers it (windows overlap by
    construction).

    When ``win_start`` is host numpy (always true for plan data) and
    monotone, the EXACT coverage range per node is precomputed on the
    host with searchsorted, so the gather loop runs the true overlap
    count (~ceil(W/TN)+1 candidates) instead of the conservative
    4*(W//TN)+3 — on wide-feature backward passes the combine's HBM
    reads drop ~4x."""
    T = out_win.shape[0] // W
    ws_np = np.asarray(win_start) if not isinstance(
        win_start, jnp.ndarray
    ) else None
    if ws_np is not None and T > 0 and np.all(np.diff(ws_np[:T]) >= 0):
        n_np = np.arange(n_node, dtype=np.int64)
        # window t covers n iff win_start[t] <= n <= win_start[t]+W-1
        t_lo = np.searchsorted(ws_np[:T], n_np - W, side="right")
        t_hi = np.searchsorted(ws_np[:T], n_np, side="right")
        K = int(np.max(t_hi - t_lo)) if n_node else 0
        acc = jnp.zeros((n_node, out_win.shape[1]), jnp.float32)
        for k in range(K):
            t = t_lo + k
            ok_np = t < t_hi
            tc = np.minimum(t, T - 1)
            off = n_np - ws_np[tc]
            ok_np &= (off >= 0) & (off < W)
            rows = jnp.asarray(
                (tc * W + np.clip(off, 0, W - 1)).astype(np.int32)
            )
            ok = jnp.asarray(ok_np)
            acc = acc + jnp.where(
                ok[:, None], out_win[rows].astype(jnp.float32), 0.0
            )
        return acc
    win_start = jnp.asarray(win_start)
    n = jnp.arange(n_node, dtype=jnp.int32)
    # conservative candidate range: window starts sit within ~W of their
    # tile's node range in every direction (incl. the n_node-W end clip),
    # so +-2W/TN tiles around n//TN covers every window containing n
    # (tests pin this against a dense reference)
    K = 4 * (W // TN) + 3
    tbase = n // TN - 2 * (W // TN) - 1
    acc = jnp.zeros((n_node, out_win.shape[1]), jnp.float32)
    for k in range(K):
        t = tbase + k
        t_ok = (t >= 0) & (t < T)
        tc = jnp.clip(t, 0, T - 1)
        off = n - win_start[tc]
        ok = t_ok & (off >= 0) & (off < W)
        rows = tc * W + jnp.clip(off, 0, W - 1)
        acc = acc + jnp.where(
            ok[:, None], out_win[rows].astype(jnp.float32), 0.0
        )
    return acc


def combine_window_pallas(
    out_win: jnp.ndarray,  # [T*(W+2*pad), F] per-tile window partials,
    #   each tile's real rows in the middle [pad, pad+W), pad rows ZERO
    win_start: jnp.ndarray,  # [T] int32
    n_node: int,
    TN: int,
    W: int,
    pad: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """[T*(W+2p), F] padded window partials -> [N, F] sums, as a Pallas
    kernel: node tile tn collects from every window covering it with ONE
    aligned [TN, TF] DMA per candidate window (the contiguous-rows
    observation: node n of tile tn sits at window row TN*tn - win[t] + i,
    an arithmetic range).  The 2*pad zero rows make every candidate's
    slice in-bounds without clamping/rolling, so there is no masking at
    all.  Replaces the XLA combine's per-node row gathers (~17 ns/row,
    the r05 PNA slot-transpose tail at slot_minmax.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Wp = W + 2 * pad
    T = out_win.shape[0] // Wp
    F = out_win.shape[1]
    TF = min(512, F) if F % 128 == 0 else None
    while TF and F % TF:
        TF //= 2
    assert TF and TF >= 128, f"F={F} must be a multiple of 128"
    assert TN % 8 == 0 and pad % 8 == 0 and pad >= TN - 8
    K = 4 * (W // TN) + 3  # same conservative coverage as _combine_window
    n_tiles = n_node // TN

    def kernel(win_ref, src_hbm, o_ref, scr, sem):
        f = pl.program_id(0)
        tn = pl.program_id(1)

        def dma(k, slot):
            t = jnp.clip(tn - 2 * (W // TN) - 1 + k, 0, T - 1)
            # clamped offsets land entirely in the zero guard rows (pad
            # >= TN), so partial/non-coverage reads contribute exact 0;
            # only CLIPPED-t duplicates need the ok mask below
            off = jnp.clip(TN * tn - win_ref[t] + pad, 0, Wp - TN)
            start = pl.multiple_of(t * Wp + off, 8)
            return pltpu.make_async_copy(
                src_hbm.at[pl.ds(start, TN), pl.ds(f * TF, TF)],
                scr.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()

        def body(k, acc):
            @pl.when(k + 1 < K)
            def _pf():
                dma(k + 1, (k + 1) % 2).start()

            dma(k, k % 2).wait()
            t = tn - 2 * (W // TN) - 1 + k
            ok = jnp.logical_and(t >= 0, t < T)
            v = scr[k % 2][:].astype(jnp.float32)
            return acc + jnp.where(ok, v, 0.0)

        acc = jax.lax.fori_loop(
            0, K, body, jnp.zeros((TN, TF), jnp.float32)
        )
        o_ref[:, :] = acc.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(F // TF, n_tiles),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
            scratch_shapes=[
                pltpu.VMEM((2, TN, TF), out_win.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, F), jnp.float32),
        interpret=interpret,
    )(win_start, out_win)


def adjacency_segsum_raw(
    table: jnp.ndarray,  # [N, F]
    adj: jnp.ndarray,  # [T, TN, W] uint8 multiplicities
    win_start: jnp.ndarray,  # [T] int32
    n_node: int,
    meta: Tuple[int, ...],
    interpret: bool = False,
) -> jnp.ndarray:
    """Linear neighbor segment-sum as ONE dense matmul per tile:

    out[t*TN + n] = sum_j adj[t, n, j] * table[win_start[t] + j]

    The one-hot gather/segment matrices of the per-block kernel are PLAN
    CONSTANTS for a linear sum — precomputing their per-tile dense
    product A [TN, W] on the host turns every gather->segsum call from
    blocks x (W-wide select + segment matmul) into a single
    [TN, W] x [W, TF] matmul: ~15x fewer MXU flops at the bench shapes
    (profiling/BYTES_pna.json gather_segsum hot spot).  The TRANSPOSE of
    this map is the same kernel on the mirrored plan's adjacency (sum by
    the other endpoint), so both AD directions ride it."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TN = meta[0]
    W = int(meta[4])
    T = adj.shape[0]
    F = table.shape[1]
    fp32 = table.dtype == jnp.float32
    cands = [t for t in (512, 256, 128) if F % t == 0]
    TF = cands[0] if cands else None
    assert TF is not None, f"F={F} must be a multiple of 128"

    def dot_fwd(a, v):  # [TN, W] x [W, TF]
        return jax.lax.dot_general(
            a, v.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mm(a, v, dot):
        # adj counts are bf16-exact (<= 255); fp32 values via hi/lo split
        # (~2^-18 relative, the segment_sum_pallas convention)
        if not fp32:
            return dot(a, v)
        hi = v.astype(jnp.bfloat16)
        lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return dot(a, hi) + dot(a, lo)

    # Mosaic has no u8->bf16 cast; convert once outside the kernel (XLA
    # fuses it, and the per-call read is T*TN*W*2 bytes — trivial next to
    # the matmul)
    adj = adj.astype(jnp.bfloat16)

    def kernel(win_ref, adj_ref, tbl_hbm, o_ref, win_scr, sem):
        t = pl.program_id(1)
        f = pl.program_id(0)
        start = pl.multiple_of(win_ref[t], 8)
        dma = pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(start, W), pl.ds(f * TF, TF)], win_scr, sem
        )
        dma.start()
        dma.wait()
        o_ref[:, :] = mm(adj_ref[0], win_scr[:], dot_fwd).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(F // TF, T),
            in_specs=[
                pl.BlockSpec((1, TN, W), lambda f, t, *_: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f)),
            scratch_shapes=[
                pltpu.VMEM((W, TF), table.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, F), table.dtype),
        interpret=interpret,
    )(win_start, adj, table)


def window_gather_reduce_raw(
    tables_win: Sequence[jnp.ndarray],  # each [N, F], gathered at window ids
    tables_tile: Sequence[jnp.ndarray],  # each [N, F], gathered at tile ids
    edge_streams: Sequence[jnp.ndarray],  # each [E, F], plan edge order
    block_offsets: jnp.ndarray,  # [T, MB] int32
    nblocks: jnp.ndarray,  # [T] int32
    sid_all: jnp.ndarray,  # [T, MB, TE] int32 tile-local aligned ids (-1 pad)
    lot_all: jnp.ndarray,  # [T, MB, TE] int32 window-local other ids (-1 pad)
    win_start: jnp.ndarray,  # [T] int32
    n_node: int,
    meta: Tuple[int, ...],  # (TN, TE, MB, required, W)
    combine: Callable,  # (win_vals, tile_vals, edge_vals) -> list of [TE, TF]
    reduces: Sequence[Tuple[str, int]],  # ("sum"|"min"|"max"|"wsum", expr i)
    out_dtype=jnp.float32,
    tile_features: int = 256,
    empty_value: float = 0.0,
    scan_dtype=jnp.float32,
    interpret: bool = False,
) -> List[jnp.ndarray]:
    """One fused pass over the edges of each node tile.  Returns one
    [n_node, F] array per entry of ``reduces``.

    ``combine`` is traced INSIDE the kernel on fp32 [TE, TF] blocks; rows
    whose aligned id is -1 (padding / tile over-cover) see zeros from both
    gathers and arbitrary edge-stream rows -- combine must stay finite on
    them (they are excluded from every reduction).

    ``("wsum", i)`` reduces expression i onto the WINDOW rows (the
    NON-aligned endpoint) instead of the tile rows: per-tile [W, TF]
    partials via the transposed window one-hot, combined across
    overlapping tile windows on the XLA side (:func:`_combine_window`).
    This turns "reduce the same per-edge value by the OTHER endpoint"
    (e.g. the d/d h_j cotangent of a receiver-plan pass) into one extra
    MXU pass instead of a whole second kernel on the mirrored plan with
    all tables re-gathered through the window (the r03 ct_tj hot spot,
    profiling/BYTES_pna_r3.json).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tables_win = list(tables_win)
    tables_tile = list(tables_tile)
    edge_streams = list(edge_streams)
    n_wt, n_tt, n_es = len(tables_win), len(tables_tile), len(edge_streams)
    TN, TE, MB = meta[0], meta[1], meta[2]
    W = int(meta[4])
    # scan-step bound: segments are contiguous runs of one endpoint, so
    # doubling steps stop at the plan's max segment length (meta[5], a
    # power of two) instead of log2(TE) — see segment_minmax_pallas_raw
    max_scan = TE
    if len(meta) > 5 and meta[5] is not None:
        max_scan = min(TE, int(meta[5]))
    n_tiles = (n_node + TN - 1) // TN
    shapes = [a.shape for a in tables_win + tables_tile + edge_streams]
    F = shapes[0][1]
    assert all(s[1] == F for s in shapes), f"feature dims differ: {shapes}"
    reduces = tuple(reduces)
    node_idx = [k for k, (op, _) in enumerate(reduces) if op != "wsum"]
    win_idx = [k for k, (op, _) in enumerate(reduces) if op == "wsum"]
    node_reduces = tuple(reduces[k] for k in node_idx)
    win_reduces = tuple(reduces[k] for k in win_idx)
    R = len(node_reduces)
    Rw = len(win_reduces)
    assert R + Rw >= 1
    win_b = max((a.dtype.itemsize for a in tables_win), default=4)
    es_b = max((a.dtype.itemsize for a in edge_streams), default=4)
    TF = _pick_tf(
        F, tile_features, n_wt, W, n_es, TE, R, (win_b, es_b), Rw=Rw
    )
    assert TF is not None, f"F={F} must be a multiple of 128"
    assert n_node % TN == 0 and W % 8 == 0 and W <= n_node
    if n_es:
        E = edge_streams[0].shape[0]
        if not (len(meta) > 3 and E >= meta[3]):
            edge_streams = [
                jnp.concatenate([d, jnp.zeros((TE, F), d.dtype)])
                for d in edge_streams
            ]

    any_mm = any(op in ("min", "max") for op, _ in node_reduces)

    def kernel(off_ref, nb_ref, win_ref, sid_ref, lot_ref, *rest):
        tile_refs = rest[:n_tt]
        win_hbm = rest[n_tt : n_tt + n_wt]
        es_hbm = rest[n_tt + n_wt : n_tt + n_wt + n_es]
        n_out = (1 if R else 0) + (1 if Rw else 0)
        outs_ = rest[n_tt + n_wt + n_es : n_tt + n_wt + n_es + n_out]
        o_ref = outs_[0] if R else None
        ow_ref = outs_[-1] if Rw else None
        scr = rest[n_tt + n_wt + n_es + n_out :]
        win_scr = scr[:n_wt]
        es_scr = scr[n_wt : n_wt + n_es]
        sems = scr[n_wt + n_es :]
        sem_win = sems[0] if n_wt else None
        sem_es = sems[-1] if n_es else None

        f = pl.program_id(0)
        t = pl.program_id(1)
        nb = nb_ref[t]

        for r, (op, _) in enumerate(node_reduces):
            o_ref[:, r * TF : (r + 1) * TF] = jnp.full(
                (TN, TF),
                empty_value if op in ("min", "max") else 0.0,
                o_ref.dtype,
            )
        if Rw:
            ow_ref[:, :] = jnp.zeros((W, Rw * TF), ow_ref.dtype)

        def win_dma(i):
            start = pl.multiple_of(win_ref[t], 8)
            return pltpu.make_async_copy(
                win_hbm[i].at[pl.ds(start, W), pl.ds(f * TF, TF)],
                win_scr[i],
                sem_win.at[i],
            )

        def edma(i, bb, slot):
            st = pl.multiple_of(off_ref[t, bb], 8)
            return pltpu.make_async_copy(
                es_hbm[i].at[pl.ds(st, TE), pl.ds(f * TF, TF)],
                es_scr[i].at[slot],
                sem_es.at[i, slot],
            )

        def dot_red(a, v):  # [TN, TE] x [TE, TF] -> [TN, TF]
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_sel(a, v):  # [K, TE] x [K, TF] -> [TE, TF]
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def sel_exact(oh, vals, dot):
            """Gather/select through a 0/1 matrix, exact for any input:
            bf16 passes directly, fp32 via a 3-way bf16 split (hi + mid +
            lo covers all 24 mantissa bits; one-hot rows sum one term)."""
            if vals.dtype == jnp.bfloat16:
                return dot(oh, vals)
            v = vals.astype(jnp.float32)
            hi = v.astype(jnp.bfloat16)
            rem = v - hi.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo = rem - mid.astype(jnp.float32)
            return dot(oh, hi) + dot(oh, mid) + dot(oh, lo)

        def sum_update(oh, v):
            """Segment-sum MXU pass; bf16 out -> one pass, fp32 out -> a
            hi/lo split (~2^-18 relative, same as segment_sum_pallas)."""
            if out_dtype == jnp.bfloat16:
                return dot_red(oh, v.astype(jnp.bfloat16))
            hi = v.astype(jnp.bfloat16)
            lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return dot_red(oh, hi) + dot_red(oh, lo)

        @pl.when(nb > 0)
        def _run():
            for i in range(n_wt):
                win_dma(i).start()
            for i in range(n_es):
                edma(i, 0, 0).start()
            for i in range(n_wt):
                win_dma(i).wait()

            def block_ctx(b):
                """Gathered values + masks for edge block b of tile t."""
                sid = sid_ref[0, pl.ds(b, 1), :]  # [1, TE]
                lot = lot_ref[0, pl.ds(b, 1), :]
                rows_tn = jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0)
                oh_tile = (rows_tn == sid).astype(jnp.float32)
                rows_w = jax.lax.broadcasted_iota(jnp.int32, (W, TE), 0)
                oh_win = (rows_w == lot).astype(jnp.float32)
                wv = [
                    sel_exact(oh_win, win_scr[i][:], dot_sel)
                    for i in range(n_wt)
                ]
                tv = [
                    sel_exact(oh_tile, tile_refs[i][:], dot_sel)
                    for i in range(n_tt)
                ]
                ev = [
                    es_scr[i][b % 2].astype(jnp.float32) for i in range(n_es)
                ]
                sid_col = valid = None
                if any_mm:
                    # column copy of sid without a (1,TE)->(TE,1) reshape
                    # (Mosaic can't): contract the one-hot against row+1
                    rows1 = (
                        jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + 1
                    ).astype(jnp.bfloat16)  # values <= TN+1: bf16-exact
                    sid_col = (
                        jax.lax.dot_general(
                            oh_tile.astype(jnp.bfloat16),
                            rows1,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        - 1.0
                    )  # [TE, 1]; -1 where row invalid
                    valid = sid_col >= 0.0
                return oh_tile, oh_win, wv, tv, ev, sid_col, valid

            def scan_minmax(v, sid_col, valid):
                """Segmented inclusive max/min scans; extrema sit at each
                within-block segment's last row (the segment_minmax scan
                of ops/pallas_segment.py).  Runs in ``scan_dtype``:
                callers whose values are bf16-rounded (the bf16 training
                path) set bf16 and halve the VPU traffic of the 2*log TE
                shift/compare/select steps — comparisons stay exact."""
                sd = scan_dtype
                big = jnp.asarray(_BIG, sd)
                vv = v.astype(sd)
                xmx = jnp.where(valid, vv, -big)
                xmn = jnp.where(valid, vv, big)
                s = 1
                while s < max_scan:
                    pad_sid = jnp.full((s, 1), -2.0, jnp.float32)
                    sid_shift = jnp.concatenate([pad_sid, sid_col[:-s]], 0)
                    same = (sid_shift == sid_col) & valid
                    sh_mx = jnp.concatenate(
                        [jnp.full((s, TF), -_BIG, sd), xmx[:-s]], 0
                    )
                    xmx = jnp.maximum(xmx, jnp.where(same, sh_mx, -big))
                    sh_mn = jnp.concatenate(
                        [jnp.full((s, TF), _BIG, sd), xmn[:-s]], 0
                    )
                    xmn = jnp.minimum(xmn, jnp.where(same, sh_mn, big))
                    s *= 2
                sid_next = jnp.concatenate(
                    [sid_col[1:], jnp.full((1, 1), -3.0, jnp.float32)], 0
                )
                end_col = (sid_col != sid_next) & valid
                return xmx, xmn, end_col

            def body(b, accs):
                @pl.when(b + 1 < nb)
                def _pf():
                    for i in range(n_es):
                        edma(i, b + 1, (b + 1) % 2).start()

                for i in range(n_es):
                    edma(i, b, b % 2).wait()
                oh_tile, oh_win, wv, tv, ev, sid_col, valid = block_ctx(b)
                exprs = combine(wv, tv, ev)
                scans = {}
                done = {}
                new = []
                for (op, ei), acc in zip(node_reduces, accs[:R]):
                    v = exprs[ei]
                    if op == "sum":
                        new.append(acc + sum_update(oh_tile, v))
                        continue
                    if op in ("mincnt", "maxcnt"):
                        # tie count of the FINAL segment extremum, merged
                        # online: when this block's extremum beats the
                        # running one the count resets, on an exact tie
                        # it adds (value op for the same ei must precede
                        # in ``reduces`` — see fused_minmax).  The block
                        # extremum comes back to rows via ONE one-hot
                        # matmul of the already-reduced out_b (every
                        # valid row's node has presence in this block),
                        # not a second reverse scan.
                        base = "min" if op == "mincnt" else "max"
                        old_v, new_v, out_b, has = done[(base, ei)]
                        bext = sel_exact(
                            oh_tile, out_b.astype(scan_dtype), dot_sel
                        )
                        ind = (
                            valid
                            & (v.astype(scan_dtype) == bext.astype(scan_dtype))
                        ).astype(jnp.float32)
                        cnt_b = dot_red(oh_tile, ind)
                        keep = (old_v == new_v).astype(jnp.float32)
                        take = jnp.where(
                            has & (out_b == new_v), 1.0, 0.0
                        )
                        new.append(acc * keep + cnt_b * take)
                        continue
                    if ei not in scans:
                        xmx_, xmn_, end_ = scan_minmax(v, sid_col, valid)
                        # segment-presence is shared by min and max: one
                        # MXU pass, not one per op
                        h_ = dot_red(oh_tile, end_.astype(jnp.float32))
                        scans[ei] = (xmx_, xmn_, end_, h_ > 0.5)
                    xmx, xmn, end_col, has = scans[ei]
                    x = xmx if op == "max" else xmn
                    # only end rows carry nonzero values; the one-hot
                    # matmul then sums exactly one term per (node, block)
                    out_b = sel_exact(
                        oh_tile, jnp.where(end_col, x, 0.0), dot_red
                    )
                    m = jnp.maximum if op == "max" else jnp.minimum
                    upd = jnp.where(has, m(acc, out_b), acc)
                    done[(op, ei)] = (acc, upd, out_b, has)
                    new.append(upd)
                for (_, ei), acc in zip(win_reduces, accs[R:]):
                    # reduce onto the WINDOW rows: same one-hot, other side
                    new.append(acc + sum_update(oh_win, exprs[ei]))
                return tuple(new)

            init_vals = {"sum": 0.0, "max": -_BIG, "min": _BIG,
                         "wsum": 0.0, "mincnt": 0.0, "maxcnt": 0.0}
            accs = jax.lax.fori_loop(
                0, nb, body,
                tuple(
                    jnp.full((TN, TF), init_vals[op], jnp.float32)
                    for op, _ in node_reduces
                )
                + tuple(
                    jnp.zeros((W, TF), jnp.float32) for _ in win_reduces
                ),
            )
            for r, ((op, _), a) in enumerate(zip(node_reduces, accs[:R])):
                if op == "max":
                    a = jnp.where(a > -_BIG / 2, a, empty_value)
                if op == "min":
                    a = jnp.where(a < _BIG / 2, a, empty_value)
                o_ref[:, r * TF : (r + 1) * TF] = a.astype(o_ref.dtype)
            for rw, a in enumerate(accs[R:]):
                ow_ref[:, rw * TF : (rw + 1) * TF] = a.astype(ow_ref.dtype)

    grid = (F // TF, n_tiles)
    in_specs = (
        [
            pl.BlockSpec((1, MB, TE), lambda f, t, *_: (t, 0, 0)),  # sid
            pl.BlockSpec((1, MB, TE), lambda f, t, *_: (t, 0, 0)),  # lot
        ]
        + [
            pl.BlockSpec((TN, TF), lambda f, t, *_: (t, f))
            for _ in range(n_tt)
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_wt + n_es)]
    )
    scratch = [pltpu.VMEM((W, TF), a.dtype) for a in tables_win] + [
        pltpu.VMEM((2, TE, TF), a.dtype) for a in edge_streams
    ]
    if n_wt:
        scratch.append(pltpu.SemaphoreType.DMA((n_wt,)))
    if n_es:
        scratch.append(pltpu.SemaphoreType.DMA((n_es, 2)))
    out_specs = []
    out_shape = []
    if R:
        out_specs.append(pl.BlockSpec((TN, R * TF), lambda f, t, *_: (t, f)))
        out_shape.append(jax.ShapeDtypeStruct((n_node, R * F), out_dtype))
    if Rw:
        out_specs.append(pl.BlockSpec((W, Rw * TF), lambda f, t, *_: (t, f)))
        out_shape.append(
            jax.ShapeDtypeStruct((n_tiles * W, Rw * F), out_dtype)
        )
    if len(out_specs) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    else:
        out_specs, out_shape = tuple(out_specs), tuple(out_shape)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # block_offsets, nblocks, win_start
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(
        block_offsets, nblocks, win_start, sid_all, lot_all,
        *tables_tile, *tables_win, *edge_streams,
    )
    results: List[Optional[jnp.ndarray]] = [None] * len(reduces)
    if R:
        out_node = out[0] if Rw else out
        packed = out_node.reshape(n_node, F // TF, R, TF)
        node_res = [
            packed[:, :, r, :].reshape(n_node, F) for r in range(R)
        ]
        for k, r in zip(node_idx, node_res):
            results[k] = r
    if Rw:
        out_w = out[-1] if R else out
        wpacked = out_w.reshape(n_tiles * W, F // TF, Rw, TF)
        for rw, k in enumerate(win_idx):
            flat = wpacked[:, :, rw, :].reshape(n_tiles * W, F)
            results[k] = _combine_window(
                flat, win_start, n_node, TN, W
            ).astype(out_dtype)
    return results


def edge_gather_raw(
    table: jnp.ndarray,  # [N, F]
    win_start: jnp.ndarray,  # [NB] int32
    lot: jnp.ndarray,  # [NB, TE] int32 window-local endpoint ids (-1 masked)
    n_edge: int,  # rows of the output (may be < NB*TE)
    Wg: int,  # static window width (multiple of 8)
    interpret: bool = False,
) -> jnp.ndarray:
    """Masked node->edge gather as one one-hot MXU matmul per edge block:

        out[e] = table[endpoint[e]] if edge e is real else 0

    XLA lowers a row gather to ~17 ns/row on TPU regardless of width
    (~4.5 ms at E=262k); here each block of TE consecutive batch-order
    edges reads its bounded node window ([Wg, TF] DMA) and selects rows
    with a [Wg, TE] one-hot matmul -- exact for any input (bf16 direct,
    fp32 via the 3-way bf16 split).  Blocks tile the edge axis disjointly,
    so there is no cross-block write overlap.  Replaces the reference's
    ``x[edge_index]`` gathers (PyG propagate collect) on the TPU path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, F = table.shape
    NB, TE = lot.shape
    # Mosaic wants the last two block dims (8, 128)-divisible or equal to
    # the array dims: lift lot to [NB, 1, TE] so the block is (1, 1, TE)
    lot = lot.reshape(NB, 1, TE)
    fp32 = table.dtype == jnp.float32
    itemsize = jnp.dtype(table.dtype).itemsize
    assert F % 128 == 0, f"F={F} must be a multiple of 128"
    TF = None
    for t in (512, 256, 128):
        # full footprint per f-block: window scratch (x4 live copies for
        # the fp32 3-way-split temporaries vf/hi/rem/mid/lo), the
        # [Wg, TE] bf16 one-hot, and the fp32 accum/output block —
        # advisor r04: the old (win + TE*4)*TF bound under-counted and
        # could blow Mosaic's scoped budget at Wg near the cap with fp32
        win_copies = 4 if fp32 else 1
        vmem = (
            Wg * t * itemsize * win_copies
            + Wg * TE * 2
            + TE * t * 4 * 2
        )
        if F % t == 0 and vmem <= _VMEM_BUDGET:
            TF = t
            break
    assert TF is not None, (
        f"edge_gather VMEM budget exceeded at every feature tile "
        f"(F={F}, Wg={Wg}, TE={TE}, dtype={table.dtype})"
    )
    assert Wg % 8 == 0 and Wg <= N

    def kernel(win_ref, lot_ref, tbl_hbm, o_ref, win_scr, sem):
        f = pl.program_id(0)
        b = pl.program_id(1)
        start = pl.multiple_of(win_ref[b], 8)
        dma = pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(start, Wg), pl.ds(f * TF, TF)], win_scr, sem
        )
        dma.start()
        rows_w = jax.lax.broadcasted_iota(jnp.int32, (Wg, TE), 0)
        oh = (rows_w == lot_ref[0, 0, :]).astype(jnp.bfloat16)

        def dot(a, v):  # [Wg, TE]^T x [Wg, TF] -> [TE, TF]
            return jax.lax.dot_general(
                a, v.astype(jnp.bfloat16),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        dma.wait()
        v = win_scr[:]
        if not fp32:
            out = dot(oh, v)
        else:
            vf = v.astype(jnp.float32)
            hi = vf.astype(jnp.bfloat16)
            rem = vf - hi.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo = rem - mid.astype(jnp.float32)  # bf16-exact remainder
            out = dot(oh, hi) + dot(oh, mid) + dot(oh, lo.astype(jnp.bfloat16))
        o_ref[:, :] = out.astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(F // TF, NB),
            in_specs=[
                pl.BlockSpec((1, 1, TE), lambda f, b, *_: (b, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TE, TF), lambda f, b, *_: (b, f)),
            scratch_shapes=[
                pltpu.VMEM((Wg, TF), table.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NB * TE, F), table.dtype),
        interpret=interpret,
    )(win_start, lot, table)
    return out[:n_edge] if n_edge != NB * TE else out


def has_edge_gather(graph) -> bool:
    return (
        graph.agg_meta is not None
        and len(graph.agg_meta) > 6
        and graph.agg_meta[6] is not None
        and graph.eg_snd_lot is not None
        and graph.eg_rcv_lot is not None
        and jax.default_backend() == "tpu"
    )


def edge_gather(graph, table: jnp.ndarray, at: str = "senders",
                interpret: bool = False) -> jnp.ndarray:
    """table[senders|receivers] with masked (padding) edges reading 0,
    through :func:`edge_gather_raw`.  Raw op only -- AD wiring lives in
    ops/aggregate.py's linear_call pairs."""
    assert at in ("senders", "receivers")
    win, lot = (
        (graph.eg_snd_win, graph.eg_snd_lot)
        if at == "senders"
        else (graph.eg_rcv_win, graph.eg_rcv_lot)
    )
    return edge_gather_raw(
        table, win, lot, graph.n_edge, int(graph.agg_meta[6]),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# Plan plumbing
# ---------------------------------------------------------------------------


def _rcv_plan(g):
    return (g.agg_rcv_off, g.agg_rcv_nb, g.agg_rcv_sid, g.agg_rcv_lot,
            g.agg_rcv_win)


def _snd_plan(g):
    return (g.agg_snd_off, g.agg_snd_nb, g.agg_snd_sid, g.agg_snd_lot,
            g.agg_snd_win)


def has_window_plans(graph) -> bool:
    return (
        graph.agg_meta is not None
        and len(graph.agg_meta) > 4
        and graph.agg_meta[4] is not None
        and graph.agg_rcv_lot is not None
        and graph.agg_snd_lot is not None
        and jax.default_backend() == "tpu"
    )


def _call(graph, plan, *, interpret=False, **kw):
    off, nb, sid, lot, win = plan
    return window_gather_reduce_raw(
        block_offsets=off, nblocks=nb, sid_all=sid, lot_all=lot,
        win_start=win, n_node=graph.n_node, meta=graph.agg_meta,
        interpret=interpret, **kw,
    )


def segsum_senders_raw(graph, data: jnp.ndarray, interpret: bool = False):
    """sum_{e: snd[e]=n} data[e] for BATCH-ORDER edge data, without the
    edge->edge permutation gather of the sender-sorted plan (an XLA row
    gather, ~17 ns/row): one "wsum" pass on the receiver plan reduces each
    edge block onto its window rows (= senders) via the transposed window
    one-hot, then the XLA overlap combine.  Raw linear op -- AD pairs live
    in ops/aggregate.py."""
    (out,) = _call(
        graph, _rcv_plan(graph),
        tables_win=[], tables_tile=[], edge_streams=[data],
        combine=lambda wv, tv, ev: [ev[0]],
        reduces=(("wsum", 0),),
        out_dtype=data.dtype, interpret=interpret,
    )
    return out


# ---------------------------------------------------------------------------
# Linear op: gather at one endpoint -> segment-sum at the other
# ---------------------------------------------------------------------------


def gather_segsum(
    graph, table: jnp.ndarray, src: str = "senders", interpret: bool = False
):
    """sum_{e: rcv[e]=n} table[snd[e]]  (src="senders"), or the mirrored
    sender-side sum (src="receivers") -- the GIN/SAGE/MFC message+aggregate
    collapsed into one kernel with NO [E, F] intermediate.  Linear, so the
    transpose is the same kernel on the opposite plan; composes under AD
    to any order (grad-of-grad safe).

    With adjacency blocks on the batch the call runs the dense per-tile
    adjacency matmul (:func:`adjacency_segsum_raw`) — one MXU pass per
    tile each direction; otherwise the generic windowed block kernel."""
    from jax.custom_derivatives import linear_call

    assert src in ("senders", "receivers")
    if graph.agg_rcv_adj is not None and graph.agg_snd_adj is not None:
        fadj, fwin = (
            (graph.agg_rcv_adj, graph.agg_rcv_win)
            if src == "senders"
            else (graph.agg_snd_adj, graph.agg_snd_win)
        )
        tadj, twin = (
            (graph.agg_snd_adj, graph.agg_snd_win)
            if src == "senders"
            else (graph.agg_rcv_adj, graph.agg_rcv_win)
        )

        def fwd_a(res, tbl):
            return adjacency_segsum_raw(
                tbl, fadj, fwin, graph.n_node, graph.agg_meta,
                interpret=interpret,
            )

        def trans_a(res, ct):
            return adjacency_segsum_raw(
                ct, tadj, twin, graph.n_node, graph.agg_meta,
                interpret=interpret,
            )

        return linear_call(fwd_a, trans_a, (), table)

    fplan = _rcv_plan(graph) if src == "senders" else _snd_plan(graph)
    tplan = _snd_plan(graph) if src == "senders" else _rcv_plan(graph)

    def fwd(res, tbl):
        return _call(
            graph, fplan, tables_win=[tbl], tables_tile=[], edge_streams=[],
            combine=lambda wv, tv, ev: [wv[0]], reduces=(("sum", 0),),
            out_dtype=tbl.dtype, interpret=interpret,
        )[0]

    def trans(res, ct):
        return _call(
            graph, tplan, tables_win=[ct], tables_tile=[], edge_streams=[],
            combine=lambda wv, tv, ev: [wv[0]], reduces=(("sum", 0),),
            out_dtype=ct.dtype, interpret=interpret,
        )[0]

    return linear_call(fwd, trans, (), table)


# ---------------------------------------------------------------------------
# Fused segment extrema of h = h_i[rcv] + h_j[snd] (+ edge term)
# ---------------------------------------------------------------------------


def _round(v, dt):
    """Quantize h to the compute dtype: ALL comparisons -- extrema, tie
    counts, tie routing -- happen on the rounded value, so primal, JVP and
    transpose agree bitwise."""
    return v.astype(dt).astype(jnp.float32)


def fused_minmax(
    graph, h_i: jnp.ndarray, h_j: jnp.ndarray,
    edge_term: Optional[jnp.ndarray] = None, interpret: bool = False,
):
    """(min h, max h) at receivers for h[e] = h_i[rcv[e]] + h_j[snd[e]]
    (+ edge_term[e]) WITHOUT h ever existing in HBM; [N, F] each.

    AD structure (composes under grad-of-grad, ops/aggregate.py preamble):
    custom_jvp whose tangent map is t = segsum(w * tt) with tie-split
    weights w.  The extrema are piecewise linear in the inputs, so w is
    locally constant -- every residual of the tangent linear_call is
    stop_gradient-ed, which is the exact a.e. second derivative (zero),
    and keeps outer higher-order tangents away from the raw kernels
    (linear_call residuals must be tangent-free)."""
    from hydragnn_tpu.ops.slot_minmax import _has_slots, fused_minmax_slots

    if edge_term is None and _has_slots(graph):
        # no edge term: the extremum decomposes as h_i + extremum(h_j)
        # and runs in NODE space on the neighbor-slot plan — Dmax one-hot
        # MXU gathers instead of edge-stream Hillis-Steele scans (the r04
        # PNA hot spot, 77% of the step in the two scan kernels)
        return fused_minmax_slots(graph, h_i, h_j, interpret=interpret)

    dt = h_i.dtype
    rcv = _rcv_plan(graph)
    has_e = edge_term is not None

    def _h(wv, tv, ev):
        # h_j through the window, h_i through the tile (receiver-aligned)
        v = wv[0] + tv[0]
        if has_e:
            v = v + ev[0]
        return _round(v, dt)

    @jax.custom_jvp
    def _mm(*args):
        # extrema AND tie counts from ONE kernel pass: the counts merge
        # online with the extrema accumulators (op "mincnt"/"maxcnt"),
        # replacing the r03 separate ties kernel (2.6 ms/layer on the
        # bench PNA, profiling/BYTES_pna.json).  fp32 out (counts exceed
        # bf16's exact-integer range on dense graphs); extrema values are
        # dt-rounded so the cast back is exact.
        h_i_, h_j_ = args[0], args[1]
        et = [args[2]] if has_e else []
        outs = _call(
            graph, rcv,
            tables_win=[h_j_], tables_tile=[h_i_], edge_streams=et,
            combine=lambda wv, tv, ev: [_h(wv, tv, ev)],
            reduces=(("min", 0), ("max", 0),
                     ("mincnt", 0), ("maxcnt", 0)),
            out_dtype=jnp.float32,
            # NOTE: bf16 scan storage trips a Mosaic relayout bug on v5e
            # (i1 mask tiling vs 16-row bf16 tiles, jax github-style
            # "vector<512x128xi1>" relayout error) — scans stay fp32
            interpret=interpret,
        )
        return (outs[0].astype(dt), outs[1].astype(dt),
                outs[2], outs[3])  # (min, max, ties_min, ties_max)

    def _mm_jvp(primals, tangents):
        from jax.custom_derivatives import linear_call

        sg = jax.lax.stop_gradient
        # linear_call requires every linear operand to be an undefined
        # primal at transpose time; an instantiated zero tangent (caller
        # differentiates wrt a SUBSET of the inputs) is a constant and
        # trips JAX's _linear_call_transpose_rule assert.  With
        # symbolic_zeros=True we see which tangents exist, pass ONLY
        # those through linear_call, and synthesize the zeros inside the
        # callbacks (a constant inside the traced body is fine).
        present = tuple(
            not isinstance(t, jax.custom_derivatives.SymbolicZero)
            for t in tangents
        )
        mn, mx, ties_mn, ties_mx = _mm(*primals)
        h_i_, h_j_ = sg(primals[0]), sg(primals[1])
        et = sg(primals[2]) if has_e else None
        mn_c, mx_c = sg(mn), sg(mx)

        # fp32 inverse-tie weights from the primal's fused tie counts
        inv_mn = 1.0 / jnp.maximum(sg(ties_mn), 1.0)
        inv_mx = 1.0 / jnp.maximum(sg(ties_mx), 1.0)

        res = (h_i_, h_j_, mn_c, mx_c, inv_mn, inv_mx) + (
            (et,) if has_e else ()
        )

        def _expand(res_, tans):
            """Full (ti, tj[, te]) tuple: present tangents from ``tans``
            (linear operands), absent ones as locally-created zeros."""
            prims = (res_[0], res_[1]) + ((res_[6],) if has_e else ())
            it = iter(tans)
            return tuple(
                next(it) if p else jnp.zeros_like(pr)
                for p, pr in zip(present, prims)
            )

        def tfwd(res_, tans):
            h_i_, h_j_, mn_, mx_, iv_mn, iv_mx = res_[:6]
            et_ = [res_[6]] if has_e else []
            full = _expand(res_, tans)
            ti, tj = full[0], full[1]
            te = [full[2]] if has_e else []

            def comb(wv, tv, ev):
                h = _h(wv[:1], tv[:1], ev[:1])
                tt = wv[1] + tv[1]
                if has_e:
                    tt = tt + ev[1]
                w_mn = jnp.where(h == tv[2], tv[4], 0.0)
                w_mx = jnp.where(h == tv[3], tv[5], 0.0)
                return [w_mn * tt, w_mx * tt]

            outs = _call(
                graph, rcv,
                tables_win=[h_j_, tj],
                tables_tile=[h_i_, ti, mn_, mx_, iv_mn, iv_mx],
                edge_streams=et_ + te,
                combine=comb,
                reduces=(("sum", 0), ("sum", 1)),
                out_dtype=dt, interpret=interpret,
            )
            return (outs[0], outs[1])  # (t_min, t_max)

        def ttrans(res_, cts):
            h_i_, h_j_, mn_, mx_, iv_mn, iv_mx = res_[:6]
            et_ = [res_[6]] if has_e else []
            cC, cD = cts  # wrt (min, max) tangents
            # fold the inverse-tie weights into the cotangents at NODE
            # level so the sender-plan pass needs 5 window tables, not 7.
            # Kept in the COMPUTE dtype: under bf16 training a fp32 table
            # would cost a 3-way-split select (3 MXU passes instead of 1,
            # profiling/BYTES_pna_r3.json ct_tj hot spot)
            tn_ = (iv_mn * cC.astype(jnp.float32)).astype(dt)
            tx_ = (iv_mx * cD.astype(jnp.float32)).astype(dt)

            def ct_h(h, mn_r, mx_r, c, d):
                return jnp.where(h == mn_r, c, 0.0) + jnp.where(
                    h == mx_r, d, 0.0
                )

            # d/d ti needs NO kernel: h = h_i[rcv] + h_j[snd] shifts 1:1
            # with h_i[n] on every incoming edge, so the receiver
            # segment-sum of the tie-split weights telescopes to exactly
            # ct (ties x 1/ties) wherever the segment is non-empty.
            deg_ok = (graph.rcv_count > 0)[:, None]
            ct_ti = jnp.where(
                deg_ok, cC.astype(jnp.float32) + cD.astype(jnp.float32), 0.0
            ).astype(dt)
            # d/d tj in ONE receiver-plan kernel: per-edge ct_h with all
            # five tables on the cheap TILE side, reduced onto the window
            # rows (= senders) via the transposed window one-hot ("wsum")
            # + the XLA overlap combine.  Replaces the r03 two-kernel
            # form whose sender-plan leg re-gathered all five tables
            # through the 6x-wider window (profiling/BYTES_pna_r3.json:
            # 38% of the PNA step).
            (ct_tj,) = _call(
                graph, rcv,
                tables_win=[h_j_],
                tables_tile=[h_i_, mn_, mx_, tn_, tx_],
                edge_streams=et_,
                combine=lambda wv, tv, ev: [
                    ct_h(_h(wv[:1], tv[:1], ev), *tv[1:])
                ],
                reduces=(("wsum", 0),),
                out_dtype=dt, interpret=interpret,
            )
            if not has_e:
                return tuple(
                    c for c, p in zip((ct_ti, ct_tj), present) if p
                )
            # edge-tangent cotangent = the per-edge ct_h, needed in edge
            # order: unavoidable [E, *] traffic, but through the existing
            # scatter-free gathers (only reached when edge features exist)
            from hydragnn_tpu.ops.aggregate import gather_nodes

            tabs_r = jnp.concatenate([mn_, mx_, tn_, tx_], axis=-1)
            g_r = gather_nodes(graph, tabs_r, "receivers")
            hi_r = gather_nodes(graph, h_i_, "receivers")
            hj_s = gather_nodes(graph, h_j_, "senders")
            h_e = _round(
                hi_r.astype(jnp.float32)
                + hj_s.astype(jnp.float32)
                + res_[6].astype(jnp.float32),
                dt,
            )
            parts = jnp.split(g_r.astype(jnp.float32), 4, axis=-1)
            ct_e = ct_h(h_e, *parts)
            ct_e = jnp.where(graph.edge_mask[:, None], ct_e, 0.0)
            cts_all = (ct_ti, ct_tj, ct_e.astype(dt))
            return tuple(c for c, p in zip(cts_all, present) if p)

        prim_out = (mn, mx, ties_mn, ties_mx)
        zt = (jnp.zeros_like(ties_mn), jnp.zeros_like(ties_mx))
        if not any(present):
            return prim_out, (
                jnp.zeros_like(mn), jnp.zeros_like(mx),
            ) + zt
        tans = tuple(t for t, p in zip(tangents, present) if p)
        t_out = linear_call(tfwd, ttrans, res, tans)
        # tie counts are piecewise constant: zero tangent a.e.
        return prim_out, tuple(t_out) + zt

    _mm.defjvp(_mm_jvp, symbolic_zeros=True)

    args = (h_i, h_j) + ((edge_term,) if has_e else ())
    return _mm(*args)[:2]


# ---------------------------------------------------------------------------
# PNA fused aggregation: (sum, sumsq, min, max) of h = h_i[rcv] + h_j[snd]
# (+ edge term)
# ---------------------------------------------------------------------------


def fused_pna_aggregate(
    graph, h_i: jnp.ndarray, h_j: jnp.ndarray,
    edge_term: Optional[jnp.ndarray] = None, interpret: bool = False,
):
    """(sum h, sum h^2, min h, max h) at receivers; each [N, F].

    sum and sumsq DECOMPOSE algebraically over the receiver segments --
    sum  = deg * h_i + S(h_j) (+ A(e))
    sumsq = deg * h_i^2 + S(h_j^2) + 2 h_i * S(h_j) (+ cross/e^2 terms) --
    where S is the fused linear gather_segsum and A the masked edge
    aggregate: every piece is either node-level elementwise or a linear
    op with constant residuals, so this path is differentiable to ANY
    order with no custom rules at all.  min/max run through fused_minmax
    (custom_jvp with a.e.-exact stop-gradient residuals)."""
    deg = jnp.maximum(graph.rcv_count, 0.0).astype(h_i.dtype)[:, None]
    s_j = gather_segsum(graph, h_j, "senders", interpret=interpret)
    s2_j = gather_segsum(graph, h_j * h_j, "senders", interpret=interpret)
    s = deg * h_i + s_j
    s2 = deg * (h_i * h_i) + s2_j + 2.0 * h_i * s_j
    if edge_term is not None:
        from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes

        a_e = aggregate(graph, edge_term, "sum", "receivers")
        a_e2 = aggregate(graph, edge_term * edge_term, "sum", "receivers")
        hj_e = gather_nodes(graph, h_j, "senders") * edge_term
        a_je = aggregate(graph, hj_e, "sum", "receivers")
        s = s + a_e
        s2 = s2 + a_e2 + 2.0 * (h_i * a_e + a_je)
    mn, mx = fused_minmax(graph, h_i, h_j, edge_term, interpret=interpret)
    return s, s2, mn, mx
