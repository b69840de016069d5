"""Pallas TPU kernel: sorted-segment sum (the core SpMM of message
aggregation).

Replaces XLA's scatter-based lowering (~13% of HBM bandwidth on v5e) for
edges SORTED BY RECEIVER (the batcher's layout, data/pipeline.py
``sort_edges_by_receiver``).

Design:
  * host-side binning: node rows are tiled (TN rows); because edges are
    sorted by receiver, each node tile owns a contiguous edge range,
    covered by edge blocks of TE rows (block offsets scalar-prefetched);
  * grid (feature_block, node_tile, edge_block) -- edge blocks innermost so
    the [TN, TF] output tile stays resident in VMEM and accumulates across
    its edge blocks (consecutive output revisiting);
  * per block, the segment reduction is a [TN, TE] x [TE, TF] one-hot
    matmul on the MXU (onehot[r, e] = (receiver_local[e] == r)).  Extra
    FLOPs = 2*TN per input element -- at TN=128 that is ~1.7e10 FLOP for a
    262k x 256 aggregation, well under the MXU's capacity relative to the
    ~270 MB of HBM traffic this op is bound by.  No scatter anywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def plan_segment_tiles(
    receivers: np.ndarray,  # [E] sorted (host numpy)
    edge_mask: np.ndarray,
    n_node: int,
    tile_nodes: int = 128,
    tile_edges: int = 512,
    fixed_max_blocks: Optional[int] = None,
) -> dict:
    """Host-side plan: per node tile, the contiguous (sorted) edge range is
    covered by ceil(count/TE) blocks starting at the range start.  Blocks
    may overlap the neighbouring tile's edges; the kernel masks rows whose
    receiver falls outside the tile, so overlap is harmless."""
    E = receivers.shape[0]
    n_tiles = (n_node + tile_nodes - 1) // tile_nodes
    # masked (padding) edges sit at the tail of the sorted edge array; map
    # them beyond every tile so no block budget is spent covering them
    rec = np.where(edge_mask, receivers.astype(np.int64), 2 * n_node)
    tile_of_edge = rec // tile_nodes
    starts = np.searchsorted(tile_of_edge, np.arange(n_tiles)).astype(np.int64)
    ends = np.searchsorted(tile_of_edge, np.arange(1, n_tiles + 1)).astype(np.int64)
    # Mosaic requires sublane-dim slice starts divisible by 8: align each
    # tile's first block down; over-covered rows belong to the previous
    # tile and are masked in-kernel.  TE is a multiple of 8, so every block
    # offset stays aligned.
    assert tile_edges % 8 == 0
    starts_aligned = (starts // 8) * 8
    counts = ends - starts_aligned
    blocks = np.maximum((counts + tile_edges - 1) // tile_edges, 0)
    max_blocks = max(int(blocks.max()), 1)
    if fixed_max_blocks is not None:
        assert max_blocks <= fixed_max_blocks, (
            f"tile needs {max_blocks} blocks > fixed {fixed_max_blocks}"
        )
        max_blocks = fixed_max_blocks
    block_offsets = np.zeros((n_tiles, max_blocks), np.int32)
    block_valid = np.zeros((n_tiles, max_blocks), np.int32)
    # offsets are NOT clipped: the kernel input is padded by tile_edges
    # trailing masked rows so every [off, off+TE) window is in bounds and
    # blocks of one tile never overlap each other (no double counting)
    rec_ext = np.concatenate([rec, np.full(tile_edges, -(10 * n_node), rec.dtype)])
    mask_ext = np.concatenate([edge_mask, np.zeros(tile_edges, bool)])
    # host-precomputed local row ids per (tile, block): receiver - tile
    # start, with out-of-tile / masked rows set to -1
    sid_blocks = np.full((n_tiles * max_blocks, tile_edges), -1, np.int32)
    for t in range(n_tiles):
        for b in range(max_blocks):
            if b < blocks[t]:
                off = starts_aligned[t] + b * tile_edges
                block_offsets[t, b] = off
                block_valid[t, b] = 1
                ids = rec_ext[off : off + tile_edges].astype(np.int64) - t * tile_nodes
                ok = (
                    (ids >= 0)
                    & (ids < tile_nodes)
                    & mask_ext[off : off + tile_edges]
                )
                sid_blocks[t * max_blocks + b] = np.where(ok, ids, -1)
    return {
        "block_offsets": block_offsets,
        "block_valid": block_valid,
        "blocks_per_tile": blocks.astype(np.int32),
        "sid_blocks": sid_blocks,
        "max_blocks": max_blocks,
        "tile_nodes": tile_nodes,
        "tile_edges": tile_edges,
    }


def sorted_segment_sum_pallas(
    data: jnp.ndarray,
    receivers: jnp.ndarray,
    edge_mask: jnp.ndarray,
    n_node: int,
    plan: dict,
    tile_features: int = 256,
) -> jnp.ndarray:
    """Convenience wrapper taking the host plan dict (tests/benchmarks)."""
    n_tiles = (n_node + plan["tile_nodes"] - 1) // plan["tile_nodes"]
    MB = plan["max_blocks"]
    return segment_sum_pallas_raw(
        data,
        jnp.asarray(plan["block_offsets"]),
        jnp.asarray(plan["blocks_per_tile"]),
        jnp.asarray(plan["sid_blocks"]).reshape(n_tiles, MB, -1),
        n_node,
        (plan["tile_nodes"], plan["tile_edges"], MB),
        tile_features,
    )


def segment_sum_pallas_raw(
    data: jnp.ndarray,  # [E, F] messages (edges sorted by the plan's key)
    block_offsets: jnp.ndarray,  # [T, MB] int32
    nblocks: jnp.ndarray,  # [T] int32
    sid_all: jnp.ndarray,  # [T, MB, TE] int32
    n_node: int,
    meta: Tuple[int, int, int],  # (TN, TE, MB)
    tile_features: int = 256,
) -> jnp.ndarray:
    """Masked sorted-segment sum via the tiled one-hot SpMM kernel.

    Blocks may over-cover neighbouring tiles' edges; host-precomputed local
    ids are -1 there, matching no output row, so each edge contributes
    exactly once.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, F = data.shape
    TN, TE, MB = meta[:3]
    n_tiles = (n_node + TN - 1) // TN
    TF = max(
        (t for t in (tile_features, 256, 128) if F % t == 0), default=None
    )
    assert TF is not None, f"F={F} must be a multiple of 128"
    assert n_node % TN == 0, f"n_node={n_node} % TN={TN}"
    # keep every [off, off+TE) DMA window in bounds: skip the (full [E, F]
    # HBM copy!) safety concat when the batch's edge budget already covers
    # the plan's last window (meta[3] from _build_agg_plans)
    if not (len(meta) > 3 and E >= meta[3]):
        data = jnp.concatenate(
            [data, jnp.zeros((TE,) + data.shape[1:], data.dtype)]
        )

    def kernel(off_ref, nb_ref, sid_ref, x_hbm, o_ref, xs, sem_x):
        f = pl.program_id(0)
        t = pl.program_id(1)
        nb = nb_ref[t]

        def dma(bb, slot):
            start = pl.multiple_of(off_ref[t, bb], 8)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, TE), pl.ds(f * TF, TF)],
                xs.at[slot],
                sem_x.at[slot],
            )

        o_ref[:] = jnp.zeros_like(o_ref)

        @pl.when(nb > 0)
        def _run():
            dma(0, 0).start()

            def body(b, acc):
                @pl.when(b + 1 < nb)
                def _prefetch():
                    dma(b + 1, (b + 1) % 2).start()

                dma(b, b % 2).wait()
                sid = sid_ref[0, pl.ds(b, 1), :]  # [1, TE]; -1 matches no row
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0)
                # bf16 operands -> full-rate MXU passes with fp32
                # accumulation (fp32xfp32 dots run at a fraction of MXU
                # rate and dominated the kernel: 4.8 -> 1.x ms at [E, 256])
                onehot = (row_ids == sid).astype(jnp.bfloat16)

                def dot(a, x):
                    return jax.lax.dot_general(
                        a,
                        x,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                x = xs[b % 2]
                if x.dtype == jnp.bfloat16:
                    return acc + dot(onehot, x)
                # near-fp32 sum in 2 bf16 MXU passes: one-hot entries are
                # exact in bf16; splitting the data into bf16 hi + lo halves
                # recovers ~2x the bf16 mantissa (~2^-18 relative error)
                xf = x.astype(jnp.float32)
                hi = xf.astype(jnp.bfloat16)
                lo = (xf - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                return acc + dot(onehot, hi) + dot(onehot, lo)

            acc = jax.lax.fori_loop(
                0, nb, body, jnp.zeros((TN, TF), jnp.float32)
            )
            o_ref[:] = acc.astype(o_ref.dtype)

    grid = (F // TF, n_tiles)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, MB, TE), lambda f, t, off, nb: (t, 0, 0)
                ),  # sid rows for this tile
                pl.BlockSpec(memory_space=pl.ANY),  # data [E+TE, F]
            ],
            out_specs=pl.BlockSpec((TN, TF), lambda f, t, off, nb: (t, f)),
            scratch_shapes=[
                pltpu.VMEM((2, TE, TF), data.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_node, F), data.dtype),
    )(block_offsets, nblocks, sid_all, data)
    return out


def segment_minmax_pallas_raw(
    data: jnp.ndarray,  # [E, F] edge values (sorted by receiver)
    block_offsets: jnp.ndarray,  # [T, MB] int32
    nblocks: jnp.ndarray,  # [T] int32
    sid_all: jnp.ndarray,  # [T, MB, TE] int32 (-1 = invalid row)
    n_node: int,
    meta: Tuple[int, int, int],  # (TN, TE, MB)
    tile_features: int = 256,
    empty_value: float = 0.0,
) -> jnp.ndarray:
    """Masked sorted-segment MAX and MIN in one pass, no scatters.
    Returns [n_node, 2, F]: [:, 0] = max, [:, 1] = min (the kernel
    writes a 2-D (TN, 2*TF) block per tile; rank-3 blocks with a size-2
    sublane dim stall Mosaic).

    Per edge block: segmented Hillis-Steele inclusive max/min scans along
    the (receiver-sorted) edge rows — log2(TE) vectorized shift+select
    steps in VMEM — leave each within-block segment's extremum at the
    segment's LAST row; a one-hot matmul selects those end rows onto the
    [TN] output rows.  The select is EXACT: bf16 values directly, fp32 via
    a 3-way bf16 split (hi + mid + lo covers all 24 mantissa bits, and the
    single-term sum reassembles them exactly), so the scatter-free VJP's
    d == out[receivers] comparison holds bitwise.  Blocks combine by
    elementwise max/min gated on the receiver having an end row in the
    block.  Same plan/DMA pipeline as the sum kernel; both extrema share
    one read of the edge data (the op is HBM-bound).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    E, F = data.shape
    TN, TE, MB = meta[:3]
    # segments are contiguous runs of one endpoint: the scan only needs
    # doubling steps up to the plan's max segment length (meta[5], a
    # power of two from _build_agg_plans), not log2(TE)
    max_scan = TE
    if len(meta) > 5 and meta[5] is not None:
        max_scan = min(TE, int(meta[5]))
    n_tiles = (n_node + TN - 1) // TN
    TF = max(
        (t for t in (tile_features, 256, 128) if F % t == 0), default=None
    )
    assert TF is not None, f"F={F} must be a multiple of 128"
    assert n_node % TN == 0
    if not (len(meta) > 3 and E >= meta[3]):  # see segment_sum_pallas_raw
        data = jnp.concatenate(
            [data, jnp.zeros((TE,) + data.shape[1:], data.dtype)]
        )
    BIG = 3.0e38  # finite +/-inf sentinel (safe in fp32 arithmetic)

    def kernel(off_ref, nb_ref, sid_ref, x_hbm, o_ref, xs, sem_x):
        f = pl.program_id(0)
        t = pl.program_id(1)
        nb = nb_ref[t]

        def dma(bb, slot):
            start = pl.multiple_of(off_ref[t, bb], 8)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(start, TE), pl.ds(f * TF, TF)],
                xs.at[slot],
                sem_x.at[slot],
            )

        o_ref[:] = jnp.full_like(o_ref, empty_value)

        @pl.when(nb > 0)
        def _run():
            dma(0, 0).start()

            def dot(a, v):
                # bf16 MXU passes with fp32 accumulation; every operand
                # fed here is bf16-exact (one-hots, split parts, flags)
                return jax.lax.dot_general(
                    a.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def select_ends(onehot, vals):
                """Exact one-hot select of end-row values."""
                if data.dtype == jnp.bfloat16:
                    return dot(onehot, vals)
                hi = vals.astype(jnp.bfloat16).astype(jnp.float32)
                rem = vals - hi
                mid = rem.astype(jnp.bfloat16).astype(jnp.float32)
                lo = rem - mid  # <= 8 significant bits left: bf16-exact
                return dot(onehot, hi) + dot(onehot, mid) + dot(onehot, lo)

            def body(b, accs):
                acc_mx, acc_mn = accs

                @pl.when(b + 1 < nb)
                def _prefetch():
                    dma(b + 1, (b + 1) % 2).start()

                dma(b, b % 2).wait()
                sid = sid_ref[0, pl.ds(b, 1), :]  # [1, TE] (lanes)
                row_ids = jax.lax.broadcasted_iota(jnp.int32, (TN, TE), 0)
                onehot = (row_ids == sid).astype(jnp.float32)
                # the column (sublane) copy of sid WITHOUT a transpose
                # (Mosaic can't reshape (1,TE)->(TE,1)): contract the
                # one-hot over its node axis against (row index + 1)
                rows1 = (
                    jax.lax.broadcasted_iota(jnp.int32, (TN, 1), 0) + 1
                ).astype(jnp.bfloat16)  # values <= TN+1: bf16-exact
                sid_col = (
                    jax.lax.dot_general(
                        onehot.astype(jnp.bfloat16), rows1,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    - 1.0
                )  # [TE, 1]; -1 where the edge row is invalid/out-of-tile
                valid = sid_col >= 0.0

                x = xs[b % 2].astype(jnp.float32)
                xmx = jnp.where(valid, x, -BIG)
                xmn = jnp.where(valid, x, BIG)

                # segmented inclusive scans over rows (static shifts)
                s = 1
                while s < max_scan:
                    pad_sid = jnp.full((s, 1), -2.0, jnp.float32)
                    sid_shift = jnp.concatenate([pad_sid, sid_col[:-s]], 0)
                    same = (sid_shift == sid_col) & valid
                    sh_mx = jnp.concatenate(
                        [jnp.full((s, TF), -BIG, jnp.float32), xmx[:-s]], 0
                    )
                    xmx = jnp.maximum(xmx, jnp.where(same, sh_mx, -BIG))
                    sh_mn = jnp.concatenate(
                        [jnp.full((s, TF), BIG, jnp.float32), xmn[:-s]], 0
                    )
                    xmn = jnp.minimum(xmn, jnp.where(same, sh_mn, BIG))
                    s *= 2

                # within-block segment ends (column form)
                sid_next = jnp.concatenate(
                    [sid_col[1:], jnp.full((1, 1), -3.0, jnp.float32)], 0
                )
                end_col = (sid_col != sid_next) & valid  # [TE, 1]
                # only end rows carry nonzero values; the one-hot matmul
                # then sums exactly one term per (receiver, block)
                mx_out = select_ends(onehot, jnp.where(end_col, xmx, 0.0))
                mn_out = select_ends(onehot, jnp.where(end_col, xmn, 0.0))
                has = dot(onehot, end_col.astype(jnp.float32)) > 0.5  # [TN,1]
                return (
                    jnp.where(has, jnp.maximum(acc_mx, mx_out), acc_mx),
                    jnp.where(has, jnp.minimum(acc_mn, mn_out), acc_mn),
                )

            acc_mx, acc_mn = jax.lax.fori_loop(
                0, nb, body,
                (
                    jnp.full((TN, TF), -BIG, jnp.float32),
                    jnp.full((TN, TF), BIG, jnp.float32),
                ),
            )
            o_ref[:, :TF] = jnp.where(
                acc_mx > -BIG / 2, acc_mx, jnp.asarray(empty_value, jnp.float32)
            ).astype(o_ref.dtype)
            o_ref[:, TF:] = jnp.where(
                acc_mn < BIG / 2, acc_mn, jnp.asarray(empty_value, jnp.float32)
            ).astype(o_ref.dtype)

    grid = (F // TF, n_tiles)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, MB, TE), lambda f, t, off, nb: (t, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (TN, 2 * TF), lambda f, t, off, nb: (t, f)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, TE, TF), data.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        # packed [N, (F//TF) * 2TF]: per feature tile, TF max cols then
        # TF min cols; unpacked to [N, 2, F] below
        out_shape=jax.ShapeDtypeStruct((n_node, 2 * F), data.dtype),
    )(block_offsets, nblocks, sid_all, data)
    packed = out.reshape(n_node, F // TF, 2, TF)
    return jnp.stack(
        [
            packed[:, :, 0, :].reshape(n_node, F),
            packed[:, :, 1, :].reshape(n_node, F),
        ],
        axis=1,
    )
