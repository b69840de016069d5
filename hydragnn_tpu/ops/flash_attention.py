"""Flash attention specialized for small head dims (GNN global attention).

GPS global attention (``models/gps.py``) runs multi-head self-attention at
head_dim D = channels/heads = 16..64 over N ~ 10k-100k padded nodes.  The
stock TPU flash kernel wants D padded to 128 — a 4-8x waste in both MXU
work and HBM traffic at D=32 (profiling: 178 of 214 ms of the GPS bench
step).  This kernel keeps D native and exploits the fact that at small D
the ENTIRE K/V for one head fits in VMEM:

  * layouts: q [H, N, D]; k as KT [H, D, N] (lanes = N, no pad waste);
    v [H, N, D]; out [H, N, D] + logsumexp L [H, N],
  * grid (H, N/BQ); per program the full KT/V head slice is VMEM-resident,
    the kv-chunk loop is pure VMEM traffic (no DMA pipelining needed),
  * online softmax in fp32; dots in bf16 on the MXU,
  * segment masking via integer segment ids (the GPS whole-batch quirk =
    2 segments: real/padding; per-graph mode = graph ids, bounded by
    n_graph which is small for GNN batches),
  * backward: one pass per (h, q-block) recomputing P from the saved
    logsumexp; dK/dV are accumulated in TRANSPOSED [D, N] layout so the
    VMEM accumulators stay lane-major (the [N, D] form would pad lanes
    4x); outputs are transposed back by XLA (cheap, linear in N).

Skinny row/column vectors ([BQ,1] <-> [1,BQ]) are exchanged with an
eye-matmul — Mosaic cannot reshape across the sublane/lane boundary.

Reference behavior matched: ``hydragnn/globalAtt/gps.py:103-152``
(torch MultiheadAttention over the densified batch).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _col_from_row(row, BQ, dtype=jnp.float32):
    """[1, BQ] -> [BQ, 1] via eye contraction (sublane<->lane exchange)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (BQ, BQ), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (BQ, BQ), 1)
    eye = (i == j).astype(dtype)
    return jax.lax.dot_general(
        eye, row.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, 1]


def _row_from_col(col, BQ, dtype=jnp.float32):
    i = jax.lax.broadcasted_iota(jnp.int32, (BQ, BQ), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (BQ, BQ), 1)
    eye = (i == j).astype(dtype)
    return jax.lax.dot_general(
        col.astype(dtype), eye,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, BQ]


def _dot(a, b, ca, cb):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(kmin_ref, kmax_ref, qmin_ref, qmax_ref,
                q_ref, kt_ref, v_ref, segr_ref, o_ref, l_ref, *, BQ, BK, N,
                sm_scale, skip):
    q = q_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    i = pl.program_id(1)
    seg_row_q = segr_ref[0, pl.ds(i * BQ, BQ)][None, :]  # [1, BQ]
    segq_col = _col_from_row(seg_row_q.astype(jnp.float32), BQ)  # [BQ, 1]
    qmin, qmax = qmin_ref[i], qmax_ref[i]

    nk = N // BK

    def plain_step(c, carry):
        m, l, acc = carry
        kt = kt_ref[0, :, pl.ds(c * BK, BK)].astype(jnp.bfloat16)
        s = _dot(q, kt, 1, 0) * sm_scale  # [BQ, BK] fp32
        segk = segr_ref[0, pl.ds(c * BK, BK)][None, :].astype(jnp.float32)
        mask = segq_col == segk  # [BQ, BK]
        s = jnp.where(mask, s, NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        vv = v_ref[0, pl.ds(c * BK, BK), :].astype(jnp.bfloat16)
        acc_new = acc * corr + _dot(p.astype(jnp.bfloat16), vv, 1, 0)
        return m_new, l_new, acc_new

    def skip_step(c, carry):
        # chunk/block segment ranges (scalar-prefetched): disjoint chunks
        # are skipped without touching K/V; uniform-matching chunks take a
        # mask-free path (saves 3 VPU passes over [BQ, BK]) — with sorted
        # graph ids, per-graph attention becomes block-diagonal cost.
        # Only used in block-sparse (per-graph) mode: the conds serialize
        # Mosaic's pipeline, a net loss when nothing can be skipped.
        kmin, kmax = kmin_ref[c], kmax_ref[c]
        disjoint = (kmax < qmin) | (kmin > qmax)
        uniform = (kmin == kmax) & (qmin == qmax) & (kmin == qmin)

        def work(cr):
            m, l, acc = cr
            kt = kt_ref[0, :, pl.ds(c * BK, BK)].astype(jnp.bfloat16)
            s = _dot(q, kt, 1, 0) * sm_scale  # [BQ, BK] fp32

            def masked(sv):
                segk = segr_ref[0, pl.ds(c * BK, BK)][None, :].astype(
                    jnp.float32
                )
                mask = segq_col == segk  # [BQ, BK]
                sv = jnp.where(mask, sv, NEG)
                mn = jnp.maximum(m, jnp.max(sv, axis=1, keepdims=True))
                pv = jnp.where(mask, jnp.exp(sv - mn), 0.0)
                return mn, pv

            def unmasked(sv):
                mn = jnp.maximum(m, jnp.max(sv, axis=1, keepdims=True))
                return mn, jnp.exp(sv - mn)

            m_new, p = jax.lax.cond(uniform, unmasked, masked, s)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            vv = v_ref[0, pl.ds(c * BK, BK), :].astype(jnp.bfloat16)
            acc_new = acc * corr + _dot(p.astype(jnp.bfloat16), vv, 1, 0)
            return m_new, l_new, acc_new

        return jax.lax.cond(disjoint, lambda cr: cr, work, carry)

    step = skip_step if skip else plain_step

    D = q_ref.shape[-1]

    def init():
        return (
            jnp.full((BQ, 1), NEG, jnp.float32),
            jnp.zeros((BQ, 1), jnp.float32),
            jnp.zeros((BQ, D), jnp.float32),
        )

    # TWO independent online-softmax streams over even/odd chunks: the
    # matmul/exp of one stream overlaps the other's carry-chain update
    # (full unroll OOMs VMEM; fori_loop only supports unroll=1/full)
    def body2(t, carry):
        return step(2 * t, carry[0]), step(2 * t + 1, carry[1])

    c1, c2 = jax.lax.fori_loop(0, nk // 2, body2, (init(), init()))
    if nk % 2:
        c1 = step(nk - 1, c1)
    (m1, l1, a1), (m2, l2, a2) = c1, c2
    m = jnp.maximum(m1, m2)
    w1 = jnp.exp(m1 - m)
    w2 = jnp.exp(m2 - m)
    l = l1 * w1 + l2 * w2
    acc = a1 * w1 + a2 * w2
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse = jnp.where(l > 0.0, m + jnp.log(jnp.maximum(l, 1e-30)), NEG)
    l_ref[0, 0] = _row_from_col(lse, BQ)[0]  # [BQ] lanes


def _bwd_kernel(kmin_ref, kmax_ref, qmin_ref, qmax_ref,
                q_ref, kt_ref, v_ref, segr_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dkt_ref, dvt_ref, *, BQ, BK, N, sm_scale, skip):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    do = do_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    seg_row_q = segr_ref[0, pl.ds(i * BQ, BQ)][None, :]
    segq_col = _col_from_row(seg_row_q.astype(jnp.float32), BQ)
    lse_col = _col_from_row(lse_ref[0, 0, pl.ds(i * BQ, BQ)][None, :], BQ)
    delta_col = _col_from_row(delta_ref[0, 0, pl.ds(i * BQ, BQ)][None, :], BQ)

    @pl.when(i == 0)
    def _init():
        dkt_ref[0] = jnp.zeros_like(dkt_ref[0])
        dvt_ref[0] = jnp.zeros_like(dvt_ref[0])

    nk = N // BK
    D = q_ref.shape[-1]
    qmin, qmax = qmin_ref[i], qmax_ref[i]

    def chunk_grads(c, dq, p_fn):
        kt = kt_ref[0, :, pl.ds(c * BK, BK)].astype(jnp.bfloat16)
        s = _dot(q, kt, 1, 0) * sm_scale  # [BQ, BK]
        p = p_fn(s)  # [BQ, BK]
        vv = v_ref[0, pl.ds(c * BK, BK), :].astype(jnp.bfloat16)
        dp = _dot(do, vv, 1, 1)  # [BQ, BK]
        ds = p * (dp - delta_col) * sm_scale  # fp32
        ds16 = ds.astype(jnp.bfloat16)
        p16 = p.astype(jnp.bfloat16)
        # dq += ds @ K_chunk  (K_chunk = kt^T), contract the BK axis
        dq = dq + _dot(ds16, kt, 1, 1)  # [BQ, D]
        # transposed accumulators: [D, BK] chunks of dKT / dVT
        dkt_ref[0, :, pl.ds(c * BK, BK)] += _dot(q, ds16, 0, 0)
        dvt_ref[0, :, pl.ds(c * BK, BK)] += _dot(do, p16, 0, 0)
        return dq

    def masked_p(c):
        def f(sv):
            segk = segr_ref[0, pl.ds(c * BK, BK)][None, :].astype(jnp.float32)
            mask = segq_col == segk
            return jnp.where(mask, jnp.exp(sv - lse_col), 0.0)

        return f

    def plain_body(c, dq):
        return chunk_grads(c, dq, masked_p(c))

    def skip_body(c, dq):
        kmin, kmax = kmin_ref[c], kmax_ref[c]
        disjoint = (kmax < qmin) | (kmin > qmax)
        uniform = (kmin == kmax) & (qmin == qmax) & (kmin == qmin)

        def work(dq):
            def p_fn(sv):
                return jax.lax.cond(
                    uniform, lambda x: jnp.exp(x - lse_col), masked_p(c), sv
                )

            return chunk_grads(c, dq, p_fn)

        return jax.lax.cond(disjoint, lambda dq: dq, work, dq)

    body = skip_body if skip else plain_body

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((BQ, D), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _pick_block(N, target):
    """Largest multiple-of-128 divisor of N that is <= target."""
    best = None
    d = 128
    while d <= min(N, target):
        if N % d == 0:
            best = d
        d += 128
    return best


def block_plan(N) -> Tuple[int, int]:
    """(BQ, BK) for a padded node budget N, or None if N can't tile."""
    bq = _pick_block(N, 512)
    bk = _pick_block(N, 1024)
    if bq is None or bk is None:
        return None
    return bq, bk


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_small_d(q, k, v, seg, sm_scale, block_sparse=False):
    """Segment-masked softmax attention, D-native.

    q, v: [H, N, D]; k: [H, N, D]; seg: [N] int32 segment ids (attention
    only within equal ids).  ``block_sparse=True`` enables chunk skipping
    via per-chunk segment ranges — near block-diagonal cost for sorted
    per-graph segments, but a pipeline-serializing net loss for dense
    single-segment attention.  Returns [H, N, D].
    """
    o, _ = _fwd(q, k, v, seg, sm_scale, block_sparse)
    return o


def _seg_ranges(seg, BQ, BK):
    """Per-q-block and per-kv-chunk [min, max] segment ids (host-cheap XLA
    reductions, scalar-prefetched into SMEM)."""
    s32 = seg.astype(jnp.int32)
    kmin = s32.reshape(-1, BK).min(axis=1)
    kmax = s32.reshape(-1, BK).max(axis=1)
    qmin = s32.reshape(-1, BQ).min(axis=1)
    qmax = s32.reshape(-1, BQ).max(axis=1)
    return kmin, kmax, qmin, qmax


def _fwd(q, k, v, seg, sm_scale, skip=False):
    H, N, D = q.shape
    plan = block_plan(N)
    assert plan is not None, f"N={N} not tileable by 128"
    BQ, BK = plan
    out_dtype = q.dtype
    # the kernels compute every dot in bf16: cast inputs OUTSIDE so the
    # VMEM-resident K/V blocks are half-size (fp32 v at N=16.5k overflows
    # the 16M scoped vmem limit); softmax/accumulators stay fp32 inside
    q = q.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)  # [H, D, N]
    segr = seg.astype(jnp.int32)[None]  # [1, N]
    kmin, kmax, qmin, qmax = _seg_ranges(seg, BQ, BK)
    kernel = functools.partial(
        _fwd_kernel, BQ=BQ, BK=BK, N=N, sm_scale=sm_scale, skip=skip
    )
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(H, N // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda h, i, *_: (h, i, 0)),
                pl.BlockSpec((1, D, N), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((1, N, D), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((1, N), lambda h, i, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BQ, D), lambda h, i, *_: (h, i, 0)),
                pl.BlockSpec((1, 1, BQ), lambda h, i, *_: (h, 0, i)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, N, D), out_dtype),
            jax.ShapeDtypeStruct((H, 1, N), jnp.float32),
        ],
        # the AOT (chipless) compiler's scoped-vmem accounting runs this
        # kernel slightly over the 16 MB default (the r03 "HTTP 500
        # tunnel flake" was THIS, deterministic); v5e accommodates more
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 2**20
        ),
    )(kmin, kmax, qmin, qmax, q, kt, v, segr)
    return o, lse


def _fwd_rule(q, k, v, seg, sm_scale, block_sparse=False):
    o, lse = _fwd(q, k, v, seg, sm_scale, block_sparse)
    return o, (q, k, v, seg, o, lse)


def _bwd_rule(sm_scale, block_sparse, res, do):
    q, k, v, seg, o, lse = res
    H, N, D = q.shape
    BQ, BK = block_plan(N)
    out_dtype = q.dtype
    qb = q.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    dob = do.astype(jnp.bfloat16)
    kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
    segr = seg.astype(jnp.int32)[None]
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )[:, None, :]  # [H, 1, N]
    kmin, kmax, qmin, qmax = _seg_ranges(seg, BQ, BK)
    kernel = functools.partial(
        _bwd_kernel, BQ=BQ, BK=BK, N=N, sm_scale=sm_scale,
        skip=block_sparse,
    )
    dq, dkt, dvt = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(H, N // BQ),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda h, i, *_: (h, i, 0)),
                pl.BlockSpec((1, D, N), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((1, N, D), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((1, N), lambda h, i, *_: (0, 0)),
                pl.BlockSpec((1, BQ, D), lambda h, i, *_: (h, i, 0)),
                pl.BlockSpec((1, 1, N), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((1, 1, N), lambda h, i, *_: (h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, BQ, D), lambda h, i, *_: (h, i, 0)),
                pl.BlockSpec((1, D, N), lambda h, i, *_: (h, 0, 0)),
                pl.BlockSpec((1, D, N), lambda h, i, *_: (h, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, N, D), out_dtype),
            jax.ShapeDtypeStruct((H, D, N), jnp.float32),
            jax.ShapeDtypeStruct((H, D, N), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 2**20
        ),
    )(kmin, kmax, qmin, qmax, qb, kt, vb, segr, dob, lse, delta)
    dk = jnp.swapaxes(dkt, 1, 2).astype(k.dtype)
    dv = jnp.swapaxes(dvt, 1, 2).astype(v.dtype)
    return dq, dk, dv, None


flash_attention_small_d.defvjp(_fwd_rule, _bwd_rule)
