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


def _fwd_kernel(q_ref, kt_ref, v_ref, segr_ref, o_ref, l_ref, *, BQ, BK, N,
                sm_scale):
    q = q_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    i = pl.program_id(1)
    seg_row_q = segr_ref[0, pl.ds(i * BQ, BQ)][None, :]  # [1, BQ]
    segq_col = _col_from_row(seg_row_q.astype(jnp.float32), BQ)  # [BQ, 1]

    nk = N // BK

    def body(c, carry):
        m, l, acc = carry
        kt = kt_ref[0, :, pl.ds(c * BK, BK)].astype(jnp.bfloat16)  # [D, BK]
        s = _dot(q, kt, 1, 0) * sm_scale  # [BQ, BK] fp32
        segk = segr_ref[0, pl.ds(c * BK, BK)][None, :].astype(jnp.float32)
        mask = segq_col == segk  # [BQ, BK]
        s = jnp.where(mask, s, NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        vv = v_ref[0, pl.ds(c * BK, BK), :].astype(jnp.bfloat16)  # [BK, D]
        acc_new = acc * corr + _dot(p.astype(jnp.bfloat16), vv, 1, 0)
        return m_new, l_new, acc_new

    D = q_ref.shape[-1]
    m0 = jnp.full((BQ, 1), NEG, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    a0 = jnp.zeros((BQ, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))  # [BQ, 1]
    l_ref[0] = _row_from_col(lse, BQ)[0]  # [BQ]


def _bwd_kernel(q_ref, kt_ref, v_ref, segr_ref, do_ref, lse_ref, delta_ref,
                dq_ref, dkt_ref, dvt_ref, *, BQ, BK, N, sm_scale):
    i = pl.program_id(1)
    q = q_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    do = do_ref[0].astype(jnp.bfloat16)  # [BQ, D]
    seg_row_q = segr_ref[0, pl.ds(i * BQ, BQ)][None, :]
    segq_col = _col_from_row(seg_row_q.astype(jnp.float32), BQ)
    lse_col = _col_from_row(lse_ref[0, pl.ds(i * BQ, BQ)][None, :], BQ)
    delta_col = _col_from_row(delta_ref[0, pl.ds(i * BQ, BQ)][None, :], BQ)

    @pl.when(i == 0)
    def _init():
        dkt_ref[0] = jnp.zeros_like(dkt_ref[0])
        dvt_ref[0] = jnp.zeros_like(dvt_ref[0])

    nk = N // BK
    D = q_ref.shape[-1]

    def body(c, dq):
        kt = kt_ref[0, :, pl.ds(c * BK, BK)].astype(jnp.bfloat16)  # [D, BK]
        s = _dot(q, kt, 1, 0) * sm_scale  # [BQ, BK]
        segk = segr_ref[0, pl.ds(c * BK, BK)][None, :].astype(jnp.float32)
        mask = segq_col == segk
        p = jnp.where(mask, jnp.exp(s - lse_col), 0.0)  # [BQ, BK]
        vv = v_ref[0, pl.ds(c * BK, BK), :].astype(jnp.bfloat16)  # [BK, D]
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

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((BQ, D), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _pick_bq(N):
    for b in (512, 256, 128):
        if N % b == 0:
            return b
    return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention_small_d(q, k, v, seg, sm_scale):
    """Segment-masked softmax attention, D-native.

    q, v: [H, N, D]; k: [H, N, D]; seg: [N] int32 segment ids (attention
    only within equal ids).  Returns [H, N, D].
    """
    o, _ = _fwd(q, k, v, seg, sm_scale)
    return o


def _fwd(q, k, v, seg, sm_scale):
    H, N, D = q.shape
    BQ = _pick_bq(N)
    BK = min(1024, N)
    assert BQ is not None and N % BK == 0
    kt = jnp.swapaxes(k, 1, 2)  # [H, D, N]
    segr = seg.astype(jnp.int32)[None]  # [1, N]
    kernel = functools.partial(
        _fwd_kernel, BQ=BQ, BK=BK, N=N, sm_scale=sm_scale
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(H, N // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, D, N), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, N, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, N), lambda h, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, BQ), lambda h, i: (h, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, D), q.dtype),
            jax.ShapeDtypeStruct((H, N), jnp.float32),
        ],
    )(q, kt, v, segr)
    return o, lse


def _fwd_rule(q, k, v, seg, sm_scale):
    o, lse = _fwd(q, k, v, seg, sm_scale)
    return o, (q, k, v, seg, o, lse)


def _bwd_rule(sm_scale, res, do):
    q, k, v, seg, o, lse = res
    H, N, D = q.shape
    BQ = _pick_bq(N)
    BK = min(1024, N)
    kt = jnp.swapaxes(k, 1, 2)
    segr = seg.astype(jnp.int32)[None]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    kernel = functools.partial(
        _bwd_kernel, BQ=BQ, BK=BK, N=N, sm_scale=sm_scale
    )
    dq, dkt, dvt = pl.pallas_call(
        kernel,
        grid=(H, N // BQ),
        in_specs=[
            pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, D, N), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, N, D), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, N), lambda h, i: (0, 0)),
            pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, N), lambda h, i: (h, 0)),
            pl.BlockSpec((1, N), lambda h, i: (h, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, BQ, D), lambda h, i: (h, i, 0)),
            pl.BlockSpec((1, D, N), lambda h, i: (h, 0, 0)),
            pl.BlockSpec((1, D, N), lambda h, i: (h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((H, N, D), q.dtype),
            jax.ShapeDtypeStruct((H, D, N), jnp.float32),
            jax.ShapeDtypeStruct((H, D, N), jnp.float32),
        ],
    )(q, kt, v, segr, do, lse, delta)
    dk = jnp.swapaxes(dkt, 1, 2).astype(k.dtype)
    dv = jnp.swapaxes(dvt, 1, 2).astype(v.dtype)
    return dq, dk, dv, None


flash_attention_small_d.defvjp(_fwd_rule, _bwd_rule)
