"""Segment reductions: the core message-aggregation primitives.

These replace the reference's torch_scatter calls (``Base.py:23``,
``EGCLStack.py:294-300``) and the scatter internals of every PyG conv.
The default implementations use XLA scatter ops (`.at[].add/max/min`), which
XLA lowers to efficient on-chip sorted-segment updates; hot paths can be
swapped for the Pallas kernels in ``ops.pallas_segment`` (same signatures).

Conventions: `segment_ids` is int32 [E]; `num_segments` is a static int;
`mask` (optional, [E] bool) zeroes contributions from padding edges.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked(data: jnp.ndarray, mask: Optional[jnp.ndarray], fill=0.0) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, jnp.asarray(fill, data.dtype))


def segment_sum(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    data = _masked(data, mask, 0.0)
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_count(
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, dtype)
    if mask is not None:
        ones = jnp.where(mask, ones, jnp.zeros((), dtype))
    return jax.ops.segment_sum(
        ones, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    s = segment_sum(data, segment_ids, num_segments, mask, indices_are_sorted)
    cnt = segment_count(
        segment_ids, num_segments, mask, data.dtype, indices_are_sorted
    )
    cnt = jnp.maximum(cnt, 1.0)
    return s / cnt.reshape((num_segments,) + (1,) * (data.ndim - 1))


def segment_max(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    empty_value: float = 0.0,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Max-reduce; segments with no (real) contribution return empty_value
    (PyG's aggregation returns 0 for empty segments after masked fill)."""
    neg = jnp.asarray(jnp.finfo(data.dtype).min, data.dtype)
    data = _masked(data, mask, neg)
    out = jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    out = jnp.maximum(out, neg)  # segment_max fills empty segments with -inf
    cnt = segment_count(
        segment_ids, num_segments, mask, jnp.int32, indices_are_sorted
    )
    has = (cnt > 0).reshape((num_segments,) + (1,) * (data.ndim - 1))
    return jnp.where(has, out, jnp.asarray(empty_value, data.dtype))


def segment_min(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    empty_value: float = 0.0,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    pos = jnp.asarray(jnp.finfo(data.dtype).max, data.dtype)
    data = _masked(data, mask, pos)
    out = jax.ops.segment_min(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )
    out = jnp.minimum(out, pos)
    cnt = segment_count(
        segment_ids, num_segments, mask, jnp.int32, indices_are_sorted
    )
    has = (cnt > 0).reshape((num_segments,) + (1,) * (data.ndim - 1))
    return jnp.where(has, out, jnp.asarray(empty_value, data.dtype))


def segment_std(
    data: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Std aggregator matching PyG ``StdAggregation`` semantics used by
    PNAConv: sqrt(relu(E[x^2]-E[x]^2) + eps)."""
    mean = segment_mean(data, segment_ids, num_segments, mask, indices_are_sorted)
    mean2 = segment_mean(
        data * data, segment_ids, num_segments, mask, indices_are_sorted
    )
    var = jax.nn.relu(mean2 - mean * mean)
    return jnp.sqrt(var + eps)


def segment_softmax(
    logits: jnp.ndarray,
    segment_ids: jnp.ndarray,
    num_segments: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Numerically-stable per-segment softmax over edges (GAT attention,
    replacing PyG ``softmax(alpha, index)``). Masked entries get weight 0."""
    neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
    logits_m = _masked(logits, mask, neg)
    seg_max = segment_max(logits_m, segment_ids, num_segments, mask, empty_value=0.0)
    shifted = logits_m - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (expd.ndim - mask.ndim))
        expd = jnp.where(m, expd, 0.0)
    denom = segment_sum(expd, segment_ids, num_segments)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, logits.dtype))
    return expd / denom[segment_ids]
