"""Unit tests for masked segment primitives against numpy references."""

import jax.numpy as jnp
import numpy as np
import pytest

from hydragnn_tpu.ops import (
    segment_max,
    segment_mean,
    segment_min,
    segment_softmax,
    segment_std,
    segment_sum,
)


@pytest.fixture
def case():
    rng = np.random.default_rng(0)
    E, N, F = 64, 10, 4
    data = rng.normal(size=(E, F)).astype(np.float32)
    ids = rng.integers(0, N, E).astype(np.int32)
    mask = rng.random(E) > 0.3
    return data, ids, mask, N


def _np_grouped(data, ids, mask, N, fn, empty=0.0):
    out = np.full((N, data.shape[1]), empty, np.float32)
    for s in range(N):
        sel = (ids == s) & mask
        if sel.any():
            out[s] = fn(data[sel])
    return out


def test_segment_sum(case):
    data, ids, mask, N = case
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    want = _np_grouped(data, ids, mask, N, lambda d: d.sum(0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_mean(case):
    data, ids, mask, N = case
    got = segment_mean(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    want = _np_grouped(data, ids, mask, N, lambda d: d.mean(0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_max_min(case):
    data, ids, mask, N = case
    got = segment_max(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    want = _np_grouped(data, ids, mask, N, lambda d: d.max(0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got = segment_min(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    want = _np_grouped(data, ids, mask, N, lambda d: d.min(0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_std_matches_formula(case):
    data, ids, mask, N = case
    got = segment_std(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    want = _np_grouped(
        data, ids, mask, N,
        lambda d: np.sqrt(np.maximum(d.mean(0) ** 2 * 0 + (d**2).mean(0) - d.mean(0) ** 2, 0) + 1e-5),
        empty=np.sqrt(1e-5),
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_segment_softmax_normalizes(case):
    data, ids, mask, N = case
    got = np.asarray(
        segment_softmax(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    )
    # masked entries have zero weight
    assert np.all(got[~mask] == 0)
    # per-segment sums are 1 for segments with any real entry
    for s in range(N):
        sel = (ids == s) & mask
        if sel.any():
            np.testing.assert_allclose(got[sel].sum(0), np.ones(data.shape[1]), rtol=1e-5)


def test_nan_in_padding_does_not_poison(case):
    data, ids, mask, N = case
    data = data.copy()
    data[~mask] = np.nan
    got = segment_sum(jnp.asarray(data), jnp.asarray(ids), N, mask=jnp.asarray(mask))
    assert np.isfinite(np.asarray(got)).all()
