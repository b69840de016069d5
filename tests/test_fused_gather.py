"""Fused gather->combine->segment-reduce kernel (ops/fused_gather.py) on
the CPU interpreter: window planning, forward parity vs the XLA
composition, and the full AD surface (grad, grad wrt every input,
grad-of-grad) -- the TPU run of the same kernels is covered by
tests/test_pallas_tpu.py and the bench."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydragnn_tpu.data.batching import collate
from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
from hydragnn_tpu.data.sample import GraphSample
from hydragnn_tpu.ops.fused_gather import (
    fused_pna_aggregate,
    gather_segsum,
    static_window_width,
)


def _window_batch(n_graphs=5, n=40, deg=6, seed=0, with_edge_attr=False):
    """Small receiver-sorted batch WITH fused window plans."""
    rng = np.random.default_rng(seed)
    samples = []
    for _ in range(n_graphs):
        senders = np.repeat(np.arange(n), deg)
        receivers = (senders + rng.integers(1, n, n * deg)) % n
        s = GraphSample(
            x=rng.normal(size=(n, 1)).astype(np.float32),
            pos=rng.uniform(0, 5, (n, 3)).astype(np.float32),
            edge_index=np.stack([senders, receivers]).astype(np.int64),
            y_graph=np.zeros(1, np.float32),
        )
        if with_edge_attr:
            s.edge_attr = rng.normal(size=(n * deg, 3)).astype(np.float32)
        samples.append(s)
    sort_edges_by_receiver(samples)
    W = static_window_width(n, 128)
    n_node = ((n_graphs * n + 1 + 127) // 128) * 128
    n_edge = n_graphs * n * deg + 512 + 8
    max_deg = max(
        int(np.bincount(s.edge_index[k]).max()) for s in samples for k in (0, 1)
    )
    mb = int(np.ceil((128 * max_deg + 8) / 512)) + 1
    batch = collate(
        samples, n_node, n_edge, n_graphs + 1, agg_plan=(128, 512, mb, W)
    )
    assert batch.agg_rcv_lot is not None, "window plan failed to build"
    assert len(batch.agg_meta) >= 5
    return batch


def _ref_sum(batch, table):
    h = jnp.where(batch.edge_mask[:, None], table[batch.senders], 0.0)
    return jax.ops.segment_sum(h, batch.receivers, batch.n_node)


def test_window_plan_covers_every_edge():
    batch = _window_batch()
    lot = np.asarray(batch.agg_rcv_lot)
    sid = np.asarray(batch.agg_rcv_sid)
    # every valid (in-tile) edge row must have a valid window-local id
    assert ((lot >= 0) == (sid >= 0)).all()
    W = batch.agg_meta[4]
    off = np.asarray(batch.agg_rcv_off)
    snd = np.asarray(batch.senders)
    win = np.asarray(batch.agg_rcv_win)
    T, MB, TE = sid.shape
    ext = np.concatenate([snd, np.zeros(TE, snd.dtype)])
    for t in range(T):
        for b in range(MB):
            rows = ext[off[t, b] : off[t, b] + TE]
            ok = sid[t, b] >= 0
            assert (lot[t, b][ok] == rows[: len(ok)][ok] - win[t]).all()
            assert (lot[t, b][ok] < W).all()


def test_gather_segsum_matches_xla_fwd_and_grad():
    batch = _window_batch()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(batch.n_node, 128)).astype(np.float32))

    out = gather_segsum(batch, x, "senders", interpret=True)
    ref = _ref_sum(batch, x)
    assert float(jnp.abs(out - ref).max()) < 1e-4

    ct = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    g = jax.grad(
        lambda v: jnp.vdot(gather_segsum(batch, v, "senders", interpret=True), ct)
    )(x)
    g_ref = jax.grad(lambda v: jnp.vdot(_ref_sum(batch, v), ct))(x)
    assert float(jnp.abs(g - g_ref).max()) < 1e-4


def _ref_pna(batch, h_i, h_j, et=None):
    h = h_i[batch.receivers] + h_j[batch.senders]
    if et is not None:
        h = h + et
    em = batch.edge_mask[:, None]
    N = batch.n_node
    s = jax.ops.segment_sum(jnp.where(em, h, 0.0), batch.receivers, N)
    s2 = jax.ops.segment_sum(jnp.where(em, h * h, 0.0), batch.receivers, N)
    mn = jax.ops.segment_min(jnp.where(em, h, jnp.inf), batch.receivers, N)
    mx = jax.ops.segment_max(jnp.where(em, h, -jnp.inf), batch.receivers, N)
    mn = jnp.where(jnp.isfinite(mn), mn, 0.0)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    return s, s2, mn, mx


@pytest.mark.parametrize("with_edge", [False, True])
def test_fused_pna_forward_and_grads(with_edge):
    batch = _window_batch(with_edge_attr=with_edge)
    rng = np.random.default_rng(2)
    F = 128
    h_i = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    h_j = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    et = (
        jnp.asarray(rng.normal(size=(batch.n_edge, F)).astype(np.float32))
        if with_edge
        else None
    )
    args = (h_i, h_j) + ((et,) if with_edge else ())

    outs = fused_pna_aggregate(batch, *args, interpret=True)
    refs = _ref_pna(batch, *args)
    for o, r, name in zip(outs, refs, ("sum", "sumsq", "min", "max")):
        assert float(jnp.abs(o - r).max()) < 2e-3, name

    # cotangent-weighted scalar loss -> grads wrt every input
    cts = [
        jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
        for _ in range(4)
    ]

    def loss(fn):
        def inner(*a):
            return sum(jnp.vdot(o, c) for o, c in zip(fn(*a), cts))

        return inner

    argnums = tuple(range(len(args)))
    g = jax.grad(
        loss(lambda *a: fused_pna_aggregate(batch, *a, interpret=True)),
        argnums,
    )(*args)
    g_ref = jax.grad(loss(lambda *a: _ref_pna(batch, *a)), argnums)(*args)
    names = ("h_i", "h_j", "edge")[: len(args)]
    for a, b, name in zip(g, g_ref, names):
        if name == "edge":
            b = jnp.where(batch.edge_mask[:, None], b, 0.0)
        assert float(jnp.abs(a - b).max()) < 2e-3, name


def test_fused_pna_grad_wrt_subset():
    """grad wrt ONE input with the others held constant: the held-constant
    tangents are symbolic zeros, which must not reach linear_call as
    constant operands (JAX's transpose rule rejects them — regression for
    the instantiated-zero-tangent crash)."""
    batch = _window_batch(n_graphs=4)
    rng = np.random.default_rng(7)
    F = 128
    h_i = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    h_j = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))

    def loss(fn, a, b):
        return sum(jnp.sum(o) for o in fn(a, b))

    fused = lambda a, b: fused_pna_aggregate(batch, a, b, interpret=True)
    ref = lambda a, b: _ref_pna(batch, a, b)
    for argnum in (0, 1):
        g = jax.grad(lambda a, b: loss(fused, a, b), argnum)(h_i, h_j)
        g_ref = jax.grad(lambda a, b: loss(ref, a, b), argnum)(h_i, h_j)
        assert float(jnp.abs(g - g_ref).max()) < 2e-3, argnum


def test_fused_pna_grad_of_grad():
    """Reverse-over-reverse (the MLIP force-training composition) runs
    through the fused kernels and matches the XLA composition."""
    batch = _window_batch(n_graphs=4)
    rng = np.random.default_rng(3)
    F = 128
    x = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))

    def energy(fn, x_):
        s, s2, mn, mx = fn(x_, 0.5 * x_)
        return jnp.sum(s * s) + jnp.sum(s2) + jnp.sum(mn * mx)

    def force_loss(fn, x_):
        f = jax.grad(lambda y: energy(fn, y))(x_)
        return jnp.vdot(f, v)

    fused = lambda a, b: fused_pna_aggregate(batch, a, b, interpret=True)
    ref = lambda a, b: _ref_pna(batch, a, b)
    g = jax.grad(lambda y: force_loss(fused, y))(x)
    g_ref = jax.grad(lambda y: force_loss(ref, y))(x)
    rel = float(jnp.abs(g - g_ref).max() / (jnp.abs(g_ref).max() + 1e-9))
    assert rel < 5e-3, rel


def test_neighbor_reduce_dispatch_cpu_fallback():
    """On the CPU backend neighbor_reduce must take the XLA path even when
    window plans exist (kernel dispatch is TPU-gated)."""
    from hydragnn_tpu.ops.aggregate import neighbor_reduce

    batch = _window_batch()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(batch.n_node, 64)).astype(np.float32))
    out = neighbor_reduce(batch, x, "sum")
    assert float(jnp.abs(out - _ref_sum(batch, x)).max()) < 1e-5


def test_wsum_window_reduce_matches_sender_segment_sum():
    """("wsum", i) on the receiver plan == segment-sum BY SENDER of the
    same per-edge value: pins the kernel's window accumulation AND the
    XLA overlap combine (_combine_window candidate coverage) against a
    dense reference."""
    from hydragnn_tpu.ops.fused_gather import window_gather_reduce_raw

    batch = _window_batch(n_graphs=6, n=48, deg=5, seed=9)
    rng = np.random.default_rng(11)
    F = 128
    tbl = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))

    outs = window_gather_reduce_raw(
        tables_win=[tbl], tables_tile=[], edge_streams=[],
        block_offsets=batch.agg_rcv_off, nblocks=batch.agg_rcv_nb,
        sid_all=batch.agg_rcv_sid, lot_all=batch.agg_rcv_lot,
        win_start=batch.agg_rcv_win, n_node=batch.n_node,
        meta=batch.agg_meta,
        combine=lambda wv, tv, ev: [wv[0]],
        reduces=(("sum", 0), ("wsum", 0)),
        interpret=True,
    )
    rcv_sum, snd_sum = outs
    h = jnp.where(batch.edge_mask[:, None], tbl[batch.senders], 0.0)
    ref_rcv = jax.ops.segment_sum(h, batch.receivers, batch.n_node)
    ref_snd = jax.ops.segment_sum(h, batch.senders, batch.n_node)
    assert float(jnp.abs(rcv_sum - ref_rcv).max()) < 2e-3
    assert float(jnp.abs(snd_sum - ref_snd).max()) < 2e-3


def test_adjacency_blocks_and_segsum():
    """Adjacency fast path: plan blocks reconstruct the edge multiset,
    and adjacency_segsum (fwd + grad) matches the XLA reference."""
    batch = _window_batch(n_graphs=5, n=40, deg=6, seed=3)
    assert batch.agg_rcv_adj is not None and batch.agg_snd_adj is not None
    TN = batch.agg_meta[0]
    A = np.asarray(batch.agg_rcv_adj, np.int64)
    snd = np.asarray(batch.senders)[np.asarray(batch.edge_mask)]
    rcv = np.asarray(batch.receivers)[np.asarray(batch.edge_mask)]
    win = np.asarray(batch.agg_rcv_win)
    ref = np.zeros_like(A)
    np.add.at(ref, (rcv // TN, rcv % TN, snd - win[rcv // TN]), 1)
    assert (A == ref).all()

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(batch.n_node, 128)).astype(np.float32))
    out = gather_segsum(batch, x, "senders", interpret=True)
    assert float(jnp.abs(out - _ref_sum(batch, x)).max()) < 1e-3
    ct = jnp.asarray(rng.normal(size=out.shape).astype(np.float32))
    g = jax.grad(
        lambda v: jnp.vdot(
            gather_segsum(batch, v, "senders", interpret=True), ct
        )
    )(x)
    g_ref = jax.grad(lambda v: jnp.vdot(_ref_sum(batch, v), ct))(x)
    assert float(jnp.abs(g - g_ref).max()) < 1e-3
    # mirrored direction
    out_r = gather_segsum(batch, x, "receivers", interpret=True)
    h = jnp.where(batch.edge_mask[:, None], x[batch.receivers], 0.0)
    ref_r = jax.ops.segment_sum(h, batch.senders, batch.n_node)
    assert float(jnp.abs(out_r - ref_r).max()) < 1e-3


# ---------------------------------------------------------------------------
# Edge-gather kernel (node->edge gather as per-block one-hot matmuls)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("at", ["senders", "receivers"])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_edge_gather_kernel_matches_masked_gather(at, dtype):
    from hydragnn_tpu.ops.fused_gather import edge_gather_raw

    batch = _window_batch()
    assert len(batch.agg_meta) > 6 and batch.eg_snd_lot is not None
    rng = np.random.default_rng(3)
    table = jnp.asarray(
        rng.normal(size=(batch.n_node, 128)).astype(np.float32)
    ).astype(dtype)
    win, lot = (
        (batch.eg_snd_win, batch.eg_snd_lot)
        if at == "senders"
        else (batch.eg_rcv_win, batch.eg_rcv_lot)
    )
    out = edge_gather_raw(
        table, jnp.asarray(win), jnp.asarray(lot), batch.n_edge,
        int(batch.agg_meta[6]), interpret=True,
    )
    idx = batch.senders if at == "senders" else batch.receivers
    ref = jnp.where(
        jnp.asarray(batch.edge_mask)[:, None], table[jnp.asarray(idx)], 0
    )
    # the 3-way bf16 split select is exact: bitwise equality
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )


def test_edge_gather_plan_covers_every_real_edge():
    batch = _window_batch(n_graphs=7, n=33, deg=5, seed=11)
    if len(batch.agg_meta) <= 6:
        pytest.skip("edge-gather plan not built for this batch")
    TE = batch.agg_meta[1]
    for win, lot, idx in (
        (batch.eg_snd_win, batch.eg_snd_lot, batch.senders),
        (batch.eg_rcv_win, batch.eg_rcv_lot, batch.receivers),
    ):
        em = np.asarray(batch.edge_mask)
        lot = np.asarray(lot)
        win = np.asarray(win)
        for e in range(batch.n_edge):
            b, r = divmod(e, TE)
            if em[e]:
                assert lot[b, r] >= 0
                assert win[b] + lot[b, r] == int(idx[e])
            else:
                assert lot[b, r] == -1


def test_segsum_senders_wsum_matches_reference():
    from hydragnn_tpu.ops.fused_gather import segsum_senders_raw

    batch = _window_batch(seed=5)
    rng = np.random.default_rng(7)
    data = jnp.asarray(rng.normal(size=(batch.n_edge, 128)).astype(np.float32))
    out = segsum_senders_raw(batch, data, interpret=True)
    ref = jax.ops.segment_sum(
        jnp.where(batch.edge_mask[:, None], data, 0.0),
        batch.senders, batch.n_node,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
