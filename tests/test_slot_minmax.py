"""Neighbor-slot segment extrema (ops/slot_minmax.py) on the CPU
interpreter: forward extrema + tie counts vs a dense numpy reference,
tie-averaged gradients vs the XLA segment-op composition, and the padded
Pallas window combine vs the dense coverage sum.  Reference anchor:
torch_scatter scatter_min/scatter_max on the PNA aggregator path
(``hydragnn/models/PNAStack.py:19-70``)."""

import numpy as np

import jax
import jax.numpy as jnp

from hydragnn_tpu.ops.slot_minmax import (
    _has_slots,
    fused_minmax_slots,
    slot_minmax_raw,
)
from tests.test_fused_gather import _window_batch


def _dense_ref(batch, h_i, h_j):
    snd = np.asarray(batch.senders)
    rcv = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    N, F = h_i.shape
    h = np.asarray(h_i)[rcv] + np.asarray(h_j)[snd]
    mn = np.full((N, F), np.inf)
    mx = np.full((N, F), -np.inf)
    for e in range(batch.n_edge):
        if em[e]:
            mn[rcv[e]] = np.minimum(mn[rcv[e]], h[e])
            mx[rcv[e]] = np.maximum(mx[rcv[e]], h[e])
    mn[~np.isfinite(mn)] = 0.0
    mx[~np.isfinite(mx)] = 0.0
    return mn, mx


def test_slot_plan_present_and_consistent():
    batch = _window_batch(n_graphs=4, n=40, deg=6, seed=2)
    assert _has_slots(batch)
    nbr = np.asarray(batch.agg_nbr_lot)
    nd = np.asarray(batch.agg_nbr_nd)
    win = np.asarray(batch.agg_rcv_win)
    TN = batch.agg_meta[0]
    Dmax = batch.agg_meta[7]
    assert Dmax % 8 == 0 and nbr.shape[1] == Dmax
    snd = np.asarray(batch.senders)
    rcv = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    # every real edge appears exactly once as a (tile-row, slot) entry
    # pointing at its sender in window-local coordinates
    counts = np.zeros(batch.n_node, int)
    for t in range(nbr.shape[0]):
        for d in range(Dmax):
            for n in range(TN):
                j = nbr[t, d, n]
                if j >= 0:
                    counts[t * TN + n] += 1
                    assert d < nd[t]
    np.testing.assert_array_equal(
        counts, np.bincount(rcv[em], minlength=batch.n_node)
    )
    # spot-check values: first real edge of each receiver
    for e in range(batch.n_edge):
        if em[e]:
            t, row = rcv[e] // TN, rcv[e] % TN
            assert (win[t] + nbr[t, :, row][nbr[t, :, row] >= 0] == snd[e]).any()
            break


def test_slot_minmax_matches_dense_reference():
    batch = _window_batch(n_graphs=4, n=40, deg=6, seed=2)
    rng = np.random.default_rng(3)
    F = 128
    h_i = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    h_j = jnp.asarray(rng.normal(size=(batch.n_node, F)).astype(np.float32))
    mn, mx = fused_minmax_slots(batch, h_i, h_j, interpret=True)
    ref_mn, ref_mx = _dense_ref(batch, h_i, h_j)
    assert float(np.abs(np.asarray(mn) - ref_mn).max()) < 1e-4
    assert float(np.abs(np.asarray(mx) - ref_mx).max()) < 1e-4


def test_slot_tie_counts_exact_on_duplicate_edges():
    """Duplicate edges (same sender twice, the PBC-image case) must
    count as ties in the raw kernel's cnt outputs."""
    batch = _window_batch(n_graphs=4, n=40, deg=5, seed=5)
    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.normal(size=(batch.n_node, 128)).astype(np.float32))
    mn, mx, cmn, cmx = slot_minmax_raw(batch, v, interpret=True)
    snd = np.asarray(batch.senders)
    rcv = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    vn = np.asarray(v)
    for n in (int(rcv[em][0]), int(rcv[em][7])):
        nbrs = snd[em & (rcv == n)]
        vals = vn[nbrs]  # [deg, F]
        np.testing.assert_allclose(
            np.asarray(mn)[n], vals.min(0), atol=1e-5
        )
        # tie count = multiplicity of the min among neighbor SLOTS
        expect = (vals == vals.min(0, keepdims=True)).sum(0)
        np.testing.assert_array_equal(np.asarray(cmn)[n], expect)


def test_slot_grads_match_xla_segment_reference():
    from hydragnn_tpu.ops.segment import segment_max, segment_min

    batch = _window_batch(n_graphs=4, n=40, deg=6, seed=2)
    rng = np.random.default_rng(3)
    F = 128
    N = batch.n_node
    h_i = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    h_j = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ct1 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
    ct2 = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def loss_slots(a, b):
        mn_, mx_ = fused_minmax_slots(batch, a, b, interpret=True)
        return jnp.sum(mn_ * ct1) + jnp.sum(mx_ * ct2)

    def loss_ref(a, b):
        hh = a[batch.receivers] + b[batch.senders]
        kw = dict(mask=batch.edge_mask, indices_are_sorted=False)
        mn_ = segment_min(hh, batch.receivers, N, **kw)
        mx_ = segment_max(hh, batch.receivers, N, **kw)
        return jnp.sum(mn_ * ct1) + jnp.sum(mx_ * ct2)

    g = jax.grad(loss_slots, (0, 1))(h_i, h_j)
    gr = jax.grad(loss_ref, (0, 1))(h_i, h_j)
    for a, b, name in zip(g, gr, ("d_hi", "d_hj")):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 1e-4 * scale, name


def test_combine_window_pallas_matches_dense_coverage():
    """The padded Pallas combine equals the explicit coverage sum
    out[n] = sum_t partial[t, n - win[t]] over windows containing n."""
    from hydragnn_tpu.ops.fused_gather import combine_window_pallas

    batch = _window_batch(n_graphs=4, n=40, deg=6, seed=9)
    TN = batch.agg_meta[0]
    W = int(batch.agg_meta[4])
    win = np.asarray(batch.agg_rcv_win)
    n_node = batch.n_node
    T = n_node // TN
    PAD = 128
    rng = np.random.default_rng(10)
    F = 128
    partial = rng.normal(size=(T, W, F)).astype(np.float32)
    padded = np.zeros((T, W + 2 * PAD, F), np.float32)
    padded[:, PAD : PAD + W, :] = partial
    out = combine_window_pallas(
        jnp.asarray(padded.reshape(T * (W + 2 * PAD), F)),
        jnp.asarray(win), n_node, TN, W, pad=PAD, interpret=True,
    )
    ref = np.zeros((n_node, F), np.float32)
    for t in range(T):
        for r in range(W):
            n = win[t] + r
            if 0 <= n < n_node:
                ref[n] += partial[t, r]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)
