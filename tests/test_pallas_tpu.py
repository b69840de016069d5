"""Pallas kernel tests -- run only on a real TPU backend (the CPU test env
exercises the XLA fallbacks; the driver's bench exercises this path).

Run with ``HYDRAGNN_TPU_TEST_BACKEND=tpu``.  Known axon-tunnel quirk: the
single-client TPU worker can crash ("UNAVAILABLE: TPU worker process
crashed") when the end-to-end batch-training test runs LATE in the
process (verified 2026-08-17: fails as the 6th test, passes standalone,
in pairs, and as the FIRST test with all others following — and its loss
matches the XLA path bitwise in every passing run, so it is a tunnel
stability issue, not a kernel bug).  Test order in this file is therefore
deliberate: the train-step tests run first."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU backend"
)


def test_pallas_batch_training_matches_plain():
    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.pipeline import (
        normalize_minmax,
        select_variables,
        sort_edges_by_receiver,
    )
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.synthetic import deterministic_graph_data
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    samples = deterministic_graph_data(10, seed=1)
    var = {"input_node_features": [0], "output_index": [0], "type": ["graph"]}
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
    sort_edges_by_receiver(samples)
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=128,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(
            {"num_sharedlayers": 1, "dim_sharedlayers": 8,
             "num_headlayers": 1, "dim_headlayers": [8]}
        ),
        task_weights=(1.0,),
        num_conv_layers=2,
    )
    model = create_model("GIN", cfg)
    tr = Trainer(model, {"type": "AdamW", "learning_rate": 1e-2})
    dims = compute_batch_dims(samples, 10)
    plain = next(iter(PaddedBatcher(samples, 10, dims=dims)))
    fast = next(iter(PaddedBatcher(samples, 10, dims=dims, use_pallas_agg=True)))
    state = tr.init_state(plain)
    _, l1, _ = tr.train_step(state, plain)
    _, l2, _ = tr.train_step(state, fast)
    assert abs(float(l1) - float(l2)) < 2e-4


def _strip_windows(batch):
    import dataclasses

    return dataclasses.replace(
        batch,
        agg_rcv_lot=None,
        agg_rcv_win=None,
        agg_snd_lot=None,
        agg_snd_win=None,
        agg_meta=batch.agg_meta[:4],
    )


def test_fused_window_pna_step_matches_unfused():
    """PNA train step on the fused gather->combine->reduce path
    (ops/fused_gather.py, h never in HBM) vs the same batch with window
    plans stripped (the r02 gather+segment composition)."""
    from bench import _mk_cfg, build_bench_batch
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    batch = build_bench_batch(n_graphs=8)
    assert len(batch.agg_meta) >= 5 and batch.agg_rcv_lot is not None
    cfg = _mk_cfg(
        "PNA", 256, 2,
        pna_deg=tuple(np.bincount(np.full(2048, 16)).tolist()),
    )
    model = create_model("PNA", cfg)
    tr = Trainer(model, {"type": "AdamW", "learning_rate": 1e-3})
    state = tr.init_state(batch)
    _, l1, _ = jax.jit(tr.train_step)(state, batch)
    _, l2, _ = jax.jit(tr.train_step)(state, _strip_windows(batch))
    l1, l2 = float(l1), float(l2)
    assert np.isfinite(l1)
    assert abs(l1 - l2) / max(abs(l2), 1.0) < 1e-3, (l1, l2)


def test_fused_window_gin_step_matches_unfused():
    """GIN neighbor_reduce on the fused linear kernel vs the unfused
    composition (same batch, windows stripped)."""
    from bench import _mk_cfg, build_bench_batch
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    batch = build_bench_batch(n_graphs=8)
    cfg = _mk_cfg("GIN", 256, 2)
    model = create_model("GIN", cfg)
    tr = Trainer(model, {"type": "AdamW", "learning_rate": 1e-3})
    state = tr.init_state(batch)
    _, l1, _ = jax.jit(tr.train_step)(state, batch)
    _, l2, _ = jax.jit(tr.train_step)(state, _strip_windows(batch))
    l1, l2 = float(l1), float(l2)
    assert np.isfinite(l1)
    assert abs(l1 - l2) / max(abs(l2), 1.0) < 1e-3, (l1, l2)


def test_pallas_segment_sum_matches_xla():
    import jax.numpy as jnp

    from hydragnn_tpu.ops.pallas_segment import (
        plan_segment_tiles,
        sorted_segment_sum_pallas,
    )

    rng = np.random.default_rng(0)
    N, F = 1024, 256
    rcv_real = np.sort(rng.integers(0, N - 1, N * 12))
    E = ((len(rcv_real) + 63) // 64) * 64 + 64
    rcv = np.full(E, N - 1, np.int32)
    rcv[: len(rcv_real)] = rcv_real
    mask = np.zeros(E, bool)
    mask[: len(rcv_real)] = True
    data = rng.normal(size=(E, F)).astype(np.float32)
    plan = plan_segment_tiles(rcv, mask, N, 128, 512)
    out = sorted_segment_sum_pallas(
        jnp.asarray(data), jnp.asarray(rcv), jnp.asarray(mask), N, plan
    )
    ref = jax.ops.segment_sum(
        jnp.where(jnp.asarray(mask)[:, None], jnp.asarray(data), 0),
        jnp.asarray(rcv),
        N,
    )
    assert float(jnp.abs(out - ref).max()) < 1e-3


def test_pallas_segment_minmax_exact_and_grad():
    """Fused min+max kernel: forward bitwise-exact vs the XLA segment ops;
    backward matches the numpy even-tie-split subgradient (see
    ops/aggregate.py segment_minmax docstring for the tie semantics)."""
    import jax.numpy as jnp

    from bench import build_bench_batch
    from hydragnn_tpu.ops.aggregate import gather_nodes, segment_minmax
    from hydragnn_tpu.ops.segment import segment_max, segment_min

    batch = build_bench_batch(n_graphs=4)
    N = batch.node_mask.shape[0]
    F = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def mm(v):
        h = gather_nodes(batch, v, "senders")
        return segment_minmax(batch, h)

    mn, mx = jax.jit(mm)(x)
    h = x[batch.senders]
    kw = dict(mask=batch.edge_mask, indices_are_sorted=True)
    assert bool(jnp.all(mx == segment_max(h, batch.receivers, N, **kw)))
    assert bool(jnp.all(mn == segment_min(h, batch.receivers, N, **kw)))

    def loss(v):
        a, b = mm(v)
        return jnp.sum(a * 0.3 + b * 0.7)

    g = np.asarray(jax.jit(jax.grad(loss))(x))
    # numpy even-tie-split reference
    snd = np.asarray(batch.senders)
    rcv = np.asarray(batch.receivers)
    em = np.asarray(batch.edge_mask)
    hn = np.asarray(h)
    gd = np.zeros_like(hn)
    for r in np.unique(rcv[em]):
        e = np.where((rcv == r) & em)[0]
        vals = hn[e]
        smn = vals == vals.min(0)
        smx = vals == vals.max(0)
        gd[e] += 0.3 * smn / smn.sum(0) + 0.7 * smx / smx.sum(0)
    ref = np.zeros((N, F), np.float32)
    np.add.at(ref, snd[em], gd[em])
    assert np.abs(g - ref).max() < 1e-3


@pytest.mark.parametrize("per_graph", [False, True])
def test_flash_attention_matches_dense(per_graph, monkeypatch):
    """GPS _mha flash path (Pallas FlashAttention + segment ids) vs the
    dense einsum fallback, same params, both attention modes."""
    import jax.numpy as jnp
    from flax import linen as nn

    from hydragnn_tpu.models import gps as gps_mod

    N, C, H = 256, 128, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    node_mask = jnp.asarray(np.arange(N) < 200)
    node_graph = jnp.asarray(np.minimum(np.arange(N) // 100, 1).astype(np.int32))

    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, v):
            return gps_mod._mha(v, node_mask, node_graph, per_graph, C, H)

    m = Wrap()
    params = m.init(jax.random.PRNGKey(0), x)
    flash = m.apply(params, x)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    dense = m.apply(params, x)
    err = float(
        jnp.abs((flash - dense) * node_mask[:, None]).max()
    )
    assert err < 2e-2  # bf16 matmul rounding on the dense path


def test_pallas_force_training_grad_of_grad():
    """MLIP force-training step (grad-of-grad through the linear_call
    aggregation ops) runs on the Pallas path and matches the XLA fallback
    on the same batch."""
    import dataclasses

    import jax.numpy as jnp

    import bench
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    batch = bench.build_bench_batch(n_graphs=4)
    cfg = bench._mk_cfg(
        "EGNN", 256, 2, output_dim=(1,), output_type=("node",),
        head_levels=("node",), task_weights=(1.0,), equivariance=True,
        max_ell=1, node_max_ell=1, num_radial=8, radius=4.0,
        avg_num_neighbors=16.0,
    )
    model = create_model("EGNN", cfg)
    w = {"energy_weight": 1.0, "energy_peratom_weight": 1.0, "force_weight": 25.0}
    tr = Trainer(
        model, {"type": "AdamW", "learning_rate": 1e-3}, mlip=w, precision="fp32"
    )
    state = tr.init_state(batch)
    nofast = dataclasses.replace(batch, agg_meta=None)
    _, l1, _ = jax.jit(tr.train_step)(state, batch)
    _, l2, _ = jax.jit(tr.train_step)(state, nofast)
    l1, l2 = float(l1), float(l2)
    assert np.isfinite(l1) and np.isfinite(l2)
    assert abs(l1 - l2) / max(abs(l2), 1.0) < 1e-3




def test_flash_attention_small_d_parity():
    """Small-head-dim flash kernel vs the dense einsum reference: forward
    and all three input grads, both dense and block-sparse modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydragnn_tpu.ops.flash_attention import flash_attention_small_d

    H, N, D = 2, 1536, 32
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(H, N, D)), jnp.float32) for _ in range(3)
    )
    seg = jnp.asarray(np.repeat(np.arange(6), 256).astype(np.int32))
    sm = D**-0.5

    def ref(q, k, v):
        s = jnp.einsum("hnd,hmd->hnm", q, k) * sm
        mask = seg[:, None] == seg[None, :]
        s = jnp.where(mask[None], s, -1e30)
        return jnp.einsum("hnm,hmd->hnd", jax.nn.softmax(s, -1), v)

    o_ref = ref(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v) ** 2), (0, 1, 2)
    )(q, k, v)
    for bs in (False, True):
        o = flash_attention_small_d(q, k, v, seg, sm, bs)
        assert float(jnp.abs(o - o_ref).max()) < 5e-3
        g = jax.grad(
            lambda q, k, v: jnp.sum(
                flash_attention_small_d(q, k, v, seg, sm, bs) ** 2
            ),
            (0, 1, 2),
        )(q, k, v)
        for a, b in zip(g, g_ref):
            rel = float(jnp.abs(a - b).max() / jnp.abs(b).max())
            assert rel < 3e-2, rel
