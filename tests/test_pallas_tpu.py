"""Pallas kernel tests -- run only on a real TPU backend (the CPU test env
exercises the XLA fallbacks; the driver's bench exercises this path)."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires TPU backend"
)


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
