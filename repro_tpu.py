"""Minimal repro of the TPU worker crash in test_pallas_batch_training_matches_plain."""
import sys

import numpy as np

from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
from hydragnn_tpu.data.pipeline import (
    normalize_minmax,
    select_variables,
    sort_edges_by_receiver,
)
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.data.synthetic import deterministic_graph_data

samples = deterministic_graph_data(10, seed=1)
var = {"input_node_features": [0], "output_index": [0], "type": ["graph"]}
normalize_minmax(samples, [1, 1, 1], [1])
select_variables(samples, var, [1, 1, 1], [1])
for s in samples:
    s.edge_index = radius_graph(s.pos, 2.0, 100)
sort_edges_by_receiver(samples)
dims = compute_batch_dims(samples, 10)
fast = next(iter(PaddedBatcher(samples, 10, dims=dims, use_pallas_agg=True)))

import jax
import jax.numpy as jnp

from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes

print("devices", jax.devices(), flush=True)
print("n_node", fast.n_node, "n_edge", fast.senders.shape, "meta", fast.agg_meta, flush=True)

F = 128
x = jnp.asarray(np.random.default_rng(0).normal(size=(fast.n_node, F)), jnp.float32)

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("fwd", "all"):
    def f(x):
        e = gather_nodes(fast, x, at="senders")
        return aggregate(fast, e, op="sum")
    out = jax.jit(f)(x)
    print("fwd ok", float(out.sum()), flush=True)

if mode in ("grad", "all"):
    def g(x):
        e = gather_nodes(fast, x, at="senders")
        return aggregate(fast, e, op="sum").sum()
    gx = jax.jit(jax.grad(g))(x)
    print("grad ok", float(gx.sum()), flush=True)

if mode in ("rcv", "all"):
    def h(x):
        e = gather_nodes(fast, x, at="receivers")
        return aggregate(fast, e, op="sum").sum()
    gx = jax.jit(jax.grad(h))(x)
    print("rcv grad ok", float(gx.sum()), flush=True)

if mode in ("fwdmodel", "gradmodel", "train", "trainboth"):
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

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
    plain = next(iter(PaddedBatcher(samples, 10, dims=dims)))
    state = tr.init_state(plain)

    if mode == "fwdmodel":
        loss, tasks = tr.eval_step(state, fast)
        print("fwdmodel ok", float(loss), flush=True)
    elif mode == "gradmodel":
        def loss_of(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                fast, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            tot, _ = model.loss(out, fast)
            return tot
        g = jax.jit(jax.grad(loss_of))(state.params)
        print("gradmodel ok", float(jax.tree.reduce(
            lambda a, b: a + b, jax.tree.map(lambda t: t.sum(), g))), flush=True)
    elif mode == "train":
        _, l2, _ = tr.train_step(state, fast)
        print("train ok", float(l2), flush=True)
    elif mode == "trainboth":
        _, l1, _ = tr.train_step(state, plain)
        print("plain ok", float(l1), flush=True)
        _, l2, _ = tr.train_step(state, fast)
        print("fast ok", float(l2), flush=True)
print("DONE", flush=True)
