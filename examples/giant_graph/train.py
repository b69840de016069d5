"""Giant-graph partitioned training: ONE graph sharded across the mesh.

The reference cannot do this at all — each PyG graph must fit one rank
(SURVEY.md §2.2 'SP/CP' row); its scale axis is the dataset. Here a single
lattice graph far beyond one device's batch budget is node-partitioned over
a 'graph' mesh axis and a message-passing network trains on it end to end:

  * node features, targets and masks are sharded by contiguous node block;
  * every layer's sender-gather + segment-sum runs through the explicit
    halo exchange (parallel/halo.py) — one tiled all_to_all per layer for
    the boundary rows, with the local partial sum overlapping it;
  * parameters are replicated; gradients psum over the mesh; the backward
    pass emits exactly one reverse all_to_all per layer (linear transpose).

Run (virtual 8-device mesh; on a pod the same code rides ICI):
  python examples/giant_graph/train.py [--nodes-per-shard N] [--epochs N]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np


def build_giant_lattice(n_nodes, seed=0):
    """Connected 3-D lattice graph with a learnable nodal target."""
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.sample import GraphSample

    side = int(round(n_nodes ** (1.0 / 3.0)))
    g = np.stack(
        np.meshgrid(*([np.arange(side)] * 3), indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float32)
    rng = np.random.default_rng(seed)
    pos = g + rng.normal(0, 0.05, g.shape).astype(np.float32)
    x = rng.normal(size=(len(pos), 1)).astype(np.float32)
    ei = radius_graph(pos, 1.3, 16)
    # target: local average of neighbors' features (one-hop learnable)
    deg = np.bincount(ei[1], minlength=len(pos))
    nb_sum = np.zeros((len(pos), 1), np.float32)
    np.add.at(nb_sum, ei[1], x[ei[0]])
    y = nb_sum / np.maximum(deg, 1)[:, None] + 0.5 * x
    return GraphSample(x=x, pos=pos, edge_index=ei, y_node=y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes-per-shard", type=int, default=2048)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stack", action="store_true",
                    help="train the production ConvStack on the halo view")
    ap.add_argument("--mlip", action="store_true",
                    help="with --stack: EGNN energy head + gradient forces")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from hydragnn_tpu.parallel.halo import make_halo_train_fns

    if args.stack:
        return main_stack(
            nodes_per_shard=args.nodes_per_shard, epochs=args.epochs,
            mlip=args.mlip,
        )

    S = len(jax.devices())
    sample = build_giant_lattice(args.nodes_per_shard * S)
    print(
        f"giant graph: {sample.num_nodes} nodes, "
        f"{sample.edge_index.shape[1]} edges over {S} shards"
    )

    step, init, plan = make_halo_train_fns(
        sample, n_shards=S, hidden=args.hidden, layers=args.layers, seed=0
    )
    cb = plan.comm_bytes(args.hidden)
    print(
        f"halo exchange: {cb['halo_bytes']/1e6:.2f} MB/device/layer "
        f"({100*cb['halo_fraction_of_allgather']:.1f}% of the all-gather)"
    )
    params = init()
    import optax

    tx = optax.adam(3e-3)
    opt = tx.init(params)
    for epoch in range(args.epochs):
        (loss, grads) = step(params)
        upd, opt = tx.update(grads, opt)
        params = jax.tree.map(lambda p, u: p + u, params, upd)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: mse {float(loss):.6f}")
    return float(loss)




def main_stack(nodes_per_shard=1024, epochs=30, mlip=False):
    """Production-stack mode: the standard ConvStack (GIN, or EGNN with
    gradient forces under --mlip) trains on the partitioned giant graph via
    build_stack_halo_view — the same model families run_training uses,
    on a graph no single device could batch."""
    import jax

    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.parallel.graph_shard import make_graph_mesh
    from hydragnn_tpu.parallel.halo import (
        build_stack_halo_view,
        make_stack_halo_train_fns,
    )
    from hydragnn_tpu.train.loop import Trainer

    S = len(jax.devices())
    sample = build_giant_lattice(nodes_per_shard * S)
    node_head = {"num_headlayers": 2, "dim_headlayers": [64, 64], "type": "mlp"}
    if mlip:
        rng = np.random.default_rng(0)
        i, j = sample.edge_index
        d = np.linalg.norm(sample.pos[j] - sample.pos[i], axis=1)
        # harmonic surrogate energy/forces on the lattice edges
        e_pair = 0.5 * 50.0 * (d - 1.0) ** 2
        sample.energy = float(e_pair.sum() / 2)
        g = (50.0 * (d - 1.0) / np.maximum(d, 1e-9))[:, None] * (
            sample.pos[j] - sample.pos[i]
        )
        f = np.zeros_like(sample.pos)
        np.add.at(f, i, g)
        np.add.at(f, j, -g)
        sample.forces = (f / 2).astype(np.float32)
        sample.y_node = None
        cfg = StackConfig(
            input_dim=1, hidden_dim=64, output_dim=(1,), output_type=("node",),
            node_branches=normalize_branches(node_head), task_weights=(1.0,),
            num_conv_layers=3, equivariance=False, max_ell=1, node_max_ell=1,
            num_radial=8, radius=1.5, avg_num_neighbors=8.0,
        )
        model = create_model("EGNN", cfg)
        w = {"energy_weight": 0.1, "energy_peratom_weight": 1.0,
             "force_weight": 10.0}
        view, plan, full = build_stack_halo_view(sample, S, aggregate_at="senders")
    else:
        cfg = StackConfig(
            input_dim=1, hidden_dim=64, output_dim=(1,), output_type=("node",),
            node_branches=normalize_branches(node_head), task_weights=(1.0,),
            num_conv_layers=3,
        )
        model = create_model("GIN", cfg)
        w = None
        view, plan, full = build_stack_halo_view(sample, S)

    print(
        f"stack mode: {sample.num_nodes} nodes over {S} shards "
        f"({'EGNN MLIP forces' if mlip else 'GIN node regression'})"
    )
    tr = Trainer(model, {"type": "AdamW", "learning_rate": 2e-3}, mlip=w)
    mesh = make_graph_mesh(S)
    step, eval_loss, dev_view = make_stack_halo_train_fns(
        model, tr.tx, mesh, view, mlip=w
    )
    state = tr.init_state(full)
    for epoch in range(epochs):
        state, loss, tasks = step(state, dev_view)
        if epoch % 10 == 0 or epoch == epochs - 1:
            print(f"epoch {epoch}: loss {float(loss):.6f}")
    return float(loss)


if __name__ == "__main__":
    main()
