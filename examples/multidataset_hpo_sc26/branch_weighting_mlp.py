"""Composition-conditioned MLP weighting of per-branch MLIP predictions.

TPU-native analogue of
``/root/reference/examples/multidataset_hpo_sc26/branch_weighting_mlp.py``:
the reference loads a pretrained multi-branch model, evaluates EVERY
decoder branch on each structure, and trains a small MLP on
``chemical_composition`` (118-bin element histogram) that outputs softmax
branch weights, so the fused prediction is a learned per-structure mixture
of the branch experts. Here the branch sweep is one vmapped re-route
(overriding ``GraphBatch.dataset_id`` per branch) through the shared
encoder + per-branch decoders, and the MLP trains with optax on the
weighted-energy MSE.

Usage:
  python examples/multidataset_hpo_sc26/branch_weighting_mlp.py
      [--num_samples N] [--num_epoch N] [--mlp_epochs N] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def composition_histogram(z, bins=118):
    """118-bin element histogram, the reference's chemical_composition."""
    h, _ = np.histogram(np.asarray(z, np.int64), bins=range(1, bins + 2))
    return (h / max(h.sum(), 1)).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, default=128)
    ap.add_argument("--num_epoch", type=int, default=8)
    ap.add_argument("--mlp_epochs", type=int, default=200)
    ap.add_argument("--n_branch", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import optax

    from utils import random_structures, structure_to_graph, train_quick_mlip

    from hydragnn_tpu.data.batching import PaddedBatcher
    from hydragnn_tpu.models.mlip import predict_energy_forces

    # pretrained multi-branch MLIP (branch b trained on the b-th slice)
    model, state, _, dims = train_quick_mlip(
        num_samples=args.num_samples,
        num_epoch=args.num_epoch,
        n_branch=args.n_branch,
    )

    structures = random_structures(64, seed=77)
    comps = np.stack([composition_histogram(z) for z, _, _, _ in structures])
    e_true = np.asarray([e for _, _, e, _ in structures], np.float32)

    predict = jax.jit(
        lambda g: predict_energy_forces(model, state.params, state.batch_stats, g)[0]
    )

    # per-branch energies: re-route every structure through each decoder
    # branch by overriding dataset_id
    per_branch = np.zeros((len(structures), args.n_branch), np.float32)
    samples = [structure_to_graph(z, pos) for z, pos, _, _ in structures]
    for b in range(args.n_branch):
        i = 0
        for batch in PaddedBatcher(samples, 16, dims=dims):
            routed = batch.replace(
                dataset_id=jnp.full_like(batch.dataset_id, b)
            )
            e = np.asarray(predict(routed))
            real = np.asarray(batch.graph_mask)
            per_branch[i : i + int(real.sum()), b] = e[real]
            i += int(real.sum())

    # small MLP: composition -> softmax branch weights
    def mlp(params, c):
        h = jnp.tanh(c @ params["w1"] + params["b1"])
        return jax.nn.softmax(h @ params["w2"] + params["b2"], axis=-1)

    rng = np.random.default_rng(0)
    params = {
        "w1": jnp.asarray(rng.normal(0, 0.1, (118, 32)), jnp.float32),
        "b1": jnp.zeros(32),
        "w2": jnp.asarray(rng.normal(0, 0.1, (32, args.n_branch)), jnp.float32),
        "b2": jnp.zeros(args.n_branch),
    }

    def loss_fn(params, c, eb, et):
        w = mlp(params, c)  # [B, n_branch]
        pred = (w * eb).sum(-1)
        return jnp.mean((pred - et) ** 2)

    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, c, eb, et):
        loss, g = jax.value_and_grad(loss_fn)(params, c, eb, et)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    c = jnp.asarray(comps)
    eb = jnp.asarray(per_branch)
    et = jnp.asarray(e_true)
    uniform = float(jnp.mean((per_branch.mean(-1) - e_true) ** 2))
    for it in range(args.mlp_epochs):
        params, opt, loss = step(params, opt, c, eb, et)
    print(
        f"branch weighting: uniform-average MSE {uniform:.5f} -> "
        f"learned-MLP MSE {float(loss):.5f} over {args.n_branch} branches"
    )
    assert float(loss) <= uniform + 1e-6
    return float(loss)


if __name__ == "__main__":
    main()
