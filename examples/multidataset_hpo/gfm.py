"""GFM multidataset trainer with CLI-exposed hyperparameters — the trial
unit of the multidataset HPO examples.

TPU-native analogue of ``/root/reference/examples/multidataset_hpo/gfm.py``:
the reference exposes --model_type/--hidden_dim/--num_conv_layers/
--num_headlayers/--dim_headlayers/--multi_model_list and trains one shared
MLIP model on the concatenated corpora; DeepHyper calls it once per trial.
Here each named corpus is the surrogate-backed loader from
``hydragnn_tpu/data/mlip_corpora.py`` (same on-disk schemas as the real
releases), each corpus gets its own per-element energy-baseline regression
before mixing (reference ``energy_per_atom_linear_regression.py``), and
``train_gfm`` is importable so the HPO driver runs trials in-process.

Usage:
  python examples/multidataset_hpo/gfm.py [--model_type M] [--hidden_dim H]
      [--num_conv_layers L] [--num_headlayers K] [--dim_headlayers D]
      [--multi_model_list ANI1x,MPTrj] [--num_samples N] [--num_epoch N]
      [--batch_size B] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def load_corpus(name: str, num_samples: int):
    """Synthesize-if-missing and load one named corpus (surrogate files in
    the exact release schemas; reference --multi_model_list names)."""
    from hydragnn_tpu.data import mlip_corpora as mc

    d = os.path.join(HERE, "dataset")
    key = name.strip().lower()
    if key == "ani1x":
        p = os.path.join(d, "ani1x-release.h5")
        if not os.path.exists(p):
            mc.synthesize_ani1x_h5(p)
        return mc.load_ani1x_h5(p, limit=num_samples)
    if key == "qm7x":
        p = os.path.join(d, "qm7x")
        if not os.path.isdir(p):
            mc.synthesize_qm7x_set(p)
        return mc.load_qm7x_dir(p, limit=num_samples)
    if key == "transition1x":
        p = os.path.join(d, "transition1x.h5")
        if not os.path.exists(p):
            mc.synthesize_transition1x_h5(p)
        return mc.load_transition1x_h5(p, limit=num_samples)
    if key == "mptrj":
        p = os.path.join(d, "MPtrj.json")
        if not os.path.exists(p):
            mc.synthesize_mptrj_json(p)
        return mc.load_mptrj_json(p, limit=num_samples)
    if key == "alexandria":
        p = os.path.join(d, "alexandria")
        if not os.path.isdir(p):
            mc.synthesize_alexandria_dir(p)
        return mc.load_alexandria_dir(p, limit=num_samples)
    if key == "qcml":
        p = os.path.join(d, "qcml.h5")
        if not os.path.exists(p):
            mc.synthesize_qcml_h5(p)
        return mc.load_qcml_h5(p, limit=num_samples)
    raise ValueError(f"unknown corpus {name!r}")


def train_gfm(
    model_type: str = "EGNN",
    hidden_dim: int = 50,
    num_conv_layers: int = 3,
    num_headlayers: int = 2,
    dim_headlayers: int = 50,
    multi_model_list: str = "ANI1x,MPTrj",
    num_samples: int = 120,
    num_epoch: int = 8,
    batch_size: int = 16,
    learning_rate: float = 2e-3,
    seed: int = 0,
) -> float:
    """Train one shared MLIP model over the named corpora; returns the
    final validation loss (the HPO objective)."""
    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.energy_regression import (
        fit_linear_energies,
        subtract_linear_energies,
    )
    from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    names = [n for n in multi_model_list.split(",") if n.strip()]
    samples = []
    for i, name in enumerate(names):
        corpus = load_corpus(name, num_samples)
        # per-corpus atomic-energy baseline before mixing
        subtract_linear_energies(corpus, fit_linear_energies(corpus))
        for s in corpus:
            s.dataset_id = i
            if s.edge_index is None:
                s.edge_index = radius_graph(s.pos, 5.0, 32)
        samples.extend(corpus)
    sort_edges_by_receiver(samples)
    rng = np.random.default_rng(seed)
    samples = [samples[i] for i in rng.permutation(len(samples))]
    n_val = max(len(samples) // 10, 1)
    val, train = samples[:n_val], samples[n_val:]

    node_head = {
        "num_headlayers": num_headlayers,
        "dim_headlayers": [dim_headlayers] * num_headlayers,
        "type": "mlp",
    }
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=hidden_dim,
        output_dim=(1,),
        output_type=("node",),
        node_branches=normalize_branches(node_head),
        task_weights=(1.0,),
        num_conv_layers=num_conv_layers,
        equivariance=True,
        max_ell=1,
        node_max_ell=1,
        num_radial=8,
        radius=5.0,
        avg_num_neighbors=12.0,
    )
    model = create_model(model_type, cfg)
    weights = {
        "energy_weight": 1.0,
        "energy_peratom_weight": 1.0,
        "force_weight": 10.0,
    }
    trainer = Trainer(
        model, {"type": "AdamW", "learning_rate": learning_rate}, mlip=weights
    )

    dims = compute_batch_dims(samples, batch_size)
    train_ld = PaddedBatcher(train, batch_size, shuffle=True, seed=1, dims=dims)
    val_ld = PaddedBatcher(val, batch_size, dims=dims)
    state = trainer.init_state(next(iter(train_ld)))
    v_loss = float("inf")
    for epoch in range(num_epoch):
        train_ld.set_epoch(epoch)
        state, tr_loss, _ = trainer.run_epoch(state, train_ld)
        v_loss, _ = trainer.evaluate(state, val_ld)
        print(f"epoch {epoch}: train {tr_loss:.5f} val {v_loss:.5f}")
    return float(v_loss)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_type", default="EGNN")
    ap.add_argument("--hidden_dim", type=int, default=50)
    ap.add_argument("--num_conv_layers", type=int, default=3)
    ap.add_argument("--num_headlayers", type=int, default=2)
    ap.add_argument("--dim_headlayers", type=int, default=50)
    ap.add_argument("--multi_model_list", default="ANI1x,MPTrj")
    ap.add_argument("--num_samples", type=int, default=120)
    ap.add_argument("--num_epoch", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    val = train_gfm(
        model_type=args.model_type,
        hidden_dim=args.hidden_dim,
        num_conv_layers=args.num_conv_layers,
        num_headlayers=args.num_headlayers,
        dim_headlayers=args.dim_headlayers,
        multi_model_list=args.multi_model_list,
        num_samples=args.num_samples,
        num_epoch=args.num_epoch,
        batch_size=args.batch_size,
    )
    print(f"gfm {args.model_type} [{args.multi_model_list}]: val {val:.6f}")
    return val


if __name__ == "__main__":
    main()
