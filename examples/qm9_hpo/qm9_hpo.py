"""QM9 HPO example: random search / ASHA over the QM9 GIN config.

TPU-native analogue of ``/root/reference/examples/qm9_hpo/{qm9_optuna.py,
qm9_deephyper.py}`` — the same search space (mpnn type, hidden dim, layer
count, lr) driven through the dependency-free harness in
``hydragnn_tpu/hpo.py`` instead of Optuna/DeepHyper (neither ships in this
environment; the dotted-key space mirrors their dict schema so an external
driver can substitute its own `objective`).

Usage:
  python examples/qm9_hpo/qm9_hpo.py [--trials N] [--asha] [--num_epoch N]
      [--num_samples N] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

SPACE = {
    # the reference optuna driver's space (qm9_optuna.py): model type,
    # width, depth, learning rate
    "NeuralNetwork.Architecture.mpnn_type": ["GIN", "PNA", "SAGE"],
    "NeuralNetwork.Architecture.hidden_dim": ["int", 16, 64],
    "NeuralNetwork.Architecture.num_conv_layers": ["int", 2, 4],
    "NeuralNetwork.Training.Optimizer.learning_rate": ["log", 1e-4, 2e-2],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=6)
    ap.add_argument("--asha", action="store_true",
                    help="successive halving instead of random search")
    ap.add_argument("--num_epoch", type=int, default=6)
    ap.add_argument("--num_samples", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workers", type=int, default=1,
                    help="concurrent subprocess trials (TrialPool; the "
                    "reference deephyper driver's parallel per-trial jobs)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    with open(
        os.path.join(os.path.dirname(__file__), "..", "qm9", "qm9.json")
    ) as f:
        config = json.load(f)
    config["Dataset"]["num_samples"] = args.num_samples
    config["Dataset"]["path"]["total"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "qm9", "dataset", "qm9", "raw",
    )
    config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    config.setdefault("Visualization", {})["create_plots"] = False

    from hydragnn_tpu.hpo import random_search, successive_halving

    if args.asha:
        best, best_val, log = successive_halving(
            config, SPACE, num_trials=args.trials, min_epochs=2,
            workers=args.workers,
        )
    else:
        best, best_val, log = random_search(
            config, SPACE, num_trials=args.trials,
            log_path="qm9_hpo_trials.json",
            workers=args.workers,
        )
    print("best overrides:", json.dumps(best))
    print(f"best val loss: {best_val:.6f} over {len(log)} trials")
    return best, best_val


if __name__ == "__main__":
    main()
