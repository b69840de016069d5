"""Multidataset GFM hyperparameter search.

TPU-native analogue of
``/root/reference/examples/multidataset_hpo/gfm_deephyper_multi.py``: the
reference defines a DeepHyper problem over (mpnn_type, hidden_dim,
num_conv_layers, num_headlayers, dim_headlayers, learning_rate) and
launches ``gfm.py`` once per trial across SLURM nodes. Here the same
space drives the dependency-free harness in ``hydragnn_tpu/hpo.py`` with
an in-process objective calling ``gfm.train_gfm`` (no scheduler layer —
`jax.distributed` replaces the node-list plumbing).

Usage:
  python examples/multidataset_hpo/gfm_hpo.py [--trials N] [--num_epoch N]
      [--num_samples N] [--multi_model_list ANI1x,MPTrj] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

# the reference DeepHyper problem space (gfm_deephyper_multi.py:
# add_hyperparameter calls), minus the scheduler-specific knobs
SPACE = {
    "model_type": ["EGNN", "SchNet", "PNAPlus"],
    "hidden_dim": ["int", 24, 64],
    "num_conv_layers": ["int", 2, 4],
    "num_headlayers": ["int", 1, 3],
    "dim_headlayers": ["int", 24, 64],
    "learning_rate": ["log", 3e-4, 6e-3],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--num_epoch", type=int, default=4)
    ap.add_argument("--num_samples", type=int, default=80)
    ap.add_argument("--multi_model_list", default="ANI1x,MPTrj")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gfm import train_gfm

    from hydragnn_tpu.hpo import random_search

    def objective(cfg):
        # cfg carries the sampled overrides under flat keys
        hp = cfg["hp"]
        return train_gfm(
            model_type=hp["model_type"],
            hidden_dim=hp["hidden_dim"],
            num_conv_layers=hp["num_conv_layers"],
            num_headlayers=hp["num_headlayers"],
            dim_headlayers=hp["dim_headlayers"],
            learning_rate=hp["learning_rate"],
            multi_model_list=args.multi_model_list,
            num_samples=args.num_samples,
            num_epoch=args.num_epoch,
        )

    space = {f"hp.{k}": v for k, v in SPACE.items()}
    best, best_val, log = random_search(
        {"Dataset": {"name": "gfm"}},
        space,
        num_trials=args.trials,
        objective=objective,
        log_path="gfm_hpo_trials.json",
    )
    print("best overrides:", json.dumps(best))
    print(f"best val loss: {best_val:.6f} over {len(log)} trials")
    return best, best_val


if __name__ == "__main__":
    main()
