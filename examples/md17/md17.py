"""MD17 example driver — energy regression (reference
``/root/reference/examples/md17/md17.py:46-140``) and MLIP
energy+gradient-force training (``md17_mlip.py``; BASELINE config 3:
MD17 EGNN/PaiNN MLIP with forces = -dE/dpos via jax.grad).

Parses the canonical MD17 npz schema (z/R/E/F); in this zero-egress
environment a surrogate uracil-like trajectory with ANALYTIC forces is
synthesized in the same schema if the file is missing (data/md17.py), so
force-consistency is exactly learnable and the full pipeline runs.

Usage:
  python examples/md17/md17.py [--mlip] [--mpnn_type EGNN|PAINN|SchNet]
      [--num_epoch N] [--num_samples N] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mlip", action="store_true", help="energy+force training")
    ap.add_argument("--mpnn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    name = "md17_mlip.json" if args.mlip else "md17.json"
    with open(os.path.join(os.path.dirname(__file__), name)) as f:
        config = json.load(f)
    arch = config["NeuralNetwork"]["Architecture"]
    if args.mpnn_type:
        arch["mpnn_type"] = args.mpnn_type
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples
    config["Dataset"]["path"]["total"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "dataset", "md17", "md17_uracil.npz",
    )

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"md17 {arch['mpnn_type']}{' mlip' if args.mlip else ''}: "
        f"train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
