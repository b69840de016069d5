"""Transition1x example: reaction-path MLIP training.

Parses the Transition1x release HDF5 (f[split][formula][rxn] with
positions/atomic_numbers and wB97x_6-31G(d).{energy,forces}), the schema
of the reference loader
(/root/reference/examples/transition1x/utils/create_graph_data.py). Zero-
egress fallback synthesizes surrogate reaction frames in the same schema.

Usage:
  python examples/transition1x/train.py [--mlip|--energy] [--mpnn_type M]
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
    ap.add_argument("--energy", action="store_true",
                    help="energy-only regression (no force loss)")
    ap.add_argument("--mpnn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    name = "transition1x_energy.json" if args.energy else "transition1x_mlip.json"
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, name)) as f:
        config = json.load(f)
    arch = config["NeuralNetwork"]["Architecture"]
    if args.mpnn_type:
        arch["mpnn_type"] = args.mpnn_type
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples
    config["Dataset"]["path"]["total"] = os.path.join(
        here, "dataset", "transition1x-release.h5"
    )

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"transition1x {arch['mpnn_type']}"
        f"{' energy' if args.energy else ' mlip'}: "
        f"train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
