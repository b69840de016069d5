"""Alexandria example: DFT crystal-database MLIP training.

Parses directories of Alexandria JSON files (pymatgen
ComputedStructureEntry dicts with per-site forces in
structure.sites[].properties.forces), the schema of the reference driver
(/root/reference/examples/alexandria/train.py:148-330). Zero-egress
fallback synthesizes periodic Morse crystals in the same schema.

Usage:
  python examples/alexandria/train.py [--mlip|--energy] [--mpnn_type M]
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

    name = "alexandria_energy.json" if args.energy else "alexandria_forces.json"
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
        here, "dataset", "alexandria"
    )

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"alexandria {arch['mpnn_type']}"
        f"{' energy' if args.energy else ' mlip'}: "
        f"train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
