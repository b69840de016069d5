"""OGB-style HOMO-LUMO gap example (SMILES csv corpus).

TPU-native analogue of ``/root/reference/examples/ogb/train_gap.py``: csv
rows of molecules (SMILES + gap value) -> molecular graphs with the
reference feature layout -> config-driven training. Identical machinery to
examples/csce (the reference drivers differ only in their csv layouts);
kept as its own driver to mirror the reference's example set.

Usage:  python examples/ogb/train_gap.py [--mpnn_type PNA] [--num_epoch N]
        [--num_samples N] [--cpu]
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
    ap.add_argument("--mpnn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    with open(
        os.path.join(os.path.dirname(__file__), "..", "csce", "csce_gap.json")
    ) as f:
        config = json.load(f)
    config["Dataset"]["name"] = "ogb_gap"
    config["Dataset"]["path"]["total"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "ogb", "gap.csv"
    )
    if args.mpnn_type:
        config["NeuralNetwork"]["Architecture"]["mpnn_type"] = args.mpnn_type
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(f"ogb gap: train {h['train']:.6f} val {h['val']:.6f} test {h['test']:.6f}")
    return info


if __name__ == "__main__":
    main()
