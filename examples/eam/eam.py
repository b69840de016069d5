"""NiNb EAM bulk-modulus example (extended-CFG crystal corpus).

TPU-native analogue of ``/root/reference/examples/eam/eam.py`` with the
``NiNb_EAM_bulk.json`` config: extended-CFG files (node features
[Z, mass, per-atom energy], PBC radius graph, edge lengths) regressing the
per-structure bulk modulus from a sibling ``.bulk`` file, with rotational
normalization and compositional stratified splitting.

Zero-egress note: if the CFG directory is absent a surrogate Ni/Nb
solid-solution corpus with a deterministic Vegard-like bulk target is
synthesized in the same on-disk schema (data/lsms.py).

Usage:  python examples/eam/eam.py [--num_epoch N] [--num_samples N] [--cpu]
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
        os.path.join(os.path.dirname(__file__), "NiNb_EAM_bulk.json")
    ) as f:
        config = json.load(f)
    if args.mpnn_type:
        config["NeuralNetwork"]["Architecture"]["mpnn_type"] = args.mpnn_type
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples
    config["Dataset"]["path"]["total"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "dataset", "NiNb_solid_solution",
    )

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"eam bulk: train {h['train']:.6f} val {h['val']:.6f} "
        f"test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
