"""ZINC-style example: molecular graphs + GPS global attention with
Laplacian positional encodings.

TPU-native analogue of ``/root/reference/examples/zinc/zinc.py``: the
reference trains on PyG's ZINC subset (molecular graphs, constrained-
solubility target) with GPS layers fed LapPE node encodings and rel_pe
edge encodings (``zinc.py:42-56``). Here the molecular corpus comes from
the SMILES pipeline (surrogate csv when no download exists) and the same
GPS + pe_dim config drives LapPE/rel_pe computation in the data layer.

Usage:  python examples/zinc/zinc.py [--num_epoch N] [--num_samples N]
        [--attn multihead|performer] [--cpu]
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
    ap.add_argument("--attn", default="multihead")
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
    config["Dataset"]["name"] = "zinc"
    config["Dataset"]["path"]["total"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "zinc", "zinc.csv"
    )
    arch = config["NeuralNetwork"]["Architecture"]
    # GPS + Laplacian PEs (reference zinc.py:42-56)
    arch["global_attn_engine"] = "GPS"
    arch["global_attn_type"] = args.attn
    arch["global_attn_heads"] = 8
    arch["pe_dim"] = 2
    arch["hidden_dim"] = 64
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"zinc GPS({args.attn}): train {h['train']:.6f} "
        f"val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
