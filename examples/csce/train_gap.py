"""CSCE band-gap example driver (SMILES csv -> graph regression).

TPU-native analogue of ``/root/reference/examples/csce/train_gap.py``:
read a csv of (id, smiles, gap), build molecular graphs with the reference
feature layout (one-hot type | Z, aromatic, sp, sp2, sp3, numH; bond-order
one-hot edge features), train a config-selected stack, optionally with GPS
global attention (``--global_attn_engine GPS``) like the reference's
``--adios/--format`` variants.

Zero-egress note: if the csv is absent a surrogate corpus of random
valence-valid organic molecules with a deterministic structural gap is
synthesized in the same schema (data/smiles.py:synthesize_smiles_csv).

Usage:
  python examples/csce/train_gap.py [--mpnn_type GIN] [--num_epoch N]
      [--num_samples N] [--global_attn_engine GPS] [--cpu]
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
    ap.add_argument("--global_attn_engine", default=None)
    ap.add_argument("--global_attn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    with open(os.path.join(os.path.dirname(__file__), "csce_gap.json")) as f:
        config = json.load(f)
    arch = config["NeuralNetwork"]["Architecture"]
    if args.mpnn_type:
        arch["mpnn_type"] = args.mpnn_type
    if args.global_attn_engine:
        arch["global_attn_engine"] = args.global_attn_engine
        arch["global_attn_type"] = args.global_attn_type or "multihead"
        arch.setdefault("pe_dim", 2)
        arch.setdefault("global_attn_heads", 8)
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    if args.num_samples:
        config["Dataset"]["num_samples"] = args.num_samples
    config["Dataset"]["path"]["total"] = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "csce", "gap.csv"
    )

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"csce {arch['mpnn_type']}: train {h['train']:.6f} "
        f"val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
