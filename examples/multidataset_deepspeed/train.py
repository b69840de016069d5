"""Multidataset training with sharded optimizer/parameter state — the
TPU-native analogue of ``/root/reference/examples/multidataset_deepspeed/``.

The reference variant wraps the multidataset GFM run in DeepSpeed
(``deepspeed.initialize``, ZeRO stages, bf16) purely for memory sharding
and fused optimizers; on TPU those capabilities are config knobs on the
same run_training path (SURVEY §2.2 "DeepSpeed (subsumed)"):

  * ``Training.Optimizer.use_zero_redundancy`` — ZeRO-1: flat optimizer
    moments sharded over the data axis, one tiled all_gather per step.
  * ``Training.Optimizer.use_fsdp`` — ZeRO-3/FSDP analogue: the flat param
    vector itself sharded; the forward all-gather's AD transpose is the
    gradient reduce-scatter.
  * ``Training.precision: "bf16"`` — bf16 compute with fp32 params
    (DeepSpeed's bf16 mode / reference autocast).

This driver runs the same mixed ANI1x+MPTrj MLIP trial with ZeRO-1 or
FSDP on the local device mesh and prints the loss trajectory next to the
plain data-parallel run to show the sharded paths are loss-equivalent.

Usage (``--cpu`` provisions the 8-device virtual CPU mesh in-process; no
XLA_FLAGS needed — the PJRT plugin ignores those env vars anyway):
  python examples/multidataset_deepspeed/train.py --cpu \
      [--mode zero1|fsdp|both] [--num_epoch N] [--num_samples N]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def build_config(num_samples, num_epoch, num_devices, opt_extra):
    opt = {"type": "AdamW", "learning_rate": 2e-3}
    opt.update(opt_extra)
    return {
        "Verbosity": {"level": 1},
        "Dataset": {
            "name": "multids_" + "_".join(sorted(opt_extra) or ["dp"]),
            "format": "ani1x",
            "path": {"total": os.path.join(HERE, "dataset", "ani1x-release.h5")},
            "num_samples": num_samples,
            "energy_linear_regression": True,
            "node_features": {"name": ["Z"], "dim": [1], "column_index": [0]},
            "graph_features": {"name": ["energy"], "dim": [1],
                               "column_index": [0]},
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": "EGNN",
                "radius": 5.0,
                "max_neighbours": 32,
                "hidden_dim": 32,
                "num_conv_layers": 2,
                "max_ell": 1,
                "node_max_ell": 1,
                "num_radial": 8,
                "enable_interatomic_potential": True,
                "energy_weight": 1.0,
                "energy_peratom_weight": 1.0,
                "force_weight": 10.0,
                "output_heads": {
                    "node": {"num_headlayers": 2, "dim_headlayers": [32, 32],
                             "type": "mlp"}
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["graph_energy"],
                "output_index": [0],
                "output_dim": [1],
                "type": ["node"],
            },
            "Training": {
                "num_epoch": num_epoch,
                "batch_size": 8,
                "perc_train": 0.7,
                "precision": "bf16",
                "Optimizer": opt,
                "num_devices": num_devices,
            },
        },
        "Visualization": {"create_plots": False},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["zero1", "fsdp", "both"])
    ap.add_argument("--num_epoch", type=int, default=4)
    ap.add_argument("--num_samples", type=int, default=96)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        # 8-device virtual CPU mesh so the ZeRO-1/FSDP sharding variants
        # actually shard (in-process forcing: the PJRT plugin ignores
        # JAX_PLATFORMS env vars on single-chip tunnel hosts); force_cpu
        # honors the flag even on hosts with >= 8 accelerator devices
        from hydragnn_tpu.parallel.runtime import ensure_devices

        ensure_devices(8, force_cpu=True)
    import jax

    ndev = len(jax.devices())
    from hydragnn_tpu.api import run_training

    variants = [("dp", {})]
    if args.mode in ("zero1", "both"):
        variants.append(("zero1", {"use_zero_redundancy": True}))
    if args.mode in ("fsdp", "both"):
        variants.append(("fsdp", {"use_fsdp": True}))

    results = {}
    for name, extra in variants:
        info = run_training(
            build_config(args.num_samples, args.num_epoch, ndev, extra)
        )
        results[name] = [h["train"] for h in info["history"]]
        print(f"{name}: train trajectory "
              + " ".join(f"{v:.4f}" for v in results[name]))
    if len(results) > 1:
        base = np.asarray(results["dp"])
        for name in results:
            if name == "dp":
                continue
            drift = float(np.max(np.abs(np.asarray(results[name]) - base)
                                 / np.maximum(np.abs(base), 1e-9)))
            print(f"{name} vs dp max relative loss drift: {drift:.2e}")
    return results


if __name__ == "__main__":
    main()
