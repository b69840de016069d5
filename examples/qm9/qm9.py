"""QM9 example driver (BASELINE configs 1-2: GIN single-head free energy,
PNA multihead).

TPU-native analogue of the reference driver
``/root/reference/examples/qm9/qm9.py:47-140``: parse the raw
``dsgdb9nsd_*.xyz`` distribution, per-atom free-energy target (column 10
of the PyG target layout, ``qm9.py:33``), graph_attr = [charge, spin]
(``qm9.py:22-36``), radius-graph edges, optional GPS global attention with
Laplacian PEs, then the config-driven training loop.

Zero-egress note: if ``dataset/qm9/raw`` is absent a surrogate corpus is
synthesized in the EXACT dsgdb9nsd on-disk format (see data/qm9.py) so
the identical parse -> pipeline -> train path runs end to end.

Usage:
  python examples/qm9/qm9.py [--mpnn_type GIN] [--multihead]
      [--global_attn_engine GPS] [--num_epoch N] [--num_samples N]
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
    ap.add_argument("--multihead", action="store_true")
    ap.add_argument("--global_attn_engine", default=None)
    ap.add_argument("--global_attn_type", default=None)
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument(
        "--preonly",
        action="store_true",
        help="convert the raw corpus into the sharded container format and "
        "exit (reference --preonly pattern, LennardJones.py:62-66); a later "
        "run with --container trains from the converted store",
    )
    ap.add_argument(
        "--container",
        action="store_true",
        help="train from the converted container instead of raw xyz",
    )
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    name = "qm9_multihead.json" if args.multihead else "qm9.json"
    with open(os.path.join(os.path.dirname(__file__), name)) as f:
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
    # dataset path relative to this example dir (reference pattern)
    raw_root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "qm9", "raw"
    )
    config["Dataset"]["path"]["total"] = raw_root
    cont_root = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "dataset", "qm9", "container"
    )

    if args.preonly:
        from hydragnn_tpu.data.container import GraphContainerWriter
        from hydragnn_tpu.data.qm9 import (
            load_qm9_directory,
            synthesize_qm9_directory,
        )

        if not os.path.isdir(raw_root) or not os.listdir(raw_root):
            synthesize_qm9_directory(
                raw_root, int(config["Dataset"].get("num_samples", 1000)), seed=0
            )
        samples = load_qm9_directory(
            raw_root, limit=config["Dataset"].get("num_samples")
        )
        GraphContainerWriter(cont_root).write(samples)
        print(f"[qm9] wrote {len(samples)} samples -> {cont_root}")
        return None
    if args.container:
        config["Dataset"]["format"] = "container"
        config["Dataset"]["path"]["total"] = cont_root

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(
        f"qm9 {arch['mpnn_type']}: train {h['train']:.6f} "
        f"val {h['val']:.6f} test {h['test']:.6f}"
    )
    return info


if __name__ == "__main__":
    main()
