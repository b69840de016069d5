"""Fused batched MLIP inference writing a structures JSON.

TPU-native analogue of
``/root/reference/examples/multidataset_hpo_sc26/inference_fused_write_json.py``:
the reference runs per-rank fused energy+force inference over random
structures and writes ``{"structures": [...], "num_structures": N}``.
Here the energy and its position gradient come from ONE jitted
``predict_energy_forces`` call per padded batch (the "fused energy grad"
path is the default in JAX — there is no separate unfused mode to toggle),
and the JSON shape matches the reference writer.

Usage:
  python examples/multidataset_hpo_sc26/inference_fused_write_json.py
      [--num_structures N] [--batch_size B] [--output out.json] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_structures", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--num_epoch", type=int, default=8)
    ap.add_argument("--output", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from utils import (
        random_structures,
        structure_to_dict,
        structure_to_graph,
        train_quick_mlip,
    )

    from hydragnn_tpu.data.batching import PaddedBatcher
    from hydragnn_tpu.models.mlip import predict_energy_forces

    model, state, _, dims = train_quick_mlip(num_epoch=args.num_epoch)

    structures = random_structures(args.num_structures, seed=99)
    samples = [structure_to_graph(z, pos) for z, pos, _, _ in structures]
    loader = PaddedBatcher(samples, args.batch_size, dims=dims)

    predict = jax.jit(
        lambda g: predict_energy_forces(model, state.params, state.batch_stats, g)
    )

    t0 = time.perf_counter()
    energies, forces = [], []
    for batch in loader:
        e, f = predict(batch)
        e, f = np.asarray(e), np.asarray(f)
        # unpad: each graph's real nodes
        ptr = 0
        for g in range(int(batch.n_graph)):
            if not bool(batch.graph_mask[g]):
                continue
            n = int(batch.n_per_graph[g])
            node_sel = np.asarray(batch.node_graph == g) & np.asarray(
                batch.node_mask
            )
            energies.append(float(e[g]))
            forces.append(f[node_sel])
            ptr += n
    t_infer = time.perf_counter() - t0
    print(
        f"inference: {len(energies)} structures in {t_infer:.2f}s "
        f"({len(energies) / max(t_infer, 1e-9):.1f} structures/s, fused E+F)"
    )

    out = args.output or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "inference_structures.json",
    )
    t0 = time.perf_counter()
    with open(out, "w") as fh:
        fh.write('{"structures": [\n')
        for i, ((z, pos, _, _), e, frc) in enumerate(
            zip(structures, energies, forces)
        ):
            if i:
                fh.write(",\n")
            json.dump(structure_to_dict(z, pos, e, frc), fh)
        fh.write(f'\n], "num_structures": {len(energies)}}}\n')
    print(f"wrote {out} ({time.perf_counter() - t0:.1f}s, post-hoc)")
    return energies


if __name__ == "__main__":
    main()
