"""Structure relaxation driven by MLIP forces.

TPU-native analogue of
``/root/reference/examples/multidataset_hpo_sc26/structure_optimization_ASE.py``:
the reference wraps the trained model as an ASE calculator and relaxes
with FIRE/BFGS under a --maxstep clamp, optionally from a randomly
displaced start, logging (energy, max force) per step to CSV. Here the
calculator is one jitted ``predict_energy_forces`` and the optimizer is a
native FIRE implementation (velocity mixing + adaptive dt) with the same
max-step clamp; the neighbor graph is rebuilt on the host every
``--reneighbor`` steps.

Usage:
  python examples/multidataset_hpo_sc26/structure_optimization.py
      [--steps N] [--maxstep S] [--fmax F] [--random-displacement]
      [--csv-log path.csv] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def fire_relax(
    z,
    pos,
    calculator,
    steps=60,
    maxstep=0.2,
    fmax=0.05,
    reneighbor=10,
    csv_log=None,
):
    """FIRE (Bitzek et al. 2006): velocity-mixing MD descent with adaptive
    timestep — the reference's default --ase-structure-optimizer."""
    dt, dt_max = 0.1, 0.5
    a, a_start = 0.1, 0.1
    f_inc, f_dec, f_alpha = 1.1, 0.5, 0.99
    n_min, n_up = 5, 0
    v = np.zeros_like(pos)
    rows = []
    e, f = calculator(z, pos, rebuild=True)
    for it in range(steps):
        fnorm = float(np.max(np.linalg.norm(f, axis=1)))
        rows.append((it, float(e), fnorm))
        if fnorm < fmax:
            break
        p = float((f * v).sum())
        if p > 0:
            n_up += 1
            if n_up > n_min:
                dt = min(dt * f_inc, dt_max)
                a *= f_alpha
            fn = f / max(np.linalg.norm(f), 1e-12)
            v = (1 - a) * v + a * fn * np.linalg.norm(v)
        else:
            n_up, v, dt, a = 0, np.zeros_like(v), dt * f_dec, a_start
        v = v + dt * f
        dr = dt * v
        # per-atom max-step clamp (the reference's --maxstep)
        norms = np.linalg.norm(dr, axis=1, keepdims=True)
        dr = dr * np.minimum(1.0, maxstep / np.maximum(norms, 1e-12))
        pos = pos + dr
        e, f = calculator(z, pos, rebuild=(it + 1) % reneighbor == 0)
    if csv_log:
        with open(csv_log, "w") as fh:
            fh.write("step,energy,max_force\n")
            for r in rows:
                fh.write(f"{r[0]},{r[1]:.8f},{r[2]:.8f}\n")
    return pos, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--maxstep", type=float, default=0.2)
    ap.add_argument("--fmax", type=float, default=0.05)
    ap.add_argument("--reneighbor", type=int, default=10)
    ap.add_argument("--num_epoch", type=int, default=15)
    ap.add_argument("--random-displacement", action="store_true")
    ap.add_argument("--csv-log", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from utils import random_structures, structure_to_graph, train_quick_mlip

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.models.mlip import predict_energy_forces

    model, state, _, _ = train_quick_mlip(num_epoch=args.num_epoch)

    (z, pos, e0, _) = random_structures(1, seed=1234)[0]
    if args.random_displacement:
        pos = pos + np.random.default_rng(0).normal(0, 0.15, pos.shape).astype(
            np.float32
        )

    predict = jax.jit(
        lambda g: predict_energy_forces(model, state.params, state.batch_stats, g)
    )
    cache = {}

    def calculator(z, pos, rebuild=False):
        if rebuild or "dims" not in cache:
            s = structure_to_graph(z, pos)
            cache["edges"] = s.edge_index
            cache["dims"] = compute_batch_dims([s], 1)
        s = structure_to_graph(z, pos)
        s.edge_index = cache["edges"]
        batch = next(iter(PaddedBatcher([s], 1, dims=cache["dims"])))
        e, f = predict(batch)
        mask = np.asarray(batch.node_mask)
        return float(np.asarray(e)[0]), np.asarray(f)[mask]

    relaxed, rows = fire_relax(
        z,
        pos,
        calculator,
        steps=args.steps,
        maxstep=args.maxstep,
        fmax=args.fmax,
        reneighbor=args.reneighbor,
        csv_log=args.csv_log,
    )
    print(
        f"relaxation: E {rows[0][1]:.4f} -> {rows[-1][1]:.4f}, "
        f"max|F| {rows[0][2]:.4f} -> {rows[-1][2]:.4f} "
        f"in {len(rows)} steps"
    )
    assert rows[-1][1] <= rows[0][1], "relaxation should not raise the energy"
    return rows


if __name__ == "__main__":
    main()
