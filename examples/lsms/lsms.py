"""LSMS example: FePt alloy free-energy + charge-density + magnetic-moment
multitask training from LSMS text files.

Parses the LSMS format the reference driver consumes
(``/root/reference/examples/lsms/lsms.py`` + ``lsms.json``: graph feature =
free energy at column 0 of the header line; node features = num_of_protons
/ charge_density / magnetic_moment at row columns 0/5/6, with the
charge-density update col1 -= col0, ``lsmsdataset.py:66-81``). Zero-egress
fallback: a surrogate FePt BCC corpus is synthesized in the same text
schema, with composition-dependent free energy and species-dependent
moments so all three heads are learnable; compositional stratified
splitting is on, as in the reference config.

Usage:
  python examples/lsms/lsms.py [--num_epoch N] [--num_samples N] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np


def synthesize_lsms_directory(path: str, n_configs: int, seed: int = 0):
    """Write surrogate FePt LSMS text files: header = free energy; node
    rows = [Z, id, x, y, z, charge, moment]."""
    rng = np.random.default_rng(seed)
    os.makedirs(path, exist_ok=True)
    # 2x2x2 BCC supercell -> 16 sites
    base = []
    for i in range(2):
        for j in range(2):
            for k in range(2):
                base.append([i, j, k])
                base.append([i + 0.5, j + 0.5, k + 0.5])
    base = np.asarray(base, np.float64) * 2.86
    n = len(base)
    for c in range(n_configs):
        n_fe = int(rng.integers(2, n - 1))
        z = np.asarray([26.0] * n_fe + [78.0] * (n - n_fe))
        rng.shuffle(z)
        pos = base + rng.normal(0, 0.05, base.shape)
        x_fe = n_fe / n
        # mixing free energy: regular-solution-like curve + noise
        fe = -4.0 * x_fe * (1 - x_fe) + 0.3 * x_fe + rng.normal(0, 0.02)
        charge = z + rng.normal(0, 0.05, n)  # electrons ~ Z (neutral-ish)
        moment = np.where(z == 26.0, 2.2, 0.35) + rng.normal(0, 0.05, n)
        lines = [f"{fe:.6f} 0.0\n"]
        for a in range(n):
            lines.append(
                f"{z[a]:.1f} {a} {pos[a,0]:.6f} {pos[a,1]:.6f} "
                f"{pos[a,2]:.6f} {charge[a]:.6f} {moment[a]:.6f}\n"
            )
        with open(os.path.join(path, f"config_{c:05d}.txt"), "w") as f:
            f.writelines(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_epoch", type=int, default=None)
    ap.add_argument("--num_samples", type=int, default=120)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "lsms.json")) as f:
        config = json.load(f)
    if args.num_epoch:
        config["NeuralNetwork"]["Training"]["num_epoch"] = args.num_epoch
    data_dir = os.path.join(here, "dataset", "FePt_surrogate")
    config["Dataset"]["path"] = {"total": data_dir}
    if not os.path.isdir(data_dir) or not os.listdir(data_dir):
        print(f"[lsms] {data_dir!r} empty -- synthesizing surrogate FePt "
              "corpus in the LSMS text schema (no egress)")
        synthesize_lsms_directory(data_dir, args.num_samples)

    from hydragnn_tpu.api import run_training

    info = run_training(config)
    h = info["history"][-1]
    print(f"lsms FePt: train {h['train']:.6f} val {h['val']:.6f} "
          f"test {h['test']:.6f}")
    return info


if __name__ == "__main__":
    main()
