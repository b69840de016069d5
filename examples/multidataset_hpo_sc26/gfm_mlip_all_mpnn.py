"""All-MPNN multidataset MLIP sweep.

TPU-native analogue of
``/root/reference/examples/multidataset_hpo_sc26/gfm_mlip_all_mpnn.py`` /
``gfm_deephyper_multi_all_mpnn.py``: the SC26 search sweeps EVERY
geometric message-passing family over the mixed corpus instead of fixing
one. Each family trains through the shared ``train_gfm`` trial unit
(examples/multidataset_hpo/gfm.py) and the per-family validation losses
are reported as a ranking, with the width/depth/lr space searched inside
each family when ``--trials > 1``.

Usage:
  python examples/multidataset_hpo_sc26/gfm_mlip_all_mpnn.py
      [--families EGNN,SchNet,...] [--trials N] [--num_epoch N]
      [--num_samples N] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "multidataset_hpo"
    ),
)

# every geometric family with a force-capable (position-differentiable)
# path; the reference sweep list (gfm_deephyper_multi_all_mpnn.py)
ALL_FAMILIES = ["EGNN", "SchNet", "PAINN", "PNAPlus", "PNAEq", "DimeNet", "MACE"]

SPACE = {
    "hidden_dim": ["int", 24, 48],
    "num_conv_layers": ["int", 2, 3],
    "learning_rate": ["log", 5e-4, 5e-3],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(ALL_FAMILIES))
    ap.add_argument("--trials", type=int, default=1,
                    help="search trials per family (1 = defaults only)")
    ap.add_argument("--num_epoch", type=int, default=4)
    ap.add_argument("--num_samples", type=int, default=80)
    ap.add_argument("--multi_model_list", default="ANI1x,MPTrj")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gfm import train_gfm

    from hydragnn_tpu.hpo import random_search

    ranking = []
    for fam in [f for f in args.families.split(",") if f.strip()]:
        if args.trials <= 1:
            val = train_gfm(
                model_type=fam,
                multi_model_list=args.multi_model_list,
                num_samples=args.num_samples,
                num_epoch=args.num_epoch,
            )
            best = {}
        else:
            space = {f"hp.{k}": v for k, v in SPACE.items()}
            best, val, _ = random_search(
                {"Dataset": {"name": f"gfm_{fam}"}},
                space,
                num_trials=args.trials,
                objective=lambda cfg, fam=fam: train_gfm(
                    model_type=fam,
                    hidden_dim=cfg["hp"]["hidden_dim"],
                    num_conv_layers=cfg["hp"]["num_conv_layers"],
                    learning_rate=cfg["hp"]["learning_rate"],
                    multi_model_list=args.multi_model_list,
                    num_samples=args.num_samples,
                    num_epoch=args.num_epoch,
                ),
            )
        ranking.append({"family": fam, "val": val, "best": best})
        print(f"[{fam}] val {val:.6f}")
    ranking.sort(key=lambda r: r["val"])
    print("ranking:", json.dumps(ranking, default=float))
    return ranking


if __name__ == "__main__":
    main()
