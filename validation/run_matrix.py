"""Committed validation harness: regenerates the 13-model accuracy matrix
(validation_matrix.json), the multihead matrix (validation_multihead.json),
and the GPS runs in one command.

Mirrors the reference integration matrix (`tests/test_graphs.py:25-310`):
deterministic BCC-lattice dataset, ci.json-style config per model, train
via run_training, evaluate via run_prediction on the held-out split, and
compare against the reference per-model RMSE/MAE thresholds
(`tests/test_graphs.py:144-170`).

Usage (CPU; takes ~30-60 min for the full matrix):
    python validation/run_matrix.py [--models GIN,PNA,...] [--epochs 60]
        [--multihead] [--gps] [--out validation_matrix.json]

Writes per-model {mse, mae, time_s, threshold, pass} entries.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# reference thresholds (test_graphs.py:144-170): (rmse, mae)
THRESHOLDS = {
    "GIN": (0.25, 0.20),
    "PNA": (0.20, 0.20),
    "SAGE": (0.20, 0.20),
    "MFC": (0.20, 0.20),
    "CGCNN": (0.50, 0.50),
    "SchNet": (0.20, 0.20),
    "PNAPlus": (0.20, 0.20),
    "EGNN": (0.20, 0.20),
    "GAT": (0.60, 0.70),
    "PAINN": (0.60, 0.70),
    "PNAEq": (0.60, 0.70),
    "DimeNet": (0.50, 0.50),
    "MACE": (0.60, 0.70),
}

# per-model lr overrides: the no-BatchNorm SiLU stacks (SchNet/DimeNet) need
# a smaller lr than ci.json's 0.02 (see VALIDATION.md lr-sensitivity note)
LR = {"SchNet": 3e-3, "DimeNet": 3e-3, "MACE": 1e-2}


def base_config(mpnn, epochs, num_samples=300, multihead=False):
    heads = {
        "graph": {
            "num_sharedlayers": 2,
            "dim_sharedlayers": 10,
            "num_headlayers": 2,
            "dim_headlayers": [20, 20],
        }
    }
    var = {
        "input_node_features": [0],
        "output_names": ["sum_x_x2_x3"],
        "output_index": [0],
        "type": ["graph"],
        "denormalize_output": False,
    }
    if multihead:
        heads["node"] = {
            "num_headlayers": 2,
            "dim_headlayers": [20, 20],
            "type": "mlp",
        }
        var = {
            "input_node_features": [0],
            "output_names": ["sum_x_x2_x3", "x", "x2", "x3"],
            "output_index": [0, 0, 1, 2],
            "type": ["graph", "node", "node", "node"],
            "denormalize_output": False,
        }
    return {
        "Verbosity": {"level": 0},
        "Dataset": {
            "name": f"val_{mpnn}{'_mh' if multihead else ''}",
            "format": "unit_test",
            "num_samples": num_samples,
            "compositional_stratified_splitting": True,
            "node_features": {
                "name": ["x", "x2", "x3"],
                "dim": [1, 1, 1],
                "column_index": [0, 6, 7],
            },
            "graph_features": {
                "name": ["sum_x_x2_x3"],
                "dim": [1],
                "column_index": [0],
            },
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": mpnn,
                "radius": 2.0,
                "max_neighbours": 100,
                "hidden_dim": 16,
                "num_conv_layers": 2,
                "max_ell": 2,
                "node_max_ell": 1,
                "num_radial": 6,
                "num_gaussians": 10,
                "num_filters": 16,
                "envelope_exponent": 5,
                "num_spherical": 2,
                "int_emb_size": 16,
                "out_emb_size": 16,
                "basis_emb_size": 8,
                "num_before_skip": 1,
                "num_after_skip": 1,
                "output_heads": heads,
                "task_weights": [1.0, 1.0, 1.0, 1.0] if multihead else [1.0],
            },
            "Variables_of_interest": var,
            "Training": {
                "num_epoch": epochs,
                "perc_train": 0.7,
                "EarlyStopping": True,
                "patience": 30,
                "Checkpoint": True,
                "checkpoint_warmup": 10,
                "loss_function_type": "mse",
                "batch_size": 32,
                "Optimizer": {
                    "type": "AdamW",
                    "learning_rate": LR.get(mpnn, 0.02),
                },
            },
        },
        "Visualization": {"create_plots": False},
    }


def run_one(mpnn, epochs, multihead=False, gps=None):
    import numpy as np

    import hydragnn_tpu

    cfg = base_config(mpnn, epochs, multihead=multihead)
    if gps:
        arch = cfg["NeuralNetwork"]["Architecture"]
        arch["global_attn_engine"] = "GPS"
        arch["global_attn_type"] = gps
        arch["global_attn_heads"] = 2
        arch["pe_dim"] = 2
        cfg["Dataset"]["name"] += f"_gps_{gps}"
    t0 = time.time()
    hydragnn_tpu.run_training(cfg)
    err, tasks, true_v, pred_v = hydragnn_tpu.run_prediction(cfg)
    dt = time.time() - t0
    rmse_t, mae_t = THRESHOLDS[mpnn]
    if multihead:
        task_mse = [float(np.mean((t - p) ** 2)) for t, p in zip(true_v, pred_v)]
        task_mae = [float(np.abs(t - p).mean()) for t, p in zip(true_v, pred_v)]
        return {
            "total_mse": float(err),
            "task_mse": [round(x, 5) for x in task_mse],
            "task_mae": [round(x, 5) for x in task_mae],
            "time_s": round(dt, 1),
            "threshold_rmse": rmse_t,
            "threshold_mae": mae_t,
            "pass": bool(
                max(task_mse) < rmse_t**2 and max(task_mae) < mae_t
            ),
        }
    mae = float(np.abs(true_v[0] - pred_v[0]).mean())
    return {
        "mse": round(float(err), 5),
        "mae": round(mae, 5),
        "time_s": round(dt, 1),
        "lr": LR.get(mpnn, 0.02),
        "threshold_rmse": rmse_t,
        "threshold_mae": mae_t,
        "pass": bool(float(err) < rmse_t**2 and mae < mae_t),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(THRESHOLDS))
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--multihead", action="store_true")
    ap.add_argument(
        "--gps",
        default=None,
        choices=[None, "multihead", "performer"],
        help="wrap every conv layer in GPS with this attention type",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    models = [m.strip() for m in args.models.split(",") if m.strip()]
    out_path = args.out or (
        "validation_multihead.json" if args.multihead else "validation_matrix.json"
    )
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for m in models:
        print(f"[matrix] {m} ...", flush=True)
        try:
            results[m] = run_one(
                m, args.epochs, multihead=args.multihead, gps=args.gps
            )
        except Exception as e:  # keep going; record the failure
            results[m] = {"error": repr(e)}
        print(f"[matrix] {m}: {results[m]}", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    n_pass = sum(1 for r in results.values() if r.get("pass"))
    print(f"[matrix] done: {n_pass}/{len(results)} pass -> {out_path}")
    if out_path == "validation_matrix.json":
        write_markdown_table(results)


def write_markdown_table(results, md_path="VALIDATION.md"):
    """Regenerate the VALIDATION.md matrix table from the json so prose and
    artifact can never drift (VERDICT r02 weak #5): the table lives between
    the AUTOGEN markers and is rewritten on every full-matrix run."""
    rows = ["| Model  | test MSE | test MAE | lr | reference RMSE threshold | pass |",
            "|--------|---------:|---------:|----|-------------------------:|------|"]
    for m, r in results.items():
        if "error" in r:
            rows.append(f"| {m} | error | — | — | — | no |")
            continue
        rows.append(
            f"| {m} | {r['mse']:.5f} | {r['mae']:.3f} | {r.get('lr', '')} "
            f"| {r.get('threshold_rmse', '')} | "
            f"{'yes' if r.get('pass') else 'NO'} |"
        )
    block = "\n".join(rows)
    begin, end = "<!-- AUTOGEN:matrix -->", "<!-- /AUTOGEN:matrix -->"
    if not os.path.exists(md_path):
        return
    text = open(md_path).read()
    if begin in text and end in text:
        head, rest = text.split(begin, 1)
        _, tail = rest.split(end, 1)
        text = head + begin + "\n" + block + "\n" + end + tail
        with open(md_path, "w") as f:
            f.write(text)
        print(f"[matrix] {md_path} table regenerated from json")


if __name__ == "__main__":
    main()
