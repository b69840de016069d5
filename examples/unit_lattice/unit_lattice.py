"""Canonical single-dataset driver (the reference's ``examples/qm9/qm9.py``
pattern, :47-140): config -> dataset -> loaders -> update_config -> model
-> train_validate_test -> prediction plots.  Runs on the deterministic
synthetic lattice dataset (the public QM9/MD17 downloads are not available
offline; swap `Dataset.format` to 'LSMS'/'container' for real data)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import json
import os
import sys

CONFIG = {
    "Verbosity": {"level": 1},
    "Dataset": {
        "name": "unit_lattice_example",
        "format": "unit_test",
        "num_samples": 400,
        "compositional_stratified_splitting": True,
        "rotational_invariance": False,
        "node_features": {
            "name": ["x", "x2", "x3"],
            "dim": [1, 1, 1],
            "column_index": [0, 6, 7],
        },
        "graph_features": {"name": ["sum_x_x2_x3"], "dim": [1], "column_index": [0]},
    },
    "NeuralNetwork": {
        "Architecture": {
            "mpnn_type": "PNA",
            "radius": 2.0,
            "max_neighbours": 100,
            "hidden_dim": 16,
            "num_conv_layers": 2,
            "output_heads": {
                "graph": {
                    "num_sharedlayers": 2,
                    "dim_sharedlayers": 10,
                    "num_headlayers": 2,
                    "dim_headlayers": [10, 10],
                },
                "node": {
                    "num_headlayers": 2,
                    "dim_headlayers": [10, 10],
                    "type": "mlp",
                },
            },
            "task_weights": [20.0, 1.0, 1.0, 1.0],
        },
        "Variables_of_interest": {
            "input_node_features": [0],
            "output_names": ["sum_x_x2_x3", "x", "x2", "x3"],
            "output_index": [0, 0, 1, 2],
            "type": ["graph", "node", "node", "node"],
            "denormalize_output": False,
        },
        "Training": {
            "num_epoch": 60,
            "perc_train": 0.7,
            "EarlyStopping": True,
            "patience": 20,
            "Checkpoint": True,
            "checkpoint_warmup": 10,
            "loss_function_type": "mse",
            "batch_size": 32,
            "Optimizer": {"type": "AdamW", "learning_rate": 0.01},
        },
    },
    "Visualization": {"create_plots": True},
}


def main(mpnn_type=None):
    import hydragnn_tpu

    cfg = json.loads(json.dumps(CONFIG))
    if mpnn_type:
        cfg["NeuralNetwork"]["Architecture"]["mpnn_type"] = mpnn_type
    info = hydragnn_tpu.run_training(cfg)
    err, tasks, t, p = hydragnn_tpu.run_prediction(cfg)
    print("test error:", err, "per-task:", tasks)
    return err


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
