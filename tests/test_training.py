"""End-to-end training to accuracy threshold (reference
``tests/test_graphs.py`` style, reduced size for CI speed)."""

import json

import numpy as np
import pytest


def _base_config(mpnn, num_samples=200, epochs=40):
    return {
        "Verbosity": {"level": 0},
        "Dataset": {
            "name": f"ci_{mpnn}",
            "format": "unit_test",
            "num_samples": num_samples,
            "compositional_stratified_splitting": True,
            "rotational_invariance": False,
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
                "global_attn_engine": "",
                "global_attn_type": "",
                "mpnn_type": mpnn,
                "radius": 2.0,
                "max_neighbours": 100,
                "hidden_dim": 8,
                "num_conv_layers": 2,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 2,
                        "dim_sharedlayers": 4,
                        "num_headlayers": 2,
                        "dim_headlayers": [10, 10],
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["sum_x_x2_x3"],
                "output_index": [0],
                "type": ["graph"],
                "denormalize_output": False,
            },
            "Training": {
                "num_epoch": epochs,
                "perc_train": 0.7,
                "EarlyStopping": True,
                "patience": 20,
                "Checkpoint": True,
                "checkpoint_warmup": 10,
                "loss_function_type": "mse",
                "batch_size": 32,
                "Optimizer": {"type": "AdamW", "learning_rate": 0.02},
            },
        },
    }


@pytest.mark.parametrize("mpnn", ["GIN", "PNA"])
def test_train_to_threshold(mpnn, tmp_path, monkeypatch):
    import hydragnn_tpu

    monkeypatch.chdir(tmp_path)
    cfg = _base_config(mpnn)
    hydragnn_tpu.run_training(cfg)
    err, tasks, true_v, pred_v = hydragnn_tpu.run_prediction(cfg)
    # reduced-budget thresholds (reference full-budget: GIN 0.25, PNA 0.20,
    # tests/test_graphs.py:144-170)
    assert err < 0.25, f"{mpnn} RMSE {err}"
    mae = float(np.abs(true_v[0] - pred_v[0]).mean())
    assert mae < 0.25, f"{mpnn} MAE {mae}"


def test_multihead_training_runs(tmp_path, monkeypatch):
    import hydragnn_tpu

    monkeypatch.chdir(tmp_path)
    cfg = _base_config("PNA", num_samples=80, epochs=4)
    cfg["NeuralNetwork"]["Architecture"]["output_heads"]["node"] = {
        "num_headlayers": 2,
        "dim_headlayers": [10, 10],
        "type": "mlp",
    }
    cfg["NeuralNetwork"]["Architecture"]["task_weights"] = [20.0, 1.0, 1.0, 1.0]
    cfg["NeuralNetwork"]["Variables_of_interest"] = {
        "input_node_features": [0],
        "output_names": ["sum_x_x2_x3", "x", "x2", "x3"],
        "output_index": [0, 0, 1, 2],
        "type": ["graph", "node", "node", "node"],
        "denormalize_output": False,
    }
    info = hydragnn_tpu.run_training(cfg)
    h = info["history"]
    assert np.isfinite(h[-1]["train"])
    err, tasks, true_v, pred_v = hydragnn_tpu.run_prediction(cfg)
    assert len(true_v) == 4
    assert np.isfinite(err)
