"""Real-dataset adapters: QM9 (dsgdb9nsd xyz) and MD17 (npz) format
parsers, surrogate synthesizers, and the config-driven pipeline on top
(reference drivers examples/qm9/qm9.py:47-140, examples/md17/md17.py)."""

import os

import numpy as np
import pytest


def test_qm9_roundtrip(tmp_path):
    from hydragnn_tpu.data.qm9 import (
        load_qm9_directory,
        parse_gdb9_xyz,
        synthesize_qm9_directory,
    )

    root = str(tmp_path / "qm9")
    synthesize_qm9_directory(root, 16, seed=0)
    samples = load_qm9_directory(root)
    assert len(samples) == 16
    for s in samples:
        assert s.y_raw.shape == (12,)
        assert s.x_raw.shape[1] == 2  # [Z, mulliken charge]
        assert s.pos.shape == (s.num_nodes, 3)
        assert np.all(s.x_raw[:, 0] >= 1)
    # file index 0 uses the *^ exponent quirk; re-parse it directly
    s0 = parse_gdb9_xyz(os.path.join(root, "dsgdb9nsd_000001.xyz"))
    assert np.allclose(s0.y_raw, samples[0].y_raw)
    # gap column consistency: gap = lumo - homo (columns 4, 3, 2)
    for s in samples:
        assert abs(s.y_raw[4] - (s.y_raw[3] - s.y_raw[2])) < 2e-4


def test_qm9_number_quirk_parsing(tmp_path):
    from hydragnn_tpu.data.qm9 import _f

    assert _f("1.234*^-5") == pytest.approx(1.234e-5)
    assert _f("-2.5*^2") == pytest.approx(-250.0)
    assert _f("3.0") == 3.0


def test_md17_roundtrip_and_force_consistency(tmp_path):
    from hydragnn_tpu.data.md17 import (
        _equilibrium_geometry,
        _pairs,
        _surrogate_energy_forces,
        load_md17_npz,
        synthesize_md17_npz,
    )

    path = str(tmp_path / "md17_uracil.npz")
    synthesize_md17_npz(path, n_frames=8, seed=1)
    samples = load_md17_npz(path)
    assert len(samples) == 8
    s = samples[0]
    assert s.forces.shape == (12, 3)
    assert s.energy is not None and s.energy < -200000.0
    assert s.y_raw.shape == (1,)

    # surrogate forces are the exact analytic gradient (finite differences)
    # of the species-pair Morse potential (learnable from (pos, Z) alone)
    from hydragnn_tpu.data.md17 import _URACIL_Z

    eq = _equilibrium_geometry()
    rng = np.random.default_rng(0)
    pos = eq.astype(np.float64) + rng.normal(0, 0.05, eq.shape)
    e0, f = _surrogate_energy_forces(pos, _URACIL_Z)
    eps = 1e-5
    for (a, c) in [(0, 0), (3, 1), (7, 2)]:
        p = pos.copy()
        p[a, c] += eps
        ep, _ = _surrogate_energy_forces(p, _URACIL_Z)
        p[a, c] -= 2 * eps
        em, _ = _surrogate_energy_forces(p, _URACIL_Z)
        fd = -(ep - em) / (2 * eps)
        assert abs(fd - f[a, c]) < 1e-2 * max(1.0, abs(f[a, c]))

    # stride/limit
    assert len(load_md17_npz(path, limit=3)) == 3
    assert len(load_md17_npz(path, stride=2)) == 4


def test_qm9_config_pipeline_trains(tmp_path, monkeypatch):
    """End-to-end run_training on the qm9 format (per-atom G target,
    graph_attr constants, radius graph) -- 2 epochs, tiny."""
    from hydragnn_tpu.api import run_training

    monkeypatch.chdir(tmp_path)
    config = {
        "Verbosity": {"level": 0},
        "Dataset": {
            "name": "qm9_ci",
            "format": "qm9",
            "path": {"total": str(tmp_path / "raw")},
            "num_samples": 48,
            "per_atom_targets": True,
            "graph_attr": [0.0, 1.0],
            "node_features": {"name": ["Z", "q"], "dim": [1, 1],
                              "column_index": [0, 1]},
            "graph_features": {
                "name": ["mu", "alpha", "homo", "lumo", "gap", "r2",
                         "zpve", "U0", "U", "H", "G", "Cv"],
                "dim": [1] * 12, "column_index": list(range(12)),
            },
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": "GIN", "radius": 7, "max_neighbours": 20,
                "hidden_dim": 16, "num_conv_layers": 2,
                "initial_bias": -24.0,
                "output_heads": {"graph": {"num_sharedlayers": 1,
                                           "dim_sharedlayers": 16,
                                           "num_headlayers": 1,
                                           "dim_headlayers": [16]}},
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["free_energy"], "output_index": [10],
                "output_dim": [1], "type": ["graph"],
            },
            "Training": {
                "num_epoch": 2, "perc_train": 0.7,
                "loss_function_type": "mse", "batch_size": 16,
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
            },
        },
        "Visualization": {"create_plots": False},
    }
    info = run_training(config)
    assert len(info["history"]) == 2
    assert np.isfinite(info["history"][-1]["train"])


def test_md17_mlip_pipeline_trains(tmp_path, monkeypatch):
    """run_training on the md17 format with gradient forces + per-element
    energy baseline subtraction."""
    from hydragnn_tpu.api import run_training

    monkeypatch.chdir(tmp_path)
    config = {
        "Verbosity": {"level": 0},
        "Dataset": {
            "name": "md17_ci",
            "format": "md17",
            "path": {"total": str(tmp_path / "md17_uracil.npz")},
            "num_samples": 32,
            "energy_linear_regression": True,
            "node_features": {"name": ["Z"], "dim": [1], "column_index": [0]},
            "graph_features": {"name": ["energy"], "dim": [1],
                               "column_index": [0]},
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": "EGNN", "radius": 5.0, "max_neighbours": 11,
                "hidden_dim": 16, "num_conv_layers": 2,
                "max_ell": 1, "node_max_ell": 1, "num_radial": 8,
                "enable_interatomic_potential": True,
                "energy_weight": 1.0, "energy_peratom_weight": 1.0,
                "force_weight": 10.0,
                "output_heads": {"node": {"num_headlayers": 1,
                                          "dim_headlayers": [16],
                                          "type": "mlp"}},
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["graph_energy"], "output_index": [0],
                "output_dim": [1], "type": ["node"],
            },
            "Training": {
                "num_epoch": 2, "perc_train": 0.7,
                "loss_function_type": "mae", "batch_size": 8,
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
            },
        },
        "Visualization": {"create_plots": False},
    }
    info = run_training(config)
    assert len(info["history"]) == 2
    assert np.isfinite(info["history"][-1]["train"])
