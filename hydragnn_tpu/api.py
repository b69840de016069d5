"""Top-level API: ``run_training`` / ``run_prediction``.

Mirrors the reference entry points (``hydragnn/run_training.py:59-211``,
``hydragnn/run_prediction.py:34-114``) on the same JSON config schema.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from hydragnn_tpu.configuration import load_config, update_config
from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
from hydragnn_tpu.data.pipeline import (
    normalize_minmax,
    select_variables,
    split_dataset,
)
from hydragnn_tpu.data.radius_graph import add_edge_lengths, radius_graph
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.models.create import create_model_config
from hydragnn_tpu.train.loop import Trainer, train_validate_test


def _log_dir(config: Dict) -> str:
    name = config.get("Dataset", {}).get("name", "run")
    d = os.path.join("logs", name)
    os.makedirs(d, exist_ok=True)
    return d


def _build_datasets(config: Dict):
    """Dataset orchestration (reference ``dataset_loading_and_splitting``,
    ``preprocess/load_data.py:207-224``). Currently supported formats:
    'unit_test' (synthetic deterministic BCC, generated in-memory) and
    'pickle' (a pickled list of GraphSample)."""
    ds_cfg = config["Dataset"]
    fmt = ds_cfg.get("format", "unit_test")
    arch = config["NeuralNetwork"]["Architecture"]
    var_cfg = config["NeuralNetwork"]["Variables_of_interest"]

    if fmt == "unit_test":
        samples = deterministic_graph_data(
            number_configurations=int(ds_cfg.get("num_samples", 500))
        )
    elif fmt == "pickle":
        path = ds_cfg["path"]["total"]
        with open(path, "rb") as f:
            samples = pickle.load(f)
    else:
        raise ValueError(f"Unsupported dataset format: {fmt}")

    node_dims = ds_cfg["node_features"]["dim"]
    graph_dims = ds_cfg["graph_features"]["dim"]
    if fmt == "unit_test":
        # the reference LSMS/unit_test raw-loader path min/max-normalizes
        # unconditionally (raw_dataset_loader.py:155)
        normalize_minmax(samples, node_dims, graph_dims)
    select_variables(samples, var_cfg, node_dims, graph_dims)

    # radius graph + optional edge lengths
    radius = float(arch.get("radius", 5.0))
    max_nb = arch.get("max_neighbours", 100)
    for s in samples:
        if s.edge_index is None:
            s.edge_index = radius_graph(s.pos, radius, max_nb)
    if arch.get("mpnn_type") == "DimeNet":
        from hydragnn_tpu.data.batching import build_triplets

        for s in samples:
            if s.trip_kj is None:
                s.trip_kj, s.trip_ji = build_triplets(s.edge_index)
    if arch.get("global_attn_engine"):
        from hydragnn_tpu.data.pipeline import compute_lap_pe

        compute_lap_pe(samples, int(arch.get("pe_dim", 1) or 1))
    if arch.get("edge_features"):
        assert list(arch["edge_features"]) == ["lengths"], "only lengths supported"
        if samples[0].edge_attr is None:
            add_edge_lengths(samples)

    perc_train = float(config["NeuralNetwork"]["Training"].get("perc_train", 0.7))
    if ds_cfg.get("compositional_stratified_splitting", False):
        from hydragnn_tpu.data.pipeline import compositional_stratified_split

        return compositional_stratified_split(samples, perc_train, seed=0)
    return split_dataset(samples, perc_train, seed=0)


def _make_loaders(config: Dict, train, val, test):
    from hydragnn_tpu.data.batching import compute_triplet_dim

    bs = int(config["NeuralNetwork"]["Training"]["batch_size"])
    everything = list(train) + list(val) + list(test)
    dims = compute_batch_dims(everything, bs)
    n_trip = (
        compute_triplet_dim(everything, bs) if train[0].trip_kj is not None else None
    )
    return (
        PaddedBatcher(train, bs, shuffle=True, seed=1, dims=dims, n_triplet=n_trip),
        PaddedBatcher(val, bs, dims=dims, n_triplet=n_trip),
        PaddedBatcher(test, bs, dims=dims, n_triplet=n_trip),
    )


def run_training(config_or_path, use_deepspeed: bool = False):
    """Train a model from a JSON config (path or dict)."""
    config = load_config(config_or_path)
    train, val, test = _build_datasets(config)
    config = update_config(config, train, val, test)
    train_loader, val_loader, test_loader = _make_loaders(config, train, val, test)

    model = create_model_config(config["NeuralNetwork"])
    trainer = Trainer(
        model, config["NeuralNetwork"]["Training"]["Optimizer"], seed=0
    )
    state = trainer.init_state(next(iter(train_loader)))
    verbosity = config.get("Verbosity", {}).get("level", 0)
    state, info = train_validate_test(
        trainer, state, train_loader, val_loader, test_loader, config, verbosity
    )

    log_dir = _log_dir(config)
    with open(os.path.join(log_dir, "model.pkl"), "wb") as f:
        import jax

        pickle.dump(
            jax.tree.map(lambda a: np.asarray(a), {
                "params": state.params,
                "batch_stats": state.batch_stats,
            }),
            f,
        )
    return info


def run_prediction(config_or_path, use_deepspeed: bool = False):
    """Evaluate the saved model on the test split.

    Returns (error, tasks_error, true_values, predicted_values) like the
    reference (``run_prediction.py:96-114``): per-head lists of stacked
    unpadded targets/predictions.
    """
    import jax.numpy as jnp

    config = load_config(config_or_path)
    train, val, test = _build_datasets(config)
    config = update_config(config, train, val, test)
    _, _, test_loader = _make_loaders(config, train, val, test)

    model = create_model_config(config["NeuralNetwork"])
    trainer = Trainer(model, config["NeuralNetwork"]["Training"]["Optimizer"], seed=0)
    state = trainer.init_state(next(iter(test_loader)))

    log_dir = _log_dir(config)
    with open(os.path.join(log_dir, "model.pkl"), "rb") as f:
        saved = pickle.load(f)
    state = state.replace(params=saved["params"], batch_stats=saved["batch_stats"])

    error, tasks_error = trainer.evaluate(state, test_loader)

    cfg = model.cfg
    num_heads = cfg.num_heads
    true_values: List[List[np.ndarray]] = [[] for _ in range(num_heads)]
    pred_values: List[List[np.ndarray]] = [[] for _ in range(num_heads)]
    for batch in test_loader:
        out = trainer.predict_step(state, batch)
        if cfg.var_output:
            out = out[0]
        gm = np.asarray(batch.graph_mask)
        nm = np.asarray(batch.node_mask)
        g_off = n_off = 0
        for ihead in range(num_heads):
            hdim = cfg.output_dim[ihead]
            if cfg.output_type[ihead] == "graph":
                t = np.asarray(batch.y_graph)[gm, g_off : g_off + hdim]
                p = np.asarray(out[ihead])[gm]
                g_off += hdim
            else:
                t = np.asarray(batch.y_node)[nm, n_off : n_off + hdim]
                p = np.asarray(out[ihead])[nm]
                n_off += hdim
            true_values[ihead].append(t)
            pred_values[ihead].append(p)

    true_cat = [np.concatenate(v) for v in true_values]
    pred_cat = [np.concatenate(v) for v in pred_values]
    return error, list(np.asarray(tasks_error)), true_cat, pred_cat
