"""Config parsing and normalization.

The framework is driven by the same single JSON schema as the reference
(``tests/inputs/ci.json``; sections Verbosity / Dataset / NeuralNetwork
{Architecture, Variables_of_interest, Training} / Visualization).  This
module is the analogue of ``hydragnn/utils/input_config_parsing/
config_utils.py:26-163`` (``update_config``): it fills defaults and derives
data-dependent fields (input/output dims, PNA degree histogram, MACE
avg_num_neighbors, edge_dim rules).
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, List, Sequence

from hydragnn_tpu.data.pipeline import gather_degree_histogram, graph_size_stats
from hydragnn_tpu.data.sample import GraphSample

PNA_MODELS = ("PNA", "PNAPlus", "PNAEq")
EDGE_MODELS = (
    "GAT",
    "PNA",
    "PNAPlus",
    "PAINN",
    "PNAEq",
    "CGCNN",
    "SchNet",
    "EGNN",
    "DimeNet",
    "MACE",
)


def load_config(config_or_path) -> Dict[str, Any]:
    if isinstance(config_or_path, str):
        with open(config_or_path) as f:
            return json.load(f)
    return copy.deepcopy(config_or_path)


def merge_config(base: Dict, override: Dict) -> Dict:
    """Deep merge (reference ``config_utils.py:388-396``)."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def update_multibranch_heads(heads: Dict) -> Dict:
    """Legacy single-branch head dict -> branch-list format
    (reference ``utils/model/model.py:314-349``)."""
    out = {}
    for level, cfg in heads.items():
        if isinstance(cfg, dict):
            out[level] = [{"type": "branch-0", "architecture": cfg}]
        else:
            out[level] = cfg
    return out


def update_config(
    config: Dict[str, Any],
    train: Sequence[GraphSample],
    val: Sequence[GraphSample],
    test: Sequence[GraphSample],
) -> Dict[str, Any]:
    nn_cfg = config["NeuralNetwork"]
    arch = nn_cfg["Architecture"]
    var_cfg = nn_cfg["Variables_of_interest"]
    training = nn_cfg.setdefault("Training", {})

    stats = graph_size_stats(list(train) + list(val) + list(test))
    graph_size_variable = stats["variable_size"]

    arch.setdefault("global_attn_engine", None)
    arch.setdefault("global_attn_type", None)
    arch.setdefault("global_attn_heads", 0)
    arch.setdefault("pe_dim", 0)

    arch["output_heads"] = update_multibranch_heads(arch["output_heads"])

    # output dims from data (update_config_NN_outputs, config_utils.py:227-268)
    sample = train[0]
    out_types = var_cfg["type"]
    out_dims: List[int] = []
    if arch.get("enable_interatomic_potential", False):
        out_dims = list(var_cfg["output_dim"])
    else:
        node_dims = config.get("Dataset", {}).get("node_features", {}).get("dim")
        graph_dims = config.get("Dataset", {}).get("graph_features", {}).get("dim")
        for ihead, t in enumerate(out_types):
            idx = var_cfg["output_index"][ihead]
            if t == "graph":
                out_dims.append(
                    graph_dims[idx] if graph_dims else int(sample.y_graph.shape[-1])
                )
            elif t == "node":
                if (
                    graph_size_variable
                    and arch["output_heads"]["node"][0]["architecture"]["type"]
                    == "mlp_per_node"
                ):
                    raise ValueError(
                        '"mlp_per_node" is not allowed for variable graph size'
                    )
                out_dims.append(node_dims[idx] if node_dims else 1)
            else:
                raise ValueError(f"Unknown output type {t}")
    arch["output_dim"] = out_dims
    arch["output_type"] = list(out_types)
    arch["num_nodes"] = sample.num_nodes

    # input dim: sum of selected node-feature dims (config_utils.py:62-64)
    node_dims = config.get("Dataset", {}).get("node_features", {}).get("dim")
    if node_dims:
        arch["input_dim"] = int(
            sum(node_dims[i] for i in var_cfg["input_node_features"])
        )
    else:
        arch["input_dim"] = len(var_cfg["input_node_features"])

    mpnn = arch["mpnn_type"]
    if mpnn in PNA_MODELS:
        deg = gather_degree_histogram(train)
        arch["pna_deg"] = deg
        arch["max_neighbours"] = len(deg) - 1
    else:
        arch.setdefault("pna_deg", None)

    if mpnn == "CGCNN" and not arch.get("global_attn_engine"):
        arch["hidden_dim"] = arch["input_dim"]

    if mpnn == "MACE":
        arch["avg_num_neighbors"] = stats["avg_num_neighbors"]
    else:
        arch.setdefault("avg_num_neighbors", None)

    for key in (
        "radius",
        "radial_type",
        "distance_transform",
        "num_gaussians",
        "num_filters",
        "envelope_exponent",
        "num_after_skip",
        "num_before_skip",
        "basis_emb_size",
        "int_emb_size",
        "out_emb_size",
        "num_radial",
        "num_spherical",
        "correlation",
        "max_ell",
        "node_max_ell",
    ):
        arch.setdefault(key, None)
    arch.setdefault("enable_interatomic_potential", False)
    arch.setdefault("periodic_boundary_conditions", False)

    # edge_dim rules (config_utils.py:179-206); Dataset.Descriptors
    # transforms replace edge_attr with a fixed-width feature set
    # (abstractrawdataset.py:133-137), so they fix edge_dim directly
    arch["edge_dim"] = None
    desc = config.get("Dataset", {}).get("Descriptors", {})
    if desc.get("SphericalCoordinates"):
        arch["edge_dim"] = 3
    elif desc.get("PointPairFeatures"):
        arch["edge_dim"] = 4
    elif arch.get("edge_features"):
        assert mpnn in EDGE_MODELS, (
            "Edge features can only be used with " + ", ".join(EDGE_MODELS)
        )
        arch["edge_dim"] = len(arch["edge_features"])
        assert not arch.get("enable_interatomic_potential", False)
    elif mpnn == "CGCNN":
        arch["edge_dim"] = 0

    # y_minmax for output denormalization (reference normalize_output_config,
    # config_utils.py:271-319): per-head [min, max] from the dataset tables
    if var_cfg.get("denormalize_output") and "_derived" in config:
        mm = config["_derived"].get("minmax")
        if mm is not None:
            y_minmax = []
            for t, idx in zip(var_cfg["type"], var_cfg["output_index"]):
                tab = (
                    mm["minmax_graph_feature"]
                    if t == "graph"
                    else mm["minmax_node_feature"]
                )
                y_minmax.append([float(tab[0, idx]), float(tab[1, idx])])
            var_cfg["y_minmax"] = y_minmax

    arch.setdefault("equivariance", None)
    arch.setdefault("freeze_conv_layers", False)
    arch.setdefault("initial_bias", None)
    arch.setdefault("activation_function", "relu")
    arch.setdefault("SyncBatchNorm", False)
    arch.setdefault("num_elements", 118)
    training.setdefault("conv_checkpointing", False)
    training.setdefault("loss_function_type", "mse")
    training.setdefault("precision", "fp32")
    training.setdefault("Optimizer", {"type": "AdamW", "learning_rate": 1e-3})
    training.setdefault("batch_size", 32)
    training.setdefault("num_epoch", 1)
    training.setdefault("patience", 10)

    return config
