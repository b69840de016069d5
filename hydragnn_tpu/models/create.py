"""Model factory: maps ``mpnn_type`` -> stack class and wires architecture
hyperparameters (the analogue of ``hydragnn/models/create.py:41-766``)."""

from __future__ import annotations

from typing import Any, Dict, Optional

from hydragnn_tpu.models.base import ConvStack, StackConfig, normalize_branches


def _stack_registry() -> Dict[str, Any]:
    from hydragnn_tpu.models import invariant

    registry = {
        "GIN": invariant.GINStack,
        "SAGE": invariant.SAGEStack,
        "MFC": invariant.MFCStack,
        "CGCNN": invariant.CGCNNStack,
        "PNA": invariant.PNAStack,
        "GAT": invariant.GATStack,
    }
    from hydragnn_tpu.models import geometric

    for name, attr in (
        ("SchNet", "SCFStack"),
        ("PNAPlus", "PNAPlusStack"),
        ("EGNN", "EGCLStack"),
        ("PAINN", "PAINNStack"),
        ("PNAEq", "PNAEqStack"),
        ("DimeNet", "DIMEStack"),
    ):
        if hasattr(geometric, attr):
            registry[name] = getattr(geometric, attr)
    try:
        from hydragnn_tpu.models import mace

        registry["MACE"] = mace.MACEStack
    except ImportError:
        pass
    return registry


def stack_config_from_architecture(
    arch: Dict[str, Any], training: Optional[Dict[str, Any]] = None
) -> StackConfig:
    """Build a StackConfig from the normalized ``NeuralNetwork.Architecture``
    section (post ``update_config``; see configuration.py)."""
    training = training or {}
    corr = arch.get("correlation") or 2
    if isinstance(corr, int):
        corr = (corr,)
    return StackConfig(
        input_dim=int(arch["input_dim"]),
        hidden_dim=int(arch["hidden_dim"]),
        output_dim=tuple(int(d) for d in arch["output_dim"]),
        output_type=tuple(arch["output_type"]),
        graph_branches=normalize_branches(arch["output_heads"].get("graph")),
        node_branches=normalize_branches(arch["output_heads"].get("node")),
        activation=arch.get("activation_function", "relu"),
        loss_function_type=training.get("loss_function_type", "mse"),
        task_weights=tuple(float(w) for w in arch["task_weights"]),
        num_conv_layers=int(arch["num_conv_layers"]),
        edge_dim=arch.get("edge_dim"),
        graph_pooling=arch.get("graph_pooling", "mean"),
        equivariance=bool(arch.get("equivariance", False)),
        num_nodes=arch.get("num_nodes"),
        use_graph_attr_conditioning=bool(arch.get("use_graph_attr_conditioning", False)),
        graph_attr_conditioning_mode=arch.get(
            "graph_attr_conditioning_mode", "concat_node"
        ),
        graph_attr_dim=int(arch.get("graph_attr_dim", 0) or 0),
        global_attn_engine=arch.get("global_attn_engine", "") or "",
        global_attn_type=arch.get("global_attn_type", "") or "",
        global_attn_heads=int(arch.get("global_attn_heads", 8) or 8),
        pe_dim=int(arch.get("pe_dim", 1) or 1),
        radius=float(arch.get("radius", 5.0) or 5.0),
        max_neighbours=int(arch.get("max_neighbours", 100) or 100),
        num_radial=int(arch.get("num_radial", 6) or 6),
        radial_type=arch.get("radial_type", "bessel") or "bessel",
        distance_transform=arch.get("distance_transform", "None") or "None",
        envelope_exponent=int(arch.get("envelope_exponent", 5) or 5),
        num_gaussians=int(arch.get("num_gaussians", 50) or 50),
        num_filters=int(arch.get("num_filters", 126) or 126),
        num_spherical=int(arch.get("num_spherical", 7) or 7),
        num_before_skip=int(arch.get("num_before_skip", 1) or 1),
        num_after_skip=int(arch.get("num_after_skip", 2) or 2),
        int_emb_size=int(arch.get("int_emb_size", 64) or 64),
        basis_emb_size=int(arch.get("basis_emb_size", 8) or 8),
        out_emb_size=int(arch.get("out_emb_size", 128) or 128),
        pna_deg=tuple(int(x) for x in (arch.get("pna_deg") or ())),
        max_ell=int(arch.get("max_ell", 1) or 1),
        node_max_ell=int(arch.get("node_max_ell", 1) or 1),
        correlation=tuple(int(c) for c in corr),
        product_basis=arch.get("product_basis", "umatrix") or "umatrix",
        avg_num_neighbors=float(arch.get("avg_num_neighbors") or 10.0),
        num_elements=int(arch.get("num_elements", 118) or 118),
        freeze_conv=bool(arch.get("freeze_conv_layers", False)),
        initial_bias=arch.get("initial_bias"),
        conv_checkpointing=bool(training.get("conv_checkpointing", False)),
        # training differentiates THROUGH forces when the MLIP force term
        # is weighted: kernels must stay jvp-composable (models/base.py)
        force_grad=bool(
            arch.get("enable_interatomic_potential", False)
            and float(arch.get("force_weight", 0.0)) > 0.0
        ),
        var_output=training.get("loss_function_type", "mse") == "GaussianNLLLoss",
    )


def create_model(mpnn_type: str, cfg: StackConfig) -> ConvStack:
    registry = _stack_registry()
    if mpnn_type not in registry:
        raise ValueError(
            f"Unknown mpnn_type {mpnn_type!r}; available: {sorted(registry)}"
        )
    return registry[mpnn_type](cfg=cfg)


def create_model_config(config: Dict[str, Any], verbosity: int = 0) -> ConvStack:
    """Reference ``create_model_config`` analogue: takes the (updated)
    ``NeuralNetwork`` config section."""
    arch = config["Architecture"]
    training = config.get("Training", {})
    cfg = stack_config_from_architecture(arch, training)
    return create_model(arch["mpnn_type"], cfg)
