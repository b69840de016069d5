"""Graph-attr conditioning (film / concat_node / fuse_pool), vector node
outputs, conv node heads, mlp_per_node heads (reference
``test_graphs_graphattr.py`` / ``ci_vectoroutput.json`` /
``ci_conv_head.json`` coverage)."""

import dataclasses

import numpy as np
import pytest

from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
from hydragnn_tpu.data.pipeline import normalize_minmax, select_variables
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.models.base import StackConfig, normalize_branches
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.loop import Trainer


def _samples(n=12, fixed_size=False):
    if fixed_size:
        samples = deterministic_graph_data(
            n, unit_cell_x_range=(2, 3), unit_cell_y_range=(2, 3), seed=4
        )
    else:
        samples = deterministic_graph_data(n, seed=4)
    var = {
        "input_node_features": [0],
        "output_index": [0, 0],
        "type": ["graph", "node"],
    }
    normalize_minmax(samples, [1, 1, 1], [1])
    select_variables(samples, var, [1, 1, 1], [1])
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 100)
        s.graph_attr = np.asarray([s.num_nodes / 8.0, 1.0], np.float32)
    return samples


def _cfg(**kw):
    base = dict(
        input_dim=1,
        hidden_dim=8,
        output_dim=(1, 1),
        output_type=("graph", "node"),
        graph_branches=normalize_branches(
            {"num_sharedlayers": 1, "dim_sharedlayers": 8,
             "num_headlayers": 1, "dim_headlayers": [8]}
        ),
        node_branches=normalize_branches(
            {"num_headlayers": 2, "dim_headlayers": [8, 8], "type": "mlp"}
        ),
        task_weights=(1.0, 1.0),
        num_conv_layers=2,
    )
    base.update(kw)
    return StackConfig(**base)


def _run_steps(model, samples, n=3):
    tr = Trainer(model, {"type": "AdamW", "learning_rate": 1e-2})
    b = next(iter(PaddedBatcher(samples, len(samples),
                                dims=compute_batch_dims(samples, len(samples)))))
    state = tr.init_state(b)
    for _ in range(n):
        state, loss, _ = tr.train_step(state, b)
    assert np.isfinite(float(loss)), float(loss)
    return float(loss)


@pytest.mark.parametrize("mode", ["film", "concat_node", "fuse_pool"])
def test_graph_attr_conditioning(mode):
    samples = _samples()
    cfg = _cfg(
        use_graph_attr_conditioning=True,
        graph_attr_conditioning_mode=mode,
        graph_attr_dim=2,
    )
    _run_steps(create_model("GIN", cfg), samples)


def test_vector_node_outputs():
    """dim-3 node head (ci_vectoroutput.json analogue)."""
    samples = _samples()
    for s in samples:
        s.y_node = np.tile(s.y_node, (1, 3))
    cfg = _cfg(output_dim=(1, 3))
    _run_steps(create_model("PNA", dataclasses.replace(
        cfg, pna_deg=(0, 0, 1, 2, 5, 5, 5, 2))), samples)


def test_conv_node_head():
    """node head type 'conv' (ci_conv_head.json analogue)."""
    samples = _samples()
    cfg = _cfg(
        node_branches=normalize_branches(
            {"num_headlayers": 2, "dim_headlayers": [8, 8], "type": "conv"}
        )
    )
    _run_steps(create_model("GIN", cfg), samples)


def test_mlp_per_node_head_fixed_size_graphs():
    samples = _samples(fixed_size=True)
    sizes = {s.num_nodes for s in samples}
    assert len(sizes) == 1
    cfg = _cfg(
        node_branches=normalize_branches(
            {"num_headlayers": 2, "dim_headlayers": [8, 8],
             "type": "mlp_per_node"}
        ),
        num_nodes=sizes.pop(),
    )
    _run_steps(create_model("GIN", cfg), samples)


def test_max_pooling_and_add_pooling():
    samples = _samples()
    for pool in ("add", "max"):
        cfg = _cfg(graph_pooling=pool)
        _run_steps(create_model("GIN", cfg), samples)


def test_gaussian_nll_var_output():
    samples = _samples()
    cfg = _cfg(loss_function_type="GaussianNLLLoss", var_output=True)
    _run_steps(create_model("GIN", cfg), samples)


def test_pnaeq_conv_head_stays_finite():
    """Regression: degree-scaler attenuation must be clamped (PyG deg>=1)
    or padding rows (deg 0) produce Inf whose masked cotangent NaNs the
    BatchNorm-scale gradient."""
    samples = _samples()
    cfg = dataclasses.replace(
        _cfg(
            node_branches=normalize_branches(
                {"num_headlayers": 2, "dim_headlayers": [8, 8], "type": "conv"}
            )
        ),
        pna_deg=(0, 0, 1, 2, 5, 5, 5, 2),
    )
    _run_steps(create_model("PNAEq", cfg), samples, n=6)
