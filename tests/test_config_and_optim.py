"""Config normalization and optimizer selection coverage (reference
``tests/test_config.py`` / ``test_optimizer.py`` /
``test_loss_and_activation_functions.py`` analogues)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydragnn_tpu.configuration import merge_config, update_config
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.data.synthetic import deterministic_graph_data
from hydragnn_tpu.models.base import (
    activation_function_selection,
    masked_error_loss,
)
from hydragnn_tpu.train.optimizer import (
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)


def _cfg(mpnn="PNA"):
    return {
        "Dataset": {
            "name": "t",
            "node_features": {"name": ["a", "b", "c"], "dim": [1, 1, 1],
                              "column_index": [0, 1, 2]},
            "graph_features": {"name": ["g"], "dim": [1], "column_index": [0]},
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": mpnn,
                "radius": 2.0,
                "max_neighbours": 10,
                "hidden_dim": 8,
                "num_conv_layers": 2,
                "output_heads": {
                    "graph": {
                        "num_sharedlayers": 1,
                        "dim_sharedlayers": 4,
                        "num_headlayers": 1,
                        "dim_headlayers": [4],
                    }
                },
                "task_weights": [1.0],
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_index": [0],
                "type": ["graph"],
            },
            "Training": {"batch_size": 4, "num_epoch": 1},
        },
    }


def _samples():
    samples = deterministic_graph_data(10, seed=0)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 10)
        s.y_graph = s.y_raw
    return samples


def test_update_config_derivations():
    samples = _samples()
    cfg = update_config(_cfg("PNA"), samples, samples[:2], samples[:2])
    arch = cfg["NeuralNetwork"]["Architecture"]
    assert arch["input_dim"] == 1
    assert arch["output_dim"] == [1]
    assert arch["output_type"] == ["graph"]
    assert arch["pna_deg"] is not None and sum(arch["pna_deg"]) > 0
    assert arch["max_neighbours"] == len(arch["pna_deg"]) - 1
    assert arch["edge_dim"] is None
    # head normalization to branch list
    assert arch["output_heads"]["graph"][0]["type"] == "branch-0"


def test_update_config_cgcnn_hidden_dim():
    samples = _samples()
    cfg = update_config(_cfg("CGCNN"), samples, samples[:2], samples[:2])
    arch = cfg["NeuralNetwork"]["Architecture"]
    assert arch["hidden_dim"] == arch["input_dim"]
    assert arch["edge_dim"] == 0


def test_update_config_edge_features():
    cfg = _cfg("PNA")
    cfg["NeuralNetwork"]["Architecture"]["edge_features"] = ["lengths"]
    samples = _samples()
    cfg = update_config(cfg, samples, samples[:2], samples[:2])
    assert cfg["NeuralNetwork"]["Architecture"]["edge_dim"] == 1


def test_merge_config_deep():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = merge_config(base, {"a": {"b": 9}})
    assert out == {"a": {"b": 9, "c": 2}, "d": 3}


@pytest.mark.parametrize(
    "kind",
    ["SGD", "Adam", "Adadelta", "Adagrad", "Adamax", "AdamW", "RMSprop", "FusedLAMB"],
)
def test_optimizers_step(kind):
    tx = make_optimizer({"type": kind, "learning_rate": 1e-2})
    params = {"w": jnp.ones((4, 4))}
    st = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    upd, st = tx.update(grads, st, params)
    new = jax.tree.map(lambda p, u: p + u, params, upd)
    assert np.isfinite(np.asarray(new["w"])).all()
    assert get_learning_rate(st) == pytest.approx(1e-2)
    st = set_learning_rate(st, 5e-3)
    assert get_learning_rate(st) == pytest.approx(5e-3)


@pytest.mark.parametrize(
    "act", ["relu", "selu", "elu", "gelu", "tanh", "silu", "sigmoid",
            "lrelu_01", "softplus"]
)
def test_activations(act):
    fn = activation_function_selection(act)
    out = fn(jnp.linspace(-1, 1, 8))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("loss", ["mse", "mae", "rmse"])
def test_losses_match_numpy(loss):
    rng = np.random.default_rng(0)
    p = rng.normal(size=(6, 3)).astype(np.float32)
    t = rng.normal(size=(6, 3)).astype(np.float32)
    mask = np.array([1, 1, 1, 1, 0, 0], bool)
    got = float(
        masked_error_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(mask), loss)
    )
    d = (p - t)[mask]
    want = {
        "mse": (d**2).mean(),
        "mae": np.abs(d).mean(),
        "rmse": np.sqrt((d**2).mean()),
    }[loss]
    assert got == pytest.approx(float(want), rel=1e-4)
