"""Shared helpers for the SC26 harness examples.

TPU-native analogue of
``/root/reference/examples/multidataset_hpo_sc26/utils.py``: builds graphs
from raw (Z, positions) structures, provides a quick surrogate-trained
MLIP model for the inference / structure-optimization / branch-weighting
scripts, and the ``structure_to_dict`` JSON shape used by the reference's
``inference_*_write_json.py`` writers.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def structure_to_graph(z, pos, radius=5.0, max_neighbours=32):
    """(Z [n], pos [n,3]) -> GraphSample with radius-graph edges (the
    reference's ``atoms_to_graph``, structure_optimization_ASE.py:175-194)."""
    from hydragnn_tpu.data.radius_graph import radius_graph
    from hydragnn_tpu.data.sample import GraphSample

    x = np.asarray(z, np.float32)[:, None]
    s = GraphSample(x=x, pos=np.asarray(pos, np.float32), x_raw=x)
    s.edge_index = radius_graph(s.pos, radius, max_neighbours)
    return s


def structure_to_dict(z, pos, energy, forces):
    """Per-structure JSON entry (reference
    ``inference_random_structures_write_json.py:structure_to_dict``)."""
    return {
        "atomic_numbers": [int(v) for v in np.asarray(z).reshape(-1)],
        "positions": np.asarray(pos, np.float64).tolist(),
        "energy": float(energy),
        "forces": np.asarray(forces, np.float64).tolist(),
    }


def random_structures(n, seed=0):
    """Surrogate molecules with analytic Morse labels (zero-egress stand-in
    for the reference's random perturbed structures)."""
    from hydragnn_tpu.data import mlip_corpora as mc
    from hydragnn_tpu.data.md17 import _surrogate_energy_forces

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        z, eq = mc.random_molecule(rng)
        pos = eq + rng.normal(0, 0.05, eq.shape)
        e, f = _surrogate_energy_forces(pos, z)
        out.append((z.astype(np.int64), pos.astype(np.float32), e, f))
    return out


def train_quick_mlip(
    num_samples=160,
    num_epoch=12,
    hidden_dim=32,
    num_conv_layers=2,
    batch_size=16,
    seed=0,
    n_branch=1,
):
    """Train a small EGNN MLIP on the surrogate molecular corpus; returns
    (model, state, trainer, dims). With ``n_branch>1`` the decoders are
    per-dataset branches (for the branch-weighting script)."""
    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.loop import Trainer

    structures = random_structures(num_samples, seed=seed)
    samples = []
    for i, (z, pos, e, f) in enumerate(structures):
        s = structure_to_graph(z, pos)
        s.energy = float(e)
        s.forces = np.asarray(f, np.float32)
        s.y_raw = np.asarray([e], np.float32)
        s.dataset_id = i % n_branch
        samples.append(s)
    sort_edges_by_receiver(samples)

    node_head = {"num_headlayers": 2,
                 "dim_headlayers": [hidden_dim] * 2, "type": "mlp"}
    branches = (
        normalize_branches(node_head)
        if n_branch == 1
        else normalize_branches(
            [{"type": f"branch-{b}", "architecture": node_head}
             for b in range(n_branch)]
        )
    )
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=hidden_dim,
        output_dim=(1,),
        output_type=("node",),
        node_branches=branches,
        task_weights=(1.0,),
        num_conv_layers=num_conv_layers,
        equivariance=True,
        max_ell=1,
        node_max_ell=1,
        num_radial=8,
        radius=5.0,
        avg_num_neighbors=12.0,
    )
    model = create_model("EGNN", cfg)
    weights = {"energy_weight": 1.0, "energy_peratom_weight": 0.0,
               "force_weight": 10.0}
    trainer = Trainer(
        model, {"type": "AdamW", "learning_rate": 2e-3}, mlip=weights
    )
    dims = compute_batch_dims(samples, batch_size)
    loader = PaddedBatcher(samples, batch_size, shuffle=True, seed=1, dims=dims)
    state = trainer.init_state(next(iter(loader)))
    for epoch in range(num_epoch):
        loader.set_epoch(epoch)
        state, loss, _ = trainer.run_epoch(state, loader)
    print(f"quick MLIP trained: final train loss {loss:.5f}")
    return model, state, trainer, dims
