"""Property tests: rotational invariance of predictions, force
equivariance F(Rx) = R F(x), and PBC edge construction.

The analogue of reference ``tests/test_rotational_invariance.py``,
``test_forces_equivariant.py``, ``test_periodic_boundary_conditions.py``.
"""

import numpy as np
import pytest

from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
from hydragnn_tpu.data.lennard_jones import lennard_jones_data, lj_energy_forces
from hydragnn_tpu.data.pbc import radius_graph_pbc
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.models.base import StackConfig, normalize_branches
from hydragnn_tpu.models.create import create_model
from hydragnn_tpu.train.loop import Trainer


def _rot(seed=3):
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def _mlip_cfg(node_max_ell=1, hidden=16, layers=2):
    return StackConfig(
        input_dim=1,
        hidden_dim=hidden,
        output_dim=(1,),
        output_type=("node",),
        node_branches=normalize_branches(
            {"num_headlayers": 2, "dim_headlayers": [16, 16], "type": "mlp"}
        ),
        task_weights=(1.0,),
        num_conv_layers=layers,
        radius=3.0,
        num_radial=6,
        equivariance=True,
        max_ell=2,
        node_max_ell=node_max_ell,
        avg_num_neighbors=8.0,
    )


def _batch(samples, bs=4):
    dims = compute_batch_dims(samples, bs)
    return next(iter(PaddedBatcher(samples, bs, dims=dims)))


@pytest.mark.parametrize("mpnn", ["SchNet", "PNAPlus", "EGNN", "PAINN", "PNAEq", "MACE"])
def test_rotational_invariance_of_scalar_outputs(mpnn):
    samples = lennard_jones_data(4, seed=11)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 3.0, 32)
    import dataclasses

    cfg = _mlip_cfg()
    if mpnn in ("PNAPlus", "PNAEq"):
        cfg = dataclasses.replace(cfg, pna_deg=tuple([0] * 5 + [10] * 10))
    model = create_model(mpnn, cfg)
    tr = Trainer(model, {"type": "Adam", "learning_rate": 1e-3})
    b = _batch(samples)
    state = tr.init_state(b)
    out = tr.predict_step(state, b)

    R = _rot()
    import copy

    # keep the edge set fixed (rotation-invariant in exact arithmetic; fp32
    # rotation can flip borderline edges, which is a graph-construction
    # artifact, not a model-invariance failure)
    rotated = copy.deepcopy(samples)
    for s in rotated:
        s.pos = s.pos @ R.T
    b2 = _batch(rotated)
    out2 = tr.predict_step(state, b2)
    nm = np.asarray(b.node_mask)
    np.testing.assert_allclose(
        np.asarray(out[0])[nm], np.asarray(out2[0])[nm], rtol=2e-3, atol=2e-4
    )


def _force_equivariance_check(model, cfg_note=""):
    """F(Rx) = R F(x) and E(Rx) = E(x) for a fresh-initialized model
    (reference tests/test_forces_equivariant.py:49-125 semantics)."""
    from hydragnn_tpu.models.mlip import energy_force_loss

    samples = lennard_jones_data(4, seed=13)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 3.0, 32)
    weights = {"energy_weight": 1.0, "energy_peratom_weight": 1.0, "force_weight": 1.0}
    tr = Trainer(model, {"type": "Adam", "learning_rate": 1e-3}, mlip=weights)
    b = _batch(samples)
    state = tr.init_state(b)
    _, _, _, forces, energy = energy_force_loss(
        model, state.params, state.batch_stats, b, weights
    )

    R = _rot(7)
    import copy

    rotated = copy.deepcopy(samples)
    for s in rotated:
        s.pos = s.pos @ R.T
        s.forces = s.forces @ R.T
    b2 = _batch(rotated)
    _, _, _, forces2, energy2 = energy_force_loss(
        model, state.params, state.batch_stats, b2, weights
    )
    gm = np.asarray(b.graph_mask)
    nm = np.asarray(b.node_mask)
    # E(Rx) = E(x)
    np.testing.assert_allclose(
        np.asarray(energy)[gm], np.asarray(energy2)[gm], rtol=2e-3, atol=2e-4,
        err_msg=f"energy invariance {cfg_note}",
    )
    # F(Rx) = R F(x)
    np.testing.assert_allclose(
        np.asarray(forces)[nm] @ R.T,
        np.asarray(forces2)[nm],
        rtol=5e-3,
        atol=5e-4,
        err_msg=f"force equivariance {cfg_note}",
    )


@pytest.mark.parametrize(
    "mpnn", ["EGNN", "PAINN", "PNAEq", "MACE", "SchNet", "PNAPlus"]
)
def test_force_equivariance_matrix(mpnn):
    """Force equivariance across the geometric family (node-head energy),
    the matrix the reference covers in test_forces_equivariant.py."""
    import dataclasses

    cfg = _mlip_cfg()
    if mpnn in ("PNAPlus", "PNAEq"):
        cfg = dataclasses.replace(cfg, pna_deg=tuple([0] * 5 + [10] * 10))
    _force_equivariance_check(create_model(mpnn, cfg), mpnn)


def test_force_equivariance_graph_head():
    """Graph-head energy variant: E read from a graph head with add-pooling
    (reference create.py:651-672 sum-pool energy path)."""
    import dataclasses

    cfg = StackConfig(
        input_dim=1,
        hidden_dim=16,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(
            {"num_sharedlayers": 1, "dim_sharedlayers": 16,
             "num_headlayers": 2, "dim_headlayers": [16, 16]}
        ),
        task_weights=(1.0,),
        num_conv_layers=2,
        radius=3.0,
        num_radial=6,
        equivariance=True,
        max_ell=2,
        node_max_ell=1,
        avg_num_neighbors=8.0,
        graph_pooling="add",
    )
    _force_equivariance_check(create_model("EGNN", cfg), "EGNN graph-head")


def test_force_equivariance_mace_higher_order():
    """MACE at max_ell=3, correlation=3 (VERDICT: previously only tested at
    max_ell=2 scalar outputs)."""
    import dataclasses

    cfg = dataclasses.replace(
        _mlip_cfg(node_max_ell=2, hidden=8),
        max_ell=3,
        correlation=(3,),
    )
    _force_equivariance_check(create_model("MACE", cfg), "MACE l=3 corr=3")


@pytest.mark.slow  # radial formulas are pinned fast in
# test_radial_transforms; this end-to-end wiring check is compile-heavy
def test_force_equivariance_mace_radial_variants():
    """MACE with the non-default radial family actually wired through
    (MACEStack.py:80-81,171-177): chebyshev basis + Agnesi transform."""
    import dataclasses

    cfg = dataclasses.replace(
        _mlip_cfg(hidden=8),
        radial_type="chebyshev",
        distance_transform="Agnesi",
    )
    _force_equivariance_check(create_model("MACE", cfg), "MACE cheb+agnesi")
    cfg = dataclasses.replace(
        _mlip_cfg(hidden=8),
        radial_type="gaussian",
        distance_transform="Soft",
    )
    _force_equivariance_check(create_model("MACE", cfg), "MACE gauss+soft")


@pytest.mark.parametrize("mpnn", ["SchNet", "EGNN", "PAINN", "MACE"])
def test_forces_match_finite_difference_of_energy(mpnn):
    """Predicted forces are exactly -dE/dpos of the predicted energy."""
    from hydragnn_tpu.models.mlip import energy_force_loss

    samples = lennard_jones_data(2, seed=5)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 3.0, 32)
    cfg = _mlip_cfg(layers=1)
    model = create_model(mpnn, cfg)
    weights = {"energy_weight": 1.0, "force_weight": 1.0}
    tr = Trainer(model, {"type": "Adam", "learning_rate": 1e-3}, mlip=weights)
    b = _batch(samples, bs=2)
    state = tr.init_state(b)
    _, _, _, forces, energy = energy_force_loss(
        model, state.params, state.batch_stats, b, weights
    )
    # central finite differences (h sized for fp32 cancellation noise)
    h = 2e-2
    pos_p = np.asarray(b.pos).copy()
    pos_p[0, 0] += h
    pos_m = np.asarray(b.pos).copy()
    pos_m[0, 0] -= h
    _, _, _, _, e_p = energy_force_loss(
        model, state.params, state.batch_stats, b.replace(pos=pos_p), weights
    )
    _, _, _, _, e_m = energy_force_loss(
        model, state.params, state.batch_stats, b.replace(pos=pos_m), weights
    )
    fd = -(float(e_p[0]) - float(e_m[0])) / (2 * h)
    f = float(forces[0, 0])
    assert abs(fd - f) < 0.2 * max(1.0, abs(f)), (fd, f)


def test_pbc_edges_cross_boundary():
    # 2 atoms in a unit cube near opposite faces: PBC distance 0.2
    pos = np.array([[0.1, 0.5, 0.5], [0.9, 0.5, 0.5]], np.float32)
    cell = np.eye(3, dtype=np.float32)
    ei, shifts = radius_graph_pbc(pos, cell, radius=0.3)
    assert ei.shape[1] >= 2
    # verify vec convention: ||pos[r] - pos[s] + shift|| <= 0.3
    vec = pos[ei[1]] - pos[ei[0]] + shifts
    d = np.linalg.norm(vec, axis=1)
    assert (d <= 0.3 + 1e-6).all()
    assert np.isclose(d.min(), 0.2, atol=1e-5)


def test_pbc_invariant_to_wrapping():
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 2.0, (6, 3)).astype(np.float32)
    cell = (np.eye(3) * 2.0).astype(np.float32)
    ei1, sh1 = radius_graph_pbc(pos, cell, radius=1.0)
    # wrap one atom by a lattice vector
    pos2 = pos.copy()
    pos2[0] += cell[0]
    ei2, sh2 = radius_graph_pbc(pos2, cell, radius=1.0)
    # same multiset of distances
    d1 = np.sort(np.linalg.norm(pos[ei1[1]] - pos[ei1[0]] + sh1, axis=1))
    d2 = np.sort(np.linalg.norm(pos2[ei2[1]] - pos2[ei2[0]] + sh2, axis=1))
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_pbc_isolated_node_gets_artificial_edge():
    pos = np.array([[0.5, 0.5, 0.5]], np.float32)
    cell = (np.eye(3) * 10.0).astype(np.float32)
    ei, sh = radius_graph_pbc(pos, cell, radius=0.5)
    assert ei.shape[1] >= 1  # artificial self edge


def test_normalize_rotation_canonicalizes():
    """NormalizeRotation: a rotated copy of a sample maps to (nearly) the
    same canonical positions (reference Dataset.rotational_invariance)."""
    import copy

    from hydragnn_tpu.data.pipeline import normalize_rotation

    samples = lennard_jones_data(2, seed=21)
    rot = copy.deepcopy(samples)
    R = _rot(31)
    for s in rot:
        s.pos = s.pos @ R.T
    normalize_rotation(samples)
    normalize_rotation(rot)
    for a, b in zip(samples, rot):
        # principal axes fixed up to sign; compare Gram matrices
        ga = a.pos @ a.pos.T
        gb = b.pos @ b.pos.T
        np.testing.assert_allclose(ga, gb, atol=1e-3)
        # canonical coordinates agree up to per-axis sign
        for k in range(3):
            col_a, col_b = a.pos[:, k], b.pos[:, k]
            assert (
                np.abs(col_a - col_b).max() < 1e-3
                or np.abs(col_a + col_b).max() < 1e-3
            )


def test_force_equivariance_preserved_after_training():
    """Short MLIP training preserves F(Rx)=RF(x) (the reference's
    test_forces_equivariant_training.py): equivariance must hold for the
    TRAINED parameters, not just the init."""
    import copy
    import dataclasses

    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.models.mlip import energy_force_loss

    samples = lennard_jones_data(12, seed=21)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 3.0, 32)
    cfg = _mlip_cfg()
    model = create_model("EGNN", cfg)
    weights = {
        "energy_weight": 1.0,
        "energy_peratom_weight": 1.0,
        "force_weight": 10.0,
    }
    tr = Trainer(model, {"type": "Adam", "learning_rate": 3e-3}, mlip=weights)
    b = _batch(samples)
    state = tr.init_state(b)
    for _ in range(12):  # short but real training
        state, loss, _ = tr.train_step(state, b)
    assert np.isfinite(float(loss))

    _, _, _, forces, energy = energy_force_loss(
        model, state.params, state.batch_stats, b, weights
    )
    R = _rot(3)
    rotated = copy.deepcopy(samples)
    for s in rotated:
        s.pos = s.pos @ R.T
    b2 = _batch(rotated)
    _, _, _, forces2, energy2 = energy_force_loss(
        model, state.params, state.batch_stats, b2, weights
    )
    gm = np.asarray(b.graph_mask)
    nm = np.asarray(b.node_mask)
    np.testing.assert_allclose(
        np.asarray(energy)[gm], np.asarray(energy2)[gm], rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(forces)[nm] @ R.T,
        np.asarray(forces2)[nm],
        rtol=5e-3,
        atol=5e-4,
    )
