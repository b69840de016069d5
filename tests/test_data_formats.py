"""Container round-trip, LSMS text parsing, splitting, checkpoint/resume."""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import pytest

from hydragnn_tpu.data.container import GraphContainerDataset, GraphContainerWriter
from hydragnn_tpu.data.lennard_jones import lennard_jones_data
from hydragnn_tpu.data.lsms import load_lsms_directory, parse_lsms_file
from hydragnn_tpu.data.pipeline import compositional_stratified_split, split_dataset
from hydragnn_tpu.data.radius_graph import radius_graph
from hydragnn_tpu.data.synthetic import deterministic_graph_data


def test_container_roundtrip(tmp_path):
    samples = lennard_jones_data(6)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 3.0, 16)
        s.y_graph = np.asarray([s.energy], np.float32)
    w = GraphContainerWriter(str(tmp_path / "shard0"), attrs={"pna_deg": [0, 1, 2]})
    w.write(samples)
    ds = GraphContainerDataset(str(tmp_path / "shard0"))
    assert len(ds) == 6
    assert ds.attrs["pna_deg"] == [0, 1, 2]
    for i in (0, 3, 5):
        got = ds[i]
        np.testing.assert_allclose(got.x, samples[i].x)
        np.testing.assert_allclose(got.pos, samples[i].pos)
        np.testing.assert_array_equal(got.edge_index, samples[i].edge_index)
        assert got.energy == float(samples[i].energy)
        np.testing.assert_allclose(got.forces, samples[i].forces)


def test_container_multi_shard(tmp_path):
    s1 = lennard_jones_data(3, seed=1)
    s2 = lennard_jones_data(4, seed=2)
    GraphContainerWriter(str(tmp_path / "a")).write(s1)
    GraphContainerWriter(str(tmp_path / "b")).write(s2)
    ds = GraphContainerDataset([str(tmp_path / "a"), str(tmp_path / "b")])
    assert len(ds) == 7
    np.testing.assert_allclose(ds[5].pos, s2[2].pos)


def test_lsms_parse(tmp_path):
    # write an LSMS-format file (reference deterministic_graph_data layout)
    txt = "42.5\t10.1\n"
    txt += "1\t0\t0.0\t0.0\t0.0\t1.0\t2.0\t1.0\n"
    txt += "2\t1\t0.5\t0.5\t0.5\t1.5\t4.25\t3.375\n"
    p = tmp_path / "output0.txt"
    p.write_text(txt)
    s = parse_lsms_file(
        str(p),
        node_feature_dims=[1, 1, 1],
        node_feature_cols=[0, 6, 7],
        graph_feature_dims=[1],
        graph_feature_cols=[0],
    )
    assert s.num_nodes == 2
    np.testing.assert_allclose(s.y_raw, [42.5])
    # charge-density update: col1 -= col0
    np.testing.assert_allclose(s.x_raw[0], [1.0, 2.0 - 1.0, 1.0])
    np.testing.assert_allclose(s.pos[1], [0.5, 0.5, 0.5])
    samples = load_lsms_directory(str(tmp_path), {
        "node_features": {"dim": [1, 1, 1], "column_index": [0, 6, 7]},
        "graph_features": {"dim": [1], "column_index": [0]},
    })
    assert len(samples) == 1


def test_compositional_split_covers_categories():
    samples = deterministic_graph_data(60, seed=5)
    tr, va, te = compositional_stratified_split(samples, 0.7)
    assert len(tr) + len(va) + len(te) == 60
    assert len(tr) > len(va) and len(tr) > len(te)

    def cats(ss):
        return set(
            tuple(sorted(set(np.asarray(s.x[:, 0]).astype(int).tolist())))
            for s in ss
        )

    # big categories present in all splits
    common = cats(tr) & cats(va) & cats(te)
    assert len(common) >= 1


def test_checkpoint_roundtrip(tmp_path):
    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model
    from hydragnn_tpu.train.checkpoint import CheckpointManager
    from hydragnn_tpu.train.loop import Trainer

    samples = deterministic_graph_data(8, seed=2)
    for s in samples:
        s.edge_index = radius_graph(s.pos, 2.0, 16)
        s.y_graph = s.y_raw
    cfg = StackConfig(
        input_dim=3,
        hidden_dim=8,
        output_dim=(1,),
        output_type=("graph",),
        graph_branches=normalize_branches(
            {"num_sharedlayers": 1, "dim_sharedlayers": 8,
             "num_headlayers": 1, "dim_headlayers": [8]}
        ),
        task_weights=(1.0,),
        num_conv_layers=2,
    )
    model = create_model("GIN", cfg)
    tr = Trainer(model, {"type": "AdamW", "learning_rate": 1e-2})
    b = next(iter(PaddedBatcher(samples, 4, dims=compute_batch_dims(samples, 4))))
    state = tr.init_state(b)
    state, loss, _ = tr.train_step(state, b)

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, state)
    state2 = tr.init_state(b)
    restored = mngr.restore(state2)
    import jax

    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )
    assert all(jax.tree.leaves(same))
    assert int(restored.step) == int(state.step)


def test_smiles_builtin_parser_basic_molecules():
    """Built-in SMILES fallback (reference smiles_utils.py:35-127 feature
    layout): ethanol, benzene (aromatic ring closure), acetonitrile (triple
    bond), branching and explicit-bracket atoms."""
    from hydragnn_tpu.data.smiles import smiles_to_graph

    # ethanol CCO -> 3 heavy + 6 H = 9 atoms, 8 bonds -> 16 directed edges
    g = smiles_to_graph("CCO", ytarget=np.asarray([1.5]))
    assert g.num_nodes == 9
    assert g.num_edges == 16
    assert g.edge_attr.shape == (16, 4)
    assert float(g.y_graph[0]) == 1.5
    # edges sorted by src*N+dst (reference perm sort)
    key = g.edge_index[0] * g.num_nodes + g.edge_index[1]
    assert (np.diff(key) >= 0).all()

    # benzene c1ccccc1: 6 aromatic C + 6 H; ring bond count 6 + 6 C-H
    g = smiles_to_graph("c1ccccc1")
    assert g.num_nodes == 12
    assert g.num_edges == 24
    # aromatic flag on the carbons, aromatic bond class present
    z_col = len({"C", "H"})  # one-hot width for auto types
    x = g.x
    arom_col = z_col + 1
    assert x[:, arom_col].sum() == 6
    assert g.edge_attr[:, 3].sum() == 12  # 6 aromatic bonds, both directions

    # acetonitrile CC#N: sp carbon flagged
    g = smiles_to_graph("CC#N")
    assert g.num_nodes == 6  # 3 heavy + 3 H
    sp_col = len({"C", "N", "H"}) + 2
    assert x.shape[1] >= 6

    # branching + bracket atom with charge
    g = smiles_to_graph("CC(=O)[O-]")
    assert g.num_nodes >= 7
    assert np.isfinite(g.x).all()

    # two-letter halogen
    g = smiles_to_graph("ClCCl")
    zs = g.x[:, -6]  # Z column: [one_hot | Z, arom, sp, sp2, sp3, numH]
    assert (zs == 17).sum() == 2


def test_smiles_ring_closure_percent_and_errors():
    from hydragnn_tpu.data.smiles import smiles_to_graph

    g = smiles_to_graph("C%10CCCCC%10")  # cyclohexane with %nn closure
    heavy = (g.x[:, -6] == 6).sum()
    assert heavy == 6
    with pytest.raises(ValueError):
        smiles_to_graph("C1CC")  # unclosed ring


def test_point_pair_features_formula():
    """PPF transform vs hand-computed angles (PyG PointPairFeatures(cat=False)
    semantics: edge_attr = [||d||, ang(n_i,d), ang(n_j,d), ang(n_i,n_j)])."""
    from hydragnn_tpu.data.radius_graph import add_point_pair_features
    from hydragnn_tpu.data.sample import GraphSample

    pos = np.array([[0.0, 0, 0], [2.0, 0, 0]], np.float32)
    norm = np.array([[0.0, 0, 1], [0.0, 1, 0]], np.float32)
    s = GraphSample(
        x=np.zeros((2, 1), np.float32),
        pos=pos,
        edge_index=np.array([[0, 1], [1, 0]]),
        norm=norm,
    )
    add_point_pair_features([s])
    assert s.edge_attr.shape == (2, 4)
    # edge 0->1: d=(+2,0,0); n_i=z, n_j=y: all three angles are pi/2
    np.testing.assert_allclose(
        s.edge_attr[0], [2.0, np.pi / 2, np.pi / 2, np.pi / 2], atol=1e-6
    )
    # edge 1->0: d=(-2,0,0); angles still pi/2
    np.testing.assert_allclose(
        s.edge_attr[1], [2.0, np.pi / 2, np.pi / 2, np.pi / 2], atol=1e-6
    )
    # missing normals must raise (PyG data.norm requirement)
    s2 = GraphSample(
        x=np.zeros((2, 1), np.float32), pos=pos,
        edge_index=np.array([[0, 1], [1, 0]]),
    )
    with pytest.raises(ValueError):
        add_point_pair_features([s2])


def test_descriptors_config_wiring():
    """Dataset.Descriptors drives edge_dim and rejects the combined case
    (reference abstractrawdataset.py:113-137)."""
    import json

    cfg = json.load(open("examples/unit_lattice/config.json"))
    cfg["Dataset"]["num_samples"] = 40
    cfg["Dataset"]["Descriptors"] = {"SphericalCoordinates": True}
    cfg["NeuralNetwork"]["Training"]["num_epoch"] = 1
    cfg["NeuralNetwork"]["Architecture"]["mpnn_type"] = "PNAPlus"
    # wiring test, not a capacity test: tiny stack compiles ~4x faster
    cfg["NeuralNetwork"]["Architecture"]["hidden_dim"] = 16
    cfg["NeuralNetwork"]["Architecture"]["num_conv_layers"] = 1
    cfg.setdefault("Visualization", {})["create_plots"] = False
    cfg["Dataset"]["name"] = "ppf_wiring"
    from hydragnn_tpu.api import run_training

    info = run_training(cfg)
    assert np.isfinite(info["history"][-1]["train"])
    saved = json.load(open("logs/ppf_wiring/config.json"))
    assert saved["NeuralNetwork"]["Architecture"]["edge_dim"] == 3

    cfg["Dataset"]["Descriptors"] = {
        "SphericalCoordinates": True,
        "PointPairFeatures": True,
    }
    with pytest.raises(ValueError):
        run_training(cfg)


def test_smiles_csv_format_end_to_end(tmp_path, monkeypatch):
    """smiles_csv dataset format (CSCE schema): surrogate synthesis ->
    csv -> graphs -> one training epoch with bond-order edge features."""
    import json

    from hydragnn_tpu.api import run_training

    monkeypatch.chdir(tmp_path)
    cfg = json.load(
        open(os.path.join(REPO, "examples/csce/csce_gap.json"))
    )
    cfg["Dataset"]["num_samples"] = 60
    cfg["Dataset"]["path"]["total"] = str(tmp_path / "gap.csv")
    cfg["NeuralNetwork"]["Training"]["num_epoch"] = 1
    cfg["NeuralNetwork"]["Training"]["batch_size"] = 16
    info = run_training(cfg)
    assert np.isfinite(info["history"][-1]["train"])


def test_cfg_roundtrip_and_bulk_target(tmp_path):
    """Extended-CFG writer/parser round trip: reference node-feature order
    [Z, mass, aux...], H0 cell, sibling .bulk graph target."""
    from hydragnn_tpu.data.lsms import (
        load_cfg_directory,
        synthesize_cfg_directory,
    )

    synthesize_cfg_directory(str(tmp_path), 3, seed=2)
    gs = load_cfg_directory(str(tmp_path))
    assert len(gs) == 3
    g = gs[0]
    assert g.x.shape[1] == 6  # Z, mass, c_peratom, fx, fy, fz
    assert set(np.unique(g.x[:, 0])) <= {28.0, 41.0}
    # masses pair with species
    ni = g.x[:, 0] == 28.0
    np.testing.assert_allclose(g.x[ni, 1], 58.6934, rtol=1e-4)
    assert g.cell is not None and g.cell[0, 0] > 9.0
    assert g.y_raw.shape == (1,) and 150.0 < float(g.y_raw[0]) < 260.0
    # positions inside the cell
    assert g.pos.min() >= -1.0 and g.pos.max() <= float(g.cell[0, 0]) + 1.0


def test_mol_from_xyz_bond_perception():
    """xyz2mol analogue: geometry -> bonds with valence-driven orders
    (ethene C=C double bond, ethane C-C single, HCN triple)."""
    from hydragnn_tpu.data.smiles import mol_from_xyz

    def cc_order(z, pos, a=0, b=1):
        g = mol_from_xyz(np.asarray(z), np.asarray(pos))
        ei = g.edge_index
        for k in range(ei.shape[1]):
            if set(ei[:, k].tolist()) == {a, b}:
                return int(np.argmax(g.edge_attr[k]))
        raise AssertionError("bond not found")

    ethene = ([6, 6, 1, 1, 1, 1],
              [[0, 0, 0], [1.33, 0, 0], [-0.56, 0.92, 0], [-0.56, -0.92, 0],
               [1.89, 0.92, 0], [1.89, -0.92, 0]])
    assert cc_order(*ethene) == 1  # double
    ethane = ([6, 6, 1, 1, 1, 1, 1, 1],
              [[0, 0, 0], [1.54, 0, 0],
               [-0.5, 1.0, 0], [-0.5, -0.5, 0.85], [-0.5, -0.5, -0.85],
               [2.04, 1.0, 0], [2.04, -0.5, 0.85], [2.04, -0.5, -0.85]])
    assert cc_order(*ethane) == 0  # single
    hcn = ([1, 6, 7], [[-1.07, 0, 0], [0, 0, 0], [1.16, 0, 0]])
    assert cc_order(*hcn, a=1, b=2) == 2  # triple
