"""Round-trip tests for the multidataset MLIP corpus adapters
(ANI-1x / QM7-X / Transition1x / MPtrj / Alexandria schemas) and the
ASE-sqlite database module — the reference's examples consume these exact
on-disk formats (SURVEY §2.6)."""

import os

import numpy as np
import pytest

from hydragnn_tpu.data import mlip_corpora as mc
from hydragnn_tpu.data.ase_db import load_ase_sqlite, write_ase_sqlite


def test_ani1x_h5_roundtrip(tmp_path):
    p = str(tmp_path / "ani1x-release.h5")
    mc.synthesize_ani1x_h5(p, n_groups=3, confs_per_group=4, seed=1)
    samples = mc.load_ani1x_h5(p)
    assert len(samples) == 12
    s = samples[0]
    assert s.pos.shape[1] == 3 and s.forces.shape == s.pos.shape
    assert np.isfinite(s.energy)
    # NaN masking: poison one energy and reload
    import h5py

    with h5py.File(p, "r+") as f:
        g = f[list(f.keys())[0]]
        e = g["wb97x_dz.energy"][()]
        e[0] = np.nan
        del g["wb97x_dz.energy"]
        g["wb97x_dz.energy"] = e
    assert len(mc.load_ani1x_h5(p)) == 11


def test_qm7x_set_roundtrip(tmp_path):
    d = str(tmp_path / "qm7x")
    mc.synthesize_qm7x_set(d, n_mols=2, confs_per_mol=3, seed=2)
    samples = mc.load_qm7x_dir(d)
    assert len(samples) == 6
    assert samples[0].forces is not None
    assert mc.load_qm7x_dir(d, limit=4) and len(mc.load_qm7x_dir(d, limit=4)) == 4


def test_transition1x_roundtrip(tmp_path):
    p = str(tmp_path / "transition1x-release.h5")
    mc.synthesize_transition1x_h5(p, n_rxns=2, confs_per_rxn=3, seed=3)
    samples = mc.load_transition1x_h5(p)
    assert len(samples) == 6
    assert samples[0].forces.shape == samples[0].pos.shape


def test_mptrj_json_roundtrip(tmp_path):
    p = str(tmp_path / "MPtrj.json")
    mc.synthesize_mptrj_json(p, n_structures=2, frames_each=2, seed=4)
    samples = mc.load_mptrj_json(p)
    assert len(samples) == 4
    assert samples[0].cell is not None and samples[0].cell.shape == (3, 3)
    pa = mc.load_mptrj_json(p, energy_per_atom=True)
    assert np.isclose(pa[0].energy * pa[0].num_nodes, samples[0].energy)


def test_alexandria_dir_roundtrip(tmp_path):
    d = str(tmp_path / "alex")
    mc.synthesize_alexandria_dir(d, n_files=1, entries_per_file=3, seed=5)
    samples = mc.load_alexandria_dir(d)
    assert len(samples) == 3
    assert samples[0].forces is not None and samples[0].cell is not None


def test_ase_sqlite_roundtrip(tmp_path):
    rng = np.random.default_rng(6)
    z, pos, cell = mc.random_crystal(rng)
    e, f = mc.periodic_energy_forces(z, pos, cell)
    p = str(tmp_path / "x.db")
    write_ase_sqlite(
        p,
        [
            dict(z=z, pos=pos, cell=cell, pbc=(1, 1, 1), energy=e, forces=f),
            dict(z=z[:4], pos=pos[:4], energy=None),  # molecule, no calc
        ],
    )
    samples = load_ase_sqlite(p)
    assert len(samples) == 2
    np.testing.assert_allclose(samples[0].pos, pos, atol=1e-5)
    np.testing.assert_allclose(samples[0].forces, f, atol=1e-5)
    assert abs(samples[0].energy - e) < 1e-9
    assert samples[0].cell is not None
    assert samples[1].cell is None and samples[1].energy is None
    # the sqlite file is ASE-schema: systems table + information version row
    import sqlite3

    con = sqlite3.connect(p)
    (ver,) = con.execute(
        "SELECT value FROM information WHERE name='version'"
    ).fetchone()
    assert ver == "9"
    assert con.execute("SELECT COUNT(*) FROM species").fetchone()[0] > 0
    con.close()


def test_qcml_h5_roundtrip(tmp_path):
    p = str(tmp_path / "qcml.h5")
    mc.synthesize_qcml_h5(p, n_records=8, seed=8)
    samples = mc.load_qcml_h5(p)
    assert len(samples) == 8
    assert samples[0].forces.shape == samples[0].pos.shape
    # force-norm outlier filter (reference examples/qcml/train.py:116)
    import h5py

    with h5py.File(p, "r+") as f:
        g = f[sorted(f)[0]]
        frc = g["pbe0_forces"][()]
        del g["pbe0_forces"]
        g["pbe0_forces"] = frc + 1e4
    assert len(mc.load_qcml_h5(p)) == 7
    pa = mc.load_qcml_h5(p, energy_per_atom=True)
    assert np.isclose(pa[0].energy * pa[0].num_nodes, mc.load_qcml_h5(p)[0].energy)


def test_periodic_surrogate_force_consistency():
    rng = np.random.default_rng(7)
    z, pos, cell = mc.random_crystal(rng)
    _, f0 = mc.periodic_energy_forces(z, pos, cell)
    eps = 1e-5
    for k in range(3):
        pp = pos.copy()
        pp[1, k] += eps
        ep, _ = mc.periodic_energy_forces(z, pp, cell)
        pm = pos.copy()
        pm[1, k] -= eps
        em, _ = mc.periodic_energy_forces(z, pm, cell)
        assert abs(-(ep - em) / (2 * eps) - f0[1, k]) < 1e-3


@pytest.mark.parametrize(
    "fmt",
    ["ani1x", "qm7x", "transition1x", "mptrj", "alexandria", "ase_db", "qcml"],
)
def test_formats_through_run_training(fmt, tmp_path, monkeypatch):
    """Each new Dataset.format trains end to end (tiny MLIP config)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    monkeypatch.chdir(tmp_path)
    path = {
        "ani1x": str(tmp_path / "d" / "ani1x-release.h5"),
        "qm7x": str(tmp_path / "d" / "qm7x"),
        "transition1x": str(tmp_path / "d" / "t1x.h5"),
        "mptrj": str(tmp_path / "d" / "MPtrj.json"),
        "alexandria": str(tmp_path / "d" / "alex"),
        "ase_db": str(tmp_path / "d" / "x.db"),
        "qcml": str(tmp_path / "d" / "qcml.h5"),
    }[fmt]
    periodic = fmt in ("mptrj", "alexandria", "ase_db")
    config = {
        "Verbosity": {"level": 0},
        "Dataset": {
            "name": f"{fmt}_smoke",
            "format": fmt,
            "path": {"total": path},
            "num_samples": 24,
            "node_features": {"name": ["Z"], "dim": [1], "column_index": [0]},
            "graph_features": {"name": ["energy"], "dim": [1], "column_index": [0]},
        },
        "NeuralNetwork": {
            "Architecture": {
                "mpnn_type": "EGNN",
                "radius": 4.0,
                "max_neighbours": 20,
                "periodic_boundary_conditions": periodic,
                "hidden_dim": 16,
                "num_conv_layers": 1,
                "graph_pooling": "add",
                "output_heads": {
                    "graph": {"num_sharedlayers": 1, "dim_sharedlayers": 16,
                              "num_headlayers": 1, "dim_headlayers": [16]}
                },
                "task_weights": [1.0],
                "enable_interatomic_potential": True,
                "energy_weight": 1.0,
                "energy_peratom_weight": 0.0,
                "force_weight": 1.0,
            },
            "Variables_of_interest": {
                "input_node_features": [0],
                "output_names": ["energy"],
                "output_index": [0],
                "type": ["graph"],
                "output_dim": [1],
            },
            "Training": {
                "num_epoch": 2,
                "batch_size": 8,
                "perc_train": 0.7,
                "Optimizer": {"type": "AdamW", "learning_rate": 1e-3},
                "num_devices": 1,
            },
        },
    }
    from hydragnn_tpu.api import run_training

    info = run_training(config)
    assert np.isfinite(info["history"][-1]["train"])
