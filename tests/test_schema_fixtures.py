"""Byte-exact on-disk format fixtures for the real-dataset adapters
(VERDICT r02 item 10).

Every fixture here is HAND-TRANSCRIBED from the published format
documentation — NOT produced by this repo's surrogate synthesizers — so
drift between a synthesizer and a parser cannot silently mask adapter
breakage against the real releases:

  * QM9 ``dsgdb9nsd_*.xyz``: layout from the Ramakrishnan et al. 2014
    dataset README (natoms / "gdb idx" + 15 tab-separated scalars /
    element x y z mulliken per atom / frequencies / SMILES / InChI),
    including the infamous ``*^`` exponent quirk.
  * MD17 ``.npz``: the sGDML release key set (E, F, R, z + metadata).
  * MPtrj JSON: MPtrj-2022.9 nesting (mp-id -> frame-id -> pymatgen
    Structure.as_dict() + energy/force/stress keys).
  * extended XYZ: the canonical Lattice=/Properties= comment line.
  * ASE sqlite: the version-9 ``systems`` table with little-endian
    float64/int32 blobs, written with raw stdlib sqlite3 SQL.
"""

import json
import os
import sqlite3

import numpy as np

# --------------------------------------------------------------------- QM9

# 3-atom water-like entry; tabs between fields exactly as released; the
# homo value uses the '*^' exponent quirk present in some release files
_GDB9 = (
    "3\n"
    "gdb 1\t157.7\t157.7\t157.7\t0.0\t13.21\t-0.3877\t11.7*^-2\t0.5048\t"
    "35.36\t0.044749\t-40.47893\t-40.476062\t-40.475117\t-40.498597\t6.469\n"
    "O\t-0.0126981359\t1.0858041578\t0.0080009958\t-0.535689\n"
    "H\t0.002150416\t-0.0060313176\t0.0019761204\t0.133921\n"
    "H\t1.0117308433\t1.4637511618\t0.0002765748\t0.401768\n"
    "1341.307\t1341.3284\t1341.365\n"
    "O\tO\n"
    "InChI=1S/H2O/h1H2\tInChI=1S/H2O/h1H2\n"
)


def test_qm9_dsgdb9nsd_fixture(tmp_path):
    from hydragnn_tpu.data.qm9 import QM9_TARGETS, parse_gdb9_xyz

    p = tmp_path / "dsgdb9nsd_000001.xyz"
    p.write_text(_GDB9)
    s = parse_gdb9_xyz(str(p))
    assert s.pos.shape == (3, 3)
    np.testing.assert_array_equal(s.x_raw[:, 0], [8.0, 1.0, 1.0])
    # mulliken charges parsed from column 5
    np.testing.assert_allclose(
        s.x_raw[:, 1], [-0.535689, 0.133921, 0.401768], rtol=1e-6
    )
    # the 12 PyG-ordered targets are comment fields 5..16 (after gdb, idx,
    # A, B, C); homo carries the *^ exponent quirk
    y = dict(zip(QM9_TARGETS, np.asarray(s.y_raw, np.float64)))
    assert abs(y["mu"] - 0.0) < 1e-8
    assert abs(y["homo"] - (-0.3877)) < 1e-6
    assert abs(y["lumo"] - 0.117) < 1e-6  # 11.7*^-2
    assert abs(y["U0"] - (-40.47893)) < 1e-5
    assert abs(y["Cv"] - 6.469) < 1e-6
    np.testing.assert_allclose(
        s.pos[0], [-0.0126981359, 1.0858041578, 0.0080009958], rtol=1e-6
    )


# --------------------------------------------------------------------- MD17


def test_md17_npz_fixture(tmp_path):
    """The sGDML MD17 release stores E [n, 1] float64 in kcal/mol, F/R
    [n, natoms, 3], z int, plus metadata keys the loader must ignore."""
    from hydragnn_tpu.data.md17 import load_md17_npz

    rngc = np.random.default_rng(0)
    n, na = 4, 3
    p = tmp_path / "md17_uracil.npz"
    np.savez(
        p,
        E=np.asarray([[-1000.5], [-1001.0], [-999.75], [-1002.25]]),
        F=rngc.normal(size=(n, na, 3)),
        R=rngc.normal(size=(n, na, 3)),
        z=np.asarray([6, 8, 1]),
        name=np.asarray("uracil"),
        type=np.asarray("t"),
        md5=np.asarray("0" * 32),
        theory=np.asarray("PBE+vdW-TS"),
    )
    samples = load_md17_npz(str(p))
    assert len(samples) == 4
    assert samples[0].pos.shape == (3, 3)
    np.testing.assert_array_equal(samples[0].x_raw[:, 0], [6.0, 8.0, 1.0])
    assert abs(samples[2].energy - (-999.75)) < 1e-6
    assert samples[1].forces.shape == (3, 3)


# -------------------------------------------------------------------- MPtrj

_MPTRJ = {
    "mp-1096": {
        "mp-1096-0-2": {
            "structure": {
                "@module": "pymatgen.core.structure",
                "@class": "Structure",
                "charge": 0.0,
                "lattice": {
                    "matrix": [[4.0, 0.0, 0.0], [0.0, 4.0, 0.0],
                               [0.0, 0.0, 4.0]],
                    "pbc": [True, True, True],
                    "a": 4.0, "b": 4.0, "c": 4.0,
                    "alpha": 90.0, "beta": 90.0, "gamma": 90.0,
                    "volume": 64.0,
                },
                "sites": [
                    {
                        "species": [{"element": "Na", "occu": 1.0}],
                        "abc": [0.0, 0.0, 0.0],
                        "xyz": [0.0, 0.0, 0.0],
                        "label": "Na",
                        "properties": {"magmom": 0.0},
                    },
                    {
                        "species": [{"element": "Cl", "occu": 1.0}],
                        "abc": [0.5, 0.5, 0.5],
                        "xyz": [2.0, 2.0, 2.0],
                        "label": "Cl",
                        "properties": {"magmom": 0.0},
                    },
                ],
            },
            "uncorrected_total_energy": -6.85,
            "corrected_total_energy": -7.25,
            "energy_per_atom": -3.625,
            "ef_per_atom": -1.1,
            "e_per_atom_relaxed": -3.63,
            "ef_per_atom_relaxed": -1.11,
            "force": [[0.01, 0.0, -0.02], [-0.01, 0.0, 0.02]],
            "stress": [[0.1, 0, 0], [0, 0.1, 0], [0, 0, 0.1]],
            "magmom": 0.0,
            "bandgap": 5.0,
            "mp_id": "mp-1096",
        }
    }
}


def test_mptrj_json_fixture(tmp_path):
    from hydragnn_tpu.data.mlip_corpora import load_mptrj_json

    p = tmp_path / "MPtrj_2022.9_full.json"
    p.write_text(json.dumps(_MPTRJ))
    samples = load_mptrj_json(str(p))
    assert len(samples) == 1
    s = samples[0]
    np.testing.assert_array_equal(s.x_raw[:, 0], [11.0, 17.0])
    np.testing.assert_allclose(s.pos[1], [2.0, 2.0, 2.0])
    np.testing.assert_allclose(np.asarray(s.cell), np.eye(3) * 4.0)
    assert abs(s.energy - (-7.25)) < 1e-6  # corrected_total_energy
    np.testing.assert_allclose(s.forces[0], [0.01, 0.0, -0.02], rtol=1e-6)
    per_atom = load_mptrj_json(str(p), energy_per_atom=True)
    assert abs(per_atom[0].energy - (-3.625)) < 1e-6


# ------------------------------------------------------------------- extxyz

_EXTXYZ = (
    "2\n"
    'Lattice="6.0 0.0 0.0 0.0 6.0 0.0 0.0 0.0 6.0" '
    'Properties=species:S:1:pos:R:3:forces:R:3 energy=-12.5 pbc="T T T"\n'
    "Cu 0.00000000 0.00000000 0.00000000 0.10000000 0.00000000 0.00000000\n"
    "O 1.80000000 0.00000000 0.00000000 -0.10000000 0.00000000 0.00000000\n"
)


def test_extxyz_fixture(tmp_path):
    from hydragnn_tpu.data.xyz import parse_xyz_file

    p = tmp_path / "frame.extxyz"
    p.write_text(_EXTXYZ)
    (s,) = parse_xyz_file(str(p))
    np.testing.assert_array_equal(s.x_raw[:, 0], [29.0, 8.0])
    assert abs(s.energy - (-12.5)) < 1e-6
    np.testing.assert_allclose(np.asarray(s.cell), np.eye(3) * 6.0)
    np.testing.assert_allclose(s.forces[1], [-0.1, 0.0, 0.0])


# --------------------------------------------------------------- ASE sqlite


def test_ase_sqlite_v9_fixture(tmp_path):
    """Raw-SQL transcription of the ASE db v9 ``systems`` row layout:
    little-endian int32 ``numbers``, float64 positions/cell/forces blobs,
    integer pbc bitmask, energy REAL, plus the version row."""
    from hydragnn_tpu.data.ase_db import load_ase_sqlite

    p = tmp_path / "train.aselmdb.db"
    con = sqlite3.connect(p)
    con.execute(
        "CREATE TABLE systems (id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "unique_id TEXT UNIQUE, ctime REAL, mtime REAL, username TEXT, "
        "numbers BLOB, positions BLOB, cell BLOB, pbc INTEGER, "
        "initial_magmoms BLOB, initial_charges BLOB, masses BLOB, "
        "tags BLOB, momenta BLOB, constraints TEXT, calculator TEXT, "
        "calculator_parameters TEXT, energy REAL, free_energy REAL, "
        "forces BLOB, stress BLOB, dipole BLOB, magmoms BLOB, magmom REAL, "
        "charges BLOB, key_value_pairs TEXT, data TEXT, natoms INTEGER, "
        "fmax REAL, smax REAL, volume REAL, mass REAL, charge REAL)"
    )
    con.execute("CREATE TABLE information (name TEXT, value TEXT)")
    con.execute("INSERT INTO information VALUES ('version', '9')")
    numbers = np.asarray([13, 8], "<i4").tobytes()
    positions = np.asarray(
        [[0.0, 0.0, 0.0], [1.9, 0.0, 0.0]], "<f8"
    ).tobytes()
    cell = (np.eye(3, dtype="<f8") * 5.0).tobytes()
    forces = np.asarray([[0.2, 0.0, 0.0], [-0.2, 0.0, 0.0]], "<f8").tobytes()
    con.execute(
        "INSERT INTO systems (unique_id, ctime, mtime, username, numbers, "
        "positions, cell, pbc, energy, forces, natoms, key_value_pairs, data)"
        " VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
        ("abc123", 0.0, 0.0, "u", numbers, positions, cell, 7, -9.5,
         forces, 2, "{}", "{}"),
    )
    con.commit()
    con.close()

    (s,) = load_ase_sqlite(str(p))
    np.testing.assert_array_equal(s.x_raw[:, 0], [13.0, 8.0])
    np.testing.assert_allclose(s.pos[1], [1.9, 0.0, 0.0], rtol=1e-7)
    assert abs(s.energy - (-9.5)) < 1e-9
    np.testing.assert_allclose(np.asarray(s.cell), np.eye(3) * 5.0)
    np.testing.assert_allclose(s.forces[0], [0.2, 0.0, 0.0])
