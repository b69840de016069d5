"""Minimal ASE SQLite database reader/writer (no ase dependency).

The reference's nabla2DFT driver reads ASE ``.db`` files via
``ase.db.connect`` (``examples/nabla2_dft/train.py:13-140``), and the
open-science corpora (OMat24 / OMol25 / OC25 / ODAC23 / OPoly26) are
shipped as fairchem ``AseDBDataset`` stores whose sqlite flavor is this
same schema (``examples/open_materials_2024/train.py:49``). This module
implements the ASE sqlite v9 ``systems`` table directly with stdlib
``sqlite3``: columns ``numbers`` (int32 blob), ``positions``/``cell``/
``forces`` (float64 blobs, little-endian, C-order), ``pbc`` (bit-packed
int: x + 2y + 4z), ``energy`` (REAL), ``key_value_pairs``/``data``
(JSON text) — so real ASE-written databases load here and databases
written here open in ASE.
"""

from __future__ import annotations

import json
import os
import sqlite3
import time
import uuid
from typing import Dict, Iterable, List, Optional

import numpy as np

from hydragnn_tpu.data.sample import GraphSample

_INIT = [
    """CREATE TABLE systems (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    unique_id TEXT UNIQUE,
    ctime REAL,
    mtime REAL,
    username TEXT,
    numbers BLOB,
    positions BLOB,
    cell BLOB,
    pbc INTEGER,
    initial_magmoms BLOB,
    initial_charges BLOB,
    masses BLOB,
    tags BLOB,
    momenta BLOB,
    constraints TEXT,
    calculator TEXT,
    calculator_parameters TEXT,
    energy REAL,
    free_energy REAL,
    forces BLOB,
    stress BLOB,
    dipole BLOB,
    magmoms BLOB,
    magmom REAL,
    charges BLOB,
    key_value_pairs TEXT,
    data TEXT,
    natoms INTEGER,
    fmax REAL,
    smax REAL,
    volume REAL,
    mass REAL,
    charge REAL)""",
    "CREATE TABLE species (Z INTEGER, n INTEGER, id INTEGER)",
    "CREATE TABLE keys (key TEXT, id INTEGER)",
    "CREATE TABLE text_key_values (key TEXT, value TEXT, id INTEGER)",
    "CREATE TABLE number_key_values (key TEXT, value REAL, id INTEGER)",
    "CREATE TABLE information (name TEXT, value TEXT)",
    "INSERT INTO information VALUES ('version', '9')",
]


def _blob(arr: Optional[np.ndarray]):
    if arr is None:
        return None
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.int64:
        arr = arr.astype(np.int32)
    if not np.little_endian:  # ASE stores little-endian
        arr = arr.byteswap()
    return arr.tobytes()


def _deblob(buf, dtype=np.float64, shape=None):
    if buf is None:
        return None
    arr = np.frombuffer(buf, dtype)
    if not np.little_endian:
        arr = arr.byteswap()
    if shape is not None:
        arr = arr.reshape(shape)
    return arr.copy()


def write_ase_sqlite(path: str, frames: Iterable[Dict]) -> None:
    """Write frames (dicts with z, pos, cell, pbc, energy, forces,
    key_value_pairs) as an ASE sqlite database."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    for stmt in _INIT:
        con.execute(stmt)
    now = time.time() / (86400 * 365.25)  # ASE stores ctime in years
    for fr in frames:
        z = np.asarray(fr["z"], np.int32)
        pos = np.asarray(fr["pos"], np.float64)
        cell = np.asarray(fr.get("cell", np.zeros((3, 3))), np.float64)
        pbc_bits = int(np.dot(np.asarray(fr.get("pbc", (0, 0, 0)), int), [1, 2, 4]))
        forces = fr.get("forces")
        cur = con.execute(
            "INSERT INTO systems (unique_id, ctime, mtime, username, numbers,"
            " positions, cell, pbc, energy, forces, key_value_pairs, data,"
            " natoms) VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)",
            (
                uuid.uuid4().hex,
                now,
                now,
                "hydragnn_tpu",
                _blob(z),
                _blob(pos),
                _blob(cell),
                pbc_bits,
                None if fr.get("energy") is None else float(fr["energy"]),
                None if forces is None else _blob(np.asarray(forces, np.float64)),
                json.dumps(fr.get("key_value_pairs", {})),
                json.dumps(fr.get("data", {})),
                int(len(z)),
            ),
        )
        rid = cur.lastrowid
        zs, counts = np.unique(z, return_counts=True)
        con.executemany(
            "INSERT INTO species VALUES (?, ?, ?)",
            [(int(a), int(b), rid) for a, b in zip(zs, counts)],
        )
    con.commit()
    con.close()


def load_ase_sqlite(
    path: str,
    limit: Optional[int] = None,
    energy_per_atom: bool = False,
) -> List[GraphSample]:
    """Read an ASE sqlite database into GraphSamples (numbers, positions,
    cell, pbc, energy, forces)."""
    con = sqlite3.connect(path)
    q = (
        "SELECT numbers, positions, cell, pbc, energy, forces, natoms"
        " FROM systems ORDER BY id"
    )
    if limit is not None:
        q += f" LIMIT {int(limit)}"
    samples: List[GraphSample] = []
    for numbers, positions, cell, pbc, energy, forces, natoms in con.execute(q):
        z = _deblob(numbers, np.int32)
        n = int(natoms if natoms is not None else len(z))
        pos = _deblob(positions, np.float64, (n, 3))
        cell_m = _deblob(cell, np.float64)
        cell_m = None if cell_m is None else cell_m.reshape(3, 3)
        frc = _deblob(forces, np.float64, (n, 3)) if forces is not None else None
        x = z.astype(np.float32)[:, None]
        e = None if energy is None else float(energy)
        if e is not None and energy_per_atom:
            e = e / n
        has_cell = cell_m is not None and np.abs(cell_m).sum() > 0 and pbc
        samples.append(
            GraphSample(
                x=x,
                pos=pos.astype(np.float32),
                x_raw=x,
                y_raw=np.asarray([0.0 if e is None else e], np.float32),
                energy=e,
                forces=None if frc is None else frc.astype(np.float32),
                cell=cell_m.astype(np.float32) if has_cell else None,
            )
        )
    con.close()
    return samples
