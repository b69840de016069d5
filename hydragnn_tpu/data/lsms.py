"""Raw-file loaders: LSMS text format (incl. the 'unit_test' fixture
format) and CFG format.

Re-derivation of reference parsers:
  * LSMS (``hydragnn/utils/datasets/lsmsdataset.py:14-81``): line 0 =
    graph features; node lines = [feature, id, x, y, z, out...]; configured
    columns selected via (dim, column_index); charge-density update
    subtracts col0 from col1 of the selected features.
  * CFG (``hydragnn/utils/datasets/cfgdataset.py``): extended-CFG crystal
    files (minimal subset: cell + per-atom rows).

Followed by the shared raw pipeline (``abstractrawdataset.py:142-405``):
optional num-node scaling, min/max normalization, edge building.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def parse_lsms_file(
    filepath: str,
    node_feature_dims: Sequence[int],
    node_feature_cols: Sequence[int],
    graph_feature_dims: Sequence[int],
    graph_feature_cols: Sequence[int],
    charge_density_update: bool = True,
) -> GraphSample:
    with open(filepath, encoding="utf-8") as f:
        lines = f.readlines()
    graph_feat = lines[0].split(None, 2)
    g = []
    for item in range(len(graph_feature_dims)):
        for icomp in range(graph_feature_dims[item]):
            g.append(float(graph_feat[graph_feature_cols[item] + icomp].strip()))
    y_raw = np.asarray(g, np.float32)

    pos_rows, feat_rows = [], []
    for line in lines[1:]:
        tok = line.split(None, 11)
        if len(tok) < 5:
            continue
        pos_rows.append([float(tok[2]), float(tok[3]), float(tok[4])])
        feats = []
        for item in range(len(node_feature_dims)):
            for icomp in range(node_feature_dims[item]):
                feats.append(float(tok[node_feature_cols[item] + icomp].strip()))
        feat_rows.append(feats)
    x_raw = np.asarray(feat_rows, np.float32)
    pos = np.asarray(pos_rows, np.float32)
    if charge_density_update and x_raw.shape[1] >= 2:
        # LSMS charge density: col1 -= col0 (lsmsdataset.py:66-81)
        x_raw[:, 1] = x_raw[:, 1] - x_raw[:, 0]
    return GraphSample(x=x_raw, pos=pos, x_raw=x_raw, y_raw=y_raw)


def load_lsms_directory(
    path: str,
    dataset_config: Dict,
) -> List[GraphSample]:
    nf = dataset_config["node_features"]
    gf = dataset_config["graph_features"]
    samples = []
    for name in sorted(os.listdir(path)):
        fp = os.path.join(path, name)
        if not os.path.isfile(fp) or name == ".DS_Store":
            continue
        samples.append(
            parse_lsms_file(
                fp, nf["dim"], nf["column_index"], gf["dim"], gf["column_index"]
            )
        )
    return samples


def parse_cfg_file(filepath: str) -> GraphSample:
    """Extended-CFG reader (reference ``cfg_raw_dataset_loader.py:65-105``
    via ase.io.read_cfg): number of particles, H0 cell matrix, per-atom
    rows.  Node features follow the reference order [Z, mass, aux...] where
    aux are the file's auxiliary properties (c_peratom, fx, fy, fz in the
    NiNb EAM corpus).  A sibling ``<name>.bulk`` file supplies graph
    features (first line, whitespace-separated), exactly like the
    reference's bulk-modulus convention."""
    from hydragnn_tpu.data.xyz import SYMBOL_TO_Z

    with open(filepath, encoding="utf-8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n = None
    cell = np.eye(3, dtype=np.float64)
    rows: List[List[float]] = []
    zs: List[float] = []
    masses: List[float] = []
    pend_mass = None
    pend_z = 0.0
    i = 0
    while i < len(lines):
        ln = lines[i]
        low = ln.lower()
        if low.startswith("number of particles"):
            n = int(ln.split("=")[1])
        elif low.startswith("h0("):
            lhs, val = ln.split("=")
            idx = lhs[lhs.index("(") + 1 : lhs.index(")")].split(",")
            cell[int(idx[0]) - 1, int(idx[1]) - 1] = float(val.split()[0])
        elif low.startswith(".no_velocity") or low.startswith("entry_count") or low.startswith("auxiliary"):
            pass
        elif ln[0].isdigit() or ln[0] == "-" or ln[0] == ".":
            parts = ln.split()
            if len(parts) == 1 and pend_mass is None:
                # extended-CFG species block: mass line, then symbol line
                pend_mass = float(parts[0])
            elif len(parts) >= 3:
                rows.append([float(p) for p in parts])
                zs.append(pend_z)
                masses.append(pend_mass if pend_mass is not None else 0.0)
        else:
            # species symbol line of an extended-CFG block
            sym = ln.split()[0]
            if sym in SYMBOL_TO_Z:
                pend_z = float(SYMBOL_TO_Z[sym])
        i += 1
    if n is not None:
        rows = rows[:n]
        zs = zs[:n]
        masses = masses[:n]
    arr = np.asarray(rows, np.float64)
    frac = arr[:, 0:3]
    aux = arr[:, 3:]
    pos = (frac @ cell).astype(np.float32)
    x_raw = np.concatenate(
        [
            np.asarray(zs, np.float32)[:, None],
            np.asarray(masses, np.float32)[:, None],
            aux.astype(np.float32),
        ],
        axis=1,
    )
    y_raw = np.zeros((1,), np.float32)
    bulk = os.path.splitext(filepath)[0] + ".bulk"
    if os.path.exists(bulk):
        with open(bulk, encoding="utf-8") as f:
            y_raw = np.asarray(
                [float(t) for t in f.readline().split()], np.float32
            )
    return GraphSample(
        x=x_raw, pos=pos, x_raw=x_raw, y_raw=y_raw,
        cell=cell.astype(np.float32),
    )


def load_cfg_directory(path: str) -> List[GraphSample]:
    """All ``*.cfg`` files in a directory (reference CFGDataset)."""
    samples = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".cfg"):
            samples.append(parse_cfg_file(os.path.join(path, name)))
    return samples


def synthesize_cfg_directory(
    path: str, n_files: int, seed: int = 0, cells_per_dim: int = 3
) -> None:
    """Zero-egress surrogate NiNb corpus in extended-CFG + .bulk schema:
    random Ni/Nb occupancy on a perturbed FCC-ish lattice; bulk value =
    deterministic function of composition + strain (Vegard-like mixing),
    so training has real signal."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = np.stack(
        np.meshgrid(*([np.arange(cells_per_dim)] * 3), indexing="ij"), -1
    ).reshape(-1, 3).astype(np.float64)
    n = len(base)
    species = [("Ni", 58.6934, 28), ("Nb", 92.9064, 41)]
    for fi in range(n_files):
        a = 3.52 * (1 + rng.normal(0, 0.01))
        cell = np.eye(3) * (cells_per_dim * a)
        frac = (base + rng.normal(0, 0.02, base.shape)) / cells_per_dim
        occ = rng.random(n) < rng.uniform(0.2, 0.8)
        x_nb = float(occ.mean())
        strain = (a - 3.52) / 3.52
        bulk = 180.0 + 60.0 * x_nb - 8000.0 * strain**2  # GPa-ish
        with open(os.path.join(path, f"cfg_{fi:05d}.cfg"), "w") as f:
            f.write(f"Number of particles = {n}\n")
            f.write("A = 1.0 Angstrom (basic length-scale)\n")
            for i in range(3):
                for j in range(3):
                    f.write(f"H0({i+1},{j+1}) = {cell[i,j]:.6f} A\n")
            f.write(".NO_VELOCITY.\n")
            f.write("entry_count = 7\n")
            f.write("auxiliary[0] = c_peratom [reduced unit]\n")
            f.write("auxiliary[1] = fx [reduced unit]\n")
            f.write("auxiliary[2] = fy [reduced unit]\n")
            f.write("auxiliary[3] = fz [reduced unit]\n")
            for sp in (0, 1):
                sym, mass, _ = species[sp]
                sel = np.where(occ == bool(sp))[0]
                if len(sel) == 0:
                    continue
                f.write(f"{mass:.4f}\n{sym}\n")
                for i in sel:
                    c = rng.normal(0, 0.1)
                    fx, fy, fz = rng.normal(0, 0.05, 3)
                    f.write(
                        f"{frac[i,0]:.6f} {frac[i,1]:.6f} {frac[i,2]:.6f} "
                        f"{c:.6f} {fx:.6f} {fy:.6f} {fz:.6f}\n"
                    )
        with open(os.path.join(path, f"cfg_{fi:05d}.bulk"), "w") as f:
            f.write(f"{bulk:.6f}\n")
