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
    """Minimal extended-CFG reader: number of particles, H0 cell matrix,
    per-atom (mass, type, sx, sy, sz, extra...) rows with scaled coords."""
    with open(filepath, encoding="utf-8") as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    n = None
    cell = np.eye(3, dtype=np.float64)
    rows = []
    i = 0
    while i < len(lines):
        ln = lines[i]
        if ln.lower().startswith("number of particles"):
            n = int(ln.split("=")[1])
        elif ln.lower().startswith("h0("):
            # H0(i,j) = value
            lhs, val = ln.split("=")
            idx = lhs[lhs.index("(") + 1 : lhs.index(")")].split(",")
            cell[int(idx[0]) - 1, int(idx[1]) - 1] = float(val.split()[0])
        elif ln[0].isdigit() or ln[0] == "-":
            parts = ln.split()
            if len(parts) >= 5:
                rows.append([float(p) for p in parts[:5]])
        i += 1
    rows = np.asarray(rows, np.float64)
    if n is not None:
        rows = rows[:n]
    frac = rows[:, 2:5]
    pos = (frac @ cell).astype(np.float32)
    x_raw = rows[:, :2].astype(np.float32)  # (mass, type)
    return GraphSample(
        x=x_raw, pos=pos, x_raw=x_raw, y_raw=np.zeros((1,), np.float32),
        cell=cell.astype(np.float32),
    )
