"""XYZ / extended-XYZ raw loader and atomic descriptors.

Reference parity:
  * ``hydragnn/utils/datasets/xyzdataset.py``: .xyz file directories ->
    samples (element symbol or Z, positions; extxyz comment-line key=value
    metadata incl. energy, lattice).
  * ``utils/descriptors_and_embeddings/atomicdescriptors.py``: one-hot /
    scalar atomic descriptors -- built from an embedded periodic table
    (the reference pulls mendeleev at runtime; offline here).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from hydragnn_tpu.data.sample import GraphSample

_SYMBOLS = (
    "H He Li Be B C N O F Ne Na Mg Al Si P S Cl Ar K Ca Sc Ti V Cr Mn Fe Co "
    "Ni Cu Zn Ga Ge As Se Br Kr Rb Sr Y Zr Nb Mo Tc Ru Rh Pd Ag Cd In Sn Sb "
    "Te I Xe Cs Ba La Ce Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf Ta W Re "
    "Os Ir Pt Au Hg Tl Pb Bi Po At Rn Fr Ra Ac Th Pa U Np Pu Am Cm Bk Cf Es "
    "Fm Md No Lr Rf Db Sg Bh Hs Mt Ds Rg Cn Nh Fl Mc Lv Ts Og"
).split()
SYMBOL_TO_Z = {s: i + 1 for i, s in enumerate(_SYMBOLS)}

# electronegativity (Pauling) and covalent radius (pm) for common elements;
# zeros elsewhere -- enough for descriptor featurization offline
_ELECTRONEG = {1: 2.20, 3: 0.98, 5: 2.04, 6: 2.55, 7: 3.04, 8: 3.44, 9: 3.98,
               11: 0.93, 12: 1.31, 13: 1.61, 14: 1.90, 15: 2.19, 16: 2.58,
               17: 3.16, 19: 0.82, 20: 1.00, 26: 1.83, 29: 1.90, 30: 1.65}
_COV_RADIUS = {1: 31, 3: 128, 5: 84, 6: 76, 7: 71, 8: 66, 9: 57, 11: 166,
               12: 141, 13: 121, 14: 111, 15: 107, 16: 105, 17: 102, 19: 203,
               20: 176, 26: 132, 29: 132, 30: 122}


def parse_xyz_file(path: str) -> List[GraphSample]:
    """Parse a (multi-frame, ext)xyz file into samples."""
    samples = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        if not lines[i].strip():
            i += 1
            continue
        n = int(lines[i].split()[0])
        comment = lines[i + 1] if i + 1 < len(lines) else ""
        meta = dict(re.findall(r'(\w+)=("[^"]*"|\S+)', comment))
        energy = None
        if "energy" in {k.lower() for k in meta}:
            for k, v in meta.items():
                if k.lower() == "energy":
                    energy = float(v.strip('"'))
        cell = None
        for k, v in meta.items():
            if k.lower() == "lattice":
                vals = [float(x) for x in v.strip('"').split()]
                cell = np.asarray(vals, np.float32).reshape(3, 3)
        zs, pos, forces = [], [], []
        for row in lines[i + 2 : i + 2 + n]:
            tok = row.split()
            sym = tok[0]
            z = SYMBOL_TO_Z.get(sym, None)
            if z is None:
                z = int(float(sym))
            zs.append(z)
            pos.append([float(tok[1]), float(tok[2]), float(tok[3])])
            if len(tok) >= 7:
                forces.append([float(tok[4]), float(tok[5]), float(tok[6])])
        x = np.asarray(zs, np.float32)[:, None]
        samples.append(
            GraphSample(
                x=x,
                pos=np.asarray(pos, np.float32),
                x_raw=x,
                y_raw=np.asarray([energy if energy is not None else 0.0], np.float32),
                energy=None if energy is None else np.float32(energy),
                forces=np.asarray(forces, np.float32) if forces else None,
                cell=cell,
            )
        )
        i += 2 + n
    return samples


def load_xyz_directory(path: str, limit: Optional[int] = None) -> List[GraphSample]:
    """Parse every .xyz/.extxyz under ``path``, recursively — the OC22
    shard layout globs ``**/*.extxyz`` (reference
    ``examples/open_catalyst_2022/train.py:185-196``)."""
    out: List[GraphSample] = []
    for dirpath, dirnames, filenames in sorted(os.walk(path)):
        dirnames.sort()
        for name in sorted(filenames):
            if name.endswith((".xyz", ".extxyz")):
                out.extend(parse_xyz_file(os.path.join(dirpath, name)))
                if limit is not None and len(out) >= limit:
                    return out[:limit]
    return out


def atomic_descriptors(
    zs: Sequence[int],
    one_hot_elements: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """Per-atom descriptor vectors: [Z/118, group-period-ish one-hots,
    electronegativity, covalent radius] (+ optional element one-hot),
    the capability analogue of the mendeleev-backed descriptors."""
    feats = []
    for z in zs:
        z = int(z)
        row = [
            z / 118.0,
            _ELECTRONEG.get(z, 0.0) / 4.0,
            _COV_RADIUS.get(z, 0.0) / 250.0,
        ]
        if one_hot_elements is not None:
            row.extend(1.0 if z == e else 0.0 for e in one_hot_elements)
        feats.append(row)
    return np.asarray(feats, np.float32)
