"""SMILES -> graph pipeline (reference
``utils/descriptors_and_embeddings/smiles_utils.py:35-127``).

Node features mirror the reference: ``[one_hot(type) | Z, is_aromatic,
sp, sp2, sp3, num_H]``; edge features one-hot bond order
{single, double, triple, aromatic}; hydrogens added explicitly; edges
sorted by (src*N + dst).

Uses RDKit when importable.  This environment ships no rdkit, so a
built-in minimal SMILES parser covers the organic subset (B C N O P S F
Cl Br I, aromatic lowercase, branches, ring closures incl. %nn, bond
orders - = # :, charges/isotopes in brackets ignored beyond the symbol):
enough for CSCE/zinc-class datasets.  DIVERGENCE (documented): without
rdkit, hybridization is a valence heuristic (triple/allene -> sp,
double/aromatic -> sp2, else sp3) and implicit hydrogen counts come from
standard valences, not rdkit's sanitizer.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hydragnn_tpu.data.sample import GraphSample
from hydragnn_tpu.data.xyz import SYMBOL_TO_Z

_VALENCE = {"B": 3, "C": 4, "N": 3, "O": 2, "P": 3, "S": 2,
            "F": 1, "Cl": 1, "Br": 1, "I": 1, "H": 1}
_BOND_ORDER = {"-": 1, "=": 2, "#": 3, ":": 1.5}
_ORGANIC = ["Cl", "Br", "B", "C", "N", "O", "P", "S", "F", "I"]


def _try_rdkit():
    try:
        from rdkit import Chem  # noqa: F401

        return Chem
    except ImportError:
        return None


class _Atom:
    __slots__ = ("symbol", "aromatic", "charge", "h_explicit", "bonds")

    def __init__(self, symbol, aromatic, charge=0, h_explicit=None):
        self.symbol = symbol
        self.aromatic = aromatic
        self.charge = charge
        self.h_explicit = h_explicit
        self.bonds: List[Tuple[int, float]] = []  # (neighbor, order)


def _parse_smiles(s: str) -> List[_Atom]:
    """Minimal SMILES parser -> atom list with bonds."""
    atoms: List[_Atom] = []
    prev: List[Optional[int]] = [None]  # branch stack
    pending_order: Optional[float] = None
    rings: Dict[str, Tuple[int, Optional[float]]] = {}
    i = 0
    n = len(s)

    def add_bond(a, b, order):
        if order is None:
            order = 1.5 if (atoms[a].aromatic and atoms[b].aromatic) else 1.0
        atoms[a].bonds.append((b, order))
        atoms[b].bonds.append((a, order))

    def new_atom(atom: _Atom):
        atoms.append(atom)
        idx = len(atoms) - 1
        nonlocal pending_order
        if prev[-1] is not None:
            add_bond(prev[-1], idx, pending_order)
        pending_order = None
        prev[-1] = idx

    while i < n:
        c = s[i]
        if c == "(":
            prev.append(prev[-1])
            i += 1
        elif c == ")":
            prev.pop()
            i += 1
        elif c in _BOND_ORDER:
            pending_order = _BOND_ORDER[c]
            i += 1
        elif c == "/" or c == "\\" or c == ".":
            i += 1  # stereo/no-bond markers ignored
        elif c == "[":
            j = s.index("]", i)
            body = s[i + 1 : j]
            m = re.match(
                r"(\d*)([A-Za-z][a-z]?)(@{0,2})(H\d*)?([+-]\d*|[+-]*)?", body
            )
            sym = m.group(2)
            aromatic = sym.islower()
            sym_t = sym.capitalize() if aromatic else sym
            hs = m.group(4)
            nh = 0 if hs is None else (int(hs[1:]) if len(hs) > 1 else 1)
            chg_s = m.group(5) or ""
            chg = 0
            if chg_s:
                if chg_s[-1].isdigit():
                    chg = int(chg_s[1:]) * (1 if chg_s[0] == "+" else -1)
                else:
                    chg = chg_s.count("+") - chg_s.count("-")
            new_atom(_Atom(sym_t, aromatic, chg, nh))
            i = j + 1
        elif c == "%":
            key = s[i : i + 3]
            if key in rings:
                a, order = rings.pop(key)
                add_bond(a, prev[-1], order or pending_order)
            else:
                rings[key] = (prev[-1], pending_order)
            pending_order = None
            i += 3
        elif c.isdigit():
            key = c
            if key in rings:
                a, order = rings.pop(key)
                add_bond(a, prev[-1], order or pending_order)
            else:
                rings[key] = (prev[-1], pending_order)
            pending_order = None
            i += 1
        else:
            sym = None
            for cand in _ORGANIC:
                if s.startswith(cand, i):
                    sym = cand
                    break
            if sym is None and c.lower() in "bcnops":
                sym = c
            if sym is None:
                raise ValueError(f"Cannot parse SMILES at {s[i:]!r}")
            aromatic = sym.islower()
            new_atom(_Atom(sym.capitalize() if aromatic else sym, aromatic))
            i += len(sym)
    if rings:
        raise ValueError(f"Unclosed ring bonds in {s!r}")
    return atoms


def _implicit_h(atom: _Atom) -> int:
    if atom.h_explicit is not None:
        return atom.h_explicit
    val = _VALENCE.get(atom.symbol, 0)
    if atom.aromatic:
        # aromatic atom: sigma bonds + one shared pi electron
        used = len(atom.bonds) + 1
    else:
        used = sum(int(round(o)) for _, o in atom.bonds)
    return max(0, int(val + atom.charge - used))


def _hybridization(atom: _Atom) -> Tuple[int, int, int]:
    orders = [o for _, o in atom.bonds]
    if 3 in orders or orders.count(2) >= 2:
        return 1, 0, 0  # sp
    if 2 in orders or atom.aromatic:
        return 0, 1, 0  # sp2
    if atom.symbol in ("C", "N", "O", "P", "S", "B"):
        return 0, 0, 1  # sp3
    return 0, 0, 0


def smiles_to_graph(
    smiles: str,
    ytarget: Optional[np.ndarray] = None,
    types: Optional[Dict[str, int]] = None,
) -> GraphSample:
    """SMILES string -> GraphSample with reference feature layout
    (``generate_graphdata_from_smilestr``, smiles_utils.py:36-47)."""
    chem = _try_rdkit()
    if chem is not None:
        return _smiles_to_graph_rdkit(chem, smiles, ytarget, types)
    return _smiles_to_graph_builtin(smiles, ytarget, types)


def _assemble(symbols, aromatic, sp_flags, num_h, edges, edge_orders,
              ytarget, types):
    n = len(symbols)
    if types is None:
        uniq = sorted(set(symbols) | {"H"})
        types = {t: i for i, t in enumerate(uniq)}
    type_oh = np.zeros((n, len(types)), np.float32)
    for i, sym in enumerate(symbols):
        type_oh[i, types[sym]] = 1.0
    z = np.asarray([SYMBOL_TO_Z[s] for s in symbols], np.float32)
    x2 = np.stack(
        [z, np.asarray(aromatic, np.float32)]
        + [np.asarray(f, np.float32) for f in zip(*sp_flags)]
        + [np.asarray(num_h, np.float32)],
        axis=1,
    )
    x = np.concatenate([type_oh, x2], axis=1)

    bond_class = {1.0: 0, 2.0: 1, 3.0: 2, 1.5: 3}
    row, col, etype = [], [], []
    for (a, b), o in zip(edges, edge_orders):
        row += [a, b]
        col += [b, a]
        etype += 2 * [bond_class[float(o)]]
    if row:
        ei = np.asarray([row, col], np.int64)
        ea = np.eye(4, dtype=np.float32)[np.asarray(etype)]
        perm = np.argsort(ei[0] * n + ei[1], kind="stable")
        ei = ei[:, perm]
        ea = ea[perm]
    else:
        ei = np.zeros((2, 0), np.int64)
        ea = np.zeros((0, 4), np.float32)
    return GraphSample(
        x=x,
        pos=np.zeros((n, 3), np.float32),
        edge_index=ei,
        edge_attr=ea,
        x_raw=x,
        y_raw=None if ytarget is None else np.asarray(ytarget, np.float32),
        y_graph=None if ytarget is None else np.asarray(ytarget, np.float32).reshape(-1),
    )


def _smiles_to_graph_builtin(smiles, ytarget, types):
    atoms = _parse_smiles(smiles)
    # explicit hydrogens (reference Chem.AddHs)
    symbols = [a.symbol for a in atoms]
    arom = [1 if a.aromatic else 0 for a in atoms]
    sp_flags = [_hybridization(a) for a in atoms]
    edges, orders = [], []
    for i, a in enumerate(atoms):
        for j, o in a.bonds:
            if j > i:
                edges.append((i, j))
                orders.append(o)
    nh = [_implicit_h(a) for a in atoms]
    base_n = len(atoms)
    h_count = 0
    num_h_feature = list(nh)
    for i, k in enumerate(nh):
        for _ in range(k):
            symbols.append("H")
            arom.append(0)
            sp_flags.append((0, 0, 0))
            num_h_feature.append(0)
            edges.append((i, base_n + h_count))
            orders.append(1.0)
            h_count += 1
    return _assemble(
        symbols, arom, sp_flags, num_h_feature, edges, orders, ytarget, types
    )


def _smiles_to_graph_rdkit(chem, smiles, ytarget, types):
    from rdkit.Chem.rdchem import BondType as BT
    from rdkit.Chem.rdchem import HybridizationType

    ps = chem.SmilesParserParams()
    ps.removeHs = False
    mol = chem.AddHs(chem.MolFromSmiles(smiles, ps))
    symbols = [a.GetSymbol() for a in mol.GetAtoms()]
    arom = [1 if a.GetIsAromatic() else 0 for a in mol.GetAtoms()]
    sp_flags = [
        (
            1 if a.GetHybridization() == HybridizationType.SP else 0,
            1 if a.GetHybridization() == HybridizationType.SP2 else 0,
            1 if a.GetHybridization() == HybridizationType.SP3 else 0,
        )
        for a in mol.GetAtoms()
    ]
    bond_o = {BT.SINGLE: 1.0, BT.DOUBLE: 2.0, BT.TRIPLE: 3.0, BT.AROMATIC: 1.5}
    edges, orders = [], []
    for b in mol.GetBonds():
        edges.append((b.GetBeginAtomIdx(), b.GetEndAtomIdx()))
        orders.append(bond_o[b.GetBondType()])
    # num_h feature = count of H neighbors per atom
    nh = [0] * mol.GetNumAtoms()
    for (a, b), _ in zip(edges, orders):
        if symbols[b] == "H":
            nh[a] += 1
        if symbols[a] == "H":
            nh[b] += 1
    return _assemble(symbols, arom, sp_flags, nh, edges, orders, ytarget, types)


# --------------------------------------------------------------- CSV corpus

CSCE_TYPES = {"C": 0, "F": 1, "H": 2, "N": 3, "O": 4, "S": 5}


def load_smiles_csv(
    path: str,
    types: Optional[Dict[str, int]] = None,
    smiles_col: int = 1,
    target_col: int = 2,
    limit: Optional[int] = None,
    header: bool = True,
) -> List[GraphSample]:
    """CSV of (id, smiles, value) rows -> graphs (the reference CSCE driver's
    read loop, ``examples/csce/train_gap.py:57-67``).  Rows whose SMILES the
    parser rejects are skipped with a count, like the reference's try/except.
    """
    import csv

    out: List[GraphSample] = []
    skipped = 0
    with open(path, newline="") as f:
        rows = csv.reader(f)
        if header:
            next(rows, None)
        for row in rows:
            if limit is not None and len(out) >= limit:
                break
            try:
                s = smiles_to_graph(
                    row[smiles_col].strip(),
                    ytarget=np.asarray([float(row[target_col])], np.float32),
                    types=types or CSCE_TYPES,
                )
            except (ValueError, KeyError, IndexError):
                skipped += 1
                continue
            out.append(s)
    if skipped:
        print(f"[smiles_csv] skipped {skipped} unparseable rows")
    return out


def synthesize_smiles_csv(path: str, n: int, seed: int = 0) -> None:
    """Zero-egress surrogate corpus in the CSCE csv schema (id,smiles,value):
    random valence-valid organic molecules assembled from chain/branch/ring
    fragments, with a deterministic structural target (a fixed linear
    function of atom/bond counts) so training has real signal."""
    import csv
    import os

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    frag_atoms = ["C", "C", "C", "N", "O"]
    terminals = ["F", "O", "N", "C"]

    def gen():
        parts = ["C"]
        length = int(rng.integers(2, 9))
        prev_double = False
        for _ in range(length):
            a = frag_atoms[int(rng.integers(len(frag_atoms)))]
            bond = ""
            if not prev_double and a == "C" and rng.random() < 0.15:
                bond = "="
                prev_double = True
            else:
                prev_double = False
            if a == "C" and rng.random() < 0.25:
                b = terminals[int(rng.integers(len(terminals)))]
                parts.append(f"{bond}C({b})")
            else:
                parts.append(bond + a)
        if rng.random() < 0.3:
            return "C1CCCCC1" + "".join(parts[1:])
        return "".join(parts)

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "smiles", "gap"])
        made = 0
        while made < n:
            s = gen()
            try:
                g = smiles_to_graph(s, types=CSCE_TYPES)
            except (ValueError, KeyError):
                continue
            # deterministic structural 'gap': linear in composition/bonds
            z = g.x[:, len(CSCE_TYPES)]
            n_heavy = float((z > 1).sum())
            n_o = float((z == 8).sum())
            n_n = float((z == 7).sum())
            n_edge = g.edge_index.shape[1] / 2.0
            y = 2.0 + 0.05 * n_heavy + 0.35 * n_o + 0.2 * n_n - 0.02 * n_edge
            w.writerow([made, s, round(y, 6)])
            made += 1


# ------------------------------------------------------------- xyz -> mol

_Z_TO_SYMBOL = {v: k for k, v in SYMBOL_TO_Z.items()}
_RCOV_BY_Z = {1: 0.31, 5: 0.84, 6: 0.76, 7: 0.71, 8: 0.66, 9: 0.57,
              15: 1.07, 16: 1.05, 17: 1.02, 35: 1.2, 53: 1.39}


def mol_from_xyz(
    z: np.ndarray,
    pos: np.ndarray,
    ytarget: Optional[np.ndarray] = None,
    types: Optional[Dict[str, int]] = None,
    bond_scale: float = 1.25,
) -> GraphSample:
    """Geometry -> molecular graph with perceived bond orders (the
    capability of the reference's adapted xyz2mol,
    ``descriptors_and_embeddings/xyz2mol.py``; this is a compact
    re-derivation, not the 1k-LoC original):

      * bonds where d_ij < bond_scale * (rcov_i + rcov_j);
      * bond orders raised greedily on the shortest bonds until each
        atom's standard valence is satisfied (rdkit-free Lewis heuristic;
        kekulized orders — no aromatic perception);
      * node/edge features in the same layout as :func:`smiles_to_graph`.
    """
    z = np.asarray(z).astype(int).reshape(-1)
    pos = np.asarray(pos, np.float64).reshape(len(z), 3)
    symbols = [_Z_TO_SYMBOL.get(int(s), "C") for s in z]
    rc = np.asarray([_RCOV_BY_Z.get(int(s), 0.75) for s in z])
    n = len(z)

    d = np.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    iu = np.triu_indices(n, 1)
    cut = bond_scale * (rc[:, None] + rc[None, :])
    bonded = (d < cut)[iu]
    pairs = [(int(a), int(b)) for a, b, m in zip(iu[0], iu[1], bonded) if m]
    orders = {p: 1.0 for p in pairs}

    # greedy order raising: shortest bonds between unsaturated heavy atoms
    def deficit(i):
        val = _VALENCE.get(symbols[i], 0)
        used = sum(o for p, o in orders.items() if i in p)
        return val - used

    cand = sorted(
        (p for p in pairs if symbols[p[0]] != "H" and symbols[p[1]] != "H"),
        key=lambda p: d[p[0], p[1]],
    )
    for _ in range(2):  # up to triple bonds
        for p in cand:
            if orders[p] < 3 and deficit(p[0]) > 0 and deficit(p[1]) > 0:
                orders[p] += 1.0

    num_h = [
        sum(1 for p in pairs if i in p and symbols[p[0] if p[1] == i else p[1]] == "H")
        for i in range(n)
    ]

    class _A:  # minimal shim for the shared hybridization heuristic
        def __init__(self, sym, bonds):
            self.symbol = sym
            self.bonds = bonds
            self.aromatic = False

    sp_flags = [
        _hybridization(
            _A(symbols[i], [(None, o) for p, o in orders.items() if i in p])
        )
        for i in range(n)
    ]
    return _assemble(
        symbols,
        [0] * n,
        sp_flags,
        num_h,
        list(orders.keys()),
        [min(o, 3.0) for o in orders.values()],
        ytarget,
        types,
    )
