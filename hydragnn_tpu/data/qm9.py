"""QM9 dataset adapter.

Parses the canonical QM9 raw distribution (Ramakrishnan et al., the
``dsgdb9nsd_xxxxxx.xyz`` files) into :class:`GraphSample`s with the same
target layout the reference's canonical driver consumes
(``/root/reference/examples/qm9/qm9.py:26-41``: PyG ``torch_geometric.
datasets.QM9`` targets, of which index 10 is the free energy ``G``).

Raw file format (one molecule per file)::

    na
    gdb <idx>  A B C mu alpha homo lumo gap r2 zpve U0 U H G Cv
    <symbol> <x> <y> <z> <mulliken charge>     x na
    <harmonic frequencies>
    <SMILES (GDB17 + relaxed)>
    <InChI (Corina + relaxed)>

Numbers may use the distribution's ``*^`` exponent quirk (``1.23*^-5``).

Targets are packed in PyG's QM9 column order (``y_raw[0:12]``)::

    [mu, alpha, homo, lumo, gap, r2, zpve, U0, U, H, G, Cv]

so reference configs addressing ``output_index: [10]`` (free energy) work
unmodified.

This environment has no network egress, so :func:`synthesize_qm9_directory`
can emit a deterministic, physically-plausible surrogate corpus in the
EXACT on-disk format — the parser, pipeline, and training path are
identical to a real-download run; only the chemistry is synthetic.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional

import numpy as np

from hydragnn_tpu.data.sample import GraphSample
from hydragnn_tpu.data.xyz import SYMBOL_TO_Z

_Z_TO_SYMBOL = {z: s for s, z in SYMBOL_TO_Z.items()}

#: PyG QM9 target order for y_raw columns (reference qm9.py:33 uses col 10)
QM9_TARGETS = (
    "mu", "alpha", "homo", "lumo", "gap", "r2",
    "zpve", "U0", "U", "H", "G", "Cv",
)


def _f(tok: str) -> float:
    """Parse a QM9 number, including the ``*^`` exponent quirk."""
    return float(tok.replace("*^", "e"))


def parse_gdb9_xyz(path: str) -> GraphSample:
    """One ``dsgdb9nsd_xxxxxx.xyz`` file -> GraphSample.

    ``x_raw`` columns: [Z, mulliken_charge]; ``y_raw``: the 12 PyG-ordered
    targets (properties 4..15 of the comment line, i.e. excluding the
    rotational constants A/B/C, matching PyG's target matrix)."""
    with open(path) as f:
        lines = f.readlines()
    n = int(lines[0].split()[0])
    props = lines[1].split()
    # props = ['gdb', idx, A, B, C, mu, alpha, homo, lumo, gap, r2,
    #          zpve, U0, U, H, G, Cv]
    y = np.asarray([_f(t) for t in props[5:17]], np.float32)
    zs, pos, q = [], [], []
    for row in lines[2 : 2 + n]:
        tok = row.split()
        zs.append(SYMBOL_TO_Z[tok[0]])
        pos.append([_f(tok[1]), _f(tok[2]), _f(tok[3])])
        q.append(_f(tok[4]) if len(tok) > 4 else 0.0)
    x_raw = np.stack(
        [np.asarray(zs, np.float32), np.asarray(q, np.float32)], axis=1
    )
    return GraphSample(
        x=x_raw[:, :1],
        pos=np.asarray(pos, np.float32),
        x_raw=x_raw,
        y_raw=y,
    )


def load_qm9_directory(
    root: str, limit: Optional[int] = None
) -> List[GraphSample]:
    """Load ``dsgdb9nsd_*.xyz`` files (sorted by index) from ``root``."""
    names = sorted(
        f for f in os.listdir(root) if re.match(r".*\.xyz$", f)
    )
    if limit is not None:
        names = names[:limit]
    return [parse_gdb9_xyz(os.path.join(root, f)) for f in names]


# ---------------------------------------------------------------------------
# offline surrogate corpus (zero-egress environments)
# ---------------------------------------------------------------------------

_BOND = {1: 0.74, 6: 1.54, 7: 1.45, 8: 1.43, 9: 1.38}  # homonuclear-ish, Å


def _surrogate_properties(z: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Deterministic geometry-derived targets (NOT DFT): smooth functions
    of the molecular geometry so a GNN can actually learn them, with
    magnitudes in the ballpark of the real columns."""
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    iu = np.triu_indices(len(z), 1)
    dij = d[iu]
    zi, zj = z[iu[0]], z[iu[1]]
    # pairwise Morse-like cohesive term
    r0 = 0.5 * (np.vectorize(lambda a: _BOND.get(int(a), 1.5))(zi)
                + np.vectorize(lambda a: _BOND.get(int(a), 1.5))(zj))
    e_pair = np.exp(-2.0 * (dij - r0)) - 2.0 * np.exp(-(dij - r0))
    cohesive = float(np.sum(e_pair))
    com = pos.mean(0)
    r2 = float(np.sum(np.sum((pos - com) ** 2, -1)))
    charges = z - z.mean()
    mu = float(np.linalg.norm((charges[:, None] * (pos - com)).sum(0)))
    alpha = float(np.sum(z) * 0.8 + 0.05 * r2)
    homo = -0.25 - 0.01 * cohesive
    lumo = 0.05 + 0.005 * mu
    gap = lumo - homo
    zpve = 0.001 * len(z)
    u0 = -40.0 * float(np.sum(z != 1)) - 0.6 * float(np.sum(z == 1)) + cohesive
    u = u0 + 0.01
    h = u + 0.001
    g = h - 0.02 * len(z)
    cv = 3.0 + 0.5 * len(z)
    return np.asarray(
        [mu, alpha, homo, lumo, gap, r2, zpve, u0, u, h, g, cv], np.float32
    )


def synthesize_qm9_directory(root: str, n: int, seed: int = 0) -> None:
    """Write ``n`` molecules in the exact dsgdb9nsd on-disk format.

    Geometries: 3-9 heavy atoms (C/N/O/F) placed by a random-walk with
    bond-length steps + attached hydrogens; properties from
    :func:`_surrogate_properties`. Every 7th file uses the ``*^`` exponent
    notation to keep the parser honest."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    heavy_pool = [6, 6, 6, 7, 8, 9]  # C-rich like GDB9
    for i in range(n):
        n_heavy = int(rng.integers(3, 10))
        zs: List[int] = []
        pos: List[np.ndarray] = []
        p = np.zeros(3)
        for k in range(n_heavy):
            zh = int(rng.choice(heavy_pool))
            if k > 0:
                step = rng.normal(size=3)
                step = step / np.linalg.norm(step) * (1.45 + 0.1 * rng.normal())
                p = pos[-1] + step
                # avoid collisions with a few retries
                for _ in range(8):
                    dmin = min(np.linalg.norm(p - q) for q in pos)
                    if dmin > 1.1:
                        break
                    step = rng.normal(size=3)
                    step = step / np.linalg.norm(step) * 1.5
                    p = pos[-1] + step
            zs.append(zh)
            pos.append(p.copy())
        # hydrogens: 0-2 per heavy atom
        n_heavy_final = len(zs)
        for k in range(n_heavy_final):
            for _ in range(int(rng.integers(0, 3))):
                d = rng.normal(size=3)
                d = d / np.linalg.norm(d) * 1.09
                zs.append(1)
                pos.append(pos[k] + d)
        z = np.asarray(zs, np.float32)
        P = np.asarray(pos, np.float32)
        y = _surrogate_properties(z, P)
        q = np.round(rng.normal(0, 0.2, size=len(z)), 6)
        q -= q.mean()

        def fmt(v, quirk):
            s = f"{v:.6f}" if abs(v) >= 1e-3 or v == 0 else f"{v:.6e}"
            if quirk and "e" in s:
                s = s.replace("e", "*^")
            return s

        quirk = i % 7 == 0
        lines = [f"{len(z)}"]
        props = " ".join(fmt(float(v), quirk) for v in y)
        lines.append(f"gdb {i + 1}\t0.0 0.0 0.0 {props}")
        for zz, pp, qq in zip(z, P, q):
            sym = _Z_TO_SYMBOL[int(zz)]
            lines.append(
                f"{sym}\t{fmt(pp[0], quirk)}\t{fmt(pp[1], quirk)}"
                f"\t{fmt(pp[2], quirk)}\t{fmt(qq, quirk)}"
            )
        lines.append("\t".join("1000.0" for _ in range(max(1, 3 * len(z) - 6))))
        lines.append("C\tC")
        lines.append("InChI=1S/synthetic\tInChI=1S/synthetic")
        with open(
            os.path.join(root, f"dsgdb9nsd_{i + 1:06d}.xyz"), "w"
        ) as f:
            f.write("\n".join(lines) + "\n")
