"""MD17 dataset adapter (molecular-dynamics energy/force trajectories).

Parses the canonical MD17 ``.npz`` distribution (sGDML, as consumed by
PyG's ``torch_geometric.datasets.MD17`` and the reference driver
``/root/reference/examples/md17/md17.py:92-99``): arrays

    ``z``  [n]          atomic numbers
    ``R``  [T, n, 3]    positions per frame (Å)
    ``E``  [T] or [T,1] total energies (kcal/mol)
    ``F``  [T, n, 3]    forces (kcal/mol/Å)

plus metadata keys (``name``, ``theory``) that are ignored.

Zero-egress fallback: :func:`synthesize_md17_npz` writes a deterministic
surrogate trajectory of a uracil-like 12-atom ring molecule in the exact
npz schema — harmonic bond + angle-free pair potential with ANALYTIC
forces, so gradient-force training (forces == -dE/dpos) is exactly
learnable and force-consistency can be validated end to end.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def load_md17_npz(
    path: str,
    limit: Optional[int] = None,
    stride: int = 1,
) -> List[GraphSample]:
    """Load an MD17 npz trajectory into per-frame samples.

    ``x_raw`` column: [Z]; ``energy``/``forces`` set for MLIP training;
    ``y_raw`` = [E] so non-MLIP energy regression works too (the reference
    md17.py:27 uses ``data.energy / len(data.x)`` via per-atom scaling)."""
    with np.load(path, allow_pickle=True) as data:
        z = np.asarray(data["z"], np.float32).reshape(-1)
        R = np.asarray(data["R"], np.float32)
        E = np.asarray(data["E"], np.float32).reshape(-1)
        F = np.asarray(data["F"], np.float32)
    frames = range(0, len(R), stride)
    samples = []
    for t in frames:
        if limit is not None and len(samples) >= limit:
            break
        x = z[:, None]
        samples.append(
            GraphSample(
                x=x,
                pos=R[t],
                x_raw=x,
                y_raw=np.asarray([E[t]], np.float32),
                energy=float(E[t]),
                forces=F[t],
            )
        )
    return samples


# ---------------------------------------------------------------------------
# offline surrogate trajectory (zero-egress environments)
# ---------------------------------------------------------------------------

# uracil-like planar ring + substituents: 12 atoms (C4N2O2H4)
_URACIL_Z = np.asarray([6, 6, 6, 6, 7, 7, 8, 8, 1, 1, 1, 1], np.float32)
_RING = 6


def _equilibrium_geometry() -> np.ndarray:
    ang = np.linspace(0, 2 * np.pi, _RING, endpoint=False)
    ring = np.stack([1.39 * np.cos(ang), 1.39 * np.sin(ang), np.zeros(_RING)], 1)
    # two O off ring atoms 0/2, four H off atoms 1,3,4,5
    subs = []
    for i, r in [(0, 1.22), (2, 1.22), (1, 1.08), (3, 1.08), (4, 1.01), (5, 1.01)]:
        d = ring[i] / np.linalg.norm(ring[i])
        subs.append(ring[i] + d * r)
    return np.concatenate([ring, np.asarray(subs)], 0).astype(np.float32)


def _pairs(n: int):
    iu = np.triu_indices(n, 1)
    return iu[0], iu[1]


_RCOV = {1: 0.31, 6: 0.76, 7: 0.71, 8: 0.66}


def _surrogate_energy_forces(pos: np.ndarray, z: np.ndarray):
    """Species-pair Morse potential with analytic forces.

    V(d; Zi, Zj) = D [ (1 - exp(-a (d - d0)))^2 - 1 ],   d0 = rcov_i + rcov_j

    Every parameter is a function of the species PAIR only, so the force
    field is an exactly-learnable function of (positions, Z) — unlike a
    per-pair table of rest lengths, which a GNN cannot distinguish for
    same-species pairs and which stalls force training at the mean."""
    i, j = _pairs(len(pos))
    zi = z[i].astype(int)
    zj = z[j].astype(int)
    rc = np.asarray([_RCOV.get(int(s), 0.7) for s in z], np.float64)
    d0 = rc[i] + rc[j]
    D = 3.0 * np.sqrt(zi * zj).astype(np.float64)
    a = 1.8 / d0
    rij = pos[i] - pos[j]
    dij = np.linalg.norm(rij, axis=1)
    ex = np.exp(-a * (dij - d0))
    e = float(np.sum(D * ((1 - ex) ** 2 - 1.0)))
    # dV/dd = 2 D a (1 - ex) ex
    dv = 2.0 * D * a * (1 - ex) * ex
    g = (dv / np.maximum(dij, 1e-9))[:, None] * rij
    grad = np.zeros_like(pos)
    np.add.at(grad, i, g)
    np.add.at(grad, j, -g)
    return e, (-grad).astype(np.float32)


def synthesize_md17_npz(
    path: str, n_frames: int = 1000, seed: int = 0, temperature: float = 0.06
) -> None:
    """Write a surrogate MD17-format npz trajectory at ``path``."""
    rng = np.random.default_rng(seed)
    eq = _equilibrium_geometry()
    n = len(eq)
    R = np.zeros((n_frames, n, 3), np.float32)
    E = np.zeros((n_frames,), np.float32)
    F = np.zeros((n_frames, n, 3), np.float32)
    for t in range(n_frames):
        pos = eq + rng.normal(0, temperature, size=eq.shape).astype(np.float32)
        e, f = _surrogate_energy_forces(pos.astype(np.float64), _URACIL_Z)
        # absolute offset mimics real MD17 energies (large negative baseline)
        R[t], E[t], F[t] = pos, e - 260120.0, f
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        z=_URACIL_Z,
        R=R,
        E=E,
        F=F,
        name="synthetic-uracil",
        theory="surrogate-harmonic",
    )
