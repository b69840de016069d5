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


def _surrogate_energy_forces(pos: np.ndarray, d0: np.ndarray, k: np.ndarray):
    """E = sum_ij 0.5 k_ij (|r_ij| - d0_ij)^2 with analytic forces."""
    i, j = _pairs(len(pos))
    rij = pos[i] - pos[j]
    dij = np.linalg.norm(rij, axis=1)
    e = float(np.sum(0.5 * k * (dij - d0) ** 2))
    # dE/dri = k (d - d0) * rij/d
    g = (k * (dij - d0) / np.maximum(dij, 1e-9))[:, None] * rij
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
    i, j = _pairs(n)
    d0 = np.linalg.norm(eq[i] - eq[j], axis=1)
    # stiff for bonded-range pairs, soft long-range (smooth, learnable)
    k = np.where(d0 < 1.8, 300.0, 5.0) / np.maximum(d0, 1.0)
    R = np.zeros((n_frames, n, 3), np.float32)
    E = np.zeros((n_frames,), np.float32)
    F = np.zeros((n_frames, n, 3), np.float32)
    for t in range(n_frames):
        pos = eq + rng.normal(0, temperature, size=eq.shape).astype(np.float32)
        e, f = _surrogate_energy_forces(pos, d0, k)
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
