"""Real-dataset adapters for the reference's multidataset MLIP corpora.

Each loader parses the EXACT on-disk schema the reference example drivers
consume, and each has a zero-egress surrogate synthesizer writing that same
schema so the full parse -> graph -> train pipeline runs without network
access:

  * ANI-1x      HDF5 ``ani1x-release.h5``: groups per formula with
                ``atomic_numbers [Na]``, ``coordinates [Nc,Na,3]``,
                ``wb97x_dz.energy [Nc]``, ``wb97x_dz.forces [Nc,Na,3]``
                (reference ``examples/ani1_x/train.py:236-257``).
  * QM7-X       HDF5 set files (``1000.hdf5`` ...): ``f[molid][confid]``
                with ``atNUM``, ``atXYZ``, ``ePBE0``, ``eMBD``, ``pbe0FOR``
                (reference ``examples/qm7x/train.py:150-210``).
  * Transition1x HDF5 ``transition1x-release.h5``: ``f[split][formula][rxn]``
                with ``atomic_numbers``, ``positions [Nc,Na,3]``,
                ``wB97x_6-31G(d).energy``, ``wB97x_6-31G(d).forces``
                (reference ``examples/transition1x/utils/create_graph_data.py``).
  * MPtrj       one JSON ``MPtrj_2022.9_full.json``: ``{mpid: {frame:
                {corrected_total_energy | energy_per_atom, force, stress,
                magmom, structure: pymatgen dict}}}``
                (reference ``examples/mptrj/train.py:110-190``).
  * Alexandria  JSON files of pymatgen ComputedStructureEntry dicts:
                ``entry["structure"]`` (lattice.matrix/pbc, sites[].xyz,
                species[0].element, properties.forces), ``entry["energy"]``
                (reference ``examples/alexandria/train.py:148-330``).

Surrogate physics: the same species-pair Morse potential as the MD17
surrogate (``data/md17.py:_surrogate_energy_forces``) for molecules, and a
minimum-image periodic variant for crystals — analytic forces, so
gradient-force training is exactly learnable end to end.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from hydragnn_tpu.data.md17 import _surrogate_energy_forces
from hydragnn_tpu.data.sample import GraphSample
from hydragnn_tpu.data.xyz import SYMBOL_TO_Z

_Z_TO_SYMBOL = {z: s for s, z in SYMBOL_TO_Z.items()}


# ---------------------------------------------------------------------------
# shared surrogate generators
# ---------------------------------------------------------------------------

_HEAVY = np.asarray([6, 7, 8], np.int64)  # C, N, O
_NH = {6: 2, 7: 1, 8: 0}  # H substituents per chain heavy atom (interior)


def random_molecule(rng: np.random.Generator, max_heavy: int = 7):
    """A random organic-ish molecule: a jittered heavy-atom chain with H
    saturation. Returns (z [n], equilibrium-ish pos [n,3])."""
    nh = int(rng.integers(2, max_heavy + 1))
    heavy = rng.choice(_HEAVY, size=nh)
    pos = [np.zeros(3)]
    for i in range(1, nh):
        d = rng.normal(0, 1, 3)
        d[0] += 2.0  # bias along +x so chains don't fold onto themselves
        d = d / np.linalg.norm(d) * 1.5
        pos.append(pos[-1] + d)
    z = list(heavy)
    hpos = []
    for i, zi in enumerate(heavy):
        n_h = _NH[int(zi)] + (1 if i in (0, nh - 1) else 0)
        for k in range(n_h):
            d = rng.normal(0, 1, 3)
            d = d / np.linalg.norm(d) * 1.05
            hpos.append(pos[i] + d)
    z = np.asarray(z + [1] * len(hpos), np.float64)
    pos = np.asarray(pos + hpos, np.float64)
    return z, pos


def molecule_frames(
    rng: np.random.Generator,
    n_frames: int,
    z: np.ndarray,
    eq: np.ndarray,
    temperature: float = 0.05,
):
    """Jittered frames of one molecule with analytic Morse energies/forces.
    Yields (pos [n,3] f32, energy float, forces [n,3] f32)."""
    for _ in range(n_frames):
        pos = eq + rng.normal(0, temperature, eq.shape)
        e, f = _surrogate_energy_forces(pos, z)
        yield pos.astype(np.float32), e, f


_RCOV_PBC = {3: 1.28, 8: 0.66, 11: 1.66, 12: 1.41, 13: 1.21, 14: 1.11,
             17: 1.02, 22: 1.60, 26: 1.32, 29: 1.32, 30: 1.22}


def periodic_energy_forces(z, pos, cell, cutoff: float = 5.0):
    """Species-pair Morse energy/forces over periodic minimum images
    (shifts in {-1,0,1}^3) — the crystal analogue of the MD17 surrogate."""
    n = len(pos)
    inv = np.linalg.inv(cell)
    rc = np.asarray([_RCOV_PBC.get(int(s), 0.9) for s in z], np.float64)
    e = 0.0
    grad = np.zeros_like(pos)
    shifts = np.array(
        [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        np.float64,
    )
    svec = shifts @ cell  # [27, 3]
    for a in range(n):
        rij = pos[a][None, None, :] - pos[None, :, :] - svec[:, None, :]
        dij = np.linalg.norm(rij, axis=-1)  # [27, n]
        d0 = (rc[a] + rc)[None, :]
        D = 0.4 * np.sqrt(float(z[a]) * z.astype(np.float64))[None, :]
        arate = 1.8 / d0
        mask = (dij < cutoff) & (dij > 1e-6)
        ex = np.exp(-arate * (dij - d0))
        pair_e = np.where(mask, D * ((1 - ex) ** 2 - 1.0), 0.0)
        e += 0.5 * float(pair_e.sum())
        dv = np.where(mask, 2.0 * D * arate * (1 - ex) * ex, 0.0)
        g = (dv / np.maximum(dij, 1e-9))[..., None] * rij  # [27, n, 3]
        grad[a] += g.sum((0, 1))
    return e, (-grad).astype(np.float32)


def random_crystal(rng: np.random.Generator, species=(11, 17), a0: float = 4.0):
    """Rock-salt-like 2-species cell with jitter. Returns (z, pos, cell)."""
    base = np.asarray(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]], np.float64
    )
    off = np.asarray([0.5, 0, 0], np.float64)
    pos = np.concatenate([base, (base + off) % 1.0], 0) * a0
    z = np.asarray([species[0]] * 4 + [species[1]] * 4, np.float64)
    pos = pos + rng.normal(0, 0.08, pos.shape)
    cell = np.diag([a0, a0, a0]).astype(np.float64)
    return z, pos, cell


def _mol_sample(z, pos, energy, forces, dataset_id=0) -> GraphSample:
    x = np.asarray(z, np.float32)[:, None]
    return GraphSample(
        x=x,
        pos=np.asarray(pos, np.float32),
        x_raw=x,
        y_raw=np.asarray([energy], np.float32),
        energy=float(energy),
        forces=None if forces is None else np.asarray(forces, np.float32),
        dataset_id=dataset_id,
    )


# ---------------------------------------------------------------------------
# ANI-1x
# ---------------------------------------------------------------------------

def load_ani1x_h5(
    path: str,
    energy_key: str = "wb97x_dz.energy",
    force_key: str = "wb97x_dz.forces",
    limit: Optional[int] = None,
) -> List[GraphSample]:
    """Parse the ANI-1x release HDF5 (NaN-masked, like the reference's
    ``iter_data_buckets``, ``examples/ani1_x/train.py:236-257``)."""
    import h5py

    samples: List[GraphSample] = []
    with h5py.File(path, "r") as f:
        for grp in f.values():
            z = np.asarray(grp["atomic_numbers"][()], np.float64)
            coords = np.asarray(grp["coordinates"][()], np.float64)
            E = np.asarray(grp[energy_key][()], np.float64).reshape(-1)
            F = (
                np.asarray(grp[force_key][()], np.float64)
                if force_key in grp
                else None
            )
            ok = ~np.isnan(E)
            if F is not None:
                ok &= ~np.isnan(F.reshape(len(E), -1)).any(1)
            for c in np.nonzero(ok)[0]:
                samples.append(
                    _mol_sample(
                        z, coords[c], E[c], None if F is None else F[c]
                    )
                )
                if limit is not None and len(samples) >= limit:
                    return samples
    return samples


def synthesize_ani1x_h5(
    path: str, n_groups: int = 30, confs_per_group: int = 20, seed: int = 0
) -> None:
    """Write a surrogate ANI-1x-schema HDF5 (one group per molecule)."""
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        for g in range(n_groups):
            z, eq = random_molecule(rng)
            R, E, F = [], [], []
            for pos, e, frc in molecule_frames(rng, confs_per_group, z, eq):
                R.append(pos)
                E.append(e)
                F.append(frc)
            grp = f.create_group(f"mol{g:04d}")
            grp["atomic_numbers"] = z.astype(np.int64)
            grp["coordinates"] = np.asarray(R, np.float32)
            grp["wb97x_dz.energy"] = np.asarray(E, np.float64)
            grp["wb97x_dz.forces"] = np.asarray(F, np.float32)


# ---------------------------------------------------------------------------
# QM7-X
# ---------------------------------------------------------------------------

def load_qm7x_dir(
    dirpath: str,
    setids: Optional[Sequence[str]] = None,
    limit: Optional[int] = None,
) -> List[GraphSample]:
    """Parse QM7-X set HDF5 files: f[molid][confid]{atNUM, atXYZ, ePBE0,
    eMBD, pbe0FOR}; energy = ePBE0 + eMBD (the reference's EPBE0+MBD target,
    ``examples/qm7x/train.py:175-215``)."""
    import h5py

    names = sorted(setids or [n for n in os.listdir(dirpath) if n.endswith(".hdf5")])
    samples: List[GraphSample] = []
    for name in names:
        with h5py.File(os.path.join(dirpath, name), "r") as f:
            for molid in f:
                for confid in f[molid]:
                    g = f[molid][confid]
                    z = np.asarray(g["atNUM"][()], np.float64).reshape(-1)
                    pos = np.asarray(g["atXYZ"][()], np.float64)
                    e = float(np.asarray(g["ePBE0"][()]).reshape(-1)[0]) + float(
                        np.asarray(g["eMBD"][()]).reshape(-1)[0]
                    )
                    frc = (
                        np.asarray(g["pbe0FOR"][()], np.float64)
                        if "pbe0FOR" in g
                        else None
                    )
                    samples.append(_mol_sample(z, pos, e, frc))
                    if limit is not None and len(samples) >= limit:
                        return samples
    return samples


def synthesize_qm7x_set(
    dirpath: str,
    setid: str = "1000.hdf5",
    n_mols: int = 25,
    confs_per_mol: int = 12,
    seed: int = 0,
) -> None:
    """Write one surrogate QM7-X set file (Geom-mX-iY-cZ-opt conf ids)."""
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(dirpath, exist_ok=True)
    with h5py.File(os.path.join(dirpath, setid), "w") as f:
        for m in range(n_mols):
            z, eq = random_molecule(rng)
            mol = f.create_group(f"Geom-m{m + 1}")
            for c, (pos, e, frc) in enumerate(
                molecule_frames(rng, confs_per_mol, z, eq)
            ):
                g = mol.create_group(f"Geom-m{m + 1}-i1-c{c + 1}-opt")
                g["atNUM"] = z.astype(np.int64)
                g["atXYZ"] = pos
                g["ePBE0"] = np.asarray([e * 0.9], np.float64)
                g["eMBD"] = np.asarray([e * 0.1], np.float64)
                g["pbe0FOR"] = frc


# ---------------------------------------------------------------------------
# Transition1x
# ---------------------------------------------------------------------------

_T1X_PREFIX = "wB97x_6-31G(d)"


def load_transition1x_h5(
    path: str,
    split: str = "data",
    limit: Optional[int] = None,
) -> List[GraphSample]:
    """Parse the Transition1x release HDF5: f[split][formula][rxn] with
    positions/atomic_numbers and wB97x_6-31G(d) energy/forces (reference
    ``examples/transition1x/utils/create_graph_data.py``)."""
    import h5py

    samples: List[GraphSample] = []
    with h5py.File(path, "r") as f:
        root = f[split] if split in f else f
        for formula in root:
            for rxn in root[formula]:
                g = root[formula][rxn]
                if f"{_T1X_PREFIX}.energy" not in g:
                    continue
                z = np.asarray(g["atomic_numbers"][()], np.float64).reshape(-1)
                R = np.asarray(g["positions"][()], np.float64)
                E = np.asarray(g[f"{_T1X_PREFIX}.energy"][()], np.float64)
                F = np.asarray(g[f"{_T1X_PREFIX}.forces"][()], np.float64)
                for c in range(len(E)):
                    samples.append(_mol_sample(z, R[c], E[c], F[c]))
                    if limit is not None and len(samples) >= limit:
                        return samples
    return samples


def synthesize_transition1x_h5(
    path: str, n_rxns: int = 25, confs_per_rxn: int = 15, seed: int = 0
) -> None:
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        data = f.create_group("data")
        for r in range(n_rxns):
            z, eq = random_molecule(rng)
            formula = "".join(
                f"{_Z_TO_SYMBOL[int(s)]}{int((z == s).sum())}"
                for s in sorted(set(int(v) for v in z))
            )
            grp = data.require_group(formula).create_group(f"rxn{r:04d}")
            R, E, F = [], [], []
            for pos, e, frc in molecule_frames(rng, confs_per_rxn, z, eq, 0.08):
                R.append(pos)
                E.append(e)
                F.append(frc)
            grp["atomic_numbers"] = z.astype(np.int64)
            grp["positions"] = np.asarray(R, np.float64)
            grp[f"{_T1X_PREFIX}.energy"] = np.asarray(E, np.float64)
            grp[f"{_T1X_PREFIX}.forces"] = np.asarray(F, np.float64)


# ---------------------------------------------------------------------------
# MPtrj (pymatgen structure dicts in one big JSON)
# ---------------------------------------------------------------------------

def _structure_to_arrays(structure: Dict):
    """pymatgen Structure.as_dict() -> (z, pos, cell, pbc)."""
    cell = np.asarray(structure["lattice"]["matrix"], np.float64).reshape(3, 3)
    pbc = tuple(bool(b) for b in structure["lattice"].get("pbc", (1, 1, 1)))
    zs, pos = [], []
    for site in structure["sites"]:
        sp = site["species"][0]["element"]
        zs.append(SYMBOL_TO_Z[sp])
        if "xyz" in site:
            pos.append(site["xyz"])
        else:
            pos.append(np.asarray(site["abc"], np.float64) @ cell)
    return (
        np.asarray(zs, np.float64),
        np.asarray(pos, np.float64),
        cell,
        pbc,
    )


def load_mptrj_json(
    path: str,
    limit: Optional[int] = None,
    energy_per_atom: bool = False,
) -> List[GraphSample]:
    """Parse the MPtrj full-JSON corpus (reference
    ``examples/mptrj/train.py:110-190``: energy = corrected_total_energy or
    energy_per_atom, forces = 'force', all frames implicitly 3D-periodic)."""
    with open(path) as f:
        d = json.load(f)
    samples: List[GraphSample] = []
    for mpid in d:
        for frame_id, k in d[mpid].items():
            z, pos, cell, _ = _structure_to_arrays(k["structure"])
            e = float(
                k["energy_per_atom"] if energy_per_atom
                else k["corrected_total_energy"]
            )
            s = _mol_sample(z, pos, e, np.asarray(k["force"], np.float64))
            s.cell = cell.astype(np.float32)
            samples.append(s)
            if limit is not None and len(samples) >= limit:
                return samples
    return samples


def _structure_dict(z, pos, cell) -> Dict:
    frac = pos @ np.linalg.inv(cell)
    return {
        "lattice": {"matrix": cell.tolist(), "pbc": (True, True, True)},
        "sites": [
            {
                "species": [{"element": _Z_TO_SYMBOL[int(zi)], "occu": 1}],
                "abc": frac[i].tolist(),
                "xyz": pos[i].tolist(),
                "properties": {},
            }
            for i, zi in enumerate(z)
        ],
    }


def synthesize_mptrj_json(
    path: str, n_structures: int = 20, frames_each: int = 8, seed: int = 0
) -> None:
    """Write a surrogate MPtrj-schema JSON (periodic Morse crystals)."""
    rng = np.random.default_rng(seed)
    d: Dict[str, Dict] = {}
    species_pool = [(11, 17), (12, 8), (13, 8), (22, 8), (26, 8), (29, 30)]
    for s in range(n_structures):
        mpid = f"mp-{1000 + s}"
        d[mpid] = {}
        spec = species_pool[s % len(species_pool)]
        for t in range(frames_each):
            z, pos, cell = random_crystal(rng, species=spec)
            e, frc = periodic_energy_forces(z, pos, cell)
            d[mpid][f"{mpid}-{t}"] = {
                "corrected_total_energy": e,
                "energy_per_atom": e / len(z),
                "force": frc.tolist(),
                "stress": np.zeros((3, 3)).tolist(),
                "magmom": [0.0] * len(z),
                "structure": _structure_dict(z, pos, cell),
            }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(d, f)


# ---------------------------------------------------------------------------
# QCML (tfds force-field records; h5 mirror of the per-record schema)
# ---------------------------------------------------------------------------

def load_qcml_h5(
    path: str,
    limit: Optional[int] = None,
    energy_per_atom: bool = False,
    forces_norm_threshold: float = 1000.0,
) -> List[GraphSample]:
    """Parse a QCML corpus stored as HDF5 groups mirroring the tfds
    ``qcml/dft_force_field`` record fields the reference driver consumes —
    ``atomic_numbers``, ``positions``, ``pbe0_energy``, ``pbe0_forces``
    (reference ``examples/qcml/train.py:154-170``) — including the
    force-norm outlier filter (:116, threshold 1000 eV/A)."""
    import h5py

    samples: List[GraphSample] = []
    with h5py.File(path, "r") as f:
        for key in sorted(f):
            g = f[key]
            z = np.asarray(g["atomic_numbers"][()], np.float64).reshape(-1)
            pos = np.asarray(g["positions"][()], np.float64)
            e = float(np.asarray(g["pbe0_energy"][()]).reshape(-1)[0])
            frc = np.asarray(g["pbe0_forces"][()], np.float64)
            if np.linalg.norm(frc) > forces_norm_threshold:
                continue
            if energy_per_atom:
                e = e / len(z)
            samples.append(_mol_sample(z, pos, e, frc))
            if limit is not None and len(samples) >= limit:
                return samples
    return samples


def synthesize_qcml_h5(path: str, n_records: int = 300, seed: int = 0) -> None:
    """Write a surrogate QCML-schema HDF5 (one group per tfds record)."""
    import h5py

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        rec = 0
        while rec < n_records:
            z, eq = random_molecule(rng)
            for pos, e, frc in molecule_frames(rng, 10, z, eq):
                g = f.create_group(f"rec{rec:07d}")
                g["atomic_numbers"] = z.astype(np.int64)
                g["positions"] = pos
                g["pbe0_energy"] = np.asarray([e], np.float64)
                g["pbe0_forces"] = frc
                rec += 1
                if rec >= n_records:
                    break


# ---------------------------------------------------------------------------
# Alexandria (ComputedStructureEntry JSON files)
# ---------------------------------------------------------------------------

def load_alexandria_dir(
    dirpath: str,
    limit: Optional[int] = None,
    energy_per_atom: bool = False,
) -> List[GraphSample]:
    """Parse a directory of Alexandria JSON files, each
    ``{"entries": [ComputedStructureEntry dicts]}`` with per-site forces
    in ``structure.sites[].properties.forces`` (reference
    ``examples/alexandria/train.py:148-330``)."""
    samples: List[GraphSample] = []
    for name in sorted(os.listdir(dirpath)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(dirpath, name)) as f:
            payload = json.load(f)
        entries = payload.get("entries", payload) if isinstance(payload, dict) \
            else payload
        for entry in entries:
            structure = entry["structure"]
            z, pos, cell, _ = _structure_to_arrays(structure)
            frc = np.asarray(
                [site["properties"]["forces"] for site in structure["sites"]],
                np.float64,
            )
            e = float(entry["energy"])
            if energy_per_atom:
                e = e / len(z)
            s = _mol_sample(z, pos, e, frc)
            s.cell = cell.astype(np.float32)
            samples.append(s)
            if limit is not None and len(samples) >= limit:
                return samples
    return samples


def synthesize_alexandria_dir(
    dirpath: str, n_files: int = 2, entries_per_file: int = 40, seed: int = 0
) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(dirpath, exist_ok=True)
    species_pool = [(3, 8), (11, 17), (12, 8), (13, 8), (26, 8)]
    mat = 0
    for fidx in range(n_files):
        entries = []
        for _ in range(entries_per_file):
            z, pos, cell = random_crystal(
                rng, species=species_pool[mat % len(species_pool)]
            )
            e, frc = periodic_energy_forces(z, pos, cell)
            sd = _structure_dict(z, pos, cell)
            for i in range(len(z)):
                sd["sites"][i]["properties"]["forces"] = frc[i].tolist()
                sd["sites"][i]["properties"]["magmom"] = 0.0
            entries.append(
                {
                    "energy": e,
                    "structure": sd,
                    "data": {"mat_id": f"agm{mat:06d}"},
                }
            )
            mat += 1
        with open(
            os.path.join(dirpath, f"alexandria_ps_{fidx:03d}.json"), "w"
        ) as f:
            json.dump({"entries": entries}, f)
