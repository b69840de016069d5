"""LSMS post-processing utilities.

Reference parity: ``hydragnn/utils/lsms/``:
  * total energy -> formation enthalpy / Gibbs free energy conversion
    (``convert_total_energy_to_formation_gibbs.py``),
  * compositional histogram cutoff for dataset pruning
    (``compositional_histogram_cutoff.py``).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from hydragnn_tpu.data.sample import GraphSample


def convert_total_energy_to_formation(
    samples: Sequence[GraphSample],
    pure_element_energies: Dict[int, float],
) -> None:
    """E_formation = E_total - sum_i E_pure(Z_i); in-place on y_raw[0] /
    energy."""
    for s in samples:
        z = np.round(np.asarray(s.x[:, 0])).astype(int)
        baseline = sum(pure_element_energies.get(int(zi), 0.0) for zi in z)
        if s.energy is not None:
            s.energy = np.float32(float(s.energy) - baseline)
        if s.y_raw is not None and len(s.y_raw):
            s.y_raw = s.y_raw.copy()
            s.y_raw[0] = s.y_raw[0] - baseline


def formation_to_gibbs(
    formation_energy: float, temperature: float, mixing_entropy: float
) -> float:
    """G = H - T*S (per reference conversion)."""
    return formation_energy - temperature * mixing_entropy


def ideal_mixing_entropy(concentrations: Sequence[float], kb: float = 8.617333e-5):
    """S_mix = -k_B sum c ln c (eV/K units with default k_B)."""
    c = np.asarray([x for x in concentrations if x > 0], np.float64)
    return float(-kb * (c * np.log(c)).sum())


def compositional_histogram_cutoff(
    samples: Sequence[GraphSample],
    max_per_composition: int,
    seed: int = 0,
) -> List[GraphSample]:
    """Cap the number of samples per element-composition category
    (reference ``compositional_histogram_cutoff.py`` behavior)."""
    rng = np.random.default_rng(seed)
    buckets: Dict = {}
    for i, s in enumerate(samples):
        key = tuple(sorted(np.round(np.asarray(s.x[:, 0])).astype(int).tolist()))
        buckets.setdefault(key, []).append(i)
    keep = []
    for key in sorted(buckets):
        idx = np.asarray(buckets[key])
        if len(idx) > max_per_composition:
            idx = rng.choice(idx, max_per_composition, replace=False)
        keep.extend(int(i) for i in idx)
    return [samples[i] for i in sorted(keep)]


def stratified_subsample(
    samples: Sequence[GraphSample], percentage: float, seed: int = 0
) -> List[GraphSample]:
    """Reference ``preprocess/stratified_sampling.py``: keep ``percentage``
    of each composition category."""
    rng = np.random.default_rng(seed)
    buckets: Dict = {}
    for i, s in enumerate(samples):
        key = tuple(sorted(set(np.round(np.asarray(s.x[:, 0])).astype(int).tolist())))
        buckets.setdefault(key, []).append(i)
    keep = []
    for key in sorted(buckets):
        idx = np.asarray(buckets[key])
        n = max(1, int(round(len(idx) * percentage)))
        keep.extend(int(i) for i in rng.choice(idx, n, replace=False))
    return [samples[i] for i in sorted(keep)]
