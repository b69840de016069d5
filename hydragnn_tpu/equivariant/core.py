"""Equivariant (E(3)) feature algebra for MACE-class models.

From-scratch JAX replacement for the e3nn machinery the reference leans on
(``hydragnn/utils/model/mace_utils/``, ``MACEStack.py:53,155``):

  * ``Irreps``: natural-parity irreps ((mul, l) pairs, parity = (-1)^l, the
    form MACE's hidden irreps take via ``create_irreps_string``,
    ``irreps_tools.py:106``).
  * Real spherical harmonics with 'component' normalization
    (||Y_l||^2 = 2l+1, e3nn convention used at ``MACEStack.py:155-159``).
  * Real Clebsch-Gordan coefficients computed numerically as intertwiner
    null-spaces of Wigner-D constraints built FROM these spherical
    harmonics -- guaranteeing internal consistency without inheriting
    e3nn's phase conventions (divergence documented: equivariance is
    exact, per-coefficient parity with e3nn is not claimed).
  * ``LinearIrreps``: per-l channel mixing (o3.Linear analogue).
  * ``tp_instructions``: allowed (l1, l2 -> l3) paths with the natural
    parity selection rule l1+l2+l3 even.

Features are carried as dicts {l: [N, mul, 2l+1]} -- channel-major layouts
that map cleanly onto the MXU (the (mul x m) trailing block is a dense
matrix per node).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Irreps = Tuple[Tuple[int, int], ...]  # ((mul, l), ...)
IrrepsArray = Dict[int, jnp.ndarray]  # l -> [N, mul, 2l+1]


def _disk_cache_dir():
    """Persistent cache for derived constant tensors (CG / U-matrix): the
    derivations are pure functions of small integer keys but cost seconds
    to minutes of SVD work; caching them on disk makes every process after
    the first start instantly (VERDICT r03 item 8).  Set
    HYDRAGNN_TPU_CACHE=0 to disable, or =<dir> to relocate."""
    import os

    env = os.environ.get("HYDRAGNN_TPU_CACHE", "")
    if env == "0":
        return None
    base = env or os.path.join(
        os.path.expanduser("~"), ".cache", "hydragnn_tpu"
    )
    path = os.path.join(base, "v1")
    try:
        os.makedirs(path, exist_ok=True)
        return path
    except OSError:
        return None


def disk_cached(key: str, compute):
    """np.load the tensor for ``key`` if cached, else compute + atomically
    persist (rename; concurrent processes race benignly)."""
    import os
    import tempfile

    # packaged pre-seeded tensors first (read-only, committed with the
    # library): even a first-ever run skips the derivation SVDs
    seeded = os.path.join(os.path.dirname(__file__), "_cache", key + ".npy")
    if os.path.exists(seeded):
        try:
            return np.load(seeded, allow_pickle=False)
        except Exception:
            pass
    d = _disk_cache_dir()
    if d is None:
        return compute()
    fp = os.path.join(d, key + ".npy")
    if os.path.exists(fp):
        try:
            return np.load(fp, allow_pickle=False)
        except Exception:
            pass
    val = compute()
    if val is not None:
        try:
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".npy")
            os.close(fd)
            np.save(tmp, val)
            os.replace(tmp, fp)
        except OSError:
            pass
    return val


def irreps_dim(irreps: Irreps) -> int:
    return sum(mul * (2 * l + 1) for mul, l in irreps)


def make_irreps(mul: int, max_l: int) -> Irreps:
    """create_irreps_string semantics (irreps_tools.py:106): same
    multiplicity for every l up to max_l."""
    return tuple((mul, l) for l in range(max_l + 1))


def flatten_irreps(x: IrrepsArray, irreps: Irreps) -> jnp.ndarray:
    """dict -> flat [N, sum mul*(2l+1)] (e3nn memory layout)."""
    parts = []
    for mul, l in irreps:
        parts.append(x[l].reshape(x[l].shape[0], mul * (2 * l + 1)))
    return jnp.concatenate(parts, axis=-1)


def unflatten_irreps(flat: jnp.ndarray, irreps: Irreps) -> IrrepsArray:
    out = {}
    off = 0
    for mul, l in irreps:
        d = mul * (2 * l + 1)
        out[l] = flat[:, off : off + d].reshape(flat.shape[0], mul, 2 * l + 1)
        off += d
    return out


# ---------------------------------------------------------------------------
# real spherical harmonics (component normalization)
# ---------------------------------------------------------------------------


def real_spherical_harmonics(vec: jnp.ndarray, max_l: int) -> Dict[int, jnp.ndarray]:
    """Y_l(v/||v||) for l = 0..max_l (max 3), 'component' normalization.

    Input [E, 3] (assumed already normalized or nonzero-safe); output
    {l: [E, 2l+1]} with Sum_m Y_lm^2 = 2l+1.
    """
    assert max_l <= 3, "spherical harmonics implemented up to l=3"
    x, y, z = vec[:, 0], vec[:, 1], vec[:, 2]
    out: Dict[int, jnp.ndarray] = {0: jnp.ones_like(x)[:, None]}
    if max_l >= 1:
        # component normalization: sqrt(3) * (x, y, z)
        out[1] = math.sqrt(3.0) * jnp.stack([x, y, z], axis=-1)
    if max_l >= 2:
        s5 = math.sqrt(15.0)
        c = math.sqrt(5.0) / 2.0
        out[2] = jnp.stack(
            [
                s5 * x * y,
                s5 * y * z,
                c * (2 * z * z - x * x - y * y),
                s5 * x * z,
                s5 / 2.0 * (x * x - y * y),
            ],
            axis=-1,
        )
    if max_l >= 3:
        s7 = math.sqrt(7.0)
        out[3] = jnp.stack(
            [
                s7 * math.sqrt(5.0 / 8.0) * y * (3 * x * x - y * y),
                s7 * math.sqrt(15.0) * x * y * z,
                s7 * math.sqrt(3.0 / 8.0) * y * (4 * z * z - x * x - y * y),
                s7 * 0.5 * z * (2 * z * z - 3 * x * x - 3 * y * y),
                s7 * math.sqrt(3.0 / 8.0) * x * (4 * z * z - x * x - y * y),
                s7 * math.sqrt(15.0) / 2.0 * z * (x * x - y * y),
                s7 * math.sqrt(5.0 / 8.0) * x * (x * x - 3 * y * y),
            ],
            axis=-1,
        )
    return out


# ---------------------------------------------------------------------------
# numeric Wigner-D and Clebsch-Gordan
# ---------------------------------------------------------------------------


def _np_sh_generic(vec: np.ndarray, l: int) -> np.ndarray:
    """Real spherical harmonics of any degree l (host numpy, float64),
    component normalization (sum_m Y_lm^2 = 2l+1), standard m = -l..l
    ordering (sin branch first).  Used only to derive Wigner-D/CG constants
    for l > 3 (higher-order MACE intermediates); the model-side basis stays
    the explicit formulas in :func:`real_spherical_harmonics`."""
    v = np.asarray(vec, np.float64)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    ct = np.clip(z / np.maximum(r, 1e-300), -1.0, 1.0)
    phi = np.arctan2(y, x)
    st2 = np.maximum(1.0 - ct * ct, 0.0)
    # associated Legendre P_l^m (no Condon-Shortley phase), m = 0..l
    P = {}
    pmm = np.ones_like(ct)
    for m in range(l + 1):
        P[(m, m)] = pmm
        if m < l:
            P[(m + 1, m)] = ct * (2 * m + 1) * pmm
            for ll in range(m + 2, l + 1):
                P[(ll, m)] = (
                    (2 * ll - 1) * ct * P[(ll - 1, m)]
                    - (ll + m - 1) * P[(ll - 2, m)]
                ) / (ll - m)
        pmm = pmm * (2 * m + 1) * np.sqrt(st2)
    from math import factorial

    cols = []
    for m in range(-l, l + 1):
        am = abs(m)
        N = math.sqrt(
            (2 * l + 1) * factorial(l - am) / factorial(l + am)
        ) * (math.sqrt(2.0) if m != 0 else 1.0)
        ang = np.sin(am * phi) if m < 0 else np.cos(am * phi)
        cols.append(N * P[(l, am)] * ang)
    return np.stack(cols, axis=-1)


def _np_sh(vec: np.ndarray, max_l: int) -> Dict[int, np.ndarray]:
    import jax

    v = jnp.asarray(vec)
    with jax.default_device(jax.devices("cpu")[0]):
        out = real_spherical_harmonics(v, min(max_l, 3))
    res = {l: np.asarray(a, np.float64) for l, a in out.items()}
    for l in range(4, max_l + 1):
        res[l] = _np_sh_generic(np.asarray(vec, np.float64), l)
    return res


def _rotation_matrices(rng: np.random.Generator, k: int) -> np.ndarray:
    """k random rotation matrices via QR of gaussian matrices."""
    rots = []
    while len(rots) < k:
        q, r = np.linalg.qr(rng.normal(size=(3, 3)))
        q = q * np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        rots.append(q)
    return np.stack(rots)


@lru_cache(maxsize=None)
def _wigner_cache(max_l: int, n_rot: int = 6) -> Tuple[np.ndarray, List[List[np.ndarray]]]:
    """Random rotations + their Wigner-D matrices per l (numerically fitted
    so that Y_l(R v) = D_l(R) Y_l(v) in THIS basis)."""
    rng = np.random.default_rng(12345)
    rots = _rotation_matrices(rng, n_rot)
    v = rng.normal(size=(max(64, 8 * (2 * max_l + 1)), 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = _np_sh(v, max_l)
    Ds: List[List[np.ndarray]] = []
    for R in rots:
        Y_rot = _np_sh(v @ R.T, max_l)
        row = []
        for l in range(max_l + 1):
            # Y_rot = Y @ D^T  ->  D^T = lstsq(Y, Y_rot)
            DT, *_ = np.linalg.lstsq(Y[l], Y_rot[l], rcond=None)
            row.append(DT.T)
        Ds.append(row)
    return rots, Ds


@lru_cache(maxsize=None)
def clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real CG tensor C[m1, m2, m3] (Frobenius norm 1): the intertwiner with
    (D1 x D2) C = C D3 for all rotations, in this library's SH basis."""
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    return disk_cached(
        f"cg_{l1}_{l2}_{l3}", lambda: _clebsch_gordan_derive(l1, l2, l3)
    )


def _clebsch_gordan_derive(l1: int, l2: int, l3: int) -> np.ndarray:
    max_l = max(l1, l2, l3)
    _, Ds = _wigner_cache(max_l)
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    blocks = []
    for row in Ds:
        D1, D2, D3 = row[l1], row[l2], row[l3]
        D12 = np.kron(D1, D2)  # [(d1 d2), (d1 d2)]
        # constraint: D12 @ C - C @ D3 = 0, C: [(d1 d2), d3]
        M = np.kron(D12, np.eye(d3)) - np.kron(np.eye(d1 * d2), D3.T)
        blocks.append(M)
    M = np.concatenate(blocks, axis=0)
    _, s, vh = np.linalg.svd(M)
    null = vh[-1]
    # tolerance limited by the numerically-fitted Wigner-D (~1e-7)
    assert s[-1] < 1e-5, f"no intertwiner found for {l1}x{l2}->{l3}: {s[-1]}"
    if len(s) > 1 and s[-2] < 1e-5:
        raise RuntimeError(f"multiplicity > 1 in {l1}x{l2}->{l3}")
    C = null.reshape(d1 * d2, d3).reshape(d1, d2, d3)
    # canonical sign: make the largest-magnitude entry positive
    idx = np.unravel_index(np.argmax(np.abs(C)), C.shape)
    if C[idx] < 0:
        C = -C
    return C / np.linalg.norm(C)


def tp_instructions(
    irreps1: Irreps, max_l2: int, max_l_out: int
) -> List[Tuple[int, int, int]]:
    """Allowed uvu paths (l1, l2, l3): triangle rule + natural parity
    (l1+l2+l3 even), the analogue of ``tp_out_irreps_with_instructions``
    (mace_utils irreps_tools.py)."""
    paths = []
    for _, l1 in irreps1:
        for l2 in range(max_l2 + 1):
            for l3 in range(abs(l1 - l2), min(l1 + l2, max_l_out) + 1):
                if (l1 + l2 + l3) % 2 == 0:
                    paths.append((l1, l2, l3))
    return paths


# ---------------------------------------------------------------------------
# linear layers on irreps
# ---------------------------------------------------------------------------


class LinearIrreps(nn.Module):
    """o3.Linear analogue: independent channel mixing per l with
    1/sqrt(fan_in) normalization; l's absent from the input map to zeros
    unless absent from the output too."""

    irreps_in: Irreps
    irreps_out: Irreps

    @nn.compact
    def __call__(self, x: IrrepsArray) -> IrrepsArray:
        in_mul = {l: mul for mul, l in self.irreps_in}
        out: IrrepsArray = {}
        n = None
        for mul_out, l in self.irreps_out:
            if l in in_mul and l in x:
                w = self.param(
                    f"w{l}",
                    nn.initializers.normal(stddev=1.0),
                    (in_mul[l], mul_out),
                )
                out[l] = jnp.einsum("num,uv->nvm", x[l], w) / math.sqrt(in_mul[l])
                n = x[l].shape[0]
            else:
                out[l] = None  # filled by caller-shape below
        for mul_out, l in self.irreps_out:
            if out[l] is None:
                assert n is not None, "LinearIrreps needs at least one matched l"
                out[l] = jnp.zeros((n, mul_out, 2 * l + 1))
        return out
