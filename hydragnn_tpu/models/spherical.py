"""Spherical Bessel / spherical-harmonic basis for DimeNet.

Re-derivation of PyG's sympy-generated ``bessel_basis`` / ``real_sph_harm``
(used by the reference via ``torch_geometric.nn.models.dimenet.
SphericalBasisLayer``, ``DIMEStack.py:71-73``) with closed-form recurrences:

  * spherical Bessel j_l by upward recurrence,
  * Bessel zeros z_{l,n} by interlaced bisection (numpy, at trace time),
  * m=0 real spherical harmonics Y_l0(theta) via Legendre recurrence.

sbf(d, angle)[t, l*k+n] = env(d/c) * N_ln * j_l(z_ln * d/c) |_{edge kj}
                          * sqrt((2l+1)/4pi) * P_l(cos angle) |_{triplet}
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _sph_jn_np(l_max: int, x: np.ndarray) -> np.ndarray:
    """Spherical Bessel j_0..j_l_max at x (numpy, stable enough for the root
    ranges used here). Returns [l_max+1, ...]."""
    x = np.asarray(x, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j0 = np.where(x == 0, 1.0, np.sin(x) / x)
        out = [j0]
        if l_max >= 1:
            j1 = np.where(x == 0, 0.0, np.sin(x) / x**2 - np.cos(x) / x)
            out.append(j1)
        for l in range(2, l_max + 1):
            out.append(np.where(x == 0, 0.0, (2 * l - 1) / x * out[-1] - out[-2]))
    return np.stack(out)


@lru_cache(maxsize=None)
def bessel_zeros(num_spherical: int, num_radial: int) -> np.ndarray:
    """First ``num_radial`` positive zeros of j_l for l < num_spherical.
    j_0 zeros are n*pi; zeros of j_l interlace those of j_{l-1}."""
    zeros = np.zeros((num_spherical, num_radial), np.float64)
    zeros[0] = np.arange(1, num_radial + 1) * np.pi
    # need extra zeros of previous order for bracketing
    prev = np.arange(1, num_radial + num_spherical + 1) * np.pi
    for l in range(1, num_spherical):
        cur = []
        f = lambda x: _sph_jn_np(l, np.asarray([x]))[l, 0]
        for i in range(len(prev) - 1):
            lo, hi = prev[i], prev[i + 1]
            flo, fhi = f(lo), f(hi)
            if flo * fhi > 0:
                continue
            for _ in range(80):
                mid = 0.5 * (lo + hi)
                fm = f(mid)
                if flo * fm <= 0:
                    hi, fhi = mid, fm
                else:
                    lo, flo = mid, fm
            cur.append(0.5 * (lo + hi))
        cur = np.asarray(cur[: num_radial + num_spherical - l])
        zeros[l] = cur[:num_radial]
        prev = cur
    return zeros


@lru_cache(maxsize=None)
def bessel_normalizers(num_spherical: int, num_radial: int) -> np.ndarray:
    """N_ln = 1 / sqrt(0.5 * j_{l+1}(z_ln)^2) (PyG bessel_basis convention)."""
    z = bessel_zeros(num_spherical, num_radial)
    norms = np.zeros_like(z)
    for l in range(num_spherical):
        jl1 = _sph_jn_np(l + 1, z[l])[l + 1]
        norms[l] = 1.0 / np.sqrt(0.5 * jl1**2)
    return norms


def sph_jn(l_max: int, x: jnp.ndarray) -> jnp.ndarray:
    """j_0..j_l_max(x) in jnp; x must be > 0 (sanitize first). [L+1, ...]."""
    j0 = jnp.sin(x) / x
    outs = [j0]
    if l_max >= 1:
        outs.append(jnp.sin(x) / x**2 - jnp.cos(x) / x)
    for l in range(2, l_max + 1):
        outs.append((2 * l - 1) / x * outs[-1] - outs[-2])
    return jnp.stack(outs)


def legendre_cos(l_max: int, cos_t: jnp.ndarray) -> jnp.ndarray:
    """P_0..P_l_max(cos t). [L+1, ...]."""
    outs = [jnp.ones_like(cos_t)]
    if l_max >= 1:
        outs.append(cos_t)
    for l in range(2, l_max + 1):
        outs.append(((2 * l - 1) * cos_t * outs[-1] - (l - 1) * outs[-2]) / l)
    return jnp.stack(outs)


def spherical_basis(
    dist_scaled: jnp.ndarray,  # [E] d/cutoff in (0, 1], pre-sanitized
    angle: jnp.ndarray,  # [T]
    idx_kj: jnp.ndarray,  # [T] edge index of (k -> j)
    num_spherical: int,
    num_radial: int,
    envelope_exponent: int = 5,
) -> jnp.ndarray:
    """[T, num_spherical * num_radial] spherical basis (PyG semantics)."""
    from hydragnn_tpu.models.radial import polynomial_envelope

    z = jnp.asarray(bessel_zeros(num_spherical, num_radial), dist_scaled.dtype)
    norm = jnp.asarray(
        bessel_normalizers(num_spherical, num_radial), dist_scaled.dtype
    )
    # radial part per edge: j_l(z_ln * d) -> [L, K, E]
    x = z[:, :, None] * dist_scaled[None, None, :]
    x = jnp.maximum(x, 1e-12)
    jl = sph_jn(num_spherical - 1, x)  # [L, L, K, E]; take matching l per row
    rad = jnp.stack([jl[l, l] for l in range(num_spherical)])  # [L, K, E]
    rad = rad * norm[:, :, None]
    env = polynomial_envelope(jnp.maximum(dist_scaled, 1e-12), envelope_exponent)
    rad = rad * env[None, None, :]

    # angular part per triplet: sqrt((2l+1)/4pi) P_l(cos angle) -> [L, T]
    pref = jnp.asarray(
        [math.sqrt((2 * l + 1) / (4 * math.pi)) for l in range(num_spherical)],
        dist_scaled.dtype,
    )
    ang = legendre_cos(num_spherical - 1, jnp.cos(angle)) * pref[:, None]

    out = rad[:, :, idx_kj] * ang[:, None, :]  # [L, K, T]
    return jnp.transpose(out, (2, 0, 1)).reshape(angle.shape[0], -1)
