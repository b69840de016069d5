"""Radial basis functions, cutoffs, and distance transforms.

Covers the reference menu: Gaussian smearing + shifted softplus (SchNet,
PyG ``models/schnet.py`` semantics), Bessel basis + polynomial envelope
(DimeNet/PNAPlus, PyG ``models/dimenet.py``), sinc expansion + cosine
cutoff (PaiNN, ``PAINNStack.py:331-352``), and the MACE radial family
(Bessel/Chebyshev/Gaussian + polynomial cutoff + Agnesi/Soft transforms,
``hydragnn/utils/model/mace_utils/modules/radial.py:23-204``).

All functions take ``dist`` of shape [E] or [E,1] and are padding-safe when
given a pre-sanitized distance (use ``safe_dist``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def safe_dist(dist: jnp.ndarray, mask: Optional[jnp.ndarray], fill: float = 1.0):
    """Replace padding-edge distances (0) by a harmless value so that
    1/d-style bases don't produce NaNs that poison gradients."""
    if mask is None:
        return dist
    m = mask.reshape(mask.shape + (1,) * (dist.ndim - mask.ndim))
    return jnp.where(m, dist, jnp.asarray(fill, dist.dtype))


def shifted_softplus(x):
    return jax.nn.softplus(x) - math.log(2.0)


def gaussian_smearing(dist, start: float, stop: float, num_gaussians: int):
    """SchNet GaussianSmearing: exp(-0.5/dx^2 * (d - mu_k)^2)."""
    offset = jnp.linspace(start, stop, num_gaussians, dtype=dist.dtype)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    d = dist.reshape(-1, 1) - offset[None, :]
    return jnp.exp(coeff * d * d)


def cosine_cutoff(dist, cutoff: float):
    """Behler-Parrinello cosine cutoff (PAINNStack.py:341-352)."""
    return jnp.where(
        dist < cutoff, 0.5 * (jnp.cos(jnp.pi * dist / cutoff) + 1.0), 0.0
    )


def sinc_expansion(dist, num_radial: int, cutoff: float):
    """sin(n pi d / c) / d  (PAINNStack.py:331-338). dist shape [E,1]."""
    n = jnp.arange(1, num_radial + 1, dtype=dist.dtype)
    return jnp.sin(dist * n * jnp.pi / cutoff) / dist


def polynomial_envelope(x, exponent: int):
    """PyG dimenet Envelope: 1/x + a x^(p-1) + b x^p + c x^(p+1), p=exp+1,
    zero beyond x=1."""
    p = exponent + 1
    a = -(p + 1) * (p + 2) / 2.0
    b = float(p * (p + 2))
    c = -p * (p + 1) / 2.0
    xp = x ** (p - 1)
    val = 1.0 / x + a * xp + b * xp * x + c * xp * x * x
    return jnp.where(x < 1.0, val, 0.0)


class BesselBasisLayer(nn.Module):
    """PyG dimenet BesselBasisLayer: envelope(d/c) * sin(freq d/c) with
    trainable frequencies initialized to n*pi."""

    num_radial: int
    cutoff: float
    envelope_exponent: int = 5

    @nn.compact
    def __call__(self, dist):
        freq = self.param(
            "freq",
            lambda key: jnp.arange(1, self.num_radial + 1, dtype=jnp.float32)
            * jnp.pi,
        )
        d = (dist / self.cutoff).reshape(-1, 1)
        return polynomial_envelope(d, self.envelope_exponent) * jnp.sin(freq * d)


# ---------------------------------------------------------------------------
# MACE radial family (mace_utils/modules/radial.py behaviors)
# ---------------------------------------------------------------------------


class MACEBesselBasis(nn.Module):
    """mace radial.py BesselBasis: sqrt(2/c) * sin(n pi d / c) / d."""

    num_basis: int
    r_max: float
    trainable: bool = True

    @nn.compact
    def __call__(self, dist):  # dist [E, 1]
        init = (
            jnp.pi / self.r_max * jnp.arange(1, self.num_basis + 1, dtype=jnp.float32)
        )
        if self.trainable:
            w = self.param("bessel_weights", lambda k: init)
        else:
            w = init
        pref = math.sqrt(2.0 / self.r_max)
        return pref * jnp.sin(w * dist) / dist


class MACEChebychevBasis(nn.Module):
    """mace radial.py ChebychevBasis: T_n(2d/r_max - 1)? (matches reference:
    chebyshev polynomials of the first kind evaluated on scaled distance)."""

    num_basis: int
    r_max: float

    @nn.compact
    def __call__(self, dist):  # [E,1]
        x = jnp.clip(2.0 * dist / self.r_max - 1.0, -1.0, 1.0)
        outs = [jnp.ones_like(x), x]
        for _ in range(2, self.num_basis):
            outs.append(2.0 * x * outs[-1] - outs[-2])
        return jnp.concatenate(outs[: self.num_basis], axis=-1)


def mace_gaussian_basis(dist, num_basis: int, r_max: float):
    """mace radial.py GaussianBasis."""
    offset = jnp.linspace(0.0, r_max, num_basis)
    coeff = -0.5 / (offset[1] - offset[0]) ** 2
    d = dist - offset[None, :]
    return jnp.exp(coeff * d * d)


def polynomial_cutoff(dist, r_max: float, p: int = 5):
    """mace radial.py PolynomialCutoff (Klicpera et al.)."""
    x = dist / r_max
    out = (
        1.0
        - ((p + 1.0) * (p + 2.0) / 2.0) * x**p
        + p * (p + 2.0) * x ** (p + 1)
        - (p * (p + 1.0) / 2.0) * x ** (p + 2)
    )
    return out * (x < 1.0)


def agnesi_transform(dist, q: float = 0.9183, p: float = 4.5791, a: float = 1.0):
    """mace radial.py AgnesiTransform (simplified fixed-parameter form):
    1 / (1 + a * x^q / (1 + x^(q-p)))-style compression of distances."""
    r = dist
    return 1.0 / (1.0 + a * r**q / (1.0 + r ** (q - p)))


def soft_transform(dist, alpha: float = 4.0):
    """mace radial.py SoftTransform."""
    return dist * jax.nn.sigmoid(alpha * (dist - 1.0)) + dist * 0.0
