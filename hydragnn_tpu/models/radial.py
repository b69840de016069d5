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

# Covalent radii in Å indexed by atomic number (Cordero et al. 2008, the
# table ase.data.covalent_radii ships; 0.2 marks unknown, as in ase).
# Used by the Agnesi/Soft distance transforms (radial.py:164-193,212-243).
_COVALENT_RADII = jnp.asarray(
    [0.2, 0.31, 0.28, 1.28, 0.96, 0.84, 0.76, 0.71, 0.66, 0.57, 0.58,
     1.66, 1.41, 1.21, 1.11, 1.07, 1.05, 1.02, 1.06, 2.03, 1.76,
     1.7, 1.6, 1.53, 1.39, 1.39, 1.32, 1.26, 1.24, 1.32, 1.22,
     1.22, 1.2, 1.19, 1.2, 1.2, 1.16, 2.2, 1.95, 1.9, 1.75,
     1.64, 1.54, 1.47, 1.46, 1.42, 1.39, 1.45, 1.44, 1.42, 1.39,
     1.39, 1.38, 1.39, 1.4, 2.44, 2.15, 2.07, 2.04, 2.03, 2.01,
     1.99, 1.98, 1.98, 1.96, 1.94, 1.92, 1.92, 1.89, 1.9, 1.87,
     1.87, 1.75, 1.7, 1.62, 1.51, 1.44, 1.41, 1.36, 1.36, 1.32,
     1.45, 1.46, 1.48, 1.4, 1.5, 1.5, 2.6, 2.21, 2.15, 2.06,
     2.0, 1.96, 1.9, 1.87, 1.8, 1.69, 0.2, 0.2, 0.2, 0.2,
     0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2,
     0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2, 0.2],
    jnp.float32,
)


class MACEBesselBasis(nn.Module):
    """mace radial.py BesselBasis (eq. 7): sqrt(2/c) * sin(n pi d / c) / d.
    Non-trainable by default, as in the reference RadialEmbeddingBlock
    (blocks.py:152 constructs BesselBasis without trainable=True)."""

    num_basis: int
    r_max: float
    trainable: bool = False

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
    """mace radial.py ChebychevBasis: [T_1(x) .. T_num(x)] of the first kind
    on the RAW input (the reference evaluates
    ``torch.special.chebyshev_polynomial_t(x, n)`` for n = 1..num_basis on
    the possibly distance-transformed length, radial.py:65-88) via the
    recurrence T_n = 2x T_{n-1} - T_{n-2}, valid for all x."""

    num_basis: int
    r_max: float

    @nn.compact
    def __call__(self, dist):  # [E,1]
        x = dist
        outs = [x, 2.0 * x * x - 1.0]  # T_1, T_2
        for _ in range(2, self.num_basis):
            outs.append(2.0 * x * outs[-1] - outs[-2])
        return jnp.concatenate(outs[: self.num_basis], axis=-1)


def mace_gaussian_basis(dist, num_basis: int, r_max: float):
    """mace radial.py GaussianBasis: centers linspace(0, r_max, num),
    coeff = -0.5 / (r_max/(num-1))^2."""
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


def agnesi_transform(
    dist,
    z_sender,
    z_receiver,
    q: float = 0.9183,
    p: float = 4.5791,
    a: float = 1.0805,
):
    """mace radial.py AgnesiTransform (:185-196, ACEpotentials.jl JCP 2023):
    (1 + a (x/r0)^q / (1 + (x/r0)^(q-p)))^-1 with r0 = mean covalent radius
    of the edge's atom pair.  dist [E,1], z_* [E] atomic numbers."""
    r0 = 0.5 * (
        _COVALENT_RADII[z_sender] + _COVALENT_RADII[z_receiver]
    )[:, None]
    x = dist / r0
    return 1.0 / (1.0 + a * x**q / (1.0 + x ** (q - p)))


def soft_transform(dist, z_sender, z_receiver, a: float = 0.2, b: float = 3.0):
    """mace radial.py SoftTransform (:225-243):
    y = x + tanh(-(x/r0) - a (x/r0)^b)/2 + 1/2, r0 = (rc_u + rc_v)/4."""
    r0 = (
        (_COVALENT_RADII[z_sender] + _COVALENT_RADII[z_receiver]) / 4.0
    )[:, None]
    x = dist / r0
    return dist + 0.5 * jnp.tanh(-x - a * x**b) + 0.5


class MACERadialEmbedding(nn.Module):
    """mace blocks.py:141-178 RadialEmbeddingBlock: cutoff computed on the
    RAW length; the optional Agnesi/Soft transform only feeds the basis."""

    num_basis: int
    r_max: float
    num_polynomial_cutoff: int = 5
    radial_type: str = "bessel"  # bessel | gaussian | chebyshev
    distance_transform: str = "None"  # None | Agnesi | Soft

    @nn.compact
    def __call__(self, dist, z_sender, z_receiver):  # dist [E,1], z_* [E]
        cutoff = polynomial_cutoff(dist, self.r_max, p=self.num_polynomial_cutoff)
        d = dist
        if self.distance_transform == "Agnesi":
            d = agnesi_transform(dist, z_sender, z_receiver)
        elif self.distance_transform == "Soft":
            d = soft_transform(dist, z_sender, z_receiver)
        elif self.distance_transform not in ("None", "", None):
            raise ValueError(
                f"Unknown distance_transform {self.distance_transform!r}"
            )
        if self.radial_type == "bessel":
            radial = MACEBesselBasis(
                num_basis=self.num_basis, r_max=self.r_max, name="bessel"
            )(d)
        elif self.radial_type == "gaussian":
            radial = mace_gaussian_basis(d, self.num_basis, self.r_max)
        elif self.radial_type == "chebyshev":
            radial = MACEChebychevBasis(
                num_basis=self.num_basis, r_max=self.r_max, name="chebyshev"
            )(d)
        else:
            raise ValueError(f"Unknown radial_type {self.radial_type!r}")
        return radial * cutoff
