"""MACE radial family unit tests: bases, cutoff, and the Agnesi/Soft
distance transforms against independently-computed values (the analogue of
reference tests/test_radial_transforms.py; formulas from
mace_utils/modules/radial.py:23-243)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_mace_bessel_closed_form():
    from hydragnn_tpu.models.radial import MACEBesselBasis

    r_max, nb = 5.0, 6
    m = MACEBesselBasis(num_basis=nb, r_max=r_max)
    d = jnp.asarray([[0.7], [2.3], [4.9]])
    out = m.apply(m.init(jax.random.PRNGKey(0), d), d)
    n = np.arange(1, nb + 1)
    expected = (
        np.sqrt(2.0 / r_max)
        * np.sin(n[None, :] * np.pi / r_max * np.asarray(d))
        / np.asarray(d)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
    # non-trainable by default (reference blocks.py:152)
    assert m.init(jax.random.PRNGKey(0), d).get("params", {}) == {}


def test_chebyshev_recurrence_matches_polynomials():
    from hydragnn_tpu.models.radial import MACEChebychevBasis

    m = MACEChebychevBasis(num_basis=5, r_max=5.0)
    x = np.asarray([[0.3], [0.9], [1.7]], np.float32)  # raw input, incl. >1
    out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), jnp.asarray(x)), jnp.asarray(x)))
    # T_1..T_5 explicitly
    t = np.concatenate(
        [
            x,
            2 * x**2 - 1,
            4 * x**3 - 3 * x,
            8 * x**4 - 8 * x**2 + 1,
            16 * x**5 - 20 * x**3 + 5 * x,
        ],
        axis=1,
    )
    np.testing.assert_allclose(out, t, rtol=1e-4)


def test_gaussian_basis_peaks_at_centers():
    from hydragnn_tpu.models.radial import mace_gaussian_basis

    r_max, nb = 4.0, 9
    centers = np.linspace(0, r_max, nb)
    out = np.asarray(mace_gaussian_basis(jnp.asarray(centers[:, None]), nb, r_max))
    assert np.allclose(np.diag(out), 1.0)
    assert (out <= 1.0 + 1e-6).all()


def test_polynomial_cutoff_boundary_conditions():
    from hydragnn_tpu.models.radial import polynomial_cutoff

    r_max = 3.0
    f = lambda d: polynomial_cutoff(jnp.asarray(d), r_max, p=5)
    assert float(f(0.0)) == pytest.approx(1.0)
    assert float(f(r_max)) == pytest.approx(0.0, abs=1e-6)
    assert float(f(r_max + 0.5)) == 0.0
    # smooth approach to zero: derivative also ~0 at r_max
    g = jax.grad(lambda d: polynomial_cutoff(d, r_max, p=5))
    assert abs(float(g(jnp.asarray(r_max - 1e-4)))) < 1e-2


def test_agnesi_transform_formula():
    from hydragnn_tpu.models.radial import _COVALENT_RADII, agnesi_transform

    q, p, a = 0.9183, 4.5791, 1.0805
    d = np.asarray([[0.8], [1.6], [3.0]], np.float32)
    zs = np.asarray([6, 8, 1])
    zr = np.asarray([6, 1, 8])
    out = np.asarray(agnesi_transform(jnp.asarray(d), jnp.asarray(zs), jnp.asarray(zr)))
    rc = np.asarray(_COVALENT_RADII)
    r0 = 0.5 * (rc[zs] + rc[zr])[:, None]
    x = d / r0
    expected = 1.0 / (1.0 + a * x**q / (1.0 + x ** (q - p)))
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    # compresses into (0, 1), monotone decreasing in distance for fixed pair
    dd = np.linspace(0.2, 5.0, 50, dtype=np.float32)[:, None]
    z6 = np.full((50,), 6)
    y = np.asarray(agnesi_transform(jnp.asarray(dd), jnp.asarray(z6), jnp.asarray(z6)))
    assert ((y > 0) & (y < 1)).all()
    assert (np.diff(y[:, 0]) < 0).all()


def test_soft_transform_formula_and_asymptotics():
    from hydragnn_tpu.models.radial import _COVALENT_RADII, soft_transform

    a, b = 0.2, 3.0
    d = np.asarray([[0.5], [1.2], [4.0]], np.float32)
    zs = np.asarray([6, 6, 6])
    out = np.asarray(soft_transform(jnp.asarray(d), jnp.asarray(zs), jnp.asarray(zs)))
    rc = np.asarray(_COVALENT_RADII)
    r0 = ((rc[zs] + rc[zs]) / 4.0)[:, None]
    x = d / r0
    expected = d + 0.5 * np.tanh(-x - a * x**b) + 0.5
    np.testing.assert_allclose(out, expected, rtol=1e-5)
    # large distance: y -> d (tanh saturates at -1)
    big = np.asarray([[8.0]], np.float32)
    y = float(
        np.asarray(
            soft_transform(jnp.asarray(big), jnp.asarray([6]), jnp.asarray([6]))
        ).item()
    )
    assert abs(y - 8.0) < 1e-3


@pytest.mark.parametrize("radial_type", ["bessel", "gaussian", "chebyshev"])
@pytest.mark.parametrize("transform", ["None", "Agnesi", "Soft"])
def test_radial_embedding_combinations(radial_type, transform):
    from hydragnn_tpu.models.radial import MACERadialEmbedding

    m = MACERadialEmbedding(
        num_basis=5, r_max=4.0, radial_type=radial_type,
        distance_transform=transform,
    )
    d = jnp.asarray(np.random.default_rng(0).uniform(0.5, 3.9, (7, 1)), jnp.float32)
    z = jnp.asarray(np.random.default_rng(1).integers(1, 30, (7,)))
    out = m.apply(m.init(jax.random.PRNGKey(0), d, z, z), d, z, z)
    assert out.shape == (7, 5)
    assert np.isfinite(np.asarray(out)).all()
    # cutoff still applies on the raw length
    far = jnp.asarray([[4.5]])
    zf = jnp.asarray([6])
    out_far = m.apply(m.init(jax.random.PRNGKey(0), far, zf, zf), far, zf, zf)
    np.testing.assert_allclose(np.asarray(out_far), 0.0, atol=1e-6)


def test_spherical_basis_formula_properties():
    """DimeNet SBF (models/spherical.py) against closed forms: j_0 zeros are
    n*pi; the l=0 radial part equals N * env * sin(z d)/(z d) * Y_00; the
    angular factor is sqrt((2l+1)/4pi) P_l(cos a) (P_1 = cos, P_2 =
    (3cos^2-1)/2)."""
    import math

    from hydragnn_tpu.models.radial import polynomial_envelope
    from hydragnn_tpu.models.spherical import (
        bessel_normalizers,
        bessel_zeros,
        spherical_basis,
    )

    L, K = 3, 4
    z = bessel_zeros(L, K)
    np.testing.assert_allclose(z[0], np.arange(1, K + 1) * np.pi, rtol=1e-10)
    # zeros really are roots and interlace
    from hydragnn_tpu.models.spherical import _sph_jn_np

    for l in range(L):
        vals = _sph_jn_np(l, z[l])[l]
        assert np.abs(vals).max() < 1e-8
        if l:
            assert np.all(z[l - 1, : K - 1] < z[l, : K - 1])

    d = np.asarray([0.3, 0.55, 0.9], np.float64)
    angle = np.asarray([0.2, 1.1, 2.4], np.float64)
    kj = np.asarray([0, 1, 2])
    sbf = np.asarray(
        spherical_basis(jnp.asarray(d), jnp.asarray(angle), jnp.asarray(kj), L, K)
    )
    assert sbf.shape == (3, L * K)

    norm = bessel_normalizers(L, K)
    env = np.asarray(polynomial_envelope(jnp.asarray(d), 5))
    y00 = math.sqrt(1.0 / (4 * math.pi))
    for n in range(K):
        expect = norm[0, n] * np.sin(z[0, n] * d) / (z[0, n] * d) * env * y00
        np.testing.assert_allclose(sbf[:, n], expect, rtol=1e-5, atol=1e-7)
    # angular ratios for fixed n: l=1 vs l=0 column
    c = np.cos(angle)
    ratio = sbf[:, K] / (norm[1, 0] * np.asarray(
        _sph_jn_np(1, z[1, 0] * d)[1]
    ) * env)
    np.testing.assert_allclose(
        ratio, math.sqrt(3.0 / (4 * math.pi)) * c, rtol=1e-5, atol=1e-7
    )
