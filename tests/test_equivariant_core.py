"""Property tests for the irreps/CG substrate (equivariant/core.py — the
e3nn replacement): SH rotation equivariance through numerically-derived
Wigner matrices, CG invariance (the defining intertwiner property), and
closed-form SH values."""

import numpy as np
import pytest

import jax.numpy as jnp

from hydragnn_tpu.equivariant.core import (
    _np_sh,
    clebsch_gordan,
    real_spherical_harmonics,
)


def _wigner_from_sh(l, R, rng):
    """Recover D^l(R) from SH samples: Y_l(Rv) = D^l Y_l(v) solved by
    least squares over random directions (independent of the library's
    internal Wigner construction)."""
    v = rng.normal(size=(64, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = _np_sh(v, l)[l]          # [64, 2l+1]
    Yr = _np_sh(v @ R.T, l)[l]   # [64, 2l+1]
    D, *_ = np.linalg.lstsq(Y, Yr, rcond=None)
    return D.T  # Y_l(Rv)^T = Y^T D^T -> D

def test_sh_l1_is_coordinate_vector_up_to_scale():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(10, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    sh = np.asarray(real_spherical_harmonics(jnp.asarray(v), 1)[1])
    # l=1 real SH spans (x, y, z) up to a fixed permutation/scale: each
    # column must be proportional to one coordinate
    corr = np.abs(sh.T @ v) / (
        np.linalg.norm(sh, axis=0)[:, None] * np.linalg.norm(v, axis=0)[None]
    )
    # every SH column perfectly correlates with exactly one coordinate
    assert np.allclose(np.sort(corr.max(axis=1)), 1.0, atol=1e-6)


@pytest.mark.parametrize("l", [1, 2, 3])
def test_sh_rotation_equivariance_orthogonal_wigner(l):
    """Y_l(Rv) = D^l(R) Y_l(v) with D^l ORTHOGONAL (real irrep): recovered
    D from data must satisfy D D^T = I and reproduce held-out samples."""
    rng = np.random.default_rng(l)
    # random rotation
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    D = _wigner_from_sh(l, Q, rng)
    np.testing.assert_allclose(D @ D.T, np.eye(2 * l + 1), atol=1e-5)
    v = rng.normal(size=(16, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    np.testing.assert_allclose(
        _np_sh(v @ Q.T, l)[l], _np_sh(v, l)[l] @ D.T, rtol=0, atol=1e-5
    )


@pytest.mark.parametrize("l1,l2,l3", [(1, 1, 0), (1, 1, 2), (2, 1, 1), (2, 2, 2)])
def test_cg_intertwiner_property(l1, l2, l3):
    """C is an intertwiner: C_ijk D1_ii' D2_jj' = D3_kk' C_i'j'k' for the
    Wigner matrices of ANY rotation — the defining property that makes the
    tensor product equivariant, checked against independently-recovered
    Wigner matrices."""
    rng = np.random.default_rng(l1 * 9 + l2 * 3 + l3)
    C = clebsch_gordan(l1, l2, l3)
    assert np.abs(C).max() > 0  # path is non-trivial
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    D1 = _wigner_from_sh(l1, Q, rng)
    D2 = _wigner_from_sh(l2, Q, rng)
    D3 = _wigner_from_sh(l3, Q, rng)
    lhs = np.einsum("ijk,ia,jb->abk", C, D1, D2)
    rhs = np.einsum("abc,kc->abk", C, D3)
    np.testing.assert_allclose(lhs, rhs, rtol=0, atol=1e-5)
