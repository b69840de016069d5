"""Cross-convention pin for the CG / U-matrix derivations (VERDICT r03
item 9): an INDEPENDENT derivation — analytic Racah complex CG pushed
into the standard (e3nn-family, Condon-Shortley) real-SH basis — must
agree with this library's numeric SVD derivation after the explicit
documented basis change, per path up to sign and exactly as a span.

Reference anchors: e3nn ``o3.wigner_3j`` as consumed by
``hydragnn/utils/model/mace_utils/modules/symmetric_contraction.py:29-140``
and ``tools/cg.py:94``.  The committed fixture
(``tests/fixtures/umatrix_standard_convention.npz``) freezes the
standard-convention U values for (ls=(0,1), nu=2, L in {0,1}) plus the
basis-change maps R_0, R_1, so "agrees with e3nn up to documented basis
change" is a tested statement against frozen bytes, not a live
co-derivation.
"""

import os

import numpy as np
import pytest

from hydragnn_tpu.equivariant.core import clebsch_gordan
from hydragnn_tpu.equivariant.crossbasis import (
    basis_change,
    standard_real_cg,
    u_matrix_standard,
)
from hydragnn_tpu.equivariant.umatrix import u_matrix

_FIX = os.path.join(
    os.path.dirname(__file__), "fixtures", "umatrix_standard_convention.npz"
)


def _blockdiag(mats):
    d = sum(m.shape[0] for m in mats)
    out = np.zeros((d, d))
    off = 0
    for m in mats:
        k = m.shape[0]
        out[off : off + k, off : off + k] = m
        off += k
    return out


@pytest.mark.parametrize(
    "lll", [(1, 1, 2), (1, 1, 0), (2, 1, 1), (2, 2, 2), (1, 2, 3)]
)
def test_cg_conventions_agree_up_to_basis_change(lll):
    """R_l-transformed standard-basis analytic CG == this library's
    numeric CG up to the one-sign ambiguity of a normalized intertwiner."""
    l1, l2, l3 = lll
    Cs = standard_real_cg(l1, l2, l3)
    Ct = np.einsum(
        "am,bn,cp,mnp->abc",
        basis_change(l1), basis_change(l2), basis_change(l3), Cs,
    )
    Cm = clebsch_gordan(l1, l2, l3)
    d = min(np.abs(Ct - Cm).max(), np.abs(Ct + Cm).max())
    assert d < 1e-6, (lll, d)


def test_standard_cg_is_exact_racah():
    """The analytic route is self-consistent: unit Frobenius norm and the
    known closed-form 1x1->0 values (+-1/sqrt(3) on the trace pattern)."""
    C = standard_real_cg(1, 1, 0)
    assert abs(np.linalg.norm(C) - 1.0) < 1e-12
    # 1 (x) 1 -> 0 is the rotation-invariant dot product: diagonal in any
    # orthonormal real basis
    diag = np.einsum("aab->b", C)
    assert abs(abs(diag[0]) - 3.0 / np.sqrt(3.0)) < 1e-10


def _span_projector(U):
    """Orthogonal projector onto span{path tensors} (flattened)."""
    F = U.reshape(-1, U.shape[-1])
    q, _ = np.linalg.qr(F)
    return q @ q.T


def test_umatrix_agrees_with_standard_convention_fixture():
    """U-matrix vs the committed standard-convention fixture: transform
    every feature axis by blockdiag(R_0, R_1) and the output axis by R_L;
    then path k matches path k up to sign, and the intertwiner SPANS are
    identical (the convention-free statement)."""
    fix = np.load(_FIX)
    R = _blockdiag([fix["R0"], fix["R1"]])
    for L in (0, 1):
        U_std = fix[f"U_std_ls01_nu2_L{L}"]
        U_this = u_matrix((0, 1), L, 2)
        # transform the standard fixture into this library's basis
        U_t = np.einsum("ax,by,xyp->abp", R, R, U_std) if L == 0 else (
            np.einsum("kl,ax,by,lxyp->kabp", fix["R1"], R, R, U_std)
        )
        assert U_t.shape == U_this.shape
        for p in range(U_t.shape[-1]):
            a, b = U_t[..., p], U_this[..., p]
            d = min(np.abs(a - b).max(), np.abs(a + b).max())
            assert d < 1e-6, (L, p, d)
        # span equality (sign/mixing free)
        P1, P2 = _span_projector(U_t), _span_projector(U_this)
        assert np.abs(P1 - P2).max() < 1e-6


def test_fixture_matches_live_standard_derivation():
    """The frozen fixture equals a live re-derivation (guards the
    committed bytes against drift in the analytic route)."""
    fix = np.load(_FIX)
    for L in (0, 1):
        live = u_matrix_standard((0, 1), L, 2)
        np.testing.assert_allclose(
            live, fix[f"U_std_ls01_nu2_L{L}"], atol=1e-9
        )
    np.testing.assert_allclose(basis_change(1), fix["R1"], atol=1e-6)


def test_full_mace_layer_cross_convention():
    """VERDICT r04 missing #1: a FULL-LAYER MACE parity anchor.  One
    complete interaction + product-basis layer — random radial path
    weights -> uvu weighted TP -> scatter-sum -> U-matrix symmetric
    contraction with random per-element weights — evaluated twice:

      * with this library's modules (WeightedTPConv +
        SymmetricContractionU) on inputs in THIS basis;
      * with a fully independent numpy implementation in the STANDARD
        (e3nn-family) convention: analytic Racah CG
        (crossbasis.standard_real_cg), standard-convention U tensors
        (crossbasis.u_matrix_standard), inputs mapped through the
        documented basis change R_l, per-path sign alignment absorbed
        into the path weights (the one-dimensional-intertwiner sign
        freedom).

    Outputs must agree after mapping back: out_this[L] == R_L @ out_std[L].
    Reference semantics: interaction blocks.py:372-404 + product basis
    symmetric_contraction.py:29-140.
    """
    import jax
    import jax.numpy as jnp

    from hydragnn_tpu.equivariant.core import (
        real_spherical_harmonics,
        tp_instructions,
    )
    from hydragnn_tpu.models.mace import WeightedTPConv
    from hydragnn_tpu.equivariant.umatrix import SymmetricContractionU

    rng = np.random.default_rng(7)
    mul, N, E, nel = 3, 14, 40, 2
    irreps = ((mul, 0), (mul, 1))
    lsh, lout, corr = 2, 1, 2
    snd = rng.integers(0, N, E)
    rcv = rng.integers(0, N, E)
    x = {
        0: rng.normal(size=(N, mul, 1)),
        1: rng.normal(size=(N, mul, 3)),
    }
    vec = rng.normal(size=(E, 3))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    sh = real_spherical_harmonics(jnp.asarray(vec, jnp.float32), lsh)
    sh = {l: np.asarray(v, np.float64) for l, v in sh.items()}
    paths = tp_instructions(irreps, lsh, lout)
    P = len(paths)
    w = rng.normal(size=(E, P, mul))
    z = rng.integers(0, nel, N)
    attrs = np.eye(nel)[z]

    # ---------------- this library's layer ----------------
    conv = WeightedTPConv(irreps_in=irreps, max_l_sh=lsh, max_l_out=lout)
    x_e = {l: jnp.asarray(x[l][snd], jnp.float32) for l in x}
    sh_j = {l: jnp.asarray(v, jnp.float32) for l, v in sh.items()}
    m_e = conv.apply({}, x_e, sh_j, jnp.asarray(w, jnp.float32))
    msg = {
        l: np.zeros((N, mul, 2 * l + 1)) for l in m_e
    }
    for l in m_e:
        np.add.at(msg[l], rcv, np.asarray(m_e[l], np.float64))
    prod_mod = SymmetricContractionU(
        irreps=irreps, correlation=corr, num_elements=nel
    )
    msg_j = {l: jnp.asarray(v, jnp.float32) for l, v in msg.items()}
    params = prod_mod.init(jax.random.PRNGKey(3), msg_j, jnp.asarray(attrs, jnp.float32))
    out_this = prod_mod.apply(params, msg_j, jnp.asarray(attrs, jnp.float32))
    out_this = {l: np.asarray(v, np.float64) for l, v in out_this.items()}

    # ---------------- independent standard-convention layer ----------------
    from hydragnn_tpu.equivariant.crossbasis import (
        basis_change,
        standard_real_cg,
        u_matrix_standard,
    )
    from hydragnn_tpu.equivariant.umatrix import u_matrix

    R = {l: basis_change(l) for l in range(lsh + 1)}
    x_std = {l: np.einsum("ij,nuj->nui", R[l].T, x[l]) for l in x}
    sh_std = {l: sh[l] @ R[l] for l in sh}  # (R^T sh^T)^T

    # per-path sign: C_this == s_p * (R1 x R2 x R3) C_std
    counts = {}
    for _, _, l3 in paths:
        counts[l3] = counts.get(l3, 0) + 1
    msg_std = {l: np.zeros((N, mul, 2 * l + 1)) for l in counts}
    for p, (l1, l2, l3) in enumerate(paths):
        Cs = standard_real_cg(l1, l2, l3)
        Ct = np.einsum("am,bn,cp,mnp->abc", R[l1], R[l2], R[l3], Cs)
        Cm = clebsch_gordan(l1, l2, l3)
        dpos = np.abs(Ct - Cm).max()
        dneg = np.abs(Ct + Cm).max()
        assert min(dpos, dneg) < 1e-5, (p, l1, l2, l3)
        s_p = 1.0 if dpos < dneg else -1.0
        term = np.einsum(
            "eui,ej,ijk,eu->euk",
            x_std[l1][snd], sh_std[l2], Cs, s_p * w[:, p, :],
        ) / np.sqrt(counts[l3])
        np.add.at(msg_std[l3], rcv, term)

    # message correspondence: msg_this == R_l msg_std
    for l in msg:
        d = np.abs(msg[l] - np.einsum("ij,nuj->nui", R[l], msg_std[l])).max()
        assert d < 1e-4, ("msg", l, d)

    # symmetric contraction, standard convention
    Rbd = _blockdiag([R[0], R[1]])
    A_std = np.concatenate([msg_std[0], msg_std[1]], axis=-1)  # [N, mul, d]
    pdict = params["params"]
    out_std = {}
    for L in (0, 1):
        acc = np.zeros((N, mul, 2 * L + 1))
        for nu in (1, 2):
            U_std = u_matrix_standard((0, 1), L, nu)
            U_this = u_matrix((0, 1), L, nu)
            if U_std is None:
                continue
            # lift L=0 (squeezed) to a leading singleton axis
            Us = U_std if L > 0 else U_std[None]
            Ut_this = U_this if L > 0 else U_this[None]
            # transform std -> this basis; sign per path
            maps = [R[L]] + [Rbd] * nu
            letters = "kab"[: nu + 1]
            spec = (
                ",".join(f"{c}{c.upper()}" for c in letters)
                + f",{''.join(c.upper() for c in letters)}p->{letters}p"
            )
            Ut = np.einsum(spec, *maps, Us)
            signs = []
            for p in range(Us.shape[-1]):
                a, b = Ut[..., p], Ut_this[..., p]
                dpos = np.abs(a - b).max()
                dneg = np.abs(a + b).max()
                assert min(dpos, dneg) < 1e-5, ("U", L, nu, p)
                signs.append(1.0 if dpos < dneg else -1.0)
            warr = np.asarray(pdict[f"w_l{L}_nu{nu}"], np.float64)
            Wy = np.einsum("ne,epc->npc", attrs, warr) * np.asarray(signs)[
                None, :, None
            ]
            if nu == 1:
                acc += np.einsum("kap,npc,nca->nck", Us, Wy, A_std)
            else:
                acc += np.einsum(
                    "kabp,npc,nca,ncb->nck", Us, Wy, A_std, A_std
                )
        out_std[L] = acc if L > 0 else acc[:, :, :1]

    for L in (0, 1):
        ref = np.einsum("ij,nuj->nui", R[L], out_std[L])
        scale = np.abs(ref).max() + 1e-9
        d = np.abs(out_this[L] - ref).max() / scale
        assert d < 1e-3, ("layer out", L, d)
