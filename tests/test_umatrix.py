"""U-matrix symmetric contraction: intertwiner properties, path counts,
equivariance of the full module, and a direct-numpy golden pin.

Pins the numerically self-derived replacement for the reference's
``symmetric_contraction.py:29-239`` + ``tools/cg.py:94`` (U_matrix_real).
"""

import numpy as np
import pytest

from hydragnn_tpu.equivariant.core import _wigner_cache
from hydragnn_tpu.equivariant.umatrix import (
    SymmetricContractionU,
    u_matrix,
    u_matrix_num_paths,
)


def _block_diag_D(ls, D_per_l):
    d = sum(2 * l + 1 for l in ls)
    out = np.zeros((d, d))
    off = 0
    for l in ls:
        out[off : off + 2 * l + 1, off : off + 2 * l + 1] = D_per_l[l]
        off += 2 * l + 1
    return out


def test_u_matrix_path_counts():
    """Known path counts for the MACE coupling irreps.  (0..3, nu=3, L=0)
    = 23 is the published e3nn U-matrix size for lmax=3/correlation=3."""
    assert u_matrix_num_paths((0, 1), 0, 1) == 1
    assert u_matrix_num_paths((0, 1), 0, 2) == 2  # 0x0, 1x1
    assert u_matrix_num_paths((0, 1), 1, 2) == 2  # 0x1, 1x0 (1x1->1e filtered)
    assert u_matrix_num_paths((0, 1, 2, 3), 0, 3) == 23
    # natural parity filter: target (L, (-1)^L) only
    U = u_matrix((0, 1), 1, 2)
    assert U.shape == (3, 4, 4, 2)


def test_u_matrix_intertwiner_property():
    """U contracted with the block-diagonal Wigner-D on every feature axis
    equals D_L applied on the output axis — the defining equivariance of a
    generalized CG tensor, for several (coupling, L, nu) combos."""
    for ls, L, nu in [((0, 1), 1, 2), ((0, 1), 0, 3), ((0, 1, 2), 2, 2),
                      ((0, 1), 1, 3)]:
        U = u_matrix(ls, L, nu)
        assert U is not None
        if L == 0:
            U_full = U[None]  # add the kappa axis
        else:
            U_full = U
        rots, Ds = _wigner_cache(max(max(ls), L, 2 * max(ls)))
        for r in range(2):
            D_per_l = {l: Ds[r][l] for l in range(len(Ds[r]))}
            Dblk = _block_diag_D(ls, D_per_l)
            DL = D_per_l[L]
            rotated = U_full
            # contract each feature axis k (1..nu) with Dblk
            for ax in range(1, nu + 1):
                rotated = np.moveaxis(
                    np.tensordot(Dblk.T, np.moveaxis(rotated, ax, 0), axes=1),
                    0, ax,
                )
            expect = np.einsum("kl,l...->k...", DL, U_full)
            assert np.allclose(rotated, expect, atol=1e-6), (ls, L, nu, r)


def test_u_matrix_component_normalization():
    """Each single path tensor carries the component normalization: the
    squared Frobenius norm of a nu=2 path is (2*l_out+1) (unit-norm CG
    times sqrt(2l3+1), embedded into disjoint slices)."""
    U = u_matrix((0, 1), 1, 2)  # paths 0x1 and 1x0
    for p in range(U.shape[-1]):
        n2 = (U[..., p] ** 2).sum()
        assert abs(n2 - 3.0) < 1e-8


def test_symmetric_contraction_module_golden():
    """Module output == direct numpy Horner evaluation with the same
    weights (the golden pin guarding any future kernelization)."""
    import jax

    rng = np.random.default_rng(3)
    N, mul, corr = 5, 4, 3
    ls = (0, 1)
    a = {
        0: rng.normal(size=(N, mul, 1)).astype(np.float32),
        1: rng.normal(size=(N, mul, 3)).astype(np.float32),
    }
    z = np.zeros((N, 7), np.float32)
    z[np.arange(N), rng.integers(0, 7, N)] = 1.0

    mod = SymmetricContractionU(
        irreps=((mul, 0), (mul, 1)), correlation=corr, num_elements=7
    )
    params = mod.init(
        jax.random.PRNGKey(0), {k: np.asarray(v) for k, v in a.items()}, z
    )
    out = mod.apply(params, {k: np.asarray(v) for k, v in a.items()}, z)

    x = np.concatenate([a[0], a[1]], axis=-1)  # [N, mul, 4]
    d = x.shape[-1]
    for L in (0, 1):
        # direct sum-form evaluation: out = sum_nu U_nu W_nu(z) . x^{x nu}
        # (the module evaluates the same sum in nested Horner form)
        expect = 0.0
        for nu in range(1, corr + 1):
            U = u_matrix(ls, L, nu)
            if U is None:
                continue
            w = np.asarray(params["params"][f"w_l{L}_nu{nu}"])
            Wy = np.einsum("be,epc->bpc", z, w)
            Uf = (U[None] if L == 0 else U).reshape(2 * L + 1, d**nu, -1)
            # x^{x nu} flattened with i1 as the leading factor (matching
            # U's feature-axis order)
            xp = np.ones((N, mul, 1), np.float64)
            for _ in range(nu):
                xp = np.einsum("bcx,bci->bcxi", xp, x).reshape(N, mul, -1)
            expect = expect + np.einsum("kxp,bcx,bpc->bck", Uf, xp, Wy)
        got = np.asarray(out[L])
        assert np.allclose(got, expect, atol=1e-4), (L, np.abs(got - expect).max())


def test_symmetric_contraction_equivariance():
    """Full-module equivariance: rotating the input irreps rotates the
    output irreps (correlation 3, coupling 0+1)."""
    import jax

    rng = np.random.default_rng(5)
    N, mul = 6, 3
    a = {
        0: rng.normal(size=(N, mul, 1)).astype(np.float32),
        1: rng.normal(size=(N, mul, 3)).astype(np.float32),
    }
    z = np.zeros((N, 4), np.float32)
    z[np.arange(N), rng.integers(0, 4, N)] = 1.0
    mod = SymmetricContractionU(
        irreps=((mul, 0), (mul, 1)), correlation=3, num_elements=4
    )
    params = mod.init(jax.random.PRNGKey(1), a, z)
    out = mod.apply(params, a, z)

    rots, Ds = _wigner_cache(2)
    D1 = Ds[0][1]
    a_rot = {0: a[0], 1: np.einsum("kl,ncl->nck", D1, a[1]).astype(np.float32)}
    out_rot = mod.apply(params, a_rot, z)
    assert np.allclose(np.asarray(out_rot[0]), np.asarray(out[0]), atol=1e-4)
    expect1 = np.einsum("kl,ncl->nck", D1, np.asarray(out[1]))
    assert np.allclose(np.asarray(out_rot[1]), expect1, atol=1e-4)


def test_mace_stack_umatrix_vs_cg_both_run():
    """Both product_basis modes build and run through the MACE stack; the
    umatrix default trains (loss finite)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hydragnn_tpu.data.batching import PaddedBatcher, compute_batch_dims
    from hydragnn_tpu.data.lennard_jones import lennard_jones_data
    from hydragnn_tpu.models.base import StackConfig, normalize_branches
    from hydragnn_tpu.models.create import create_model

    samples = lennard_jones_data(4, seed=7)
    dims = compute_batch_dims(samples, 2)
    batch = next(iter(PaddedBatcher(samples, 2, dims=dims)))
    cfg = StackConfig(
        input_dim=1,
        hidden_dim=8,
        output_dim=(1,),
        output_type=("node",),
        node_branches=normalize_branches(
            {"num_headlayers": 2, "dim_headlayers": [8, 8], "type": "mlp"}
        ),
        task_weights=(1.0,),
        num_conv_layers=2,
        radius=3.0,
        equivariance=True,
        max_ell=2,
        node_max_ell=1,
        correlation=(2,),
        avg_num_neighbors=8.0,
    )
    for basis in ("umatrix", "cg"):
        c = dataclasses.replace(cfg, product_basis=basis)
        model = create_model("MACE", c)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        for o in out:
            assert bool(jnp.all(jnp.isfinite(o)))


def test_weighted_tp_mmajor_matches_module():
    """The m-major scalar-unrolled TP (the TPU-shaped path MACELayer uses)
    is numerically identical to the golden-pinned WeightedTPConv module."""
    import jax
    import jax.numpy as jnp

    from hydragnn_tpu.models.mace import (
        WeightedTPConv,
        flatten_mmajor,
        unflatten_mmajor,
        weighted_tp_mmajor,
    )

    rng = np.random.default_rng(11)
    E, mul, max_sh, max_out = 17, 4, 2, 1
    irreps_in = ((mul, 0), (mul, 1))
    x = {
        0: jnp.asarray(rng.normal(size=(E, mul, 1)), jnp.float32),
        1: jnp.asarray(rng.normal(size=(E, mul, 3)), jnp.float32),
    }
    sh = {
        l: jnp.asarray(rng.normal(size=(E, 2 * l + 1)), jnp.float32)
        for l in range(max_sh + 1)
    }
    tp = WeightedTPConv(irreps_in=irreps_in, max_l_sh=max_sh, max_l_out=max_out)
    n_paths = len(tp.paths())
    w = jnp.asarray(rng.normal(size=(E, n_paths, mul)), jnp.float32)

    ref = tp.apply({}, x, sh, w)

    x_m = flatten_mmajor(x, [0, 1])
    sh_flat = jnp.concatenate([sh[l] for l in range(max_sh + 1)], axis=-1)
    w_flat = w.reshape(E, n_paths * mul)
    out_m, out_ls = weighted_tp_mmajor(
        x_m, sh_flat, w_flat, irreps_in, max_sh, max_out, mul
    )
    got = unflatten_mmajor(out_m, out_ls, mul)
    assert sorted(got) == sorted(ref)
    for l in ref:
        assert np.allclose(
            np.asarray(got[l]), np.asarray(ref[l]), atol=1e-5
        ), l
