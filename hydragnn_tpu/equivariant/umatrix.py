"""U-matrix symmetric contraction: the MACE product basis evaluated
against numerically self-derived generalized Clebsch-Gordan (U) tensors.

Re-derivation of the reference's product-basis algorithm
(``hydragnn/utils/model/mace_utils/modules/symmetric_contraction.py:29-239``
and ``tools/cg.py:94`` / ``_wigner_nj``) — the ACE/MACE symmetric
contraction of Batatia et al. (arXiv:2206.07697, Eqs. 10-11):

    B^{(L)}_c = sum_nu  U^{(nu,L)}_{kappa, i1..inu, p}  W^{(nu)}_{z p c}
                        A_{c i1} ... A_{c inu}

where A = [N, channels, d] are the node features over the coupling irreps
(one copy of each l, d = sum(2l+1)), W are learned per-element weights and
U_nu is a basis of intertwiners (coupling)^{x nu} -> irrep L built by
iterated coupling.

Derivation here is numeric and self-contained (no e3nn): each coupling
step contracts with this library's own numerically-derived real CG tensors
(``equivariant/core.py:clebsch_gordan``) scaled by sqrt(2*l_out+1) — the
e3nn 'component' normalization — with intermediate-irrep enumeration,
parity bookkeeping and stable (l, parity)-sorted path ordering mirroring
the reference algorithm's semantics.  Coefficient values therefore agree
with e3nn up to the documented basis-convention divergence (core.py
docstring); the intertwiner property, path structure and normalization are
exact and property-tested.

Evaluation mirrors the reference's Horner-style nesting
(``Contraction.forward``): start at nu = correlation and repeatedly
(a) add the weighted U of the next-lower nu, (b) contract one feature
index — so A^{x nu} is never materialized.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hydragnn_tpu.equivariant.core import (
    Irreps,
    IrrepsArray,
    clebsch_gordan,
)


@lru_cache(maxsize=None)
def u_matrix(
    coupling_ls: Tuple[int, ...],  # one copy of each l (natural parity)
    target_l: int,
    nu: int,
) -> Optional[np.ndarray]:
    from hydragnn_tpu.equivariant.core import disk_cached

    key = "u_" + "-".join(map(str, coupling_ls)) + f"_{target_l}_{nu}"
    return disk_cached(
        key, lambda: _u_matrix_derive(coupling_ls, target_l, nu)
    )


def _u_matrix_derive(
    coupling_ls: Tuple[int, ...],
    target_l: int,
    nu: int,
) -> Optional[np.ndarray]:
    """Stacked intertwiner basis U[(2L+1,) d, ..., d, P] for
    (coupling)^{x nu} -> (target_l, natural parity); None if no path.

    The leading axis is dropped for L=0 (reference ``base_o3.squeeze()``).
    For nu == 4 intermediate irreps are filtered to alternating parities
    (0e,1o,2e,...) exactly like the reference's ``filter_ir_mid``
    (cg.py:filter for correlation==4) — without it the path count explodes.
    """
    d = sum(2 * l + 1 for l in coupling_ls)
    filter_mid = nu == 4

    # level 1: identity paths, one per coupling irrep
    paths: List[Tuple[int, int, np.ndarray]] = []  # (l, parity, C[2l+1, d^level])
    eye = np.eye(d)
    off = 0
    for l in coupling_ls:
        paths.append((l, (-1) ** l, eye[off : off + 2 * l + 1].copy()))
        off += 2 * l + 1

    lmax = max(coupling_ls)
    for _level in range(2, nu + 1):
        # reachability bound: after this level there are (nu - level) more
        # couplings, each moving l by at most lmax (triangle rule), so any
        # intermediate with l > target + (nu - level) * lmax can never
        # reach target_l and its (expensive, high-l CG) path is dead --
        # pruning it is EXACT (same kept paths, same order) and removes
        # the giant-SVD clebsch_gordan calls that made derivation slow
        l_cap = target_l + (nu - _level) * lmax
        # stable sort by (l, parity): the reference sorts each recursion
        # level's output by irrep before coupling the next copy
        paths.sort(key=lambda t: (t[0], t[1]))
        new: List[Tuple[int, int, np.ndarray]] = []
        for ll, pl, CL in paths:
            left_flat = CL.reshape(2 * ll + 1, -1)  # [2ll+1, d^(level-1)]
            off = 0
            for l in coupling_ls:
                p = (-1) ** l
                for lo in range(abs(ll - l), min(ll + l, l_cap) + 1):
                    po = pl * p
                    if filter_mid and po != (-1) ** lo:
                        off_unused = None  # noqa: F841 (clarity)
                        continue
                    # component-normalized coupling tensor, out index first:
                    # C3[k, m, j] = CG(ll, l -> lo)[m, j, k] * sqrt(2lo+1)
                    C3 = clebsch_gordan(ll, l, lo).transpose(2, 0, 1) * math.sqrt(
                        2 * lo + 1
                    )
                    C = np.einsum("kmj,mx->kxj", C3, left_flat)
                    # embed the new factor's index j into the full d axis
                    E = np.zeros(C.shape[:2] + (d,))
                    E[:, :, off : off + 2 * l + 1] = C
                    new.append((lo, po, E.reshape(2 * lo + 1, -1)))
                off += 2 * l + 1
        paths = new

    paths.sort(key=lambda t: (t[0], t[1]))
    target_p = (-1) ** target_l
    keep = [C for l, p, C in paths if l == target_l and p == target_p]
    if not keep:
        return None
    U = np.stack(
        [C.reshape((2 * target_l + 1,) + (d,) * nu) for C in keep], axis=-1
    )
    if target_l == 0:
        U = U[0]
    return U


def u_matrix_num_paths(
    coupling_ls: Tuple[int, ...], target_l: int, nu: int
) -> int:
    U = u_matrix(coupling_ls, target_l, nu)
    return 0 if U is None else U.shape[-1]


class SymmetricContractionU(nn.Module):
    """MACE product basis via U-matrix contraction (reference
    ``SymmetricContraction``): per target irrep L, Horner evaluation

        out = ((U_nu W_nu y) . A + U_{nu-1} W_{nu-1} y) . A + ... ) . A

    Input: ``a`` = {l: [N, mul, 2l+1]} over the coupling irreps;
    ``node_attrs`` one-hot elements [N, num_elements].
    Output: {L: [N, mul, 2L+1]} over ``irreps`` (same mul).
    """

    irreps: Irreps  # target irreps (uniform mul)
    correlation: int
    num_elements: int

    @nn.compact
    def __call__(self, a: IrrepsArray, node_attrs: jnp.ndarray) -> IrrepsArray:
        ls = tuple(sorted(a.keys()))
        mul = a[ls[0]].shape[1]
        dtype = a[ls[0]].dtype
        # channel-major features over the flat coupling dim: [N, mul, d]
        x = jnp.concatenate([a[l] for l in ls], axis=-1)

        out: IrrepsArray = {}
        for _mul_t, L in self.irreps:
            us = {
                nu: u_matrix(ls, L, nu) for nu in range(1, self.correlation + 1)
            }
            if all(u is None for u in us.values()):
                out[L] = jnp.zeros((x.shape[0], mul, 2 * L + 1), dtype)
                continue

            def wy(nu, P, name):
                # per-element path weights, reference init randn/num_params
                w = self.param(
                    name,
                    nn.initializers.normal(stddev=1.0 / P),
                    (self.num_elements, P, mul),
                )
                return jnp.einsum(
                    "be,epc->bpc", node_attrs, w.astype(dtype)
                )  # [N, P, mul]

            # start at the highest correlation with a path
            nus = [nu for nu in range(self.correlation, 0, -1) if us[nu] is not None]
            nu0 = nus[0]
            U = jnp.asarray(us[nu0], dtype)  # [(2L+1,) d^nu0, P]
            Wy = wy(nu0, U.shape[-1], f"w_l{L}_nu{nu0}")
            # main: contract the LAST feature index and the path index
            # out_acc[b, c, (kappa) i1..i_{nu0-1}]
            acc = jnp.einsum("...ip,bpc,bci->bc...", U, Wy, x)
            for nu in range(nu0 - 1, 0, -1):
                if us[nu] is not None:
                    U = jnp.asarray(us[nu], dtype)
                    Wy = wy(nu, U.shape[-1], f"w_l{L}_nu{nu}")
                    acc = acc + jnp.einsum("...p,bpc->bc...", U, Wy)
                # contract one feature copy
                acc = jnp.einsum("bc...i,bci->bc...", acc, x)
            if L == 0:
                out[L] = acc[:, :, None]
            else:
                out[L] = acc  # [N, mul, 2L+1]
        return out
