"""MACE: E(3)-equivariant higher-order message passing.

Capability re-derivation of the reference MACE stack
(``hydragnn/models/MACEStack.py`` + ``hydragnn/utils/model/mace_utils/``):

  * one-hot(Z, 118) node attributes (``MACEStack.py:510-541``),
  * Bessel radial embedding x polynomial cutoff (``blocks.py:141``),
  * spherical-harmonic edge attributes (component norm),
  * interaction = per-edge-weighted uvu tensor product + scatter-sum
    / avg_num_neighbors + skip (``blocks.py:301-404``),
  * product basis = higher-order (correlation-nu) symmetric contraction.
    Default ``product_basis="umatrix"`` evaluates the reference's own
    algorithm (``symmetric_contraction.py:29-239``) against numerically
    self-derived U tensors (``equivariant/umatrix.py``) — same path
    structure, component normalization, and Horner evaluation, with the
    only residual divergence being the documented CG basis convention
    (equivariant/core.py).  ``product_basis="cg"`` keeps the r01/r02
    iterated-CG products as a documented alternative,
  * per-layer multihead readout decoders summed across layers
    (``MACEStack.py:375-421``), positions centered per graph (:434-443).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hydragnn_tpu.equivariant.core import (
    Irreps,
    IrrepsArray,
    LinearIrreps,
    clebsch_gordan,
    make_irreps,
    real_spherical_harmonics,
    tp_instructions,
)
from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.models.base import (
    MLP,
    ConvStack,
    StackConfig,
    _select_branch,
    activation_function_selection,
)
from hydragnn_tpu.models.geometric import edge_vectors_lengths
from hydragnn_tpu.models.radial import MACERadialEmbedding, safe_dist
from hydragnn_tpu.ops import segment_sum


class WeightedTPConv(nn.Module):
    """uvu tensor product of node irreps with edge SH, per-edge weights."""

    irreps_in: Irreps
    max_l_sh: int
    max_l_out: int

    def paths(self) -> List[Tuple[int, int, int]]:
        return tp_instructions(self.irreps_in, self.max_l_sh, self.max_l_out)

    @nn.compact
    def __call__(
        self,
        x: IrrepsArray,  # gathered at senders: {l: [E, mul, 2l+1]}
        sh: Dict[int, jnp.ndarray],  # {l2: [E, 2l2+1]}
        weights: jnp.ndarray,  # [E, n_paths, mul]
    ) -> IrrepsArray:
        paths = self.paths()
        mul = next(iter(x.values())).shape[1]
        out: Dict[int, jnp.ndarray] = {}
        counts: Dict[int, int] = {}
        for p, (l1, l2, l3) in enumerate(paths):
            C = jnp.asarray(clebsch_gordan(l1, l2, l3), x[l1].dtype)
            # contraction order matters enormously on TPU: fold sh into the
            # tiny CG tensor FIRST ([E, 2l1+1, 2l3+1], a few floats per
            # edge), then one E-batched [mul, i]x[i, k] contraction — the
            # naive 4-operand einsum builds an [E, mul, i, j] intermediate
            # in HBM and ran 2.3x slower on v5e (19.3 -> 8.3 ms for the
            # l=2 path at E=262k, mul=128)
            eik = jnp.einsum("ej,ijk->eik", sh[l2], C)
            term = jnp.einsum("eui,eik->euk", x[l1], eik) * weights[
                :, p, :, None
            ]
            out[l3] = out.get(l3, 0.0) + term
            counts[l3] = counts.get(l3, 0) + 1
        # path normalization (e3nn-like): divide by sqrt(#paths into l3)
        for l3 in out:
            out[l3] = out[l3] / math.sqrt(counts[l3])
        return out


class SymmetricProduct(nn.Module):
    """Higher-order product basis with per-element weights: B = sum_nu
    w_nu(Z) * (A)^{x nu}|_{target irreps} via iterated CG products."""

    irreps: Irreps  # same in/out (uniform mul)
    correlation: int
    num_elements: int

    @nn.compact
    def __call__(self, a: IrrepsArray, node_attrs: jnp.ndarray) -> IrrepsArray:
        mul = next(iter(a.values())).shape[1]
        ls = [l for _, l in self.irreps]
        max_l = max(ls)

        def elem_weight(name):
            w = self.param(
                name, nn.initializers.normal(0.5 / math.sqrt(self.num_elements)),
                (self.num_elements, mul),
            )
            return node_attrs @ w  # [N, mul]

        out = {l: a[l] * elem_weight(f"w1_{l}")[:, :, None] for l in ls}
        cur = a
        for nu in range(2, self.correlation + 1):
            nxt: Dict[int, jnp.ndarray] = {}
            counts: Dict[int, int] = {}
            for l1 in ls:
                for l2 in ls:
                    for l3 in range(abs(l1 - l2), min(l1 + l2, max_l) + 1):
                        if (l1 + l2 + l3) % 2 != 0 or l3 not in ls:
                            continue
                        import numpy as _np

                        Cn = _np.asarray(clebsch_gordan(l1, l2, l3))
                        nz = _np.argwhere(_np.abs(Cn) > 1e-12)
                        # both operands are [N, mul, .] node tensors, so
                        # there is no cheap pre-contraction; unroll the
                        # sparse CG instead — each nonzero is one fused
                        # [N, mul] multiply-add, no [N, mul, i, j]
                        # intermediate (nnz <= ~10 per output k at l<=3)
                        accs = [
                            jnp.zeros(cur[l1].shape[:2], cur[l1].dtype)
                            for _ in range(2 * l3 + 1)
                        ]
                        for i, j, k in nz:
                            accs[k] = accs[k] + jnp.asarray(
                                float(Cn[i, j, k]), cur[l1].dtype
                            ) * cur[l1][:, :, i] * a[l2][:, :, j]
                        t = jnp.stack(accs, axis=-1)
                        nxt[l3] = nxt.get(l3, 0.0) + t
                        counts[l3] = counts.get(l3, 0) + 1
            for l3 in nxt:
                nxt[l3] = nxt[l3] / math.sqrt(counts[l3])
            cur = nxt
            for l3 in nxt:
                out[l3] = out[l3] + nxt[l3] * elem_weight(f"w{nu}_{l3}")[:, :, None]
        return out


class _DenseParams(nn.Module):
    """Parameters of a Dense layer WITHOUT applying it — same param tree,
    names, shapes, and initializers as ``nn.Dense`` (kernel lecun_normal,
    bias zeros), so checkpoints/goldens are interchangeable.  Used when
    the matmul itself is folded into a Pallas kernel (the fused-radial
    MACE path, ops/mace_tp.py weighted_tp_scatter_fused)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return k, b


def weighted_tp_mmajor(
    x_m: jnp.ndarray,  # [E, dim_in*mul] m-major (col = i*mul + u per l)
    sh_flat: jnp.ndarray,  # [E, S] concat of sh l-columns
    w_flat: jnp.ndarray,  # [E, n_paths*mul] (col = p*mul + u)
    irreps_in: Irreps,
    max_l_sh: int,
    max_l_out: int,
    mul: int,
):
    """uvu tensor product in m-major layout with scalar-unrolled CG.

    Numerically identical to :class:`WeightedTPConv` (parity-tested) but
    TPU-shaped: every operation is an elementwise multiply-add on
    contiguous [E, mul] column blocks — no batched tiny gemms, no
    [E, mul, i] strided slices, no per-path [E, i, k] intermediates — so
    XLA fuses the whole product into a few passes over x/w/sh.  Profiling
    r03 showed the u-major module spending ~40% of the MACE step in
    copy/reshape/split data movement.

    Returns (out_m [E, dim_out*mul], out_ls) with out_m m-major over
    ``out_ls`` (ascending l3).
    """
    paths = tp_instructions(irreps_in, max_l_sh, max_l_out)
    counts: Dict[int, int] = {}
    for _, _, l3 in paths:
        counts[l3] = counts.get(l3, 0) + 1
    out_ls = sorted(counts)
    in_ls = sorted(l for _, l in irreps_in)
    in_off = {}
    off = 0
    for l in in_ls:
        in_off[l] = off
        off += (2 * l + 1) * mul
    sh_off = {l: l * l for l in range(max_l_sh + 1)}  # sum of (2k+1), k<l
    acc: Dict[Tuple[int, int], jnp.ndarray] = {}
    for p, (l1, l2, l3) in enumerate(paths):
        C = clebsch_gordan(l1, l2, l3) / math.sqrt(counts[l3])
        w_p = jax.lax.dynamic_slice_in_dim(w_flat, p * mul, mul, axis=1)
        for i in range(2 * l1 + 1):
            nz = np.argwhere(np.abs(C[i]) > 1e-12)
            if nz.size == 0:
                continue
            x_i = jax.lax.dynamic_slice_in_dim(
                x_m, in_off[l1] + i * mul, mul, axis=1
            )
            xi_wp = x_i * w_p  # shared across this row's (j, k) nonzeros
            for j, k in nz:
                c = float(C[i, j, k])
                shc = sh_flat[:, sh_off[l2] + j : sh_off[l2] + j + 1]
                term = (c * shc) * xi_wp
                key = (l3, int(k))
                acc[key] = acc.get(key, 0.0) + term
    cols = [acc[(l3, k)] for l3 in out_ls for k in range(2 * l3 + 1)]
    return jnp.concatenate(cols, axis=-1), out_ls


def flatten_mmajor(x: IrrepsArray, ls) -> jnp.ndarray:
    """{l: [N, mul, 2l+1]} -> m-major flat [N, sum (2l+1)*mul] (node-level
    transposes only)."""
    parts = []
    for l in ls:
        a = x[l]
        parts.append(jnp.swapaxes(a, 1, 2).reshape(a.shape[0], -1))
    return jnp.concatenate(parts, axis=-1)


def unflatten_mmajor(flat: jnp.ndarray, ls, mul: int) -> IrrepsArray:
    out = {}
    off = 0
    for l in ls:
        d = (2 * l + 1) * mul
        out[l] = jnp.swapaxes(
            flat[:, off : off + d].reshape(flat.shape[0], 2 * l + 1, mul), 1, 2
        )
        off += d
    return out


class MACELayer(nn.Module):
    """Interaction + product basis + sizing (one graph_convs entry,
    ``MACEStack.py:280-373``)."""

    cfg: StackConfig
    node_irreps_in: Irreps
    hidden_irreps: Irreps
    out_irreps: Irreps
    correlation: int

    @nn.compact
    def __call__(
        self,
        graph: GraphBatch,
        feats: IrrepsArray,
        node_attrs: jnp.ndarray,
        edge_sh: Dict[int, jnp.ndarray],
        edge_feats: jnp.ndarray,
        train: bool = False,
    ) -> IrrepsArray:
        cfg = self.cfg
        mul = cfg.hidden_dim
        n_scalar = dict((l, m) for m, l in self.hidden_irreps)[0]

        # skip connection (blocks.py:366-369)
        sc = LinearIrreps(self.node_irreps_in, self.hidden_irreps, name="skip_linear")(
            feats
        )
        up = LinearIrreps(self.node_irreps_in, self.node_irreps_in, name="linear_up")(
            feats
        )
        down = LinearIrreps(
            self.node_irreps_in, ((n_scalar, 0),), name="linear_down"
        )(feats)[0][:, :, 0]  # [N, n_scalar]

        from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes

        aug = jnp.concatenate(
            [
                edge_feats,
                gather_nodes(graph, down, "senders"),
                gather_nodes(graph, down, "receivers"),
            ],
            axis=-1,
        )
        tp = WeightedTPConv(
            irreps_in=self.node_irreps_in,
            max_l_sh=cfg.max_ell,
            max_l_out=cfg.node_max_ell,
            name="conv_tp",
        )
        n_paths = len(tp.paths())
        rad_dim = max(1, math.ceil(mul / 3))
        w = aug
        for i, d in enumerate([rad_dim, rad_dim, rad_dim]):
            w = jax.nn.silu(nn.Dense(d, name=f"tp_w_{i}")(w))
        # last radial Dense: params only — the matmul runs either fused
        # inside the Pallas TP kernels (window-plan path: w never exists
        # in HBM) or explicitly below (fallback).  Identical param tree
        # and math to the r04 nn.Dense("tp_w_3").
        kl, bl = _DenseParams(n_paths * mul, name="tp_w_3")(w.shape[-1])

        # m-major TP: gather once in m-major layout, run the scalar-
        # unrolled product (weighted_tp_mmajor, numerically == WeightedTPConv),
        # aggregate the m-major messages — layout conversions happen at
        # NODE granularity only (E/N ~ avg degree cheaper).  With window
        # plans the whole gather -> TP -> scatter collapses into the
        # fused Pallas kernel (ops/mace_tp.py; reference hot spot
        # blocks.py:372-404): no [E, Din] / [E, Dout] HBM intermediates.
        up_ls = sorted(up)
        up_m = flatten_mmajor(up, up_ls)
        sh_flat = jnp.concatenate(
            [edge_sh[l] for l in range(cfg.max_ell + 1)], axis=-1
        )
        from hydragnn_tpu.ops.fused_gather import has_window_plans

        if has_window_plans(graph):
            from hydragnn_tpu.equivariant.core import tp_instructions
            from hydragnn_tpu.ops.mace_tp import weighted_tp_scatter_fused

            out_ls = sorted(
                {
                    l3
                    for _, _, l3 in tp_instructions(
                        self.node_irreps_in, cfg.max_ell, cfg.node_max_ell
                    )
                }
            )
            dt = up_m.dtype
            # bias folded as a trailing ones column on h3 / bias row on
            # the kernel: the fused kernels compute w = h3a @ wla per
            # block in VMEM (ops/mace_tp.py weighted_tp_scatter_fused)
            h3a = jnp.concatenate(
                [w, jnp.ones((w.shape[0], 1), w.dtype)], axis=-1
            ).astype(dt)
            wla = jnp.concatenate([kl, bl[None, :]], axis=0).astype(dt)
            agg_m = weighted_tp_scatter_fused(
                graph, up_m, sh_flat.astype(dt), h3a, wla,
                self.node_irreps_in, cfg.max_ell, cfg.node_max_ell, mul,
                impl="jvp" if cfg.force_grad else "vjp",
            )
        else:
            w = jnp.dot(w, kl) + bl
            x_m = gather_nodes(graph, up_m, "senders")
            mji_m, out_ls = weighted_tp_mmajor(
                x_m, sh_flat, w,
                self.node_irreps_in, cfg.max_ell, cfg.node_max_ell, mul,
            )
            agg_m = aggregate(graph, mji_m, "sum", "receivers")
        message: IrrepsArray = unflatten_mmajor(agg_m, out_ls, mul)
        mid_irreps = tuple((mul, l) for l in sorted(message))
        message = LinearIrreps(mid_irreps, self.hidden_irreps, name="linear_mid")(
            message
        )
        message = {
            l: v / self.cfg.avg_num_neighbors for l, v in message.items()
        }

        # product basis (n-body) + skip; default = the reference's U-matrix
        # symmetric contraction (symmetric_contraction.py:29-239) with
        # numerically self-derived U tensors, iterated-CG kept as the
        # documented alternative (cfg.product_basis)
        if cfg.product_basis == "umatrix":
            from hydragnn_tpu.equivariant.umatrix import SymmetricContractionU

            prod = SymmetricContractionU(
                irreps=self.hidden_irreps,
                correlation=self.correlation,
                num_elements=cfg.num_elements,
                name="product",
            )(message, node_attrs)
        else:
            prod = SymmetricProduct(
                irreps=self.hidden_irreps,
                correlation=self.correlation,
                num_elements=cfg.num_elements,
                name="product",
            )(message, node_attrs)
        feats_out = {l: prod[l] + sc[l] for l in prod}

        # sizing linear to output irreps
        return LinearIrreps(self.hidden_irreps, self.out_irreps, name="sizing")(
            feats_out
        )


class MACEMultiheadDecoder(nn.Module):
    """Per-layer multihead readout (mace_utils blocks.py:432-700 semantics):
    heads read the INVARIANT (l=0) channels; linear for intermediate layers,
    nonlinear (MLP) for the last."""

    cfg: StackConfig
    nonlinear: bool

    @nn.compact
    def __call__(self, graph: GraphBatch, scalars: jnp.ndarray) -> List[jnp.ndarray]:
        cfg = self.cfg
        act = activation_function_selection(cfg.activation)
        var_mult = 1 + int(cfg.var_output)
        graph_branches = dict(cfg.graph_branches)
        node_branches = dict(cfg.node_branches)
        dataset_id = (
            graph.dataset_id
            if graph.dataset_id is not None
            else jnp.zeros((graph.n_graph,), jnp.int32)
        )

        # pooled graph embedding
        mode = cfg.graph_pooling.lower()
        m = graph.node_mask
        if mode in ("add", "sum"):
            x_graph = segment_sum(scalars, graph.node_graph, graph.n_graph, mask=m)
        elif mode == "max":
            from hydragnn_tpu.ops import segment_max

            x_graph = segment_max(scalars, graph.node_graph, graph.n_graph, mask=m)
        else:
            s = segment_sum(scalars, graph.node_graph, graph.n_graph, mask=m)
            x_graph = s / jnp.maximum(
                graph.n_per_graph.astype(scalars.dtype), 1.0
            )[:, None]

        outputs = []
        for ihead in range(cfg.num_heads):
            hdim = cfg.output_dim[ihead] * var_mult
            if cfg.output_type[ihead] == "graph":
                per_branch = []
                for bname, arch in graph_branches.items():
                    if self.nonlinear:
                        feats = tuple(arch.dim_headlayers) + (hdim,)
                        o = MLP(
                            feats, activation=cfg.activation,
                            name=f"head_{ihead}_{bname}",
                        )(x_graph)
                    else:
                        o = nn.Dense(hdim, name=f"head_{ihead}_{bname}")(x_graph)
                    per_branch.append(o)
                outputs.append(_select_branch(per_branch, dataset_id))
            else:
                per_branch = []
                for bname, arch in node_branches.items():
                    if self.nonlinear:
                        feats = tuple(arch.dim_headlayers) + (hdim,)
                        o = MLP(
                            feats, activation=cfg.activation,
                            name=f"head_{ihead}_{bname}",
                        )(scalars)
                    else:
                        o = nn.Dense(hdim, name=f"head_{ihead}_{bname}")(scalars)
                    per_branch.append(o)
                outputs.append(
                    _select_branch(per_branch, dataset_id[graph.node_graph])
                )
        return outputs


class MACEStack(ConvStack):
    """Custom forward: per-layer decoders summed (``MACEStack.py:375-421``)."""

    is_edge_model: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False):
        cfg = self.cfg
        N = graph.n_node

        # center positions per graph (MACEStack.py:434-443)
        m = graph.node_mask[:, None]
        pos_sum = segment_sum(graph.pos, graph.node_graph, graph.n_graph,
                              mask=graph.node_mask)
        mean_pos = pos_sum / jnp.maximum(
            graph.n_per_graph.astype(graph.pos.dtype), 1.0
        )[:, None]
        pos = graph.pos - jnp.where(m, mean_pos[graph.node_graph], 0.0)
        g = graph.replace(pos=pos)

        vec_n, dist = edge_vectors_lengths(pos, g, normalize=True)
        edge_sh = real_spherical_harmonics(vec_n, cfg.max_ell)

        # node attributes: one-hot atomic numbers (MACEStack.py:510-541)
        z = jnp.clip(jnp.round(graph.x[:, 0]).astype(jnp.int32), 1, cfg.num_elements)
        node_attrs = jax.nn.one_hot(z - 1, cfg.num_elements, dtype=pos.dtype)

        # radial embedding: {bessel|gaussian|chebyshev} basis on the
        # (optionally Agnesi/Soft-transformed) length x polynomial cutoff on
        # the raw length (RadialEmbeddingBlock, blocks.py:141-178;
        # MACEStack.py:80-81,171-177 thread radial_type/distance_transform)
        d = safe_dist(dist, g.edge_mask, fill=cfg.radius * 0.5)
        z_int = jnp.clip(jnp.round(graph.x[:, 0]).astype(jnp.int32), 1, 118)
        edge_feats = MACERadialEmbedding(
            num_basis=cfg.num_radial,
            r_max=cfg.radius,
            num_polynomial_cutoff=cfg.envelope_exponent,
            radial_type=cfg.radial_type or "bessel",
            distance_transform=cfg.distance_transform or "None",
            name="radial_embedding",
        )(d, z_int[graph.senders], z_int[graph.receivers])
        if self.use_edge_attr() and g.edge_attr is not None:
            edge_feats = jnp.concatenate(
                [g.edge_attr.astype(edge_feats.dtype), edge_feats], axis=-1
            )

        # initial embedding: one-hot -> hidden scalars
        h0 = nn.Dense(cfg.hidden_dim, use_bias=False, name="node_embedding")(
            node_attrs
        )
        feats: IrrepsArray = {0: h0[:, :, None]}

        hidden_irreps = make_irreps(cfg.hidden_dim, cfg.node_max_ell)
        scalar_irreps = ((cfg.hidden_dim, 0),)

        # decoder 0 on raw node attributes (MACEStack.py:375-421 outputs[0])
        outputs = MACEMultiheadDecoder(cfg=cfg, nonlinear=False, name="decoder_0")(
            g, node_attrs
        )

        corr = list(cfg.correlation) or [2]
        if len(corr) == 1:
            corr = corr * cfg.num_conv_layers
        node_irreps = scalar_irreps
        for i in range(cfg.num_conv_layers):
            last = i == cfg.num_conv_layers - 1
            out_irreps = scalar_irreps if last else hidden_irreps
            feats = MACELayer(
                cfg=cfg,
                node_irreps_in=node_irreps,
                hidden_irreps=hidden_irreps if not last else scalar_irreps,
                out_irreps=out_irreps,
                correlation=corr[i],
                name=f"layer_{i}",
            )(g, feats, node_attrs, edge_sh, edge_feats, train=train)
            node_irreps = out_irreps
            scalars = feats[0][:, :, 0]
            out_i = MACEMultiheadDecoder(
                cfg=cfg, nonlinear=last, name=f"decoder_{i + 1}"
            )(g, scalars)
            outputs = [o + oi for o, oi in zip(outputs, out_i)]

        if cfg.var_output:
            preds, vars = [], []
            for ihead, o in enumerate(outputs):
                hdim = cfg.output_dim[ihead]
                preds.append(o[:, :hdim])
                vars.append(o[:, hdim:] ** 2)
            return preds, vars
        return outputs
