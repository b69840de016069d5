"""Geometric message-passing stacks: SchNet (SCF), PNAPlus, EGNN (EGCL),
PaiNN, PNAEq, DimeNet.

From-scratch JAX re-derivations of the reference stacks
(``hydragnn/models/{SCF,PNAPlus,EGCL,PAINN,PNAEq,DIME}Stack.py``).  All
geometry (edge vectors, radial bases) is computed from static padded edge
topology; padding-edge distances are sanitized before any 1/d so gradients
stay NaN-free (jnp.where-on-both-sides pattern).

TPU divergence (documented): stacks that rebuild the radius graph inside
forward on the reference CPU path (``SCFStack.py:128-161``) use the
precomputed static topology here and recompute only edge weights from the
current (possibly updated) positions -- identical when positions are
static, an approximation when equivariant position updates move atoms.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.models.base import MLP, ConvStack
from hydragnn_tpu.models.invariant import PNAConv, pna_degree_stats
from hydragnn_tpu.models.radial import (
    BesselBasisLayer,
    cosine_cutoff,
    gaussian_smearing,
    safe_dist,
    shifted_softplus,
    sinc_expansion,
)
from hydragnn_tpu.ops import segment_mean, segment_sum
from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes


def edge_vectors_lengths(
    pos, graph: GraphBatch, normalize=False, eps: float = 1e-9
):
    """Reference ``get_edge_vectors_and_lengths`` (operations.py:21-36):
    vec = pos[receiver] - pos[sender] + shift.

    Padding edges (sender == receiver == padding node) get a unit vector
    substituted via jnp.where so that the norm's gradient w.r.t. positions
    (force training differentiates through here) never hits the NaN at
    ||v|| = 0; their contributions are masked out downstream anyway.
    """
    # gather_nodes (not raw indexing): the transpose of pos[idx] is an
    # XLA scatter-add of [E, 3] rows — serialized on TPU and hit once per
    # AD order (force training stacks four of them; ~25% of the r03
    # EGNN-force step, profiling/BYTES_egnn_force.json).  gather_nodes
    # pads to the lane tile and transposes through the sorted Pallas
    # segment-sum, composing to any order via linear_call.
    vec = gather_nodes(graph, pos, "receivers") - gather_nodes(
        graph, pos, "senders"
    )
    if graph.edge_shifts is not None:
        vec = vec + graph.edge_shifts.astype(vec.dtype)
    unit = jnp.zeros_like(vec).at[:, 0].set(1.0)
    vec_safe = jnp.where(graph.edge_mask[:, None], vec, unit)
    length = jnp.sqrt(jnp.sum(vec_safe * vec_safe, axis=-1, keepdims=True))
    if normalize:
        return vec_safe / (length + eps), length
    return vec_safe, length


# ---------------------------------------------------------------------------
# SchNet / SCF  (reference SCFStack.py; PyG CFConv semantics)
# ---------------------------------------------------------------------------


class CFConv(nn.Module):
    out_dim: int
    num_filters: int
    num_gaussians: int
    cutoff: float
    equivariant: bool = False
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        pos = equiv
        vec_n, dist = edge_vectors_lengths(pos, graph, normalize=True, eps=1.0)
        d = safe_dist(dist, graph.edge_mask, fill=self.cutoff * 0.5)[:, 0]
        rbf = gaussian_smearing(d, 0.0, self.cutoff, self.num_gaussians)
        C = cosine_cutoff(d, self.cutoff)[:, None]
        feats = rbf
        ea = ctx.get("edge_attr")
        if self.edge_dim and ea is not None:
            feats = jnp.concatenate([rbf, ea.astype(inv.dtype)], axis=-1)
        # filter net: Linear -> ssp -> Linear (SCFStack.py:99-104)
        w = nn.Dense(self.num_filters, name="fnet_0")(feats)
        w = shifted_softplus(w)
        w = nn.Dense(self.num_filters, name="fnet_1")(w)
        W = w * C

        h = nn.Dense(self.num_filters, use_bias=False, name="lin1")(inv)
        if self.equivariant:
            # coordinate update (SCFStack.py:252-266): mean over edges at the
            # *sender* index of normalized vec * coord_mlp(W)
            cm = nn.Dense(self.num_filters, name="coord_0")(W)
            cm = jax.nn.relu(cm)
            cm = nn.Dense(
                1,
                use_bias=False,
                kernel_init=nn.initializers.variance_scaling(
                    0.001**2 * 2.0, "fan_avg", "uniform"
                ),
                name="coord_out",
            )(cm)
            trans = jnp.clip(vec_n * cm, -100.0, 100.0)
            agg = segment_mean(
                trans, graph.senders, graph.n_node, mask=graph.edge_mask
            )
            pos = pos + agg
        msg = gather_nodes(graph, h, "senders") * W
        out = aggregate(graph, msg, "sum", "receivers")
        out = nn.Dense(self.out_dim, name="lin2")(out)
        return out, pos


class SCFStack(ConvStack):
    is_edge_model: bool = True

    def conv_layer_specs(self, embed_dim, edge_embed_dim) -> List[Dict]:
        cfg = self.cfg
        specs = []
        for i in range(cfg.num_conv_layers):
            last = i == cfg.num_conv_layers - 1
            specs.append(
                {
                    "conv": dict(
                        in_dim=embed_dim if i == 0 else cfg.hidden_dim,
                        out_dim=cfg.hidden_dim,
                        edge_dim=edge_embed_dim,
                        last_layer=last,
                    ),
                    "norm_dim": cfg.hidden_dim,
                    "norm": False,  # SCFStack.py:81,95 uses Identity
                }
            )
        return specs

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return CFConv(
            out_dim=out_dim,
            num_filters=self.cfg.num_filters,
            num_gaussians=self.cfg.num_gaussians,
            cutoff=self.cfg.radius,
            equivariant=bool(self.cfg.equivariance) and not last_layer,
            edge_dim=edge_dim,
            name=name,
        )


# ---------------------------------------------------------------------------
# PNAPlus  (reference PNAPlusStack.py: PNA + Bessel rbf Hadamard)
# ---------------------------------------------------------------------------


class PNAPlusConv(nn.Module):
    in_dim: int
    out_dim: int
    avg_deg_lin: float
    avg_deg_log: float
    num_radial: int
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        from hydragnn_tpu.ops import segment_max, segment_min, segment_std
        from hydragnn_tpu.ops.segment import segment_count

        rbf = ctx["rbf"]
        N = graph.n_node
        rbf_emb = jax.nn.relu(nn.Dense(self.in_dim, name="rbf_emb")(rbf))
        ea = ctx.get("edge_attr")
        if self.edge_dim is not None and self.edge_dim > 0 and ea is not None:
            e = jnp.concatenate([ea.astype(inv.dtype), rbf_emb], axis=-1)
            e = nn.Dense(self.in_dim, name="edge_encoder")(e)
        else:
            e = rbf_emb
        # split pre-linear: node partial products at nodes, gathered per edge
        h_i = nn.Dense(self.in_dim, name="pre_nn_i")(inv)
        h_j = nn.Dense(self.in_dim, use_bias=False, name="pre_nn_j")(inv)
        h = (
            gather_nodes(graph, h_i, "receivers")
            + gather_nodes(graph, h_j, "senders")
            + nn.Dense(self.in_dim, use_bias=False, name="pre_nn_e")(e)
        )
        # Hadamard with projected rbf (PNAPlusStack.py:271-279)
        h = h * nn.Dense(self.in_dim, use_bias=False, name="rbf_lin")(rbf)

        srt = graph.edges_sorted
        m12 = aggregate(
            graph, jnp.concatenate([h, h * h], axis=-1), "mean", "receivers"
        )
        mean1, mean2 = jnp.split(m12, 2, axis=-1)
        std = jnp.sqrt(jax.nn.relu(mean2 - mean1 * mean1) + 1e-5)
        from hydragnn_tpu.ops.aggregate import segment_minmax

        mn, mx = segment_minmax(graph, h)  # one HBM pass for both extrema
        aggs = [mean1, mn, mx, std]
        out = jnp.concatenate(aggs, axis=-1)
        if graph.rcv_count is not None:
            deg = graph.rcv_count.astype(inv.dtype)
        else:
            deg = segment_count(graph.receivers, N, mask=graph.edge_mask,
                                dtype=inv.dtype, indices_are_sorted=srt)
        logd = jnp.log(deg + 1.0)
        logd_c = jnp.log(jnp.maximum(deg, 1.0) + 1.0)
        amp = (logd / self.avg_deg_log)[:, None]
        att = (self.avg_deg_log / logd_c)[:, None]
        lin = (deg / max(self.avg_deg_lin, 1e-12))[:, None]
        scaled = jnp.concatenate([out, out * amp, out * att, out * lin], axis=-1)
        z = jnp.concatenate([inv, scaled], axis=-1)
        z = nn.Dense(self.out_dim, name="post_nn")(z)
        return nn.Dense(self.out_dim, name="lin")(z), equiv


class PNAPlusStack(ConvStack):
    is_edge_model: bool = True

    def embedding(self, graph: GraphBatch):
        inv, equiv, ctx = super().embedding(graph)
        _, dist = edge_vectors_lengths(graph.pos, graph)
        d = safe_dist(dist, graph.edge_mask, fill=self.cfg.radius * 0.5)[:, 0]
        ctx["rbf"] = BesselBasisLayer(
            num_radial=self.cfg.num_radial,
            cutoff=self.cfg.radius,
            envelope_exponent=self.cfg.envelope_exponent,
            name="rbf",
        )(d)
        return inv, equiv, ctx

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        stats = pna_degree_stats(self.cfg.pna_deg)
        return PNAPlusConv(
            in_dim=in_dim,
            out_dim=out_dim,
            avg_deg_lin=stats["lin"],
            avg_deg_log=stats["log"],
            num_radial=self.cfg.num_radial,
            edge_dim=edge_dim,
            name=name,
        )


# ---------------------------------------------------------------------------
# EGNN / E_GCL  (reference EGCLStack.py:180-291)
# ---------------------------------------------------------------------------


class EGCLConv(nn.Module):
    out_dim: int
    hidden_dim: int
    edge_dim: int = 0
    equivariant: bool = False
    # reference E_GCL exposes act_fn (EGCLStack.py:188, default ReLU);
    # smooth activations (silu) matter for FORCE training — relu energies
    # have piecewise-constant gradients, capping stiff-potential force
    # fits (validation/run_real.py md17 analysis, r05)
    act: str = "relu"

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        from hydragnn_tpu.models.base import activation_function_selection

        act = activation_function_selection(self.act)
        pos = equiv
        vec_n, radial = edge_vectors_lengths(pos, graph, normalize=True, eps=1.0)
        # first edge-MLP linear computed split (node parts at nodes)
        e_src = nn.Dense(self.hidden_dim, name="edge_mlp_src")(inv)
        e_dst = nn.Dense(self.hidden_dim, use_bias=False, name="edge_mlp_dst")(inv)
        ef = (
            gather_nodes(graph, e_src, "senders")
            + gather_nodes(graph, e_dst, "receivers")
            + nn.Dense(self.hidden_dim, use_bias=False, name="edge_mlp_rad")(radial)
        )
        ea = ctx.get("edge_attr")
        if self.edge_dim and ea is not None:
            ef = ef + nn.Dense(
                self.hidden_dim, use_bias=False, name="edge_mlp_attr"
            )(ea.astype(inv.dtype))
        ef = act(ef)
        ef = nn.Dense(self.hidden_dim, name="edge_mlp_out")(ef)
        ef = act(ef)
        if self.equivariant:
            cm = nn.Dense(self.hidden_dim, name="coord_0")(ef)
            cm = act(cm)
            cm = nn.Dense(
                1,
                use_bias=False,
                kernel_init=nn.initializers.variance_scaling(
                    0.001**2 * 2.0, "fan_avg", "uniform"
                ),
                name="coord_out",
            )(cm)
            cm = jnp.tanh(cm)
            trans = jnp.clip(vec_n * cm, -100.0, 100.0)
            # aggregated at the *sender* (EGCLStack.py:268-277); aggregate
            # (not raw segment_mean) so the [E, 3] reduction rides the
            # sorted Pallas plan instead of XLA's serial scatter (15.6 ms
            # of the r04 force step, profiling/BYTES_egnn_force.json)
            pos = pos + aggregate(graph, trans, "mean", "senders")
        agg = aggregate(graph, ef, "sum", "senders")
        out = MLP(
            (self.hidden_dim, self.out_dim), activation=self.act,
            name="node_mlp",
        )(jnp.concatenate([inv, agg], axis=-1))
        return out, pos


class EGCLStack(ConvStack):
    is_edge_model: bool = True

    def conv_layer_specs(self, embed_dim, edge_embed_dim) -> List[Dict]:
        cfg = self.cfg
        specs = []
        for i in range(cfg.num_conv_layers):
            last = i == cfg.num_conv_layers - 1
            specs.append(
                {
                    "conv": dict(
                        in_dim=embed_dim if i == 0 else cfg.hidden_dim,
                        out_dim=cfg.hidden_dim,
                        edge_dim=edge_embed_dim,
                        last_layer=last,
                    ),
                    "norm_dim": cfg.hidden_dim,
                    "norm": False,  # EGCLStack.py:57,70 Identity
                }
            )
        return specs

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return EGCLConv(
            out_dim=out_dim,
            hidden_dim=self.cfg.hidden_dim,
            edge_dim=int(edge_dim or 0),
            equivariant=bool(self.cfg.equivariance) and not last_layer,
            act=self.cfg.activation,
            name=name,
        )


# ---------------------------------------------------------------------------
# PaiNN  (reference PAINNStack.py)
# ---------------------------------------------------------------------------


class PainnConv(nn.Module):
    """PainnMessage + PainnUpdate + embed-out MLPs (PAINNStack.py:76-149).

    equiv state is [N, 3, F] (zeros at input); gathers use the *receiver*
    (edge[:,1]) and scatter to the *sender* (edge[:,0]) as in the reference
    (PAINNStack.py:258-266).
    """

    node_size: int
    out_dim: int
    num_radial: int
    cutoff: float
    edge_dim: Optional[int] = None
    last_layer: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        F = self.node_size
        diff, dist = ctx["diff"], ctx["dist"]  # [E,3], [E,1]
        d = safe_dist(dist, graph.edge_mask, fill=self.cutoff * 0.5)

        # ---- message ----
        filt = nn.Dense(F * 3, name="filter_layer")(
            sinc_expansion(d, self.num_radial, self.cutoff)
        )
        filt = filt * cosine_cutoff(d, self.cutoff)
        ea = ctx.get("edge_attr")
        if self.edge_dim is not None and self.edge_dim > 0 and ea is not None:
            filt = filt * MLP(
                (F, F * 3), activation="silu", name="edge_filter"
            )(ea.astype(inv.dtype))
        scal = MLP((F, F * 3), activation="silu", name="scalar_message_mlp")(inv)
        fo = filt * gather_nodes(graph, scal, "receivers")
        gate_v, gate_e, msg_s = jnp.split(fo, 3, axis=-1)
        msg_v = equiv[graph.receivers] * gate_v[:, None, :]
        msg_v = msg_v + gate_e[:, None, :] * (diff / d)[:, :, None]
        s = inv + aggregate(graph, msg_s, "sum", "senders")
        mv = aggregate(
            graph, msg_v.reshape(msg_v.shape[0], -1), "sum", "senders"
        )
        v = equiv + mv.reshape(equiv.shape)

        # ---- update ----
        Uv = nn.Dense(F, name="update_U")(v)
        Vv = nn.Dense(F, name="update_V")(v)
        # eps-floored norm: exact torch.linalg.norm has a NaN gradient at 0,
        # which padding nodes (v == 0) would hit every step
        Vn = jnp.sqrt(jnp.sum(Vv * Vv, axis=1) + 1e-12)
        mlp_out_dim = F * 3 if not self.last_layer else F * 2
        mo = MLP((F, mlp_out_dim), activation="silu", name="update_mlp")(
            jnp.concatenate([Vn, s], axis=-1)
        )
        inner = jnp.sum(Uv * Vv, axis=1)
        if not self.last_layer:
            a_vv, a_sv, a_ss = jnp.split(mo, 3, axis=-1)
            v = v + a_vv[:, None, :] * Uv
            s = s + a_sv * inner + a_ss
        else:
            a_sv, a_ss = jnp.split(mo, 2, axis=-1)
            s = s + a_sv * inner + a_ss

        # ---- embed-out (PAINNStack.py:93-99) ----
        s = MLP((self.out_dim, self.out_dim), activation="tanh", name="node_embed_out")(s)
        if not self.last_layer:
            v = nn.Dense(self.out_dim, name="vec_embed_out")(v)
        return s, v


class PAINNStack(ConvStack):
    is_edge_model: bool = True

    def embedding(self, graph: GraphBatch):
        inv, _, ctx = super().embedding(graph)
        diff, dist = edge_vectors_lengths(graph.pos, graph, normalize=True)
        ctx["diff"] = diff
        ctx["dist"] = dist
        # equivariant channel v starts at zero [N, 3, F_in] (PAINNStack.py:196)
        v = jnp.zeros((graph.n_node, 3, inv.shape[-1]), inv.dtype)
        return inv, v, ctx

    def conv_layer_specs(self, embed_dim, edge_embed_dim) -> List[Dict]:
        cfg = self.cfg
        specs = []
        for i in range(cfg.num_conv_layers):
            last = i == cfg.num_conv_layers - 1
            specs.append(
                {
                    "conv": dict(
                        in_dim=embed_dim if i == 0 else cfg.hidden_dim,
                        out_dim=cfg.hidden_dim,
                        edge_dim=edge_embed_dim,
                        last_layer=last,
                    ),
                    "norm_dim": cfg.hidden_dim,
                    "norm": False,  # PAINNStack.py:61,74 Identity
                }
            )
        return specs

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return PainnConv(
            node_size=in_dim,
            out_dim=out_dim,
            num_radial=self.cfg.num_radial,
            cutoff=self.cfg.radius,
            edge_dim=edge_dim,
            last_layer=last_layer,
            name=name,
        )


# ---------------------------------------------------------------------------
# PNAEq  (reference PNAEqStack.py: PaiNN message/update with PNA
#         DegreeScalerAggregation of scalar messages, 5 scalers)
# ---------------------------------------------------------------------------


def pnaeq_degree_stats(deg_hist) -> Dict[str, float]:
    """avg stats from the sanitized histogram (counts clamped >= 1,
    PNAEqStack.py:76-90)."""
    import numpy as np

    hist = np.maximum(np.nan_to_num(np.asarray(deg_hist, np.float64), nan=1.0), 1.0)
    bins = np.arange(len(hist))
    total = hist.sum()
    return {
        "lin": float((bins * hist).sum() / total),
        "log": float((np.log(bins + 1.0) * hist).sum() / total),
    }


class PNAEqConv(nn.Module):
    node_size: int
    out_dim: int
    num_radial: int
    cutoff: float
    avg_deg_lin: float
    avg_deg_log: float
    edge_dim: Optional[int] = None
    last_layer: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        from hydragnn_tpu.ops import segment_max, segment_min, segment_std
        from hydragnn_tpu.ops.segment import segment_count

        F = self.node_size
        N = graph.n_node
        rbf = ctx["pnaeq_rbf"]  # [E, R] sinc * cosine cutoff
        edge_vec = ctx["diff"]  # [E, 3] normalized

        # ---- message (PNAEqStack.py:326-414) ----
        parts = [inv[graph.senders], inv[graph.receivers],
                 jnp.tanh(nn.Dense(F, name="rbf_emb")(rbf))]
        ea = ctx.get("edge_attr")
        if self.edge_dim is not None and self.edge_dim > 0 and ea is not None:
            parts.append(nn.Dense(F, name="edge_encoder")(ea.astype(inv.dtype)))
        ms = nn.Dense(F, name="pre_nn")(jnp.concatenate(parts, axis=-1))
        so = MLP((F, F), activation="tanh", final_activation=False, name="smm_a")(ms)
        so = jax.nn.silu(so)
        so = nn.Dense(F * 3, name="smm_b")(so)
        filt = so * nn.Dense(F * 3, use_bias=False, name="rbf_lin")(rbf)
        gate_v, gate_e, msg_s = jnp.split(filt, 3, axis=-1)

        msg_v = equiv[graph.receivers] * gate_v[:, None, :]
        msg_v = msg_v + gate_e[:, None, :] * edge_vec[:, :, None]

        # degree-scaled aggregation of scalar messages at the *sender*
        aggs = [
            segment_mean(msg_s, graph.senders, N, mask=graph.edge_mask),
            segment_min(msg_s, graph.senders, N, mask=graph.edge_mask),
            segment_max(msg_s, graph.senders, N, mask=graph.edge_mask),
            segment_std(msg_s, graph.senders, N, mask=graph.edge_mask),
        ]
        agg = jnp.concatenate(aggs, axis=-1)
        deg = segment_count(graph.senders, N, mask=graph.edge_mask, dtype=inv.dtype)
        # PyG clamps deg to >= 1 for the inverse scalers; this also keeps
        # padding rows (deg 0) finite so masked-out cotangents stay NaN-free
        logd = jnp.log(deg + 1.0)
        logd_c = jnp.log(jnp.maximum(deg, 1.0) + 1.0)
        amp = (logd / self.avg_deg_log)[:, None]
        att = (self.avg_deg_log / logd_c)[:, None]
        linear = (deg / max(self.avg_deg_lin, 1e-12))[:, None]
        inv_linear = (self.avg_deg_lin / jnp.maximum(deg, 1.0))[:, None]
        scaled = jnp.concatenate(
            [agg, agg * amp, agg * att, agg * linear, agg * inv_linear], axis=-1
        )
        delta_x = nn.Dense(F, name="post_nn")(
            jnp.concatenate([inv, scaled], axis=-1)
        )
        s = inv + delta_x
        v = equiv + segment_sum(msg_v, graph.senders, N, mask=graph.edge_mask)

        # ---- update (identical to PaiNN update, PNAEqStack.py:423-478) ----
        Xv = nn.Dense(F, name="update_X")(v)
        Vv = nn.Dense(F, name="update_V")(v)
        Vn = jnp.sqrt(jnp.sum(Vv * Vv, axis=1) + 1e-12)
        mlp_out_dim = F * 3 if not self.last_layer else F * 2
        mo = MLP((F, mlp_out_dim), activation="silu", name="update_mlp")(
            jnp.concatenate([Vn, s], axis=-1)
        )
        inner = jnp.sum(Xv * Vv, axis=1)
        if not self.last_layer:
            a_vv, a_xv, a_xx = jnp.split(mo, 3, axis=-1)
            v = v + a_vv[:, None, :] * Xv
            s = s + a_xv * inner + a_xx
        else:
            a_xv, a_xx = jnp.split(mo, 2, axis=-1)
            s = s + a_xv * inner + a_xx

        # ---- embed-out (PNAEqStack.py:137-150) ----
        s = MLP((self.out_dim, self.out_dim), activation="tanh", name="node_embed_out")(s)
        if not self.last_layer:
            v = nn.Dense(self.out_dim, name="vec_embed_out")(v)
        return s, v


class PNAEqStack(PAINNStack):
    is_edge_model: bool = True

    def embedding(self, graph: GraphBatch):
        inv, v, ctx = super().embedding(graph)
        d = safe_dist(ctx["dist"], graph.edge_mask, fill=self.cfg.radius * 0.5)
        rbf = sinc_expansion(d, self.cfg.num_radial, self.cfg.radius)
        ctx["pnaeq_rbf"] = rbf * cosine_cutoff(d, self.cfg.radius)
        return inv, v, ctx

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        stats = pnaeq_degree_stats(self.cfg.pna_deg)
        return PNAEqConv(
            node_size=in_dim,
            out_dim=out_dim,
            num_radial=self.cfg.num_radial,
            cutoff=self.cfg.radius,
            avg_deg_lin=stats["lin"],
            avg_deg_log=stats["log"],
            edge_dim=edge_dim,
            last_layer=last_layer,
            name=name,
        )


# ---------------------------------------------------------------------------
# DimeNet  (reference DIMEStack.py: directional message passing on triplets)
# ---------------------------------------------------------------------------


class DimeResidual(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        h = jax.nn.silu(nn.Dense(self.dim, name="lin1")(x))
        h = jax.nn.silu(nn.Dense(self.dim, name="lin2")(h))
        return x + h


class DimeConv(nn.Module):
    """One DimeNet++ layer: embedding block -> interaction-PP -> output-PP
    (DIMEStack.py:96-162; PyG InteractionPPBlock/OutputPPBlock semantics)."""

    hidden: int
    out_dim: int
    int_emb_size: int
    basis_emb_size: int
    out_emb_size: int
    num_before_skip: int
    num_after_skip: int
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        rbf, sbf = ctx["rbf"], ctx["sbf"]
        kj, ji = graph.trip_kj, graph.trip_ji
        E = graph.n_edge
        act = jax.nn.silu

        h = nn.Dense(self.hidden, name="lin_in")(inv)
        # embedding block (DIMEStack.py:282-328): per-edge state
        rbf_h = act(nn.Dense(self.hidden, name="emb_lin_rbf")(rbf))
        parts = [h[graph.receivers], h[graph.senders], rbf_h]
        ea = ctx.get("edge_attr")
        if self.edge_dim and ea is not None:
            parts.append(act(nn.Dense(self.hidden, name="emb_edge_lin")(ea.astype(h.dtype))))
        x = act(nn.Dense(self.hidden, name="emb_lin")(jnp.concatenate(parts, axis=-1)))

        # interaction-PP block
        x_ji = act(nn.Dense(self.hidden, name="lin_ji")(x))
        x_kj = act(nn.Dense(self.hidden, name="lin_kj")(x))
        r = nn.Dense(self.basis_emb_size, use_bias=False, name="lin_rbf1")(rbf)
        r = nn.Dense(self.hidden, use_bias=False, name="lin_rbf2")(r)
        x_kj = x_kj * r
        x_kj = act(nn.Dense(self.int_emb_size, use_bias=False, name="lin_down")(x_kj))
        s = nn.Dense(self.basis_emb_size, use_bias=False, name="lin_sbf1")(sbf)
        s = nn.Dense(self.int_emb_size, use_bias=False, name="lin_sbf2")(s)
        t = x_kj[kj] * s
        x_kj = segment_sum(t, ji, E, mask=graph.trip_mask)
        x_kj = act(nn.Dense(self.hidden, use_bias=False, name="lin_up")(x_kj))
        hh = x_ji + x_kj
        for i in range(self.num_before_skip):
            hh = DimeResidual(self.hidden, name=f"res_before_{i}")(hh)
        hh = act(nn.Dense(self.hidden, name="lin_skip")(hh)) + x
        for i in range(self.num_after_skip):
            hh = DimeResidual(self.hidden, name=f"res_after_{i}")(hh)

        # output-PP block: edges -> nodes
        o = nn.Dense(self.hidden, use_bias=False, name="out_lin_rbf")(rbf) * hh
        o = aggregate(graph, o, "sum", "receivers")
        o = nn.Dense(self.out_emb_size, use_bias=False, name="out_lin_up")(o)
        o = act(nn.Dense(self.out_emb_size, name="out_lin_0")(o))
        o = nn.Dense(self.out_dim, use_bias=False, name="out_lin")(o)
        return o, equiv


class DIMEStack(ConvStack):
    is_edge_model: bool = True

    def embedding(self, graph: GraphBatch):
        from hydragnn_tpu.models.spherical import spherical_basis

        inv, equiv, ctx = super().embedding(graph)
        assert graph.trip_kj is not None, "DimeNet requires precomputed triplets"
        vec, dist = edge_vectors_lengths(graph.pos, graph)
        d = safe_dist(dist, graph.edge_mask, fill=self.cfg.radius * 0.5)[:, 0]

        # angles (DIMEStack.py:176-186): ji = j->i, kj = k->j, ki = kj + ji
        pos_ji = vec[graph.trip_ji]
        pos_kj = vec[graph.trip_kj]
        pos_ki = pos_kj + pos_ji
        a = jnp.sum(pos_ji * pos_ki, axis=-1)
        cr = jnp.cross(pos_ji, pos_ki)
        b = jnp.sqrt(jnp.sum(cr * cr, axis=-1) + 1e-18)
        a = jnp.where(graph.trip_mask, a, 1.0)
        b = jnp.where(graph.trip_mask, b, 0.0)
        angle = jnp.arctan2(b, a)

        ctx["rbf"] = BesselBasisLayer(
            num_radial=self.cfg.num_radial,
            cutoff=self.cfg.radius,
            envelope_exponent=self.cfg.envelope_exponent,
            name="rbf",
        )(d)
        ctx["sbf"] = spherical_basis(
            d / self.cfg.radius,
            angle,
            graph.trip_kj,
            self.cfg.num_spherical,
            self.cfg.num_radial,
            self.cfg.envelope_exponent,
        )
        return inv, equiv, ctx

    def conv_layer_specs(self, embed_dim, edge_embed_dim) -> List[Dict]:
        cfg = self.cfg
        specs = []
        for i in range(cfg.num_conv_layers):
            in_dim = embed_dim if i == 0 else cfg.hidden_dim
            specs.append(
                {
                    "conv": dict(
                        in_dim=in_dim, out_dim=cfg.hidden_dim, edge_dim=edge_embed_dim
                    ),
                    "norm_dim": cfg.hidden_dim,
                    "norm": False,  # DIMEStack.py:85,93 Identity
                }
            )
        return specs

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        hidden = out_dim if in_dim == 1 else in_dim
        return DimeConv(
            hidden=hidden,
            out_dim=out_dim,
            int_emb_size=self.cfg.int_emb_size,
            basis_emb_size=self.cfg.basis_emb_size,
            out_emb_size=self.cfg.out_emb_size,
            num_before_skip=self.cfg.num_before_skip,
            num_after_skip=self.cfg.num_after_skip,
            edge_dim=edge_dim,
            name=name,
        )
