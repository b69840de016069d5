"""Invariant message-passing stacks: GIN, SAGE, MFC, CGCNN, PNA, GAT.

Each conv is a from-scratch JAX re-derivation of the corresponding PyG
operator semantics used by the reference stacks (``hydragnn/models/
{GIN,SAGE,MFC,CGCNN,PNA,GAT}Stack.py``), built on masked segment primitives:
gather(src) -> edge function -> segment-reduce(dst).  No torch/PyG code.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.models.base import MLP, ConvStack
from hydragnn_tpu.ops import segment_max, segment_mean, segment_sum
from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes, neighbor_reduce
from hydragnn_tpu.ops.segment import segment_count


# ---------------------------------------------------------------------------
# GIN  (reference GINStack.py:26-45; PyG GINConv with eps=100, train_eps)
# ---------------------------------------------------------------------------


class GINConv(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        eps = self.param("eps", lambda key: jnp.asarray(100.0, jnp.float32))
        agg = neighbor_reduce(graph, inv, "sum")
        h = (1.0 + eps) * inv + agg
        # PyG GINConv nn = Linear -> ReLU -> Linear (GINStack.py:28-34)
        h = MLP((self.out_dim, self.out_dim), activation="relu")(h)
        return h, equiv


class GINStack(ConvStack):
    is_edge_model: bool = False

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return GINConv(out_dim=out_dim, name=name)


# ---------------------------------------------------------------------------
# SAGE  (reference SAGEStack.py; PyG SAGEConv defaults: mean aggr)
# ---------------------------------------------------------------------------


class SAGEConv(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        agg = neighbor_reduce(graph, inv, "mean")
        out = nn.Dense(self.out_dim, name="lin_l")(agg) + nn.Dense(
            self.out_dim, use_bias=False, name="lin_r"
        )(inv)
        return out, equiv


class SAGEStack(ConvStack):
    is_edge_model: bool = False

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return SAGEConv(out_dim=out_dim, name=name)


# ---------------------------------------------------------------------------
# MFC  (reference MFCStack.py; PyG MFConv: per-degree root+neighbor weights)
# ---------------------------------------------------------------------------


class MFCConv(nn.Module):
    in_dim: int
    out_dim: int
    max_degree: int

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        deg = jnp.clip(graph.in_degree(), 0, self.max_degree)  # [N]
        agg = neighbor_reduce(graph, inv, "sum")
        nd = self.max_degree + 1
        # one weight bank per degree: [nd, in, out]
        w_nei = self.param(
            "w_nei", nn.initializers.lecun_normal(), (nd, self.in_dim, self.out_dim)
        )
        w_root = self.param(
            "w_root", nn.initializers.lecun_normal(), (nd, self.in_dim, self.out_dim)
        )
        b = self.param("bias", nn.initializers.zeros, (nd, self.out_dim))
        onehot = jax.nn.one_hot(deg, nd, dtype=inv.dtype)  # [N, nd]
        # per-node weight selection via one-hot matmul keeps everything on MXU
        wn = jnp.einsum("nd,dio->nio", onehot, w_nei)
        wr = jnp.einsum("nd,dio->nio", onehot, w_root)
        bb = onehot @ b
        out = (
            jnp.einsum("ni,nio->no", agg, wn)
            + jnp.einsum("ni,nio->no", inv, wr)
            + bb
        )
        return out, equiv


class MFCStack(ConvStack):
    is_edge_model: bool = False

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return MFCConv(
            in_dim=in_dim,
            out_dim=out_dim,
            max_degree=self.cfg.max_neighbours,
            name=name,
        )


# ---------------------------------------------------------------------------
# CGCNN  (reference CGCNNStack.py; PyG CGConv: gated residual conv, aggr add)
# ---------------------------------------------------------------------------


class CGConv(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        # lin_f/lin_s on concat[x_i, x_j, e] computed split per input block
        # (node blocks transformed once at nodes, gathered per edge)
        f_i = nn.Dense(self.channels, name="lin_f_i")(inv)  # bias here
        f_j = nn.Dense(self.channels, use_bias=False, name="lin_f_j")(inv)
        s_i = nn.Dense(self.channels, name="lin_s_i")(inv)
        s_j = nn.Dense(self.channels, use_bias=False, name="lin_s_j")(inv)
        zf = gather_nodes(graph, f_j, "senders") + gather_nodes(graph, f_i, "receivers")
        zs_ = gather_nodes(graph, s_j, "senders") + gather_nodes(graph, s_i, "receivers")
        ea = ctx.get("edge_attr")
        if ea is not None:
            ea = ea.astype(inv.dtype)
            zf = zf + nn.Dense(self.channels, use_bias=False, name="lin_f_e")(ea)
            zs_ = zs_ + nn.Dense(self.channels, use_bias=False, name="lin_s_e")(ea)
        gate = jax.nn.sigmoid(zf)
        core = jax.nn.softplus(zs_)
        msg = gate * core
        agg = aggregate(graph, msg, "sum", "receivers")
        return inv + agg, equiv


class CGCNNStack(ConvStack):
    is_edge_model: bool = True
    # CGConv keeps channel width == input width (CGCNNStack.py:33-46)
    fixed_width: bool = True

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        return CGConv(channels=in_dim, name=name)


# ---------------------------------------------------------------------------
# PNA  (reference PNAStack.py: aggregators mean/min/max/std, scalers
#       identity/amplification/attenuation/linear, degree histogram)
# ---------------------------------------------------------------------------


def pna_degree_stats(deg_hist) -> Dict[str, float]:
    """avg-degree statistics from the training-set degree histogram
    (PyG PNAConv convention: bins weighted by counts; log uses d+1)."""
    hist = np.asarray(deg_hist, dtype=np.float64)
    bins = np.arange(len(hist), dtype=np.float64)
    total = max(hist.sum(), 1.0)
    return {
        "lin": float((bins * hist).sum() / total),
        "log": float((np.log(bins + 1.0) * hist).sum() / total),
    }


class PNAConv(nn.Module):
    in_dim: int
    out_dim: int
    avg_deg_lin: float
    avg_deg_log: float
    edge_dim: Optional[int] = None

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        E, N = graph.n_edge, graph.n_node
        # pre_layers=1, towers=1, divide_input=False (PNAStack.py:44-54).
        # The single pre-linear on concat[x_i, x_j, e] is computed split:
        # node-dependent partial products run over the N nodes on the MXU
        # and are gathered per edge -- identical math, ~3x less edge-dim
        # matmul work and no [E, 3F] intermediate.
        h_i = nn.Dense(self.in_dim, name="pre_nn_i")(inv)  # carries the bias
        h_j = nn.Dense(self.in_dim, use_bias=False, name="pre_nn_j")(inv)
        ea = ctx.get("edge_attr")
        e_term = None
        if self.edge_dim is not None and self.edge_dim > 0 and ea is not None:
            e_emb = nn.Dense(self.in_dim, name="edge_encoder")(ea.astype(inv.dtype))
            e_term = nn.Dense(self.in_dim, use_bias=False, name="pre_nn_e")(e_emb)

        srt = graph.edges_sorted
        from hydragnn_tpu.ops.fused_gather import (
            fused_pna_aggregate,
            has_window_plans,
        )

        if has_window_plans(graph):
            # all four aggregations in ONE fused kernel pass: h never
            # exists in HBM (ops/fused_gather.py).  Narrow feature dims
            # (layer 0: in_dim = input_dim, often 1) are padded to the
            # 128-lane tile at NODE level — zero pad columns aggregate to
            # zeros and are sliced off; without this, layer 0 fell back
            # to the unfused edge-space path (~13 ms of the r03 PNA step,
            # profiling/BYTES_pna_r3.json)
            cnt = jnp.maximum(graph.rcv_count, 1.0).astype(inv.dtype)[:, None]
            F0 = h_i.shape[-1]
            pad = (-F0) % 128
            if pad:
                h_i = jnp.pad(h_i, ((0, 0), (0, pad)))
                h_j = jnp.pad(h_j, ((0, 0), (0, pad)))
                if e_term is not None:
                    e_term = jnp.pad(e_term, ((0, 0), (0, pad)))
            s, s2, mn, mx = fused_pna_aggregate(graph, h_i, h_j, e_term)
            if pad:
                s, s2, mn, mx = (
                    a[:, :F0] for a in (s, s2, mn, mx)
                )
            mean1, mean2 = s / cnt, s2 / cnt
        else:
            h = gather_nodes(graph, h_i, "receivers") + gather_nodes(
                graph, h_j, "senders"
            )
            if e_term is not None:
                h = h + e_term
            # mean and E[x^2] (for std) ride the scatter-free pallas path
            # in one double-width pass; min/max in one fused extrema pass
            m12 = aggregate(
                graph, jnp.concatenate([h, h * h], axis=-1), "mean", "receivers"
            )
            mean1, mean2 = jnp.split(m12, 2, axis=-1)
            from hydragnn_tpu.ops.aggregate import segment_minmax

            mn, mx = segment_minmax(graph, h)  # one HBM pass, both extrema
        std = jnp.sqrt(jax.nn.relu(mean2 - mean1 * mean1) + 1e-5)
        aggs = [mean1, mn, mx, std]
        out = jnp.concatenate(aggs, axis=-1)  # [N, 4*in]

        if graph.rcv_count is not None:
            deg = graph.rcv_count.astype(inv.dtype)
        else:
            deg = segment_count(
                graph.receivers, N, mask=graph.edge_mask, dtype=inv.dtype,
                indices_are_sorted=srt,
            )
        # PyG clamps deg to >= 1 for the inverse scalers; this also keeps
        # padding rows (deg 0) finite so masked-out cotangents stay NaN-free
        logd = jnp.log(deg + 1.0)
        logd_c = jnp.log(jnp.maximum(deg, 1.0) + 1.0)
        amp = (logd / self.avg_deg_log)[:, None]
        att = (self.avg_deg_log / logd_c)[:, None]
        linear = (deg / max(self.avg_deg_lin, 1e-12))[:, None]
        scaled = jnp.concatenate([out, out * amp, out * att, out * linear], axis=-1)

        # post tower: concat root features (PyG PNAConv), post_layers=1
        z = jnp.concatenate([inv, scaled], axis=-1)
        z = nn.Dense(self.out_dim, name="post_nn")(z)
        return nn.Dense(self.out_dim, name="lin")(z), equiv


class PNAStack(ConvStack):
    is_edge_model: bool = True

    def make_conv(self, in_dim, out_dim, edge_dim=None, last_layer=False, name=None):
        stats = pna_degree_stats(self.cfg.pna_deg)
        return PNAConv(
            in_dim=in_dim,
            out_dim=out_dim,
            avg_deg_lin=stats["lin"],
            avg_deg_log=stats["log"],
            edge_dim=edge_dim,
            name=name,
        )


# ---------------------------------------------------------------------------
# GAT  (reference GATStack.py: GATv2, heads=6, slope=0.05, self-loops,
#       concat heads on hidden layers, average on the last)
# ---------------------------------------------------------------------------


class GATv2Conv(nn.Module):
    out_dim: int
    heads: int = 6
    negative_slope: float = 0.05
    concat: bool = True
    dropout: float = 0.25
    edge_dim: Optional[int] = None
    # force training (grad-of-grad) selects the forward-mode-exact
    # custom_jvp attention impl; plain training gets the fused
    # custom_vjp backward (ops/gat_attention.py, MACE-kernel pattern)
    force_grad: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        H, F = self.heads, self.out_dim
        N = graph.n_node
        x_l_flat = nn.Dense(H * F, name="lin_l")(inv)  # source proj
        x_r_flat = nn.Dense(H * F, name="lin_r")(inv)  # target proj
        x_l = x_l_flat.reshape(N, H, F)
        x_r = x_r_flat.reshape(N, H, F)
        att = self.param("att", nn.initializers.lecun_normal(), (1, H, F))

        ea = ctx.get("edge_attr")
        use_edge = self.edge_dim is not None and self.edge_dim > 0 and ea is not None
        if use_edge:
            lin_edge = nn.Dense(H * F, use_bias=False, name="lin_edge")

        # self loops (add_self_loops=True): virtual edge (i,i); edge_attr fill
        # 'mean' = mean of incoming real edge attrs (PyG fill_value="mean")
        self_pre = x_l + x_r
        if use_edge:
            ea_mean = segment_mean(
                ea.astype(inv.dtype), graph.receivers, N, mask=graph.edge_mask,
                indices_are_sorted=graph.edges_sorted,
            )
            self_pre = self_pre + lin_edge(ea_mean).reshape(N, H, F)
        self_logits = jnp.sum(
            jax.nn.leaky_relu(self_pre, self.negative_slope) * att, axis=-1
        )  # [N, H]

        from hydragnn_tpu.ops.fused_gather import has_window_plans

        keys = None
        if train and self.dropout > 0.0:
            keys = jax.random.split(self.make_rng("dropout"))
        keep = 1.0 - self.dropout

        if has_window_plans(graph) and not use_edge:
            # fused SDDMM -> online segment-softmax -> weighted aggregate
            # (ops/gat_attention.py): logits computed in VMEM, no
            # [E, H*F] HBM tensors; self-loop term folded in node-level,
            # backward fused too unless force training needs forward-mode
            from hydragnn_tpu.ops.gat_attention import _HP, gat_attention

            mask_e = smask = None
            if keys is not None:
                E = graph.n_edge
                mask_e = jnp.zeros((E, _HP), x_l_flat.dtype)
                mask_e = mask_e.at[:, :H].set(
                    jax.random.bernoulli(keys[0], keep, (E, H)).astype(
                        x_l_flat.dtype
                    )
                    / keep
                )
                smask = jax.random.bernoulli(keys[1], keep, (N, H)).astype(
                    x_l_flat.dtype
                ) / keep
            out_flat = gat_attention(
                graph, x_l_flat, x_r_flat, att[0], self.negative_slope,
                self_logits, mask_e, smask,
                impl="jvp" if self.force_grad else "vjp",
            )
            out = out_flat.reshape(N, H, F).astype(x_l.dtype)
        else:
            # lane-aligned flat gathers (scatter-free backward via
            # gather_nodes)
            pre = (
                gather_nodes(graph, x_l_flat, "senders")
                + gather_nodes(graph, x_r_flat, "receivers")
            ).reshape(-1, H, F)  # [E, H, F]
            if use_edge:
                e_proj = lin_edge(ea.astype(inv.dtype)).reshape(-1, H, F)
                pre = pre + e_proj
            logits = jnp.sum(
                jax.nn.leaky_relu(pre, self.negative_slope) * att, axis=-1
            )  # [E, H]

            # segment softmax over {incoming edges} U {self loop} per node
            neg = jnp.finfo(logits.dtype).min
            logits_m = jnp.where(graph.edge_mask[:, None], logits, neg)
            edge_max = segment_max(
                logits_m, graph.receivers, N, mask=graph.edge_mask,
                empty_value=neg, indices_are_sorted=graph.edges_sorted,
            )
            m = jnp.maximum(edge_max, self_logits)  # [N, H]
            exp_e = jnp.where(
                graph.edge_mask[:, None],
                jnp.exp(logits - m[graph.receivers]),
                0.0,
            )
            exp_s = jnp.exp(self_logits - m)
            denom = segment_sum(
                exp_e, graph.receivers, N,
                indices_are_sorted=graph.edges_sorted,
            ) + exp_s  # [N, H]
            denom = jnp.maximum(denom, 1e-16)
            # normalized attention first, dropout after (PyG GATv2
            # semantics: alphas are dropped WITHOUT renormalizing)
            alpha_e = exp_e / denom[graph.receivers]
            alpha_s = exp_s / denom
            if keys is not None:
                alpha_e = alpha_e * jax.random.bernoulli(
                    keys[0], keep, alpha_e.shape
                ) / keep
                alpha_s = alpha_s * jax.random.bernoulli(
                    keys[1], keep, alpha_s.shape
                ) / keep

            xl_e = gather_nodes(graph, x_l_flat, "senders").reshape(-1, H, F)
            num_flat = aggregate(
                graph,
                (alpha_e[..., None] * xl_e).reshape(-1, H * F),
                "sum",
                "receivers",
            )
            out = (
                num_flat.reshape(N, H, F) + alpha_s[..., None] * x_l
            )  # [N, H, F]

        bias_dim = H * F if self.concat else F
        bias = self.param("bias", nn.initializers.zeros, (bias_dim,))
        if self.concat:
            return out.reshape(N, H * F) + bias, equiv
        return jnp.mean(out, axis=1) + bias, equiv


class GATStack(ConvStack):
    is_edge_model: bool = True

    def conv_layer_specs(self, embed_dim, edge_embed_dim) -> List[Dict]:
        """GATStack.py:41-112: concat heads (width hidden*heads) on all but
        the last layer; with GPS, concat output is projected back to hidden."""
        cfg = self.cfg
        heads = 6
        specs = []
        gps = bool(cfg.global_attn_engine)
        hidden_in = cfg.hidden_dim if gps else cfg.hidden_dim * heads
        norm_hidden = cfg.hidden_dim if gps else cfg.hidden_dim * heads
        specs.append(
            {
                "conv": dict(
                    in_dim=embed_dim,
                    out_dim=cfg.hidden_dim,
                    edge_dim=edge_embed_dim,
                    concat=True,
                ),
                "norm_dim": norm_hidden,
            }
        )
        for _ in range(cfg.num_conv_layers - 2):
            specs.append(
                {
                    "conv": dict(
                        in_dim=hidden_in,
                        out_dim=cfg.hidden_dim,
                        edge_dim=edge_embed_dim,
                        concat=True,
                    ),
                    "norm_dim": norm_hidden,
                }
            )
        specs.append(
            {
                "conv": dict(
                    in_dim=hidden_in,
                    out_dim=cfg.hidden_dim,
                    edge_dim=edge_embed_dim,
                    concat=False,
                ),
                "norm_dim": cfg.hidden_dim,
            }
        )
        return specs[: max(1, cfg.num_conv_layers)]

    def make_conv(
        self, in_dim, out_dim, edge_dim=None, last_layer=False, concat=None, name=None
    ):
        if concat is None:
            concat = not last_layer
        conv = GATv2Conv(
            out_dim=out_dim,
            heads=6,
            negative_slope=0.05,
            concat=concat,
            dropout=self.cfg.dropout,
            edge_dim=edge_dim,
            force_grad=self.cfg.force_grad,
            name=name,
        )
        if self.cfg.global_attn_engine and concat:
            return _GATProjected(conv=conv, hidden_dim=self.cfg.hidden_dim,
                                 name=(name + "_proj") if name else None)
        return conv


class _GATProjected(nn.Module):
    """GAT conv followed by a Linear back to hidden_dim (GATStack.py:185-188,
    needed so GPS sees a constant channel width)."""

    conv: nn.Module
    hidden_dim: int

    @nn.compact
    def __call__(self, graph, inv, equiv, ctx, train: bool = False):
        out, eq = self.conv(graph, inv, equiv, ctx, train=train)
        return nn.Dense(self.hidden_dim, name="out_lin")(out), eq
