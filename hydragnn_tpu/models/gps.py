"""GPS global-attention layer (GraphGPS).

Re-derivation of the reference ``hydragnn/globalAtt/gps.py:32-159``:
  out = norm1(dropout(conv(x)) + x)            (local MPNN branch)
      + norm2(dropout(attn(x)) + x)            (global attention branch)
  out = norm3(out + FFN(out))

Reference quirk, reproduced by default (``gps.py:107,126``; no caller ever
passes ``graph_batch``): the dense self-attention treats the WHOLE padded
minibatch as one sequence, so attention spans across graphs. Set
``per_graph=True`` for the fixed block-diagonal behavior (flagged
divergence per SURVEY.md section 2.1).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.models.base import MaskedBatchNorm


def _mha(x, attn_mask, channels: int, heads: int):
    """Hand-rolled multi-head self-attention (torch.nn.MultiheadAttention
    semantics: in/out projections with bias).  Plain einsums so XLA compiles
    it quickly; swappable for the Pallas flash-attention kernel on large
    node counts.  Must be called from inside a compact ``__call__``."""
    N = x.shape[0]
    D = channels // heads
    qkv = nn.Dense(3 * channels, name="attn_in_proj")(x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(N, heads, D)
    k = k.reshape(N, heads, D)
    v = v.reshape(N, heads, D)
    scores = jnp.einsum("nhd,mhd->hnm", q, k) / jnp.sqrt(jnp.asarray(D, x.dtype))
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
    scores = jnp.where(attn_mask[None], scores, neg)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hnm,mhd->nhd", att, v).reshape(N, channels)
    return nn.Dense(channels, name="attn_out_proj")(out)


class GPSConv(nn.Module):
    channels: int
    conv: Optional[nn.Module]
    heads: int = 1
    dropout: float = 0.0
    attn_type: str = "multihead"
    per_graph: bool = False
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, graph: GraphBatch, inv, equiv, ctx, train: bool = False):
        if self.attn_type not in ("multihead", ""):
            raise ValueError(f"{self.attn_type} attention is not supported")
        C = self.channels
        deterministic = not train

        def drop(x, name):
            return nn.Dropout(self.dropout, deterministic=deterministic)(
                x, rng=None if deterministic else self.make_rng("dropout")
            )

        hs = []
        eq = equiv
        if self.conv is not None:
            h, eq = self.conv(graph, inv, equiv, ctx, train=train)
            h = drop(h, "d1")
            h = h + inv
            h = MaskedBatchNorm(C, name="norm1", axis_name=self.bn_axis)(
                h, graph.node_mask, train
            )
            hs.append(h)

        # global self-attention over all real nodes (one sequence == the
        # reference's to_dense_batch(x, None) behavior)
        if self.per_graph:
            same = graph.node_graph[:, None] == graph.node_graph[None, :]
            attn_mask = same & graph.node_mask[None, :] & graph.node_mask[:, None]
        else:
            attn_mask = jnp.broadcast_to(
                graph.node_mask[None, :], (graph.n_node, graph.n_node)
            )
        h = _mha(inv, attn_mask, C, self.heads)
        h = drop(h, "d2")
        h = h + inv
        h = MaskedBatchNorm(C, name="norm2", axis_name=self.bn_axis)(
            h, graph.node_mask, train
        )
        hs.append(h)

        out = sum(hs)
        ff = nn.Dense(2 * C, name="mlp_0")(out)
        ff = jax.nn.relu(ff)
        ff = drop(ff, "d3")
        ff = nn.Dense(C, name="mlp_1")(ff)
        ff = drop(ff, "d4")
        out = out + ff
        out = MaskedBatchNorm(C, name="norm3", axis_name=self.bn_axis)(
            out, graph.node_mask, train
        )
        return out, eq
