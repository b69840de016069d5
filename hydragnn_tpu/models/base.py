"""Shared multi-head message-passing scaffold.

TPU-native re-derivation of the reference's abstract ``Base`` stack
(``hydragnn/models/Base.py:36-906``): embedding -> N x (conv [+ global
attention] -> graph-attr conditioning -> BatchNorm -> activation) -> graph
pooling -> per-head decoders (graph MLP heads, node MLP/conv heads) with
multi-branch (per-dataset) routing and weighted multi-task loss.

Differences by design (not omissions):
  * All computation is masked/padded static-shape (see graphs.GraphBatch);
    the reference's dynamic-shape torch ops have no TPU analogue.
  * Multi-branch head routing (``Base.py:764-841``) computes every branch and
    selects by ``dataset_id`` with ``jnp.where`` -- branch count is small and
    static, divergence-free selection beats dynamic masking under XLA.
  * BatchNorm is mask-aware; under pjit with a global batch its statistics
    are global, which subsumes the reference's SyncBatchNorm conversion
    (``distributed.py:416``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hydragnn_tpu.graphs import GraphBatch
from hydragnn_tpu.ops import segment_sum


def halo_refresh(graph: GraphBatch, x: jnp.ndarray) -> jnp.ndarray:
    """Giant-graph halo view (parallel/halo.py): overwrite this shard's halo
    rows (the tail S*h rows of the extended node array) with the owners'
    current values via one tiled all_to_all over ``graph.halo_axis``.  No-op
    on ordinary batches.  Differentiable — the transpose is the reverse
    exchange plus the local-row passthrough."""
    if graph.halo_axis is None or graph.halo_send_idx is None:
        return x
    S, h = graph.halo_send_idx.shape
    block = x.shape[0] - S * h
    send = jnp.where(
        graph.halo_send_mask[..., None], x[graph.halo_send_idx], 0
    )
    recv = jax.lax.all_to_all(
        send.reshape(S * h, x.shape[-1]), graph.halo_axis, 0, 0, tiled=True
    )
    return jnp.concatenate([x[:block], recv.astype(x.dtype)], axis=0)


# ---------------------------------------------------------------------------
# selections (reference: hydragnn/utils/model/model.py activation/loss selection)
# ---------------------------------------------------------------------------

_ACTIVATIONS: Dict[str, Callable] = {
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "prelu": lambda x: jax.nn.leaky_relu(x, 0.25),
    "elu": jax.nn.elu,
    "lrelu_01": lambda x: jax.nn.leaky_relu(x, 0.1),
    "lrelu_025": lambda x: jax.nn.leaky_relu(x, 0.25),
    "lrelu_05": lambda x: jax.nn.leaky_relu(x, 0.5),
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
}


def activation_function_selection(name: str) -> Callable:
    key = (name or "relu").lower()
    if key not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation function: {name}")
    return _ACTIVATIONS[key]


def masked_error_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    loss_type: str = "mse",
) -> jnp.ndarray:
    """Masked analogue of the reference loss selection ('mse'|'mae'|'rmse').

    Averages over real (mask=True) rows x all feature columns, exactly like
    an unmasked torch ``F.mse_loss`` over the unpadded tensors.
    """
    # jnp.where (not multiply-by-mask) so NaNs in padding rows cannot
    # poison the sum via 0 * NaN; accumulate in fp32 even under bf16 compute
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    diff = jnp.where(mask[:, None], pred - target, 0.0)
    count = jnp.maximum(jnp.sum(mask.astype(pred.dtype)) * pred.shape[-1], 1.0)
    lt = loss_type.lower()
    if lt == "mse":
        return jnp.sum(diff * diff) / count
    if lt in ("mae", "l1"):
        return jnp.sum(jnp.abs(diff)) / count
    if lt == "rmse":
        return jnp.sqrt(jnp.sum(diff * diff) / count + 1e-16)
    raise ValueError(f"Unknown loss function type: {loss_type}")


def masked_gaussian_nll(
    pred: jnp.ndarray,
    var: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """torch.nn.GaussianNLLLoss semantics (0.5*(log var + err^2/var), mean)."""
    var = jnp.maximum(var, eps)
    err2 = (pred - target) ** 2
    nll = 0.5 * (jnp.log(var) + err2 / var)
    nll = jnp.where(mask[:, None], nll, 0.0)
    count = jnp.maximum(jnp.sum(mask.astype(pred.dtype)) * pred.shape[-1], 1.0)
    return jnp.sum(nll) / count


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HeadArch:
    """One branch's head architecture (reference ``output_heads`` schema)."""

    num_sharedlayers: int = 2
    dim_sharedlayers: int = 10
    num_headlayers: int = 2
    dim_headlayers: Tuple[int, ...] = (10, 10)
    type: str = "mlp"  # node heads: mlp | mlp_per_node | conv


@dataclasses.dataclass(frozen=True)
class StackConfig:
    """All architecture hyperparameters of a stack (the analogue of the
    ``create_model`` keyword surface, ``hydragnn/models/create.py:112-164``)."""

    input_dim: int
    hidden_dim: int
    output_dim: Tuple[int, ...]  # per-head output dims
    output_type: Tuple[str, ...]  # per-head "graph"|"node"
    # normalized heads: branch-name -> HeadArch, per level
    graph_branches: Tuple[Tuple[str, HeadArch], ...] = ()
    node_branches: Tuple[Tuple[str, HeadArch], ...] = ()
    activation: str = "relu"
    loss_function_type: str = "mse"
    task_weights: Tuple[float, ...] = ()
    num_conv_layers: int = 2
    edge_dim: Optional[int] = None
    graph_pooling: str = "mean"  # mean | add | max
    equivariance: bool = False
    num_nodes: Optional[int] = None  # for mlp_per_node heads
    # conditioning
    use_graph_attr_conditioning: bool = False
    graph_attr_conditioning_mode: str = "concat_node"
    graph_attr_dim: int = 0
    # global attention
    global_attn_engine: str = ""
    global_attn_type: str = ""
    global_attn_heads: int = 8
    pe_dim: int = 1
    dropout: float = 0.25
    # geometry
    radius: float = 5.0
    max_neighbours: int = 100
    # radial basis family (PNAPlus/SchNet/DimeNet/MACE)
    num_radial: int = 6
    radial_type: str = "bessel"
    distance_transform: str = "None"
    envelope_exponent: int = 5
    num_gaussians: int = 50
    num_filters: int = 126
    num_spherical: int = 7
    num_before_skip: int = 1
    num_after_skip: int = 2
    int_emb_size: int = 64
    basis_emb_size: int = 8
    out_emb_size: int = 128
    # PNA
    pna_deg: Tuple[int, ...] = ()
    # equivariant family
    max_ell: int = 1
    node_max_ell: int = 1
    correlation: Tuple[int, ...] = (2,)
    # MACE product basis: "umatrix" = U-matrix symmetric contraction (the
    # reference algorithm, symmetric_contraction.py:29-239, re-derived
    # numerically); "cg" = iterated-CG products (documented alternative)
    product_basis: str = "umatrix"
    avg_num_neighbors: float = 10.0
    num_elements: int = 118
    # misc
    freeze_conv: bool = False
    initial_bias: Optional[float] = None
    # set True when training DIFFERENTIATES THROUGH forces (-dE/dpos in
    # the loss): ops with custom_vjp fast backwards switch to their
    # jvp-composable variants so reverse-over-reverse stays exact
    # (ops/mace_tp.py docstring); api.run_training sets it from the MLIP
    # force weight
    force_grad: bool = False
    conv_checkpointing: bool = False
    var_output: bool = False  # GaussianNLLLoss two-channel output
    # SyncBatchNorm analogue: mesh axis to psum batch statistics over when
    # the forward runs inside shard_map (distributed.py:416)
    bn_sync_axis: Optional[str] = None

    @property
    def num_heads(self) -> int:
        return len(self.output_dim)

    @property
    def num_branches(self) -> int:
        return max(1, len(self.graph_branches) or len(self.node_branches))

    @property
    def loss_weights(self) -> Tuple[float, ...]:
        # normalize by abs-sum (reference Base.py:131-132)
        w = self.task_weights or tuple(1.0 for _ in self.output_dim)
        s = sum(abs(x) for x in w)
        return tuple(x / s for x in w)


def normalize_branches(head_cfg: Any) -> Tuple[Tuple[str, HeadArch], ...]:
    """Convert legacy {'num_headlayers': ...} or branch-list formats into a
    tuple of (branch_name, HeadArch); mirrors the legacy->multibranch
    conversion in reference ``utils/model/model.py:314-349``."""
    if head_cfg is None:
        return ()
    if isinstance(head_cfg, dict):  # legacy single-branch
        branches = [{"type": "branch-0", "architecture": head_cfg}]
    else:
        branches = list(head_cfg)
    out = []
    for b in branches:
        arch = b["architecture"]
        out.append(
            (
                b["type"],
                HeadArch(
                    num_sharedlayers=int(arch.get("num_sharedlayers", 2)),
                    dim_sharedlayers=int(arch.get("dim_sharedlayers", 10)),
                    num_headlayers=int(arch.get("num_headlayers", 2)),
                    dim_headlayers=tuple(arch.get("dim_headlayers", (10, 10))),
                    type=str(arch.get("type", "mlp")),
                ),
            )
        )
    return tuple(out)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class MLP(nn.Module):
    """Dense stack: Linear -> act -> ... -> Linear(out) (no final act unless
    final_activation)."""

    features: Sequence[int]
    activation: str = "relu"
    final_activation: bool = False
    final_bias_init: Optional[float] = None  # UQ initial_bias (Base.py:501-506)

    @nn.compact
    def __call__(self, x):
        act = activation_function_selection(self.activation)
        for i, f in enumerate(self.features):
            last = i == len(self.features) - 1
            if last and self.final_bias_init is not None:
                x = nn.Dense(
                    f,
                    name=f"dense_{i}",
                    bias_init=nn.initializers.constant(self.final_bias_init),
                )(x)
            else:
                x = nn.Dense(f, name=f"dense_{i}")(x)
            if not last or self.final_activation:
                x = act(x)
        return x


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over real nodes only (torch defaults: eps=1e-5,
    momentum=0.1, biased var for normalization, unbiased for running stats).

    Replaces PyG ``BatchNorm`` in the reference conv loop (``Base.py:454``)
    with padding-aware statistics; under pjit the reductions are global,
    subsuming SyncBatchNorm.  Under ``shard_map`` set ``axis_name`` to sync
    batch statistics across the mesh axis (the SyncBatchNorm conversion,
    ``distributed.py:416``) via psum of (count, sum, sum-of-squares).
    """

    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        if train:
            m = mask[:, None]
            cnt = jnp.sum(mask.astype(x.dtype))
            sx = jnp.sum(jnp.where(m, x, 0.0), axis=0)
            sxx = jnp.sum(jnp.where(m, x * x, 0.0), axis=0)
            if self.axis_name is not None:
                cnt = jax.lax.psum(cnt, self.axis_name)
                sx = jax.lax.psum(sx, self.axis_name)
                sxx = jax.lax.psum(sxx, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = sx / cnt
            var = jnp.maximum(sxx / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (
                    1.0 - self.momentum
                ) * ra_mean.value + self.momentum * mean.astype(jnp.float32)
                ra_var.value = (
                    1.0 - self.momentum
                ) * ra_var.value + self.momentum * unbiased.astype(jnp.float32)
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)

        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class GraphConditioner(nn.Module):
    """FiLM / concat_node / fuse_pool conditioning on ``graph_attr``
    (reference ``Base.py:249-444``)."""

    mode: str
    hidden_dim: int
    graph_attr_dim: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, inv, graph: GraphBatch):
        ga = graph.graph_attr
        if ga is None:
            raise ValueError("use_graph_attr_conditioning=True but graph_attr is None")
        ga = ga.astype(inv.dtype)
        if self.mode == "film":
            hidden = max(self.hidden_dim, self.graph_attr_dim)
            ss = MLP(
                (hidden, 2 * self.hidden_dim),
                activation=self.activation,
            )(ga)
            scale, shift = jnp.split(ss, 2, axis=-1)
            scale = jnp.tanh(scale)
            ch = inv.shape[-1]
            if ch != self.hidden_dim:
                factor = ch // self.hidden_dim
                scale = jnp.repeat(scale, factor, axis=-1)
                shift = jnp.repeat(shift, factor, axis=-1)
            return inv * (1.0 + scale[graph.node_graph]) + shift[graph.node_graph]
        if self.mode == "concat_node":
            fused = jnp.concatenate([inv, ga[graph.node_graph]], axis=-1)
            return nn.Dense(inv.shape[-1])(fused)
        raise ValueError(f"bad conditioning mode {self.mode}")


class PoolConditioner(nn.Module):
    """fuse_pool branch of graph conditioning (``Base.py:393-444``)."""

    activation: str = "relu"

    @nn.compact
    def __call__(self, x_graph, graph: GraphBatch):
        ga = graph.graph_attr.astype(x_graph.dtype)
        ch = x_graph.shape[-1]
        fused = jnp.concatenate([x_graph, ga], axis=-1)
        return MLP((ch, ch), activation=self.activation)(fused)


class MLPNode(nn.Module):
    """Node-level MLP head (reference ``Base.py:912-979``), 'mlp' and
    'mlp_per_node' variants."""

    output_dim: int
    hidden_dims: Tuple[int, ...]
    node_type: str
    activation: str
    num_nodes: Optional[int] = None

    @nn.compact
    def __call__(self, x, graph: GraphBatch):
        feats = tuple(self.hidden_dims) + (self.output_dim,)
        if self.node_type == "mlp":
            return MLP(feats, activation=self.activation)(x)
        # mlp_per_node: one MLP per lattice site (fixed-size graphs only)
        assert self.num_nodes is not None
        outs = []
        for i in range(self.num_nodes):
            outs.append(MLP(feats, activation=self.activation, name=f"node_mlp_{i}")(x))
        stacked = jnp.stack(outs, axis=0)  # [num_nodes, N, out]
        # node i within its graph uses mlp[i]
        idx_in_graph = _node_index_within_graph(graph)
        idx_in_graph = jnp.clip(idx_in_graph, 0, self.num_nodes - 1)
        return jnp.take_along_axis(
            stacked, idx_in_graph[None, :, None], axis=0
        )[0]


def _node_index_within_graph(graph: GraphBatch) -> jnp.ndarray:
    """Position of each node within its own graph, [N] int32."""
    # cumulative count of nodes per graph before each node
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(graph.n_per_graph.astype(jnp.int32))[:-1]]
    )
    arange = jnp.arange(graph.n_node, dtype=jnp.int32)
    return arange - starts[graph.node_graph]


# ---------------------------------------------------------------------------
# the scaffold
# ---------------------------------------------------------------------------


class ConvStack(nn.Module):
    """Abstract multi-headed GNN stack. Subclasses provide ``make_conv``
    (a flax module mapping (graph, inv, equiv, ctx) -> (inv', equiv')) and
    optionally override ``embedding``/``is_edge_model``.
    """

    cfg: StackConfig

    is_edge_model: bool = False
    # if True the stack uses the same dim in/out for convs (CGCNN)
    fixed_width: bool = False
    # if True this stack manages its own readout (MACE per-layer decoders)
    custom_forward: bool = False

    # ------------------------------------------------------------------ hooks
    def make_conv(self, in_dim: int, out_dim: int, edge_dim=None, last_layer=False, name=None):
        raise NotImplementedError

    def conv_layer_specs(self, embed_dim: int, edge_embed_dim) -> List[Dict]:
        """Per-layer conv construction plan (``Base.py:446-463``). Each entry:
        ``{"conv": kwargs for make_conv, "norm_dim": BatchNorm width}``.
        GAT overrides this to widen hidden layers by its head count."""
        cfg = self.cfg
        width = (
            cfg.input_dim
            if (self.fixed_width and not cfg.global_attn_engine)
            else cfg.hidden_dim
        )
        specs = [
            {
                "conv": dict(in_dim=embed_dim, out_dim=width, edge_dim=edge_embed_dim),
                "norm_dim": width,
            }
        ]
        for _ in range(cfg.num_conv_layers - 1):
            specs.append(
                {
                    "conv": dict(in_dim=width, out_dim=width, edge_dim=edge_embed_dim),
                    "norm_dim": width,
                }
            )
        return specs

    def embedding(self, graph: GraphBatch) -> Tuple[jnp.ndarray, jnp.ndarray, Dict]:
        """Default embedding (``Base.py:465-493``): invariant = node features,
        equivariant = positions; ctx carries per-edge data for the convs."""
        ctx: Dict[str, Any] = {}
        if self.use_edge_attr():
            ctx["edge_attr"] = graph.edge_attr
        return graph.x, graph.pos, ctx

    def use_edge_attr(self) -> bool:
        return bool(
            self.is_edge_model and self.cfg.edge_dim is not None and self.cfg.edge_dim > 0
        )

    # ------------------------------------------------------------- embedding
    def _maybe_gps_embed(self, graph: GraphBatch, inv, ctx):
        """GPS input embeddings (``Base.py:203-215,477-491``): node/pos and
        edge/rel-pe linear embeddings into hidden_dim."""
        cfg = self.cfg
        if not cfg.global_attn_engine:
            return inv, ctx
        x = nn.Dense(cfg.hidden_dim, use_bias=False, name="pos_emb")(graph.pe)
        if cfg.input_dim:
            xe = nn.Dense(cfg.hidden_dim, use_bias=False, name="node_emb")(
                inv.astype(x.dtype)
            )
            x = nn.Dense(cfg.hidden_dim, use_bias=False, name="node_lin")(
                jnp.concatenate([xe, x], axis=-1)
            )
        if self.is_edge_model:
            e = nn.Dense(cfg.hidden_dim, use_bias=False, name="rel_pos_emb")(
                graph.rel_pe
            )
            if self.use_edge_attr():
                ee = nn.Dense(cfg.hidden_dim, use_bias=False, name="edge_emb")(
                    ctx["edge_attr"]
                )
                e = nn.Dense(cfg.hidden_dim, use_bias=False, name="edge_lin")(
                    jnp.concatenate([ee, e], axis=-1)
                )
            ctx = dict(ctx)
            ctx["edge_attr"] = e
        return x, ctx

    def _wrap_global_attn(self, conv, name):
        cfg = self.cfg
        if cfg.global_attn_engine == "GPS":
            from hydragnn_tpu.models.gps import GPSConv

            return GPSConv(
                channels=cfg.hidden_dim,
                conv=conv,
                heads=cfg.global_attn_heads,
                dropout=cfg.dropout,
                attn_type=cfg.global_attn_type or "multihead",
                bn_axis=cfg.bn_sync_axis,
                name=name,
            )
        return conv

    # --------------------------------------------------------------- forward
    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False):
        cfg = self.cfg
        act = activation_function_selection(cfg.activation)

        if graph.halo_axis is not None and graph.halo_send_idx is not None:
            # giant-graph halo view: pull the owners' positions INSIDE the
            # differentiated computation so MLIP forces (-dE/dpos) receive
            # the cross-shard coupling through the exchange's transpose
            graph = graph.replace(pos=halo_refresh(graph, graph.pos))

        inv, equiv, ctx = self.embedding(graph)
        inv, ctx = self._maybe_gps_embed(graph, inv, ctx)

        embed_dim = cfg.hidden_dim if cfg.global_attn_engine else cfg.input_dim
        edge_embed_dim = (
            cfg.hidden_dim
            if (cfg.global_attn_engine and self.is_edge_model)
            else cfg.edge_dim
        )

        # conv trunk (Base.py:446-463, 707-726)
        specs = self.conv_layer_specs(embed_dim, edge_embed_dim)
        for i, spec in enumerate(specs):
            if i > 0:
                # giant-graph halo view: per-node ops keep halo copies
                # consistent automatically, but a conv's output at halo rows
                # is garbage (their in-edges live on the owner shard) — pull
                # fresh values with one tiled all_to_all before reuse
                inv = halo_refresh(graph, inv)
            conv = self._wrap_global_attn(
                self.make_conv(name=f"conv_{i}", **spec["conv"]),
                name=f"gps_{i}",
            )
            width = spec["norm_dim"]
            if cfg.conv_checkpointing:
                # rematerialize conv activations in backward (reference
                # Base.py:714-721 torch.utils.checkpoint equivalent)
                inv, equiv = nn.remat(
                    lambda m, g, a, b, c: m(g, a, b, c, train=train)
                )(conv, graph, inv, equiv, ctx)
            else:
                inv, equiv = conv(graph, inv, equiv, ctx, train=train)
            if cfg.use_graph_attr_conditioning and cfg.graph_attr_conditioning_mode in (
                "film",
                "concat_node",
            ):
                inv = GraphConditioner(
                    mode=cfg.graph_attr_conditioning_mode,
                    hidden_dim=width,
                    graph_attr_dim=cfg.graph_attr_dim,
                    activation=cfg.activation,
                    name=f"cond_{i}",
                )(inv, graph)
            if spec.get("norm", True):
                inv = MaskedBatchNorm(
                    width, name=f"norm_{i}", axis_name=cfg.bn_sync_axis
                )(inv, graph.node_mask, train)
            inv = act(inv)

        if cfg.freeze_conv:
            # reference _freeze_conv (Base.py:495-499): conv/BN params get no
            # gradient; heads keep training on frozen features
            inv = jax.lax.stop_gradient(inv)
            equiv = jax.tree.map(jax.lax.stop_gradient, equiv)

        x = inv

        # ---- pooling (Base.py:733-738) ----
        x_graph = self._pool(x, graph)
        if (
            cfg.use_graph_attr_conditioning
            and cfg.graph_attr_conditioning_mode == "fuse_pool"
        ):
            x_graph = PoolConditioner(activation=cfg.activation, name="pool_cond")(
                x_graph, graph
            )

        # ---- multi-head decoders (Base.py:742-846) ----
        outputs: List[jnp.ndarray] = []
        outputs_var: List[jnp.ndarray] = []
        var_mult = 1 + int(cfg.var_output)

        graph_branches = dict(cfg.graph_branches)
        node_branches = dict(cfg.node_branches)

        # shared graph dense layers per branch (Base.py:595-610)
        shared_out: Dict[str, jnp.ndarray] = {}
        for bname, arch in graph_branches.items():
            feats = (arch.dim_sharedlayers,) * arch.num_sharedlayers
            shared_out[bname] = MLP(
                feats,
                activation=cfg.activation,
                final_activation=True,
                name=f"graph_shared_{bname}",
            )(x_graph)

        dataset_id = (
            graph.dataset_id
            if graph.dataset_id is not None
            else jnp.zeros((graph.n_graph,), jnp.int32)
        )

        node_head_count = 0
        for ihead in range(cfg.num_heads):
            hdim = cfg.output_dim[ihead]
            if cfg.output_type[ihead] == "graph":
                per_branch = []
                for bname, arch in graph_branches.items():
                    feats = tuple(arch.dim_headlayers) + (hdim * var_mult,)
                    out = MLP(
                        feats,
                        activation=cfg.activation,
                        final_bias_init=cfg.initial_bias,
                        name=f"head_{ihead}_{bname}",
                    )(shared_out[bname])
                    per_branch.append(out)
                merged = _select_branch(per_branch, dataset_id)
                outputs.append(merged[:, :hdim])
                outputs_var.append(merged[:, hdim:] ** 2)
            else:
                per_branch = []
                for bname, arch in node_branches.items():
                    if arch.type == "conv":
                        out = self._node_conv_head(
                            graph, x, equiv, ctx, arch, hdim * var_mult,
                            train, name=f"head_{ihead}_{bname}",
                        )
                    else:
                        out = MLPNode(
                            output_dim=hdim * var_mult,
                            hidden_dims=tuple(arch.dim_headlayers),
                            node_type=arch.type,
                            activation=cfg.activation,
                            num_nodes=cfg.num_nodes,
                            name=f"head_{ihead}_{bname}",
                        )(x, graph)
                    per_branch.append(out)
                merged = _select_branch(per_branch, dataset_id[graph.node_graph])
                outputs.append(merged[:, :hdim])
                outputs_var.append(merged[:, hdim:] ** 2)
                node_head_count += 1

        if cfg.var_output:
            return outputs, outputs_var
        return outputs

    # ------------------------------------------------------------------
    def _pool(self, x, graph: GraphBatch):
        cfg = self.cfg
        mode = cfg.graph_pooling.lower()
        if mode == "sum":
            mode = "add"
        halo = graph.halo_axis is not None and graph.halo_send_idx is not None
        if mode == "mean":
            s = segment_sum(x, graph.node_graph, graph.n_graph,
                            mask=graph.node_mask, indices_are_sorted=True)
            cnt = jnp.maximum(graph.n_per_graph.astype(x.dtype), 1.0)[:, None]
            if halo:
                # giant-graph view: each shard pools its local real nodes;
                # the graph total is the psum of partial sums/counts
                s = jax.lax.psum(s, graph.halo_axis)
                cnt = jnp.maximum(
                    jax.lax.psum(
                        graph.n_per_graph.astype(x.dtype), graph.halo_axis
                    ),
                    1.0,
                )[:, None]
            return s / cnt
        if mode == "add":
            s = segment_sum(x, graph.node_graph, graph.n_graph,
                            mask=graph.node_mask, indices_are_sorted=True)
            return jax.lax.psum(s, graph.halo_axis) if halo else s
        if mode == "max":
            from hydragnn_tpu.ops import segment_max

            s = segment_max(x, graph.node_graph, graph.n_graph, mask=graph.node_mask)
            return jax.lax.pmax(s, graph.halo_axis) if halo else s
        raise ValueError(f"Unsupported graph_pooling: {cfg.graph_pooling}")

    def _node_conv_head(self, graph, x, equiv, ctx, arch: HeadArch, out_dim, train, name):
        """Node head made of conv layers (``Base.py:508-588, 797-810``)."""
        cfg = self.cfg
        act = activation_function_selection(cfg.activation)
        dims = list(arch.dim_headlayers)
        inv = x
        eq = equiv
        in_dim = cfg.hidden_dim
        for i, d in enumerate(dims):
            conv = self.make_conv(in_dim, d, edge_dim=cfg.edge_dim, name=f"{name}_conv_{i}")
            inv, eq = conv(graph, inv, eq, ctx, train=train)
            inv = MaskedBatchNorm(
                d, name=f"{name}_norm_{i}", axis_name=cfg.bn_sync_axis
            )(inv, graph.node_mask, train)
            inv = act(inv)
            in_dim = d
        conv = self.make_conv(
            in_dim, out_dim, edge_dim=cfg.edge_dim, last_layer=True, name=f"{name}_conv_out"
        )
        inv, eq = conv(graph, inv, eq, ctx, train=train)
        inv = MaskedBatchNorm(
            out_dim, name=f"{name}_norm_out", axis_name=cfg.bn_sync_axis
        )(inv, graph.node_mask, train)
        return inv

    # ------------------------------------------------------------------ loss
    def loss(self, pred, graph: GraphBatch):
        """Weighted multi-task loss (``Base.py:848-906``).

        Targets come pre-packed per level in ``graph.y_graph`` /
        ``graph.y_node`` in head order (see graphs.py docstring).
        Returns (total_loss, [per-task losses]).
        """
        cfg = self.cfg
        var = None
        if cfg.var_output:
            pred, var = pred
        weights = cfg.loss_weights
        tot = 0.0
        tasks = []
        g_off = 0
        n_off = 0
        for ihead in range(cfg.num_heads):
            hdim = cfg.output_dim[ihead]
            if cfg.output_type[ihead] == "graph":
                target = jax.lax.dynamic_slice_in_dim(
                    graph.y_graph, g_off, hdim, axis=1
                )
                mask = graph.graph_mask
                g_off += hdim
            else:
                target = jax.lax.dynamic_slice_in_dim(graph.y_node, n_off, hdim, axis=1)
                mask = graph.node_mask
                n_off += hdim
            if cfg.var_output:
                task_loss = masked_gaussian_nll(pred[ihead], var[ihead], target, mask)
            else:
                task_loss = masked_error_loss(
                    pred[ihead], target, mask, cfg.loss_function_type
                )
            tot = tot + task_loss * weights[ihead]
            tasks.append(task_loss)
        return tot, tasks


def _select_branch(per_branch: List[jnp.ndarray], ids: jnp.ndarray) -> jnp.ndarray:
    """Route rows to their dataset branch (``Base.py:770-780``): compute all
    branches, select row-wise by id."""
    if len(per_branch) == 1:
        return per_branch[0]
    out = per_branch[0]
    for b in range(1, len(per_branch)):
        sel = (ids == b)[:, None]
        out = jnp.where(sel, per_branch[b], out)
    return out
