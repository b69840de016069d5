"""Golden-value tests pinning PyG conv semantics (the per-layer parity
harness analogue, BASELINE 'allclose per-layer activations'): each conv is
evaluated on a tiny fixed graph with known weights and compared against an
INDEPENDENT numpy re-implementation of the PyG formula the reference relies
on (torch being unavailable here, the golden is the documented math itself,
computed outside JAX).

Graph: 4 nodes, directed edges (sender->receiver)
  (0->1) (3->0) (0->2) (1->2) (1->3) (2->3)
in-degrees [1, 1, 2, 2]; features fixed by a seeded rng.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydragnn_tpu.data.batching import collate
from hydragnn_tpu.data.pipeline import sort_edges_by_receiver
from hydragnn_tpu.data.sample import GraphSample

SRC = np.asarray([3, 0, 0, 1, 1, 2])
DST = np.asarray([0, 1, 2, 2, 3, 3])
N, E, F_IN, F_OUT = 4, 6, 3, 2


def make_graph(edge_attr_dim=0, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N, F_IN)).astype(np.float32)
    s = GraphSample(
        x=x,
        pos=rng.normal(size=(N, 3)).astype(np.float32),
        edge_index=np.stack([SRC, DST]).astype(np.int64),
        edge_attr=rng.normal(size=(E, edge_attr_dim)).astype(np.float32)
        if edge_attr_dim
        else None,
        y_graph=np.zeros((1,), np.float32),
    )
    sort_edges_by_receiver([s])
    g = collate([s], 8, 8, 2)
    inv = jnp.asarray(np.pad(np.asarray(s.x), ((0, 8 - N), (0, 0))))
    ctx = {}
    if edge_attr_dim:
        ctx["edge_attr"] = g.edge_attr
    return g, inv, ctx, s


def overridden_apply(conv, g, inv, ctx, override):
    params = conv.init(jax.random.PRNGKey(0), g, inv, None, ctx)["params"]
    params = override(jax.tree.map(np.asarray, params))
    out, _ = conv.apply({"params": params}, g, inv, None, ctx)
    return np.asarray(out)[:N]


def in_edges(i, src, dst):
    return [k for k in range(len(src)) if dst[k] == i]


def test_gin_golden():
    """PyG GINConv: MLP((1+eps) x_i + sum_j x_j), eps=100."""
    from hydragnn_tpu.models.invariant import GINConv

    g, inv, ctx, s = make_graph()
    rng = np.random.default_rng(1)
    W1 = rng.normal(size=(F_IN, F_OUT)).astype(np.float32)
    b1 = rng.normal(size=(F_OUT,)).astype(np.float32)
    W2 = rng.normal(size=(F_OUT, F_OUT)).astype(np.float32)
    b2 = rng.normal(size=(F_OUT,)).astype(np.float32)

    def override(p):
        p["eps"] = np.float32(100.0)
        p["MLP_0"]["dense_0"]["kernel"] = W1
        p["MLP_0"]["dense_0"]["bias"] = b1
        p["MLP_0"]["dense_1"]["kernel"] = W2
        p["MLP_0"]["dense_1"]["bias"] = b2
        return p

    out = overridden_apply(GINConv(out_dim=F_OUT), g, inv, ctx, override)

    x = np.asarray(s.x)
    src, dst = s.edge_index
    h = np.zeros_like(x)
    for i in range(N):
        h[i] = 101.0 * x[i] + sum(x[src[k]] for k in in_edges(i, src, dst))
    expected = np.maximum(h @ W1 + b1, 0.0) @ W2 + b2
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_sage_golden():
    """PyG SAGEConv: W_l mean_j x_j + b + W_r x_i."""
    from hydragnn_tpu.models.invariant import SAGEConv

    g, inv, ctx, s = make_graph()
    rng = np.random.default_rng(2)
    Wl = rng.normal(size=(F_IN, F_OUT)).astype(np.float32)
    bl = rng.normal(size=(F_OUT,)).astype(np.float32)
    Wr = rng.normal(size=(F_IN, F_OUT)).astype(np.float32)

    def override(p):
        p["lin_l"]["kernel"] = Wl
        p["lin_l"]["bias"] = bl
        p["lin_r"]["kernel"] = Wr
        return p

    out = overridden_apply(SAGEConv(out_dim=F_OUT), g, inv, ctx, override)

    x = np.asarray(s.x)
    src, dst = s.edge_index
    expected = np.zeros((N, F_OUT), np.float32)
    for i in range(N):
        nb = in_edges(i, src, dst)
        mean = np.mean([x[src[k]] for k in nb], axis=0)
        expected[i] = mean @ Wl + bl + x[i] @ Wr
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_mfc_golden():
    """PyG MFConv: per-degree weight banks,
    out = W_nei^{deg} sum_j x_j + W_root^{deg} x_i + b^{deg}."""
    from hydragnn_tpu.models.invariant import MFCConv

    g, inv, ctx, s = make_graph()
    max_deg = 3
    rng = np.random.default_rng(3)
    Wn = rng.normal(size=(max_deg + 1, F_IN, F_OUT)).astype(np.float32)
    Wr = rng.normal(size=(max_deg + 1, F_IN, F_OUT)).astype(np.float32)
    b = rng.normal(size=(max_deg + 1, F_OUT)).astype(np.float32)

    def override(p):
        p["w_nei"] = Wn
        p["w_root"] = Wr
        p["bias"] = b
        return p

    out = overridden_apply(
        MFCConv(in_dim=F_IN, out_dim=F_OUT, max_degree=max_deg),
        g, inv, ctx, override,
    )

    x = np.asarray(s.x)
    src, dst = s.edge_index
    expected = np.zeros((N, F_OUT), np.float32)
    for i in range(N):
        nb = in_edges(i, src, dst)
        d = min(len(nb), max_deg)
        agg = np.sum([x[src[k]] for k in nb], axis=0)
        expected[i] = agg @ Wn[d] + x[i] @ Wr[d] + b[d]
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_cgcnn_golden():
    """PyG CGConv (aggr=add): x_i + sum_j sigmoid(z W_f + b_f) *
    softplus(z W_s + b_s), z = [x_i, x_j, e_ij]."""
    from hydragnn_tpu.models.invariant import CGConv

    EA = 2
    g, inv, ctx, s = make_graph(edge_attr_dim=EA)
    rng = np.random.default_rng(4)
    C = F_IN
    Wfi = rng.normal(size=(C, C)).astype(np.float32)
    bf = rng.normal(size=(C,)).astype(np.float32)
    Wfj = rng.normal(size=(C, C)).astype(np.float32)
    Wsi = rng.normal(size=(C, C)).astype(np.float32)
    bs = rng.normal(size=(C,)).astype(np.float32)
    Wsj = rng.normal(size=(C, C)).astype(np.float32)
    Wfe = rng.normal(size=(EA, C)).astype(np.float32)
    Wse = rng.normal(size=(EA, C)).astype(np.float32)

    def override(p):
        p["lin_f_i"]["kernel"] = Wfi
        p["lin_f_i"]["bias"] = bf
        p["lin_f_j"]["kernel"] = Wfj
        p["lin_s_i"]["kernel"] = Wsi
        p["lin_s_i"]["bias"] = bs
        p["lin_s_j"]["kernel"] = Wsj
        p["lin_f_e"]["kernel"] = Wfe
        p["lin_s_e"]["kernel"] = Wse
        return p

    out = overridden_apply(CGConv(channels=C), g, inv, ctx, override)

    x = np.asarray(s.x)
    ea_sorted = np.asarray(s.edge_attr)
    src, dst = s.edge_index

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    def softplus(v):
        return np.log1p(np.exp(v))

    expected = x.copy()
    for k in range(E):
        i, j = dst[k], src[k]
        zf = x[i] @ Wfi + bf + x[j] @ Wfj + ea_sorted[k] @ Wfe
        zs = x[i] @ Wsi + bs + x[j] @ Wsj + ea_sorted[k] @ Wse
        expected[i] += sigmoid(zf) * softplus(zs)
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


def test_pna_golden():
    """PyG PNAConv (towers=1, pre/post_layers=1, divide_input=False):
    h_ij = pre_nn([x_i, x_j]); aggregators [mean, min, max, std];
    scalers [identity, amplification, attenuation, linear];
    out = lin(post_nn([x_i, scaled]))."""
    from hydragnn_tpu.models.invariant import PNAConv, pna_degree_stats

    g, inv, ctx, s = make_graph()
    deg_hist = np.bincount([1, 1, 2, 2])  # the graph's own in-degrees
    stats = pna_degree_stats(deg_hist)
    rng = np.random.default_rng(5)
    Wi = rng.normal(size=(F_IN, F_IN)).astype(np.float32)
    bi = rng.normal(size=(F_IN,)).astype(np.float32)
    Wj = rng.normal(size=(F_IN, F_IN)).astype(np.float32)
    Wpost = rng.normal(size=(F_IN + 4 * 4 * F_IN, F_OUT)).astype(np.float32)
    bpost = rng.normal(size=(F_OUT,)).astype(np.float32)
    Wlin = rng.normal(size=(F_OUT, F_OUT)).astype(np.float32)
    blin = rng.normal(size=(F_OUT,)).astype(np.float32)

    def override(p):
        p["pre_nn_i"]["kernel"] = Wi
        p["pre_nn_i"]["bias"] = bi
        p["pre_nn_j"]["kernel"] = Wj
        p["post_nn"]["kernel"] = Wpost
        p["post_nn"]["bias"] = bpost
        p["lin"]["kernel"] = Wlin
        p["lin"]["bias"] = blin
        return p

    conv = PNAConv(
        in_dim=F_IN, out_dim=F_OUT,
        avg_deg_lin=stats["lin"], avg_deg_log=stats["log"],
    )
    out = overridden_apply(conv, g, inv, ctx, override)

    x = np.asarray(s.x)
    src, dst = s.edge_index
    expected = np.zeros((N, F_OUT), np.float32)
    for i in range(N):
        nb = in_edges(i, src, dst)
        H = np.stack([x[i] @ Wi + bi + x[src[k]] @ Wj for k in nb])
        mean = H.mean(0)
        mn = H.min(0)
        mx = H.max(0)
        std = np.sqrt(np.maximum(np.mean(H * H, 0) - mean * mean, 0.0) + 1e-5)
        aggs = np.concatenate([mean, mn, mx, std])
        d = float(len(nb))
        amp = np.log(d + 1.0) / stats["log"]
        att = stats["log"] / np.log(d + 1.0)
        lin_s = d / stats["lin"]
        scaled = np.concatenate([aggs, aggs * amp, aggs * att, aggs * lin_s])
        z = np.concatenate([x[i], scaled])
        expected[i] = (z @ Wpost + bpost) @ Wlin + blin
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_gatv2_golden():
    """PyG GATv2Conv (heads=2, concat, add_self_loops, slope 0.05):
    alpha = softmax over {in-edges, self-loop} of a^T leaky_relu(
    W_l x_j + W_r x_i); out_i = sum alpha_ij W_l x_j (+ self term) + bias."""
    from hydragnn_tpu.models.invariant import GATv2Conv

    g, inv, ctx, s = make_graph()
    H, F = 2, 2
    rng = np.random.default_rng(6)
    Wl = rng.normal(size=(F_IN, H * F)).astype(np.float32)
    bWl = rng.normal(size=(H * F,)).astype(np.float32)
    Wr = rng.normal(size=(F_IN, H * F)).astype(np.float32)
    att = rng.normal(size=(H, F)).astype(np.float32)
    bias = rng.normal(size=(H * F,)).astype(np.float32)

    def override(p):
        p["lin_l"]["kernel"] = Wl
        p["lin_l"]["bias"] = bWl
        p["lin_r"]["kernel"] = Wr
        p["att"] = att[None]  # module stores [1, H, F]
        p["bias"] = bias
        return p

    conv = GATv2Conv(
        out_dim=F, heads=H, negative_slope=0.05, dropout=0.0, concat=True
    )
    out = overridden_apply(conv, g, inv, ctx, override)

    x = np.asarray(s.x)
    src, dst = s.edge_index
    xl = (x @ Wl + bWl).reshape(N, H, F)
    xr = (x @ Wr).reshape(N, H, F)

    def lrelu(v):
        return np.where(v > 0, v, 0.05 * v)

    expected = np.zeros((N, H * F), np.float32)
    for i in range(N):
        nb = in_edges(i, src, dst)
        cand = [(xl[src[k]], xl[src[k]] + xr[i]) for k in nb]
        cand.append((xl[i], xl[i] + xr[i]))  # self loop
        per_head = []
        for h in range(H):
            logits = np.asarray(
                [np.sum(lrelu(pre[h]) * att[h]) for _, pre in cand]
            )
            a = np.exp(logits - logits.max())
            a = a / a.sum()
            per_head.append(
                np.sum([a[m] * cand[m][0][h] for m in range(len(cand))], axis=0)
            )
        expected[i] = np.concatenate(per_head) + bias
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_cfconv_golden():
    """SchNet CFConv (PyG semantics, SCFStack.py:222-301): filter net on
    Gaussian-smeared distances x cosine cutoff, W * lin1(x_src) summed at
    receivers, then lin2 — computed independently in numpy."""
    import math

    from hydragnn_tpu.models.geometric import CFConv

    g, inv, ctx, s = make_graph()
    pos = jnp.asarray(np.pad(np.asarray(s.pos), ((0, 8 - N), (0, 0))))
    conv = CFConv(out_dim=F_OUT, num_filters=5, num_gaussians=7, cutoff=4.0)
    params = conv.init(jax.random.PRNGKey(0), g, inv, pos, ctx)["params"]
    p = jax.tree.map(np.asarray, params)
    out, _ = conv.apply({"params": params}, g, inv, pos, ctx)
    out = np.asarray(out)[:N]

    x = np.asarray(inv)[:N]
    posn = np.asarray(s.pos)
    # numpy golden
    vec = posn[DST] - posn[SRC]
    dist = np.linalg.norm(vec, axis=1)
    offs = np.linspace(0.0, 4.0, 7)
    coeff = -0.5 / (offs[1] - offs[0]) ** 2
    rbf = np.exp(coeff * (dist[:, None] - offs[None, :]) ** 2)
    C = np.where(dist < 4.0, 0.5 * (np.cos(np.pi * dist / 4.0) + 1.0), 0.0)
    w = rbf @ p["fnet_0"]["kernel"] + p["fnet_0"]["bias"]
    w = np.logaddexp(0, w) - math.log(2.0)  # shifted softplus
    w = w @ p["fnet_1"]["kernel"] + p["fnet_1"]["bias"]
    W = w * C[:, None]
    h = x @ p["lin1"]["kernel"]
    msg = h[SRC] * W
    agg = np.zeros((N, 5), np.float64)
    np.add.at(agg, DST, msg)
    gold = agg @ p["lin2"]["kernel"] + p["lin2"]["bias"]
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-5)


def test_egcl_golden():
    """EGNN / E_GCL (EGCLStack.py:180-291): split edge MLP on (h_src,
    h_dst, |r|), relu, out linear, relu; sender-aggregated message into the
    node MLP — plus the tanh coordinate update mean-aggregated at senders."""
    from hydragnn_tpu.models.geometric import EGCLConv

    g, inv, ctx, s = make_graph()
    pos = jnp.asarray(np.pad(np.asarray(s.pos), ((0, 8 - N), (0, 0))))
    conv = EGCLConv(out_dim=F_OUT, hidden_dim=5, equivariant=True)
    params = conv.init(jax.random.PRNGKey(1), g, inv, pos, ctx)["params"]
    p = jax.tree.map(np.asarray, params)
    out, new_pos = conv.apply({"params": params}, g, inv, pos, ctx)
    out = np.asarray(out)[:N]
    new_pos = np.asarray(new_pos)[:N]

    x = np.asarray(inv)[:N].astype(np.float64)
    posn = np.asarray(s.pos).astype(np.float64)
    vec = posn[DST] - posn[SRC]
    dist = np.linalg.norm(vec, axis=1, keepdims=True)
    vec_n = vec / (dist + 1.0)

    def relu(a):
        return np.maximum(a, 0)

    ef = (
        (x @ p["edge_mlp_src"]["kernel"] + p["edge_mlp_src"]["bias"])[SRC]
        + (x @ p["edge_mlp_dst"]["kernel"])[DST]
        + dist @ p["edge_mlp_rad"]["kernel"]
    )
    ef = relu(ef)
    ef = relu(ef @ p["edge_mlp_out"]["kernel"] + p["edge_mlp_out"]["bias"])

    # coordinate update: tanh(coord MLP), mean at SENDERS
    cm = relu(ef @ p["coord_0"]["kernel"] + p["coord_0"]["bias"])
    cm = np.tanh(cm @ p["coord_out"]["kernel"])
    trans = np.clip(vec_n * cm, -100.0, 100.0)
    upd = np.zeros((N, 3))
    cnt = np.zeros((N,))
    np.add.at(upd, SRC, trans)
    np.add.at(cnt, SRC, 1.0)
    gold_pos = posn + upd / np.maximum(cnt, 1.0)[:, None]
    np.testing.assert_allclose(new_pos, gold_pos, rtol=1e-4, atol=1e-5)

    # node update: sender-aggregated messages
    agg = np.zeros((N, 5))
    np.add.at(agg, SRC, ef)
    z = np.concatenate([x, agg], axis=1)
    h = relu(z @ p["node_mlp"]["dense_0"]["kernel"] + p["node_mlp"]["dense_0"]["bias"])
    gold = h @ p["node_mlp"]["dense_1"]["kernel"] + p["node_mlp"]["dense_1"]["bias"]
    np.testing.assert_allclose(out, gold, rtol=1e-4, atol=1e-5)


def test_painn_golden():
    """PaiNN message+update (PAINNStack.py:194-328): sinc-filter gated
    scalar/vector messages gathered at receivers and aggregated at senders,
    U/V inner-product update, embed-out MLPs — numpy golden including the
    [N, 3, F] vector channel."""
    from hydragnn_tpu.models.geometric import PainnConv

    g, inv, ctx, s = make_graph()
    F = 5
    posn = np.asarray(s.pos).astype(np.float64)
    vec = posn[DST] - posn[SRC]
    dist = np.linalg.norm(vec, axis=1, keepdims=True)
    diff = vec / dist
    # ctx as PAINNStack.embedding builds it (normalized diff + lengths)
    ctx = dict(ctx)
    pd = np.zeros((8, 3)); pd[:E] = diff
    dd = np.ones((8, 1)); dd[:E] = dist
    ctx["diff"] = jnp.asarray(pd.astype(np.float32))
    ctx["dist"] = jnp.asarray(dd.astype(np.float32))
    equiv = jnp.asarray(
        np.random.default_rng(7).normal(size=(8, 3, F)).astype(np.float32)
    )
    inv5 = jnp.asarray(
        np.random.default_rng(8).normal(size=(8, F)).astype(np.float32)
    )
    conv = PainnConv(node_size=F, out_dim=F, num_radial=6, cutoff=4.0)
    params = conv.init(jax.random.PRNGKey(2), g, inv5, equiv, ctx)["params"]
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    s_out, v_out = conv.apply({"params": params}, g, inv5, equiv, ctx)
    s_out = np.asarray(s_out)[:N]
    v_out = np.asarray(v_out)[:N]

    x = np.asarray(inv5, np.float64)[:8]
    veq = np.asarray(equiv, np.float64)[:8]

    def silu(a):
        return a / (1 + np.exp(-a))

    def mlp(z, pp, act):
        z = act(z @ pp["dense_0"]["kernel"] + pp["dense_0"]["bias"])
        return z @ pp["dense_1"]["kernel"] + pp["dense_1"]["bias"]

    n_arr = np.arange(1, 7)
    sinc = np.sin(dist * n_arr * np.pi / 4.0) / dist  # [E, 6]
    filt = sinc @ p["filter_layer"]["kernel"] + p["filter_layer"]["bias"]
    C = np.where(dist < 4.0, 0.5 * (np.cos(np.pi * dist / 4.0) + 1.0), 0.0)
    filt = filt * C
    scal = mlp(x, p["scalar_message_mlp"], silu)
    fo = filt * scal[DST]
    gate_v, gate_e, msg_s = np.split(fo, 3, axis=-1)
    msg_v = veq[DST] * gate_v[:, None, :] + gate_e[:, None, :] * (diff / dist)[:, :, None]
    s_mid = x.copy()
    np.add.at(s_mid, SRC, msg_s)
    v_mid = veq.copy()
    np.add.at(v_mid, SRC, msg_v)

    Uv = v_mid @ p["update_U"]["kernel"] + p["update_U"]["bias"]
    Vv = v_mid @ p["update_V"]["kernel"] + p["update_V"]["bias"]
    Vn = np.sqrt(np.sum(Vv * Vv, axis=1) + 1e-12)
    mo = mlp(np.concatenate([Vn, s_mid], axis=-1), p["update_mlp"], silu)
    inner = np.sum(Uv * Vv, axis=1)
    a_vv, a_sv, a_ss = np.split(mo, 3, axis=-1)
    v_new = v_mid + a_vv[:, None, :] * Uv
    s_new = s_mid + a_sv * inner + a_ss

    s_gold = mlp(s_new, p["node_embed_out"], np.tanh)
    v_gold = v_new @ p["vec_embed_out"]["kernel"] + p["vec_embed_out"]["bias"]
    np.testing.assert_allclose(s_out, s_gold[:N], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(v_out, v_gold[:N], rtol=2e-4, atol=2e-5)


def test_dimenet_golden():
    """DimeNet++ interaction-PP + output-PP (DIMEStack.py:96-162, PyG
    InteractionPPBlock semantics) with rbf/sbf injected directly: embedding
    block, basis-gated down/up projections, triplet aggregation
    kj->ji, residuals, skip, and the edge->node output block — numpy
    golden. (The Bessel/spherical bases have their own formula tests.)"""
    from hydragnn_tpu.data.batching import build_triplets
    from hydragnn_tpu.models.geometric import DimeConv

    g, inv, ctx, s = make_graph()
    kj, ji = build_triplets(np.stack([SRC, DST]))
    T = len(kj)
    # patch triplets into the batch (collate would need trip dims upfront)
    import dataclasses

    TP = 8
    trip_kj = np.zeros(TP, np.int32)
    trip_ji = np.zeros(TP, np.int32)
    trip_mask = np.zeros(TP, bool)
    trip_kj[:T], trip_ji[:T], trip_mask[:T] = kj, ji, True
    g = dataclasses.replace(
        g,
        trip_kj=jnp.asarray(trip_kj),
        trip_ji=jnp.asarray(trip_ji),
        trip_mask=jnp.asarray(trip_mask),
    )
    rng = np.random.default_rng(11)
    R, SB = 4, 6
    rbf = np.zeros((8, R), np.float32)
    rbf[:E] = rng.normal(size=(E, R))
    sbf = np.zeros((TP, SB), np.float32)
    sbf[:T] = rng.normal(size=(T, SB))
    ctx = dict(ctx, rbf=jnp.asarray(rbf), sbf=jnp.asarray(sbf))

    conv = DimeConv(
        hidden=5, out_dim=F_OUT, int_emb_size=3, basis_emb_size=2,
        out_emb_size=4, num_before_skip=1, num_after_skip=1,
    )
    params = conv.init(jax.random.PRNGKey(3), g, inv, None, ctx)["params"]
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    out, _ = conv.apply({"params": params}, g, inv, None, ctx)
    out = np.asarray(out)[:N]

    def silu(a):
        return a / (1 + np.exp(-a))

    def lin(z, pp):
        w = pp["kernel"]
        return z @ w + pp["bias"] if "bias" in pp else z @ w

    x_node = np.asarray(inv, np.float64)[:8]
    h = lin(x_node, p["lin_in"])
    rbf_h = silu(lin(rbf, p["emb_lin_rbf"]))
    xemb = silu(
        lin(np.concatenate([h[DST], h[SRC], rbf_h[:E]], axis=-1), p["emb_lin"])
    )
    x_ji = silu(lin(xemb, p["lin_ji"]))
    x_kj = silu(lin(xemb, p["lin_kj"]))
    r = lin(lin(rbf[:E], p["lin_rbf1"]), p["lin_rbf2"])
    x_kj = x_kj * r
    x_kj = silu(lin(x_kj, p["lin_down"]))
    sb = lin(lin(sbf, p["lin_sbf1"]), p["lin_sbf2"])
    tterm = x_kj[trip_kj] * sb
    agg = np.zeros((E, 3))
    np.add.at(agg, trip_ji[:T], tterm[:T])
    x_kj2 = silu(lin(agg, p["lin_up"]))
    hh = x_ji + x_kj2

    def residual(z, pp):
        q = silu(lin(z, pp["lin1"]))
        q = silu(lin(q, pp["lin2"]))
        return z + q

    hh = residual(hh, p["res_before_0"])
    hh = silu(lin(hh, p["lin_skip"])) + xemb
    hh = residual(hh, p["res_after_0"])

    o = lin(rbf[:E], p["out_lin_rbf"]) * hh
    node_o = np.zeros((N, 5))
    np.add.at(node_o, DST, o)
    node_o = lin(node_o, p["out_lin_up"])
    node_o = silu(lin(node_o, p["out_lin_0"]))
    gold = lin(node_o, p["out_lin"])
    np.testing.assert_allclose(out, gold, rtol=2e-4, atol=2e-5)


def test_pnaplus_golden():
    """PNAPlus (PNAPlusStack.py:144-304): split pre-linear on (x_i, x_j,
    edge-encoded rbf), Hadamard with a projected Bessel rbf, PNA
    aggregator/scaler set — numpy golden with rbf injected via ctx."""
    from hydragnn_tpu.models.geometric import PNAPlusConv
    from hydragnn_tpu.models.invariant import pna_degree_stats

    g, inv, ctx, s = make_graph()
    stats = pna_degree_stats(np.bincount([1, 1, 2, 2]))
    rng = np.random.default_rng(17)
    R = 4
    rbf = np.zeros((8, R), np.float32)
    rbf[:E] = rng.normal(size=(E, R))
    ctx = dict(ctx, rbf=jnp.asarray(rbf))

    conv = PNAPlusConv(
        in_dim=F_IN, out_dim=F_OUT,
        avg_deg_lin=stats["lin"], avg_deg_log=stats["log"], num_radial=R,
    )
    params = conv.init(jax.random.PRNGKey(4), g, inv, None, ctx)["params"]
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    out, _ = conv.apply({"params": params}, g, inv, None, ctx)
    out = np.asarray(out)[:N]

    x = np.asarray(s.x).astype(np.float64)
    rbf_e = rbf[:E].astype(np.float64)
    rbf_emb = np.maximum(rbf_e @ p["rbf_emb"]["kernel"] + p["rbf_emb"]["bias"], 0)
    h_edge = (
        (x @ p["pre_nn_i"]["kernel"] + p["pre_nn_i"]["bias"])[DST]
        + (x @ p["pre_nn_j"]["kernel"])[SRC]
        + rbf_emb @ p["pre_nn_e"]["kernel"]
    )
    h_edge = h_edge * (rbf_e @ p["rbf_lin"]["kernel"])

    expected = np.zeros((N, F_OUT))
    for i in range(N):
        nb = in_edges(i, SRC, DST)
        H = h_edge[nb]
        mean = H.mean(0)
        mn = H.min(0)
        mx = H.max(0)
        std = np.sqrt(np.maximum(np.mean(H * H, 0) - mean * mean, 0.0) + 1e-5)
        aggs = np.concatenate([mean, mn, mx, std])
        d = float(len(nb))
        amp = np.log(d + 1.0) / stats["log"]
        att = stats["log"] / np.log(d + 1.0)
        lin_s = d / stats["lin"]
        scaled = np.concatenate([aggs, aggs * amp, aggs * att, aggs * lin_s])
        z = np.concatenate([x[i], scaled])
        z = z @ p["post_nn"]["kernel"] + p["post_nn"]["bias"]
        expected[i] = z @ p["lin"]["kernel"] + p["lin"]["bias"]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)


def test_pnaeq_golden():
    """PNAEq (PNAEqStack.py:240-478): PaiNN-style gated scalar/vector
    messages, degree-scaled PNA aggregation at the sender with 5 scalers
    (incl. inverse_linear), PaiNN update, embed-out — numpy golden."""
    from hydragnn_tpu.models.geometric import PNAEqConv
    from hydragnn_tpu.models.invariant import pna_degree_stats

    g, inv, ctx, s = make_graph()
    # out-degrees (aggregation at SENDERS): SRC = [3,0,0,1,1,2]
    stats = pna_degree_stats(np.bincount([2, 2, 1, 1]))
    F = 4
    rng = np.random.default_rng(23)
    R = 5
    rbf = np.zeros((8, R), np.float32)
    rbf[:E] = rng.normal(size=(E, R))
    posn = np.asarray(s.pos).astype(np.float64)
    vec = posn[DST] - posn[SRC]
    dist = np.linalg.norm(vec, axis=1, keepdims=True)
    diffn = np.zeros((8, 3), np.float32)
    diffn[:E] = (vec / dist).astype(np.float32)
    ctx = dict(ctx, pnaeq_rbf=jnp.asarray(rbf), diff=jnp.asarray(diffn))
    inv4 = jnp.asarray(rng.normal(size=(8, F)).astype(np.float32))
    equiv = jnp.asarray(rng.normal(size=(8, 3, F)).astype(np.float32))

    conv = PNAEqConv(
        node_size=F, out_dim=F, num_radial=R, cutoff=4.0,
        avg_deg_lin=stats["lin"], avg_deg_log=stats["log"],
    )
    params = conv.init(jax.random.PRNGKey(5), g, inv4, equiv, ctx)["params"]
    p = jax.tree.map(lambda a: np.asarray(a, np.float64), params)
    s_out, v_out = conv.apply({"params": params}, g, inv4, equiv, ctx)
    s_out = np.asarray(s_out)[:N]
    v_out = np.asarray(v_out)[:N]

    def silu(a):
        return a / (1 + np.exp(-a))

    def lin(z, pp):
        return z @ pp["kernel"] + (pp["bias"] if "bias" in pp else 0.0)

    def mlp(z, pp, act):
        return lin(act(lin(z, pp["dense_0"])), pp["dense_1"])

    x = np.asarray(inv4, np.float64)[:8]
    veq = np.asarray(equiv, np.float64)[:8]
    rbf_e = rbf[:E].astype(np.float64)
    parts = np.concatenate(
        [x[SRC], x[DST], np.tanh(lin(rbf_e, p["rbf_emb"]))], axis=-1
    )
    ms = lin(parts, p["pre_nn"])
    so = mlp(ms, p["smm_a"], np.tanh)
    so = silu(so)
    so = lin(so, p["smm_b"])
    filt = so * (rbf_e @ p["rbf_lin"]["kernel"])
    gate_v, gate_e, msg_s = np.split(filt, 3, axis=-1)
    msg_v = veq[DST] * gate_v[:, None, :] + gate_e[:, None, :] * diffn[:E].astype(np.float64)[:, :, None]

    expected_s = np.zeros((8, F))
    deg = np.zeros(8)
    np.add.at(deg, SRC, 1.0)
    agg_rows = np.zeros((8, 4 * F))
    for i in range(N):
        out_e = [k for k in range(E) if SRC[k] == i]
        if not out_e:
            continue
        H = msg_s[out_e]
        mean = H.mean(0)
        mn = H.min(0)
        mx = H.max(0)
        std = np.sqrt(np.maximum(np.mean(H * H, 0) - mean * mean, 0.0) + 1e-5)
        agg_rows[i] = np.concatenate([mean, mn, mx, std])
    logd = np.log(deg + 1.0)
    logd_c = np.log(np.maximum(deg, 1.0) + 1.0)
    amp = (logd / stats["log"])[:, None]
    att = (stats["log"] / logd_c)[:, None]
    linear = (deg / stats["lin"])[:, None]
    inv_lin = (stats["lin"] / np.maximum(deg, 1.0))[:, None]
    scaled = np.concatenate(
        [agg_rows, agg_rows * amp, agg_rows * att, agg_rows * linear,
         agg_rows * inv_lin], axis=-1
    )
    s_mid = x + lin(np.concatenate([x, scaled], axis=-1), p["post_nn"])
    v_mid = veq.copy()
    np.add.at(v_mid, SRC, msg_v)

    Xv = lin(v_mid, p["update_X"])
    Vv = lin(v_mid, p["update_V"])
    Vn = np.sqrt(np.sum(Vv * Vv, axis=1) + 1e-12)
    mo = mlp(np.concatenate([Vn, s_mid], axis=-1), p["update_mlp"], silu)
    inner = np.sum(Xv * Vv, axis=1)
    a_vv, a_xv, a_xx = np.split(mo, 3, axis=-1)
    v_new = v_mid + a_vv[:, None, :] * Xv
    s_new = s_mid + a_xv * inner + a_xx

    s_gold = mlp(s_new, p["node_embed_out"], np.tanh)
    np.testing.assert_allclose(s_out, s_gold[:N], rtol=2e-4, atol=2e-5)


def test_mace_tp_conv_golden_own_conventions():
    """MACE WeightedTPConv regression golden WITHIN this library's CG
    conventions (coefficient parity with e3nn is a documented divergence;
    this pins the contraction math itself): out_l3 = sum_paths
    einsum(x_l1, sh_l2, C, w_path) / sqrt(#paths into l3), computed
    independently in numpy from the same clebsch_gordan table."""
    from hydragnn_tpu.equivariant.core import clebsch_gordan
    from hydragnn_tpu.models.mace import WeightedTPConv

    rng = np.random.default_rng(29)
    Eq, mul = 6, 4
    irreps = ((mul, 0), (mul, 1))
    conv = WeightedTPConv(irreps_in=irreps, max_l_sh=1, max_l_out=1)
    paths = conv.paths()
    x = {l: jnp.asarray(rng.normal(size=(Eq, mul, 2 * l + 1)), jnp.float32)
         for _, l in irreps}
    sh = {l: jnp.asarray(rng.normal(size=(Eq, 2 * l + 1)), jnp.float32)
          for l in range(2)}
    w = jnp.asarray(rng.normal(size=(Eq, len(paths), mul)), jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x, sh, w)
    out = conv.apply(params, x, sh, w)

    import math

    acc = {}
    counts = {}
    for p_i, (l1, l2, l3) in enumerate(paths):
        C = np.asarray(clebsch_gordan(l1, l2, l3))
        t = np.einsum(
            "eui,ej,ijk,eu->euk",
            np.asarray(x[l1], np.float64),
            np.asarray(sh[l2], np.float64),
            C,
            np.asarray(w[:, p_i, :], np.float64),
        )
        acc[l3] = acc.get(l3, 0.0) + t
        counts[l3] = counts.get(l3, 0) + 1
    for l3 in acc:
        gold = acc[l3] / math.sqrt(counts[l3])
        np.testing.assert_allclose(
            np.asarray(out[l3]), gold, rtol=2e-4, atol=2e-5
        )


def test_mace_symmetric_product_golden_own_conventions():
    """SymmetricProduct (n-body product basis) regression golden within
    this library's CG conventions: order-2 correlation = per-element w1*A
    + w2*(A x A)|_CG with sqrt(#paths) normalization — direct numpy."""
    from hydragnn_tpu.equivariant.core import clebsch_gordan
    from hydragnn_tpu.models.mace import SymmetricProduct

    rng = np.random.default_rng(31)
    Nn, mul, n_elem = 5, 3, 4
    irreps = ((mul, 0), (mul, 1))
    mod = SymmetricProduct(irreps=irreps, correlation=2, num_elements=n_elem)
    a = {l: jnp.asarray(rng.normal(size=(Nn, mul, 2 * l + 1)), jnp.float32)
         for _, l in irreps}
    attrs = jnp.asarray(
        np.eye(n_elem, dtype=np.float32)[rng.integers(0, n_elem, Nn)]
    )
    params = mod.init(jax.random.PRNGKey(0), a, attrs)
    out = mod.apply(params, a, attrs)

    import math

    p = jax.tree.map(lambda t: np.asarray(t, np.float64), params["params"])
    attrs_n = np.asarray(attrs, np.float64)
    an = {l: np.asarray(a[l], np.float64) for _, l in irreps}
    ls = [0, 1]

    def ew(name):
        return attrs_n @ p[name]  # [N, mul]

    gold = {l: an[l] * ew(f"w1_{l}")[:, :, None] for l in ls}
    nxt = {}
    counts = {}
    for l1 in ls:
        for l2 in ls:
            for l3 in range(abs(l1 - l2), min(l1 + l2, 1) + 1):
                if (l1 + l2 + l3) % 2 != 0 or l3 not in ls:
                    continue
                C = np.asarray(clebsch_gordan(l1, l2, l3))
                t = np.einsum("nui,nuj,ijk->nuk", an[l1], an[l2], C)
                nxt[l3] = nxt.get(l3, 0.0) + t
                counts[l3] = counts.get(l3, 0) + 1
    for l3 in nxt:
        nxt[l3] = nxt[l3] / math.sqrt(counts[l3])
        gold[l3] = gold[l3] + nxt[l3] * ew(f"w2_{l3}")[:, :, None]
    for l in ls:
        np.testing.assert_allclose(
            np.asarray(out[l]), gold[l], rtol=2e-4, atol=2e-5
        )
