"""Fused MACE gather->TP->scatter kernel (ops/mace_tp.py) on the CPU
interpreter: forward parity with the XLA m-major composition, gradients
through every input (vjp variant), and grad-of-grad exactness (jvp
variant).  Reference anchor: mace_utils blocks.py:372-404."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydragnn_tpu.ops.mace_tp import tp_terms, weighted_tp_scatter
from tests.test_fused_gather import _window_batch


def _xla_ref(batch, up_m, sh, w, irreps, lsh, lout, mul):
    from hydragnn_tpu.models.mace import weighted_tp_mmajor
    from hydragnn_tpu.ops.aggregate import aggregate, gather_nodes

    x_e = gather_nodes(batch, up_m, "senders")
    mji, _ = weighted_tp_mmajor(x_e, sh, w, irreps, lsh, lout, mul)
    return aggregate(batch, mji, "sum", "receivers")


def _setup(seed=0, mul=8, max_ell=2, lout=1, ls=(0, 1)):
    batch = _window_batch(n_graphs=4, n=40, deg=5, seed=seed)
    irreps = tuple((mul, l) for l in ls)
    terms, Din, Dout, P, out_ls, _, _ = tp_terms(irreps, max_ell, lout, mul)
    rng = np.random.default_rng(seed + 1)
    up = jnp.asarray(
        rng.normal(size=(batch.n_node, Din)).astype(np.float32)
    )
    S = (max_ell + 1) ** 2
    sh = jnp.asarray(rng.normal(size=(batch.n_edge, S)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(batch.n_edge, P * mul)).astype(np.float32)
    )
    return batch, irreps, up, sh, w, mul, max_ell, lout


@pytest.mark.parametrize("impl", ["vjp", "jvp"])
def test_tp_scatter_forward_matches_xla(impl):
    batch, irreps, up, sh, w, mul, lsh, lout = _setup()
    out = weighted_tp_scatter(
        batch, up, sh, w, irreps, lsh, lout, mul, impl=impl,
        interpret=True,
    )
    ref = _xla_ref(batch, up, sh, w, irreps, lsh, lout, mul)
    # kernel matmuls run bf16 (3-way-split-free): bf16-level tolerance
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) < 2e-2 * scale


@pytest.mark.parametrize("impl", ["vjp", "jvp"])
def test_tp_scatter_grads_match_xla(impl):
    batch, irreps, up, sh, w, mul, lsh, lout = _setup(seed=3)
    rng = np.random.default_rng(9)

    def loss(fn):
        def inner(a, b, c):
            o = fn(a, b, c)
            return jnp.sum(o * ct)

        return inner

    ct = jnp.asarray(
        rng.normal(
            size=(batch.n_node, 0)
        ).astype(np.float32)
    )
    ref0 = _xla_ref(batch, up, sh, w, irreps, lsh, lout, mul)
    ct = jnp.asarray(rng.normal(size=ref0.shape).astype(np.float32))

    fused = lambda a, b, c: weighted_tp_scatter(
        batch, a, b, c, irreps, lsh, lout, mul, impl=impl, interpret=True
    )
    ref = lambda a, b, c: _xla_ref(batch, a, b, c, irreps, lsh, lout, mul)
    g = jax.grad(loss(fused), (0, 1, 2))(up, sh, w)
    g_ref = jax.grad(loss(ref), (0, 1, 2))(up, sh, w)
    for a, b, name in zip(g, g_ref, ("up", "sh", "w")):
        if name in ("sh", "w"):
            b = jnp.where(batch.edge_mask[:, None], b, 0.0)
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 3e-2 * scale, name


def test_tp_scatter_jvp_grad_of_grad_matches_xla():
    """Reverse-over-reverse (the force-training composition) through the
    jvp variant equals the pure-XLA composition."""
    batch, irreps, up, sh, w, mul, lsh, lout = _setup(seed=5, mul=4)

    def energy(fn, a):
        return jnp.sum(fn(a, sh, w) ** 2)

    def floss(fn):
        def inner(a):
            force = jax.grad(lambda x: energy(fn, x))(a)
            return jnp.sum(force**2)

        return inner

    fused = lambda a, b, c: weighted_tp_scatter(
        batch, a, b, c, irreps, lsh, lout, mul, impl="jvp", interpret=True
    )
    ref = lambda a, b, c: _xla_ref(batch, a, b, c, irreps, lsh, lout, mul)
    g = jax.grad(floss(fused))(up)
    g_ref = jax.grad(floss(lambda a, b, c: ref(a, b, c)))(up)
    scale = float(jnp.abs(g_ref).max()) + 1e-6
    assert float(jnp.abs(g - g_ref).max()) < 3e-2 * scale


def test_ct_edge_kernels_match_xla_leg():
    """The fused disjoint-block d/d-w and d/d-sh kernels (r05) reproduce
    the XLA edge-space leg exactly at fp32 (one-hot selects are 3-way-
    split exact; accumulation fp32)."""
    from hydragnn_tpu.ops.mace_tp import (
        _ct_edge_xla,
        _has_eg,
        mace_ct_sh_raw,
        mace_ct_w_raw,
    )

    batch = _window_batch(n_graphs=4, n=40, deg=5, seed=11)
    assert _has_eg(batch)
    mul, lsh, lout = 8, 2, 1
    irreps = ((mul, 0), (mul, 1))
    terms, Din, Dout, P, _, _, _ = tp_terms(irreps, lsh, lout, mul)
    rng = np.random.default_rng(12)
    up = jnp.asarray(rng.normal(size=(batch.n_node, Din)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(batch.n_node, Dout)).astype(np.float32))
    S = (lsh + 1) ** 2
    sh = jnp.asarray(rng.normal(size=(batch.n_edge, S)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(batch.n_edge, P * mul)).astype(np.float32)
    )
    ct_w = mace_ct_w_raw(
        batch, up, ct, sh, terms, mul, P * mul, interpret=True
    )
    ct_sh = mace_ct_sh_raw(batch, up, ct, w, terms, mul, S, interpret=True)
    rw, rsh = _ct_edge_xla(batch, ct, up, sh, w, terms, mul, P, S)
    for a, b, name in ((ct_w, rw, "ct_w"), (ct_sh, rsh, "ct_sh")):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 1e-5 * scale, name


@pytest.mark.parametrize("impl", ["vjp", "jvp"])
def test_tp_scatter_fused_radial_matches_composition(impl):
    """The fused-radial variant (w = h3a @ wla computed in-kernel) equals
    the explicit w composition, forward and grads through every input
    including the folded Dense kernel/bias rows."""
    from hydragnn_tpu.ops.mace_tp import weighted_tp_scatter_fused

    batch, irreps, up, sh, w_unused, mul, lsh, lout = _setup(seed=21)
    terms, Din, Dout, P, _, _, _ = tp_terms(irreps, lsh, lout, mul)
    rng = np.random.default_rng(22)
    H = 11
    h3 = jnp.asarray(rng.normal(size=(batch.n_edge, H)).astype(np.float32))
    kl = jnp.asarray(rng.normal(size=(H, P * mul)).astype(np.float32))
    bl = jnp.asarray(rng.normal(size=(P * mul,)).astype(np.float32))
    h3a = jnp.concatenate(
        [h3, jnp.ones((batch.n_edge, 1), jnp.float32)], axis=-1
    )
    wla = jnp.concatenate([kl, bl[None, :]], axis=0)

    fused = lambda a, b, c, d: weighted_tp_scatter_fused(
        batch, a, b, c, d, irreps, lsh, lout, mul, impl=impl,
        interpret=True,
    )
    ref = lambda a, b, c, d: _xla_ref(
        batch, a, b, jnp.dot(c, d), irreps, lsh, lout, mul
    )
    out = fused(up, sh, h3a, wla)
    out_ref = ref(up, sh, h3a, wla)
    scale = float(jnp.abs(out_ref).max())
    assert float(jnp.abs(out - out_ref).max()) < 2e-2 * scale

    ct = jnp.asarray(rng.normal(size=out_ref.shape).astype(np.float32))

    def loss(fn):
        return lambda a, b, c, d: jnp.sum(fn(a, b, c, d) * ct)

    g = jax.grad(loss(fused), (0, 1, 2, 3))(up, sh, h3a, wla)
    g_ref = jax.grad(loss(ref), (0, 1, 2, 3))(up, sh, h3a, wla)
    em = batch.edge_mask[:, None]
    for a, b, name in zip(g, g_ref, ("up", "sh", "h3a", "wla")):
        if name in ("sh", "h3a"):
            b = jnp.where(em, b, 0.0)
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 3e-2 * scale, name


def test_tp_scatter_vjp_raises_loudly_on_jvp():
    """The vjp variant must FAIL (not silently mis-differentiate) under
    forward-mode — the guard that force training selects impl='jvp'."""
    batch, irreps, up, sh, w, mul, lsh, lout = _setup(seed=7, mul=4)
    fused = lambda a: weighted_tp_scatter(
        batch, a, sh, w, irreps, lsh, lout, mul, impl="vjp", interpret=True
    )
    with pytest.raises(Exception):
        jax.jvp(fused, (up,), (up,))
