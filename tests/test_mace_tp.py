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


def test_tp_scatter_vjp_raises_loudly_on_jvp():
    """The vjp variant must FAIL (not silently mis-differentiate) under
    forward-mode — the guard that force training selects impl='jvp'."""
    batch, irreps, up, sh, w, mul, lsh, lout = _setup(seed=7, mul=4)
    fused = lambda a: weighted_tp_scatter(
        batch, a, sh, w, irreps, lsh, lout, mul, impl="vjp", interpret=True
    )
    with pytest.raises(Exception):
        jax.jvp(fused, (up,), (up,))
