"""Fused GATv2 attention kernels (ops/gat_attention.py) on the CPU
interpreter: forward parity with the XLA composition, gradients through
every input, and the dropout-mask stream.  Reference anchor: PyG
GATv2Conv as used by hydragnn/models/GATStack.py:16,176."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hydragnn_tpu.ops.gat_attention import (
    _BIG,
    _HP,
    _gat_fused_core,
    _gat_xla_ref,
    gat_edge_attention,
    head_block_matrix,
)
from tests.test_fused_gather import _window_batch


def _setup(seed=0, H=4, F=32):
    batch = _window_batch(n_graphs=4, n=40, deg=5, seed=seed)
    rng = np.random.default_rng(seed + 1)
    xl = jnp.asarray(
        rng.normal(size=(batch.n_node, H * F)).astype(np.float32)
    )
    xr = jnp.asarray(
        rng.normal(size=(batch.n_node, H * F)).astype(np.float32)
    )
    att = jnp.asarray(rng.normal(size=(H, F)).astype(np.float32)) * 0.3
    selfl = jnp.concatenate(
        [
            jnp.asarray(
                rng.normal(size=(batch.n_node, H)).astype(np.float32)
            ),
            jnp.full((batch.n_node, _HP - H), -_BIG, jnp.float32),
        ],
        axis=-1,
    )
    return batch, xl, xr, att, selfl, H, F


def test_gat_fused_forward_matches_xla():
    batch, xl, xr, att, selfl, H, F = _setup()
    attm = head_block_matrix(att)
    out_f, m_f, d_f = _gat_fused_core(
        batch, xl, xr, attm, 0.05, selfl, None, H, F, interpret=True
    )
    out_r, m_r, d_r = _gat_xla_ref(
        batch, xl, xr, attm, selfl, slope=0.05, H=H, F=F
    )
    assert float(jnp.abs(m_f[:, :H] - m_r[:, :H]).max()) < 1e-1  # bf16 logits
    dr = jnp.abs(d_f[:, :H] - d_r[:, :H]) / jnp.maximum(d_r[:, :H], 1e-6)
    assert float(dr.max()) < 3e-2
    scale = float(jnp.abs(out_r).max()) + 1e-6
    assert float(jnp.abs(out_f - out_r).max()) < 3e-2 * scale


def test_gat_fused_with_dropout_mask():
    batch, xl, xr, att, selfl, H, F = _setup(seed=2)
    attm = head_block_matrix(att)
    rng = np.random.default_rng(5)
    mask = np.zeros((batch.n_edge, _HP), np.float32)
    mask[:, :H] = (rng.random((batch.n_edge, H)) < 0.8) / 0.8
    mask = jnp.asarray(mask)
    out_f, _, _ = _gat_fused_core(
        batch, xl, xr, attm, 0.05, selfl, mask, H, F, interpret=True
    )
    out_r, _, _ = _gat_xla_ref(
        batch, xl, xr, attm, selfl, mask, slope=0.05, H=H, F=F
    )
    scale = float(jnp.abs(out_r).max()) + 1e-6
    assert float(jnp.abs(out_f - out_r).max()) < 3e-2 * scale


def test_gat_attention_grads_match_xla():
    """custom_jvp wrapper: grads wrt xl/xr/att equal the pure-XLA path
    (the tangents ARE the XLA jvp; this pins the wiring)."""
    batch, xl, xr, att, selfl, H, F = _setup(seed=3)
    rng = np.random.default_rng(7)
    ct = jnp.asarray(
        rng.normal(size=(batch.n_node, H * F)).astype(np.float32)
    )

    def loss_fused(a, b, c):
        out, _, _ = gat_edge_attention(
            batch, a, b, c, 0.05, selfl, interpret=True
        )
        return jnp.vdot(out, ct)

    def loss_ref(a, b, c):
        out, _, _ = _gat_xla_ref(
            batch, a, b, c_mat(c), selfl, slope=0.05, H=H, F=F
        )
        return jnp.vdot(out, ct)

    c_mat = head_block_matrix
    g = jax.grad(loss_fused, (0, 1, 2))(xl, xr, att)
    g_ref = jax.grad(loss_ref, (0, 1, 2))(xl, xr, att)
    for a, b, name in zip(g, g_ref, ("xl", "xr", "att")):
        scale = float(jnp.abs(b).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) < 1e-4 * scale, name


def test_gat_attention_vjp_grads_match_xla():
    """Fused custom_vjp backward (_gat_backward_kernel): grads wrt
    xl/xr/att/self_logits equal the full XLA composition, with and
    without the dropout mask streams."""
    from hydragnn_tpu.ops.gat_attention import _gat_full_xla, gat_attention

    batch, xl, xr, att, selfl_pad, H, F = _setup(seed=9)
    selfl = selfl_pad[:, :H]
    rng = np.random.default_rng(13)
    # bf16-representable inputs: the kernel's one-hot gathers round values
    # to bf16, so a leaky-relu kink can take a different branch than the
    # fp32 XLA ref on near-zero pre-activations.  The backward is exact
    # for the FUSED primal's branches; quantizing the inputs makes both
    # paths take identical branches so the comparison is meaningful.
    q = lambda a: a.astype(jnp.bfloat16).astype(jnp.float32)  # noqa: E731
    xl, xr, att = q(xl), q(xr), q(att)
    ct = q(jnp.asarray(
        rng.normal(size=(batch.n_node, H * F)).astype(np.float32)
    ))
    for with_mask in (False, True):
        if with_mask:
            emask = np.zeros((batch.n_edge, _HP), np.float32)
            emask[:, :H] = (rng.random((batch.n_edge, H)) < 0.8) / 0.8
            emask = jnp.asarray(emask)
            smask = jnp.asarray(
                ((rng.random((batch.n_node, H)) < 0.8) / 0.8).astype(
                    np.float32
                )
            )
        else:
            emask = smask = None

        def loss_fused(a, b, c, sl):
            out = gat_attention(
                batch, a, b, c, 0.05, sl, emask, smask,
                impl="vjp", interpret=True,
            )
            return jnp.vdot(out, ct)

        def loss_ref(a, b, c, sl):
            sp = jnp.concatenate(
                [sl, jnp.full((batch.n_node, _HP - H), -_BIG, jnp.float32)],
                axis=-1,
            )
            out = _gat_full_xla(
                batch, a, b, head_block_matrix(c), sp, emask, smask,
                slope=0.05, H=H, F=F,
            )
            return jnp.vdot(out, ct)

        g = jax.grad(loss_fused, (0, 1, 2, 3))(xl, xr, att, selfl)
        g_ref = jax.grad(loss_ref, (0, 1, 2, 3))(xl, xr, att, selfl)
        for a, b, name in zip(g, g_ref, ("xl", "xr", "att", "selfl")):
            scale = float(jnp.abs(b).max()) + 1e-6
            err = float(jnp.abs(a - b).max()) / scale
            assert err < 3e-2, (with_mask, name, err)


def test_gat_attention_vjp_rejects_forward_mode():
    """The vjp impl must fail LOUDLY under forward-mode AD rather than
    silently mis-differentiating (the MACE-kernel contract)."""
    from hydragnn_tpu.ops.gat_attention import gat_attention

    batch, xl, xr, att, selfl_pad, H, F = _setup(seed=10)
    selfl = selfl_pad[:, :H]

    def f(a):
        return gat_attention(
            batch, a, xr, att, 0.05, selfl, impl="vjp", interpret=True
        ).sum()

    with pytest.raises(TypeError):
        jax.jvp(f, (xl,), (jnp.ones_like(xl),))


def test_gatv2_conv_fused_matches_fallback():
    """Model level: GATv2Conv through the fused kernels == the XLA
    fallback path (eval mode, no dropout)."""
    import flax.linen as fnn

    from hydragnn_tpu.models.invariant import GATv2Conv
    from hydragnn_tpu.ops import fused_gather

    batch, _, _, _, _, _, _ = _setup(seed=4)
    rng = np.random.default_rng(11)
    inv = jnp.asarray(rng.normal(size=(batch.n_node, 16)).astype(np.float32))
    conv = GATv2Conv(out_dim=32, heads=4, dropout=0.0)
    params = conv.init(
        jax.random.PRNGKey(0), batch, inv, None, {}, train=False
    )

    import unittest.mock as mock

    import hydragnn_tpu.ops.gat_attention as ga

    out_fb, _ = conv.apply(params, batch, inv, None, {}, train=False)
    orig = ga._gat_fused_core
    with mock.patch.object(
        fused_gather, "has_window_plans", lambda g: True
    ), mock.patch.object(
        ga, "_gat_fused_core",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    ):
        out_fu, _ = conv.apply(params, batch, inv, None, {}, train=False)
    scale = float(jnp.abs(out_fb).max()) + 1e-6
    assert float(jnp.abs(out_fu - out_fb).max()) < 3e-2 * scale
