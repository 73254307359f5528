"""Fused narrow-band attention kernel vs the einsum reference (interpret
mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbss_tpu.ops.attention import _attention_reference, narrowband_attention


def _qkv(rng, M=6, T=37, H=48):
    mk = lambda: jnp.asarray(rng.standard_normal((M, T, H)), jnp.float32)
    return mk(), mk(), mk()


def test_matches_reference_nomask(rng):
    q, k, v = _qkv(rng)
    out = narrowband_attention(q, k, v, None, 4, 4)
    ref = _attention_reference(q, k, v, None, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_matches_reference_shared_mask(rng):
    q, k, v = _qkv(rng)
    T = q.shape[1]
    i = np.arange(T)
    mask = jnp.asarray(np.where(i[:, None] >= i[None, :], 0.0, -1e30), jnp.float32)
    out = narrowband_attention(q, k, v, mask, 4, 4)
    ref = _attention_reference(q, k, v, mask, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_matches_reference_per_head_mask(rng):
    nh = 4
    q, k, v = _qkv(rng)
    T = q.shape[1]
    i = np.arange(T)
    rel = i[:, None] - i[None, :]
    slopes = 2.0 ** (-8.0 / np.arange(1, nh + 1))
    base = np.where((rel >= 0) & (rel < 16), -np.abs(rel), -np.inf)
    mask = jnp.asarray(slopes[:, None, None] * base[None], jnp.float32)
    mask = jnp.nan_to_num(mask, neginf=-1e30)
    out = narrowband_attention(q, k, v, mask, nh, 4)
    ref = _attention_reference(q, k, v, mask, nh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_grad_flows(rng):
    q, k, v = _qkv(rng, M=4, T=19, H=32)

    def loss(q, k, v):
        return jnp.sum(narrowband_attention(q, k, v, None, 2, 4) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(_attention_reference(q, k, v, None, 2) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_bf16_and_ragged_m(rng):
    q, k, v = _qkv(rng, M=10, T=33, H=48)  # M not divisible by block
    q = q.astype(jnp.bfloat16)
    k = k.astype(jnp.bfloat16)
    v = v.astype(jnp.bfloat16)
    out = narrowband_attention(q, k, v, None, 2, 8)
    ref = _attention_reference(q, k, v, None, 2)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_mha_module_fused_equals_einsum(rng):
    """MultiheadAttention with fused=True (interpret) == fused=False."""
    from nbss_tpu.models.base import MultiheadAttention

    x = jnp.asarray(rng.standard_normal((2, 5, 21, 32)), jnp.float32)
    m_f = MultiheadAttention(num_heads=4, fused=True)
    m_e = MultiheadAttention(num_heads=4, fused=False)
    params = m_f.init(jax.random.PRNGKey(0), x)
    y_f = m_f.apply(params, x)
    y_e = m_e.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e), atol=2e-5, rtol=1e-4)

    T = x.shape[2]
    i = np.arange(T)
    mask = jnp.asarray(np.where(i[:, None] >= i[None, :], 0.0, -1e30), jnp.float32)
    y_f = m_f.apply(params, x, attn_mask=mask)
    y_e = m_e.apply(params, x, attn_mask=mask)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_e), atol=2e-5, rtol=1e-4)
