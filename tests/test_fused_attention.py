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


def test_fused_tconvffn_matches_reference(rng):
    import jax
    import jax.numpy as jnp
    from nbss_tpu.ops.tconvffn import _ref_tconvffn, expand_grouped_kernel, fused_tconvffn

    M, T, H, FF, G = 6, 29, 32, 64, 8
    x = jnp.asarray(rng.standard_normal((M, T, H)), jnp.float32)
    p = {
        "ln_scale": jnp.asarray(rng.standard_normal(H) * 0.1 + 1, jnp.float32),
        "ln_bias": jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32),
        "w_up": jnp.asarray(rng.standard_normal((H, FF)) * 0.2, jnp.float32),
        "b_up": jnp.asarray(rng.standard_normal(FF) * 0.1, jnp.float32),
        "gn_scale": jnp.asarray(rng.standard_normal(FF) * 0.1 + 1, jnp.float32),
        "gn_bias": jnp.asarray(rng.standard_normal(FF) * 0.1, jnp.float32),
        "w_down": jnp.asarray(rng.standard_normal((FF, H)) * 0.2, jnp.float32),
        "b_down": jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32),
    }
    for c in ("c1", "c2", "c3"):
        grouped = jnp.asarray(rng.standard_normal((3, FF // G, FF)) * 0.2, jnp.float32)
        p[f"w_{c}"] = expand_grouped_kernel(grouped, G)
        p[f"b_{c}"] = jnp.asarray(rng.standard_normal(FF) * 0.1, jnp.float32)

    out = fused_tconvffn(x, p, G, 4)
    ref = _ref_tconvffn(x, p, G)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-3)

    # grads flow through the custom_vjp
    g = jax.grad(lambda x: jnp.sum(fused_tconvffn(x, p, G, 4) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(_ref_tconvffn(x, p, G) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-3, rtol=1e-2)


def test_spatialnet_fused_ffn_matches_unfused(rng):
    import jax
    import jax.numpy as jnp
    from nbss_tpu.models.spatialnet import SpatialNet

    kw = dict(dim_input=4, dim_output=4, num_layers=1, dim_hidden=32, dim_ffn=64,
              num_heads=2, dim_squeeze=4, num_freqs=9, full_share=0)
    m_f = SpatialNet(**kw, fused_ffn=True)
    m_u = SpatialNet(**kw, fused_ffn=False)
    x = jnp.asarray(rng.standard_normal((2, 9, 17, 4)), jnp.float32)
    params = m_u.init(jax.random.PRNGKey(0), x)
    y_u = m_u.apply(params, x)
    y_f = m_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_u), atol=1e-4, rtol=1e-3)


def test_separate_value_width(rng):
    """q/k augmented wider than v (NBC's positional augmentation)."""
    M, T, nh, dh, dv = 4, 23, 2, 40, 16
    q = jnp.asarray(rng.standard_normal((M, T, nh * dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((M, T, nh * dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((M, T, nh * dv)), jnp.float32)
    out = narrowband_attention(q, k, v, None, nh, 4)
    ref = _attention_reference(q, k, v, None, nh)
    assert out.shape == (M, T, nh * dv)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    g = jax.grad(lambda q, k, v: jnp.sum(narrowband_attention(q, k, v, None, nh, 4) ** 2),
                 argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_attention_reference(q, k, v, None, nh) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)
