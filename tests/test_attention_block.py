"""Fused attention-block megakernel (ops/attention_block.py) parity.

The folded-weight math (A = Wq Wk^T scale, Wvo = Wv Wo, bias collapse) must
reproduce the unfused module composition x + out_proj(MHSA(LN(x))) exactly
(fp32, CPU interpret mode), both through the kernel and through the XLA
reference used by the backward.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from nbss_tpu.models.spatialnet import SpatialNet
from nbss_tpu.ops.attention_block import (
    _reference,
    attention_block,
    fold_weights,
)


def _spatialnet_pair(rng, B=2, F=5, T=33, H=24, nh=4, num_layers=2):
    kw = dict(dim_input=6, dim_output=4, num_layers=num_layers, dim_hidden=H,
              dim_ffn=2 * H, num_heads=nh, kernel_size=(5, 3),
              conv_groups=(4, 4), dim_squeeze=4, num_freqs=F, full_share=0)
    x = jnp.asarray(rng.standard_normal((B, F, T, 6)), jnp.float32)
    m_ref = SpatialNet(**kw, fused_block=False)
    params = m_ref.init(jax.random.PRNGKey(3), x)
    m_fused = SpatialNet(**kw, fused_block=True)
    return m_ref, m_fused, params, x


def test_block_matches_module_composition(rng):
    """Kernel (interpret) vs the unfused LN->MHSA->out_proj->residual path
    inside the full SpatialNet forward."""
    m_ref, m_fused, params, x = _spatialnet_pair(rng)
    y_ref = m_ref.apply(params, x)
    y_fused = m_fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-4)


def test_reference_matches_kernel(rng):
    """The XLA reference composition used by the custom_vjp backward equals
    the kernel forward."""
    M, T, H, nh = 6, 40, 16, 2
    x = jnp.asarray(rng.standard_normal((M, T, H)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.2, jnp.float32)
    b_in = jnp.asarray(rng.standard_normal((3 * H,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((H, H)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal((H,)), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal((H,)), jnp.float32)
    ln, A, Wvo, c, eps = fold_weights(ln_s, ln_b, w_in, b_in, w_out, b_out, nh)
    y_k = attention_block(x, ln, A, Wvo, c, eps, nh)
    y_r = _reference(x, ln, A, Wvo, c, eps, nh)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("pipe", ["0", "1"])
def test_block_pipeline_orders_match(rng, monkeypatch, pipe):
    """Both kernel emission orders (NBSS_BLOCK_PIPE=0 sequential, =1
    software-pipelined score/softmax/PV interleave) equal the XLA
    reference — the pipeline is a pure scheduling change."""
    monkeypatch.setenv("NBSS_BLOCK_PIPE", pipe)
    M, T, H, nh = 6, 40, 16, 4
    x = jnp.asarray(rng.standard_normal((M, T, H)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.2, jnp.float32)
    b_in = jnp.asarray(rng.standard_normal((3 * H,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((H, H)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal((H,)), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal((H,)), jnp.float32)
    ln, A, Wvo, c, eps = fold_weights(ln_s, ln_b, w_in, b_in, w_out, b_out, nh)
    y_k = attention_block(x, ln, A, Wvo, c, eps, nh)
    y_r = _reference(x, ln, A, Wvo, c, eps, nh)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               atol=1e-4, rtol=1e-4)


def test_block_gradients(rng):
    """custom_vjp backward (XLA recompute) vs finite differences through the
    fused model."""
    m_ref, m_fused, params, x = _spatialnet_pair(rng, B=1, F=3, T=17,
                                                 num_layers=1)

    def loss_fused(p):
        return jnp.sum(m_fused.apply(p, x) ** 2)

    def loss_ref(p):
        return jnp.sum(m_ref.apply(p, x) ** 2)

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               atol=5e-3, rtol=5e-3)


def test_fused_flag_plumbing(rng, monkeypatch):
    """NBSS_FUSED_BLOCK env enables the kernel when fused_block is None."""
    m_ref, _, params, x = _spatialnet_pair(rng, num_layers=1)
    kw = {f.name: getattr(m_ref, f.name)
          for f in m_ref.__dataclass_fields__.values() if f.name != "parent"}
    kw["fused_block"] = None
    monkeypatch.setenv("NBSS_FUSED_BLOCK", "1")
    y_env = SpatialNet(**kw).apply(params, x)
    y_ref = m_ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_env), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-4)


def test_nbc2_fused_block_matches_unfused(rng):
    """NBC2's pre-norm unmasked MHSA through the megakernel equals the
    unfused path (VERDICT round-4 item 6; reference NBC2.py:171), fwd and
    grad."""
    from nbss_tpu.models.nbc2 import NBC2

    kw = dict(dim_input=6, dim_output=4, n_layers=2, dim_hidden=24,
              dim_ffn=48, num_freqs=5, n_heads=4, conv_kernel_size=3,
              n_conv_groups=4)
    x = jnp.asarray(rng.standard_normal((2, 5, 33, 6)), jnp.float32)
    m_ref = NBC2(**kw, fused_block=False)
    params = m_ref.init(jax.random.PRNGKey(3), x)
    m_fused = NBC2(**kw, fused_block=True)
    y_ref = m_ref.apply(params, x)
    y_fused = m_fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-4)

    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply(p, x) ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.sum(m_fused.apply(p, x) ** 2))(params)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_fused)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-3, rtol=5e-3)


def test_nbc2_fused_guards(monkeypatch):
    """NBC2's fused route honours the same preconditions as SpatialNet's."""
    from nbss_tpu.models.nbc2 import NBC2Block

    blk = NBC2Block(dim_hidden=24, dim_ffn=48, n_heads=4).bind({})
    monkeypatch.setenv("NBSS_FUSED_BLOCK", "1")
    assert blk._use_fused_block(None, True) is True
    assert blk._use_fused_block(object(), True) is False  # mask present
    monkeypatch.setenv("NBSS_FUSED_BLOCK", "0")
    assert blk._use_fused_block(None, True) is False
    # non-LN pre-norm vetoes the kernel
    monkeypatch.setenv("NBSS_FUSED_BLOCK", "1")
    gbn = NBC2Block(dim_hidden=24, dim_ffn=48, n_heads=4,
                    norms=("GBN", "GBN", "GBN")).bind({})
    assert gbn._use_fused_block(None, True) is False


def test_fused_default_follows_backend(monkeypatch):
    """fused_block=None with no env: default ON on accelerator backends,
    OFF on the interpret-only CPU backend; NBSS_FUSED_BLOCK=0/1 overrides
    both ways (models/spatialnet.py _use_fused_block)."""
    import jax as _jax

    from nbss_tpu.models.spatialnet import SpatialNetLayer

    lay = SpatialNetLayer(dim_hidden=32, dim_ffn=64, dim_squeeze=8,
                          num_freqs=33, num_heads=2).bind({})
    monkeypatch.delenv("NBSS_FUSED_BLOCK", raising=False)
    expect = _jax.default_backend() != "cpu"
    assert lay._use_fused_block(None, True) is expect
    monkeypatch.setenv("NBSS_FUSED_BLOCK", "0")
    assert lay._use_fused_block(None, True) is False
    monkeypatch.setenv("NBSS_FUSED_BLOCK", "1")
    assert lay._use_fused_block(None, True) is True
    # precondition guards still veto the kernel
    assert lay._use_fused_block(object(), True) is False  # mask present


def test_pallas_backward_matches_reference_vjp(rng):
    """The hand-written Pallas backward equals jax.vjp through the XLA
    reference composition for every cotangent (x, ln, A, Wvo, c)."""
    from nbss_tpu.ops.attention_block import _fused_block_bwd

    M, T, H, nh = 5, 37, 16, 2
    x = jnp.asarray(rng.standard_normal((M, T, H)), jnp.float32)
    w_in = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.2, jnp.float32)
    b_in = jnp.asarray(rng.standard_normal((3 * H,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((H, H)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1 + 0.1 * rng.standard_normal((H,)), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal((H,)), jnp.float32)
    ln, A, Wvo, c, eps = fold_weights(ln_s, ln_b, w_in, b_in, w_out, b_out, nh)
    g = jnp.asarray(rng.standard_normal((M, T, H)), jnp.float32)

    dx, dln, dA, dWvo, dc = _fused_block_bwd(x, ln, A, Wvo, g, eps, nh, 8)
    _, vjp = jax.vjp(lambda *a: _reference(*a, eps, nh), x, ln, A, Wvo, c)
    rx, rln, rA, rWvo, rc = vjp(g)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(rx), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dln), np.asarray(rln), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dc), np.asarray(rc), atol=2e-4, rtol=1e-3)
    # constant-slot entries ([H, H+1] of A, [H, H] of Wvo, pad row/col) are
    # discarded by fold_weights' .at[].set vjp — compare only param slots
    Hh = H
    np.testing.assert_allclose(np.asarray(dA)[:, :Hh + 1, :Hh],
                               np.asarray(rA)[:, :Hh + 1, :Hh],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dWvo)[:, :Hh, :Hh],
                               np.asarray(rWvo)[:, :Hh, :Hh],
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# NBC rel-pos variant
# ---------------------------------------------------------------------------

def _nbc_pair(rng, B=2, F=3, T=29, H=16, nh=2):
    from nbss_tpu.models.nbc import NBC

    kw = dict(dim_input=6, dim_output=4, n_layers=2, encoder_kernel_size=4,
              n_heads=nh, hidden_size=H, ffn_size=2 * H, inner_conv_groups=2,
              inner_conv_layers=1, dropout=0.0)
    x = jnp.asarray(rng.standard_normal((B, F, T, 6)), jnp.float32)
    m_ref = NBC(**kw, fused_block=False)
    params = m_ref.init(jax.random.PRNGKey(5), x)
    m_fused = NBC(**kw, fused_block=True)
    return m_ref, m_fused, params, x


def test_nbc_relpos_block_matches_module(rng):
    """attention_block_relpos (kernel, interpret) inside the full NBC forward
    equals the unfused trig-factorized XLA path."""
    m_ref, m_fused, params, x = _nbc_pair(rng)
    y_ref = m_ref.apply(params, x)
    y_fused = m_fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-4, rtol=1e-4)


def test_nbc_relpos_gradients(rng):
    """custom_vjp backward (XLA recompute of the folded rel-pos math) vs the
    unfused module gradients."""
    m_ref, m_fused, params, x = _nbc_pair(rng, B=1, F=2, T=21)

    g_fused = jax.grad(lambda p: jnp.sum(m_fused.apply(p, x) ** 2))(params)
    g_ref = jax.grad(lambda p: jnp.sum(m_ref.apply(p, x) ** 2))(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               atol=5e-3, rtol=5e-3)
