"""NBC / NBC2 / NB-BLSTM / NBSS: smoke + torch-reference parity with
transplanted weights."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbss_tpu.models import BLSTM2_FC1, NBC, NBC2, NBSS

HAS_REF = os.path.isdir("/root/reference")


def _ref():
    sys.path.insert(0, "/root/reference")
    import models.arch.NBC as rnbc
    import models.arch.NBC2 as rnbc2
    import models.arch.blstm2_fc1 as rblstm
    sys.path.pop(0)
    return rnbc, rnbc2, rblstm


def test_nbc2_shape(rng):
    m = NBC2(dim_input=4, dim_output=4, n_layers=2, dim_hidden=32, dim_ffn=64,
             num_freqs=9)
    x = jnp.asarray(rng.standard_normal((2, 9, 12, 4)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(p, x)
    assert y.shape == (2, 9, 12, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_nbc_shape(rng):
    m = NBC(dim_input=4, dim_output=4, n_layers=2, hidden_size=32, ffn_size=64,
            n_heads=4, dropout=0.0)
    x = jnp.asarray(rng.standard_normal((1, 9, 20, 4)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(p, x)
    assert y.shape == (1, 9, 20, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_blstm_shape(rng):
    m = BLSTM2_FC1(dim_input=4, dim_output=4, hidden_size=(16, 8))
    x = jnp.asarray(rng.standard_normal((1, 5, 12, 4)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(p, x)
    assert y.shape == (1, 5, 12, 4)


def test_nbss_module(rng):
    m = NBSS(n_channel=2, n_speaker=2, n_fft=128, n_overlap=64,
             arch="NB_BLSTM", arch_kwargs={"hidden_size": (16, 8)})
    x = jnp.asarray(rng.standard_normal((2, 2, 2000)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    y = jax.jit(m.apply)(p, x)
    assert y.shape == (2, 2, 2000)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_nbc2_parity_with_torch(rng):
    import torch

    _, rnbc2, _ = _ref()
    torch.manual_seed(0)
    F = 9
    tm = rnbc2.NBC2(
        dim_input=4, dim_output=4, n_layers=2, dim_hidden=32, dim_ffn=64,
        num_freqs=F,
        block_kwargs={
            "n_heads": 2, "dropout": 0, "conv_kernel_size": 3, "n_conv_groups": 8,
            "norms": ("LN", "GBN", "GBN"),
            "group_batch_norm_kwargs": {"share_along_sequence_dim": False},
        },
    ).eval()
    x = rng.standard_normal((2, F, 12, 4)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    from nbss_tpu.utils.torch_compat import nbc2_params_from_torch

    params = nbc2_params_from_torch({k: v.numpy() for k, v in tm.state_dict().items()}, 2)
    m = NBC2(dim_input=4, dim_output=4, n_layers=2, dim_hidden=32, dim_ffn=64,
             num_freqs=F, n_heads=2)
    y_j = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_nbc_parity_with_torch(rng):
    import torch

    rnbc, _, _ = _ref()
    torch.manual_seed(0)
    tm = rnbc.NBC(dim_input=4, dim_output=4, n_layers=2, hidden_size=32,
                  ffn_size=64, n_heads=4).eval()
    x = rng.standard_normal((1, 9, 20, 4)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    from nbss_tpu.utils.torch_compat import nbc_params_from_torch

    params = nbc_params_from_torch({k: v.numpy() for k, v in tm.state_dict().items()}, 2)
    m = NBC(dim_input=4, dim_output=4, n_layers=2, hidden_size=32, ffn_size=64,
            n_heads=4, dropout=0.0)
    y_j = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_blstm_parity_with_torch(rng):
    import torch

    _, _, rblstm = _ref()
    torch.manual_seed(0)
    tm = rblstm.BLSTM2_FC1(dim_input=4, dim_output=4, hidden_size=(8, 6)).eval()
    x = rng.standard_normal((1, 3, 15, 4)).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    from nbss_tpu.utils.torch_compat import blstm2_fc1_params_from_torch

    params = blstm2_fc1_params_from_torch({k: v.numpy() for k, v in tm.state_dict().items()})
    m = BLSTM2_FC1(dim_input=4, dim_output=4, hidden_size=(8, 6))
    y_j = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=2e-3)


def test_nbc_relpos_trig_decomposition(rng):
    """A.cos_j + B.sin_j factorization == gather/rel-shift construction."""
    import math

    from nbss_tpu.models.nbc import (_nbc_rel_shift, sincos_position_tables,
                                     sinusoidal_relpos_table)

    T, d, nh = 19, 16, 2
    dh = d // nh
    qv = rng.standard_normal((3, T, nh, dh)).astype(np.float32)
    W = rng.standard_normal((d, d)).astype(np.float32)  # pos_proj kernel

    pe = sinusoidal_relpos_table(T, d)          # [2T-1, d]
    pos = (pe @ W).reshape(2 * T - 1, nh, dh)
    pos_full = np.einsum("bqhd,rhd->bhqr", qv, pos)
    ref = np.asarray(_nbc_rel_shift(jnp.asarray(pos_full[..., ::-1]), T))

    Wh = W.reshape(d, nh, dh)
    gs = np.einsum("bqhd,mhd->bqhm", qv, Wh[0::2])
    gc = np.einsum("bqhd,mhd->bqhm", qv, Wh[1::2])
    sin_t, cos_t = sincos_position_tables(T, d)
    A = gs * sin_t[:, None, :] + gc * cos_t[:, None, :]
    B = gc * sin_t[:, None, :] - gs * cos_t[:, None, :]
    dec = np.einsum("bqhm,km->bhqk", A, cos_t) + np.einsum("bqhm,km->bhqk", B, sin_t)
    np.testing.assert_allclose(dec, ref, atol=1e-4, rtol=1e-4)


def test_nbc_fused_matches_xla_path_and_grads(rng):
    """Fused-kernel attention path == XLA softmax path (force_xla), both
    through the trig-decomposed positional score; grads match too."""
    from nbss_tpu.models.nbc import RelPosMultiHeadAttention

    x = jnp.asarray(rng.standard_normal((3, 17, 32)), jnp.float32)
    m_f = RelPosMultiHeadAttention(32, 2, dropout=0.0)
    m_x = RelPosMultiHeadAttention(32, 2, dropout=0.0, force_xla=True)
    params = m_f.init(jax.random.PRNGKey(0), x)
    y_f = m_f.apply(params, x)
    y_x = m_x.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               atol=2e-4, rtol=1e-3)
    g_f = jax.grad(lambda p: jnp.sum(m_f.apply(p, x) ** 2))(params)
    g_x = jax.grad(lambda p: jnp.sum(m_x.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-2)
