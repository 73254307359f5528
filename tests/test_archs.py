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
