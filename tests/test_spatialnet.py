"""SpatialNet: shape/jit smoke tests + numerics parity vs the torch reference
with transplanted weights (golden-value test, SURVEY.md §4)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbss_tpu.models.spatialnet import SpatialNet

SMALL = dict(
    dim_input=12, dim_output=4, num_layers=2, dim_hidden=96, dim_ffn=192,
    kernel_size=(5, 3), conv_groups=(8, 8),
    norms=("LN", "LN", "GN", "LN", "LN", "LN"),
    dim_squeeze=8, num_freqs=33, full_share=0, num_heads=4,
)


def test_forward_shape(rng):
    model = SpatialNet(**SMALL)
    x = jnp.asarray(rng.standard_normal((1, 33, 20, 12)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (1, 33, 20, 4)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


def test_full_share_reduces_params():
    shared = SpatialNet(**{**SMALL, "num_layers": 4, "full_share": 0})
    unshared = SpatialNet(**{**SMALL, "num_layers": 4, "full_share": 3})
    x = jnp.zeros((1, 33, 8, 12))
    n_shared = sum(p.size for p in jax.tree.leaves(shared.init(jax.random.PRNGKey(0), x)))
    n_unshared = sum(p.size for p in jax.tree.leaves(unshared.init(jax.random.PRNGKey(0), x)))
    # 3 extra LinearGroup modules of (8 * 33 * 33 + 8 * 33) params
    assert n_unshared - n_shared == 3 * (8 * 33 * 33 + 8 * 33)


def test_bf16_compute():
    model = SpatialNet(**SMALL, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 33, 12, 12))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.dtype == jnp.float32  # decoder output promoted back
    # params stay fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="reference not mounted")
def test_parity_with_torch_reference(rng):
    """Transplant random torch weights, compare forward outputs."""
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.arch.SpatialNet import SpatialNet as TorchSpatialNet
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    kw = dict(SMALL)
    tm = TorchSpatialNet(
        dim_input=kw["dim_input"], dim_output=kw["dim_output"], num_layers=kw["num_layers"],
        dim_hidden=kw["dim_hidden"], dim_ffn=kw["dim_ffn"], kernel_size=kw["kernel_size"],
        conv_groups=kw["conv_groups"], norms=list(kw["norms"]), dim_squeeze=kw["dim_squeeze"],
        num_freqs=kw["num_freqs"], full_share=kw["full_share"], num_heads=kw["num_heads"],
    ).eval()

    x = rng.standard_normal((2, kw["num_freqs"], 17, kw["dim_input"])).astype(np.float32)
    with torch.no_grad():
        y_t = tm(torch.from_numpy(x)).numpy()

    from nbss_tpu.utils.torch_compat import spatialnet_params_from_torch

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = spatialnet_params_from_torch(sd, num_layers=kw["num_layers"], full_share=kw["full_share"])
    model = SpatialNet(**SMALL)
    y_j = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert y_j.shape == y_t.shape
    np.testing.assert_allclose(y_j, y_t, atol=2e-4, rtol=2e-3)


def test_remat_matches_and_grads(rng):
    kw = dict(SMALL, num_layers=2)
    m_r = SpatialNet(**kw, remat=True)
    m_n = SpatialNet(**kw, remat=False)
    x = jnp.asarray(rng.standard_normal((1, 33, 12, 12)), jnp.float32)
    params = m_n.init(jax.random.PRNGKey(0), x)
    y_r = m_r.apply(params, x)
    y_n = m_n.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_n), atol=1e-5)
    g = jax.grad(lambda p: float(0) + jnp.mean(m_r.apply(p, x) ** 2))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
