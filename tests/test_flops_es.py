"""FLOPs accounting + early stopping."""

import numpy as np

import jax
import jax.numpy as jnp

from nbss_tpu.io import Loss, Norm, STFT
from nbss_tpu.models import SpatialNet
from nbss_tpu.train import TrainModule, Trainer
from nbss_tpu.utils.flops import count_flops


def test_count_flops(tmp_path, rng):
    arch = SpatialNet(dim_input=4, dim_output=4, num_layers=1, dim_hidden=32,
                      dim_ffn=64, num_heads=2, dim_squeeze=4, num_freqs=33)
    module = TrainModule(arch=arch, channels=(0, 1), ref_channel=0,
                         stft=STFT(n_fft=64, n_hop=32),
                         norm=Norm(mode="frequency"), loss=Loss())
    x = jnp.asarray(rng.standard_normal((1, 2, 2000)), jnp.float32)
    X, _ = module.stft.stft(x[:, (0, 1)])
    Xin = jnp.zeros((1, 33, X.shape[-1], 4))
    params = arch.init(jax.random.PRNGKey(0), Xin)
    out = count_flops(module, params, x, audio_seconds=0.25)
    assert out["flops_forward"] > 1e6
    assert out["flops_backward"] > out["flops_forward"] * 0.5
    assert out["params"] == sum(p.size for p in jax.tree.leaves(params))
    assert out["flops_forward_avg"] == out["flops_forward"] / 0.25


def test_early_stopping_logic():
    t = Trainer.__new__(Trainer)
    t.early_stopping = {"mode": "max", "min_delta": 0.1, "patience": 2}
    t._es_best, t._es_bad = None, 0
    assert not t._should_stop(1.0)
    assert not t._should_stop(1.05)  # below min_delta -> bad epoch 1
    assert t._should_stop(1.04)      # bad epoch 2 -> stop
    # improvement resets
    t._es_best, t._es_bad = None, 0
    assert not t._should_stop(1.0)
    assert not t._should_stop(1.2)
    assert not t._should_stop(1.0)
    assert not t._should_stop(1.4)
    assert not t._should_stop(1.0)
