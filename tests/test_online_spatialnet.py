"""OnlineSpatialNet: causality checks (reference __main__ OnlineSpatialNet.py:
422-426), streaming equivalence, mamba scan-vs-step equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nbss_tpu.models.mamba import MambaBlock
from nbss_tpu.models.online_spatialnet import OnlineSpatialNet

CFG = dict(
    dim_input=4, dim_output=4, num_layers=2, dim_hidden=32, dim_ffn=64,
    num_heads=4, kernel_size=(5, 3), conv_groups=(8, 8),
    norms=("LN", "LN", "GN", "LN", "LN", "LN"), dim_squeeze=4,
    num_freqs=9, full_share=0,
)


def _causality(model, rng, T=40, T1=25):
    x = rng.standard_normal((1, CFG["num_freqs"], T, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:, :, :T1]))
    y_full = np.asarray(model.apply(params, jnp.asarray(x)))
    y_part = np.asarray(model.apply(params, jnp.asarray(x[:, :, :T1])))
    np.testing.assert_allclose(y_full[:, :, :T1], y_part, atol=1e-4, rtol=1e-3)
    return params, x, y_full


@pytest.mark.parametrize("attention,rope", [
    ("mhsa(16)", False),
    ("mhsa(inf)", False),
    ("mhsa(16)", "ALiBi"),
    ("mamba(8,4)", False),
])
def test_causal(rng, attention, rope):
    model = OnlineSpatialNet(attention=attention, rope=rope, **CFG)
    _causality(model, rng)


@pytest.mark.parametrize("rope", [False, True])
def test_causal_retention_chunkwise(rng, rope):
    model = OnlineSpatialNet(attention="ret(2,share_qk)", decay=(4, 5, 9, 10),
                             chunkwise_recurrent=True, rope=rope, **CFG)
    _causality(model, rng)


def test_retention_recurrent_inference_matches_training(rng):
    """inference=True (O(1)-state scan) ~= chunkwise/parallel training path."""
    model = OnlineSpatialNet(attention="ret(2,not_share_qk)", decay=(4, 5, 9, 10),
                             chunkwise_recurrent=False, rope=True, **CFG)
    x = rng.standard_normal((1, CFG["num_freqs"], 30, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_train = np.asarray(model.apply(params, jnp.asarray(x)))
    y_inf = np.asarray(model.apply(params, jnp.asarray(x), inference=True))
    np.testing.assert_allclose(y_train, y_inf, atol=2e-3, rtol=2e-2)


def test_mamba_streaming_equals_scan(rng):
    m = MambaBlock(d_model=16, d_state=8, d_conv=4)
    x = jnp.asarray(rng.standard_normal((3, 20, 16)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(params, x))

    state = m.init_state(3)
    outs = []
    for t in range(20):
        y_t, state = m.apply(params, x[:, t:t + 1], state, method=m.streaming_step)
        outs.append(y_t)
    y_str = np.asarray(jnp.concatenate(outs, axis=1))
    np.testing.assert_allclose(y, y_str, atol=1e-4, rtol=1e-3)


def test_mamba_grads_finite(rng):
    m = MambaBlock(d_model=16, d_state=8, d_conv=4)
    x = jnp.asarray(rng.standard_normal((2, 15, 16)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(m.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_online_spatialnet_jit_and_grad(rng):
    model = OnlineSpatialNet(attention="mamba(8,4)", **CFG)
    x = jnp.asarray(rng.standard_normal((2, 9, 16, 4)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def loss(p, x):
        return jnp.mean(model.apply(p, x) ** 2)

    g = jax.jit(jax.grad(loss))(params, x)
    assert np.isfinite(float(loss(params, x)))
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_selective_scan_pallas_matches_xla(rng):
    import jax.numpy as jnp
    from nbss_tpu.ops.ssm import _selective_scan_xla, selective_scan_pallas

    B, T, D, N = 5, 21, 32, 8
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, T, D)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (D, N)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Dp = jnp.asarray(rng.standard_normal(D), jnp.float32)
    ref = _selective_scan_xla(x, dt, A, Bm, Cm, Dp)
    out = selective_scan_pallas(x, dt, A, Bm, Cm, Dp, t_chunk=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_selective_scan_custom_bwd_matches_autodiff(rng):
    import jax
    import jax.numpy as jnp
    from nbss_tpu.ops.ssm import _selective_scan_xla, selective_scan

    B, T, D, N = 3, 13, 8, 4
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, T, D)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (D, N)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Dp = jnp.asarray(rng.standard_normal(D), jnp.float32)

    def loss_custom(*args):
        return jnp.sum(selective_scan(*args) ** 2)

    def loss_ref(*args):
        return jnp.sum(_selective_scan_xla(*args) ** 2)

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, Bm, Cm, Dp)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(x, dt, A, Bm, Cm, Dp)
    for name, a, b in zip("x dt A B C D".split(), g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("attention,rope", [
    ("mamba(8,4)", False),
    ("ret(2,share_qk)", False),
    ("ret(2,not_share_qk)", True),
    ("mhsa(6)", False),
    ("mhsa(6)", "ALiBi"),
    ("mhsa(64)", False),  # scope > T: full causal attention
])
def test_streaming_step_matches_offline(rng, attention, rope):
    """Frame-by-frame streaming_step == offline causal forward."""
    model = OnlineSpatialNet(attention=attention, decay=(4, 5, 9, 10),
                             chunkwise_recurrent=False, rope=rope, **CFG)
    T = 14
    x = rng.standard_normal((2, CFG["num_freqs"], T, 4)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_off = np.asarray(model.apply(params, jnp.asarray(x)))

    state = model.apply(params, 2, method=model.init_streaming_state)
    step = jax.jit(lambda p, x_t, st: model.apply(p, x_t, st,
                                                  method=model.streaming_step))
    outs = []
    for t in range(T):
        y_t, state = step(params, jnp.asarray(x[:, :, t]), state)
        outs.append(np.asarray(y_t))
    y_str = np.stack(outs, axis=2)
    np.testing.assert_allclose(y_str, y_off, atol=2e-3, rtol=2e-2)


def test_pallas_scan_bwd_matches_autodiff(rng):
    """The Pallas reverse-scan kernel (chunk-boundary recompute) must match
    autodiff through the XLA reference, including ragged T padding."""
    import jax
    import jax.numpy as jnp
    from nbss_tpu.ops.ssm import (_pallas_scan_bwd, _selective_scan_xla,
                                  selective_scan_pallas)

    B, T, D, N = 3, 13, 8, 4
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, T, D)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (D, N)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Dp = jnp.asarray(rng.standard_normal(D), jnp.float32)
    gy = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)

    y, hb = selective_scan_pallas(x, dt, A, Bm, Cm, Dp, t_chunk=4,
                                  return_boundaries=True)
    gx, gdt, gA, gB, gC = _pallas_scan_bwd(x, dt, A, Bm, Cm, hb, gy, t_chunk=4)
    gx = gx + gy * Dp
    gD = jnp.einsum("btd,btd->d", gy, x)

    _, vjp = jax.vjp(_selective_scan_xla, x, dt, A, Bm, Cm, Dp)
    rx, rdt, rA, rB, rC, rD = vjp(gy)
    for name, a, b in zip("x dt A B C D".split(),
                          (gx, gdt, gA, gB, gC, gD), (rx, rdt, rA, rB, rC, rD)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3, err_msg=name)


def test_scan_m_tiled(rng):
    """Forward with a forced multi-M-tile 2-D grid matches the XLA reference
    (state reset per tile)."""
    import jax.numpy as jnp
    from nbss_tpu.ops.ssm import _selective_scan_xla, selective_scan_pallas

    B, T, D, N = 20, 9, 8, 4  # Bp=24 -> 3 tiles of 8 with cap=8
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, T, D)), jnp.float32)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (D, N)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Cm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.float32)
    Dp = jnp.asarray(rng.standard_normal(D), jnp.float32)

    y_ref = _selective_scan_xla(x, dt, A, Bm, Cm, Dp)
    y = selective_scan_pallas(x, dt, A, Bm, Cm, Dp, t_chunk=4, cap=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-3,
                               rtol=2e-2)


def test_scan_vmem_cap_models_fp32_dt(rng):
    """Regression: the VMEM row cap must account each operand at its OWN
    itemsize. ``dt`` is the fp32 softplus island even in bf16-mixed runs
    (mamba.py), and modeling it at x's 2 bytes let the inference path
    (return_boundaries=False, the largest cap) pick a single 1032-row tile
    for the OnlineSpatialNet val shape [B*F=1032, T=251, D=192, N=16] whose
    real footprint (82.4 MiB) blew the ~70 MiB scoped-vmem limit on chip
    (round-4 moving-speaker fit, first val step)."""
    from nbss_tpu.ops.ssm import _fwd_vmem_cap_rows, _m_tiling

    # the failing shape: tc=8, D=192, N=16, bf16 x/B/C, fp32 dt
    cap = _fwd_vmem_cap_rows(8, 192, 16, 2, 4, 2, 2, boundaries=False)
    # conservative real-footprint model measured from the chip failure:
    # ~83.7 KiB per row at this shape; the scoped limit was ~70 MiB
    assert cap * 83_687 < 70 * 1024 * 1024, cap
    # and the resulting tiling must split B*F=1032 into >= 2 M tiles
    bm, n_mt, _ = _m_tiling(1032, cap=min(1056, cap))
    assert n_mt >= 2 and bm * 83_687 < 64 * 1024 * 1024, (bm, n_mt)
    # mixed-precision cap can never exceed the all-bf16 cap
    assert cap <= _fwd_vmem_cap_rows(8, 192, 16, 2, 2, 2, 2, boundaries=False)
    # and the boundary-writing training path is stricter still
    assert _fwd_vmem_cap_rows(8, 192, 16, 2, 4, 2, 2, True) <= cap
    # a wider C operand must shrink the cap (ADVICE round 4: B and C are
    # accounted at separate itemsizes, not at B's alone)
    assert (_fwd_vmem_cap_rows(8, 192, 16, 2, 4, 2, 4, boundaries=False)
            <= cap)


def test_scan_bf16_inputs(rng):
    """bf16 activations (the training dtype) through the Pallas kernel track
    the fp32 XLA reference within bf16 tolerance."""
    import jax.numpy as jnp
    from nbss_tpu.ops.ssm import _selective_scan_xla, selective_scan_pallas

    B, T, D, N = 3, 13, 8, 4
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
    dt = jnp.asarray(rng.uniform(0.001, 0.1, (B, T, D)), jnp.bfloat16)
    A = -jnp.asarray(rng.uniform(0.5, 2.0, (D, N)), jnp.float32)
    Bm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.bfloat16)
    Cm = jnp.asarray(rng.standard_normal((B, T, N)), jnp.bfloat16)
    Dp = jnp.asarray(rng.standard_normal(D), jnp.float32)

    y_ref = _selective_scan_xla(x, dt, A, Bm, Cm, Dp)
    y = selective_scan_pallas(x, dt, A, Bm, Cm, Dp, t_chunk=4)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_module_forward_streaming_matches_forward(rng):
    """TrainModule.forward_streaming (lax.scan of streaming_step behind the
    online STFT/norm front-end) == TrainModule.forward on the full pipeline
    — the deployment-parity check of scripts/eval_streaming_ckpt.py."""
    from nbss_tpu.io import STFT, Loss, Norm
    from nbss_tpu.train.module import TrainModule

    model = OnlineSpatialNet(attention="mamba(8,4)", decay=(4, 5, 9, 10),
                             chunkwise_recurrent=False, rope=False,
                             dim_input=4, dim_output=4, num_layers=2,
                             dim_hidden=32, dim_ffn=64, num_heads=4,
                             kernel_size=(5, 3), conv_groups=(8, 8),
                             norms=("LN", "LN", "GN", "LN", "LN", "LN"),
                             dim_squeeze=4, num_freqs=9, full_share=0)
    module = TrainModule(
        arch=model, channels=(0, 1), ref_channel=0,
        stft=STFT(n_fft=16, n_hop=8),
        norm=Norm(mode="utterance", online=True),
        loss=Loss(name="neg_snr", pit=True))
    x = jnp.asarray(rng.standard_normal((2, 2, 400)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 9, 10, 4), jnp.float32))
    y_off, _ = module.forward(params, x)
    y_str, _ = module.forward_streaming(params, x)
    np.testing.assert_allclose(np.asarray(y_str), np.asarray(y_off),
                               atol=2e-3, rtol=2e-2)


def test_remat_matches_unremat(rng):
    """remat=True (per-layer jax.checkpoint, required to fit the mamba
    train step in HBM) must not change outputs or gradients, and the
    streaming path must stay reachable through the wrapped layers."""
    import jax.flatten_util

    from nbss_tpu.models import OnlineSpatialNet

    kw = dict(dim_input=4, dim_output=4, num_layers=2, dim_hidden=16,
              dim_ffn=32, num_heads=2, dim_squeeze=4, num_freqs=9,
              attention="mamba(4,4)")
    m1 = OnlineSpatialNet(**kw, remat=True)
    m0 = OnlineSpatialNet(**kw, remat=False)
    md = OnlineSpatialNet(**kw, remat=True, remat_policy="dots")
    x = jnp.asarray(rng.standard_normal((2, 9, 20, 4)), jnp.float32)
    params = m1.init(jax.random.PRNGKey(0), x)

    np.testing.assert_allclose(np.asarray(m1.apply(params, x)),
                               np.asarray(m0.apply(params, x)), atol=1e-6)
    g1 = jax.grad(lambda p: jnp.mean(m1.apply(p, x) ** 2))(params)
    g0 = jax.grad(lambda p: jnp.mean(m0.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(
        np.asarray(jax.flatten_util.ravel_pytree(g1)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(g0)[0]), atol=1e-6)
    # the dots policy (default in configs/onlineSpatialNet.yaml) changes
    # only WHAT is saved for the backward, never the values
    gd = jax.grad(lambda p: jnp.mean(md.apply(p, x) ** 2))(params)
    np.testing.assert_allclose(
        np.asarray(jax.flatten_util.ravel_pytree(gd)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(g0)[0]), atol=1e-6)

    st = m1.apply(params, 2, method=OnlineSpatialNet.init_streaming_state)

    def step(c, xt):
        y, c2 = m1.apply(params, xt, c, method=OnlineSpatialNet.streaming_step)
        return c2, y

    _, ys = jax.lax.scan(step, st, jnp.moveaxis(x, 2, 0))
    dev = float(jnp.max(jnp.abs(jnp.moveaxis(ys, 0, 2) - m1.apply(params, x))))
    assert dev < 1e-5, dev
