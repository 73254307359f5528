"""Mamba (selective SSM) block, TPU-native.

Replaces the external mamba-ssm CUDA dependency used by the reference's
online model (OnlineSpatialNet.py:115-126, config ``mamba(16,4)``). The
parameterization follows Mamba v1 (in_proj -> [x, z]; causal depthwise conv;
x_proj -> [dt, B, C]; dt_proj + softplus; A = -exp(A_log); y = C.h + D*x;
gate by silu(z); out_proj), with mamba-ssm's initialization (dt bias set so
softplus(bias) lands in [dt_min, dt_max]; A_log = log(1..d_state)), so
trained reference checkpoints can be transplanted name-for-name.

Offline/causal forward uses the checkpointed scan in nbss_tpu.ops.ssm;
``init_state``/``streaming_step`` provide O(1)-state frame-by-frame inference
with a conv ring buffer (the role InferenceParams plays in mamba-ssm).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from nbss_tpu.ops.ssm import selective_scan, selective_scan_step

Dtype = Any


class MambaBlock(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None  # default ceil(d_model / 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    use_bias: bool = False  # in_proj / out_proj bias
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def d_inner(self) -> int:
        return self.expand * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank if self.dt_rank is not None else math.ceil(self.d_model / 16)

    def _dt_bias_init(self, key, shape, dtype=jnp.float32):
        # softplus(bias) uniform in [dt_min, dt_max] on a log scale
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(self.dt_max) - math.log(self.dt_min)) + math.log(self.dt_min))
        dt = jnp.maximum(dt, self.dt_init_floor)
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)  # inverse softplus

    def setup(self):
        dt, pdt = self.dtype, self.param_dtype
        di, N, R = self.d_inner, self.d_state, self.rank
        self.in_proj = nn.Dense(2 * di, use_bias=self.use_bias, dtype=dt,
                                param_dtype=pdt, name="in_proj")
        self.conv_kernel = self.param(
            "conv1d_weight",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.d_conv, 1, di), pdt)  # depthwise [k, 1, D]
        if self.conv_bias:
            self.conv_bias_p = self.param("conv1d_bias", nn.initializers.zeros, (di,), pdt)
        self.x_proj = nn.Dense(R + 2 * N, use_bias=False, dtype=dt,
                               param_dtype=pdt, name="x_proj")
        self.dt_proj = nn.Dense(di, use_bias=True, dtype=dt, param_dtype=pdt,
                                kernel_init=nn.initializers.variance_scaling(
                                    1.0, "fan_in", "uniform"),
                                bias_init=self._dt_bias_init, name="dt_proj")
        self.A_log = self.param(
            "A_log",
            lambda key, shape, dtype: jnp.broadcast_to(
                jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32)), shape).astype(dtype),
            (di, N), jnp.float32)
        self.D = self.param("D", nn.initializers.ones, (di,), jnp.float32)
        self.out_proj = nn.Dense(self.d_model, use_bias=self.use_bias, dtype=dt,
                                 param_dtype=pdt, name="out_proj")

    def _conv(self, x):
        """Causal depthwise conv over T: [B, T, D] -> [B, T, D]."""
        di = self.d_inner
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(self.conv_kernel, x.dtype),
            window_strides=(1,), padding=[(self.d_conv - 1, 0)],
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=di)
        if self.conv_bias:
            y = y + jnp.asarray(self.conv_bias_p, x.dtype)
        return y

    def _ssm_inputs(self, x):
        R, N = self.rank, self.d_state
        proj = self.x_proj(x)
        dt, Bm, Cm = jnp.split(proj, [R, R + N], axis=-1)
        dt = jax.nn.softplus(self.dt_proj(dt).astype(jnp.float32))
        return dt, Bm, Cm

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: [B, T, d_model] -> [B, T, d_model] (causal)."""
        xz = self.in_proj(x)
        xi, z = jnp.split(xz, 2, axis=-1)
        xi = jax.nn.silu(self._conv(xi))
        dt, Bm, Cm = self._ssm_inputs(xi)
        A = -jnp.exp(self.A_log)
        y = selective_scan(xi, dt, A, Bm, Cm, self.D)
        y = y * jax.nn.silu(z)
        return self.out_proj(y)

    # ---------------------------------------------------------- streaming
    def init_state(self, batch: int, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        return {
            "conv": jnp.zeros((batch, self.d_conv - 1, self.d_inner), dtype),
            "ssm": jnp.zeros((batch, self.d_inner, self.d_state), jnp.float32),
        }

    def streaming_step(self, x_t: jnp.ndarray, state: Dict[str, jnp.ndarray]):
        """x_t: [B, 1, d_model] -> (y_t [B, 1, d_model], state')."""
        xz = self.in_proj(x_t)
        xi, z = jnp.split(xz, 2, axis=-1)  # [B,1,D]
        window = jnp.concatenate([state["conv"], xi], axis=1)  # [B, k, D]
        w = jnp.asarray(self.conv_kernel, xi.dtype)[:, 0, :]  # [k, D]
        conv_out = jnp.sum(window * w[None], axis=1, keepdims=True)
        if self.conv_bias:
            conv_out = conv_out + jnp.asarray(self.conv_bias_p, xi.dtype)
        xi = jax.nn.silu(conv_out)  # [B,1,D]
        dt, Bm, Cm = self._ssm_inputs(xi)
        A = -jnp.exp(self.A_log)
        h, y = selective_scan_step(
            state["ssm"], xi[:, 0], dt[:, 0], A, Bm[:, 0], Cm[:, 0], self.D)
        y = y[:, None, :] * jax.nn.silu(z)
        new_state = {"conv": window[:, 1:], "ssm": h}
        return self.out_proj(y), new_state
