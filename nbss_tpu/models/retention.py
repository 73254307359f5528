"""Multi-scale retention (RetNet) for the online SpatialNet time axis.

TPU-native counterpart of /root/reference/models/arch/base/retention.py
(itself derived from Microsoft's RetNet). Three numerically-matched compute
paths:

- ``parallel``: full T x T decay-masked retention (training, bounded T).
- ``chunkwise``: chunk-local attention + cross-chunk recurrent KV state with
  the reference's scale stabilization (retention.py:194-253). The per-chunk
  Python loop is a ``lax.scan`` over chunks here.
- ``recurrent``: O(1)-state per-frame path (retention.py:174-192) exposed
  both as a single ``step`` (for real streaming) and as a full-sequence
  ``lax.scan`` (for causality tests / long-form eval).

Decay masks and xPos tables are static-shape constants built with numpy on
the host and folded into the XLA program.

Quirks replicated on purpose:
- ``share_qk=True`` skips the 1/sqrt(key_dim) key scaling
  (retention.py:264-269).
- scale clamps use detached (stop-gradient) absolute sums.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def resolve_decays(decay: Union[int, bool, Sequence[Union[int, float]], None],
                   num_heads: int) -> List[float]:
    """Per-head exponential decays (retention.py:38-58)."""
    if decay is False:
        return [1.0] * num_heads
    if isinstance(decay, (list, tuple)):
        if isinstance(decay[0], float):
            assert decay[0] <= 1, decay
            return list(decay)
        assert isinstance(decay[0], int) and decay[0] > 1, decay
        return [1 - 2.0 ** (-d) for d in decay]
    if decay is None or decay is True:
        decay = 5
    return [float(1 - 2.0 ** (-decay - h)) for h in range(num_heads)]


@dataclass(frozen=True)
class RetNetRelPos:
    """Static builder for xPos tables and decay masks."""

    embed_dim: int
    num_heads: int
    recurrent_chunk_size: int = 64
    decay: Union[int, bool, Tuple, None] = None

    @property
    def decays(self) -> np.ndarray:
        d = self.decay if not isinstance(self.decay, tuple) else list(self.decay)
        return np.asarray(resolve_decays(d, self.num_heads), np.float64)

    @property
    def angle(self) -> np.ndarray:
        kd = self.embed_dim // self.num_heads
        a = 1.0 / (10000 ** np.linspace(0, 1, kd // 2))
        return np.repeat(a, 2)  # [kd]

    def _sincos(self, slen: int) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.arange(slen)[:, None] * self.angle[None, :]
        return np.sin(idx).astype(np.float32), np.cos(idx).astype(np.float32)

    def parallel(self, slen: int):
        """((sin, cos), mask [nh, T, T]) — retention.py:86-95."""
        sin, cos = self._sincos(slen)
        i = np.arange(slen)
        rel = i[:, None] - i[None, :]
        log_d = np.log(self.decays)  # [nh]
        with np.errstate(invalid="ignore"):
            mask = np.where(rel >= 0, np.exp(rel[None] * log_d[:, None, None]), 0.0)
        mask = np.nan_to_num(mask)
        mask = mask / np.sqrt(mask.sum(-1, keepdims=True))
        return (jnp.asarray(sin), jnp.asarray(cos)), jnp.asarray(mask, jnp.float32)

    def chunkwise(self, slen: int):
        """((sin, cos), (inner_mask, cross_decay, query_inner_decay,
        value_inner_decay)) — retention.py:65-85."""
        sin, cos = self._sincos(slen)
        C = self.recurrent_chunk_size
        i = np.arange(C)
        rel = i[:, None] - i[None, :]
        log_d = np.log(self.decays)
        with np.errstate(invalid="ignore"):
            mask = np.where(rel >= 0, np.exp(rel[None] * log_d[:, None, None]), 0.0)
        mask = np.nan_to_num(mask)  # [nh, C, C]
        last_row_sum = mask[:, -1].sum(-1)  # [nh]
        value_inner_decay = (mask[:, -1] / last_row_sum[:, None])[:, :, None]  # [nh, C, 1]
        scale = np.sqrt(mask.sum(-1, keepdims=True))  # [nh, C, 1]
        inner_mask = mask / scale
        cross_decay = np.exp(log_d * C)[:, None, None]  # [nh, 1, 1]
        query_inner_decay = np.exp(log_d[:, None] * (i + 1))  # [nh, C]
        query_inner_decay = query_inner_decay[:, :, None] / (scale / last_row_sum[:, None, None])
        return (jnp.asarray(sin), jnp.asarray(cos)), (
            jnp.asarray(inner_mask, jnp.float32),
            jnp.asarray(cross_decay, jnp.float32),
            jnp.asarray(query_inner_decay, jnp.float32),
            jnp.asarray(value_inner_decay, jnp.float32),
        )

    def recurrent(self, t: int):
        """((sin_t, cos_t), decay [nh]) for frame t.

        Unlike retention.py:62-63 (whose 1-element slice of the xPos vector in
        recurrent mode silently breaks the rotation — untested there because
        the __main__ skips the recurrent check when look_ahead > 0), this
        returns the full [kd] rotation at position t so the streaming path is
        exactly equivalent to the parallel path.
        """
        sin, cos = self._sincos(t + 1)
        return (jnp.asarray(sin[-1]), jnp.asarray(cos[-1])), jnp.asarray(self.decays, jnp.float32)

    def recurrent_dynamic(self, t):
        """((sin_t, cos_t), decays) for a TRACED frame index t (jit-friendly
        streaming; `recurrent` needs a static t)."""
        angle = jnp.asarray(self.angle, jnp.float32)
        t = jnp.asarray(t, jnp.float32)
        return ((jnp.sin(angle * t), jnp.cos(angle * t)),
                jnp.asarray(self.decays, jnp.float32))

    def recurrent_seq(self, slen: int):
        """((sin, cos) full tables, decays [nh]) for the scan-based
        full-sequence recurrent path."""
        sin, cos = self._sincos(slen)
        return (jnp.asarray(sin), jnp.asarray(cos)), jnp.asarray(self.decays, jnp.float32)


def rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = x[..., ::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def theta_shift(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    slen = x.shape[-2]
    return x * cos[..., :slen, :] + rotate_every_two(x) * sin[..., :slen, :]


def _rms_norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return y.astype(x.dtype)


def _xavier(gain: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        a = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -a, a)

    return init


class MultiScaleRetention(nn.Module):
    """x [B, T, H] -> [B, T, H]. ``rel_pos`` comes from RetNetRelPos."""

    embed_dim: int
    num_heads: int
    value_factor: int = 2
    look_ahead: int = 0
    share_qk: bool = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @property
    def key_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def head_dim(self) -> int:
        return self.embed_dim * self.value_factor // self.num_heads

    def setup(self):
        H, V = self.embed_dim, self.embed_dim * self.value_factor
        dt, pdt = self.dtype, self.param_dtype
        mk = lambda feat, gain, name: nn.Dense(
            feat, use_bias=False, dtype=dt, param_dtype=pdt,
            kernel_init=_xavier(gain), name=name)
        self.q_proj = mk(H, 2 ** -2.5, "q_proj")
        if not self.share_qk:
            self.k_proj = mk(H, 2 ** -2.5, "k_proj")
        self.v_proj = mk(V, 2 ** -2.5, "v_proj")
        self.g_proj = mk(V, 2 ** -2.5, "g_proj")
        self.out_proj = mk(H, 2 ** -1, "out_proj")

    def _qkv(self, x, sin, cos, rope: bool):
        B, T, _ = x.shape
        nh, kd, hd = self.num_heads, self.key_dim, self.head_dim
        q = self.q_proj(x).reshape(B, T, nh, kd).transpose(0, 2, 1, 3)
        if self.share_qk:
            k = q  # NOTE: no 1/sqrt(kd) scaling in the share_qk path
        else:
            k = (self.k_proj(x) * (kd ** -0.5)).reshape(B, T, nh, kd).transpose(0, 2, 1, 3)
        v = self.v_proj(x)
        qr = theta_shift(q, sin, cos) if rope else q
        kr = theta_shift(k, sin, cos) if rope else k
        return qr, kr, v

    def _finish(self, output, g, B, T):
        # output: [B, T, nh, hd]
        out = _rms_norm(output).reshape(B, T, self.num_heads * self.head_dim)
        out = jax.nn.silu(g) * out
        return self.out_proj(out)

    # ------------------------------------------------------------- parallel
    def _parallel(self, qr, kr, v, mask):
        B, T = v.shape[0], v.shape[1]
        nh, hd = self.num_heads, self.head_dim
        vr = v.reshape(B, T, nh, hd).transpose(0, 2, 1, 3)
        qk = jnp.einsum("bhqd,bhkd->bhqk", qr, kr, preferred_element_type=jnp.float32)
        qk = qk * mask
        denom = jnp.clip(
            jnp.sum(jnp.abs(jax.lax.stop_gradient(qk)), axis=-1, keepdims=True), 1.0, 5e4)
        qk = qk / denom
        out = jnp.einsum("bhqk,bhkd->bqhd", qk.astype(vr.dtype), vr,
                         preferred_element_type=jnp.float32).astype(vr.dtype)
        return out

    # ------------------------------------------------------------ chunkwise
    def _chunkwise(self, qr, kr, v, inner):
        mask, cross_decay, query_inner_decay, value_inner_decay = inner
        B, T0 = v.shape[0], v.shape[1]
        nh, kd, hd = self.num_heads, self.key_dim, self.head_dim
        C = mask.shape[1]
        pad = (-T0) % C
        if pad:
            qr = jnp.pad(qr, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kr = jnp.pad(kr, ((0, 0), (0, 0), (0, pad), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        T = T0 + pad
        N = T // C
        qr = qr.reshape(B, nh, N, C, kd).transpose(0, 2, 1, 3, 4)  # [B,N,nh,C,kd]
        kr = kr.reshape(B, nh, N, C, kd).transpose(0, 2, 1, 3, 4)
        v = v.reshape(B, N, C, nh, hd).transpose(0, 1, 3, 2, 4)  # [B,N,nh,C,hd]

        qk = jnp.einsum("bnhqd,bnhkd->bnhqk", qr, kr, preferred_element_type=jnp.float32)
        qk = qk * mask
        inner_scale = jnp.clip(
            jnp.sum(jnp.abs(jax.lax.stop_gradient(qk)), -1, keepdims=True), 1.0, None)
        qk = qk / inner_scale
        inner_output = jnp.einsum("bnhqk,bnhkd->bnhqd", qk.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32).astype(v.dtype)

        # per-chunk reduced KV, then cross-chunk recurrence (lax.scan)
        kv = jnp.einsum("bnhkd,bnhke->bnhde", kr, v * value_inner_decay.astype(v.dtype),
                        preferred_element_type=jnp.float32)  # [B,N,nh,kd,hd]

        def scan_fn(carry, kv_i):
            kv_state, kv_scale = carry
            out = (kv_state / kv_scale, kv_scale)
            kv_state = kv_state * cross_decay[None] + kv_i  # [1,nh,1,1] bcast
            abs_state = jnp.abs(jax.lax.stop_gradient(kv_state))
            kv_scale = jnp.clip(
                jnp.max(jnp.sum(abs_state, axis=-2, keepdims=True), axis=-1, keepdims=True),
                1.0, None)
            return (kv_state, kv_scale), out

        kv_t = jnp.moveaxis(kv, 1, 0)  # [N,B,nh,kd,hd]
        init = (jnp.zeros_like(kv_t[0]), jnp.ones((B, nh, 1, 1), kv.dtype))
        _, (kv_rec, cross_scale) = jax.lax.scan(scan_fn, init, kv_t)
        kv_rec = jnp.moveaxis(kv_rec, 0, 1)  # [B,N,nh,kd,hd]
        cross_scale = jnp.moveaxis(cross_scale, 0, 1)  # [B,N,nh,1,1]
        all_scale = jnp.maximum(inner_scale, cross_scale)
        align_inner = all_scale / inner_scale
        align_cross = all_scale / cross_scale

        cross_output = jnp.einsum(
            "bnhqd,bnhde->bnhqe", (qr * query_inner_decay.astype(qr.dtype)),
            kv_rec.astype(qr.dtype), preferred_element_type=jnp.float32)
        output = inner_output / align_inner.astype(v.dtype) \
            + cross_output.astype(v.dtype) / align_cross.astype(v.dtype)
        output = output.transpose(0, 1, 3, 2, 4).reshape(B, T, nh, hd)
        return output[:, :T0]

    # ------------------------------------------------------------ recurrent
    @staticmethod
    def init_state(batch: int, num_heads: int, key_dim: int, head_dim: int,
                   dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
        return {
            "prev_key_value": jnp.zeros((batch, num_heads, key_dim, head_dim), dtype),
            "scale": jnp.zeros((num_heads,), dtype),
            "initialized": jnp.zeros((), jnp.bool_),
        }

    def _recurrent_step(self, qr, kr, v, decay, state):
        """One frame: qr/kr [B, nh, 1, kd], v [B, 1, V] (retention.py:174-192)."""
        B = v.shape[0]
        nh, kd, hd = self.num_heads, self.key_dim, self.head_dim
        vv = v.reshape(B, nh, hd)[:, :, None, :]  # [B,nh,1,hd]
        kv = kr.reshape(B, nh, kd, 1) * vv  # [B,nh,kd,hd]
        prev_scale = state["scale"]
        scale = jnp.where(state["initialized"], prev_scale * decay + 1.0,
                          jnp.ones_like(decay))
        mix = jnp.where(
            state["initialized"],
            (jnp.sqrt(prev_scale) * decay / jnp.sqrt(scale)),
            jnp.zeros_like(decay),
        )  # [nh]
        kv = state["prev_key_value"] * mix[:, None, None] + kv / jnp.sqrt(scale)[:, None, None]
        out = jnp.sum(qr.reshape(B, nh, kd, 1) * kv, axis=2)  # [B,nh,hd]
        new_state = {"prev_key_value": kv, "scale": scale,
                     "initialized": jnp.ones((), jnp.bool_)}
        return out.reshape(B, 1, nh, hd), new_state

    def _recurrent_seq(self, qr, kr, v, decay):
        """Full sequence through the O(1)-state path via lax.scan."""
        B, nh, T, kd = qr.shape
        hd = self.head_dim
        state = MultiScaleRetention.init_state(B, nh, kd, hd, v.dtype)

        def step(state, inp):
            q_t, k_t, v_t = inp  # [B,nh,kd], [B,nh,kd], [B,V]
            out, state = self._recurrent_step(
                q_t[:, :, None, :], k_t[:, :, None, :], v_t[:, None, :], decay, state)
            return state, out[:, 0]

        qs = jnp.moveaxis(qr, 2, 0)  # [T,B,nh,kd]
        ks = jnp.moveaxis(kr, 2, 0)
        vs = jnp.moveaxis(v, 1, 0)  # [T,B,V]
        _, outs = jax.lax.scan(step, state, (qs, ks, vs))
        return jnp.moveaxis(outs, 0, 1)  # [B,T,nh,hd]

    # -------------------------------------------------------------- forward
    def __call__(self, x, rel_pos, chunkwise_recurrent: bool = False,
                 recurrent: bool = False, rope: bool = True):
        B, T, _ = x.shape
        (sin, cos), inner_mask = rel_pos
        g = self.g_proj(x)
        qr, kr, v = self._qkv(x, sin, cos, rope)

        la = self.look_ahead
        if la > 0:
            kr = jnp.pad(kr, ((0, 0), (0, 0), (0, la), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, la), (0, 0)))
            qr = jnp.pad(qr, ((0, 0), (0, 0), (la, 0), (0, 0)))

        if recurrent:
            assert la == 0
            decay = jnp.asarray(inner_mask)  # [nh] decays for recurrent mode
            output = self._recurrent_seq(qr, kr, v, decay)
        elif chunkwise_recurrent:
            output = self._chunkwise(qr, kr, v, inner_mask)
        else:
            output = self._parallel(qr, kr, v, inner_mask)

        if la > 0:
            output = output[:, :-la]
        return self._finish(output, g, B, T)

    def streaming_step(self, x_t, rel_pos_t, state, rope: bool = True):
        """One streaming frame. x_t [B, 1, H]; rel_pos_t from
        RetNetRelPos.recurrent(t)."""
        (sin, cos), decay = rel_pos_t
        g = self.g_proj(x_t)
        qr, kr, v = self._qkv(x_t, sin[None, :], cos[None, :], rope)
        out, state = self._recurrent_step(qr, kr, v, decay, state)
        return self._finish(out, g, x_t.shape[0], 1), state
