"""Online SpatialNet: streaming long-term enhancement (SPL 2024).

TPU-native counterpart of /root/reference/models/arch/OnlineSpatialNet.py.
The cross-band block matches offline SpatialNet (non-causal across F only);
the narrow-band time path is causal and selectable:

- ``mhsa(N)``   local masked causal attention with scope N frames
                (optionally ALiBi-biased, rope='ALiBi')
- ``ret(v,share_qk/not_share_qk)``  multi-scale retention (parallel /
                chunkwise training, O(1)-state recurrence for streaming)
- ``mamba(d_state,d_conv)``  selective SSM, which also replaces the T-ConvFFN
                unless 'not_replace_ffn' is in the attention string

The T-ConvFFN uses causal temporal convs, and its mid GroupNorm normalizes
over (channels-in-group, frequency) at each time step — causal, unlike the
offline variant which pools over time (OnlineSpatialNet.py:213-216).

Streaming is scan-based (no Python frame loops): ``recurrent=True`` routes
retention through its lax.scan recurrence; mamba's scan is already its
streaming recurrence, so offline == streaming there by construction.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nbss_tpu.models.base import (
    Conv1d,
    Dense,
    LinearGroup,
    MultiheadAttention,
    PReLU,
    _norm_stats,
    new_norm,
)
from nbss_tpu.models.mamba import MambaBlock
from nbss_tpu.models.retention import MultiScaleRetention, RetNetRelPos

Dtype = Any


def parse_attention(attention: str):
    """'mhsa(251)' / 'mhsa(inf)' / 'ret(2,share_qk)' / 'mamba(16,4)'
    (reference OnlineSpatialNet.py:110-118, 295-301)."""
    if attention.startswith("ret"):
        parts = attention[4:-1].split(",")
        assert parts[1] in ("share_qk", "not_share_qk"), parts
        return ("ret", {"value_factor": int(parts[0]), "share_qk": parts[1] == "share_qk"})
    if attention.startswith("mamba"):
        inner = attention[attention.index("(") + 1:attention.index(")")]
        d_state, d_conv = (int(v) for v in inner.split(","))
        return ("mamba", {"d_state": d_state, "d_conv": d_conv,
                          "replace_ffn": "not_replace_ffn" not in attention})
    assert attention.startswith("mhsa"), attention
    scope = attention[5:-1]
    return ("mhsa", {"scope": math.inf if scope == "inf" else int(scope)})


def local_causal_mask(slen: int, scope: float) -> np.ndarray:
    """[T, T] additive mask: 0 where 0 <= i-j < scope else -inf
    (OnlineSpatialNet.py:366-384).

    Parity note: the reference passes this mask to torch MultiheadAttention
    together with is_causal=True (OnlineSpatialNet.py:191); on torch >= 2.x
    the SDPA fast path then DISCARDS the mask and applies a plain causal
    one, so the reference effectively trains mhsa(N) with unbounded scope.
    nbss_tpu honours the bounded scope as specified — it is what makes the
    O(1)-memory streaming KV ring buffer (init_streaming_state) exact."""
    i = np.arange(slen)
    rel = i[:, None] - i[None, :]
    return np.where((rel >= 0) & (rel < scope), 0.0, -np.inf).astype(np.float32)


def alibi_mask(slen: int, scope: float, num_heads: int) -> np.ndarray:
    """[nh, T, T] ALiBi-slope mask (OnlineSpatialNet.py:377-382)."""
    i = np.arange(slen)
    rel = (i[:, None] - i[None, :]).astype(np.float32)
    m = 2.0 ** (-8.0 / np.arange(1, num_heads + 1))  # [nh]
    base = np.where((rel >= 0) & (rel < scope), -np.abs(rel), -np.inf)
    return (m[:, None, None] * base[None]).astype(np.float32)


class CrossGroupNorm(nn.Module):
    """GroupNorm over (channels-in-group, frequency) at each time step —
    the online T-ConvFFN mid norm (OnlineSpatialNet.py:213-216).
    Input [B, F, T, H]."""

    num_groups: int
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, F, T, H = x.shape
        G = self.num_groups
        xg = x.reshape(B, F, T, G, H // G)
        # stats over (F, H//G) per (B, T, G) — after moveaxis the layout is
        # [B, T, G, F, h], so reduce the trailing (F, h) axes
        y = _norm_stats(jnp.moveaxis(xg, 1, 3), [-2, -1], self.eps)  # [B,T,G,F,h]
        y = jnp.moveaxis(y, 3, 1).reshape(B, F, T, H)
        w = self.param("scale", nn.initializers.ones, (H,), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (H,), self.param_dtype)
        return y * w.astype(x.dtype) + b.astype(x.dtype)


class OnlineSpatialNetLayer(nn.Module):
    dim_hidden: int
    dim_ffn: int
    dim_squeeze: int
    num_freqs: int
    num_heads: int
    attention: str = "mhsa(251)"
    dropout: Tuple[float, float, float] = (0, 0, 0)
    kernel_size: Tuple[int, int] = (5, 3)
    conv_groups: Tuple[int, int] = (8, 8)
    norms: Sequence[str] = ("LN", "LN", "GN", "LN", "LN", "LN")
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    def setup(self):
        H, FF = self.dim_hidden, self.dim_ffn
        f_groups, t_groups = self.conv_groups
        f_k, t_k = self.kernel_size
        kind, cfg = parse_attention(self.attention)
        self._kind, self._cfg = kind, cfg

        # cross-band block (identical to offline SpatialNet)
        self.fconv1_norm = new_norm(self.norms[3], num_groups=f_groups)
        self.fconv1_conv = Conv1d(H, f_k, groups=f_groups, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.fconv1_act = PReLU(H, param_dtype=self.param_dtype)
        self.norm_full = new_norm(self.norms[5], num_groups=f_groups)
        self.squeeze = Dense(self.dim_squeeze, dtype=self.dtype, param_dtype=self.param_dtype)
        self.unsqueeze = Dense(H, dtype=self.dtype, param_dtype=self.param_dtype)
        self.fconv2_norm = new_norm(self.norms[4], num_groups=f_groups)
        self.fconv2_conv = Conv1d(H, f_k, groups=f_groups, dtype=self.dtype,
                                  param_dtype=self.param_dtype)
        self.fconv2_act = PReLU(H, param_dtype=self.param_dtype)

        # narrow-band time module
        self.norm_mhsa = new_norm(self.norms[0], num_groups=t_groups)
        if kind == "ret":
            self.mhsa = MultiScaleRetention(
                embed_dim=H, num_heads=self.num_heads,
                value_factor=cfg["value_factor"], share_qk=cfg["share_qk"],
                dtype=self.dtype, param_dtype=self.param_dtype)
        elif kind == "mamba":
            self.mhsa = MambaBlock(d_model=H, d_state=cfg["d_state"],
                                   d_conv=cfg["d_conv"], dtype=self.dtype,
                                   param_dtype=self.param_dtype)
        else:
            self.mhsa = MultiheadAttention(self.num_heads, dtype=self.dtype,
                                           param_dtype=self.param_dtype)
        self.dropout_mhsa = nn.Dropout(self.dropout[0])

        # T-ConvFFN (causal) or a second mamba replacing it
        if kind == "mamba" and cfg["replace_ffn"]:
            self.norm_tconvffn = new_norm(self.norms[1], num_groups=t_groups)
            self.tconvffn_mamba = MambaBlock(d_model=H, d_state=cfg["d_state"],
                                             d_conv=cfg["d_conv"], dtype=self.dtype,
                                             param_dtype=self.param_dtype)
        else:
            self.tconvffn_norm = new_norm(self.norms[1], num_groups=t_groups)
            self.tconvffn_up = Dense(FF, dtype=self.dtype, param_dtype=self.param_dtype)
            self.tconvffn_conv1 = Conv1d(FF, t_k, groups=t_groups, padding="causal",
                                         dtype=self.dtype, param_dtype=self.param_dtype)
            self.tconvffn_conv2 = Conv1d(FF, t_k, groups=t_groups, padding="causal",
                                         dtype=self.dtype, param_dtype=self.param_dtype)
            self.tconvffn_midnorm = CrossGroupNorm(self.conv_groups[1],
                                                   param_dtype=self.param_dtype)
            self.tconvffn_conv3 = Conv1d(FF, t_k, groups=t_groups, padding="causal",
                                         dtype=self.dtype, param_dtype=self.param_dtype)
            self.tconvffn_down = Dense(H, dtype=self.dtype, param_dtype=self.param_dtype)
        self.dropout_tconvffn = nn.Dropout(self.dropout[1])
        self.dropout_full = nn.Dropout(self.dropout[2])

    def __call__(self, x, full: nn.Module, rel_pos, deterministic: bool = True,
                 chunkwise_recurrent: bool = True, rope: Union[bool, str] = False,
                 recurrent: bool = False):
        # cross-band block in [B, T, F, H] with one transpose in/out
        xt = jnp.swapaxes(x, 1, 2)
        xt = xt + self._fconv(self.fconv1_norm, self.fconv1_conv, self.fconv1_act, xt)
        xt = xt + self._full(xt, full, deterministic)
        xt = xt + self._fconv(self.fconv2_norm, self.fconv2_conv, self.fconv2_act, xt)
        x = jnp.swapaxes(xt, 1, 2)
        x = x + self.dropout_mhsa(
            self._time_module(x, rel_pos, chunkwise_recurrent, rope, recurrent),
            deterministic=deterministic)
        x = x + self.dropout_tconvffn(self._ffn(x), deterministic=deterministic)
        return x

    def _time_module(self, x, rel_pos, chunkwise_recurrent, rope, recurrent):
        B, F, T, H = x.shape
        y = self.norm_mhsa(x)
        if self._kind == "mhsa":
            return self.mhsa(y, attn_mask=rel_pos)
        y = y.reshape(B * F, T, H)
        if self._kind == "ret":
            y = self.mhsa(y, rel_pos, chunkwise_recurrent=chunkwise_recurrent,
                          recurrent=recurrent, rope=bool(rope) and rope != "ALiBi")
        else:  # mamba (scan == streaming recurrence)
            y = self.mhsa(y)
        return y.reshape(B, F, T, H)

    def _ffn(self, x):
        B, F, T, H = x.shape
        if self._kind == "mamba" and self._cfg["replace_ffn"]:
            y = self.norm_tconvffn(x).reshape(B * F, T, H)
            return self.tconvffn_mamba(y).reshape(B, F, T, H)
        y = self.tconvffn_norm(x)
        y = nn.silu(self.tconvffn_up(y))
        y = nn.silu(self.tconvffn_conv1(y))
        y = self.tconvffn_conv2(y)
        y = nn.silu(self.tconvffn_midnorm(y))
        y = nn.silu(self.tconvffn_conv3(y))
        return self.tconvffn_down(y)

    # ------------------------------------------------------------ streaming
    def init_streaming_state(self, B: int, F: int, dtype=jnp.float32):
        """Per-layer streaming state: time-module recurrence + T-ConvFFN
        causal-conv ring buffers (the reference's id(self)-keyed conv state,
        OnlineSpatialNet.py:43-54, made explicit and jit-friendly)."""
        kind, cfg = parse_attention(self.attention)
        H, FF = self.dim_hidden, self.dim_ffn
        t_k = self.kernel_size[1]
        st = {}
        if kind == "ret":
            nh = self.num_heads
            st["time"] = MultiScaleRetention.init_state(
                B * F, nh, H // nh, H * cfg["value_factor"] // nh, dtype)
        elif kind == "mamba":
            d_inner = 2 * H
            st["time"] = {
                "conv": jnp.zeros((B * F, cfg["d_conv"] - 1, d_inner), dtype),
                "ssm": jnp.zeros((B * F, d_inner, cfg["d_state"]), jnp.float32),
            }
        else:  # mhsa(N): KV ring buffer over the local attention scope
            scope = cfg["scope"]
            if not math.isfinite(scope):
                raise NotImplementedError(
                    "streaming mhsa requires a finite attention scope; "
                    "use mhsa(N) (reference OnlineSpatialNet.py:196-200 "
                    "re-runs masked attention per frame for the same effect)")
            scope = int(scope)
            st["time"] = {
                "k": jnp.zeros((B * F, scope - 1, H), dtype),
                "v": jnp.zeros((B * F, scope - 1, H), dtype),
            }
        if kind == "mamba" and cfg["replace_ffn"]:
            d_inner = 2 * H
            st["ffn"] = {
                "conv": jnp.zeros((B * F, cfg["d_conv"] - 1, d_inner), dtype),
                "ssm": jnp.zeros((B * F, d_inner, cfg["d_state"]), jnp.float32),
            }
        else:
            for name in ("ffn_conv1", "ffn_conv2", "ffn_conv3"):
                st[name] = jnp.zeros((B, F, t_k - 1, FF), dtype)
        return st

    def streaming_step(self, x_t, full: nn.Module, state, rel_pos_t,
                       rope: Union[bool, str] = False):
        """One frame: x_t [B, F, H] -> (y_t [B, F, H], state').

        For ``mhsa(N)`` time modules ``rel_pos_t`` is the (traced) frame
        counter, used to mask not-yet-seen ring-buffer slots."""
        B, F, H = x_t.shape
        xt = x_t[:, None]  # [B, 1, F, H]; cross-band ops are frame-local
        xt = xt + self._fconv(self.fconv1_norm, self.fconv1_conv, self.fconv1_act, xt)
        xt = xt + self._full(xt, full, True)
        xt = xt + self._fconv(self.fconv2_norm, self.fconv2_conv, self.fconv2_act, xt)
        x = xt[:, 0]  # [B, F, H]

        y = self.norm_mhsa(x).reshape(B * F, 1, H)
        if self._kind == "ret":
            y, state["time"] = self.mhsa.streaming_step(
                y, rel_pos_t, state["time"], rope=bool(rope) and rope != "ALiBi")
        elif self._kind == "mhsa":
            y, state["time"] = self._mhsa_streaming_step(
                y[:, 0], state["time"], rel_pos_t, rope)
            y = y[:, None]
        else:  # mamba
            y, state["time"] = self.mhsa.streaming_step(y, state["time"])
        x = x + y.reshape(B, F, H)

        if self._kind == "mamba" and self._cfg["replace_ffn"]:
            y = self.norm_tconvffn(x).reshape(B * F, 1, H)
            y, state["ffn"] = self.tconvffn_mamba.streaming_step(y, state["ffn"])
            x = x + y.reshape(B, F, H)
        else:
            y = self.tconvffn_norm(x)
            y = nn.silu(self.tconvffn_up(y))  # [B, F, FF]
            FF = y.shape[-1]
            groups = self.conv_groups[1]
            for conv, key in ((self.tconvffn_conv1, "ffn_conv1"),
                              (self.tconvffn_conv2, "ffn_conv2")):
                win = jnp.concatenate([state[key], y[..., None, :]], axis=-2)
                state[key] = win[..., 1:, :]
                w, b = _conv_params(conv)
                y = _streaming_conv(win.reshape(B * F, -1, FF), w, b, groups,
                                    y.dtype).reshape(B, F, FF)
                if key == "ffn_conv1":
                    y = nn.silu(y)
            y = nn.silu(self.tconvffn_midnorm(y[:, :, None, :])[:, :, 0, :])
            win = jnp.concatenate([state["ffn_conv3"], y[..., None, :]], axis=-2)
            state["ffn_conv3"] = win[..., 1:, :]
            w, b = _conv_params(self.tconvffn_conv3)
            y = nn.silu(_streaming_conv(win.reshape(B * F, -1, FF), w, b, groups,
                                        y.dtype).reshape(B, F, FF))
            x = x + self.tconvffn_down(y)
        return x, state

    def _mhsa_streaming_step(self, y, kv_state, t, rope):
        """Masked-local-attention step via a KV ring buffer (the capability
        the reference gets by re-running masked attention over the tail,
        OnlineSpatialNet.py:196-200; here O(scope) work per frame).

        y [M, H] (normalized input frame); t: traced frame counter.
        Equals the offline masked forward frame-for-frame."""
        M, H = y.shape
        nh = self.num_heads
        dh = H // nh
        p = self.mhsa.variables["params"]
        w_in = p["in_proj"]["Dense_0"]["kernel"]
        b_in = p["in_proj"]["Dense_0"].get("bias")
        w_out = p["out_proj"]["Dense_0"]["kernel"]
        b_out = p["out_proj"]["Dense_0"].get("bias")
        dt = y.dtype

        qkv = y @ w_in.astype(dt)
        if b_in is not None:
            qkv = qkv + b_in.astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # [M, H] each
        K = jnp.concatenate([kv_state["k"], k[:, None]], axis=1)  # [M, S, H]
        V = jnp.concatenate([kv_state["v"], v[:, None]], axis=1)
        S = K.shape[1]

        qh = q.reshape(M, nh, dh)
        Kh = K.reshape(M, S, nh, dh)
        Vh = V.reshape(M, S, nh, dh)
        logits = jnp.einsum("mhd,mshd->mhs", qh, Kh,
                            preferred_element_type=jnp.float32)
        logits = logits.astype(jnp.float32) / math.sqrt(dh)
        rel = jnp.arange(S - 1, -1, -1)  # distance i - j per window slot
        if rope == "ALiBi":  # per-head slope bias (alibi_mask semantics)
            slopes = 2.0 ** (-8.0 / np.arange(1, nh + 1, dtype=np.float32))
            logits = logits - jnp.asarray(slopes)[None, :, None] * rel[None, None, :]
        logits = jnp.where(rel[None, None, :] <= t, logits, jnp.float32(-1e30))
        probs = jax.nn.softmax(logits, axis=-1).astype(dt)
        out = jnp.einsum("mhs,mshd->mhd", probs, Vh,
                         preferred_element_type=jnp.float32)
        out = out.astype(dt).reshape(M, H) @ w_out.astype(dt)
        if b_out is not None:
            out = out + b_out.astype(dt)
        return out, {"k": K[:, 1:], "v": V[:, 1:]}

    def _fconv(self, norm, conv, act, xt):
        return act(conv(norm(xt)))  # xt: [B, T, F, H]

    def _full(self, xt, full, deterministic):
        y = self.norm_full(xt)  # [B,T,F,H]
        y = nn.silu(self.squeeze(y))
        if self.dropout[2] > 0:
            B, T, F, S = y.shape
            keep = self.dropout_full(jnp.ones((B, 1, F, 1), y.dtype),
                                     deterministic=deterministic)
            y = y * keep
        y = jnp.swapaxes(y, -1, -2)
        y = full(y)
        y = jnp.swapaxes(y, -1, -2)
        return nn.silu(self.unsqueeze(y))


class OnlineSpatialNet(nn.Module):
    """[B, F, T, dim_input] -> [B, F, T, dim_output], causal over T."""

    dim_input: int
    dim_output: int
    num_layers: int
    dim_squeeze: int
    num_freqs: int
    encoder_kernel_size: int = 5
    dim_hidden: int = 192
    dim_ffn: int = 384
    num_heads: int = 2
    dropout: Tuple[float, float, float] = (0, 0, 0)
    kernel_size: Tuple[int, int] = (5, 3)
    conv_groups: Tuple[int, int] = (8, 8)
    norms: Sequence[str] = ("LN", "LN", "GN", "LN", "LN", "LN")
    full_share: int = 0
    attention: str = "mhsa(251)"
    decay: Union[int, bool, Tuple] = 5
    chunkwise_recurrent: bool = True
    rope: Union[bool, str] = False
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    # remat recompute policy: None/'none' recomputes everything (minimum
    # memory); 'dots' saves matmul outputs and recomputes only the cheap
    # elementwise/scan work (jax.checkpoint_policies
    # .dots_with_no_batch_dims_saveable) — the big fp32 selective-scan
    # temps that forced remat on are NOT dot outputs, so they stay
    # unsaved and memory stays bounded while the backward skips the
    # matmul recompute.
    remat_policy: Optional[str] = None

    def setup(self):
        kind, cfg = parse_attention(self.attention)
        self._kind = kind
        if kind == "ret":
            decay = tuple(self.decay) if isinstance(self.decay, (list, tuple)) else self.decay
            self.pos = RetNetRelPos(embed_dim=self.dim_hidden, num_heads=self.num_heads,
                                    recurrent_chunk_size=64, decay=decay)
        self.encoder = Conv1d(self.dim_hidden, self.encoder_kernel_size,
                              padding="causal", dtype=self.dtype,
                              param_dtype=self.param_dtype)
        # remat=True wraps each layer in jax.checkpoint: the mamba(16,4)
        # training step at B=8 x 4 s otherwise allocates ~24 GB of fp32
        # scan temps in the backward (>15.75 GB v5e HBM). statics: the
        # (deterministic, chunkwise, rope, recurrent) flags.
        pol_name = self.remat_policy or "none"
        policies = {"none": None,
                    "dots": jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable}
        layer_cls = (nn.remat(OnlineSpatialNetLayer, static_argnums=(4, 5, 6, 7),
                              policy=policies[pol_name])
                     if self.remat else OnlineSpatialNetLayer)
        self.layers = [
            layer_cls(
                dim_hidden=self.dim_hidden, dim_ffn=self.dim_ffn,
                dim_squeeze=self.dim_squeeze, num_freqs=self.num_freqs,
                num_heads=self.num_heads, attention=self.attention,
                dropout=self.dropout, kernel_size=self.kernel_size,
                conv_groups=self.conv_groups, norms=self.norms,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"layer_{l}",
            )
            for l in range(self.num_layers)
        ]
        self.fulls = [
            LinearGroup(self.num_freqs, self.num_freqs, num_groups=self.dim_squeeze,
                        dtype=self.dtype, param_dtype=self.param_dtype, name=f"full_{l}")
            for l in range(min(self.full_share, self.num_layers - 1) + 1)
        ]
        self.decoder = Dense(self.dim_output, dtype=self.dtype,
                             param_dtype=self.param_dtype)

    def get_rel_pos(self, slen: int, chunkwise_recurrent: bool, recurrent: bool,
                    batch_size: Optional[int] = None):
        """Static-shape mask / rel-pos constants (OnlineSpatialNet.py:356-385)."""
        kind, cfg = parse_attention(self.attention)
        if kind == "ret":
            if recurrent:
                return self.pos.recurrent_seq(slen)
            if chunkwise_recurrent:
                return self.pos.chunkwise(slen)
            return self.pos.parallel(slen)
        if kind == "mamba":
            return None
        if self.rope == "ALiBi":
            return jnp.asarray(alibi_mask(slen, cfg["scope"], self.num_heads))
        return jnp.asarray(local_causal_mask(slen, cfg["scope"]))

    # ------------------------------------------------------------ streaming
    def init_streaming_state(self, B: int, dtype=jnp.float32):
        """Explicit state pytree for frame-by-frame inference."""
        F = self.num_freqs
        return {
            "t": jnp.zeros((), jnp.int32),
            "enc": jnp.zeros((B, F, self.encoder_kernel_size - 1, self.dim_input),
                             dtype),
            "layers": [layer.init_streaming_state(B, F, dtype)
                       for layer in self.layers],
        }

    def streaming_step(self, x_t, state):
        """One frame x_t [B, F, dim_input] -> (y_t [B, F, dim_output], state').

        Jittable (the frame counter is traced); equals the offline causal
        forward frame-for-frame for ret/mamba time modules.
        """
        B, F, _ = x_t.shape
        dt = self.dtype or x_t.dtype
        x_t = x_t.astype(dt)
        win = jnp.concatenate([state["enc"], x_t[..., None, :]], axis=-2)
        state["enc"] = win[..., 1:, :]
        w, b = _conv_params(self.encoder)
        h = _streaming_conv(win.reshape(B * F, -1, self.dim_input), w, b, 1,
                            dt).reshape(B, F, self.dim_hidden)
        rel_pos_t = (self.pos.recurrent_dynamic(state["t"]) if self._kind == "ret"
                     else state["t"] if self._kind == "mhsa" else None)
        for l, layer in enumerate(self.layers):
            full = self.fulls[min(l, len(self.fulls) - 1)]
            h, state["layers"][l] = layer.streaming_step(
                h, full, state["layers"][l], rel_pos_t, self.rope)
        state["t"] = state["t"] + 1
        return self.decoder(h).astype(jnp.float32), state

    def __call__(self, x, deterministic: bool = True, inference: bool = False):
        """inference=True routes retention through its O(1)-state scan
        recurrence (chunkwise_recurrent setting otherwise, as in training)."""
        B, F, T, H0 = x.shape
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        x = self.encoder(x)

        recurrent = bool(inference) and self._kind == "ret" and not self.chunkwise_recurrent
        chunkwise = self.chunkwise_recurrent if not recurrent else False
        if not inference and self._kind == "ret":
            chunkwise = True  # training always uses chunkwise (ref :339)
        rel_pos = self.get_rel_pos(T, chunkwise, recurrent, B)

        for l, layer in enumerate(self.layers):
            full = self.fulls[min(l, len(self.fulls) - 1)]
            x = layer(x, full, rel_pos, deterministic, chunkwise, self.rope, recurrent)
        return self.decoder(x).astype(jnp.float32)


def _conv_params(conv_module):
    v = conv_module.variables["params"]["Conv_0"]
    return v["kernel"], v.get("bias")


def _streaming_conv(window, kernel, bias, groups, dtype):
    """VALID conv over a [B*, k, C] window -> [B*, C] (one causal frame)."""
    y = jax.lax.conv_general_dilated(
        window.astype(dtype), kernel.astype(dtype), window_strides=(1,),
        padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    y = y[:, 0]
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _push(window, x_t):
    """Ring-buffer push: window [..., k-1, C], x_t [..., C]."""
    return jnp.concatenate([window[..., 1:, :], x_t[..., None, :]], axis=-2)
