"""TrainModule: the shared task logic for every architecture.

Functional counterpart of the reference LightningModule
(/root/reference/SharedTrainer.py:32-341): waveform -> STFT -> normalize ->
stack real/imag per channel -> arch -> complex STFT coefficients ->
inverse-normalize -> iSTFT -> uPIT loss, plus validation / test / predict
steps. Unlike the Lightning version, this is a pure-function container: all
state (params, optimizer) lives outside, every step is jit-compiled, and the
dtype policy is explicit (bf16 network compute inside fp32 STFT/loss islands
— mirroring the reference's forced-fp32 autocast regions,
SharedTrainer.py:141-146,156-171).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from nbss_tpu.eval.scale import recover_scale
from nbss_tpu.io.loss import Loss
from nbss_tpu.io.norm import Norm
from nbss_tpu.io.stft import STFT
from nbss_tpu.ops import metrics as M
from nbss_tpu.ops.pit import permutate, pit


@dataclass(frozen=True)
class TrainModule:
    """Task wrapper binding an architecture to its io pipeline.

    Args mirror the reference TrainModule (SharedTrainer.py:38-63).
    ``arch`` is a flax module mapping [B,F,T,2C] -> [B,F,T,2*Spk] (real) —
    complex packing/unpacking happens here.
    """

    arch: nn.Module
    channels: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    ref_channel: int = 0
    stft: STFT = field(default_factory=lambda: STFT(n_fft=256, n_hop=128))
    norm: Norm = field(default_factory=lambda: Norm(mode="utterance"))
    loss: Loss = field(default_factory=lambda: Loss(name="neg_si_sdr", pit=True))
    val_metric: str = "loss"  # 'loss' | 'si_sdr' | 'sdr'
    mchunk: Optional[Tuple[float, float]] = None  # (len_s, hop_s) chunked eval
    # optional activation sharding over a 'freq' mesh axis: narrow-band models
    # are embarrassingly parallel over F (SURVEY.md §2.8); GSPMD inserts the
    # all-gathers the cross-band blocks need. Set by Trainer when its mesh has
    # a 'freq' axis.
    freq_axis: Optional[str] = None

    @property
    def ref_index(self) -> int:
        return self.channels.index(self.ref_channel)

    # ---------------------------------------------------------------- forward
    def forward(
        self,
        params,
        x: jnp.ndarray,
        istft: bool = True,
        deterministic: bool = True,
        rngs: Optional[Dict[str, jax.Array]] = None,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """x: [B, C, T] waveforms -> (yr_hat [B, Spk, T], loss_paras).

        Reference semantics: SharedTrainer.py:104-132.
        """
        X, stft_paras = self.stft.stft(x[:, list(self.channels)])  # [B,C,F,T] complex
        B, C, F, T = X.shape
        X, (Xr, XrMM) = self.norm.norm(X, ref_channel=self.ref_index)
        # [B,C,F,T] -> [B,F,T,C] -> interleave re/im -> [B,F,T,2C]
        Xin = jnp.transpose(X, (0, 2, 3, 1))
        Xin = jnp.stack([Xin.real, Xin.imag], axis=-1).reshape(B, F, T, 2 * C)
        if self.freq_axis is not None:
            from jax.sharding import PartitionSpec as P

            Xin = jax.lax.with_sharding_constraint(
                Xin, P("data", self.freq_axis, None, None))

        out = self.arch.apply(params, Xin, deterministic=deterministic, rngs=rngs)
        return self._postprocess(out, B, F, T, Xr, XrMM, stft_paras, istft)

    def forward_streaming(
        self, params, x: jnp.ndarray, istft: bool = True
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Frame-by-frame forward through the arch's streaming API.

        Same semantics as :meth:`forward` but the arch runs one STFT frame at
        a time via ``init_streaming_state``/``streaming_step`` inside a
        ``lax.scan`` — the deployment path of the online models (reference
        OnlineSpatialNet.py:423-426 checks causality of exactly this
        equivalence). Requires an online (causal) norm; offline norms see
        future frames and would break frame-equivalence.
        """
        X, stft_paras = self.stft.stft(x[:, list(self.channels)])
        B, C, F, T = X.shape
        X, (Xr, XrMM) = self.norm.norm(X, ref_channel=self.ref_index)
        Xin = jnp.transpose(X, (0, 2, 3, 1))
        Xin = jnp.stack([Xin.real, Xin.imag], axis=-1).reshape(B, F, T, 2 * C)

        state0 = self.arch.apply(params, B, method=self.arch.init_streaming_state)

        def step(state, x_t):  # x_t [B, F, 2C]
            y_t, state = self.arch.apply(params, x_t, state,
                                         method=self.arch.streaming_step)
            return state, y_t

        _, out = jax.lax.scan(step, state0, jnp.moveaxis(Xin, 2, 0))
        out = jnp.moveaxis(out, 0, 2)  # [T,B,F,o] -> [B,F,T,o]
        return self._postprocess(out, B, F, T, Xr, XrMM, stft_paras, istft)

    def _postprocess(self, out, B, F, T, Xr, XrMM, stft_paras, istft):
        """Arch output -> (yr_hat, loss_paras): complex fold, cIRM/to_CC,
        inverse normalization, iSTFT (SharedTrainer.py:120-132)."""
        if not jnp.iscomplexobj(out):
            out = out.astype(jnp.float32).reshape(B, F, T, -1, 2)
            out = jax.lax.complex(out[..., 0], out[..., 1])  # [B,F,T,Spk]
        out = jnp.transpose(out, (0, 3, 1, 2))  # [B,Spk,F,T]

        Yr_hat, loss_paras = self.loss.to_CC(out=out, Xr=Xr, XrMM=XrMM, stft=self.stft)
        if self.loss.mask is None:
            # mask-based outputs already live on the unnormalized Xr
            Yr_hat = self.norm.inorm(out, (Xr, XrMM))

        if istft:
            yr_hat = self.stft.istft(Yr_hat, stft_paras)
        else:
            yr_hat = jnp.stack([Yr_hat.real, Yr_hat.imag], axis=-1)
        return yr_hat, loss_paras

    # ------------------------------------------------------------------ steps
    def training_step(
        self, params, batch, rngs: Optional[Dict[str, jax.Array]] = None
    ) -> jnp.ndarray:
        """(x [B,C,T], ys [B,Spk,C,T]) -> scalar loss (SharedTrainer.py:134-149)."""
        x, ys = batch[0], batch[1]
        yr = ys[:, :, self.ref_channel, :].astype(jnp.float32)
        yr_hat, loss_paras = self.forward(params, x, deterministic=rngs is None, rngs=rngs)
        loss, _, _ = self.loss(yr_hat=yr_hat.astype(jnp.float32), yr=yr, reduce_batch=True, **loss_paras)
        return loss

    def validation_step(self, params, batch) -> Dict[str, jnp.ndarray]:
        """Loss + SDR/SI-SDR logging metrics (SharedTrainer.py:151-207)."""
        x, ys = batch[0], batch[1]
        yr = ys[:, :, self.ref_channel, :].astype(jnp.float32)
        yr_hat, loss_paras = self.forward(params, x)
        loss, perms, yr_hat = self.loss(
            yr_hat=yr_hat.astype(jnp.float32), yr=yr, reorder=True, **loss_paras
        )
        sdr_val = jnp.mean(M.sdr(yr_hat, yr))
        si_sdr_val = jnp.mean(M.si_sdr(yr_hat, yr))
        metric = {"loss": -loss, "si_sdr": si_sdr_val, "sdr": sdr_val}[self.val_metric]
        logs = {
            f"val/{self.loss.name}": loss,
            "val/metric": metric,
            "val/sdr": sdr_val,
            "val/neg_si_sdr": -si_sdr_val,
        }
        if self.mchunk is not None:
            # chunk-wise SI-SDR over (len, hop)-second windows
            # (SharedTrainer.py:196-207; sample rate fixed by the stft preset)
            fs = 8000 if self.stft.n_fft <= 256 else 16000
            chunklen = int(self.mchunk[0] * fs)
            B, Spk, T = yr.shape
            n_chk = T // chunklen
            if n_chk > 1:
                yrc = yr[..., : n_chk * chunklen].reshape(B, Spk, n_chk, chunklen)
                yhc = yr_hat[..., : n_chk * chunklen].reshape(B, Spk, n_chk, chunklen)
                v = M.si_sdr(yhc, yrc).reshape(B * Spk, n_chk).mean(axis=0)
                for i in range(n_chk):
                    key = f"val/si_sdr_{i * self.mchunk[0] + 1:g}s-{(i + 1) * self.mchunk[0]:g}s"
                    logs[key] = v[i]
        return logs

    def test_step(self, params, batch) -> Dict[str, jnp.ndarray]:
        """Loss + scale-recovered predictions (SharedTrainer.py:221-273).
        Heavy metrics are computed outside jit by eval.metrics."""
        x, ys = batch[0], batch[1]
        yr = ys[:, :, self.ref_channel, :].astype(jnp.float32)
        yr_hat, loss_paras = self.forward(params, x)
        loss, perms, yr_hat = self.loss(
            yr_hat=yr_hat.astype(jnp.float32), yr=yr, reorder=True, **loss_paras
        )
        x_ref = x[:, self.ref_channel, :].astype(jnp.float32)
        if self.loss.is_scale_invariant_loss:
            yr_hat = recover_scale(
                preds=yr_hat, mixture=x_ref,
                scale_src_together=self.loss.name == "neg_sa_sdr",
                norm_if_exceed_1=False,
            )
        return {"loss": loss, "yr_hat": yr_hat, "yr": yr, "x_ref": x_ref}

    def predict_step(
        self, params, x: jnp.ndarray, yr: Optional[jnp.ndarray] = None,
        norm_if_exceed_1: bool = True,
    ) -> jnp.ndarray:
        """x [B,C,T] -> yr_hat [B,Spk,T] (SharedTrainer.py:275-307)."""
        yr_hat, _ = self.forward(params, x)
        yr_hat = yr_hat.astype(jnp.float32)
        if self.loss.is_scale_invariant_loss:
            x_ref = x[:, self.ref_channel, :].astype(jnp.float32)
            yr_hat = recover_scale(
                preds=yr_hat, mixture=x_ref,
                scale_src_together=self.loss.name == "neg_sa_sdr",
                norm_if_exceed_1=False,
            )
        if yr is not None:
            _, perms = pit(preds=yr_hat, target=yr, metric_func=_si_sdr_bmean, eval_func="max")
            yr_hat = permutate(yr_hat, perm=perms)
        if norm_if_exceed_1:
            max_vals = jnp.max(jnp.abs(yr_hat), axis=-1, keepdims=True)
            yr_hat = yr_hat / jnp.where(max_vals > 1.0, max_vals, 1.0)
        return yr_hat


def _si_sdr_bmean(preds, target):
    v = M.si_sdr(preds, target)
    return jnp.mean(v.reshape(v.shape[0], -1), axis=1)
