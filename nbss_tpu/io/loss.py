"""Training losses with utterance-level PIT.

JAX counterpart of /root/reference/models/io/loss.py:15-139. The loss
functions (neg_si_sdr / neg_sa_sdr / neg_snr / cirm_mse / cc_mse) return one
value per batch item; the ``Loss`` wrapper applies permutation-invariant
training over sources and optionally reorders predictions by the best
permutation.

Complex STFT tensors are handled natively as complex64; "view_as_real"
comparisons in the reference correspond to MSE over real+imag parts here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from nbss_tpu.io.cirm import build_complex_ideal_ratio_mask, decompress_cirm
from nbss_tpu.io.stft import STFT
from nbss_tpu.ops import metrics as M
from nbss_tpu.ops.pit import permutate, pit


def neg_si_sdr(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[B, spk, T] -> [B] (reference loss.py:21-29)."""
    B = target.shape[0]
    return -jnp.mean(M.si_sdr(preds, target).reshape(B, -1), axis=1)


def neg_sa_sdr(preds: jnp.ndarray, target: jnp.ndarray, scale_invariant: bool = False) -> jnp.ndarray:
    """[B, spk, T] -> [B] (reference loss.py:15-18)."""
    B = target.shape[0]
    val = M.sa_sdr(preds, target, scale_invariant=scale_invariant)
    return -jnp.mean(val.reshape(B, -1), axis=1)


def neg_snr(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[B, spk, T] -> [B] (reference loss.py:32-40)."""
    B = target.shape[0]
    return -jnp.mean(M.snr(preds, target).reshape(B, -1), axis=1)


def _mse(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    B = target.shape[0]
    diff = (preds - target).reshape(B, -1)
    return jnp.mean(diff**2, axis=1)


def _complex_mse(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE over stacked real/imag parts (matches view_as_real + MSE)."""
    B = target.shape[0]
    diff = preds - target
    d = jnp.stack([diff.real, diff.imag], axis=-1).reshape(B, -1)
    return jnp.mean(d**2, axis=1)


def cirm_mse(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return _complex_mse(preds, target) if jnp.iscomplexobj(preds) else _mse(preds, target)


def cc_mse(preds: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return _complex_mse(preds, target) if jnp.iscomplexobj(preds) else _mse(preds, target)


_LOSS_FUNCS = {
    "neg_si_sdr": neg_si_sdr,
    "neg_sa_sdr": neg_sa_sdr,
    "neg_snr": neg_snr,
    "cirm_mse": cirm_mse,
    "cc_mse": cc_mse,
}


def resolve_loss_func(name: str):
    """Resolve a loss by short name or reference-style import path
    (e.g. 'models.io.loss.neg_si_sdr' from configs/SpatialNet.yaml:39)."""
    short = name.rsplit(".", 1)[-1]
    if short not in _LOSS_FUNCS:
        raise KeyError(f"unknown loss function {name!r}; known: {sorted(_LOSS_FUNCS)}")
    return _LOSS_FUNCS[short]


@dataclass(frozen=True)
class Loss:
    """Loss policy (hashable -> safe as a jit static arg).

    Attributes mirror the reference Loss module (loss.py:74-139):
    - ``name``: one of neg_si_sdr / neg_sa_sdr / neg_snr / cirm_mse / cc_mse.
    - ``pit``: apply utterance-level permutation-invariant training.
    - ``is_scale_invariant_loss``: used by test/predict scale recovery.
    - ``mask``: 'cirm' for cirm_mse, else None.
    """

    name: str = "neg_si_sdr"
    pit: bool = True
    loss_func_kwargs: Tuple[Tuple[str, Any], ...] = field(default_factory=tuple)

    def __post_init__(self):
        object.__setattr__(self, "name", self.name.rsplit(".", 1)[-1])
        resolve_loss_func(self.name)

    @property
    def kwargs(self) -> Dict[str, Any]:
        return dict(self.loss_func_kwargs)

    @property
    def is_scale_invariant_loss(self) -> bool:
        if self.name == "neg_si_sdr":
            return True
        if self.name == "neg_sa_sdr":
            return bool(self.kwargs.get("scale_invariant", False))
        return False

    @property
    def mask(self) -> Optional[str]:
        return "cirm" if self.name == "cirm_mse" else None

    def __call__(
        self,
        yr_hat: jnp.ndarray,
        yr: jnp.ndarray,
        reorder: bool = False,
        reduce_batch: bool = True,
        out: Optional[jnp.ndarray] = None,
        Xr: Optional[jnp.ndarray] = None,
        XrMM: Optional[jnp.ndarray] = None,
        stft: Optional[STFT] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        """Compute the loss (reference loss.py:95-118).

        Args:
            yr_hat: time-domain predictions [B, spk, T].
            yr: time-domain targets [B, spk, T].
            out / Xr / XrMM / stft: STFT-domain context required by the
                mask/coefficient losses (reference passes them via to_CC).

        Returns:
            (loss, perms or None, yr_hat possibly reordered)
        """
        func = resolve_loss_func(self.name)
        if self.mask is not None:  # cirm_mse: compare masks in STFT domain
            Yr, _ = stft.stft(yr)
            preds, target = out, build_complex_ideal_ratio_mask(noisy=Xr, clean=Yr)
        elif self.name == "cc_mse":  # compare normalized STFT coefficients
            if XrMM is None:  # Norm(mode='none') provides no magnitudes
                raise ValueError(
                    "cc_mse requires an input normalization that produces "
                    "reference-channel magnitudes (Norm mode != 'none')")
            Yr, _ = stft.stft(yr)
            preds, target = out, Yr / XrMM
        else:
            preds, target = yr_hat, yr

        perms = None
        if self.pit:
            losses, perms = pit(
                preds=preds, target=target, metric_func=func, eval_func="min", **self.kwargs
            )
        else:
            losses = func(preds=preds, target=target, **self.kwargs)

        if reorder and perms is not None:
            yr_hat = permutate(yr_hat, perm=perms)

        return (jnp.mean(losses) if reduce_batch else losses), perms, yr_hat

    def to_CC(
        self, out: jnp.ndarray, Xr: jnp.ndarray, stft: STFT, XrMM: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """Map network output to STFT coefficients (reference loss.py:120-126)."""
        loss_paras = {"out": out, "Xr": Xr, "stft": stft, "XrMM": XrMM}
        if self.name == "cirm_mse":
            cirm = decompress_cirm(mask=out)
            return Xr * cirm, loss_paras
        return out, loss_paras
