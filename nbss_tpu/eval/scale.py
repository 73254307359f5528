"""Scale recovery for scale-invariant losses.

Counterpart of /root/reference/models/utils/metrics.py:192-218: SI-SDR
training loses absolute scale; recover it by solving the least-squares
problem min_a || preds^T a - mixture ||_F against the reference-channel
mixture. Solved via the S x S normal equations (S = #sources <= 4) instead of
a general LSTSQ — a tiny batched solve that stays on device.
"""

from __future__ import annotations

import jax.numpy as jnp


def recover_scale(
    preds: jnp.ndarray,
    mixture: jnp.ndarray,
    scale_src_together: bool = False,
    norm_if_exceed_1: bool = True,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Rescale predictions to the mixture's absolute level.

    Args:
        preds: [B, S, T]
        mixture: [B, T] (reference-channel mixture)
        scale_src_together: single shared scale (keeps relative source
            energies; used with scale-invariant SA-SDR).
    Returns:
        [B, S, T] rescaled predictions.
    """
    preds = preds.astype(jnp.float32)
    mixture = mixture.astype(jnp.float32)
    y = preds.sum(axis=-2, keepdims=True) if scale_src_together else preds  # [B,S',T]
    G = jnp.einsum("bst,but->bsu", y, y)  # [B,S',S']
    G = G + eps * jnp.eye(G.shape[-1], dtype=G.dtype)
    b = jnp.einsum("bst,bt->bs", y, mixture)  # [B,S']
    a = jnp.linalg.solve(G, b[..., None])  # [B,S',1]
    preds = preds * a
    if norm_if_exceed_1:
        max_vals = jnp.max(jnp.abs(preds), axis=-1, keepdims=True)
        preds = preds / jnp.where(max_vals > 1.0, max_vals, 1.0)
    return preds
