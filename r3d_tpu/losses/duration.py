"""Duration head utilities (reference utils.py:325-328, train loops)."""

from __future__ import annotations

import jax.numpy as jnp


def normalize_duration(durations: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """exp -> mask -> L1 normalize along the last axis (utils.py:325-328).

    Matches torch ``F.normalize(x, p=1, dim=-1)`` which divides by
    ``max(||x||_1, eps)`` with eps=1e-12, so an all-masked row yields zeros
    rather than NaN.
    """
    x = jnp.exp(durations) * mask.astype(durations.dtype)
    denom = jnp.maximum(jnp.sum(jnp.abs(x), axis=-1, keepdims=True), 1e-12)
    return x / denom


def duration_loss(
    pred_durations: jnp.ndarray,
    target_durations: jnp.ndarray,
    dur_mask: jnp.ndarray,
) -> jnp.ndarray:
    """MSE(none) summed then divided by mask count (train.py:139-140).

    The reference compares the normalized prediction against
    ``target * mask`` WITHOUT masking the prediction-side error of padded
    slots — but normalize_duration already zeroes those slots, so the padded
    error terms are target 0 vs pred 0. Note the division is by the number of
    VALID duration slots, not all slots.
    """
    mask = dur_mask.astype(pred_durations.dtype)
    pred = normalize_duration(pred_durations, dur_mask)
    target = target_durations * mask
    sq = (pred - target) ** 2
    return jnp.sum(sq) / jnp.maximum(jnp.sum(mask), 1.0)
