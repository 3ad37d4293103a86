"""Classification losses matching reference utils.py semantics.

The reference losses have non-standard details that materially change
gradients; each is preserved and tested against a NumPy/PyTorch oracle:

- ``cal_loss`` (utils.py:449-490): CE with ignored entries contributing 0 but
  STILL counted in the mean denominator (reduction='none' then ``.mean()``
  over all B*T elements), plus a fixed +2.0 penalty whenever a valid frame is
  argmax-predicted as the pad class.
- ``cal_weighted_loss`` (utils.py:410-447): per-sequence 10x weight when the
  first future label differs from the last observed label, broadcast over the
  sequence's elements, mean over all elements, no pad penalty.
- ``focal_loss`` (utils.py:493-540): alpha=1, gamma=2 focusing on the CE,
  with the focal weight computed from the TRUE class probability indexed by
  the raw (unmasked) gold — including pad entries, whose ce is 0 so they
  still contribute 0.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _valid_mask(gold: jnp.ndarray, pad_idx: int, exclude_class_idx: Optional[int]) -> jnp.ndarray:
    mask = gold != pad_idx
    if exclude_class_idx is not None:
        mask = mask & (gold != exclude_class_idx)
    return mask


def _masked_ce(logits: jnp.ndarray, gold: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE, exactly 0 (and gradient-free) at masked entries.

    Equivalent to torch ``F.cross_entropy(..., ignore_index=-1,
    reduction='none')`` with masked gold set to -1.
    """
    safe_gold = jnp.where(mask, gold, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_gold[..., None], axis=-1)[..., 0]
    return jnp.where(mask, ce, 0.0)


def cross_entropy_loss(
    logits: jnp.ndarray,
    gold: jnp.ndarray,
    pad_idx: int,
    exclude_class_idx: Optional[int] = None,
    penalty_weight: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """utils.py cal_loss (non-smoothing branch). Returns (loss, correct_mask).

    logits: [N, C]; gold: [N] int.
    """
    mask = _valid_mask(gold, pad_idx, exclude_class_idx)
    ce = _masked_ce(logits, gold, mask)
    pred = jnp.argmax(logits, axis=-1)
    penalty = penalty_weight * ((pred == pad_idx) & mask).astype(logits.dtype)
    loss = jnp.mean(ce + penalty)
    correct = (pred == gold) & mask
    return loss, correct


def weighted_cross_entropy_loss(
    logits: jnp.ndarray,
    gold: jnp.ndarray,
    pad_idx: int,
    reference_labels: jnp.ndarray,
    target_ref: jnp.ndarray,
    exclude_class_idx: Optional[int] = None,
    weight_same: float = 1.0,
    weight_different: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """utils.py cal_weighted_loss (non-smoothing branch).

    logits: [B*T, C]; gold: [B*T]; reference_labels/target_ref: [B].
    Each sequence's elements get weight 10 when its last observed label
    (reference_labels, train_proposed_depth.py:173) differs from its first
    future label (target_ref).
    """
    mask = _valid_mask(gold, pad_idx, exclude_class_idx)
    ce = _masked_ce(logits, gold, mask)
    weights = jnp.where(reference_labels == target_ref, weight_same, weight_different)
    repeat = ce.shape[0] // weights.shape[0]
    expanded = jnp.repeat(weights, repeat)
    loss = jnp.mean(ce * expanded)
    correct = (jnp.argmax(logits, axis=-1) == gold) & mask
    return loss, correct


def focal_loss(
    logits: jnp.ndarray,
    gold: jnp.ndarray,
    pad_idx: int,
    exclude_class_idx: Optional[int] = None,
    alpha: float = 1.0,
    gamma: float = 2.0,
    penalty_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """utils.py focal_loss. Returns (loss, correct_mask).

    Note the reference indexes the true-class probability with the RAW gold
    (utils.py:527), so pad entries produce a focal weight too — harmless since
    their ce term is 0 — but gold must be in-range for the gather; callers pad
    with pad_idx which may exceed C, so we clip the gather index only (the ce
    at those entries is already 0).
    """
    mask = _valid_mask(gold, pad_idx, exclude_class_idx)
    ce = _masked_ce(logits, gold, mask)
    probs = jax.nn.softmax(logits, axis=-1)
    idx = jnp.clip(gold, 0, logits.shape[-1] - 1)
    true_probs = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
    focal_weight = alpha * (1.0 - true_probs) ** gamma
    pred = jnp.argmax(logits, axis=-1)
    penalty = penalty_weight * ((pred == pad_idx) & mask).astype(logits.dtype)
    loss = jnp.mean(focal_weight * ce + penalty)
    correct = (pred == gold) & mask
    return loss, correct


def accuracy_counts(
    logits: jnp.ndarray,
    gold: jnp.ndarray,
    pad_idx: int,
    exclude_class_idx: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(n_correct, n_valid) as in cal_performance (utils.py:368-378)."""
    mask = _valid_mask(gold, pad_idx, exclude_class_idx)
    pred = jnp.argmax(logits, axis=-1)
    n_correct = jnp.sum((pred == gold) & mask)
    n_valid = jnp.sum(mask)
    return n_correct, n_valid
