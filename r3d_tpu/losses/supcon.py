"""Supervised contrastive loss (reference loss/spc.py:65-161, Khosla et al.).

JAX re-implementation of the 'all' contrast mode with the same edge-case
handling (anchors with no positive pair divide by 1 instead of 0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def supcon_loss(
    features: jnp.ndarray,
    labels: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> jnp.ndarray:
    """features: [B, n_views, D]; labels: [B] or mask: [B, B]."""
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)
    B, n_views = features.shape[0], features.shape[1]

    if labels is not None and mask is not None:
        raise ValueError("Cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(B, dtype=features.dtype)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(features.dtype)
    else:
        mask = mask.astype(features.dtype)

    # [B, V, D] -> [V*B, D] (torch.cat(torch.unbind(dim=1)) ordering)
    contrast_feature = jnp.concatenate(
        [features[:, v] for v in range(n_views)], axis=0
    )
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    elif contrast_mode == "all":
        anchor_feature, anchor_count = contrast_feature, n_views
    else:
        raise ValueError(f"Unknown mode: {contrast_mode}")

    logits = anchor_feature @ contrast_feature.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    n_anchor = B * anchor_count
    logits_mask = 1.0 - jnp.eye(n_anchor, mask.shape[1], dtype=mask.dtype)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))

    pos_pairs = jnp.sum(mask, axis=1)
    pos_pairs = jnp.where(pos_pairs < 1e-6, 1.0, pos_pairs)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / pos_pairs

    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, B))
