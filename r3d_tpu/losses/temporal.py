"""Temporal clustering losses (reference utils.py:229-321).

The reference operates on Python lists of (start, end) intervals built from
ground-truth label runs (train_unsupervised.py:34-64). That shape is hostile
to XLA (dynamic per-example loop bounds), so the TPU-native version takes a
dense per-frame segment-id map instead:

    seg_ids: [B, T] int, the run index of each frame (0..K-1), -1 for
             padded/invalid frames. K = static max number of runs.

which is equivalent information and turns every loop into a masked
segment-sum — one fused XLA reduction instead of thousands of tiny kernels.

Faithfulness notes (verified against a direct NumPy port of the reference in
tests/test_temporal_losses.py):
- intra: sum over clusters of mean-squared deviation from the cluster mean
  (torch F.mse_loss default 'mean' over N*C elements), divided by the total
  cluster count.
- inter: sum over batches (only those with >1 cluster) of pairwise
  1/(1e-5+L2(mean_i, mean_j)); the reference divides by
  ``len(cluster_means) * (num_clusters - 1)`` where ``num_clusters`` is the
  cluster count of the LAST batch iterated (utils.py:317) — a quirk we
  reproduce exactly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def segment_ids_from_labels(
    labels: np.ndarray, valid: Optional[np.ndarray], max_segments: int
) -> np.ndarray:
    """Per-frame run index from per-frame labels (host-side helper).

    Mirrors train_unsupervised.get_cluster_intervals:34-64: a new segment
    starts whenever the label changes; the reference runs it on the raw
    padded label map, so ``valid=None`` (all frames) matches it. Invalid
    frames (when a mask is given) get -1.
    """
    labels = np.asarray(labels)
    if valid is None:
        changes = np.zeros(labels.shape, dtype=np.int32)
        changes[:, 1:] = (labels[:, 1:] != labels[:, :-1]).astype(np.int32)
        seg = np.cumsum(changes, axis=1)
        return np.minimum(seg, max_segments - 1).astype(np.int32)
    out = np.full(labels.shape, -1, dtype=np.int32)
    for b in range(labels.shape[0]):
        seg = -1
        prev = None
        for t in range(labels.shape[1]):
            if not valid[b, t]:
                continue
            if prev is None or labels[b, t] != prev:
                seg += 1
                prev = labels[b, t]
            out[b, t] = min(seg, max_segments - 1)
    return out


def segment_ids_from_labels_jnp(labels: jnp.ndarray,
                                max_segments: int) -> jnp.ndarray:
    """Jax twin of segment_ids_from_labels(valid=None) — the variant the
    train loop uses — so the device-cached path can derive seg_ids inside
    the jitted step (equality tested in tests/test_device_cache.py)."""
    changes = jnp.concatenate(
        [
            jnp.zeros_like(labels[:, :1], dtype=jnp.int32),
            (labels[:, 1:] != labels[:, :-1]).astype(jnp.int32),
        ],
        axis=1,
    )
    seg = jnp.cumsum(changes, axis=1)
    return jnp.minimum(seg, max_segments - 1).astype(jnp.int32)


def _cluster_stats(predictions: jnp.ndarray, seg_ids: jnp.ndarray, max_segments: int):
    """Returns (means [B,K,C], counts [B,K], cluster_exists [B,K])."""
    B, T, C = predictions.shape
    onehot = jax.nn.one_hot(seg_ids, max_segments, dtype=predictions.dtype)  # [B,T,K]
    onehot = onehot * (seg_ids >= 0)[..., None].astype(predictions.dtype)
    counts = jnp.sum(onehot, axis=1)  # [B,K]
    sums = jnp.einsum("btk,btc->bkc", onehot, predictions)
    means = sums / jnp.maximum(counts, 1.0)[..., None]
    return means, counts, counts > 0


def temporal_cluster_loss(
    predictions: jnp.ndarray, seg_ids: jnp.ndarray, max_segments: int
) -> jnp.ndarray:
    """utils.py:271-321 on dense segment ids. predictions: [B,T,C]."""
    B, T, C = predictions.shape
    means, counts, exists = _cluster_stats(predictions, seg_ids, max_segments)

    # intra: for each cluster, F.mse_loss(preds_in_cluster, mean) =
    # sum_sq_dev / (count*C); summed over clusters, / total_clusters.
    safe_ids = jnp.clip(seg_ids, 0, max_segments - 1)
    frame_means = jnp.take_along_axis(means, safe_ids[:, :, None].astype(jnp.int32), axis=1)
    sq_dev = jnp.sum((predictions - frame_means) ** 2, axis=-1)  # [B,T]
    sq_dev = jnp.where(seg_ids >= 0, sq_dev, 0.0)
    onehot = jax.nn.one_hot(safe_ids, max_segments, dtype=predictions.dtype)
    onehot = onehot * (seg_ids >= 0)[..., None].astype(predictions.dtype)
    per_cluster_sq = jnp.einsum("btk,bt->bk", onehot, sq_dev)  # [B,K]
    per_cluster_mse = per_cluster_sq / jnp.maximum(counts * C, 1.0)
    total_clusters = jnp.sum(exists)
    intra = jnp.sum(jnp.where(exists, per_cluster_mse, 0.0)) / jnp.maximum(total_clusters, 1)

    # inter: pairwise 1/(1e-5 + L2 dist) between cluster means, batches with
    # >1 cluster only.
    n_b = jnp.sum(exists, axis=-1)  # [B]
    multi = n_b > 1
    diff = means[:, :, None, :] - means[:, None, :, :]  # [B,K,K,C]
    sq = jnp.sum(diff**2, axis=-1)
    pair_valid = (
        exists[:, :, None]
        & exists[:, None, :]
        & (jnp.arange(max_segments)[:, None] < jnp.arange(max_segments)[None, :])
    )
    pair_valid = pair_valid & multi[:, None, None]
    # double-where: sqrt'(0) is inf and would leak NaN through the masked
    # branch's gradient; clamp inside the valid region too (coincident
    # cluster means), matching torch.norm's 0-subgradient behavior
    safe_sq = jnp.where(pair_valid, jnp.maximum(sq, 1e-12), 1.0)
    dist = jnp.sqrt(safe_sq)
    inter_sum = jnp.sum(jnp.where(pair_valid, 1.0 / (1e-5 + dist), 0.0))

    # reference quirk: denominator uses the LAST multi-cluster batch's count
    n_multi = jnp.sum(multi)
    idxs = jnp.arange(predictions.shape[0])
    last_multi = jnp.max(jnp.where(multi, idxs, -1))
    last_count = jnp.where(last_multi >= 0, n_b[jnp.maximum(last_multi, 0)], 2)
    inter = jnp.where(
        n_multi > 0, inter_sum / jnp.maximum(n_multi * (last_count - 1), 1), 0.0
    )
    return intra + inter


def temporal_contrastive_loss(
    predictions: jnp.ndarray,
    seg_ids: jnp.ndarray,
    max_segments: int,
    temperature: float = 0.07,
) -> jnp.ndarray:
    """utils.py:229-268 on dense segment ids.

    For each cluster: rows = cluster frames, columns = ALL frames of the
    sequence; per-row -log(softmax-ish ratio + 1e-5) masked to same-cluster
    (non-diagonal) pairs, averaged by the positive count; summed over clusters
    then divided by the number of batches.
    """
    B, T, C = predictions.shape
    x = predictions / jnp.maximum(
        jnp.linalg.norm(predictions, axis=-1, keepdims=True), 1e-12
    )
    sim = jnp.einsum("btc,bsc->bts", x, x) / temperature  # [B,T,T]
    exp_sim = jnp.exp(sim)
    valid = seg_ids >= 0  # [B,T]
    row_sum = jnp.sum(exp_sim, axis=-1, keepdims=True)  # reference sums ALL columns
    log_ratio = -jnp.log(exp_sim / row_sum + 1e-5)

    same = (seg_ids[:, :, None] == seg_ids[:, None, :]) & valid[:, :, None] & valid[:, None, :]
    # reference quirk (utils.py:259): pos_mask is [N, T] per cluster and
    # ``fill_diagonal_(0)`` zeroes ABSOLUTE columns 0..N-1 — i.e. for the row
    # at in-cluster offset r it clears column r, which is the true self-pair
    # only when the cluster starts at t=0. Reproduce exactly: clear column
    # (t - cluster_start(t)) for each row t.
    k_ids = jnp.clip(seg_ids, 0, max_segments - 1)
    t_idx = jnp.arange(T)
    first_t = jnp.min(
        jnp.where(
            (k_ids[:, None, :] == jnp.arange(max_segments)[None, :, None]) & valid[:, None, :],
            t_idx[None, None, :],
            T,
        ),
        axis=-1,
    )  # [B, K] first frame of each cluster
    start_t = jnp.take_along_axis(first_t, k_ids, axis=1)  # [B, T]
    quirk_col = t_idx[None, :] - start_t  # in-cluster row offset
    quirk = t_idx[None, None, :] == quirk_col[:, :, None]  # [B, T, T]
    pos_mask = (same & ~quirk).astype(predictions.dtype)

    # per-cluster average then sum over clusters: group rows by cluster
    onehot = jax.nn.one_hot(jnp.clip(seg_ids, 0, max_segments - 1), max_segments,
                            dtype=predictions.dtype)
    onehot = onehot * valid[..., None].astype(predictions.dtype)
    num = jnp.einsum("btk,bts->bk", onehot, log_ratio * pos_mask)
    den = jnp.einsum("btk,bts->bk", onehot, pos_mask)
    per_cluster = num / (den + 1e-5)
    return jnp.sum(per_cluster) / B
