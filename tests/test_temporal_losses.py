"""Temporal cluster/contrastive loss parity vs reference utils.py on torch."""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax.numpy as jnp  # noqa: E402

from r3d_tpu.losses.temporal import (  # noqa: E402
    segment_ids_from_labels,
    temporal_cluster_loss,
    temporal_contrastive_loss,
)

if HAS_REF:
    import torch
    import utils as ref_utils


def ref_intervals_from_labels(labels):
    """train_unsupervised.get_cluster_intervals semantics."""
    out = []
    for row in labels:
        intervals = []
        start = 0
        cur = row[0]
        for t in range(1, len(row)):
            if row[t] != cur:
                intervals.append((start, t - 1))
                start = t
                cur = row[t]
        intervals.append((start, len(row) - 1))
        out.append(intervals)
    return out


def _random_problem(rng, B=3, T=24, C=6):
    labels = np.zeros((B, T), dtype=np.int64)
    for b in range(B):
        t = 0
        while t < T:
            run = int(rng.randint(3, 8))
            labels[b, t : t + run] = rng.randint(0, 4)
            t += run
    preds = rng.randn(B, T, C).astype(np.float32)
    return labels, preds


def test_cluster_loss_parity():
    rng = np.random.RandomState(0)
    labels, preds = _random_problem(rng)
    intervals = ref_intervals_from_labels(labels)
    ref = ref_utils.temporal_cluster_loss(torch.tensor(preds), intervals)
    seg_ids = segment_ids_from_labels(labels, None, max_segments=16)
    ours = temporal_cluster_loss(jnp.array(preds), jnp.array(seg_ids), 16)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_cluster_loss_single_cluster_rows():
    """Rows with one run exercise the reference's last-batch normalizer quirk."""
    rng = np.random.RandomState(1)
    labels, preds = _random_problem(rng)
    labels[-1, :] = 2  # last row: a single cluster
    intervals = ref_intervals_from_labels(labels)
    ref = ref_utils.temporal_cluster_loss(torch.tensor(preds), intervals)
    seg_ids = segment_ids_from_labels(labels, None, max_segments=16)
    ours = temporal_cluster_loss(jnp.array(preds), jnp.array(seg_ids), 16)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


def test_contrastive_loss_parity():
    rng = np.random.RandomState(2)
    labels, preds = _random_problem(rng, B=2, T=16, C=5)
    intervals = ref_intervals_from_labels(labels)
    ref = ref_utils.temporal_contrastive_loss(torch.tensor(preds), intervals)
    seg_ids = segment_ids_from_labels(labels, None, max_segments=16)
    ours = temporal_contrastive_loss(jnp.array(preds), jnp.array(seg_ids), 16)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-3)
