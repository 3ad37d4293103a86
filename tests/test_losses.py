"""Loss parity tests: our JAX losses vs the reference utils.py run on torch-CPU."""

import numpy as np
import pytest

from conftest import reference_on_path

import jax.numpy as jnp

from r3d_tpu.losses import (
    cross_entropy_loss,
    weighted_cross_entropy_loss,
    focal_loss,
    accuracy_counts,
    normalize_duration,
    duration_loss,
    supcon_loss,
)

HAS_REF = reference_on_path()
if HAS_REF:
    import torch
    import utils as ref_utils  # reference /root/reference/utils.py
    from loss.spc import SupConLoss as RefSupConLoss


def _rand_problem(rng, n=64, c=12, pad_idx=13, exclude=None):
    logits = rng.randn(n, c).astype(np.float32)
    gold = rng.randint(0, c, size=n)
    gold[rng.rand(n) < 0.2] = pad_idx
    if exclude is not None:
        gold[rng.rand(n) < 0.1] = exclude
    return logits, gold


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
@pytest.mark.parametrize("exclude", [None, 5])
def test_cal_loss_parity(exclude):
    rng = np.random.RandomState(1)
    logits, gold = _rand_problem(rng, pad_idx=13, exclude=exclude)
    ref_loss, ref_correct = ref_utils.cal_loss(
        torch.tensor(logits), torch.tensor(gold), 13, exclude_class_idx=exclude
    )
    loss, correct = cross_entropy_loss(jnp.array(logits), jnp.array(gold), 13, exclude)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_cal_performance_counts_parity():
    rng = np.random.RandomState(2)
    logits, gold = _rand_problem(rng, pad_idx=13, exclude=5)
    _, ref_nc, ref_nw, _ = ref_utils.cal_performance(
        torch.tensor(logits), torch.tensor(gold), 13, exclude_class_idx=5
    )
    nc, nw = accuracy_counts(jnp.array(logits), jnp.array(gold), 13, 5)
    assert int(nc) == ref_nc and int(nw) == ref_nw


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_weighted_loss_parity():
    rng = np.random.RandomState(3)
    B, T, C, pad = 8, 8, 12, 13
    logits = rng.randn(B * T, C).astype(np.float32)
    gold = rng.randint(0, C, size=B * T)
    gold[rng.rand(B * T) < 0.2] = pad
    ref_labels = rng.randint(0, C, size=B)
    target_ref = ref_labels.copy()
    target_ref[:4] = (target_ref[:4] + 1) % C  # half the sequences differ
    ref_loss, _ = ref_utils.cal_weighted_loss(
        torch.tensor(logits), torch.tensor(gold), pad,
        torch.tensor(ref_labels), exclude_class_idx=5,
        target_ref=torch.tensor(target_ref),
    )
    loss, _ = weighted_cross_entropy_loss(
        jnp.array(logits), jnp.array(gold), pad,
        jnp.array(ref_labels), jnp.array(target_ref), exclude_class_idx=5,
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_focal_loss_parity():
    rng = np.random.RandomState(4)
    # keep gold in-range for the reference's unclipped true-class gather
    logits, gold = _rand_problem(rng, n=64, c=14, pad_idx=13, exclude=None)
    ref_loss, _ = ref_utils.focal_loss(torch.tensor(logits), torch.tensor(gold), 13)
    loss, _ = focal_loss(jnp.array(logits), jnp.array(gold), 13)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_normalize_duration_parity():
    rng = np.random.RandomState(5)
    x = rng.randn(4, 8).astype(np.float32)
    mask = (rng.rand(4, 8) > 0.3).astype(np.float32)
    ref = ref_utils.normalize_duration(torch.tensor(x), torch.tensor(mask))
    ours = normalize_duration(jnp.array(x), jnp.array(mask))
    np.testing.assert_allclose(np.array(ours), ref.numpy(), atol=1e-6)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_duration_loss_parity():
    rng = np.random.RandomState(6)
    B, Q, pad = 4, 8, 13
    pred = rng.randn(B, Q).astype(np.float32)
    dur = rng.rand(B, Q).astype(np.float32)
    dur[rng.rand(B, Q) < 0.3] = pad
    mask = (dur != pad).astype(np.float32)
    # reference train loop (train.py:136-140)
    t_pred = ref_utils.normalize_duration(torch.tensor(pred), torch.tensor(mask))
    t_tgt = torch.tensor(dur * mask) * torch.tensor(mask)
    crit = torch.nn.MSELoss(reduction="none")
    ref = torch.sum(crit(t_pred, t_tgt)) / torch.sum(torch.tensor(mask))
    ours = duration_loss(jnp.array(pred), jnp.array(dur * mask), jnp.array(mask))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_supcon_parity():
    rng = np.random.RandomState(7)
    feats = rng.randn(10, 2, 16).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    labels = rng.randint(0, 3, size=10)
    ref = RefSupConLoss()(torch.tensor(feats), torch.tensor(labels))
    ours = supcon_loss(jnp.array(feats), jnp.array(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-3)
