"""Full unsupervised-curriculum composite loss parity vs the reference.

The component losses (focal L3, temporal cluster, weighted CE, duration) are
parity-tested individually elsewhere; this test asserts the ASSEMBLY —
triangular warmup factor + correctness-gated weighting
(train/train_unsupervised.py:294-362):

    hmw  = where(l3_correct & l2_correct, 1, 5)
    wf   = get_warmup_factor(epoch, 0, 30, 60)
    loss = (1 - 1/mean(hmw)) * ((1-wf)*l3 + wf*cluster)
         + (1/mean(hmw)) * (cls + dur + seg)

computed by Trainer._losses on random logits equals the same lines executed
with the actual reference functions, across epochs on both warmup ramps.
"""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3d_tpu.config import get_config, ModelConfig, TrainConfig  # noqa: E402
from r3d_tpu.losses.temporal import segment_ids_from_labels  # noqa: E402
from r3d_tpu.train.loop import Trainer, triangular_warmup  # noqa: E402

if HAS_REF:
    import os
    import sys

    from conftest import REFERENCE

    # reference train/ has no __init__.py; entry points put it on sys.path
    # (SURVEY.md §0 import-path quirk)
    sys.path.insert(0, os.path.join(REFERENCE, "train"))
    import torch
    import utils as ref_utils
    from train_unsupervised import get_cluster_intervals, get_warmup_factor


B, S, NQ = 4, 24, 6
N_CLASS = 5            # action classes; pad = N_CLASS + 1 = 6
QV = 4                 # L3 query vocab; pad/exclude ids below
L3_PAD, L3_EXCL = 4, 5


def _problem(seed):
    rng = np.random.RandomState(seed)
    # piecewise-constant L3 labels (so cluster intervals are non-trivial),
    # some rows ending in pad
    q = np.zeros((B, S), np.int64)
    for b in range(B):
        t = 0
        while t < S:
            run = int(rng.randint(3, 7))
            q[b, t:t + run] = rng.randint(0, QV)
            t += run
        if b % 2:
            q[b, S - rng.randint(1, 5):] = L3_PAD
    past = rng.randint(0, N_CLASS, (B, S)).astype(np.int64)
    past[0, S - 3:] = N_CLASS + 1  # pad tail
    target = rng.randint(0, N_CLASS, (B, NQ)).astype(np.int64)
    target[1, NQ - 2:] = N_CLASS + 1
    dur = rng.rand(B, NQ).astype(np.float32)
    dur[1, NQ - 2:] = N_CLASS + 1  # pad marker in duration stream
    outputs = {
        "l3": rng.randn(B, S, QV + 2).astype(np.float32),
        "seg": rng.randn(B, S, N_CLASS + 2).astype(np.float32),
        "action": rng.randn(B, NQ, N_CLASS + 2).astype(np.float32),
        "duration": rng.randn(B, NQ).astype(np.float32),
    }
    return q, past, target, dur, outputs


def _reference_composite(q, past, target, dur, outputs, epoch):
    pad_idx = N_CLASS + 1
    l3 = torch.tensor(outputs["l3"])
    seg = torch.tensor(outputs["seg"])
    act = torch.tensor(outputs["action"])
    out_dur = torch.tensor(outputs["duration"])
    q_t = torch.tensor(q)
    past_t = torch.tensor(past)
    target_t = torch.tensor(target)
    dur_t = torch.tensor(dur)

    loss_supcon = ref_utils.temporal_cluster_loss(
        l3, get_cluster_intervals(q_t)
    )
    loss_l3, _, _, l3_correct = ref_utils.cal_performance_focal(
        l3.reshape(-1, l3.shape[-1]), q_t.reshape(-1), L3_PAD, L3_EXCL
    )
    loss_seg, _, _, l2_correct = ref_utils.cal_performance(
        seg.reshape(-1, seg.shape[-1]), past_t.reshape(-1), pad_idx,
        exclude_class_idx=None, reference=None, target_ref=None,
    )

    def last_non_pad(row):
        v = [x for x in row.tolist() if x != pad_idx]
        return v[-1] if v else pad_idx

    first_ref = torch.tensor([last_non_pad(r) for r in past_t])
    loss_cls, _, _, _ = ref_utils.cal_performance(
        act.reshape(-1, act.shape[-1]), target_t.reshape(-1), pad_idx,
        exclude_class_idx=None, reference=first_ref,
        target_ref=target_t[:, 0],
    )
    mask = (dur_t != pad_idx).float()
    norm = ref_utils.normalize_duration(out_dur, mask)
    crit = torch.nn.MSELoss(reduction="none")
    loss_dur = torch.sum(crit(norm, dur_t * mask)) / torch.sum(mask)

    hmw = torch.where(
        l3_correct & l2_correct, torch.tensor(1.0), torch.tensor(5.0)
    )
    wf = get_warmup_factor(epoch, start_epoch=0, peak_epoch=30, end_epoch=60)
    return (
        (1 - 1 / hmw.mean()) * ((1 - wf) * loss_l3 + wf * loss_supcon)
        + (1 / hmw.mean()) * (loss_cls + loss_dur + loss_seg)
    ).item()


def _our_composite(q, past, target, dur, outputs, epoch):
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model="futr_unsupervised", hidden_dim=32, n_head=4, input_dim=32,
            seg=True, anticipate=True, compute_dtype="float32",
        ),
        train=TrainConfig(
            loop="unsupervised", l3_pad_idx=L3_PAD, l3_exclude_idx=L3_EXCL,
            warmup_loss_epochs=(30, 60), max_segments=16, min_train_batch=0,
        ),
    )
    trainer = Trainer(cfg, N_CLASS)
    batch = {
        "past_label": jnp.asarray(past),
        "trans_future_target": jnp.asarray(target),
        "trans_future_dur": jnp.asarray(dur),
        "query_label": jnp.asarray(q),
        "seg_ids": segment_ids_from_labels(jnp.asarray(q), None, 16),
    }
    total, metrics = trainer._losses(
        {k: jnp.asarray(v) for k, v in outputs.items()},
        batch, epoch=epoch, train=True,
    )
    return float(total)


@pytest.mark.parametrize("epoch", [0, 7, 30, 45, 60])
def test_composite_parity_across_warmup(epoch):
    q, past, target, dur, outputs = _problem(seed=epoch + 1)
    ref = _reference_composite(q, past, target, dur, outputs, epoch)
    ours = _our_composite(q, past, target, dur, outputs, epoch)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_triangular_warmup_matches_reference():
    for e in range(0, 70):
        np.testing.assert_allclose(
            float(triangular_warmup(e, 0, 30, 60)),
            get_warmup_factor(e, 0, 30, 60),
            atol=1e-6,
        )
