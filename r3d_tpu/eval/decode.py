"""Anticipation decode: transcript + durations -> frame-level prediction.

Vectorized re-implementation of the reference decode shared by every
predict_* (predict.py:78-110, evaluation/predict_utkinects.py:331-354):

1. argmax actions over queries;
2. find the first NONE; durations from it onward are masked before
   ``normalize_duration`` (exp -> mask -> L1); if no NONE, no masking;
3. integer lengths ``(0.5 + future_len * dur).long()``;
4. paint frames: interval i covers [cum_i, cum_{i+1}); the LAST action also
   paints everything from its start to the end of the horizon.

The reference paints with a Python loop over queries; here it is one
searchsorted over the cumulative boundaries — identical output, O(T) and
jit/vmap friendly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def decode_anticipation(
    action_logits: np.ndarray,   # [Q, n_class]
    durations: np.ndarray,       # [Q]
    future_len: int,
    none_idx: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (frame_labels [future_len] int, normalized_durations [Q])."""
    actions = np.argmax(action_logits, axis=-1)
    Q = actions.shape[0]

    none_positions = np.nonzero(actions == none_idx)[0]
    if none_positions.size > 0:
        none_i = int(none_positions[0])
        mask = np.arange(Q) < none_i
    else:
        mask = np.ones(Q, dtype=bool)

    x = np.exp(durations) * mask
    denom = max(float(np.abs(x).sum()), 1e-12)
    norm_dur = x / denom

    pred_len = (0.5 + future_len * norm_dur).astype(np.int64)
    bounds = np.concatenate([[0], np.cumsum(pred_len)])
    if future_len <= 0:
        return np.zeros((0,), dtype=np.int64), norm_dur
    t = np.arange(future_len)
    idx = np.searchsorted(bounds[1:], t, side="right")
    idx = np.clip(idx, 0, Q - 1)
    return actions[idx], norm_dur


def decode_frames_from_slots(
    action_logits: np.ndarray,   # [Q, n_class] per-slot future-frame logits
    future_len: int,
) -> np.ndarray:
    """Duration-less decode for slot-regression models (the TCN emits
    ``anticipated_frames`` per-slot class logits, model/tcn.py:80-84, with
    no duration head): slot q paints frames [q*T/Q, (q+1)*T/Q).

    The reference's own TCN paint loop is unrunnable as committed
    (evaluation/predict_tcn.py:97-100 fills from ``torch.ones`` and never
    reads the model output; its accuracy() calls ``.replace`` on tensor
    elements — COMPAT #29), so this implements the evident per-slot intent
    (each slot aligns with one subsampled future frame, predict_tcn.py:87).
    """
    classes = np.argmax(action_logits, axis=-1)
    if future_len <= 0:
        return np.zeros((0,), dtype=np.int64)
    Q = classes.shape[0]
    idx = (np.arange(future_len) * Q) // future_len
    return classes[np.minimum(idx, Q - 1)].astype(np.int64)
