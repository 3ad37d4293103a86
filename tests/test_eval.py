"""Decode + MoC tests against literal reference-semantics oracles."""

import numpy as np

from r3d_tpu.eval.decode import decode_anticipation
from r3d_tpu.eval.moc import MoCAccumulator, eval_file_counts, moc_from_counts


def ref_decode_oracle(action_logits, durations, future_len, none_idx):
    """Literal (loop-for-loop) transcription of the reference decode
    (predict.py:78-110) as a NumPy oracle."""
    actions = np.argmax(action_logits, axis=-1)
    Q = len(actions)
    none_idx_pos = None
    for i in range(Q):
        if actions[i] == none_idx:
            none_idx_pos = i
            break
    mask = np.ones(Q)
    if none_idx_pos is not None:
        mask[none_idx_pos:] = 0
    x = np.exp(durations) * mask
    dur = x / max(np.abs(x).sum(), 1e-12)

    pred_len = np.concatenate([[0], (0.5 + future_len * dur).astype(np.int64)])
    predicted = np.ones(future_len)
    for i in range(Q):
        predicted[int(pred_len[i]) : int(pred_len[i] + pred_len[i + 1])] = actions[i]
        pred_len[i + 1] = pred_len[i] + pred_len[i + 1]
        if i == Q - 1:
            predicted[int(pred_len[i]) :] = actions[i]
    return predicted.astype(np.int64)


def test_decode_matches_reference_loop():
    rng = np.random.RandomState(0)
    for trial in range(50):
        Q, C = 8, 12
        logits = rng.randn(Q, C)
        durs = rng.randn(Q) * 0.5
        future_len = int(rng.randint(5, 200))
        frames, _ = decode_anticipation(logits, durs, future_len, none_idx=C - 1)
        oracle = ref_decode_oracle(logits, durs, future_len, none_idx=C - 1)
        np.testing.assert_array_equal(frames, oracle)


def test_decode_first_action_none():
    logits = np.full((4, 5), -1.0)
    logits[:, 4] = 5.0  # every query predicts NONE
    frames, _ = decode_anticipation(logits, np.zeros(4), 10, none_idx=4)
    oracle = ref_decode_oracle(logits, np.zeros(4), 10, none_idx=4)
    np.testing.assert_array_equal(frames, oracle)


def ref_eval_file_oracle(gt, recog, obs_percentage, n_classes):
    """Literal transcription of utils.py:341-356 on int labels."""
    last_frame = min(len(recog), len(gt))
    recognized = recog[int(obs_percentage * len(gt)) : last_frame]
    ground_truth = gt[int(obs_percentage * len(gt)) : last_frame]
    n_T = np.zeros(n_classes)
    n_F = np.zeros(n_classes)
    for i in range(len(ground_truth)):
        if ground_truth[i] == recognized[i]:
            n_T[ground_truth[i]] += 1
        else:
            n_F[ground_truth[i]] += 1
    return n_T, n_F


def test_eval_file_counts():
    rng = np.random.RandomState(1)
    gt = rng.randint(0, 6, size=123)
    recog = rng.randint(0, 6, size=117)
    for obs in [0.2, 0.3]:
        t, f = eval_file_counts(gt, recog, obs, 6)
        t0, f0 = ref_eval_file_oracle(gt, recog, obs, 6)
        np.testing.assert_array_equal(t, t0)
        np.testing.assert_array_equal(f, f0)


def test_moc_accumulator():
    rng = np.random.RandomState(2)
    acc = MoCAccumulator([0.1, 0.2, 0.3, 0.5], 6)
    gt = rng.randint(0, 6, size=200)
    pred = gt.copy()
    pred[100:] = rng.randint(0, 6, size=100)
    acc.add_video(gt, pred, obs_p=0.3)
    res = acc.results(0.3)
    assert set(res) == {"obs30_pred10", "obs30_pred20", "obs30_pred30", "obs30_pred50"}
    # perfect prediction over the observed window -> MoC high at short horizons
    assert 0.0 <= min(res.values()) <= max(res.values()) <= 1.0


def test_moc_perfect_prediction():
    gt = np.array([0] * 50 + [1] * 50)
    acc = MoCAccumulator([0.5], 3)
    acc.add_video(gt, gt, obs_p=0.2)
    assert moc_from_counts(acc.T[0], acc.F[0]) == 1.0
