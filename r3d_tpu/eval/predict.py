"""Prediction / MoC evaluation driver.

Re-implements the protocol every reference ``evaluation/predict_*.py``
shares (predict_utkinects.py:215-392): per video, slice the observed prefix,
run test-mode inference, decode the anticipated frames, then accumulate MoC
counters at the eval horizons, plus the secondary anticipation/segmentation
accuracies.

Unlike the reference (one hard-coded path per dataset + per-video python
loops), this driver takes a VideoSource and batches videos of the same
bucket through one jitted forward.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from r3d_tpu.config import Config
from r3d_tpu.data.datasets import VideoSource
from r3d_tpu.data.pipeline import bucket_length
from r3d_tpu.eval.decode import decode_anticipation
from r3d_tpu.eval.moc import MoCAccumulator


def weighted_anticipation_accuracy(
    pred_actions: np.ndarray,     # [Q] decoded transcript actions
    future_labels: np.ndarray,    # [T_future] gt labels (subsampled window)
    last_observed: int,
    exclude_class_idx: Optional[int] = None,
    weight_same: float = 1.0,
    weight_different: float = 10.0,
) -> float:
    """predict_utkinects.py:105-137: compare the first min(Q, T) anticipated
    transcript entries against the future gt frames, 10x weight when the
    first future label differs from the last observed one."""
    weight = weight_different if (len(future_labels) and future_labels[0] != last_observed) else weight_same
    length = min(len(future_labels), len(pred_actions))
    correct = 0.0
    total = 0.0
    for i in range(length):
        gt = future_labels[i]
        if exclude_class_idx is not None and gt == exclude_class_idx:
            continue
        if pred_actions[i] == gt:
            correct += weight
        total += weight
    return correct / total if total > 0 else 0.0


class Predictor:
    def __init__(self, config: Config, model, n_class: int):
        self.config = config
        self.model = model
        self.n_class = n_class
        self._jit_forward = jax.jit(
            lambda variables, *args: model.apply(variables, *args, train=False)
        )

    def predict(
        self,
        variables: Dict,
        source: VideoSource,
        obs_p: float,
        log: Callable = print,
    ) -> Dict[str, float]:
        cfg = self.config
        sample_rate = cfg.data.sample_rate
        none_idx = self.n_class - 1
        n_query = cfg.model.n_query
        acc = MoCAccumulator(cfg.eval.eval_p, len(source.actions_dict))
        ant_acc_total, seg_acc_total, n_vids = 0.0, 0.0, 0

        for vid in source.vid_list:
            v = source.load_video(vid)
            labels_idx = v["label_idx"]
            vid_len = len(labels_idx)
            if cfg.eval.max_eval_len and vid_len > cfg.eval.max_eval_len:
                continue  # predict_breakfast.py:116-117
            past_len = int(obs_p * vid_len)
            future_len = int(cfg.eval.pred_p * vid_len)
            if past_len < 1:
                continue

            feats = v["features"][:past_len][::sample_rate]
            real_s = feats.shape[0]
            # pad the observed window to a bucket so every video/obs-ratio
            # combination reuses one compiled shape; the key-padding mask
            # makes this numerically exact (softmax keys restricted to real
            # frames), unlike the reference's per-length graphs.
            S = bucket_length(real_s, cfg.data.seq_buckets)
            pad = S - real_s
            feats = np.pad(feats, ((0, pad),) + ((0, 0),) * (feats.ndim - 1))
            mask = np.zeros((1, S), dtype=bool)
            mask[0, real_s:] = True
            inputs = [jnp.asarray(feats, jnp.float32)[None]]
            if "depth" in v:
                depth = v["depth"][:past_len][::sample_rate]
                depth = np.pad(depth, ((0, pad),) + ((0, 0),) * (depth.ndim - 1))
                inputs.append(jnp.asarray(depth, jnp.float32)[None])
            inputs.append(jnp.asarray(mask))

            outputs = self._jit_forward(variables, *inputs)
            action_logits = np.array(outputs["action"][0], np.float32)
            durations = np.array(outputs["duration"][0], np.float32)

            # frame-level decode over the future window
            frames, _ = decode_anticipation(
                action_logits, durations, future_len, none_idx
            )
            prediction = np.concatenate([labels_idx[:past_len], frames])
            acc.add_video(labels_idx, prediction, obs_p)

            # secondary metrics (predict_utkinects.py:305-328)
            future_sub = labels_idx[past_len : past_len + future_len][::sample_rate]
            pred_actions = np.argmax(action_logits, axis=-1)
            last_obs = labels_idx[past_len - 1] if past_len else none_idx
            ant_acc_total += weighted_anticipation_accuracy(
                pred_actions, future_sub, last_obs,
                exclude_class_idx=cfg.train.exclude_class_idx,
            )
            if "seg" in outputs:
                seg_pred = np.argmax(np.array(outputs["seg"][0]), axis=-1)
                past_sub = labels_idx[:past_len][::sample_rate]
                n = min(len(seg_pred), len(past_sub))
                if n:
                    seg_acc_total += float(np.mean(seg_pred[:n] == past_sub[:n]))
            n_vids += 1

        results = acc.results(obs_p)
        acc.print_results(obs_p)
        results["ant_acc"] = ant_acc_total / max(n_vids, 1)
        results["seg_acc"] = seg_acc_total / max(n_vids, 1)
        return results
