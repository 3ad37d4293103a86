"""Measure the PyTorch-CPU reference's darai unsupervised-curriculum step.

The workload is one full train step of the gated composite loss
(train/train_unsupervised.py:294-362: focal L3 + temporal-cluster supcon
blended by the triangular warmup, plus cls/dur/seg gated by the
how-much-wrong correctness weight) at the darai shape (hidden 128, n_query
8, query_num 48, 2048-d features, sample_rate-15 sequences bucketed at 512).

The loop's committed model pairing is unrunnable (futr_unsupervised emits
[B,S,C] anticipation logits against [B,n_query] targets, COMPAT #18), and
futr_unsupervised_temp4 is TOO (its forward unpacks three values from
Transformer.forward, whose third return is commented out —
futr_unsupervised_temp4.py:112 vs extras/transformer.py:128).  The runnable
variant with n_query-slot anticipation logits AND an l3 head is
futr_unsupervised_temp2, so that is the measured model.  Hard-coded
``.to('cuda')`` call sites are patched to cpu (as in tests/torch_ref.py).
Writes baseline_cpu_unsup.json at the repo root.

Usage: python tools/measure_baseline_unsup.py [--steps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import torch


class Args:
    seg = True
    anticipate = True
    pos_emb = True
    input_type = "i3d_transcript"
    input_dim = 2048
    max_pos_len = 2000
    sample_rate = 15


def patch_cuda_free():
    """Redirect hard-coded ``.to('cuda')`` targets to cpu (the reference
    forwards contain several; tests/torch_ref.py does the same)."""
    if getattr(torch.Tensor, "_r3d_to_patched", False):
        return
    orig_to = torch.Tensor.to

    def patched_to(self, *args, **kwargs):
        args = tuple(
            "cpu" if (isinstance(a, (str, torch.device))
                      and str(a).startswith("cuda")) else a
            for a in args
        )
        if str(kwargs.get("device", "")).startswith("cuda"):
            kwargs["device"] = "cpu"
        return orig_to(self, *args, **kwargs)

    torch.Tensor.to = patched_to
    torch.Tensor._r3d_to_patched = True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seqlen", type=int, default=512)
    cli = p.parse_args()

    torch.manual_seed(0)
    patch_cuda_free()
    sys.path.insert(0, "/root/reference/train")  # train/ has no __init__.py
    from model.futr_unsupervised_temp2 import FUTR
    import utils as ref_utils
    from train_unsupervised import get_cluster_intervals, get_warmup_factor

    n_class = 17            # darai L2 actions (mapping_l2_changed)
    pad_idx = n_class + 1
    query_num = 48          # darai L3 vocab (futr_unsupervised_temp4.py:21)
    l3_pad, l3_excl = 47, 48
    B, S, Q = cli.batch, cli.seqlen, 8
    model = FUTR(
        n_class, 128, pad_idx, torch.device("cpu"), Args(), n_query=Q,
        n_head=8, num_encoder_layers=2, num_decoder_layers=1,
        query_num=query_num,
    )
    rs = np.random.RandomState(0)
    x = torch.randn(B, S, 2048)
    past = torch.randint(0, n_class, (B, S)).float()
    target = torch.randint(0, n_class, (B, Q)).float()
    dur = torch.rand(B, Q)
    mask = (dur != pad_idx).float()
    # piecewise-constant L3 stream (cluster intervals are non-trivial)
    q = np.zeros((B, S), np.int64)
    for b in range(B):
        t = 0
        while t < S:
            run = int(rs.randint(5, 12))
            q[b, t:t + run] = rs.randint(0, 40)
            t += run
    query_label = torch.tensor(q)
    opt = torch.optim.AdamW(model.parameters(), 1e-3, weight_decay=5e-3)
    crit = torch.nn.MSELoss(reduction="none")
    epoch = 15  # mid-ramp: both warmup branches contribute

    def train_step():
        opt.zero_grad()
        out = model((x, past), query_label, mode="train")
        l3 = out["l3"]
        loss_supcon = ref_utils.temporal_cluster_loss(
            l3, get_cluster_intervals(query_label))
        loss_l3, _, _, l3_correct = ref_utils.cal_performance_focal(
            l3.reshape(-1, l3.shape[-1]), query_label.reshape(-1),
            l3_pad, l3_excl, reference=None, target_ref=None)
        seg = out["seg"]
        loss_seg, _, _, l2_correct = ref_utils.cal_performance(
            seg.reshape(-1, seg.shape[-1]), past.reshape(-1), pad_idx)
        act = out["action"]
        loss_cls, _, _, _ = ref_utils.cal_performance(
            act.reshape(-1, act.shape[-1]), target.reshape(-1), pad_idx)
        nd = ref_utils.normalize_duration(out["duration"], mask)
        loss_dur = torch.sum(crit(nd, dur * mask)) / torch.sum(mask)
        hmw = torch.where(l3_correct & l2_correct,
                          torch.tensor(1.0), torch.tensor(5.0))
        wf = get_warmup_factor(epoch, start_epoch=0, peak_epoch=30,
                               end_epoch=60)
        losses = (
            (1 - 1 / hmw.mean()) * ((1 - wf) * loss_l3 + wf * loss_supcon)
            + (1 / hmw.mean()) * (loss_cls + loss_dur + loss_seg)
        )
        losses.backward()
        opt.step()

    def bench(fn, steps, warmup=1):
        for _ in range(warmup):
            fn()
        t0 = time.time()
        for _ in range(steps):
            fn()
        return (time.time() - t0) / steps

    model.train()
    t_train = bench(train_step, cli.steps)

    result = {
        "workload": {
            "B": B, "S": S, "input_dim": 2048, "hidden": 128,
            "enc": 2, "dec": 1, "n_query": Q, "query_num": query_num,
            "model": "futr_unsupervised_temp2 + gated composite "
                     "(train_unsupervised.py:294-362)",
        },
        "hardware": "cpu",
        "torch_version": torch.__version__,
        "train_step_sec": t_train,
        "train_clips_per_sec": B / t_train,
    }
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "baseline_cpu_unsup.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
