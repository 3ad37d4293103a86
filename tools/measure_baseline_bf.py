"""Measure the PyTorch-CPU reference at the PUBLISHED Breakfast shape
(scripts/bf_train.sh:2-6: batch 16, hidden 128, enc 2, dec 1, max_pos_len
2000; opts.py:87 n_query 8) — the third BASELINE workload next to the
UTKinect fusion and 50salads shapes.

Runs the actual reference model/futr.py (imported, not copied) for full
train steps (forward + seg/cls/dur losses + backward + AdamW) and no-grad
inference. Writes baseline_cpu_bf.json at the repo root.

Usage: python tools/measure_baseline_bf.py [--steps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch


class Args:
    seg = True
    anticipate = True
    pos_emb = True
    input_type = "i3d_transcript"
    input_dim = 2048
    max_pos_len = 2000
    sample_rate = 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seqlen", type=int, default=2000)
    cli = p.parse_args()

    torch.manual_seed(0)
    from model.futr import FUTR
    import utils as ref_utils

    n_class = 48  # Breakfast coarse actions
    pad_idx = n_class + 1
    B, S, Q = cli.batch, cli.seqlen, 8
    model = FUTR(
        n_class, 128, pad_idx, torch.device("cpu"), Args(), n_query=Q,
        n_head=8, num_encoder_layers=2, num_decoder_layers=1,
    )
    x = torch.randn(B, S, 2048)
    labels = torch.randint(0, n_class - 1, (B, S)).float()
    target = torch.randint(0, n_class, (B, Q)).float()
    dur = torch.rand(B, Q)
    mask = (dur != pad_idx).float()
    opt = torch.optim.AdamW(model.parameters(), 1e-3, weight_decay=5e-3)
    crit = torch.nn.MSELoss(reduction="none")

    def train_step():
        opt.zero_grad()
        out = model((x, labels), mode="train")
        seg = out["seg"].reshape(-1, out["seg"].shape[-1])
        l_seg, _, _, _ = ref_utils.cal_performance(
            seg, labels.reshape(-1).long().float(), pad_idx)
        act = out["action"].reshape(-1, out["action"].shape[-1])
        l_cls, _, _, _ = ref_utils.cal_performance(
            act, target.reshape(-1), pad_idx)
        nd = ref_utils.normalize_duration(out["duration"], mask)
        l_dur = torch.sum(crit(nd, dur * mask)) / torch.sum(mask)
        (l_seg + l_cls + l_dur).backward()
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

    model.eval()

    def infer_step():
        with torch.no_grad():
            model(x, mode="test")

    t_infer = bench(infer_step, cli.steps)

    result = {
        "workload": {
            "B": B, "S": S, "input_dim": 2048, "hidden": 128,
            "enc": 2, "dec": 1, "n_query": Q,
            "model": "futr (breakfast shape, scripts/bf_train.sh)",
        },
        "hardware": "cpu",
        "torch_version": torch.__version__,
        "train_step_sec": t_train,
        "train_clips_per_sec": B / t_train,
        "infer_step_sec": t_infer,
        "infer_clips_per_sec": B / t_infer,
    }
    out_path = os.path.join(
        os.path.dirname(__file__), "..", "baseline_cpu_bf.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
