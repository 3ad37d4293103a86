"""Measure the PyTorch-CPU reference throughput (the BASELINE.md target).

Runs the actual reference model from /root/reference (imported, not copied)
on the UTKinect fusion workload: B=8, S=256, 2048-d RGB features + 160x120
raw depth, hidden 128 — forward+backward+AdamW step (train) and no-grad
forward (infer). Writes baseline_cpu.json at the repo root.

Usage: python tools/measure_baseline.py [--steps 5]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import torch


def patch_cuda_to_cpu():
    orig_to = torch.Tensor.to

    def _is_cuda(a):
        return (isinstance(a, str) and a.startswith("cuda")) or (
            isinstance(a, torch.device) and a.type == "cuda"
        )

    def patched(self, *args, **kw):
        args = tuple("cpu" if _is_cuda(a) else a for a in args)
        if _is_cuda(kw.get("device")):
            kw["device"] = "cpu"
        return orig_to(self, *args, **kw)

    torch.Tensor.to = patched


class Args:
    seg = True
    anticipate = True
    pos_emb = True
    input_type = "i3d_transcript"
    input_dim = 2048
    max_pos_len = 2000
    sample_rate = 1


def bench(fn, steps, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.time()
    for _ in range(steps):
        fn()
    return (time.time() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seqlen", type=int, default=256)
    args_cli = p.parse_args()

    patch_cuda_to_cpu()
    torch.manual_seed(0)
    from model.futr_safuser_batchnormalization import FUTR

    n_class = 12
    pad_idx = n_class + 1
    device = torch.device("cpu")
    model = FUTR(
        n_class, 128, pad_idx, device, Args(), n_query=8, n_head=8,
        num_encoder_layers=2, num_decoder_layers=1,
    )
    B, S = args_cli.batch, args_cli.seqlen
    x = torch.randn(B, S, 2048)
    depth = torch.randn(B, S, 160 * 120)
    labels = torch.randint(0, n_class, (B, S)).float()
    target = torch.randint(0, n_class, (B, 8))
    opt = torch.optim.AdamW(model.parameters(), 1e-3, weight_decay=5e-3)

    def train_step():
        opt.zero_grad()
        out = model((x, labels), depth, mode="train")
        loss = out["action"].float().logsumexp(-1).mean() + out["seg"].float().mean() \
            + out["duration"].float().mean()
        loss.backward()
        opt.step()

    model.train()
    t_train = bench(train_step, args_cli.steps)

    model.eval()

    def infer_step():
        with torch.no_grad():
            model(x, depth, mode="test")

    t_infer = bench(infer_step, args_cli.steps)

    result = {
        "workload": {
            "B": B, "S": S, "input_dim": 2048, "depth": [160, 120],
            "hidden": 128, "model": "futr_safuser_batchnormalization",
        },
        "hardware": "cpu",
        "torch_version": torch.__version__,
        "train_step_sec": t_train,
        "train_clips_per_sec": B / t_train,
        "infer_step_sec": t_infer,
        "infer_clips_per_sec": B / t_infer,
    }
    out_path = os.path.join(os.path.dirname(__file__), "..", "baseline_cpu.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
