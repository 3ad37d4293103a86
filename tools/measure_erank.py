"""Effective-rank regularizer A/B at the flagship fusion shape.

Executed evidence for the north star's third axis (the paper claim at
reference README.md:13-14: rank-targeted fusion counters multi-modal
representation collapse).  Builds a synthetic COLLAPSED regime — every
modality stream confined to a low-rank subspace — and trains the flagship
``futr_fusion_bn`` twice from identical inits on identical batches, in ONE
process:

- arm ``w0``: erank_weight = 0 (analysis curve only)
- arm ``reg``: erank_weight > 0 toward an erank_target

Records per-epoch eval-side erank + class-accuracy curves to JSONL (and a
PNG when matplotlib is present), prints a summary.  The CPU-sized version
of this experiment is pinned by tests/test_erank_regularizer.py.

Usage:  python tools/measure_erank.py [--cpu] [--epochs 30]
        [--weight 0.2] [--target 64] [--outdir save_dir/erank_ab]
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--weight", type=float, default=0.2)
    ap.add_argument("--target", type=float, default=64.0)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--input_dim", type=int, default=2048)
    ap.add_argument("--depth_hw", type=int, nargs=2, default=(48, 40))
    ap.add_argument("--rank_f", type=int, default=8)
    ap.add_argument("--rank_d", type=int, default=4)
    ap.add_argument("--n_videos", type=int, default=16)
    ap.add_argument("--outdir", default="save_dir/erank_ab")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from r3d_tpu.config import DataConfig, ModelConfig, TrainConfig, get_config
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.train.loop import Trainer

    src = SyntheticSource(
        n_videos=args.n_videos, n_actions=5, vid_len_range=(120, 250),
        input_dim=args.input_dim, depth_shape=tuple(args.depth_hw), seed=0,
    )
    # collapse: project every stream onto a shared low-rank subspace
    rng = np.random.RandomState(123)
    Bf = np.linalg.qr(rng.randn(args.input_dim, args.rank_f))[0]
    Pf = (Bf @ Bf.T).astype(np.float32)
    Dd = int(np.prod(args.depth_hw))
    Bd = np.linalg.qr(rng.randn(Dd, args.rank_d))[0]
    Pd = (Bd @ Bd.T).astype(np.float32)
    for v in src.videos:
        v["features"] = (v["features"] @ Pf).astype(np.float32)
        flat = v["depth"].reshape(len(v["depth"]), -1) @ Pd
        v["depth"] = flat.reshape(v["depth"].shape).astype(np.float32)

    def make_loader():
        fn, n = src.make_example_fn(
            obs_percs=(0.2, 0.3, 0.5), sample_rate=1, n_query=8
        )
        return BucketedLoader(
            num_examples=n, make_example_fn=fn, batch_size=8,
            pad_idx=src.pad_idx, buckets=(256,), n_query=8, with_depth=True,
            seed=0,
        )

    def run_arm(name, weight, target):
        cfg = get_config("synthetic").replace(
            model=ModelConfig(
                model="futr_fusion_bn", hidden_dim=args.hidden, n_head=8,
                n_encoder_layers=1, n_decoder_layers=1, n_query=8,
                input_dim=args.input_dim, max_pos_len=256,
                compute_dtype="float32", dropout=0.1,
                erank_weight=weight, erank_target=target, log_erank=True,
            ),
            train=TrainConfig(
                loop="proposed_depth", batch_size=8, epochs=args.epochs,
                warmup_epochs=1, lr=args.lr, min_train_batch=0,
            ),
            data=DataConfig(dataset="synthetic", seq_buckets=(256,)),
        )
        loader = make_loader()
        trainer = Trainer(cfg, src.n_class)
        example = next(iter(loader))
        state = trainer.init_state(
            jax.random.PRNGKey(0), example, steps_per_epoch=len(loader)
        )
        step = trainer.make_train_step()
        eval_step = trainer.make_eval_step()
        key = jax.random.PRNGKey(1)

        def evaluate(state):
            m = eval_step(state, example)
            return (
                float(m["erank"]),
                float(m["cls_correct"]) / max(float(m["cls_total"]), 1.0),
            )

        curve = [evaluate(state)]
        for epoch in range(args.epochs):
            for batch in loader:
                key, r = jax.random.split(key)
                state, _ = step(state, batch, r, epoch)
            curve.append(evaluate(state))
            print(f"[{name}] epoch {epoch}: erank {curve[-1][0]:.2f} "
                  f"acc {curve[-1][1]:.3f}", flush=True)
        return curve

    curves = {
        "w0": run_arm("w0", 0.0, None),
        "reg": run_arm("reg", args.weight, args.target),
    }

    os.makedirs(args.outdir, exist_ok=True)
    jsonl = os.path.join(args.outdir, "erank_ab.jsonl")
    with open(jsonl, "w") as f:
        for arm, curve in curves.items():
            for i, (er, acc) in enumerate(curve):
                f.write(json.dumps({
                    "arm": arm, "epoch": i, "val_erank": er, "val_acc": acc,
                    "weight": 0.0 if arm == "w0" else args.weight,
                    "target": None if arm == "w0" else args.target,
                }) + "\n")
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
        for arm, curve in curves.items():
            ax1.plot([c[0] for c in curve], label=arm)
            ax2.plot([c[1] for c in curve], label=arm)
        ax1.axhline(args.target, ls="--", c="gray", label="target")
        ax1.set_title("val effective rank"); ax1.set_xlabel("epoch")
        ax2.set_title("val class accuracy"); ax2.set_xlabel("epoch")
        ax1.legend(); ax2.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.outdir, "erank_ab.png"), dpi=120)
    except Exception as e:  # matplotlib optional
        print("plot skipped:", e)

    a, b = curves["w0"], curves["reg"]
    print(json.dumps({
        "start_erank": a[0][0],
        "w0_final_erank": a[-1][0], "reg_final_erank": b[-1][0],
        "w0_final_acc": a[-1][1], "reg_final_acc": b[-1][1],
        "target": args.target, "weight": args.weight,
        "epochs": args.epochs, "curves": jsonl,
    }))


if __name__ == "__main__":
    main()
