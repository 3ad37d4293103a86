"""Plot training curves (incl. the effective-rank analysis curve) from a
metrics JSONL written by the train loop.

Usage: python tools/plot_metrics.py save_dir/.../seed_1_metrics.jsonl out.png
"""

import json
import sys


def load(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def plot(records, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = [r.get("epoch", i) for i, r in enumerate(records)]
    panels = [
        ("loss", ["train_loss", "val_loss"]),
        ("accuracy", ["train_acc", "val_acc"]),
        ("effective rank", ["val_erank", "train_erank"]),
        ("throughput (clips/s)", ["clips_per_sec"]),
    ]
    fig, axes = plt.subplots(1, len(panels), figsize=(5 * len(panels), 4))
    for ax, (title, keys) in zip(axes, panels):
        drawn = False
        for k in keys:
            ys = [r.get(k) for r in records]
            if any(y is not None for y in ys):
                ax.plot([e for e, y in zip(epochs, ys) if y is not None],
                        [y for y in ys if y is not None], label=k)
                drawn = True
        ax.set_title(title)
        ax.set_xlabel("epoch")
        if drawn:
            ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    plot(load(sys.argv[1]), sys.argv[2] if len(sys.argv) > 2 else "metrics.png")
