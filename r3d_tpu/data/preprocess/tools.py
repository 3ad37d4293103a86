"""Data-prep CLI tools (reference L0 one-shot scripts).

Re-implements the observable outputs of:
- data/nturgbd-creategt.py:20-48 — per-video gt txt from class-coded folder
  names;
- data/nturgbd-createsplits.py:4-35 — random 60/25/15 train/val/test splits;
- data/utkinect-actionlabeltogt.py:12-35 — action-interval label files ->
  per-frame gt;
- data/avi2png.py:34-46 — video -> frame PNGs aligned to a target frame
  count (cv2-gated);
- data/darai-clip.py / data/basedataset_darai_gaze.py:169-186 — CLIP image
  features (transformers-gated) and gaze CSV -> normalized (x, y).

Run as ``python -m r3d_tpu.data.preprocess.tools <command> ...``.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def create_gt_from_class_dirs(
    frames_root: str, out_dir: str, class_of_video
) -> List[str]:
    """One gt txt per video directory: every frame gets the video's class
    (nturgbd-creategt.py semantics: label derived from the folder/file name)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for vid in sorted(os.listdir(frames_root)):
        vdir = os.path.join(frames_root, vid)
        if not os.path.isdir(vdir):
            continue
        n_frames = len([f for f in os.listdir(vdir) if not f.startswith(".")])
        label = class_of_video(vid)
        path = os.path.join(out_dir, vid + ".txt")
        with open(path, "w") as f:
            f.write("".join(f"{label}\n" for _ in range(n_frames)))
        written.append(path)
    return written


def create_splits(
    video_names: Sequence[str], out_dir: str,
    fractions: Tuple[float, float, float] = (0.6, 0.25, 0.15), seed: int = 0,
) -> Dict[str, List[str]]:
    """Random train/val/test split files (nturgbd-createsplits.py:4-35)."""
    rng = np.random.RandomState(seed)
    names = list(video_names)
    rng.shuffle(names)
    n = len(names)
    n_train = int(fractions[0] * n)
    n_val = int(fractions[1] * n)
    splits = {
        "train_split.txt": names[:n_train],
        "val_split.txt": names[n_train : n_train + n_val],
        "test_split.txt": names[n_train + n_val :],
    }
    os.makedirs(out_dir, exist_ok=True)
    for fname, vids in splits.items():
        with open(os.path.join(out_dir, fname), "w") as f:
            f.write("".join(v + "\n" for v in vids))
    return splits


def action_intervals_to_gt(
    intervals: Sequence[Tuple[str, int, int]], n_frames: int,
    background: str = "UNDEFINED",
) -> List[str]:
    """(action, start, end) intervals -> per-frame labels
    (utkinect-actionlabeltogt.py:12-35). End is inclusive."""
    labels = [background] * n_frames
    for action, start, end in intervals:
        for t in range(max(start, 0), min(end + 1, n_frames)):
            labels[t] = action
    return labels


def video_to_frames(
    video_path: str, out_dir: str, target_count: Optional[int] = None
) -> int:
    """Extract frames from a video file (avi2png.py:34-46), optionally
    subsampled/clipped to align with a depth-frame count. Needs cv2."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover - env gated
        raise RuntimeError("video_to_frames requires opencv (cv2)") from e
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame)
    cap.release()
    if target_count is not None and len(frames) > target_count:
        idx = np.linspace(0, len(frames) - 1, target_count).astype(int)
        frames = [frames[i] for i in idx]
    for i, frame in enumerate(frames):
        cv2.imwrite(os.path.join(out_dir, f"frame{i:05d}.png"), frame)
    return len(frames)


def gaze_csv_to_query(csv_path: str) -> np.ndarray:
    """Gaze CSV -> [N, 2] min-max-normalized (x, y) stream
    (basedataset_darai_gaze.py:169-186): the x/y pixel columns each normalize
    as ``(v - min) / (max - min)`` in float64 (the reference's pandas dtype),
    stack to [N, 2], and cast to float32 (torch.tensor(..., float32)).  The
    observation window is applied by the CALLER as ``[:int(obs_perc * N)]``
    of this raw stream — gaze is NOT subsampled by sample_rate and its length
    is unrelated to the frame count (reference :186-188)."""
    import csv

    xs: List[float] = []
    ys: List[float] = []
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        fx = [c for c in reader.fieldnames or [] if "x" in c.lower()]
        fy = [c for c in reader.fieldnames or [] if "y" in c.lower()]
        if not fx or not fy:
            raise ValueError(f"no gaze x/y columns in {csv_path}")
        for row in reader:
            try:
                xs.append(float(row[fx[0]]))
                ys.append(float(row[fy[0]]))
            except (ValueError, TypeError):
                continue
    if not xs:
        return np.zeros((0, 2), np.float32)
    x = np.array(xs, np.float64)
    y = np.array(ys, np.float64)
    x = (x - x.min()) / max(float(x.max() - x.min()), np.finfo(np.float64).tiny)
    y = (y - y.min()) / max(float(y.max() - y.min()), np.finfo(np.float64).tiny)
    return np.stack([x, y], axis=1).astype(np.float32)


def extract_clip_features(
    image_paths: Sequence[str], model=None, processor=None
) -> np.ndarray:
    """CLIP ViT-B/32 image features (darai-clip.py:12-40).

    ``model``/``processor`` inject a pre-built CLIP (tests use a tiny
    random-config model; production loads the pretrained checkpoint, which
    needs locally cached weights — no egress in this environment)."""
    try:
        from transformers import CLIPModel, CLIPProcessor
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env gated
        raise RuntimeError("extract_clip_features requires transformers+PIL") from e
    if model is None:
        model = CLIPModel.from_pretrained("openai/clip-vit-base-patch32")
    if processor is None:
        processor = CLIPProcessor.from_pretrained("openai/clip-vit-base-patch32")
    feats = []
    for p in image_paths:
        inputs = processor(images=Image.open(p), return_tensors="pt")
        feats.append(model.get_image_features(**inputs).detach().numpy()[0])
    return np.stack(feats)


def main(argv=None):  # pragma: no cover - thin CLI
    p = argparse.ArgumentParser(prog="r3d-preprocess")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("splits", help="create train/val/test split files")
    sp.add_argument("--videos", required=True, help="dir or file listing videos")
    sp.add_argument("--out", required=True)
    sp.add_argument("--seed", type=int, default=0)

    fp = sub.add_parser("frames", help="video -> frame PNGs")
    fp.add_argument("--video", required=True)
    fp.add_argument("--out", required=True)
    fp.add_argument("--count", type=int, default=None)

    ep = sub.add_parser(
        "embed", help="video -> {vid}.npy ResNet-50 features (fused ingest)"
    )
    ep.add_argument("--video", required=True)
    ep.add_argument("--out", required=True, help="output .npy path")
    ep.add_argument("--torch_ckpt", default=None,
                    help="torchvision resnet50 state_dict (.pth) to convert")
    ep.add_argument("--size", type=int, nargs=2, default=(224, 224))
    ep.add_argument("--batch", type=int, default=32)

    args = p.parse_args(argv)
    if args.cmd == "splits":
        if os.path.isdir(args.videos):
            names = sorted(os.listdir(args.videos))
        else:
            names = [l.strip() for l in open(args.videos) if l.strip()]
        create_splits(names, args.out, seed=args.seed)
    elif args.cmd == "frames":
        n = video_to_frames(args.video, args.out, args.count)
        print(f"wrote {n} frames")
    elif args.cmd == "embed":
        import jax

        from r3d_tpu.data.preprocess.resnet import (
            ResNet50Features,
            extract_video_features,
            load_torchvision_weights,
        )

        if args.torch_ckpt:
            import torch

            sd = torch.load(args.torch_ckpt, map_location="cpu")
            variables = load_torchvision_weights(
                {k: v.numpy() for k, v in sd.items()}
            )
        else:
            import jax.numpy as jnp

            print("WARNING: no --torch_ckpt; random-init features")
            model = ResNet50Features()
            variables = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
            )
        feats = extract_video_features(
            args.video, variables, target_hw=tuple(args.size),
            batch=args.batch, out_path=args.out,
        )
        print(f"wrote {feats.shape} -> {args.out}")


if __name__ == "__main__":
    main()
