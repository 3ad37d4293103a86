"""Offline LLM/VLM fine-grained labeling (reference train_llm.py flow).

The reference wires LLM labeling *inside* the transformer forward
(transformer.py:79-108, commented out — every API call would sit on the GPU
step). TPU-native design: labeling is an offline pass that writes L3 label
files next to the ground truth; training then consumes them as an ordinary
query stream (``query_mapping_file``), keeping the device hot loop pure.

    python -m r3d_tpu.cli.label --config darai --backend openai \
        --frames_root ./datasets/darai/frames --out ./datasets/darai/l3_llm

Requires a labeler backend (env OPENAI_API_KEY, or local LLaVA weights).
"""

from __future__ import annotations

import argparse
import os
from typing import List

from r3d_tpu.config import CONFIGS
from r3d_tpu.data.datasets import build_source
from r3d_tpu.utils.prompts import build_prompt


def label_dataset(config_name: str, backend: str, frames_root: str,
                  out_dir: str, split: str = "train_split.txt",
                  max_frames: int = 20, labeler=None,
                  data_root: str = None) -> List[str]:
    """``labeler`` injects a pre-built backend (anything with
    ``get_fine_grained_labels(frame_paths, prompt)``); by default one is
    constructed from ``backend`` (needs API keys / local weights)."""
    import dataclasses

    cfg = CONFIGS[config_name]
    data_cfg = cfg.data
    if data_root is not None:
        data_cfg = dataclasses.replace(data_cfg, data_root=data_root)
    source = build_source(data_cfg, split)
    if labeler is None:
        from r3d_tpu.models.llm import make_labeler

        labeler = make_labeler(backend)
    os.makedirs(out_dir, exist_ok=True)

    written = []
    for vid in source.vid_list:
        meta = source.load_meta(vid)
        coarse = meta["label_idx"]
        images = meta["images"]
        if not images:
            continue
        prompt = build_prompt(coarse[:max_frames].tolist(), min(len(images), max_frames))
        frame_paths = [os.path.join(frames_root, p) for p in images[:max_frames]]
        _, labels = labeler.get_fine_grained_labels(frame_paths, prompt)
        # extend to full length by repeating the windowed labels
        full = (labels * (len(images) // len(labels) + 1))[: len(images)]
        path = os.path.join(out_dir, vid.split("/")[-1])
        with open(path, "w") as f:
            for img, l2, l3 in zip(images, meta["labels"], full):
                f.write(f"{img},{l2},q{l3}\n")
        written.append(path)
    return written


def main(argv=None):  # pragma: no cover - needs API access
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="darai", choices=sorted(CONFIGS))
    p.add_argument("--backend", default="openai",
                   choices=["openai", "llava", "llama"])
    p.add_argument("--frames_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--split", default="train_split.txt")
    p.add_argument("--data_root", default=None)
    args = p.parse_args(argv)
    written = label_dataset(args.config, args.backend, args.frames_root,
                            args.out, args.split, data_root=args.data_root)
    print(f"labeled {len(written)} videos -> {args.out}")


if __name__ == "__main__":
    main()
