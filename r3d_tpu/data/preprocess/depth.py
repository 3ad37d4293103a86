"""Depth-stream preprocessing (reference data/*-preprocess-depth.py,
data/utkinect-xmltodepth.py, data/basedataset_utkinects.py:49-76).

- UTKinect: Kinect depth maps arrive as XML (<tag><width/><height/><data/>)
  -> parse, resize to half resolution, min-max normalize to [0, 255].
- NTU RGB+D: masked-depth PNGs -> [0, 1] min-max per frame
  (basedataset_nturgbd.py:42-52).

Parsing is pure numpy/xml.etree; resizing uses jax.image on the batch (one
jitted resize per sequence instead of per-frame cv2 calls).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kinect_xml_to_depth(file_path: str) -> np.ndarray:
    """Parse one Kinect XML depth frame -> [H, W] float array."""
    tree = ET.parse(file_path)
    root = tree.getroot()
    tag = os.path.basename(file_path).replace(".xml", "")
    node = root.find(tag)
    if node is None:
        raise ValueError(f"missing node {tag!r} in {file_path}")
    width = int(node.find("width").text)
    height = int(node.find("height").text)
    data = node.find("data")
    if data is None or not data.text:
        raise ValueError(f"empty depth data in {file_path}")
    values = np.fromstring(data.text.strip(), sep=" ")
    if values.size != width * height:
        raise ValueError(
            f"size mismatch: expected {width * height}, got {values.size}"
        )
    return values.reshape(height, width)


def normalize_depth_minmax(depth: np.ndarray, scale: float = 255.0) -> np.ndarray:
    """Min-max normalize to [0, scale] (utkinect-preprocess-depth.py:30-78)."""
    lo, hi = float(depth.min()), float(depth.max())
    if hi - lo < 1e-12:
        return np.zeros_like(depth, dtype=np.float32)
    return ((depth - lo) / (hi - lo) * scale).astype(np.float32)


def preprocess_depth_sequence(
    frames: np.ndarray,                    # [T, H, W]
    target_hw: Tuple[int, int] = (160, 120),
    normalize_scale: float = 255.0,
) -> np.ndarray:
    """Batch resize + per-frame min-max normalize, one jitted program."""

    @jax.jit
    def _run(x):
        y = jax.image.resize(
            x, (x.shape[0],) + tuple(target_hw), method="bilinear"
        )
        lo = jnp.min(y, axis=(1, 2), keepdims=True)
        hi = jnp.max(y, axis=(1, 2), keepdims=True)
        return jnp.where(
            hi - lo < 1e-12, 0.0, (y - lo) / (hi - lo) * normalize_scale
        )

    return np.array(_run(jnp.asarray(frames, jnp.float32)))
