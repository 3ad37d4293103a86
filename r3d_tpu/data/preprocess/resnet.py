"""ResNet-50 frame-feature extractor (flax) + fused preprocessing.

The reference extracts per-frame 2048-d features with a frozen torchvision
ResNet-50 minus its fc head, one frame at a time on CPU/GPU
(data/utkinect-imgpreprocess.py:10-48, data/preprocess2.py:12-30).  The
TPU-native path is one jitted program per frame batch:

    uint8 frames -> resize -> ImageNet normalize -> ResNet-50 -> [N, 2048]

so resize/normalize fuse into the first convolution's input pipeline and the
whole extractor runs on the MXU in bfloat16.

Weights: torchvision's pretrained checkpoint converts via
``load_torchvision_weights`` when torch + a local checkpoint are available
(this image has no egress, so downloading is gated; random init otherwise).
The conversion + architecture are numerically validated against a
torchvision-layout torch oracle (tests/test_preprocess.py::
test_resnet50_conversion_parity_vs_torch, atol 1e-4) — pointing the CLI at a
real torchvision checkpoint reproduces reference features.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        bn = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        conv = functools.partial(nn.Conv, use_bias=False, dtype=self.dtype)
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = conv(self.features, (3, 3), strides=(self.stride, self.stride),
                 padding=[(1, 1), (1, 1)], name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = bn(name="bn3")(y)
        if self.downsample:
            residual = conv(
                self.features * 4, (1, 1), strides=(self.stride, self.stride),
                name="downsample_conv",
            )(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Features(nn.Module):
    """ResNet-50 up to global average pool -> [N, 2048]."""

    dtype: jnp.dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = functools.partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(bn(name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** i)
            for j in range(n_blocks):
                stride = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(
                    features, stride=stride, downsample=(j == 0),
                    dtype=self.dtype, name=f"layer{i + 1}_block{j}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> [N, 2048]


def fused_preprocess_embed(
    variables: Any,
    frames: jnp.ndarray,          # [N, H, W, 3] uint8
    target_hw: Tuple[int, int] = (224, 224),
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """decode(host) -> resize -> normalize -> embed, one XLA program."""
    x = frames.astype(jnp.float32) / 255.0
    x = jax.image.resize(
        x, (x.shape[0],) + tuple(target_hw) + (3,), method="bilinear"
    )
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    model = ResNet50Features(dtype=dtype)
    return model.apply(variables, x.astype(dtype), train=False).astype(jnp.float32)


def make_feature_extractor(
    variables: Any, target_hw: Tuple[int, int] = (224, 224),
    dtype: jnp.dtype = jnp.bfloat16,
) -> Callable[[np.ndarray], np.ndarray]:
    fn = jax.jit(
        functools.partial(fused_preprocess_embed, target_hw=target_hw, dtype=dtype)
    )
    return lambda frames: np.array(fn(variables, jnp.asarray(frames)))


def extract_video_features(
    video_path: str,
    variables: Any,
    target_hw: Tuple[int, int] = (224, 224),
    batch: int = 32,
    dtype: jnp.dtype = jnp.bfloat16,
    out_path: Optional[str] = None,
) -> np.ndarray:
    """Video file -> [T, 2048] features in ONE compiled device program per
    frame batch (the north-star replacement for the reference's
    avi2png.py:34-46 -> png -> per-frame torch pipeline, reference
    data/utkinect-imgpreprocess.py:99-114).

    Decode is the only host stage (video codecs don't exist in XLA); frames
    stream through the jitted resize->normalize->ResNet program in
    fixed-size batches (static shapes; the tail batch pads and trims), so
    the device never waits on per-frame Python. Writes ``{out_path}`` as the
    reference's ``{vid}.npy`` when given."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover - env gated
        raise RuntimeError("extract_video_features requires opencv (cv2)") from e

    fn = jax.jit(
        functools.partial(fused_preprocess_embed, target_hw=target_hw, dtype=dtype)
    )
    cap = cv2.VideoCapture(video_path)
    feats = []
    buf: list = []

    def flush():
        n = len(buf)
        if not n:
            return
        arr = np.stack(buf, axis=0)
        if n < batch:  # static shapes: pad the tail batch, trim the output
            arr = np.concatenate(
                [arr, np.zeros((batch - n,) + arr.shape[1:], arr.dtype)]
            )
        feats.append(np.array(fn(variables, jnp.asarray(arr)))[:n])
        buf.clear()

    while True:
        ok, frame = cap.read()
        if not ok:
            break
        buf.append(frame[:, :, ::-1])  # BGR -> RGB
        if len(buf) == batch:
            flush()
    cap.release()
    flush()
    out = (
        np.concatenate(feats, axis=0)
        if feats
        else np.zeros((0, 2048), np.float32)
    )
    if out_path is not None:
        np.save(out_path, out)
    return out


def load_torchvision_weights(state_dict) -> Any:
    """torchvision resnet50 state_dict -> flax variables for ResNet50Features.

    Accepts an already-loaded dict (so callers can torch.load a local file);
    conv kernels transpose OIHW -> HWIO.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    def conv(path, prefix):
        w = np.asarray(state_dict[prefix + ".weight"])
        put(params, path + ("kernel",), np.transpose(w, (2, 3, 1, 0)))

    def bn(path, prefix):
        put(params, path + ("scale",), np.asarray(state_dict[prefix + ".weight"]))
        put(params, path + ("bias",), np.asarray(state_dict[prefix + ".bias"]))
        put(batch_stats, path + ("mean",), np.asarray(state_dict[prefix + ".running_mean"]))
        put(batch_stats, path + ("var",), np.asarray(state_dict[prefix + ".running_var"]))

    conv(("conv1",), "conv1")
    bn(("bn1",), "bn1")
    stage_sizes = (3, 4, 6, 3)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            name = f"layer{i + 1}_block{j}"
            t = f"layer{i + 1}.{j}"
            for c in (1, 2, 3):
                conv((name, f"conv{c}"), f"{t}.conv{c}")
                bn((name, f"bn{c}"), f"{t}.bn{c}")
            if j == 0:
                conv((name, "downsample_conv"), f"{t}.downsample.0")
                bn((name, "downsample_bn"), f"{t}.downsample.1")
    return {"params": params, "batch_stats": batch_stats}
