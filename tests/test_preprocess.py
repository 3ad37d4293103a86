"""Preprocessing layer tests: ResNet-50 extractor, depth tools, data-prep CLIs."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3d_tpu.data.preprocess.resnet import (
    ResNet50Features,
    fused_preprocess_embed,
)
from r3d_tpu.data.preprocess.depth import (
    kinect_xml_to_depth,
    normalize_depth_minmax,
    preprocess_depth_sequence,
)
from r3d_tpu.data.preprocess.tools import (
    action_intervals_to_gt,
    create_splits,
    gaze_csv_to_query,
)


def test_resnet50_feature_shape():
    model = ResNet50Features()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 2048)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # torchvision resnet50 minus fc: ~23.5M params
    assert 23e6 < n_params < 24e6, n_params


def test_fused_preprocess_embed_runs():
    model = ResNet50Features()
    x = jnp.zeros((1, 48, 48, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    frames = np.random.RandomState(0).randint(0, 255, (2, 60, 80, 3), np.uint8)
    out = fused_preprocess_embed(variables, jnp.asarray(frames), target_hw=(48, 48))
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.array(out)))


def test_kinect_xml_roundtrip(tmp_path):
    h, w = 6, 8
    data = np.arange(h * w, dtype=np.float64).reshape(h, w)
    xml = (
        f"<root><frame0><width>{w}</width><height>{h}</height>"
        f"<data>{' '.join(str(v) for v in data.ravel())}</data></frame0></root>"
    )
    p = tmp_path / "frame0.xml"
    p.write_text(xml)
    out = kinect_xml_to_depth(str(p))
    np.testing.assert_array_equal(out, data)


def test_normalize_depth():
    d = np.array([[1.0, 2.0], [3.0, 5.0]])
    n = normalize_depth_minmax(d)
    assert n.min() == 0 and n.max() == 255
    assert normalize_depth_minmax(np.ones((2, 2))).max() == 0  # constant-safe


def test_depth_sequence_pipeline():
    frames = np.random.RandomState(0).rand(3, 32, 24).astype(np.float32)
    out = preprocess_depth_sequence(frames, target_hw=(16, 12))
    assert out.shape == (3, 16, 12)
    assert out.max() <= 255.0 + 1e-3 and out.min() >= 0.0


def test_create_splits(tmp_path):
    names = [f"v{i}" for i in range(20)]
    splits = create_splits(names, str(tmp_path), seed=1)
    lens = {k: len(v) for k, v in splits.items()}
    assert lens == {"train_split.txt": 12, "val_split.txt": 5, "test_split.txt": 3}
    all_names = sum(splits.values(), [])
    assert sorted(all_names) == sorted(names)
    assert (tmp_path / "train_split.txt").exists()


def test_action_intervals_to_gt():
    labels = action_intervals_to_gt([("walk", 2, 4), ("sit", 6, 7)], 10)
    assert labels == ["UNDEFINED"] * 2 + ["walk"] * 3 + ["UNDEFINED"] + ["sit"] * 2 + ["UNDEFINED"] * 2


def test_gaze_csv(tmp_path):
    p = tmp_path / "gaze.csv"
    p.write_text("gaze_x,gaze_y\n10,20\n20,40\n,\n30,60\n")
    g = gaze_csv_to_query(str(p), 5)
    assert g.shape == (5, 2)
    np.testing.assert_allclose(g[2], [1.0, 1.0])  # max-normalized
    np.testing.assert_allclose(g[3], g[2])        # padded with last
