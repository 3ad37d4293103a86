"""Raw-frame ablation loader vs the reference basedataset_utkinects_raw
(jpg folders resized /255 + per-frame Kinect-XML depth, :80-130)."""

import os

import numpy as np
import pytest

from conftest import reference_on_path

from r3d_tpu.config import DataConfig
from r3d_tpu.data.datasets import VideoSource

cv2 = pytest.importorskip("cv2")

N_CLASS = 5
ACTIONS = {f"a{i}": i for i in range(4)}
PAD_IDX = N_CLASS + 1
W, H = 32, 24  # raw_frame_wh (cv2 order: width, height)


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds") / "utkinect"
    rng = np.random.RandomState(0)
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d)
    vids = []
    for v in range(2):
        L = 14
        img_dir = root / "features_img" / f"v{v}"
        depth_dir = root / "features_depth" / f"v{v}"
        os.makedirs(img_dir), os.makedirs(depth_dir)
        rows = []
        for t in range(L):
            img = rng.randint(0, 255, (40, 52, 3), np.uint8)
            cv2.imwrite(str(img_dir / f"frame{t}.jpg"), img)
            d = rng.randint(0, 1000, (6, 8))
            tag = f"depth{t}"
            (depth_dir / f"{tag}.xml").write_text(
                f"<root><{tag}><width>8</width><height>6</height>"
                f"<data>{' '.join(str(int(x)) for x in d.ravel())}</data>"
                f"</{tag}></root>"
            )
            rows.append(f"img_{t:03d}.png,a{t % 4},q0")
        (root / "groundTruth" / f"v{v}.txt").write_text("\n".join(rows) + "\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    return root


def make_source(root):
    cfg = DataConfig(
        dataset="utkinects", data_root=str(root.parent), raw_frames=True,
        raw_frame_wh=(W, H), seq_buckets=(16,), sample_rate=1,
    )
    return VideoSource(cfg, ["v0.txt", "v1.txt"], ACTIONS, N_CLASS, PAD_IDX)


def test_raw_video_shapes(raw_tree):
    src = make_source(raw_tree)
    v = src.load_video("v0.txt")
    assert v["features"].shape == (14, H, W, 3)
    assert v["features"].max() <= 1.0
    # depth: reference half-resize with swapped cv2 dsize -> (w//2, h//2)
    assert v["depth"].shape == (14, 4, 3)
    assert v["depth"].max() <= 255
    ex = src.make_example("v0.txt", 0.5, 1, 8)
    assert ex.features.shape == (7, H, W, 3)
    assert ex.depth_features.shape == (7, 4, 3)


@pytest.mark.skipif(not reference_on_path(), reason="reference not mounted")
def test_raw_item_parity_vs_reference(raw_tree):
    import tests.torch_ref  # noqa: F401

    import sys

    sys.path.insert(0, "/root/reference")
    from data.basedataset_utkinects_raw import BaseDataset as RefRaw

    class Args:
        sample_rate = 1

    # the reference hard-codes resize (224,168); monkeypatch-free comparison:
    # run it on our tree and compare against a source configured at the same
    # (224,168) size
    ref = RefRaw(
        ["v0.txt", "v1.txt"], ACTIONS, str(raw_tree / "features_img"),
        str(raw_tree / "features_depth"), str(raw_tree / "groundTruth"),
        PAD_IDX, N_CLASS, n_query=8, mode="test", obs_perc=0.5, args=Args(),
    )
    cfg = DataConfig(
        dataset="utkinects", data_root=str(raw_tree.parent), raw_frames=True,
        raw_frame_wh=(224, 168), seq_buckets=(16,), sample_rate=1,
    )
    src = VideoSource(cfg, ["v0.txt", "v1.txt"], ACTIONS, N_CLASS, PAD_IDX)

    for i, vid in enumerate(["v0.txt", "v1.txt"]):
        ref_item = ref[i]
        ex = src.make_example(vid, 0.5, 1, 8)
        np.testing.assert_allclose(
            ref_item["features"].numpy(), ex.features, atol=1e-6
        )
        np.testing.assert_allclose(
            ref_item["depth_features"].numpy(), ex.depth_features, atol=1e-6
        )
        np.testing.assert_array_equal(
            ref_item["past_label"].numpy(), ex.past_label
        )
        np.testing.assert_array_equal(
            ref_item["trans_future_target"].numpy().astype(np.int64),
            ex.trans_future_target,
        )
        np.testing.assert_allclose(
            ref_item["trans_future_dur"].numpy(), ex.trans_future_dur,
            atol=1e-6,
        )
