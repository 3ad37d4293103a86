"""On-disk dataset loader tests: VideoSource paths (ram vs native cache),
loader batches, and example parity with the pure-protocol builder."""

import os

import numpy as np
import pytest

from r3d_tpu.config import DataConfig
from r3d_tpu.data import native
from r3d_tpu.data.datasets import build_loader, build_source
from r3d_tpu.data.protocol import make_example


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds") / "utkinect"
    rng = np.random.RandomState(0)
    acts = [f"a{i}" for i in range(5)]
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts))
    )
    vids = []
    for v in range(4):
        L = int(rng.randint(40, 60))
        labels = [acts[int(x)] for x in (np.arange(L) // 9) % 5]
        feats = rng.randn(L, 12).astype(np.float32)
        depth = rng.randn(L, 6, 4).astype(np.float32)
        np.save(root / "features_img" / f"v{v}.npy", feats)
        np.save(root / "features_depth" / f"v{v}.npy", depth)
        with open(root / "groundTruth" / f"v{v}.txt", "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    (root / "splits" / "val_split.txt").write_text(vids[0] + "\n")
    return str(root.parent)


def make_cfg(disk_root):
    return DataConfig(
        dataset="utkinects", data_root=disk_root, seq_buckets=(64,),
        train_obs_percs=(0.3, 0.5), depth_shape=(6, 4),
    )


def test_source_and_loader(disk_dataset):
    cfg = make_cfg(disk_dataset)
    src = build_source(cfg, "train_split.txt")
    assert src.n_class == 6 and src.pad_idx == 7
    loader = build_loader(src, cfg, batch_size=4, n_query=8, mode="train",
                          shuffle=False)
    batch = next(iter(loader))
    assert batch["features"].shape == (4, 64, 12)
    assert batch["depth_features"].shape == (4, 64, 6, 4)
    assert batch["past_label"].max() <= src.pad_idx


def test_example_matches_string_protocol(disk_dataset):
    """The cached-index fast path must equal the string-based make_example."""
    cfg = make_cfg(disk_dataset)
    src = build_source(cfg, "train_split.txt")
    vid = src.vid_list[1]
    fast = src.make_example(vid, 0.5, 1, 8)
    v = src.load_video(vid)
    slow = make_example(
        v["features"], v["labels"], src.actions_dict, 0.5, 1, 8,
        src.pad_idx, src.n_class, depth_features=v["depth"],
    )
    np.testing.assert_allclose(fast.features, slow.features)
    np.testing.assert_array_equal(fast.past_label, slow.past_label)
    np.testing.assert_array_equal(fast.trans_future_target, slow.trans_future_target)
    np.testing.assert_allclose(fast.trans_future_dur, slow.trans_future_dur)
    np.testing.assert_allclose(fast.depth_features, slow.depth_features)


@pytest.mark.skipif(not native.available(), reason="native loader unavailable")
def test_native_cache_matches_ram(disk_dataset):
    cfg = make_cfg(disk_dataset)
    ram = build_source(cfg, "train_split.txt")
    nat = build_source(cfg, "train_split.txt")
    nat.cache = "native"
    for vid in ram.vid_list:
        for obs in (0.3, 0.5):
            a = ram.make_example(vid, obs, 1, 8)
            b = nat.make_example(vid, obs, 1, 8)
            np.testing.assert_allclose(a.features, b.features, rtol=1e-6)
            np.testing.assert_array_equal(a.past_label, b.past_label)
            np.testing.assert_allclose(
                a.depth_features, b.depth_features, rtol=1e-6
            )
            np.testing.assert_array_equal(
                a.trans_future_target, b.trans_future_target
            )
