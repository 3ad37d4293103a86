"""DARai multi-sequence on-disk layout vs the reference basedataset_darai_depth.

The oracle is the actual reference dataset class executed on a synthetic
multi-sequence tree (no copying — we run the reference and compare):
  - {base}_{seq}.npy / {base}_{seq}.txt sequence walking
    (reference data/basedataset_darai_depth.py:44-82)
  - camera->depth directory rewrite (:47-50,95-98)
  - depth frame-window alignment by gt image indices (:105-113)
"""

import os

import numpy as np
import pytest

from conftest import reference_on_path
from r3d_tpu.config import DataConfig
from r3d_tpu.data.datasets import VideoSource, build_loader


N_CLASS = 6  # 5 L2 actions + NONE
ACTIONS = {f"act{i}": i for i in range(5)}
QUERIES = {f"q{i}": i for i in range(3)}
PAD_IDX = N_CLASS + 1


@pytest.fixture(scope="module")
def darai_tree(tmp_path_factory):
    """datasets/darai with one RGB-feature dir named like a camera dir, a
    sibling depth_1 dir holding whole-video depth stacks, and per-sequence
    gt/feature files."""
    root = tmp_path_factory.mktemp("ds") / "darai"
    feat = root / "camera_1_fps_15"
    depth = root / "depth_1"
    gt = root / "groundTruth"
    splits = root / "splits"
    for d in (feat, depth, gt, splits):
        os.makedirs(d)
    rng = np.random.RandomState(0)

    def write_seq(base, seq, n_frames, frame_start):
        rows = []
        for t in range(n_frames):
            a = f"act{(t // 7) % 5}"
            q = f"q{t % 3}"
            rows.append(f"frames/img_{frame_start + t:04d}.png,{a},{q}")
        (gt / f"{base}_{seq}.txt").write_text("\n".join(rows) + "\n")
        np.save(feat / f"{base}_{seq}.npy", rng.randn(n_frames, 8).astype(np.float32))

    # vidA: two sequences at disjoint frame windows + one whole-video depth
    write_seq("vidA", 1, 60, frame_start=10)
    write_seq("vidA", 2, 45, frame_start=100)
    np.save(depth / "vidA_1.npy", rng.randn(160, 5, 4).astype(np.float32))

    # vidB: has gt+features but NO depth file -> contributes nothing
    write_seq("vidB", 1, 40, frame_start=0)

    # vidC: seq 1 ok; seq 2 gt exists with a single line (<= sample_rate)
    # -> walk stops at seq 2
    write_seq("vidC", 1, 30, frame_start=5)
    (gt / "vidC_2.txt").write_text("frames/img_0000.png,act0,q0\n")
    np.save(feat / "vidC_2.npy", rng.randn(1, 8).astype(np.float32))
    np.save(depth / "vidC_1.npy", rng.randn(64, 5, 4).astype(np.float32))

    (splits / "train_split.txt").write_text("vidA.txt\nvidB.txt\nvidC.txt\n")
    return root


def make_source(root, sample_rate=1):
    cfg = DataConfig(
        dataset="darai", data_root=str(root.parent), gt_format="csv",
        features_dir="camera_1_fps_15", depth_features_dir="camera_1_fps_15",
        multi_sequence=True, sample_rate=sample_rate,
        train_obs_percs=(0.2, 0.3, 0.5), seq_buckets=(64,), depth_shape=(5, 4),
    )
    return VideoSource(
        cfg, ["vidA.txt", "vidB.txt", "vidC.txt"], ACTIONS, N_CLASS, PAD_IDX,
        query_dict=QUERIES,
    )


def test_units_walk(darai_tree):
    src = make_source(darai_tree)
    assert src.units() == [("vidA.txt", 1), ("vidA.txt", 2), ("vidC.txt", 1)]


def test_depth_window_alignment(darai_tree):
    src = make_source(darai_tree)
    v = src.load_video("vidA.txt", seq=2)
    whole = np.load(darai_tree / "depth_1" / "vidA_1.npy")
    # gt image indices run 100..144 -> depth rows 100..144
    np.testing.assert_allclose(v["depth"], whole[100:145])
    assert v["features"].shape == (45, 8)


def test_loader_runs_on_multiseq(darai_tree):
    src = make_source(darai_tree)
    loader = build_loader(src, src.cfg, batch_size=4, n_query=8, mode="train",
                          shuffle=False)
    batch = next(iter(loader))
    assert batch["features"].shape == (4, 64, 8)
    assert batch["depth_features"].shape == (4, 64, 5, 4)


def test_device_cache_on_multiseq(darai_tree):
    """The HBM dataset cache must reproduce the host collate bit-for-bit on
    the multi-sequence layout (depth window alignment + query stream)."""
    import jax
    import jax.numpy as jnp

    from r3d_tpu.data.device_cache import assemble, cache_from_source
    from r3d_tpu.data.pipeline import pad_batch

    src = make_source(darai_tree)
    cache = cache_from_source(src, src.cfg, n_query=8)
    assert cache.n_views == 9  # 3 units x 3 obs percs

    units = src.units()
    table = [(u, o) for u in units for o in (0.2, 0.3, 0.5)]
    view_ids = np.array([0, 4, 8], np.int32)
    examples = [
        src.make_example(vid, o, src.cfg.sample_rate, 8, seq=seq)
        for (vid, seq), o in (table[i] for i in view_ids)
    ]
    host = pad_batch(examples, src.pad_idx, (64,), 8, with_depth=True,
                     with_query=True, query_pad_idx=len(QUERIES))
    dev = assemble(cache.data, jnp.asarray(view_ids), 64,
                   src.cfg.sample_rate, cache.pad_idx, cache.query_pad_idx)
    for k in host:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(dev[k])), host[k], err_msg=k
        )


def _import_ref_dataset():
    """Import the reference darai-depth dataset with torchvision stubbed
    (the module imports it at top level but the code paths we exercise never
    touch it; torchvision is not in this image). The stub is removed again
    right after the import — a lingering fake module breaks transformers'
    find_spec("torchvision") probing in other tests."""
    import sys
    import types

    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, "/root/reference")
    try:
        from data.basedataset_darai_depth import BaseDataset as RefDataset
    finally:
        if stubbed:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.models", None)

    return RefDataset


@pytest.mark.skipif(not reference_on_path(), reason="reference repo not mounted")
@pytest.mark.parametrize("sample_rate,obs_perc", [(1, 0.5), (2, 0.3)])
def test_item_parity_vs_reference(darai_tree, sample_rate, obs_perc):
    """Every (vid, seq) item must match the reference dataset bit-for-bit."""
    RefDataset = _import_ref_dataset()

    class Args:
        pass

    args = Args()
    args.sample_rate = sample_rate

    split_file = darai_tree / "splits" / "train_split.txt"
    ref = RefDataset(
        str(split_file), ACTIONS, str(darai_tree / "camera_1_fps_15"),
        str(darai_tree / "camera_1_fps_15"), str(darai_tree / "groundTruth"),
        PAD_IDX, N_CLASS, n_query=8, mode="test", obs_perc=obs_perc,
        args=args, query_dict=QUERIES,
    )
    src = make_source(darai_tree, sample_rate=sample_rate)

    ours_units = src.units()
    ref_units = [(v, s) for (v, s, _) in ref.all_sequences]
    assert ref_units == ours_units

    for i, (vid, seq) in enumerate(ours_units):
        ref_item = ref[i]
        ex = src.make_example(vid, obs_perc, sample_rate, 8, seq=seq)
        np.testing.assert_allclose(
            ref_item["features"].numpy(), ex.features, atol=1e-6
        )
        np.testing.assert_allclose(
            ref_item["depth_features"].numpy(), ex.depth_features, atol=1e-6
        )
        np.testing.assert_array_equal(ref_item["past_label"].numpy(), ex.past_label)
        np.testing.assert_array_equal(
            ref_item["trans_future_target"].numpy().astype(np.int64),
            ex.trans_future_target,
        )
        np.testing.assert_allclose(
            ref_item["trans_future_dur"].numpy(), ex.trans_future_dur, atol=1e-6
        )


@pytest.mark.skipif(not reference_on_path(), reason="reference repo not mounted")
def test_train_mode_sequence_table_matches(darai_tree):
    """Train-mode expansion (seq x obs 0.2/0.3/0.5) matches the reference."""
    RefDataset = _import_ref_dataset()

    class Args:
        pass

    args = Args()
    args.sample_rate = 1

    ref = RefDataset(
        str(darai_tree / "splits" / "train_split.txt"), ACTIONS,
        str(darai_tree / "camera_1_fps_15"), str(darai_tree / "camera_1_fps_15"),
        str(darai_tree / "groundTruth"), PAD_IDX, N_CLASS, n_query=8,
        mode="train", args=args, query_dict=QUERIES,
    )
    src = make_source(darai_tree)
    ours = [(v, s, o) for (v, s) in src.units()
            for o in src.cfg.train_obs_percs]
    assert sorted(ours) == sorted(ref.all_sequences)
