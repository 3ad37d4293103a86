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


def test_l1_relabel_50salads(tmp_path):
    """proposed-50salads: L2 gt relabels to L1 targets; L2 rides as query."""
    from r3d_tpu.data.salads50 import relabel_sequence

    root = tmp_path / "50salads"
    for d in ["features", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    l2 = ["cut_tomato_prep", "cut_tomato_core", "add_oil_prep", "serve_salad_onto_plate_core"]
    l1 = relabel_sequence(l2)
    assert l1 == ["cut_and_mix_ingredients", "cut_and_mix_ingredients",
                  "prepare_dressing", "serve_salad"]
    (root / "mapping_l1.txt").write_text(
        "0 cut_and_mix_ingredients\n1 prepare_dressing\n2 serve_salad\n"
    )
    (root / "mapping_l2.txt").write_text(
        "".join(f"{i} {n}\n" for i, n in enumerate(sorted(set(l2))))
    )
    labels = l2 * 10
    feats = np.random.RandomState(0).randn(12, len(labels)).astype(np.float32)
    np.save(root / "features" / "v0.npy", feats)  # [C, S]
    (root / "groundTruth" / "v0.txt").write_text("".join(x + "\n" for x in labels))
    (root / "splits" / "train.split1.bundle").write_text("v0.txt\n")

    cfg = DataConfig(
        dataset="50salads", data_root=str(tmp_path.parent / tmp_path.name),
        mapping_file="mapping_l1.txt", query_mapping_file="mapping_l2.txt",
        l1_relabel=True, features_dir="features", gt_format="plain",
        depth_features_dir=None,
        features_transposed=True, train_split="train.split{split}.bundle",
        seq_buckets=(64,),
    )
    cfg = DataConfig(**{**cfg.__dict__, "data_root": str(tmp_path)})
    src = build_source(cfg, "train.split1.bundle")
    meta = src.load_meta("v0.txt")
    # targets are L1 ids; query stream carries L2 ids
    assert set(np.unique(meta["label_idx"])) <= {0, 1, 2}
    assert meta["query_idx"] is not None
    ex = src.make_example("v0.txt", 0.5, 1, 8)
    assert ex.features.shape[1] == 12  # transposed load
    assert ex.query_label is not None


def test_normalize_depth_load(disk_dataset):
    """NTU-style whole-stack depth min-max at load (basedataset_nturgbd.py:42-52)."""
    import dataclasses

    cfg = dataclasses.replace(make_cfg(disk_dataset), normalize_depth=True)
    src = build_source(cfg, "train_split.txt")
    v = src.load_video(src.vid_list[0])
    assert v["depth"].dtype == np.uint8
    assert v["depth"].min() == 0 and v["depth"].max() == 255


def test_gaze_modality_end_to_end(tmp_path):
    """Gaze CSVs -> [S,2] query stream -> futr_gaze train step."""
    import dataclasses
    import jax

    from r3d_tpu.config import get_config, ModelConfig, TrainConfig
    from r3d_tpu.train.loop import Trainer

    root = tmp_path / "darai"
    rng = np.random.RandomState(0)
    acts = [f"g{i}" for i in range(4)]
    for d in ["features_img", "groundTruth", "splits", "gaze"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts))
    )
    vids = []
    for v in range(4):
        L = 40
        labels = [acts[int(x)] for x in (np.arange(L) // 11) % 4]
        np.save(root / "features_img" / f"v{v}.npy",
                rng.randn(L, 12).astype(np.float32))
        with open(root / "groundTruth" / f"v{v}.txt", "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q0\n")
        with open(root / "gaze" / f"v{v}.csv", "w") as f:
            f.write("gaze_x,gaze_y\n")
            for t in range(L):
                f.write(f"{rng.rand() * 100},{rng.rand() * 50}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")

    cfg = DataConfig(
        dataset="darai", data_root=str(tmp_path), seq_buckets=(64,),
        depth_features_dir=None, gaze_dir="gaze", train_obs_percs=(0.3, 0.5),
    )
    src = build_source(cfg, "train_split.txt")
    meta = src.load_meta("v0.txt")
    assert meta["query_idx"].shape == (40, 2)
    assert meta["query_idx"].max() <= 1.0

    loader = build_loader(src, cfg, batch_size=4, n_query=8, mode="train",
                          shuffle=False)
    batch = next(iter(loader))
    assert batch["query_label"].shape == (4, 64, 2)
    assert batch["query_label"].dtype == np.float32

    config = get_config("synthetic").replace(
        data=cfg,
        model=ModelConfig(model="futr_gaze", hidden_dim=16, n_head=2,
                          n_encoder_layers=1, n_decoder_layers=1, n_query=8,
                          input_dim=12, max_pos_len=64,
                          compute_dtype="float32"),
        train=TrainConfig(loop="futr", batch_size=4, min_train_batch=0,
                          epochs=1),
    )
    trainer = Trainer(config, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    step = trainer.make_train_step()
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 0)
    assert np.isfinite(float(metrics["loss"]))
