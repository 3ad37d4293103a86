"""Proposed-breakfast loader vs the reference basedataset_proposed_breakfast:
the gt CONTENT is the fine-grained query stream, the TARGET activity comes
from the filename (basedataset_proposed_breakfast.py:60-66)."""

import os

import numpy as np
import pytest

from conftest import reference_on_path

from r3d_tpu.config import DataConfig
from r3d_tpu.data.datasets import VideoSource

ACTIVITIES = {"cereals": 0, "coffee": 1, "tea": 2}      # filename-derived L2
FINE = {f"f{i}": i for i in range(6)}                   # gt-content query
N_CLASS = 4  # 3 activities + NONE
PAD_IDX = N_CLASS + 1


@pytest.fixture(scope="module")
def bf_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds") / "breakfast"
    rng = np.random.RandomState(0)
    for d in ["features", "groundTruth", "splits"]:
        os.makedirs(root / d)
    vids = []
    for i, act in enumerate(["cereals", "coffee"]):
        vid = f"P0{i}_cam01_{act}"
        L = 40 + 10 * i
        fine = [f"f{(t // 7) % 6}" for t in range(L)]
        (root / "groundTruth" / f"{vid}.txt").write_text(
            "".join(x + "\n" for x in fine)
        )
        np.save(root / "features" / f"{vid}.npy",
                rng.randn(16, L).astype(np.float32))  # [C, S]
        vids.append(f"{vid}.txt")
    (root / "splits" / "train.split1.bundle").write_text("\n".join(vids) + "\n")
    return root, vids


def make_source(root, vids):
    cfg = DataConfig(
        dataset="breakfast", data_root=str(root.parent), gt_format="plain",
        features_dir="features", depth_features_dir=None,
        features_transposed=True, label_from_filename=True,
        train_split="train.split{split}.bundle", seq_buckets=(64,),
    )
    return VideoSource(cfg, vids, ACTIVITIES, N_CLASS, PAD_IDX,
                       query_dict=FINE)


def test_filename_label_and_query_stream(bf_tree):
    root, vids = bf_tree
    src = make_source(root, vids)
    meta = src.load_meta(vids[0])
    assert set(meta["label_idx"]) == {ACTIVITIES["cereals"]}
    assert meta["query_idx"] is not None and len(meta["query_idx"]) == 40
    assert set(np.unique(meta["query_idx"])) <= set(range(6))


@pytest.mark.skipif(not reference_on_path(), reason="reference not mounted")
@pytest.mark.parametrize("obs_perc,sample_rate", [(0.3, 1), (0.5, 2)])
def test_item_parity_vs_reference(bf_tree, obs_perc, sample_rate):
    import sys

    import tests.torch_ref  # noqa: F401

    sys.path.insert(0, "/root/reference")
    from data.basedataset_proposed_breakfast import BaseDataset as RefBF

    root, vids = bf_tree

    class Args:
        pass

    args = Args()
    args.sample_rate = sample_rate
    ref = RefBF(
        vids, ACTIVITIES, str(root / "features"), str(root / "groundTruth"),
        PAD_IDX, N_CLASS, n_query=8, mode="test", obs_perc=obs_perc,
        args=args, query_dict=FINE,
    )
    src = make_source(root, vids)
    src.cfg = __import__("dataclasses").replace(src.cfg, sample_rate=sample_rate)

    for i, vid in enumerate(vids):
        ref_item = ref[i]
        ex = src.make_example(vid, obs_perc, sample_rate, 8)
        np.testing.assert_allclose(
            ref_item["features"].numpy(), ex.features, atol=1e-6
        )
        np.testing.assert_array_equal(
            ref_item["past_label"].numpy(), ex.past_label
        )
        np.testing.assert_array_equal(
            ref_item["query_label"].numpy().astype(np.int64), ex.query_label
        )
        np.testing.assert_array_equal(
            ref_item["trans_future_target"].numpy().astype(np.int64),
            ex.trans_future_target,
        )
        np.testing.assert_allclose(
            ref_item["trans_future_dur"].numpy(), ex.trans_future_dur,
            atol=1e-6,
        )
