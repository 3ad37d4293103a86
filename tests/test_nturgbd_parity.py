"""Loader parity vs the reference basedataset_nturgbd (SURVEY §2.2).

The oracle is the actual reference dataset class on a synthetic NTU-layout
tree: csv 3-field gt filter, obs .2/.3/.5 replication, RGB + depth streams.

Pinned quirk: the reference DEFINES ``normalize_depth`` (whole-stack min-max
to uint8, basedataset_nturgbd.py:42-52) but the load site has the call
commented out (``np.load(depth_feature_file)#self.normalize_depth(...)``,
basedataset_nturgbd.py:148) — depth loads RAW.  Our nturgbd config therefore
ships ``normalize_depth=False``; the knob stays available for feature-prep
pipelines that want the documented intent.
"""

import os

import numpy as np
import pytest

from conftest import reference_on_path
from r3d_tpu.config import CONFIGS, DataConfig
from r3d_tpu.data.datasets import VideoSource

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

ACTIONS = {f"act{i}": i for i in range(5)}
N_CLASS = 6          # 5 actions + NONE
PAD_IDX = N_CLASS + 1
SR = 2
NQ = 8


@pytest.fixture(scope="module")
def ntu_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds") / "nturgbd"
    rng = np.random.RandomState(7)
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d)
    vids = []
    for v in range(3):
        L = int(rng.randint(30, 50))
        rows = [f"img{t},act{(t // 5) % 5},q{t % 3}" for t in range(L)]
        # malformed rows the 3-field filter must drop on both sides
        rows.insert(L // 3, "no commas here")
        rows.insert(0, "a,b")  # 2 fields
        (root / "groundTruth" / f"v{v}.txt").write_text("\n".join(rows) + "\n")
        np.save(root / "features_img" / f"v{v}.npy",
                rng.randn(L, 10).astype(np.float32))
        # depth values OUTSIDE [0, 255]: normalize_depth would change them,
        # raw load must not
        np.save(root / "features_depth" / f"v{v}.npy",
                (rng.randn(L, 6, 4) * 900.0).astype(np.float32))
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    return root, vids


def make_ref_ds(root, vids, mode="train", obs_perc=0.2):
    import sys

    if "/root/reference/data" not in sys.path:
        sys.path.insert(0, "/root/reference/data")
    from basedataset_nturgbd import BaseDataset as RefDS

    import torch_ref

    args = torch_ref.RefArgs(sample_rate=SR)
    return RefDS(
        vids, ACTIONS, str(root / "features_img"),
        str(root / "features_depth"), str(root / "groundTruth"),
        PAD_IDX, N_CLASS, n_query=NQ, mode=mode, obs_perc=obs_perc, args=args,
    )


def make_source(root, vids):
    cfg = DataConfig(
        dataset="nturgbd", data_root=str(root.parent), gt_format="csv",
        features_dir="features_img", depth_features_dir="features_depth",
        sample_rate=SR, train_obs_percs=(0.2, 0.3, 0.5), seq_buckets=(64,),
        normalize_depth=False,
    )
    return VideoSource(cfg, vids, ACTIONS, N_CLASS, PAD_IDX)


def test_config_matches_reference_raw_depth_load():
    """The load site's normalize_depth call is commented out in the reference
    (basedataset_nturgbd.py:148) — the shipped config must not apply it."""
    assert CONFIGS["nturgbd"].data.normalize_depth is False


def test_train_table_expansion(ntu_tree):
    root, vids = ntu_tree
    ref = make_ref_ds(root, vids)
    assert [(v, float(o)) for v, o in ref.vid_list] == [
        (v, o) for v in vids for o in (0.2, 0.3, 0.5)
    ]


def test_item_parity_bit_for_bit(ntu_tree):
    root, vids = ntu_tree
    ref = make_ref_ds(root, vids)
    src = make_source(root, vids)
    for k in range(len(ref)):
        vid, obs = ref.vid_list[k]
        item = ref[k]
        ex = src.make_example(vid, float(obs), SR, NQ)
        msg = f"{vid}@{obs}"
        np.testing.assert_array_equal(
            ex.features, item["features"].numpy(), err_msg=msg)
        np.testing.assert_array_equal(
            ex.depth_features, item["depth_features"].numpy(), err_msg=msg)
        np.testing.assert_array_equal(
            ex.past_label, item["past_label"].numpy(), err_msg=msg)
        np.testing.assert_array_equal(
            ex.trans_future_target, item["trans_future_target"].numpy(),
            err_msg=msg)
        np.testing.assert_array_equal(
            ex.trans_future_dur, item["trans_future_dur"].numpy(), err_msg=msg)


def test_normalize_depth_knob_still_works(ntu_tree):
    """The opt-in knob applies the documented whole-stack min-max -> uint8."""
    root, vids = ntu_tree
    cfg = DataConfig(
        dataset="nturgbd", data_root=str(root.parent), gt_format="csv",
        features_dir="features_img", depth_features_dir="features_depth",
        sample_rate=SR, seq_buckets=(64,), normalize_depth=True,
    )
    src = VideoSource(cfg, vids, ACTIONS, N_CLASS, PAD_IDX)
    ex = src.make_example(vids[0], 0.5, SR, NQ)
    raw = np.load(root / "features_depth" / "v0.npy")
    lo, hi = raw.min(), raw.max()
    expected = ((raw - lo) / (hi - lo) * 255).astype(np.uint8)
    L = len(ex.past_label)
    np.testing.assert_array_equal(
        ex.depth_features, expected[: int(0.5 * len(raw)) : SR][:L].astype(np.float32)
    )
