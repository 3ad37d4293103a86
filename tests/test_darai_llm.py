"""Loader parity vs the reference basedataset_darai_llm (SURVEY partial #16).

The oracle is the actual reference dataset class on a synthetic multi-seq
tree: RGB-only sequence walking at obs .2/.3/.5, the csv 3-field line filter,
and the llm family's BOUNDED future window — ``8 * sample_rate`` gt frames
after the observed prefix instead of ``0.5 * vid_len``
(basedataset_darai_llm.py:428; our ``DataConfig.future_frames``).

The per-frame image tensors the reference item carries for in-loop LLM
labeling are NOT reproduced — labeling is an offline CLI here (COMPAT #24);
this test compares every shared field bit-for-bit.
"""

import os
import sys

import numpy as np
import pytest

from conftest import reference_on_path
from r3d_tpu.config import DataConfig
from r3d_tpu.data.datasets import VideoSource

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

if HAS_REF:
    import torch  # noqa: F401  (reference dataset returns torch tensors)

N_CLASS = 6  # 5 L2 actions + NONE
ACTIONS = {f"act{i}": i for i in range(5)}
QUERIES = {f"q{i}": i for i in range(3)}
PAD_IDX = N_CLASS + 1
SR = 2
NQ = 8


@pytest.fixture(scope="module")
def llm_tree(tmp_path_factory):
    """darai-llm layout: {base}_{seq}.txt/.npy multi-sequence files, csv gt
    whose FIRST column is a real image path (the reference transform() opens
    and resizes every one)."""
    pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path_factory.mktemp("ds") / "darai"
    feat = root / "features_img"
    gt = root / "groundTruth"
    splits = root / "splits"
    frames = root / "frames"
    for d in (feat, gt, splits, frames):
        os.makedirs(d)
    rng = np.random.RandomState(4)

    img_path = str(frames / "img_0000.png")
    Image.fromarray(
        (rng.rand(8, 8, 3) * 255).astype(np.uint8)
    ).save(img_path)

    def write_seq(base, seq, n_frames):
        rows = []
        for t in range(n_frames):
            a = f"act{(t // 6) % 5}"
            q = f"q{t % 3}"
            rows.append(f"{img_path},{a},{q}")
        # one malformed row: the csv filter must drop it on both sides
        rows.insert(n_frames // 2, "corrupted line without commas")
        (gt / f"{base}_{seq}.txt").write_text("\n".join(rows) + "\n")
        np.save(feat / f"{base}_{seq}.npy",
                rng.randn(n_frames, 8).astype(np.float32))

    write_seq("vidA", 1, 36)
    write_seq("vidA", 2, 28)
    write_seq("vidB", 1, 30)
    (splits / "train_split.txt").write_text("vidA.txt\nvidB.txt\n")
    return root


def _import_ref_llm_dataset():
    """Import the reference llm dataset with a FUNCTIONAL torchvision stub:
    unlike the darai-depth case, its _make_input calls transform() on every
    item, so Compose/Resize/ToTensor must actually work (torchvision is not
    in this image).  The stub is removed right after import — the module
    keeps its own references."""
    import types

    import torch
    from PIL import Image

    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tfm = types.ModuleType("torchvision.transforms")

        class Compose:
            def __init__(self, fs):
                self.fs = fs

            def __call__(self, x):
                for f in self.fs:
                    x = f(x)
                return x

        class Resize:
            def __init__(self, size):
                self.size = size

            def __call__(self, img):
                return img.resize((self.size[1], self.size[0]), Image.BILINEAR)

        class ToTensor:
            def __call__(self, img):
                a = np.asarray(img, dtype=np.float32) / 255.0
                return torch.tensor(a).permute(2, 0, 1)

        tfm.Compose, tfm.Resize, tfm.ToTensor = Compose, Resize, ToTensor
        tv.transforms = tfm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tfm
    if "/root/reference/data" not in sys.path:  # data/ is a flat-path import
        sys.path.insert(0, "/root/reference/data")
    try:
        from basedataset_darai_llm import BaseDataset as RefDS
    finally:
        if stubbed:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.models", None)
            sys.modules.pop("torchvision.transforms", None)
    return RefDS


def make_ref_ds(root, mode="train", obs_perc=0.2):
    RefDS = _import_ref_llm_dataset()

    import torch_ref

    args = torch_ref.RefArgs(sample_rate=SR)
    return RefDS(
        str(root / "splits" / "train_split.txt"), ACTIONS,
        str(root / "features_img"), str(root / "groundTruth"),
        PAD_IDX, N_CLASS, n_query=NQ, mode=mode, obs_perc=obs_perc,
        args=args, query_dict=QUERIES,
    )


def make_source(root):
    cfg = DataConfig(
        dataset="darai", data_root=str(root.parent), gt_format="csv",
        features_dir="features_img", depth_features_dir=None,
        multi_sequence=True, sample_rate=SR,
        train_obs_percs=(0.2, 0.3, 0.5), seq_buckets=(64,),
        future_frames=NQ,
    )
    return VideoSource(
        cfg, ["vidA.txt", "vidB.txt"], ACTIONS, N_CLASS, PAD_IDX,
        query_dict=QUERIES,
    )


def test_sequence_walk_matches(llm_tree):
    ref = make_ref_ds(llm_tree)
    src = make_source(llm_tree)
    expected = [
        (vid, seq, obs)
        for vid, seq in src.units()
        for obs in (0.2, 0.3, 0.5)
    ]
    assert [(v, s, float(o)) for v, s, o in ref.all_sequences] == expected


def test_item_parity_bit_for_bit(llm_tree):
    ref = make_ref_ds(llm_tree)
    src = make_source(llm_tree)
    assert len(ref) > 0
    for k in range(len(ref)):
        vid, seq, obs = ref.all_sequences[k]
        item = ref[k]
        ex = src.make_example(vid, float(obs), SR, NQ, seq=seq)
        np.testing.assert_array_equal(
            ex.features, item["features"].numpy(), err_msg=f"{vid}:{seq}@{obs}"
        )
        np.testing.assert_array_equal(ex.past_label, item["past_label"].numpy())
        np.testing.assert_array_equal(
            ex.trans_future_target, item["trans_future_target"].numpy()
        )
        np.testing.assert_array_equal(
            ex.trans_future_dur, item["trans_future_dur"].numpy()
        )
        np.testing.assert_array_equal(
            ex.query_label, item["query_label"].numpy()
        )


def test_bounded_future_window_differs_from_pred_perc(llm_tree):
    """future_frames=8 at SR=2 takes 16 gt frames — on a 36-frame sequence
    at obs 0.2 that's a DIFFERENT window than 0.5*vid_len=18 frames; guard
    that the knob actually changes the slice."""
    src = make_source(llm_tree)
    import dataclasses

    cfg_pp = dataclasses.replace(src.cfg, future_frames=None)
    src_pp = VideoSource(
        cfg_pp, ["vidA.txt", "vidB.txt"], ACTIONS, N_CLASS, PAD_IDX,
        query_dict=QUERIES,
    )
    a = src.make_example("vidA.txt", 0.2, SR, NQ, seq=1)
    b = src_pp.make_example("vidA.txt", 0.2, SR, NQ, seq=1)
    assert not np.array_equal(a.trans_future_dur, b.trans_future_dur)
