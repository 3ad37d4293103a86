"""Protocol-core tests: windowing/transcript/padding vs the reference dataset.

The oracle is the actual reference BaseDataset._make_input run on a synthetic
on-disk dataset (no copying — we execute the reference and compare outputs).
"""

import os
import sys

import numpy as np
import pytest

from conftest import reference_on_path
from r3d_tpu.data.protocol import (
    labels_to_indices,
    labels_to_transcript,
    make_example,
    pad_transcript,
)
from r3d_tpu.data.mapping import read_mapping_dict


def _synthetic_video(rng, n_class, vid_len):
    """Per-frame labels with realistic run structure + features."""
    labels = []
    while len(labels) < vid_len:
        a = int(rng.randint(0, n_class))
        labels += [f"act{a}"] * int(rng.randint(3, 30))
    labels = labels[:vid_len]
    feats = rng.randn(vid_len, 16).astype(np.float32)
    return labels, feats


@pytest.fixture(scope="module")
def actions_dict():
    return {f"act{i}": i for i in range(10)}


def test_labels_to_indices_strips_spaces(actions_dict):
    out = labels_to_indices(["act1", " act2 ", "act0"], actions_dict)
    assert out.tolist() == [1, 2, 0]


def test_transcript_runs(actions_dict):
    seq = ["act1"] * 4 + ["act2"] * 2 + ["act1"] * 4
    acts, durs = labels_to_transcript(seq, actions_dict)
    assert acts.tolist() == [1, 2, 1]
    np.testing.assert_allclose(durs, [0.4, 0.2, 0.4])


def test_pad_transcript_short():
    t, d = pad_transcript(np.array([3, 4]), np.array([0.5, 0.5]), 8, 99, 9)
    assert t.tolist() == [3, 4, 9, 99, 99, 99, 99, 99]
    assert d.tolist() == [0.5, 0.5, 99, 99, 99, 99, 99, 99]


def test_pad_transcript_exact():
    t, d = pad_transcript(np.arange(7), np.full(7, 1 / 7), 8, 99, 9)
    assert t.tolist() == [0, 1, 2, 3, 4, 5, 6, 9]
    assert len(d) == 8 and d[-1] == 99


def test_pad_transcript_long():
    t, d = pad_transcript(np.arange(12), np.full(12, 1 / 12), 8, 99, 9)
    assert t.tolist() == list(range(8))
    assert len(d) == 8


@pytest.mark.skipif(not reference_on_path(), reason="reference repo not mounted")
@pytest.mark.parametrize("obs_perc,sample_rate", [(0.2, 1), (0.3, 3), (0.5, 6)])
def test_make_example_matches_reference_dataset(tmp_path, obs_perc, sample_rate):
    """Run reference data/basedataset.py on synthetic files; compare."""
    import torch  # noqa: F401

    sys.path.insert(0, "/root/reference")
    from data.basedataset import BaseDataset as RefDataset

    rng = np.random.RandomState(0)
    n_class = 11  # 10 actions + NONE
    actions = {f"act{i}": i for i in range(10)}
    pad_idx = n_class + 1

    feat_dir = tmp_path / "features"
    gt_dir = tmp_path / "gt"
    feat_dir.mkdir(), gt_dir.mkdir()
    labels, feats = _synthetic_video(rng, 10, 200)
    np.save(feat_dir / "vid0.npy", feats.T)  # reference stores [C, S]
    (gt_dir / "vid0.txt").write_text("\n".join(labels) + "\n")

    class Args:
        pass

    args = Args()
    args.sample_rate = sample_rate

    ref_ds = RefDataset(
        ["vid0.txt"], actions, str(feat_dir), str(gt_dir), pad_idx, n_class,
        n_query=8, mode="test", obs_perc=obs_perc, args=args,
    )
    ref_item = ref_ds[0]

    ours = make_example(
        feats, labels, actions, obs_perc=obs_perc, sample_rate=sample_rate,
        n_query=8, pad_idx=pad_idx, n_class=n_class,
    )

    np.testing.assert_allclose(ref_item["features"].numpy(), ours.features, atol=1e-6)
    np.testing.assert_array_equal(ref_item["past_label"].numpy(), ours.past_label)
    np.testing.assert_array_equal(
        ref_item["trans_future_target"].numpy().astype(np.int64), ours.trans_future_target
    )
    np.testing.assert_allclose(
        ref_item["trans_future_dur"].numpy(), ours.trans_future_dur, atol=1e-6
    )


def test_mapping_reader(tmp_path):
    p = tmp_path / "mapping.txt"
    p.write_text("0 walk\n1 run\n2 sit\n")
    d = read_mapping_dict(str(p))
    assert d == {"walk": 0, "run": 1, "sit": 2}


def test_indices_to_transcript_matches_string_version(actions_dict):
    from r3d_tpu.data.protocol import indices_to_transcript

    rng = np.random.RandomState(3)
    for _ in range(20):
        seq = []
        while len(seq) < 30:
            seq += [f"act{rng.randint(10)}"] * rng.randint(1, 6)
        seq = seq[:30]
        a1, d1 = labels_to_transcript(seq, actions_dict)
        a2, d2 = indices_to_transcript(labels_to_indices(seq, actions_dict))
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_allclose(d1, d2)


def test_make_example_edge_cases(actions_dict):
    rng = np.random.RandomState(4)
    labels, feats = _synthetic_video(rng, 10, 100)
    # obs close to 1.0: tiny future window still yields a transcript
    ex = make_example(feats, labels, actions_dict, 0.95, 1, 8, 99, 11)
    assert len(ex.trans_future_target) == 8
    # heavy subsampling shorter than one run
    ex = make_example(feats, labels, actions_dict, 0.5, 25, 8, 99, 11)
    assert ex.features.shape[0] == ex.past_label.shape[0] >= 1
    # single-frame future window
    ex = make_example(feats, labels, actions_dict, 0.98, 1, 8, 99, 11)
    assert np.isfinite(ex.trans_future_dur[:2]).all()
