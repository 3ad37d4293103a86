"""Gaze-modality parity vs the reference (SURVEY §2.2/§2.3):

- loader: basedataset_darai_gaze semantics — min-max-normalized [N, 2] gaze
  stream, observation window ``[:int(obs_perc * N_gaze)]`` of the RAW stream
  (no sample_rate subsampling), per-row gaze-file existence filter, multi-seq
  walk.  Oracle = the actual reference dataset class (environment shims:
  torchvision stub, no-op'd hard-coded-path side writes, gaze-file resolver
  remapped to the test layout — the reference hard-codes /home/seulgi paths,
  basedataset_darai_gaze.py:97,116).
- model: futr_unsupervised_multimodal weight-copy forward parity, including
  the ``query.long()`` floor (multimodal.py:95) and the AdaptiveAvgPool2d
  replicate-pool (GazeCNN output_steps=8 always).

Pinned reference breakage: the gaze model's test-mode forward is unrunnable
as committed (``B, S, C = inputs[0].size()`` needs a tuple while
``src = inputs`` needs a tensor, multimodal.py:94,110) — parity is asserted
on the runnable train-mode forward with dropout zeroed (COMPAT #32).
"""

import os
import sys
import types

import numpy as np
import pytest

from conftest import reference_on_path
from r3d_tpu.config import DataConfig, ModelConfig
from r3d_tpu.data.datasets import VideoSource

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

if HAS_REF:
    import torch
    import torch_ref

    torch_ref.patch_cuda_free()

ACTIONS = {f"act{i}": i for i in range(5)}
N_CLASS = 6
PAD_IDX = N_CLASS + 1
SR = 2
NQ = 8
QUERY_NUM = 12


# --------------------------------------------------------------------- data
@pytest.fixture(scope="module")
def gaze_tree(tmp_path_factory):
    pytest.importorskip("PIL")
    from PIL import Image

    root = tmp_path_factory.mktemp("ds") / "darai"
    for d in ["features_img", "groundTruth", "splits", "gaze", "frames"]:
        os.makedirs(root / d)
    rng = np.random.RandomState(11)

    def write_seq(base, seq, n):
        img_dir = root / "frames" / base
        os.makedirs(img_dir, exist_ok=True)
        img = img_dir / "img_0.png"
        if not img.exists():
            Image.fromarray(
                (rng.rand(8, 8, 3) * 255).astype(np.uint8)
            ).save(str(img))
        rows = [f"{img},act{(t // 6) % 5},q{t % 3}" for t in range(n)]
        rows.insert(n // 2, "malformed row")
        (root / "groundTruth" / f"{base}_{seq}.txt").write_text(
            "\n".join(rows) + "\n"
        )
        np.save(root / "features_img" / f"{base}_{seq}.npy",
                rng.randn(n, 8).astype(np.float32))

    write_seq("vidA", 1, 36)
    write_seq("vidA", 2, 28)
    write_seq("vidB", 1, 30)   # vidB gets NO gaze csv -> filtered out

    # gaze csv: raw pixel series, length UNRELATED to the frame count, with
    # the reference's exact header (leading-space column names via pandas)
    n_gaze = 57
    gx = rng.rand(n_gaze) * 640 + 10
    gy = rng.rand(n_gaze) * 480 + 5
    with open(root / "gaze" / "vidA.csv", "w") as f:
        f.write("frame, gaze_x [px], gaze_y [px]\n")
        for i in range(n_gaze):
            f.write(f"{i}, {gx[i]}, {gy[i]}\n")
    (root / "splits" / "train_split.txt").write_text("vidA.txt\nvidB.txt\n")
    return root


def _import_ref_gaze_dataset(root):
    """Import the reference gaze dataset with env shims: a functional
    torchvision stub (transform() runs on every item), no-op list_to_txt
    (writes to a hard-coded /home path), and get_gaze_file remapped to the
    test layout (hard-coded /home/seulgi/work/gaze otherwise)."""
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
    if "/root/reference/data" not in sys.path:
        sys.path.insert(0, "/root/reference/data")
    try:
        from basedataset_darai_gaze import BaseDataset as RefDS
    finally:
        if stubbed:
            for m in ("torchvision", "torchvision.models",
                      "torchvision.transforms"):
                sys.modules.pop(m, None)

    RefDS.list_to_txt = lambda self, lst: None
    RefDS.get_gaze_file = lambda self, img_path: str(
        root / "gaze"
        / (os.path.basename(os.path.dirname(img_path)) + ".csv")
    )
    return RefDS


def make_ref_ds(root, mode="train", obs_perc=0.2):
    RefDS = _import_ref_gaze_dataset(root)
    args = torch_ref.RefArgs(sample_rate=SR)
    return RefDS(
        str(root / "splits" / "train_split.txt"), ACTIONS,
        str(root / "features_img"), str(root / "groundTruth"),
        PAD_IDX, N_CLASS, n_query=NQ, mode=mode, obs_perc=obs_perc,
        args=args, query_dict={f"q{i}": i for i in range(3)},
    )


def make_source(root):
    cfg = DataConfig(
        dataset="darai", data_root=str(root.parent), gt_format="csv",
        features_dir="features_img", depth_features_dir=None,
        multi_sequence=True, sample_rate=SR, gaze_dir="gaze",
        train_obs_percs=(0.2, 0.3, 0.5), seq_buckets=(64,),
    )
    return VideoSource(cfg, ["vidA.txt", "vidB.txt"], ACTIONS, N_CLASS,
                       PAD_IDX)


def test_missing_gaze_video_filtered(gaze_tree):
    """vidB has no gaze csv: every reference item for it is None (per-row
    filter drops all rows); our units() excludes it up front."""
    ref = make_ref_ds(gaze_tree)
    src = make_source(gaze_tree)
    assert [u for u in src.units()] == [("vidA.txt", 1), ("vidA.txt", 2)]
    vidb = [k for k, (v, s, o) in enumerate(ref.all_sequences) if v == "vidB.txt"]
    assert vidb and all(ref[k] is None for k in vidb)


def test_item_parity_bit_for_bit(gaze_tree):
    ref = make_ref_ds(gaze_tree)
    src = make_source(gaze_tree)
    served = [
        (k, v, s, float(o))
        for k, (v, s, o) in enumerate(ref.all_sequences)
        if v == "vidA.txt"
    ]
    assert served
    for k, vid, seq, obs in served:
        item = ref[k]
        assert item is not None
        ex = src.make_example(vid, obs, SR, NQ, seq=seq)
        msg = f"{vid}:{seq}@{obs}"
        np.testing.assert_array_equal(
            ex.features, item["features"].numpy(), err_msg=msg)
        np.testing.assert_array_equal(
            ex.past_label, item["past_label"].numpy(), err_msg=msg)
        np.testing.assert_array_equal(
            ex.trans_future_target, item["trans_future_target"].numpy(),
            err_msg=msg)
        np.testing.assert_array_equal(
            ex.trans_future_dur, item["trans_future_dur"].numpy(),
            err_msg=msg)
        # the gaze query stream: min-max normalized, windowed on the RAW
        # gaze length, NOT subsampled
        np.testing.assert_array_equal(
            ex.query_label, item["query_label"].numpy(), err_msg=msg)
        assert ex.query_label.shape[0] == int(obs * 57)


# -------------------------------------------------------------------- model
def _models(dropout=0.0):
    from model.futr_unsupervised_multimodal import FUTR as RefGaze

    from r3d_tpu.models.futr_unsupervised import FUTRUnsupervised

    cfg = ModelConfig(
        model="futr_gaze", hidden_dim=32, n_head=4, n_encoder_layers=1,
        n_decoder_layers=1, n_query=8, input_dim=16, max_pos_len=64,
        compute_dtype="float32", query_num=QUERY_NUM, dropout=dropout,
        # the gaze reference's fc_seg is n_class-1 wide (multimodal.py:59),
        # unlike futr_unsupervised's n_class (futr_unsupervised.py:39)
        seg_excludes_none=True,
    )
    args = torch_ref.RefArgs(input_dim=16, max_pos_len=64)
    torch.manual_seed(3)
    ref = RefGaze(
        N_CLASS, 32, PAD_IDX, torch.device("cpu"), args, n_query=8, n_head=4,
        num_encoder_layers=1, num_decoder_layers=1, query_num=QUERY_NUM,
    )
    ref.eval()
    torch_ref.zero_dropout(ref)
    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="gaze")
    return ref, ours


def test_model_parity_train_mode(gaze_tree):
    import jax.numpy as jnp

    ref, ours = _models()
    rng = np.random.RandomState(5)
    B, S, Ng = 3, 20, 33
    x = rng.randn(B, S, 16).astype(np.float32)
    labels = rng.randint(0, N_CLASS - 1, size=(B, S))
    # normalized gaze in [0, 1] — the .long() floor maps min->0, max->1
    gaze = rng.rand(B, Ng, 2).astype(np.float32)
    gaze[:, 0] = 1.0  # make the floor non-trivially nonzero somewhere

    with torch.no_grad():
        ref_out = ref(
            (torch.tensor(x), torch.tensor(labels)), torch.tensor(gaze),
            mode="train",
        )

    params = torch_ref.gaze_params(ref)
    import jax

    params = jax.tree.map(jnp.asarray, params)
    out = ours.apply({"params": params}, jnp.array(x), jnp.array(gaze),
                     jnp.array(labels == PAD_IDX), train=False)

    for key in ("action", "duration", "seg", "supcon"):
        np.testing.assert_allclose(
            np.array(out[key]), ref_out[key].numpy(), atol=3e-4,
            err_msg=key,
        )
    assert "l3" not in out  # the reference gaze model has no fc_l3 head


def test_padded_batch_matches_unpadded(gaze_tree):
    """Bucket zero-padding of the gaze stream must not change outputs when
    query_len masks the pad rows (the reference's own train-time pad leaks
    conv bias into the temporal mean — COMPAT #31 adopts the well-defined
    unpadded semantics)."""
    import jax
    import jax.numpy as jnp

    ref, ours = _models()
    params = jax.tree.map(jnp.asarray, torch_ref.gaze_params(ref))

    rng = np.random.RandomState(9)
    B, S = 2, 12
    x = rng.randn(B, S, 16).astype(np.float32)
    lens = [17, 29]
    Sq = 40
    gaze_pad = np.zeros((B, Sq, 2), np.float32)
    outs_single = []
    for i in range(B):
        g = rng.rand(lens[i], 2).astype(np.float32)
        gaze_pad[i, : lens[i]] = g
        o = ours.apply(
            {"params": params}, jnp.array(x[i : i + 1]),
            jnp.array(g[None]), None, train=False,
        )
        outs_single.append(o)
    out_batch = ours.apply(
        {"params": params}, jnp.array(x), jnp.array(gaze_pad), None,
        jnp.array(lens, np.int32), train=False,
    )
    for key in ("action", "duration", "supcon"):
        got = np.array(out_batch[key])
        want = np.concatenate(
            [np.array(o[key]) for o in outs_single], axis=0
        )
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=key)
