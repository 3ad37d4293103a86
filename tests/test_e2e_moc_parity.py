"""End-to-end MoC parity vs the REAL reference predict sweeps.

The strongest proxy for number-level quality parity without real data
mounted: generate a synthetic on-disk dataset in the reference's own layout,
copy identical (random) weights into the reference torch model and our flax
model, run the reference's actual ``evaluation/predict_*.py`` sweep on
torch-CPU, run our ``Predictor`` over the same files, and assert the whole
MoC table + the secondary anticipation/segmentation accuracies agree.

Components (decode, eval_file, weighted acc) are oracle-tested elsewhere;
THIS file pins the composition — the full train→predict protocol.
"""

import contextlib
import io
import os
import re
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import reference_on_path

reference_on_path()
if os.path.isdir("/root/reference/evaluation"):
    sys.path.insert(0, "/root/reference/evaluation")

import torch  # noqa: E402

import torch_ref  # noqa: E402
from r3d_tpu.config import (  # noqa: E402
    DataConfig, EvalConfig, ModelConfig, TrainConfig, get_config,
)
from r3d_tpu.data.datasets import build_source  # noqa: E402
from r3d_tpu.eval.predict import Predictor  # noqa: E402
from r3d_tpu.models import build_model  # noqa: E402

torch_ref.patch_cuda_free()

N_ACTIONS = 5
N_CLASS = N_ACTIONS + 1          # + NONE (reference main_utkinects.py)
PAD_IDX = N_CLASS + 1
NQ = 8                           # reference asserts len(pred)==8
SR = 2
IN_DIM = 16
DEPTH_DIM = 24                   # flat per-frame depth (ref Linear input)
HID = 32

# utkinects prints 'obs. 20% pred. 10%'; breakfast/50salads print without %
MOC_RE = re.compile(r"obs\. (\d+)%? pred\. (\d+)%? --> MoC: ([\d.]+)")


@contextlib.contextmanager
def redirected_refpaths(tmp_path):
    """The reference sweeps write logs to hard-coded absolute paths
    (predict_utkinects.py:252 '/home/seulgi/...'); redirect those opens into
    tmp so the sweep runs verbatim without touching anything outside tmp."""
    import builtins

    orig_open = builtins.open
    logdir = tmp_path / "ref_logs"
    logdir.mkdir(exist_ok=True)

    def patched_open(file, *args, **kwargs):
        if isinstance(file, (str, os.PathLike)) and str(file).startswith(
            "/home/"
        ):
            file = str(logdir / os.path.basename(str(file)))
        return orig_open(file, *args, **kwargs)

    builtins.open = patched_open
    try:
        yield
    finally:
        builtins.open = orig_open


@contextlib.contextmanager
def chdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


def parse_moc(stdout: str):
    return {
        (int(o), int(p)): float(m) for o, p, m in MOC_RE.findall(stdout)
    }


# --------------------------------------------------------------------------
# utkinects: CMFuserBN flagship + evaluation/predict_utkinects.py sweep
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def utk_disk(tmp_path_factory):
    """Reference-layout utkinect dataset: 3-column csv gt, features_img,
    features_depth (flat [L, D] depth so the reference depth_projection
    Linear consumes it directly, predict_utkinects.py:270-287)."""
    root = tmp_path_factory.mktemp("e2e") / "datasets" / "utkinect"
    rng = np.random.RandomState(7)
    acts = [f"a{i}" for i in range(N_ACTIONS)]
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts))
    )
    vids = []
    for v in range(5):
        L = int(rng.randint(46, 90))
        # realistic run-length label structure
        labels, t = [], 0
        while len(labels) < L:
            labels.extend([acts[rng.randint(N_ACTIONS)]] * rng.randint(5, 14))
        labels = labels[:L]
        np.save(root / "features_img" / f"v{v}.npy",
                rng.randn(L, IN_DIM).astype(np.float32))
        np.save(root / "features_depth" / f"v{v}.npy",
                rng.randn(L, DEPTH_DIM).astype(np.float32))
        with open(root / "groundTruth" / f"v{v}.txt", "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    return root


def make_ref_fusion_model():
    from model.futr_safuser_batchnormalization import FUTR as RefFusion

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="utkinects")
    torch.manual_seed(11)
    m = RefFusion(
        N_CLASS, HID, PAD_IDX, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1, query_num=49,
    )
    m.depth_projection = torch.nn.Linear(DEPTH_DIM, HID)
    torch.nn.init.xavier_uniform_(m.depth_projection.weight)
    m.eval()
    torch_ref.zero_dropout(m)
    # non-trivial BN running stats (eval path folds them in)
    g = torch.Generator().manual_seed(3)
    for bn in (m.fuser.bn_rgb, m.fuser.bn_depth):
        bn.running_mean.copy_(torch.randn(HID, generator=g) * 0.3)
        bn.running_var.copy_(torch.rand(HID, generator=g) + 0.5)
        with torch.no_grad():
            bn.weight.copy_(torch.randn(HID, generator=g))
    return m, args


def our_utk_cfg(root):
    return get_config("utkinects").replace(
        data=DataConfig(
            dataset="utkinects", data_root=str(root.parent),
            seq_buckets=(64, 128), train_obs_percs=(0.2, 0.3),
            depth_shape=(DEPTH_DIM,), sample_rate=SR,
            feature_dtype="float32",
        ),
        model=ModelConfig(
            model="futr_fusion_bn", hidden_dim=HID, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
            input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
            seg_excludes_none=False,
        ),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0),
    )


@pytest.mark.parametrize("obs_p", [0.2, 0.3])
def test_utkinects_e2e_moc_parity(utk_disk, tmp_path, obs_p):
    """Full sweep: reference predict_utkinects.predict on torch-CPU vs our
    Predictor on the same files + converted weights. MoC table, weighted
    anticipation acc, and segmentation acc must all agree."""
    from predict_utkinects import predict as ref_predict

    ref_model, args = make_ref_fusion_model()
    vid_list = sorted(
        f for f in os.listdir(utk_disk / "groundTruth") if f.endswith(".txt")
    )

    buf = io.StringIO()
    with chdir(utk_disk.parent.parent), redirected_refpaths(tmp_path):
        with contextlib.redirect_stdout(buf):
            ref_ant, ref_seg = ref_predict(
                ref_model, vid_list, args, obs_p, N_CLASS,
                dict_of_actions(utk_disk), torch.device("cpu"),
            )
    ref_moc = parse_moc(buf.getvalue())
    assert len(ref_moc) == 4

    cfg = our_utk_cfg(utk_disk)
    source = build_source(cfg.data, "train_split.txt")
    assert source.n_class == N_CLASS and source.pad_idx == PAD_IDX
    model = build_model(cfg.model, source.n_class)
    params, batch_stats = torch_ref.fusion_params(ref_model)
    variables = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": jax.tree.map(jnp.asarray, batch_stats),
    }
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p, log=lambda *a: None)

    for (o, p), want in ref_moc.items():
        got = res[f"obs{o}_pred{p}"]
        assert abs(got - want) < 5.1e-5, (o, p, got, want)
    np.testing.assert_allclose(res["ant_acc"], ref_ant, atol=1e-6)
    np.testing.assert_allclose(res["seg_acc"], ref_seg, atol=1e-6)


def dict_of_actions(root):
    d = {}
    for line in (root / "mapping_l2_changed.txt").read_text().splitlines():
        i, name = line.split()
        d[name] = int(i)
    return d


ANT_RE = re.compile(r"ant Acc:\s+([\d.eE+-]+)")


def read_mapping(path):
    d = {}
    for line in path.read_text().splitlines():
        i, name = line.split()
        d[name] = int(i)
    return d


# --------------------------------------------------------------------------
# breakfast proposed: futr_proposed + evaluation/predict_breakfast.py sweep
# (the as-wired futr_baseline import crashes on the query kwarg — COMPAT
# breakfast_proposed note; the query-consuming sibling is the live model)
# --------------------------------------------------------------------------

BF_FINE = [f"act{i}" for i in range(6)]
BF_L2 = ["coffee", "tea", "milk"]


@pytest.fixture(scope="module")
def breakfast_disk(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_bf") / "datasets" / "breakfast"
    rng = np.random.RandomState(13)
    for d in ["features", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(BF_FINE))
    )
    (root / "mapping_l2.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(BF_L2))
    )
    vids = []
    for v in range(5):
        L = int(rng.randint(40, 80))
        fine = []
        while len(fine) < L:
            fine.extend([BF_FINE[rng.randint(len(BF_FINE))]] * rng.randint(4, 11))
        fine = fine[:L]
        l2 = BF_L2[v % len(BF_L2)]
        name = f"P{v:02d}_cam01_{l2}"
        # features stored TRANSPOSED [C, S] (predict_breakfast.py:210 .transpose())
        np.save(root / "features" / f"{name}.npy",
                rng.randn(IN_DIM, L).astype(np.float32))
        (root / "groundTruth" / f"{name}.txt").write_text(
            "".join(x + "\n" for x in fine)
        )
        vids.append(f"{name}.txt")
    (root / "splits" / "train.split1.bundle").write_text("\n".join(vids) + "\n")
    return root


@pytest.mark.parametrize("obs_p", [0.3])
def test_breakfast_e2e_moc_parity(breakfast_disk, tmp_path, obs_p):
    """predict_breakfast.predict (incl. its LIVE 0/1 query re-encoding,
    COMPAT #27) vs our Predictor with query_mod2."""
    import dataclasses

    from predict_breakfast import predict as ref_predict
    from model.futr_proposed import FUTR as RefProposed

    actions_dict = read_mapping(breakfast_disk / "mapping_l2.txt")
    query_dict = read_mapping(breakfast_disk / "mapping.txt")
    n_class = len(actions_dict) + 1
    pad_idx = n_class - 1  # main_proposed.py:89
    query_num = len(query_dict) + 1  # COMPAT #26 pad slot

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="breakfast")
    torch.manual_seed(21)
    ref_model = RefProposed(
        n_class, HID, pad_idx, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
        query_num=query_num,
    )
    ref_model.eval()
    torch_ref.zero_dropout(ref_model)

    vid_list = sorted(
        f for f in os.listdir(breakfast_disk / "groundTruth")
        if f.endswith(".txt")
    )
    buf = io.StringIO()
    with chdir(breakfast_disk.parent.parent), redirected_refpaths(tmp_path):
        with contextlib.redirect_stdout(buf):
            ref_predict(ref_model, vid_list, args, obs_p, n_class,
                        actions_dict, torch.device("cpu"), query_dict)
    ref_moc = parse_moc(buf.getvalue())
    assert len(ref_moc) == 4
    ref_ant = float(ANT_RE.search(buf.getvalue()).group(1))

    base = get_config("breakfast_proposed")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(breakfast_disk.parent),
            seq_buckets=(64, 128), sample_rate=SR, feature_dtype="float32",
            train_obs_percs=(obs_p,),
        ),
        model=ModelConfig(
            model="futr_proposed", hidden_dim=HID, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
            input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
            query_num=query_num, seg_excludes_none=True,
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
    )
    source = build_source(cfg.data, "train.split1.bundle")
    assert source.n_class == n_class
    model = build_model(cfg.model, source.n_class)
    xj = jnp.zeros((1, 8, IN_DIM), jnp.float32)
    qj = jnp.zeros((1, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), xj, qj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref_model))
    variables = {"params": {**dict(init), **conv}}

    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p, log=lambda *a: None)

    for (o, p), want in ref_moc.items():
        got = res[f"obs{o}_pred{p}"]
        assert abs(got - want) < 5.1e-5, (o, p, got, want)
    np.testing.assert_allclose(res["ant_acc"], ref_ant, atol=1e-6)


# --------------------------------------------------------------------------
# 50salads proposed: futr_proposed + evaluation/predict_50salads.py sweep
# (L2 gt -> L1 targets via the hard-coded action_mapping; raw-id queries)
# --------------------------------------------------------------------------

SAL_FINE = [
    "cut_tomato_prep", "cut_tomato_core", "place_tomato_into_bowl_prep",
    "add_oil_prep", "mix_dressing_core", "serve_salad_onto_plate_core",
    "add_dressing_prep",
]
SAL_L1 = ["cut_and_mix_ingredients", "prepare_dressing", "serve_salad"]


@pytest.fixture(scope="module")
def salads_disk(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_sal") / "datasets" / "50salads"
    rng = np.random.RandomState(29)
    for d in ["features", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l1.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(SAL_L1))
    )
    (root / "mapping_l2.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(SAL_FINE))
    )
    vids = []
    for v in range(4):
        L = int(rng.randint(50, 90))
        fine = []
        while len(fine) < L:
            fine.extend(
                [SAL_FINE[rng.randint(len(SAL_FINE))]] * rng.randint(5, 12)
            )
        fine = fine[:L]
        name = f"rgb-{v:02d}-1"
        np.save(root / "features" / f"{name}.npy",
                rng.randn(IN_DIM, L).astype(np.float32))
        (root / "groundTruth" / f"{name}.txt").write_text(
            "".join(x + "\n" for x in fine)
        )
        vids.append(f"{name}.txt")
    (root / "splits" / "train.split1.bundle").write_text("\n".join(vids) + "\n")
    return root


@pytest.mark.parametrize("obs_p", [0.2])
def test_50salads_e2e_moc_parity(salads_disk, tmp_path, obs_p):
    import dataclasses

    from predict_50salads import predict as ref_predict
    from model.futr_proposed import FUTR as RefProposed

    actions_dict = read_mapping(salads_disk / "mapping_l1.txt")
    query_dict = read_mapping(salads_disk / "mapping_l2.txt")
    n_class = len(actions_dict) + 1
    pad_idx = n_class - 1
    query_num = len(query_dict) + 1

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="50salads")
    torch.manual_seed(31)
    ref_model = RefProposed(
        n_class, HID, pad_idx, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
        query_num=query_num,
    )
    ref_model.eval()
    torch_ref.zero_dropout(ref_model)

    vid_list = sorted(
        f for f in os.listdir(salads_disk / "groundTruth")
        if f.endswith(".txt")
    )
    buf = io.StringIO()
    with chdir(salads_disk.parent.parent), redirected_refpaths(tmp_path):
        with contextlib.redirect_stdout(buf):
            ref_predict(ref_model, vid_list, args, obs_p, n_class,
                        actions_dict, torch.device("cpu"), query_dict)
    ref_moc = parse_moc(buf.getvalue())
    assert len(ref_moc) == 4
    ref_ant = float(ANT_RE.search(buf.getvalue()).group(1))

    base = get_config("50salads_proposed")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(salads_disk.parent),
            seq_buckets=(64, 128), sample_rate=SR, feature_dtype="float32",
            train_obs_percs=(obs_p,),
        ),
        model=ModelConfig(
            model="futr_proposed", hidden_dim=HID, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
            input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
            query_num=query_num, seg_excludes_none=True,
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
    )
    source = build_source(cfg.data, "train.split1.bundle")
    assert source.n_class == n_class
    model = build_model(cfg.model, source.n_class)
    xj = jnp.zeros((1, 8, IN_DIM), jnp.float32)
    qj = jnp.zeros((1, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), xj, qj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref_model))
    variables = {"params": {**dict(init), **conv}}

    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p, log=lambda *a: None)

    for (o, p), want in ref_moc.items():
        got = res[f"obs{o}_pred{p}"]
        assert abs(got - want) < 5.1e-5, (o, p, got, want)
    np.testing.assert_allclose(res["ant_acc"], ref_ant, atol=1e-6)


# --------------------------------------------------------------------------
# nturgbd: the LIVE NTU model is the RNN (main_nturgbd.py:20) and its sweep
# calls it RGB-only (predict_nturgbd.py:305 — the fusion call sits commented
# at :304); exclusion id is 120 (:330). Depth features must exist on disk
# (loaded unconditionally, :273) even though the model never consumes them.
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ntu_disk(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_ntu") / "datasets" / "nturgbd"
    rng = np.random.RandomState(41)
    acts = [f"a{i}" for i in range(N_ACTIONS)]
    for d in ["features", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts))
    )
    vids = []
    for v in range(5):
        L = int(rng.randint(46, 90))
        labels = []
        while len(labels) < L:
            labels.extend([acts[rng.randint(N_ACTIONS)]] * rng.randint(5, 14))
        labels = labels[:L]
        np.save(root / "features" / f"v{v}.npy",
                rng.randn(L, IN_DIM).astype(np.float32))
        np.save(root / "features_depth" / f"v{v}.npy",
                rng.randn(L, DEPTH_DIM).astype(np.float32))
        with open(root / "groundTruth" / f"v{v}.txt", "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    return root


# --------------------------------------------------------------------------
# darai: the LIVE darai sweep (make_gif.predict) is unrunnable as committed
# (COMPAT #33); evaluation/predict_darai.py is the RUNNABLE darai protocol —
# multi-sequence {base}_{seq} walk, 3-field csv gt, query-conditioned model
# call (predict_darai.py:236-276), per-window ant accuracy whose 10x weight
# cancels (weighted_accuracy, :175-234), MoC over the L2 stream.
# --------------------------------------------------------------------------

DAR_L2 = [f"act{i}" for i in range(4)]
DAR_L3 = [f"fine{i}" for i in range(5)]
BANG_RE = re.compile(r"!{3,}\s+([\d.eE+-]+)")


@pytest.fixture(scope="module")
def darai_disk(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_darai") / "datasets" / "darai"
    rng = np.random.RandomState(53)
    for d in ["features_temp", "groundTruth_nov11", "splits", "imgs"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(DAR_L2))
    )
    (root / "mapping_l3_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(DAR_L3))
    )
    # one tiny frame reused by every gt row (the sweep's visualization
    # helper PIL-opens the per-row image path, predict_darai.py:191-203)
    from PIL import Image

    Image.new("RGB", (8, 8), (90, 40, 20)).save(root / "imgs" / "f.png")
    vids = []
    for v in range(3):
        for seq in (1, 2):
            L = int(rng.randint(30, 55))
            l2, l3 = [], []
            while len(l2) < L:
                l2.extend([DAR_L2[rng.randint(len(DAR_L2))]] * rng.randint(4, 9))
            while len(l3) < L:
                l3.extend([DAR_L3[rng.randint(len(DAR_L3))]] * rng.randint(3, 7))
            np.save(root / "features_temp" / f"v{v}_{seq}.npy",
                    rng.randn(L, IN_DIM).astype(np.float32))
            (root / "groundTruth_nov11" / f"v{v}_{seq}.txt").write_text(
                "".join(
                    f"datasets/darai/imgs/f.png,{l2[t]},{l3[t]}\n"
                    for t in range(L)
                )
            )
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    return root


@pytest.mark.parametrize("obs_p", [0.3])
def test_darai_e2e_moc_parity(darai_disk, tmp_path, obs_p):
    """evaluation/predict_darai.predict (the runnable darai sweep) vs our
    Predictor on the darai multi-sequence layout: MoC table + the printed
    per-window anticipation accuracy (acc/idx) must agree."""
    import dataclasses

    import matplotlib

    matplotlib.use("Agg")  # predict_darai imports pyplot at module import
    from predict_darai import predict as ref_predict
    from model.futr_proposed import FUTR as RefProposed

    actions_dict = read_mapping(darai_disk / "mapping_l2_changed.txt")
    query_dict = read_mapping(darai_disk / "mapping_l3_changed.txt")
    n_class = len(actions_dict) + 1
    pad_idx = n_class + 1                       # main_darai.py:113
    query_num = len(query_dict) + 1             # COMPAT #26 pad slot

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="darai")
    torch.manual_seed(37)
    ref_model = RefProposed(
        n_class, HID, pad_idx, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
        query_num=query_num,
    )
    ref_model.eval()
    torch_ref.zero_dropout(ref_model)

    vid_list = [f"v{v}.txt" for v in range(3)]
    buf = io.StringIO()
    with chdir(darai_disk.parent.parent), redirected_refpaths(tmp_path):
        os.makedirs("save_dir/darai/visualization", exist_ok=True)
        with contextlib.redirect_stdout(buf):
            ref_predict(ref_model, vid_list, args, obs_p, n_class,
                        actions_dict, torch.device("cpu"), query_dict)
    ref_moc = parse_moc(buf.getvalue())
    assert len(ref_moc) == 4
    ref_ant = float(BANG_RE.search(buf.getvalue()).group(1))

    base = get_config("darai")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(darai_disk.parent),
            features_dir="features_temp", gt_dir="groundTruth_nov11",
            depth_features_dir=None, multi_sequence=True,
            seq_buckets=(32, 64), sample_rate=SR, feature_dtype="float32",
        ),
        model=ModelConfig(
            model="futr_proposed", hidden_dim=HID, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
            input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
            query_num=query_num, seg_excludes_none=True,
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
        eval=EvalConfig(ant_acc_mode="unweighted"),
    )
    source = build_source(cfg.data, "train_split.txt")
    assert source.n_class == n_class and source.pad_idx == pad_idx
    assert len(source.units()) == 6             # 3 videos x 2 sequences
    model = build_model(cfg.model, source.n_class)
    xj = jnp.zeros((1, 8, IN_DIM), jnp.float32)
    qj = jnp.zeros((1, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), xj, qj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref_model))
    variables = {"params": {**dict(init), **conv}}

    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p, log=lambda *a: None)

    for (o, p), want in ref_moc.items():
        got = res[f"obs{o}_pred{p}"]
        assert abs(got - want) < 5.1e-5, (o, p, got, want)
    np.testing.assert_allclose(res["ant_acc"], ref_ant, atol=1e-6)


@pytest.mark.parametrize("obs_p", [0.2, 0.3])
def test_nturgbd_e2e_moc_parity(ntu_disk, tmp_path, obs_p):
    """evaluation/predict_nturgbd.predict with the live RNN model on
    torch-CPU vs our Predictor(model='rnn') on the same files + converted
    weights — MoC table + weighted ant acc + seg acc.  Also pins the
    bucketed-batch masking: the reference runs B=1 unpadded, so our padded
    buckets must mask the BiLSTM reverse pass and the pool(8) bins."""
    import dataclasses

    from predict_nturgbd import predict as ref_predict
    from model.rnn import FUTR as RefRNN

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="nturgbd")
    torch.manual_seed(17)
    ref_model = RefRNN(
        N_CLASS, HID, PAD_IDX, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
    )
    ref_model.eval()
    torch_ref.zero_dropout(ref_model)

    vid_list = sorted(
        f for f in os.listdir(ntu_disk / "groundTruth") if f.endswith(".txt")
    )
    buf = io.StringIO()
    with chdir(ntu_disk.parent.parent), redirected_refpaths(tmp_path):
        with contextlib.redirect_stdout(buf):
            ref_ant, ref_seg = ref_predict(
                ref_model, vid_list, args, obs_p, N_CLASS,
                dict_of_actions(ntu_disk), torch.device("cpu"),
            )
    ref_moc = parse_moc(buf.getvalue())
    assert len(ref_moc) == 4

    base = get_config("nturgbd")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(ntu_disk.parent),
            features_dir="features", depth_features_dir=None,
            seq_buckets=(64, 128), sample_rate=SR, feature_dtype="float32",
        ),
        model=ModelConfig(
            model="rnn", hidden_dim=HID, n_query=NQ, input_dim=IN_DIM,
            max_pos_len=128, compute_dtype="float32",
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
    )
    source = build_source(cfg.data, "train_split.txt")
    assert source.n_class == N_CLASS and source.pad_idx == PAD_IDX
    model = build_model(cfg.model, source.n_class)
    params = jax.tree.map(
        jnp.asarray, torch_ref.rnn_baseline_params(ref_model)
    )
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(
        {"params": params}, source, obs_p, log=lambda *a: None
    )

    for (o, p), want in ref_moc.items():
        got = res[f"obs{o}_pred{p}"]
        assert abs(got - want) < 5.1e-5, (o, p, got, want)
    np.testing.assert_allclose(res["ant_acc"], ref_ant, atol=1e-6)
    np.testing.assert_allclose(res["seg_acc"], ref_seg, atol=1e-6)


# --------------------------------------------------------------------------
# The remaining predict variants (VERDICT r4 item 7) — every one a DEAD
# comment-toggle in the reference mains (main_proposed.py:24,
# main_darai.py:42; predict_salad.py is imported nowhere at all), pinned
# here so no evaluation/ file is left without a pin or a COMPAT row.
# --------------------------------------------------------------------------


def test_predict_salad_unrunnable(tmp_path):
    """predict_salad.py is dead (no import site) AND unrunnable: its loop
    body reads `all_content` (predict_salad.py:57) and `query` (:66) that
    are never assigned — NameError on the first video.  Its second
    `gt_read.read()` (:52) would also always yield an empty query stream.
    COMPAT #34."""
    from predict_salad import predict as ref_predict_salad

    root = tmp_path / "datasets" / "50salads"
    for d in ["groundTruth", "features"]:
        os.makedirs(root / d)
    (root / "groundTruth" / "v0.txt").write_text("a\nb\na\n")
    np.save(root / "features" / "v0.npy",
            np.zeros((IN_DIM, 3), np.float32))
    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=1, dataset="50salads")
    model = torch.nn.Identity()  # never reached past the NameError
    with chdir(tmp_path):
        with pytest.raises(NameError, match="all_content"):
            ref_predict_salad(
                model, ["v0.txt"], args, 0.3, 3, {"a": 0, "b": 1},
                torch.device("cpu"), {},
            )


@pytest.mark.parametrize("obs_p", [0.3])
def test_predict_with_query_e2e_moc_parity(breakfast_disk, tmp_path, obs_p):
    """evaluation/predict_with_query.py (comment-toggle, main_proposed.py:24)
    vs our Predictor.  Same protocol as the pinned predict_breakfast minus
    its deltas: the query stream conditions the model RAW (no 0/1 mod2
    re-encode -> query_mod2=False), the query lookup skips `.replace(' ','')`
    (predict_with_query.py:16 — immaterial for space-free taxonomies,
    KeyError otherwise), and there is no past_len/sample_rate > 2000 skip
    (-> max_eval_len=None).  MoC table must agree cell-for-cell."""
    import dataclasses

    from predict_with_query import predict as ref_predict_wq
    from model.futr_proposed import FUTR as RefProposed

    actions_dict = read_mapping(breakfast_disk / "mapping_l2.txt")
    query_dict = read_mapping(breakfast_disk / "mapping.txt")
    n_class = len(actions_dict) + 1
    pad_idx = n_class - 1                      # main_proposed.py:89
    query_num = len(query_dict) + 1            # COMPAT #26 pad slot

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="breakfast")
    torch.manual_seed(23)
    ref_model = RefProposed(
        n_class, HID, pad_idx, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
        query_num=query_num,
    )
    ref_model.eval()
    torch_ref.zero_dropout(ref_model)

    vid_list = sorted(
        f for f in os.listdir(breakfast_disk / "groundTruth")
        if f.endswith(".txt")
    )
    buf = io.StringIO()
    with chdir(breakfast_disk.parent.parent), redirected_refpaths(tmp_path):
        with contextlib.redirect_stdout(buf):
            ref_predict_wq(ref_model, vid_list, args, obs_p, n_class,
                           actions_dict, torch.device("cpu"), query_dict)
    ref_moc = parse_moc(buf.getvalue())
    assert len(ref_moc) == 4

    base = get_config("breakfast_proposed")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(breakfast_disk.parent),
            seq_buckets=(64, 128), sample_rate=SR, feature_dtype="float32",
            train_obs_percs=(obs_p,),
        ),
        model=ModelConfig(
            model="futr_proposed", hidden_dim=HID, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
            input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
            query_num=query_num, seg_excludes_none=True,
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
        eval=dataclasses.replace(
            base.eval, query_mod2=False, max_eval_len=None,
        ),
    )
    source = build_source(cfg.data, "train.split1.bundle")
    assert source.n_class == n_class
    model = build_model(cfg.model, source.n_class)
    xj = jnp.zeros((1, 8, IN_DIM), jnp.float32)
    qj = jnp.zeros((1, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), xj, qj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref_model))
    variables = {"params": {**dict(init), **conv}}

    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p, log=lambda *a: None)

    for (o, p), want in ref_moc.items():
        got = res[f"obs{o}_pred{p}"]
        assert abs(got - want) < 5.1e-5, (o, p, got, want)


@pytest.mark.parametrize("obs_p", [0.3])
def test_predict_darai_temp2_prefix_bug_pinned(darai_disk, tmp_path, obs_p):
    """evaluation/predict_darai_temp2.py (comment-toggle, main_darai.py:42)
    is the pinned predict_darai MoC protocol with ONE delta: it seeds the
    evaluated sequence with the raw query-slot class ids instead of the
    observed L2 labels (`prediction = action.cpu().numpy()`,
    predict_darai_temp2.py:116 vs predict_darai.py:353 `= past_seq`), so
    eval_file scores a sequence whose future segment sits shifted by
    past_len - n_query and whose prefix holds stringified ints.  Pinned by
    reproducing that exact corruption from OUR weight-copied model + decode
    and matching temp2's printed MoC table; the correctly-prefixed MoC
    (our Predictor's protocol, == predict_darai per
    test_darai_e2e_moc_parity) must DIFFER — the bug is observable.
    COMPAT #35."""
    import dataclasses

    from predict_darai_temp2 import predict as ref_predict_t2
    from model.futr_proposed import FUTR as RefProposed
    from utils import eval_file as ref_eval_file

    from r3d_tpu.eval.decode import decode_anticipation

    actions_dict = read_mapping(darai_disk / "mapping_l2_changed.txt")
    query_dict = read_mapping(darai_disk / "mapping_l3_changed.txt")
    n_class = len(actions_dict) + 1
    pad_idx = n_class + 1                      # main_darai.py:113
    query_num = len(query_dict) + 1
    NONE = n_class - 1
    eval_p = [0.1, 0.2, 0.3, 0.5]

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128,
                             sample_rate=SR, dataset="darai")
    torch.manual_seed(37)
    ref_model = RefProposed(
        n_class, HID, pad_idx, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
        query_num=query_num,
    )
    ref_model.eval()
    torch_ref.zero_dropout(ref_model)

    vid_list = [f"v{v}.txt" for v in range(3)]
    buf = io.StringIO()
    with chdir(darai_disk.parent.parent), redirected_refpaths(tmp_path):
        with contextlib.redirect_stdout(buf):
            ref_predict_t2(ref_model, vid_list, args, obs_p, n_class,
                           actions_dict, torch.device("cpu"), query_dict)
    t2_moc = parse_moc(buf.getvalue())
    assert len(t2_moc) == 4

    # our arm: weight-copied flax model, reference-identical preprocessing
    cfg_model = ModelConfig(
        model="futr_proposed", hidden_dim=HID, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
        input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
        query_num=query_num, seg_excludes_none=True,
    )
    model = build_model(cfg_model, n_class)
    xj = jnp.zeros((1, 8, IN_DIM), jnp.float32)
    qj = jnp.zeros((1, 8), jnp.int32)
    init = model.init(jax.random.PRNGKey(0), xj, qj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref_model))
    variables = {"params": {**dict(init), **conv}}

    inv = {v: k for k, v in actions_dict.items()}
    inv[NONE] = "NONE"                         # actions_dict_with_NONE

    def moc_with_prefix(use_bug_prefix):
        T = np.zeros((len(eval_p), len(actions_dict)))
        F = np.zeros((len(eval_p), len(actions_dict)))
        for v in range(3):
            for seq in (1, 2):
                gt = (darai_disk / "groundTruth_nov11" /
                      f"v{v}_{seq}.txt").read_text().splitlines()
                rows = [l.split(",") for l in gt if len(l.split(",")) == 3]
                all_content = [r[1] for r in rows]
                query = [r[2] for r in rows]
                feats = np.load(
                    darai_disk / "features_temp" / f"v{v}_{seq}.npy"
                )
                vid_len = len(all_content)
                past_len = int(obs_p * vid_len)
                future_len = int(0.5 * vid_len)
                x = feats[:past_len][::SR]
                q = np.array(
                    [query_dict[s] for s in query[:past_len][::SR]],
                    np.int32,
                )
                out = model.apply(
                    variables, jnp.asarray(x)[None], jnp.asarray(q)[None],
                    train=False,
                )
                logits = np.asarray(out["action"][0], np.float32)
                dur = np.asarray(out["duration"][0], np.float32).reshape(-1)
                frames, _ = decode_anticipation(
                    logits, dur, future_len, NONE
                )
                if use_bug_prefix:
                    # predict_darai_temp2.py:116 — raw query-slot ids
                    pred = np.argmax(logits, -1).astype(np.int64)
                else:
                    pred = np.asarray(all_content[:past_len])
                for f in frames:                # :117-118 loop semantics
                    pred = np.concatenate((pred, [inv[int(f)]]))
                for i, p in enumerate(eval_p):
                    eval_len = int((obs_p + p) * vid_len)
                    ta, fa = ref_eval_file(
                        all_content, pred[:eval_len], obs_p, actions_dict
                    )
                    T[i] += ta
                    F[i] += fa
        moc = {}
        for i, p in enumerate(eval_p):
            acc = n = 0
            tot = T + F
            for j in range(len(actions_dict)):
                if tot[i, j] != 0:
                    acc += float(T[i, j] / tot[i, j])
                    n += 1
            moc[(int(100 * obs_p), int(100 * p))] = acc / n
        return moc

    bugged = moc_with_prefix(True)
    correct = moc_with_prefix(False)
    for key, want in t2_moc.items():
        assert abs(bugged[key] - want) < 5.1e-5, (key, bugged[key], want)
    assert any(
        abs(bugged[k] - correct[k]) > 1e-6 for k in t2_moc
    ), "prefix bug not observable on this data"
