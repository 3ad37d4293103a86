"""COMPOSED full-protocol parity, third family: the darai unsupervised chain.

Mirrors tests/test_composed_protocol_parity.py (fusion/proposed_depth) and
tests/test_composed_protocol_50salads.py (proposed) for the LAST loop family
with a runnable reference chain — the darai unsupervised curriculum:

- train: the ACTUAL ``train_unsupervised.train`` per seed on torch-CPU with
  the only runnable model pairing, ``futr_unsupervised_temp2`` (COMPAT #18:
  the committed futr_unsupervised emits [B,S,C] anticipation logits against
  [B,n_query] targets and temp4 unpacks a commented-out third Transformer
  return; COMPAT #33: the committed main_darai dataset pairing puts depth in
  the loop's ``query_label`` slot — ``data/basedataset_darai.py:292`` is the
  dataset whose collate yields the loop's exact 5-tuple).  The loop gates on
  val-acc OR weighted-acc with seed-named checkpoints
  (train_unsupervised.py:413-425) and is STICKY-eval (COMPAT #37).
- predict: the ACTUAL ``predict_darai.predict`` per (obs, seed) on the
  seed_{s}_best checkpoints — the runnable darai MoC protocol
  (multi-sequence walk, 3-field csv gt, query-conditioned model call;
  test_e2e_moc_parity pins it standalone).  temp2's forward signature
  matches both call sites verbatim — NO shims on this family.
- ours: the CLI (darai-style config, ``model='futr_unsupervised_temp2'``,
  ``loop='unsupervised'``) warm-started from the same per-seed torch init.

This family covers what the other two cannot: the focal-L3 +
temporal-cluster + correctness-gated triangular-warmup composite driving
the TRAINING trajectory the gate rides on, the l3-bearing validate (its
printed line carries an extra "l3 accuracy" field), the multi-sequence
loader, and a batch-ATTENDING model (COMPAT #17: the l3 self-attention runs
across the batch per timestep) — which forces the faithful B=1 protocol end
to end: ``TrainConfig.val_batch_size=1`` (every reference val loader is
batch_size=1, main_darai.py:181) and ``EvalConfig.eval_batch=1`` (the
reference sweep evaluates one video at a time).

Shape note (same design as the 50salads family): every sequence is
VID_LEN=24 frames with sample_rate=16, so train ratios (.2/.3/.5) and sweep
ratios (.1/.2/.3) stride every observed window to ONE frame — all 24 train
rows land in one bucket = ONE batch per epoch (the reference collates the
same single batch), the cross-batch l3 attention sees the identical row set
on both arms, and the query streams never pad (the reference ``focal_loss``
gathers probabilities with the RAW gold ids, utils.py:528 — a padded query
batch would index out of range; equal-length rows are the only regime the
reference can run).

Not asserted: the printed validation LOSS — the reference's unsupervised
validate sums plain-CE cls + seg + focal-l3 with hard-coded (48, 48) pads
(train_unsupervised.py:148-185) while ours keeps the train-side loss
composition; the gate reads only the two accuracies, which are asserted at
printed precision.
"""

import contextlib
import io
import os
import re
import sys

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

if HAS_REF:
    if "/root/reference/train" not in sys.path:   # train/ has no __init__.py
        sys.path.insert(0, "/root/reference/train")
    if os.path.isdir("/root/reference/evaluation"):
        sys.path.insert(0, "/root/reference/evaluation")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

import torch_ref  # noqa: E402
from test_composed_protocol_50salads import _pl_bolts_factor  # noqa: E402
from test_e2e_moc_parity import (  # noqa: E402
    BANG_RE, chdir, parse_moc, redirected_refpaths,
)

from r3d_tpu.config import (  # noqa: E402
    EvalConfig, ModelConfig, TrainConfig, get_config,
)

torch_ref.patch_cuda_free()

SEEDS = [1, 10, 13452]            # main_darai.py:187-193
EPOCHS = 8
WARMUP = 4
LR, WD = 2e-3, 5e-3
DAR_L2 = [f"act{i}" for i in range(4)]
DAR_L3 = [f"fine{i}" for i in range(5)]
N_CLASS = len(DAR_L2) + 1         # + NONE (main_darai.py:112)
PAD_IDX = N_CLASS + 1             # main_darai.py:113
QUERY_NUM = 12                    # fc_l3 width (reference ctor query_num)
NQ = 8
VID_LEN = 24
SR = 16
IN_DIM = 16
HID = 32
BATCH = 24                        # 4 train videos x 2 seqs x 3 ratios: ONE batch

# the unsupervised validate line carries an extra "l3 accuracy" field
# (train_unsupervised.py:205) the fusion/proposed regex does not allow for;
# this relaxed form matches both arms' lines
DVAL_RE = re.compile(
    r"Validation Loss: ([\d.eE+-]+),.*Class Accuracy: ([\d.]+),.*"
    r"Weighted Accuracy: ([\d.]+)"
)


def parse_gate_darai(stdout: str):
    saved, metrics = [], []
    epoch = -1
    for line in stdout.splitlines():
        m = DVAL_RE.search(line)
        if m:
            epoch += 1
            metrics.append((float(m.group(2)), float(m.group(3))))
        elif "Best model saved" in line:
            saved.append(epoch)
    return saved, metrics


@pytest.fixture(scope="module")
def dar_disk(tmp_path_factory):
    """darai-layout dataset (multi-sequence {base}_{seq} files, 3-field csv
    gt), learnable: segment 0 (frames 0-15) is L2 class a=(2v+seq) mod 4,
    segment 1 (frames 16-23) class (a+1) mod 4; features one-hot the frame's
    L2 class; L3 = the L2 id's fine name. Every ratio cut lands in segment 0
    and strides to one frame (see module docstring)."""
    root = tmp_path_factory.mktemp("composeddar") / "datasets" / "darai"
    rng = np.random.RandomState(911)
    for d in ["features_temp", "groundTruth_nov11", "splits", "imgs"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(DAR_L2))
    )
    (root / "mapping_l3_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(DAR_L3))
    )
    # one tiny frame reused by every gt row (predict_darai PIL-opens the
    # per-row image path for its visualization helper, predict_darai.py:191)
    from PIL import Image

    Image.new("RGB", (8, 8), (40, 90, 20)).save(root / "imgs" / "f.png")
    SEG = 16

    def write(name, idx):
        for seq in (1, 2):
            a = (2 * idx + seq) % len(DAR_L2)
            l2_ids = [(a + t // SEG) % len(DAR_L2) for t in range(VID_LEN)]
            feats = np.zeros((VID_LEN, IN_DIM), np.float32)
            for t, i in enumerate(l2_ids):
                feats[t, i] = 3.0
            feats += 0.05 * rng.randn(VID_LEN, IN_DIM).astype(np.float32)
            np.save(root / "features_temp" / f"{name}_{seq}.npy", feats)
            (root / "groundTruth_nov11" / f"{name}_{seq}.txt").write_text(
                "".join(
                    f"datasets/darai/imgs/f.png,{DAR_L2[i]},{DAR_L3[i]}\n"
                    for i in l2_ids
                )
            )
        return f"{name}.txt"

    train_vids = [write(f"v{v}", v) for v in range(4)]
    val_vids = [write(f"w{v}", v) for v in range(2)]
    (root / "splits" / "train_split.txt").write_text(
        "\n".join(train_vids) + "\n")
    (root / "splits" / "val_split.txt").write_text("\n".join(val_vids) + "\n")
    return root


def make_args():
    return torch_ref.RefArgs(
        input_dim=IN_DIM, max_pos_len=128, sample_rate=SR,
        dataset="darai", epochs=EPOCHS, task="long",
    )


def make_ref_model(seed):
    """futr_unsupervised_temp2 — the runnable train_unsupervised pairing
    (COMPAT #18); its signature matches train AND sweep verbatim."""
    from model.futr_unsupervised_temp2 import FUTR as RefTemp2

    torch.manual_seed(seed)
    m = RefTemp2(
        N_CLASS, HID, PAD_IDX, torch.device("cpu"), make_args(), n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
        query_num=QUERY_NUM,
    )
    torch_ref.zero_dropout(m)
    return m


def read_mapping(path):
    return {
        name: int(i)
        for line in path.read_text().splitlines()
        for i, name in [line.split(" ", 1)]
    }


def _import_ref_dataset():
    """Import data/basedataset_darai with a MINIMAL torchvision stub: the
    module imports ``torchvision.models`` at top level (basedataset_darai.py:
    290-area header) but the live class (``:292``) never touches it — only
    dead/commented legacy code did.  torchvision is not in this image."""
    import types

    stubbed = "torchvision" not in sys.modules
    if stubbed:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.transforms"] = tv.transforms
    try:
        from data.basedataset_darai import BaseDataset as RefDataset
    finally:
        if stubbed:
            sys.modules.pop("torchvision", None)
            sys.modules.pop("torchvision.models", None)
            sys.modules.pop("torchvision.transforms", None)
    return RefDataset


def _loaders(dar_disk, args):
    from torch.utils.data import DataLoader

    RefDataset = _import_ref_dataset()

    actions_dict = read_mapping(dar_disk / "mapping_l2_changed.txt")
    query_dict = read_mapping(dar_disk / "mapping_l3_changed.txt")
    feat = str(dar_disk / "features_temp")
    gt = str(dar_disk / "groundTruth_nov11")
    trainset = RefDataset(
        str(dar_disk / "splits" / "train_split.txt"), actions_dict, feat, gt,
        PAD_IDX, N_CLASS, n_query=NQ, args=args, query_dict=query_dict,
    )
    valset = RefDataset(
        str(dar_disk / "splits" / "val_split.txt"), actions_dict, feat, gt,
        PAD_IDX, N_CLASS, n_query=NQ, args=args, query_dict=query_dict,
    )
    assert len(trainset) == BATCH           # one batch per epoch (see doc)
    tl = DataLoader(trainset, batch_size=BATCH, shuffle=False,
                    collate_fn=trainset.my_collate)
    # every reference val loader is batch_size=1 (main_darai.py:181)
    vl = DataLoader(valset, batch_size=1, shuffle=False,
                    collate_fn=valset.my_collate)
    val_vids = [v for v in
                (dar_disk / "splits" / "val_split.txt").read_text().split()]
    return tl, vl, actions_dict, query_dict, val_vids


PRE_EPOCHS = 3
PRE_LR = 2e-3
_PRETRAIN_CACHE = {}


def pretrained_state(seed, dar_disk, tmp_path):
    """Common per-seed init: torch init advanced PRE_EPOCHS by the verbatim
    reference trainer at flat lr (same rationale as the other families —
    gate decisions from a raw init are degenerate)."""
    if seed in _PRETRAIN_CACHE:
        return {k: v.clone() for k, v in _PRETRAIN_CACHE[seed].items()}
    from train_unsupervised import train as ref_train

    args = make_args()
    args.epochs = PRE_EPOCHS
    model = make_ref_model(seed)
    tl, vl, *_ = _loaders(dar_disk, args)
    opt = torch.optim.AdamW(model.parameters(), PRE_LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda e: 1.0)
    crit = torch.nn.MSELoss(reduction="none")
    scratch = tmp_path / f"pretraindar_{seed}"
    scratch.mkdir(exist_ok=True)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_train(args, model, tl, opt, sched, crit, str(scratch), PAD_IDX,
                  torch.device("cpu"), vl, seed)
    _PRETRAIN_CACHE[seed] = {
        k: v.clone() for k, v in model.state_dict().items()
    }
    return {k: v.clone() for k, v in _PRETRAIN_CACHE[seed].items()}


def temp2_params(ref):
    """torch temp2 -> our FUTRUnsupervised(variant='temp2') param tree (the
    same mapping test_unsupervised_parity.py::test_temp2_full_parity_eval
    pins numerically)."""
    p = {"embed": {}, "heads": {}}
    torch_ref.linear(p["embed"], "input_embed", ref.input_embed)
    p["pos_embedding"] = torch_ref.t2n(ref.pos_embedding)
    p["query_embed"] = torch_ref.t2n(ref.query_embed.weight)
    p["transformer"] = torch_ref.transformer_params(ref.transformer)
    torch_ref.linear(p["heads"], "fc", ref.fc)
    torch_ref.linear(p["heads"], "fc_len", ref.fc_len)
    torch_ref.linear(p["heads"], "fc_seg", ref.fc_seg)
    torch_ref.mha(p, "l3_attention", ref.l3_attention)
    torch_ref.linear(p, "fc_l3", ref.fc_l3)
    return p


def run_reference_arm(dar_disk, tmp_path):
    from predict_darai import predict as ref_predict
    from train_unsupervised import train as ref_train

    args = make_args()
    save_dir = tmp_path / "refdar_ckpts"
    save_dir.mkdir(exist_ok=True)

    gates = {}
    for seed in SEEDS:
        model = make_ref_model(seed)
        model.load_state_dict(pretrained_state(seed, dar_disk, tmp_path))
        tl, vl, actions_dict, query_dict, val_vids = _loaders(dar_disk, args)
        opt = torch.optim.AdamW(model.parameters(), LR, weight_decay=WD)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, _pl_bolts_factor)
        crit = torch.nn.MSELoss(reduction="none")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_train(args, model, tl, opt, sched, crit, str(save_dir),
                      PAD_IDX, torch.device("cpu"), vl, seed)
        gates[seed] = parse_gate_darai(buf.getvalue())

    # the sweep: per (obs, seed) on seed_{s}_best (main_darai.py:155-166
    # wires the unrunnable make_gif.predict — COMPAT #33; predict_darai is
    # the runnable darai protocol, pinned standalone by
    # test_darai_e2e_moc_parity)
    moc = {}
    ants = {}
    import matplotlib

    matplotlib.use("Agg")
    for obs_p in (0.1, 0.2, 0.3):
        for seed in SEEDS:
            model = make_ref_model(seed)
            model.load_state_dict(
                torch.load(save_dir / f"seed_{seed}_best.ckpt")
            )
            model.eval()
            _, _, actions_dict, query_dict, val_vids = _loaders(
                dar_disk, args)
            buf = io.StringIO()
            with chdir(dar_disk.parent.parent), redirected_refpaths(tmp_path):
                os.makedirs("save_dir/darai/visualization", exist_ok=True)
                with contextlib.redirect_stdout(buf):
                    ref_predict(model, val_vids, args, obs_p, N_CLASS,
                                actions_dict, torch.device("cpu"),
                                query_dict)
            moc[(seed, obs_p)] = parse_moc(buf.getvalue())
            ants[(seed, obs_p)] = float(BANG_RE.search(buf.getvalue()).group(1))
    return gates, moc, ants


def run_our_arm(dar_disk, tmp_path):
    import dataclasses

    from flax import serialization

    from r3d_tpu.cli import run as cli_run

    save_dir = tmp_path / "ourdar_ckpts"
    base = get_config("darai")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(dar_disk.parent),
            features_dir="features_temp", gt_dir="groundTruth_nov11",
            depth_features_dir=None, multi_sequence=True,
            seq_buckets=(1,), sample_rate=SR, feature_dtype="float32",
        ),
        model=ModelConfig(
            model="futr_unsupervised_temp2", hidden_dim=HID, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ,
            input_dim=IN_DIM, max_pos_len=128, compute_dtype="float32",
            dropout=0.0, query_num=QUERY_NUM, log_erank=False,
        ),
        train=TrainConfig(
            loop="unsupervised", batch_size=BATCH, val_batch_size=1,
            epochs=EPOCHS, warmup_epochs=WARMUP, lr=LR, weight_decay=WD,
            exclude_class_idx=None, l3_pad_idx=47, l3_exclude_idx=48,
            min_train_batch=8, save_dir=str(save_dir), seeds=tuple(SEEDS),
        ),
        eval=EvalConfig(obs_percs=(0.1, 0.2, 0.3), ant_acc_mode="unweighted",
                        eval_batch=1),
    )

    gates = {}
    for seed in SEEDS:
        ref = make_ref_model(seed)
        ref.load_state_dict(pretrained_state(seed, dar_disk, tmp_path))
        params = temp2_params(ref)
        init_file = tmp_path / f"initdar_{seed}.msgpack"
        init_file.write_bytes(
            serialization.msgpack_serialize({"params": params})
        )
        lines = []
        cli_run.train(
            cfg.replace(train=dataclasses.replace(
                cfg.train, init_ckpt=str(init_file))),
            seed, dataset_ops="composeddar", log=lines.append,
        )
        gates[seed] = parse_gate_darai("\n".join(lines))

    results = cli_run.predict(cfg, dataset_ops="composeddar",
                              log=lambda *a: None)
    return gates, results


@pytest.fixture(scope="module")
def both_arms(dar_disk, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("composeddar_run")
    ref = run_reference_arm(dar_disk, tmp_path)
    ours = run_our_arm(dar_disk, tmp_path)
    return ref, ours


def test_gate_decisions_match_darai(both_arms):
    """Per-epoch best-checkpoint decisions (val-acc OR weighted-acc,
    train_unsupervised.py:413) identical per seed; the two gate metrics at
    printed %.3f precision."""
    (ref_gates, _, _), (our_gates, _) = both_arms
    for seed in SEEDS:
        ref_saved, ref_vals = ref_gates[seed]
        our_saved, our_vals = our_gates[seed]
        assert len(ref_vals) == len(our_vals) == EPOCHS, (seed, ref_vals)
        assert ref_saved == our_saved, (
            f"seed {seed}: saved epochs diverge {ref_saved} vs {our_saved}"
        )
        for e, ((rv, rw), (ov, ow)) in enumerate(zip(ref_vals, our_vals)):
            assert abs(rv - ov) < 5.1e-4, (seed, e, "val_acc", rv, ov)
            assert abs(rw - ow) < 5.1e-4, (seed, e, "weight_acc", rw, ow)


def test_seed_averaged_moc_matches_darai(both_arms):
    """The final deliverable: seed-averaged MoC table + anticipation
    accuracy agree across arms (one-flip fp-drift bound, same reasoning as
    the other families)."""
    (_, ref_moc, ref_ants), (_, our_results) = both_arms
    ONE_FLIP = 0.12
    for obs_p in (0.1, 0.2, 0.3):
        ours = our_results[f"obs{obs_p}"]
        cells = ref_moc[(SEEDS[0], obs_p)].keys()
        assert len(cells) == 4
        for (o, p) in cells:
            ref_mean = np.mean([ref_moc[(s, obs_p)][(o, p)] for s in SEEDS])
            got = ours[f"obs{o}_pred{p}"]
            assert abs(got - ref_mean) < ONE_FLIP, (obs_p, o, p, got, ref_mean)
        ref_ant = np.mean([ref_ants[(s, obs_p)] for s in SEEDS])
        np.testing.assert_allclose(ours["ant_acc"], ref_ant, atol=0.06)
