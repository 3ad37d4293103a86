"""COMPOSED full-protocol parity, fourth family: the NTU unimodal chain.

The one reference entry point whose COMMITTED toggle wiring is runnable
end-to-end with NO pairing repair: ``main_nturgbd.py`` as committed wires
``basedataset_nturgbd`` + ``model/rnn.py`` + ``train_unimodal.train`` +
``predict_nturgbd.predict`` (main_nturgbd.py:20,32,38,43) — every call
signature matches.  This family composes what the other three cannot:

- the ``train_unimodal`` fork's OWN deltas: weighted CE with
  ``exclude_class_idx=120`` on the anticipation loss
  (train_unimodal.py:212, vs train_proposed's plain CE :210), a validate
  with the seg term commented out and an UNMASKED duration loss
  (:94-99,121 — loss-only, the gate reads the two accuracies), and the
  RGB-only model call (``model(inputs)``, :186) while the loader still
  ships depth the loop ignores (:148);
- the RNN baseline trained and swept end-to-end (the e2e MoC test pins its
  weight-copy sweep; here the whole train -> two-metric gate -> 3-seed
  ``predict_nturgbd`` sweep chain is the oracle).

Shape note — why every sequence strides to ONE frame (VID_LEN=24, SR=16,
same as the darai/50salads families): the reference RNN computes its pad
mask and then never applies it (model/rnn.py:76-77 builds
src_key_padding_mask; the LSTM at :93 consumes pad rows) — on any
length-mixed collated batch the reference's training forward READS padding,
while our BiLSTM is mask-aware (seq_lengths; bucketed == unpadded pinned by
test_baseline_parity).  Equal-length rows are the only regime where the two
well-defined semantics coincide, exactly like the focal-gather constraint
in the darai family (COMPAT #39).  All 12 train rows land in one bucket =
one batch per epoch on both arms.
"""

import contextlib
import io
import os
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
import torch  # noqa: E402

import torch_ref  # noqa: E402
from test_composed_protocol_50salads import _pl_bolts_factor  # noqa: E402
from test_composed_protocol_parity import parse_gate  # noqa: E402
from test_e2e_moc_parity import (  # noqa: E402
    ANT_RE, chdir, parse_moc, redirected_refpaths,
)

from r3d_tpu.config import (  # noqa: E402
    EvalConfig, ModelConfig, TrainConfig, get_config,
)

torch_ref.patch_cuda_free()

SEEDS = [1, 10, 13452]            # main_nturgbd.py:188-193
EPOCHS = 8
WARMUP = 4
LR, WD = 5e-3, 5e-3
# 120 action names like the real NTU mapping: n_class=121, NONE=120 — the
# loop/sweep's hard-coded exclude_class_idx=120 (train_unimodal.py:102,212;
# predict_nturgbd.py:330) is the NONE id, i.e. the gate's val_acc counts
# only the real-action slots.  The data uses the first 4 actions.
NTU_ACTS = [f"act{i}" for i in range(120)]
N_USED = 4
N_CLASS = len(NTU_ACTS) + 1       # + NONE = 121
PAD_IDX = N_CLASS + 1
NQ = 8                            # the RNN pools to 8 slots (rnn.py:97)
VID_LEN = 24
SR = 16
IN_DIM = 16
DEPTH_DIM = 8                     # loaded + collated, ignored by the loop
HID = 32
BATCH = 12                        # 4 train videos x 3 ratios: ONE batch


@pytest.fixture(scope="module")
def ntu_disk(tmp_path_factory):
    """nturgbd layout (csv gt, features_img + features_depth), learnable:
    frames 0-15 class a=(v+seed-ish) mod 4, frames 16-23 class (a+1) mod 4;
    features one-hot the frame's class.  Depth files exist because the
    reference dataset loads and collates them (basedataset_nturgbd.py:
    126-133) even though train_unimodal ignores the stream."""
    root = tmp_path_factory.mktemp("composedntu") / "datasets" / "nturgbd"
    rng = np.random.RandomState(313)
    for d in ["features", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(NTU_ACTS))
    )
    SEG = 16

    def write(name, idx):
        a = idx % N_USED
        ids = [(a + t // SEG) % N_USED for t in range(VID_LEN)]
        feats = np.zeros((VID_LEN, IN_DIM), np.float32)
        for t, i in enumerate(ids):
            feats[t, i] = 8.0
        feats += 0.05 * rng.randn(VID_LEN, IN_DIM).astype(np.float32)
        np.save(root / "features" / f"{name}.npy", feats)
        np.save(root / "features_depth" / f"{name}.npy",
                rng.randn(VID_LEN, DEPTH_DIM).astype(np.float32))
        (root / "groundTruth" / f"{name}.txt").write_text(
            "".join(f"img{t},{NTU_ACTS[i]},q{t % 3}\n"
                    for t, i in enumerate(ids))
        )
        return f"{name}.txt"

    train_vids = [write(f"v{v}", v) for v in range(4)]
    val_vids = [write(f"w{v}", v + 1) for v in range(3)]
    (root / "splits" / "train_split.txt").write_text(
        "\n".join(train_vids) + "\n")
    (root / "splits" / "val_split.txt").write_text("\n".join(val_vids) + "\n")
    return root


def make_args():
    return torch_ref.RefArgs(
        input_dim=IN_DIM, max_pos_len=128, sample_rate=SR,
        dataset="nturgbd", epochs=EPOCHS, task="long",
    )


def make_ref_model(seed):
    """model/rnn.py — the committed main_nturgbd toggle (main_nturgbd.py:20);
    its forward matches train_unimodal's ``model(inputs)`` and the sweep's
    ``model(inputs, mode='test')`` verbatim."""
    from model.rnn import FUTR as RefRNN

    torch.manual_seed(seed)
    m = RefRNN(
        N_CLASS, HID, PAD_IDX, torch.device("cpu"), make_args(), n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1,
    )
    torch_ref.zero_dropout(m)
    return m


def read_mapping(path):
    return {
        name: int(i)
        for line in path.read_text().splitlines()
        for i, name in [line.split(" ", 1)]
    }


def _loaders(ntu_disk, args):
    from torch.utils.data import DataLoader

    if "/root/reference/data" not in sys.path:
        sys.path.insert(0, "/root/reference/data")
    from basedataset_nturgbd import BaseDataset as RefDataset

    actions_dict = read_mapping(ntu_disk / "mapping_l2_changed.txt")
    train_vids = (ntu_disk / "splits" / "train_split.txt").read_text().split()
    val_vids = (ntu_disk / "splits" / "val_split.txt").read_text().split()
    feat = str(ntu_disk / "features")
    depth = str(ntu_disk / "features_depth")
    gt = str(ntu_disk / "groundTruth")
    trainset = RefDataset(train_vids, actions_dict, feat, depth, gt,
                          PAD_IDX, N_CLASS, n_query=NQ, args=args)
    valset = RefDataset(val_vids, actions_dict, feat, depth, gt,
                        PAD_IDX, N_CLASS, n_query=NQ, args=args)
    assert len(trainset) == BATCH           # one batch per epoch (see doc)
    tl = DataLoader(trainset, batch_size=BATCH, shuffle=False,
                    collate_fn=trainset.my_collate)
    # every reference val loader is batch_size=1 (main_nturgbd.py:179)
    vl = DataLoader(valset, batch_size=1, shuffle=False,
                    collate_fn=valset.my_collate)
    return tl, vl, actions_dict, val_vids


PRE_EPOCHS = 6
PRE_LR = 5e-3
_PRETRAIN_CACHE = {}


def pretrained_state(seed, ntu_disk, tmp_path):
    """Common per-seed init: torch init advanced PRE_EPOCHS by the verbatim
    reference trainer at flat lr (same rationale as the other families)."""
    if seed in _PRETRAIN_CACHE:
        return {k: v.clone() for k, v in _PRETRAIN_CACHE[seed].items()}
    from train_unimodal import train as ref_train

    args = make_args()
    args.epochs = PRE_EPOCHS
    model = make_ref_model(seed)
    tl, vl, *_ = _loaders(ntu_disk, args)
    opt = torch.optim.AdamW(model.parameters(), PRE_LR, weight_decay=WD)
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda e: 1.0)
    crit = torch.nn.MSELoss(reduction="none")
    scratch = tmp_path / f"pretrainntu_{seed}"
    scratch.mkdir(exist_ok=True)
    with contextlib.redirect_stdout(io.StringIO()):
        ref_train(args, model, tl, opt, sched, crit, str(scratch), PAD_IDX,
                  torch.device("cpu"), vl, seed)
    _PRETRAIN_CACHE[seed] = {
        k: v.clone() for k, v in model.state_dict().items()
    }
    return {k: v.clone() for k, v in _PRETRAIN_CACHE[seed].items()}


def run_reference_arm(ntu_disk, tmp_path):
    from predict_nturgbd import predict as ref_predict
    from train_unimodal import train as ref_train

    args = make_args()
    save_dir = tmp_path / "refntu_ckpts"
    save_dir.mkdir(exist_ok=True)

    gates = {}
    for seed in SEEDS:
        model = make_ref_model(seed)
        model.load_state_dict(pretrained_state(seed, ntu_disk, tmp_path))
        tl, vl, actions_dict, val_vids = _loaders(ntu_disk, args)
        opt = torch.optim.AdamW(model.parameters(), LR, weight_decay=WD)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, _pl_bolts_factor)
        crit = torch.nn.MSELoss(reduction="none")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_train(args, model, tl, opt, sched, crit, str(save_dir),
                      PAD_IDX, torch.device("cpu"), vl, seed)
        gates[seed] = parse_gate(buf.getvalue())

    moc = {}
    ants = {}
    segs = {}
    for obs_p in (0.2, 0.3):
        for seed in SEEDS:
            model = make_ref_model(seed)
            model.load_state_dict(
                torch.load(save_dir / f"seed_{seed}_best.ckpt")
            )
            model.eval()
            _, _, actions_dict, val_vids = _loaders(ntu_disk, args)
            buf = io.StringIO()
            with chdir(ntu_disk.parent.parent), redirected_refpaths(tmp_path):
                with contextlib.redirect_stdout(buf):
                    ant, seg = ref_predict(
                        model, val_vids, args, obs_p, N_CLASS,
                        actions_dict, torch.device("cpu"),
                    )
            moc[(seed, obs_p)] = parse_moc(buf.getvalue())
            ants[(seed, obs_p)] = ant
            segs[(seed, obs_p)] = seg
    return gates, moc, ants, segs


def run_our_arm(ntu_disk, tmp_path):
    import dataclasses

    from flax import serialization

    from r3d_tpu.cli import run as cli_run

    save_dir = tmp_path / "ourntu_ckpts"
    base = get_config("nturgbd")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(ntu_disk.parent),
            features_dir="features", depth_features_dir=None,
            seq_buckets=(1,), sample_rate=SR, feature_dtype="float32",
        ),
        model=ModelConfig(
            model="rnn", hidden_dim=HID, n_query=NQ, input_dim=IN_DIM,
            max_pos_len=128, compute_dtype="float32", dropout=0.0,
        ),
        train=TrainConfig(
            # train_unimodal semantics: two-metric non-sticky gate, weighted
            # CE with exclude 120 (train_unimodal.py:212), min-batch-8 skip
            loop="proposed", batch_size=BATCH, epochs=EPOCHS,
            warmup_epochs=WARMUP, lr=LR, weight_decay=WD,
            exclude_class_idx=120, weighted_ce=True, min_train_batch=8,
            save_dir=str(save_dir), seeds=tuple(SEEDS),
        ),
        eval=dataclasses.replace(base.eval, obs_percs=(0.2, 0.3)),
    )

    gates = {}
    for seed in SEEDS:
        ref = make_ref_model(seed)
        ref.load_state_dict(pretrained_state(seed, ntu_disk, tmp_path))
        params = torch_ref.rnn_baseline_params(ref)
        init_file = tmp_path / f"initntu_{seed}.msgpack"
        init_file.write_bytes(
            serialization.msgpack_serialize({"params": params})
        )
        lines = []
        cli_run.train(
            cfg.replace(train=dataclasses.replace(
                cfg.train, init_ckpt=str(init_file))),
            seed, dataset_ops="composedntu", log=lines.append,
        )
        gates[seed] = parse_gate("\n".join(lines))

    results = cli_run.predict(cfg, dataset_ops="composedntu",
                              log=lambda *a: None)
    return gates, results


@pytest.fixture(scope="module")
def both_arms(ntu_disk, tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("composedntu_run")
    ref = run_reference_arm(ntu_disk, tmp_path)
    ours = run_our_arm(ntu_disk, tmp_path)
    return ref, ours


def test_gate_decisions_match_nturgbd(both_arms):
    """Per-epoch best-checkpoint decisions (val-acc OR weighted-acc,
    train_unimodal.py:255) identical per seed; gate metric values at
    printed %.3f precision."""
    (ref_gates, _, _, _), (our_gates, _) = both_arms
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


def test_seed_averaged_moc_matches_nturgbd(both_arms):
    """The final deliverable: seed-averaged MoC table + weighted
    anticipation accuracy + segmentation accuracy agree across arms
    (one-flip fp-drift bound, same reasoning as the other families)."""
    (_, ref_moc, ref_ants, ref_segs), (_, our_results) = both_arms
    ONE_FLIP = 0.13
    for obs_p in (0.2, 0.3):
        ours = our_results[f"obs{obs_p}"]
        cells = ref_moc[(SEEDS[0], obs_p)].keys()
        assert len(cells) == 4
        for (o, p) in cells:
            ref_mean = np.mean([ref_moc[(s, obs_p)][(o, p)] for s in SEEDS])
            got = ours[f"obs{o}_pred{p}"]
            assert abs(got - ref_mean) < ONE_FLIP, (obs_p, o, p, got, ref_mean)
        ref_ant = np.mean([ref_ants[(s, obs_p)] for s in SEEDS])
        np.testing.assert_allclose(ours["ant_acc"], ref_ant, atol=0.06)
        ref_seg = np.mean([ref_segs[(s, obs_p)] for s in SEEDS])
        np.testing.assert_allclose(ours["seg_acc"], ref_seg, atol=0.06)
