"""e2e pin for ``evaluation/predict_tcn_darai.py`` (VERDICT r4 missing #2).

Unlike ``predict_tcn.py`` (proven unrunnable, COMPAT #29), the darai TCN
protocol RUNS as committed: it walks the darai multi-sequence csv layout
(``{base}_{seq}.txt``/``.npy`` from seq 1, predict_tcn_darai.py:202-210),
calls the TCN as ``model(x=inputs.unsqueeze(0))`` (:252), and prints one
``!!!!!!!!!!!!! ant Acc:`` per obs ratio — the per-sequence mean of a
normal accuracy whose gt==16 exclusion is LIVE and numerator-only (:146-155,
the denominator keeps the full compare length).  This file executes the
verbatim reference on torch-CPU over synthetic darai-layout data and asserts
our ``Predictor(model='tcn', ant_acc_mode='unweighted_excl')`` reproduces
the printed number exactly (COMPAT #41 documents the deltas: dead MoC
scaffolding, header-only relative-path logs, unused query conditioning).
"""

import io
import os
import re
import sys
import types
import contextlib

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
from test_e2e_moc_parity import chdir  # noqa: E402
from r3d_tpu.config import (  # noqa: E402
    DataConfig, EvalConfig, ModelConfig, TrainConfig, get_config,
)
from r3d_tpu.data.datasets import build_source  # noqa: E402
from r3d_tpu.eval.predict import Predictor  # noqa: E402

torch_ref.patch_cuda_free()

BANG_RE = re.compile(r"!{3,}\s+ant Acc:\s+[\d.]+\s+([\d.eE+-]+)")

N_ACTS = 17          # ids 0..16 -> the hard-coded exclude id 16 is LIVE
N_CLASS = N_ACTS + 1  # + NONE (main.py: MustafaNet1DTCN(n_class), :101)
IN_DIM = 16
SR = 2
NQ = 8               # MustafaNet1DTCN anticipated_frames default


@pytest.fixture(scope="module")
def tcn_darai_disk(tmp_path_factory):
    root = tmp_path_factory.mktemp("tcn_darai") / "datasets" / "darai"
    rng = np.random.RandomState(11)
    acts = [f"act{i}" for i in range(N_ACTS)]
    for d in ["features_temp", "groundTruth_nov11", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts)))
    (root / "mapping_l3_changed.txt").write_text(
        "".join(f"{i} q{i}\n" for i in range(4)))
    vids = []
    for v in range(3):
        for seq in (1, 2):
            L = int(rng.randint(50, 80))
            # run-length labels with guaranteed id-16 runs so the live
            # exclusion changes the count
            ids, t = [], 0
            while len(ids) < L:
                a = 16 if (t % 3 == 2) else int(rng.randint(N_ACTS))
                ids.extend([a] * int(rng.randint(4, 9)))
                t += 1
            ids = ids[:L]
            np.save(root / "features_temp" / f"v{v}_{seq}.npy",
                    rng.randn(L, IN_DIM).astype(np.float32))
            with open(root / "groundTruth_nov11" / f"v{v}_{seq}.txt", "w") as f:
                for t in range(L):
                    f.write(f"img{t}.png,{acts[ids[t]]},q{t % 4}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    return root


def _make_ref_model():
    from model.tcn import MustafaNet1DTCN, TemporalConvNet1D

    torch.manual_seed(5)
    ref = MustafaNet1DTCN(num_classes=N_CLASS, anticipated_frames=NQ)
    # shrink the hard-coded 2048-channel stack (tcn.py:70-74) for CPU speed
    ref.tcn_local = TemporalConvNet1D(
        num_inputs=IN_DIM, num_channels=[8, 12, 12, 8], kernel_size=3,
        dropout=0.2,
    )
    ref.regression = torch.nn.Conv1d(8, N_CLASS * NQ, kernel_size=1)
    ref.eval()
    torch_ref.zero_dropout(ref)
    return ref


@pytest.mark.parametrize("obs_p", [0.2, 0.3])
def test_predict_tcn_darai_ant_acc_parity(tcn_darai_disk, tmp_path, obs_p):
    from predict_tcn_darai import predict as ref_predict

    actions_dict = {f"act{i}": i for i in range(N_ACTS)}
    query_dict = {f"q{i}": i for i in range(4)}
    ref = _make_ref_model()
    args = types.SimpleNamespace(dataset="darai", sample_rate=SR)
    vid_list = [f"v{v}.txt" for v in range(3)]

    buf = io.StringIO()
    # the file writes header-only gt_pred_log_*.txt into the cwd (:203,
    # log_idx never increments) — run it inside tmp
    workdir = tmp_path / "refrun"
    os.makedirs(workdir / "datasets", exist_ok=True)
    os.symlink(tcn_darai_disk, workdir / "datasets" / "darai")
    with chdir(workdir), contextlib.redirect_stdout(buf):
        ref_predict(ref, vid_list, args, obs_p, N_CLASS, actions_dict,
                    torch.device("cpu"), query_dict)
    m = BANG_RE.search(buf.getvalue())
    assert m, buf.getvalue()
    ref_ant = float(m.group(1))
    # the only gt_pred logs are the header-only stub (:203-204)
    logs = list(workdir.glob("gt_pred_log_*"))
    assert logs and all(
        l.read_text() == "gt file\tGround Truth (GT)\tPrediction (Pred)\n"
        for l in logs
    )

    import dataclasses

    from r3d_tpu.models.baselines import TCNAnticipator

    base = get_config("darai")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(tcn_darai_disk.parent),
            features_dir="features_temp", gt_dir="groundTruth_nov11",
            depth_features_dir=None, multi_sequence=True,
            seq_buckets=(32, 64), sample_rate=SR, feature_dtype="float32",
        ),
        model=ModelConfig(
            model="tcn", hidden_dim=8, input_dim=IN_DIM, n_query=NQ,
            max_pos_len=128, compute_dtype="float32",
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
        eval=EvalConfig(ant_acc_mode="unweighted_excl", exclude_class_idx=16),
    )
    source = build_source(cfg.data, "train_split.txt")
    assert source.n_class == N_CLASS
    assert len(source.units()) == 6
    model = TCNAnticipator(cfg.model, source.n_class, channels=(8, 12, 12, 8))
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, IN_DIM), jnp.float32),
        train=False,
    )["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.tcn_baseline_params(ref))
    assert set(init) == set(conv)
    variables = {"params": conv}

    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p, log=lambda *a: None)
    np.testing.assert_allclose(res["ant_acc"], ref_ant, atol=1e-9)


def test_unweighted_excl_differs_from_unweighted(tcn_darai_disk):
    """Negative control: the live gt==16 exclusion must actually change the
    number on this data (otherwise the parity above wouldn't pin it)."""
    import dataclasses

    from r3d_tpu.models.baselines import TCNAnticipator

    ref = _make_ref_model()
    base = get_config("darai")
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(tcn_darai_disk.parent),
            features_dir="features_temp", gt_dir="groundTruth_nov11",
            depth_features_dir=None, multi_sequence=True,
            seq_buckets=(32, 64), sample_rate=SR, feature_dtype="float32",
        ),
        model=ModelConfig(
            model="tcn", hidden_dim=8, input_dim=IN_DIM, n_query=NQ,
            max_pos_len=128, compute_dtype="float32",
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
        eval=EvalConfig(ant_acc_mode="unweighted_excl", exclude_class_idx=16),
    )
    source = build_source(cfg.data, "train_split.txt")
    model = TCNAnticipator(cfg.model, source.n_class, channels=(8, 12, 12, 8))
    conv = jax.tree.map(jnp.asarray, torch_ref.tcn_baseline_params(ref))
    variables = {"params": conv}

    p_excl = Predictor(cfg, model, source.n_class, eval_batch=4)
    res_excl = p_excl.predict(variables, source, 0.2, log=lambda *a: None)
    cfg_plain = cfg.replace(eval=EvalConfig(ant_acc_mode="unweighted"))
    p_plain = Predictor(cfg_plain, model, source.n_class, eval_batch=4)
    res_plain = p_plain.predict(variables, source, 0.2, log=lambda *a: None)
    assert res_excl["ant_acc"] != res_plain["ant_acc"]
