"""L3-query family parity: the pre-decoder query stream and fc_l3 logits of
futr_unsupervised must match the reference forward exactly (the decoder-side
outputs intentionally diverge — COMPAT #18 pools queries to n_query where the
reference's S-query path is unrunnable)."""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3d_tpu.config import ModelConfig  # noqa: E402
from r3d_tpu.models.futr_unsupervised import FUTRUnsupervised  # noqa: E402

if HAS_REF:
    import torch
    import torch_ref

    torch_ref.patch_cuda_free()

N_CLASS = 10
PAD_IDX = N_CLASS + 1
QUERY_NUM = 12


def test_l3_stream_parity_eval():
    from model.futr_unsupervised import FUTR as RefUnsup

    cfg = ModelConfig(
        model="futr_unsupervised", hidden_dim=32, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=16,
        max_pos_len=64, compute_dtype="float32", query_num=QUERY_NUM,
        dropout=0.0,
    )
    args = torch_ref.RefArgs(input_dim=16, max_pos_len=64)
    torch.manual_seed(0)
    ref = RefUnsup(
        N_CLASS, 32, PAD_IDX, torch.device("cpu"), args, n_query=8, n_head=4,
        num_encoder_layers=1, num_decoder_layers=1, query_num=QUERY_NUM,
    )
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(0)
    B, S = 3, 20
    x = rng.randn(B, S, 16).astype(np.float32)
    with torch.no_grad():
        # the reference embeds `query` then overwrites the result with the
        # self-attention queries (futr_unsupervised.py:113,128) — it still
        # requires a tensor, so pass a discarded dummy
        dummy_q = torch.zeros(B, S, dtype=torch.long)
        ref_out = ref(torch.tensor(x), dummy_q, mode="test")

    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="self_attention",
                            attend_over_batch=True)
    p = {"embed": {}, "heads": {}}
    torch_ref.linear(p["embed"], "input_embed", ref.input_embed)
    p["pos_embedding"] = torch_ref.t2n(ref.pos_embedding)
    p["transformer"] = torch_ref.transformer_params(ref.transformer)
    torch_ref.linear(p["heads"], "fc", ref.fc)
    torch_ref.linear(p["heads"], "fc_len", ref.fc_len)
    torch_ref.linear(p["heads"], "fc_seg", ref.fc_seg)
    p["l3_attention"] = {}
    torch_ref.mha(p, "l3_attention", ref.l3_attention)
    torch_ref.linear(p, "fc_l3", ref.fc_l3)
    params = jax.tree.map(jnp.asarray, p)

    out = ours.apply({"params": params}, jnp.array(x), train=False)

    # the pre-decoder stream heads must match exactly
    np.testing.assert_allclose(
        np.array(out["l3"]), ref_out["l3"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.array(out["supcon"]), ref_out["supcon"].numpy(), atol=3e-4
    )
    # seg also rides the undecoded memory stream -> comparable
    np.testing.assert_allclose(
        np.array(out["seg"]), ref_out["seg"].numpy(), atol=3e-4
    )


def test_temp2_full_parity_eval():
    """futr_unsupervised_temp2 ('l3-into-src') decodes n_query learned
    queries, so ALL outputs are comparable, not just the pre-decoder ones."""
    from model.futr_unsupervised_temp2 import FUTR as RefTemp2

    cfg = ModelConfig(
        model="futr_unsupervised_temp2", hidden_dim=32, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=16,
        max_pos_len=64, compute_dtype="float32", query_num=QUERY_NUM,
        dropout=0.0,
    )
    args = torch_ref.RefArgs(input_dim=16, max_pos_len=64)
    torch.manual_seed(0)
    ref = RefTemp2(
        N_CLASS, 32, PAD_IDX, torch.device("cpu"), args, n_query=8, n_head=4,
        num_encoder_layers=1, num_decoder_layers=1, query_num=QUERY_NUM,
    )
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(0)
    B, S = 3, 20
    x = rng.randn(B, S, 16).astype(np.float32)
    with torch.no_grad():
        dummy_q = torch.zeros(B, S, dtype=torch.long)
        ref_out = ref(torch.tensor(x), dummy_q, mode="test")

    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="self_attention",
                            attend_over_batch=True, variant="temp2")
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
    params = jax.tree.map(jnp.asarray, p)

    out = ours.apply({"params": params}, jnp.array(x), train=False)

    assert "supcon" not in out  # temp2 drops the supcon output
    np.testing.assert_allclose(
        np.array(out["l3"]), ref_out["l3"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.array(out["action"]), ref_out["action"].numpy(), atol=3e-4
    )
    np.testing.assert_allclose(
        np.array(out["duration"]), ref_out["duration"].numpy(), atol=3e-4
    )
    # temp2 seg rides the PRE-l3-add stream (temp2.py:164)
    np.testing.assert_allclose(
        np.array(out["seg"]), ref_out["seg"].numpy(), atol=3e-4
    )


def test_temp3_is_default_minus_supcon():
    """temp3 == the adopted default pooling (COMPAT #18) without supcon; its
    decoder/head outputs must match futr_unsupervised bit-for-bit on shared
    weights."""
    cfg = ModelConfig(
        model="futr_unsupervised", hidden_dim=32, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=16,
        max_pos_len=64, compute_dtype="float32", query_num=QUERY_NUM,
        dropout=0.0,
    )
    base = FUTRUnsupervised(cfg, N_CLASS, query_source="self_attention")
    temp3 = FUTRUnsupervised(cfg, N_CLASS, query_source="self_attention",
                             variant="temp3")
    rng = np.random.RandomState(1)
    x = jnp.array(rng.randn(2, 16, 16).astype(np.float32))
    variables = base.init(jax.random.PRNGKey(0), x, train=False)
    out_base = base.apply(variables, x, train=False)
    out_t3 = temp3.apply(variables, x, train=False)
    assert "supcon" in out_base and "supcon" not in out_t3
    for k in ("action", "duration", "seg", "l3"):
        np.testing.assert_array_equal(np.array(out_base[k]), np.array(out_t3[k]))

def test_futr_proposed_full_parity_eval():
    """futr_proposed (gt L3 queries): the decoder runs on ALL S queries and
    the OUTPUT adaptive-avg-pools to n_query (futr_proposed.py:101-124);
    action/duration/seg must match the reference on copied weights — both on
    an unpadded batch and on a padded bucket batch with per-row lengths."""
    from model.futr_proposed import FUTR as RefProposed

    cfg = ModelConfig(
        model="futr_proposed", hidden_dim=32, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=16,
        max_pos_len=64, compute_dtype="float32", query_num=QUERY_NUM,
        dropout=0.0, seg_excludes_none=True,
    )
    args = torch_ref.RefArgs(input_dim=16, max_pos_len=64)
    torch.manual_seed(0)
    ref = RefProposed(
        N_CLASS, 32, PAD_IDX, torch.device("cpu"), args, n_query=8, n_head=4,
        num_encoder_layers=1, num_decoder_layers=1, query_num=QUERY_NUM,
    )
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(3)
    B, S = 3, 20
    x = rng.randn(B, S, 16).astype(np.float32)
    q = rng.randint(0, QUERY_NUM - 1, size=(B, S))
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(q), mode="test")

    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="gt")
    xj, qj = jnp.array(x), jnp.array(q)
    init = ours.init(jax.random.PRNGKey(0), xj, qj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref))
    params = {**dict(init), **conv}

    out = ours.apply({"params": params}, xj, qj, train=False)
    for k in ("action", "duration", "seg"):
        np.testing.assert_allclose(
            np.array(out[k]), ref_out[k].numpy(), atol=3e-4, err_msg=k
        )

    # padded bucket batch: per-row masked decode + length-aware output pool
    # must equal the reference's unpadded per-video forwards
    lens = [20, 14, 9]
    Sp = 24
    xp = np.zeros((B, Sp, 16), np.float32)
    qp = np.zeros((B, Sp), np.int64)
    mask = np.ones((B, Sp), bool)
    for i, l in enumerate(lens):
        xp[i, :l] = x[i, :l]
        qp[i, :l] = q[i, :l]
        mask[i, :l] = False
    outp = ours.apply(
        {"params": params}, jnp.array(xp), jnp.array(qp), jnp.array(mask),
        train=False,
    )
    for i, l in enumerate(lens):
        with torch.no_grad():
            ref_i = ref(
                torch.tensor(x[i : i + 1, :l]), torch.tensor(q[i : i + 1, :l]),
                mode="test",
            )
        np.testing.assert_allclose(
            np.array(outp["action"][i]), ref_i["action"][0].numpy(),
            atol=3e-4, err_msg=f"action row {i}",
        )
        np.testing.assert_allclose(
            np.array(outp["duration"][i]), ref_i["duration"][0].numpy(),
            atol=3e-4, err_msg=f"duration row {i}",
        )
        np.testing.assert_allclose(
            np.array(outp["seg"][i, :l]), ref_i["seg"][0].numpy(),
            atol=3e-4, err_msg=f"seg row {i}",
        )


def test_futr_unsupervised_depth_full_parity_eval():
    """futr_unsupervised_depth (depth-projected queries): sinusoidal PE on
    src AND queries, decoder on all S queries, post-decoder pooling
    (futr_unsupervised_depth.py:99-135) — full output parity on copied
    weights (VERDICT r2 missing #5)."""
    from model.futr_unsupervised_depth import FUTR as RefDepth

    H, W = 8, 6
    cfg = ModelConfig(
        model="futr_unsupervised_depth", hidden_dim=32, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=16,
        max_pos_len=64, compute_dtype="float32", query_num=QUERY_NUM,
        dropout=0.0, seg_excludes_none=False,
    )
    args = torch_ref.RefArgs(input_dim=16, max_pos_len=64)
    torch.manual_seed(1)
    ref = RefDepth(
        N_CLASS, 32, PAD_IDX, torch.device("cpu"), args, n_query=8, n_head=4,
        num_encoder_layers=1, num_decoder_layers=1, query_num=QUERY_NUM,
    )
    ref.depth_projection = torch.nn.Linear(H * W, 32)
    torch.nn.init.xavier_uniform_(ref.depth_projection.weight)
    ref.eval()
    torch_ref.zero_dropout(ref)
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    ref.pos_enc.dropout.p = 0.0
    ref.pos_enc_depth.dropout.p = 0.0

    rng = np.random.RandomState(5)
    B, S = 2, 18
    x = rng.randn(B, S, 16).astype(np.float32)
    depth = rng.randn(B, S, H, W).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(depth), mode="test")

    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="depth")
    xj, dj = jnp.array(x), jnp.array(depth)
    init = ours.init(jax.random.PRNGKey(0), xj, dj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref))
    params = {**dict(init), **conv}
    out = ours.apply({"params": params}, xj, dj, train=False)
    for k in ("action", "duration", "seg"):
        np.testing.assert_allclose(
            np.array(out[k]), ref_out[k].numpy(), atol=3e-4, err_msg=k
        )


def test_futr_unsupervised_depth_raw_full_parity_eval():
    """futr_unsupervised_depth_raw: raw RGB frames run through an IN-MODEL
    frozen ResNet-50 before the embed (depth_raw.py:35-36,78-84); our design
    featurizes with the flax ResNet (preprocess/resnet.py) outside the
    anticipator. Parity of the COMPOSITION: same (random) ResNet weights on
    both sides, identical frames/depth, full output comparison (VERDICT r2
    missing #5, the 'raw' half)."""
    import sys
    import types

    from test_preprocess import _torch_resnet50_oracle
    from r3d_tpu.data.preprocess.resnet import (
        ResNet50Features, load_torchvision_weights,
    )

    torch.manual_seed(4)
    oracle = _torch_resnet50_oracle()
    with torch.no_grad():
        for m in oracle.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    class TVResNet(torch.nn.Module):
        """torchvision child layout so Sequential(*children()[:-1]) works
        (conv1..layer4, avgpool; fc dropped by the reference)."""

        def __init__(self, o):
            super().__init__()
            self.conv1, self.bn1, self.relu = o.conv1, o.bn1, o.relu
            self.maxpool = o.maxpool
            self.layer1, self.layer2 = o.layer1, o.layer2
            self.layer3, self.layer4 = o.layer3, o.layer4
            self.avgpool = torch.nn.AdaptiveAvgPool2d(1)
            self.fc = torch.nn.Linear(2048, 1000)

    # torchvision is not in this image — stub it so the reference imports
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet50 = lambda *a, **kw: TVResNet(oracle)
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    try:
        from model.futr_unsupervised_depth_raw import FUTR as RefRaw
    finally:
        sys.modules.pop("torchvision", None)
        sys.modules.pop("torchvision.models", None)

    H, W = 8, 6
    cfg = ModelConfig(
        model="futr_unsupervised_depth", hidden_dim=32, n_head=4,
        n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=2048,
        max_pos_len=64, compute_dtype="float32", query_num=QUERY_NUM,
        dropout=0.0, seg_excludes_none=False,
    )
    args = torch_ref.RefArgs(input_dim=2048, max_pos_len=64)
    ref = RefRaw(
        N_CLASS, 32, PAD_IDX, torch.device("cpu"), args, n_query=8, n_head=4,
        num_encoder_layers=1, num_decoder_layers=1, query_num=QUERY_NUM,
    )
    ref.depth_projection = torch.nn.Linear(H * W, 32)
    torch.nn.init.xavier_uniform_(ref.depth_projection.weight)
    ref.eval()
    torch_ref.zero_dropout(ref)
    ref.pos_enc.dropout.p = 0.0
    ref.pos_enc_depth.dropout.p = 0.0

    rng = np.random.RandomState(8)
    B, S, FH, FW = 1, 4, 64, 64
    frames = rng.randn(B, S, FH, FW, 3).astype(np.float32)
    depth = rng.randn(B, S, H, W).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(frames), torch.tensor(depth), mode="test")

    # our pipeline: flax ResNet features (converted weights) -> depth model
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    rn_vars = load_torchvision_weights(sd)
    rn = ResNet50Features(dtype=jnp.float32)
    feats = rn.apply(rn_vars, jnp.asarray(frames.reshape(B * S, FH, FW, 3)),
                     train=False).reshape(B, S, 2048)

    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="depth")
    dj = jnp.asarray(depth)
    init = ours.init(jax.random.PRNGKey(0), feats, dj, train=False)["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref))
    params = {**dict(init), **conv}
    out = ours.apply({"params": params}, feats, dj, train=False)
    for k in ("action", "duration", "seg"):
        np.testing.assert_allclose(
            np.array(out[k]), ref_out[k].numpy(), atol=2e-3, rtol=2e-3,
            err_msg=k,
        )


def test_temp_variants_receive_pad_mask_in_trainer():
    """Regression (round 4): Trainer/Predictor built model args from a
    hard-coded query-model list that omitted temp2/temp3, so their pad mask
    landed in the dead ``query`` positional and the transformer never masked
    padded memory.  The list is now shared (models.QUERY_MODELS); this pins
    (a) the flag for every family member and (b) the semantics — a temp2
    TRAIN forward through Trainer's input building must be invariant to
    garbage in padded feature rows (the reference masks them via
    src_key_padding_mask, futr_unsupervised_temp2.py:86-88)."""
    from r3d_tpu.config import Config, DataConfig, TrainConfig
    from r3d_tpu.models import QUERY_MODELS, model_needs_query
    from r3d_tpu.train.loop import Trainer

    for name in ("futr_unsupervised_temp2", "futr_unsupervised_temp3"):
        assert model_needs_query(name), name
    assert set(QUERY_MODELS) >= {
        "futr_unsupervised", "futr_proposed", "futr_gaze",
        "futr_unsupervised_depth",
    }

    cfg = Config(
        name="t", data=DataConfig(),
        model=ModelConfig(
            model="futr_unsupervised_temp2", hidden_dim=32, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=4, input_dim=16,
            max_pos_len=64, compute_dtype="float32", dropout=0.0,
            query_num=QUERY_NUM,
        ),
        train=TrainConfig(loop="unsupervised", l3_pad_idx=47,
                          l3_exclude_idx=48),
    )
    trainer = Trainer(cfg, N_CLASS)
    assert trainer.needs_query

    rng = np.random.RandomState(5)
    B, S, L0 = 2, 12, 7          # row 0 real length 7, row 1 full
    feats = rng.randn(B, S, 16).astype(np.float32)
    past = np.full((B, S), 1, np.int64)
    past[0, L0:] = PAD_IDX       # row 0 padded past L0
    q = rng.randint(0, QUERY_NUM - 1, (B, S)).astype(np.int64)

    def run(pad_fill, with_mask=True):
        f = feats.copy()
        f[0, L0:] = pad_fill     # garbage only in row 0's padded positions
        batch = {
            "features": jnp.asarray(f), "past_label": jnp.asarray(past),
            "query_label": jnp.asarray(q),
        }
        args = list(trainer._model_inputs(batch, with_mask=True))
        if not with_mask:
            args[2] = None       # the pre-fix binding: mask never arrives
        variables = trainer.model.init(
            jax.random.PRNGKey(0), *trainer._model_inputs(batch, with_mask=False),
            train=True,
        )
        return trainer.model.apply(variables, *args, train=True,
                                   rngs={"dropout": jax.random.PRNGKey(1)})

    out_a, out_b = run(0.0), run(1e3)
    # ROW 0's decoder outputs read its memory through the masked
    # cross-attention — they must not see its own pad-row garbage.  (Row 1
    # legitimately changes: the l3 self-attention runs ACROSS the batch per
    # timestep with no mask, exactly as the reference's l3_attention —
    # COMPAT #17 — so row 0's pad positions pollute row 1's l3 stream at
    # those timesteps in both frameworks.)
    for k in ("action", "duration"):
        np.testing.assert_allclose(
            np.array(out_a[k][0]), np.array(out_b[k][0]), atol=1e-5,
            err_msg=k,
        )
    # negative control: with the mask dropped (the pre-fix binding), the
    # garbage DOES reach row 0's decoder — the mask is load-bearing
    out_c, out_d = run(0.0, with_mask=False), run(1e3, with_mask=False)
    assert np.abs(
        np.array(out_c["action"][0]) - np.array(out_d["action"][0])
    ).max() > 1e-3
