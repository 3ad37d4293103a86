"""End-to-end GRADIENT parity: d(total loss)/d(params) of the fusion model
must match the reference's torch autograd on identical weights/inputs.

This pins the entire training computation (forward + all three losses +
masking + backward), not just the forward pass.
"""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3d_tpu.losses import (  # noqa: E402
    cross_entropy_loss,
    duration_loss,
    weighted_cross_entropy_loss,
)
from r3d_tpu.models.futr_fusion import FUTRFusion  # noqa: E402
from r3d_tpu.train.loop import last_non_padding_labels  # noqa: E402

if HAS_REF:
    import torch
    import torch_ref
    import utils as ref_utils

    torch_ref.patch_cuda_free()

from test_model_parity import N_CLASS, PAD_IDX, make_ref_fusion, small_cfg  # noqa: E402


def test_fusion_training_gradients_match():
    cfg = small_cfg(model="futr_fusion_bn", seg_excludes_none=False,
                    fuser_dropout=0.0, dropout=0.0)
    ref = make_ref_fusion(cfg)
    ref.train()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(7)
    B, S, Q = 8, 24, cfg.n_query
    x = rng.randn(B, S, cfg.input_dim).astype(np.float32)
    depth = rng.randn(B, S, 8, 6).astype(np.float32)
    labels = rng.randint(0, N_CLASS - 1, size=(B, S)).astype(np.float32)
    labels[0, 16:] = PAD_IDX
    target = rng.randint(0, N_CLASS, size=(B, Q)).astype(np.float32)
    target[:, 5:] = PAD_IDX
    dur = rng.rand(B, Q).astype(np.float32)
    dur[:, 5:] = PAD_IDX
    excl = 5

    # ---- reference side (train_proposed_depth.py loss assembly) ----
    tx = torch.tensor(x)
    tdepth = torch.tensor(depth).reshape(B, S, -1)
    tlabels = torch.tensor(labels)
    ttarget = torch.tensor(target)
    tdur = torch.tensor(dur)
    tmask = (tdur != PAD_IDX).long()

    out = ref((tx, tlabels), tdepth, mode="train")
    seg = out["seg"].reshape(-1, out["seg"].shape[-1])
    loss_seg, _, _, _ = ref_utils.cal_performance(
        seg, tlabels.reshape(-1), PAD_IDX, exclude_class_idx=excl,
        reference=None, target_ref=None,
    )
    last = torch.zeros(B, dtype=tlabels.dtype)
    for i in range(B):
        nz = (tlabels[i] != PAD_IDX).nonzero(as_tuple=True)[0]
        last[i] = tlabels[i, nz[-1]]
    act = out["action"].reshape(-1, N_CLASS)
    loss_cls, _, _, _ = ref_utils.cal_performance(
        act, ttarget.reshape(-1), PAD_IDX, exclude_class_idx=excl,
        reference=last, target_ref=ttarget[:, 0],
    )
    nd = ref_utils.normalize_duration(out["duration"], tmask.float())
    crit = torch.nn.MSELoss(reduction="none")
    loss_dur = torch.sum(crit(nd, tdur * tmask)) / torch.sum(tmask)
    total_ref = loss_seg + loss_cls + loss_dur
    total_ref.backward()

    # ---- our side ----
    ours = FUTRFusion(cfg, N_CLASS)
    params, batch_stats = torch_ref.fusion_params(ref)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    jl = jnp.array(labels).astype(jnp.int32)
    jt = jnp.array(target).astype(jnp.int32)
    jd = jnp.array(dur)
    jmask = (jd != PAD_IDX).astype(jnp.float32)

    def loss_fn(p):
        outputs, _ = ours.apply(
            {"params": p, "batch_stats": batch_stats},
            jnp.array(x), jnp.array(depth), jl == PAD_IDX, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        seg_flat = outputs["seg"].reshape(-1, outputs["seg"].shape[-1])
        l_seg, _ = cross_entropy_loss(seg_flat, jl.reshape(-1), PAD_IDX, excl)
        reference = last_non_padding_labels(jl, PAD_IDX)
        l_cls, _ = weighted_cross_entropy_loss(
            outputs["action"].reshape(-1, N_CLASS), jt.reshape(-1), PAD_IDX,
            reference, jt[:, 0], excl,
        )
        l_dur = duration_loss(outputs["duration"], jd * jmask, jmask)
        return l_seg + l_cls + l_dur

    total_ours, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(total_ours), float(total_ref), rtol=1e-4)

    checks = {
        "embed/input_embed kernel": (
            grads["embed"]["input_embed"]["kernel"],
            ref.input_embed.weight.grad.numpy().T,
        ),
        "fuser alpha": (grads["fuser"]["alpha"], ref.fuser.alpha.grad.numpy()),
        "bn_rgb scale": (
            grads["fuser"]["bn_rgb"]["scale"], ref.fuser.bn_rgb.weight.grad.numpy()
        ),
        "fc kernel": (grads["heads"]["fc"]["kernel"], ref.fc.weight.grad.numpy().T),
        "fc_len kernel": (
            grads["heads"]["fc_len"]["kernel"], ref.fc_len.weight.grad.numpy().T
        ),
        "depth_projection kernel": (
            grads["depth_embed"]["depth_projection"]["kernel"],
            ref.depth_projection.weight.grad.numpy().T,
        ),
        "pos_embedding": (
            grads["pos_embedding"], ref.pos_embedding.grad.numpy()
        ),
        "query_embed": (grads["query_embed"], ref.query_embed.weight.grad.numpy()),
    }
    for name, (a, b) in checks.items():
        scale = max(float(np.abs(b).max()), 1e-8)
        np.testing.assert_allclose(
            np.array(a), b, atol=2e-4 * scale + 1e-8, rtol=2e-3,
            err_msg=f"gradient mismatch: {name}",
        )


def test_training_trajectory_matches_reference():
    """Five full AdamW steps on identical weights/batches: the loss sequence
    must track the reference's torch training loop (dropout off, fixed lr).
    This pins optimizer semantics and multi-step dynamics, not just one
    gradient."""
    import optax

    from r3d_tpu.train.state import TrainState

    cfg = small_cfg(model="futr_fusion_bn", seg_excludes_none=False,
                    fuser_dropout=0.0, dropout=0.0)
    ref = make_ref_fusion(cfg)
    ref.train()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(21)
    B, S, Q = 8, 16, cfg.n_query
    excl = 5
    lr, wd = 1e-3, 5e-3
    batches = []
    for _ in range(5):
        batches.append(dict(
            x=rng.randn(B, S, cfg.input_dim).astype(np.float32),
            depth=rng.randn(B, S, 8, 6).astype(np.float32),
            labels=rng.randint(0, N_CLASS - 1, size=(B, S)).astype(np.float32),
            target=rng.randint(0, N_CLASS, size=(B, Q)).astype(np.float32),
            dur=rng.rand(B, Q).astype(np.float32),
        ))

    # ---- torch trajectory ----
    opt = torch.optim.AdamW(ref.parameters(), lr, weight_decay=wd)
    torch_losses = []
    for b in batches:
        opt.zero_grad()
        out = ref((torch.tensor(b["x"]), torch.tensor(b["labels"])),
                  torch.tensor(b["depth"]).reshape(B, S, -1), mode="train")
        seg = out["seg"].reshape(-1, out["seg"].shape[-1])
        l_seg, _, _, _ = ref_utils.cal_performance(
            seg, torch.tensor(b["labels"]).reshape(-1), PAD_IDX,
            exclude_class_idx=excl, reference=None, target_ref=None)
        last = torch.zeros(B, dtype=torch.float32)
        tl = torch.tensor(b["labels"])
        for i in range(B):
            nz = (tl[i] != PAD_IDX).nonzero(as_tuple=True)[0]
            last[i] = tl[i, nz[-1]]
        act = out["action"].reshape(-1, N_CLASS)
        tt = torch.tensor(b["target"])
        l_cls, _, _, _ = ref_utils.cal_performance(
            act, tt.reshape(-1), PAD_IDX, exclude_class_idx=excl,
            reference=last, target_ref=tt[:, 0])
        mask = (torch.tensor(b["dur"]) != PAD_IDX).float()
        nd = ref_utils.normalize_duration(out["duration"], mask)
        crit = torch.nn.MSELoss(reduction="none")
        l_dur = torch.sum(crit(nd, torch.tensor(b["dur"]) * mask)) / torch.sum(mask)
        loss = l_seg + l_cls + l_dur
        torch_losses.append(float(loss))
        loss.backward()
        opt.step()

    # ---- our trajectory (fresh reference weights: rebuild) ----
    ref2 = make_ref_fusion(cfg)
    params, batch_stats = torch_ref.fusion_params(ref2)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)
    ours = FUTRFusion(cfg, N_CLASS)
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))

    def loss_fn(p, bs, b):
        outputs, mut = ours.apply(
            {"params": p, "batch_stats": bs},
            jnp.array(b["x"]), jnp.array(b["depth"]),
            jnp.array(b["labels"]) == PAD_IDX, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
        jl = jnp.array(b["labels"]).astype(jnp.int32)
        jt = jnp.array(b["target"]).astype(jnp.int32)
        jd = jnp.array(b["dur"])
        jmask = (jd != PAD_IDX).astype(jnp.float32)
        seg_flat = outputs["seg"].reshape(-1, outputs["seg"].shape[-1])
        l_seg, _ = cross_entropy_loss(seg_flat, jl.reshape(-1), PAD_IDX, excl)
        reference = last_non_padding_labels(jl, PAD_IDX)
        l_cls, _ = weighted_cross_entropy_loss(
            outputs["action"].reshape(-1, N_CLASS), jt.reshape(-1), PAD_IDX,
            reference, jt[:, 0], excl)
        l_dur = duration_loss(outputs["duration"], jd * jmask, jmask)
        return l_seg + l_cls + l_dur, mut["batch_stats"]

    our_losses = []
    for b in batches:
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, b)
        our_losses.append(float(loss))
        state = state.apply_gradients(grads, tx, new_batch_stats=new_bs)

    np.testing.assert_allclose(our_losses, torch_losses, rtol=2e-3)


# ---------------------------------------------------------------------------
# Fuser-ablation gradient parity (VERDICT r4 weak #6): the closed-form
# two-token swap's BACKWARD under each exchange rule vs torch autograd.
# A fixed random cotangent w turns d(sum(out*w))/d(inputs, params) into a
# full Jacobian-vector parity check without coupling to any loss function
# (the loss fns have their own oracles).
# ---------------------------------------------------------------------------

FUSER_C, FUSER_HEADS, FUSER_B, FUSER_T = 32, 4, 3, 10


def _fuser_grad_case(variant):
    """(ref_module, ref_call(rgb_t, depth_t) -> out, ours, params) per
    exchange rule, in TRAIN mode (the exchange rules' live branch)."""
    from r3d_tpu.models.fuser import (
        CMFuserGrad, CMFuserNoExchange, CMFuserVary,
    )

    def safuser_params(ref_fuser):
        return {
            "block0": torch_ref.fuser_block_params(ref_fuser.blocks[0]),
            "norm_scale": torch_ref.t2n(ref_fuser.norm.weight),
            "norm_bias": torch_ref.t2n(ref_fuser.norm.bias),
        }

    torch.manual_seed(4)
    if variant == "grad":
        from model.futr_safuser_tokenfusion import CMFuser as Ref

        ref = Ref(dim=FUSER_C, depth=1, num_heads=FUSER_HEADS)
        ref.train()
        torch_ref.zero_dropout(ref)
        # mode='test' ranking: the train-mode probe is vacuous and torch's
        # topk tie-break over the all-equal scores is implementation-defined
        # (COMPAT #2) — activation ranking is the well-defined branch, and
        # the hard-swap/residual BACKWARD under test is the same code path
        call = lambda r, d: ref({"rgb": r, "depth": d}, "test")
        ours = CMFuserGrad(FUSER_C, depth=1, n_head=FUSER_HEADS, drop_rate=0.0)
        params = {"safuser": safuser_params(ref)}
    elif variant == "vary":
        from model.futr_safuser_tokenfusion_vary import CMFuser as Ref

        ref = Ref(dim=FUSER_C, depth=1, num_heads=FUSER_HEADS)
        with torch.no_grad():
            ref.alpha.copy_(torch.randn(1, 1, FUSER_C))
        ref.train()
        torch_ref.zero_dropout(ref)
        call = lambda r, d: ref({"rgb": r, "depth": d}, "train")
        ours = CMFuserVary(FUSER_C, depth=1, n_head=FUSER_HEADS, drop_rate=0.0)
        params = {"alpha": torch_ref.t2n(ref.alpha),
                  "safuser": safuser_params(ref)}
    else:  # no-exchange (futr_safuser_depth.py / afft.py)
        from model.futr_safuser_depth import CMFuser as Ref

        ref = Ref(dim=FUSER_C, depth=1, num_heads=FUSER_HEADS)
        ref.train()
        torch_ref.zero_dropout(ref)
        call = lambda r, d: ref({"rgb": r, "depth": d})[0]
        ours = CMFuserNoExchange(
            FUSER_C, depth=1, n_head=FUSER_HEADS, drop_rate=0.0
        )
        params = {"modality_token": torch_ref.t2n(ref.modality_token),
                  "safuser": safuser_params(ref)}
    return ref, call, ours, jax.tree.map(jnp.asarray, params)


@pytest.mark.parametrize("variant", ["grad", "vary", "nox"])
def test_fuser_ablation_gradients_match(variant):
    ref, call, ours, params = _fuser_grad_case(variant)
    rng = np.random.RandomState(17)
    rgb = rng.randn(FUSER_B, FUSER_T, FUSER_C).astype(np.float32)
    depth = rng.randn(FUSER_B, FUSER_T, FUSER_C).astype(np.float32)
    w = rng.randn(FUSER_B, FUSER_T, FUSER_C).astype(np.float32)

    # ---- torch ----
    tr = torch.tensor(rgb, requires_grad=True)
    td = torch.tensor(depth, requires_grad=True)
    out_ref = call(tr, td)
    (out_ref * torch.tensor(w)).sum().backward()

    # ---- ours ----
    def loss_fn(p, r, d):
        # train=False matches the ranking branch chosen in _fuser_grad_case
        # for the 'grad' variant (COMPAT #2); for vary/nox the branches
        # coincide (activation ranking / no ranking). Dropout is 0 in both
        # modes, so the differentiated computation is the live train math.
        out = ours.apply(
            {"params": p}, r, d, train=(variant != "grad"),
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return jnp.sum(out * jnp.array(w))

    grads, g_rgb, g_depth = jax.grad(loss_fn, argnums=(0, 1, 2))(
        params, jnp.array(rgb), jnp.array(depth)
    )

    def close(a, b, name):
        scale = max(float(np.abs(b).max()), 1e-8)
        np.testing.assert_allclose(
            np.array(a), b, atol=3e-5 * scale + 1e-8, rtol=2e-3,
            err_msg=f"{variant}: gradient mismatch: {name}",
        )

    # input gradients pin the exchange rule's backward routing (swapped
    # channels must send their cotangent to the OTHER modality)
    close(g_rgb, tr.grad.numpy(), "d/d rgb")
    close(g_depth, td.grad.numpy(), "d/d depth")
    blk = ref.blocks[0]
    close(grads["safuser"]["block0"]["qkv_kernel"],
          torch_ref.t2n(blk.attn.qkv.weight.grad).T, "qkv kernel")
    close(grads["safuser"]["norm_scale"],
          torch_ref.t2n(ref.norm.weight.grad), "norm scale")
    if variant == "vary":
        close(grads["alpha"], torch_ref.t2n(ref.alpha.grad), "alpha")
    if variant == "nox":
        close(grads["modality_token"],
              torch_ref.t2n(ref.modality_token.grad), "modality token")


def test_futr_proposed_gradients_match():
    """gt-query model (futr_proposed.py) backward parity: d(sum(out*w)) over
    every emitted head w.r.t. params, torch autograd vs jax.grad on copied
    weights — covers the query-embedding path and the decoder-output pooling
    none of the composed trajectory tests reach at gradient level."""
    from r3d_tpu.config import ModelConfig
    from r3d_tpu.models.futr_unsupervised import FUTRUnsupervised

    HID, NQ, IN_DIM, QN = 32, 8, 16, 7
    cfg = ModelConfig(
        model="futr_proposed", hidden_dim=HID, n_head=4, n_encoder_layers=1,
        n_decoder_layers=1, n_query=NQ, input_dim=IN_DIM, max_pos_len=128,
        compute_dtype="float32", query_num=QN, seg_excludes_none=True,
        dropout=0.0,
    )
    from model.futr_proposed import FUTR as RefProposed

    args = torch_ref.RefArgs(input_dim=IN_DIM, max_pos_len=128)
    torch.manual_seed(9)
    ref = RefProposed(
        N_CLASS, HID, PAD_IDX, torch.device("cpu"), args, n_query=NQ,
        n_head=4, num_encoder_layers=1, num_decoder_layers=1, query_num=QN,
    )
    ref.train()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(23)
    B, S = 4, 20
    # pad-free rows: the reference trains with tgt_key_padding_mask=None
    # (futr_proposed.py:78), so its padded-batch decoder consumes collate
    # padding (the COMPAT #40 class of quirk); our mask-aware form equals
    # it exactly on equal-length batches — the composed chains' regime
    x = rng.randn(B, S, IN_DIM).astype(np.float32)
    labels = rng.randint(0, N_CLASS - 1, size=(B, S)).astype(np.float32)
    query = rng.randint(0, QN - 1, size=(B, S)).astype(np.float32)

    tx = torch.tensor(x)
    tl = torch.tensor(labels)
    tq = torch.tensor(query)
    out_ref = ref((tx, tl), tq, mode="train")
    keys = sorted(k for k, v in out_ref.items() if torch.is_tensor(v))
    ws = {k: rng.randn(*out_ref[k].shape).astype(np.float32) for k in keys}
    sum(
        (out_ref[k] * torch.tensor(ws[k])).sum() for k in keys
    ).backward()

    ours = FUTRUnsupervised(cfg, N_CLASS, query_source="gt")
    init = ours.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, IN_DIM), jnp.float32),
        jnp.zeros((1, 8), jnp.int32), train=False,
    )["params"]
    conv = jax.tree.map(jnp.asarray, torch_ref.proposed_params(ref))
    # our model carries an fc_l3 head the futr_proposed reference lacks
    # (torch_ref.proposed_params docstring) — merge over init and restrict
    # the functional to the reference's emitted heads
    params = {**dict(init), **conv}

    def loss_fn(p):
        out = ours.apply(
            {"params": p}, jnp.array(x),
            jnp.array(query).astype(jnp.int32),
            jnp.array(labels) == PAD_IDX, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        assert set(keys) <= set(out), (sorted(out), keys)
        return sum(jnp.sum(out[k] * jnp.array(ws[k])) for k in keys)

    grads = jax.grad(loss_fn)(params)

    def close(a, b, name):
        scale = max(float(np.abs(b).max()), 1e-8)
        np.testing.assert_allclose(
            np.array(a), b, atol=3e-5 * scale + 1e-8, rtol=2e-3,
            err_msg=f"futr_proposed gradient mismatch: {name}",
        )

    close(grads["embed"]["input_embed"]["kernel"],
          torch_ref.t2n(ref.input_embed.weight.grad).T, "input_embed kernel")
    close(grads["query_embed"]["embedding"],
          torch_ref.t2n(ref.query_embed.weight.grad), "query_embed")
    close(grads["heads"]["fc"]["kernel"],
          torch_ref.t2n(ref.fc.weight.grad).T, "fc kernel")
    close(grads["heads"]["fc_len"]["kernel"],
          torch_ref.t2n(ref.fc_len.weight.grad).T, "fc_len kernel")
    close(grads["pos_embedding"],
          torch_ref.t2n(ref.pos_embedding.grad), "pos_embedding")
