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
