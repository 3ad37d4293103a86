"""Weight-copy parity for the ablation baselines (VERDICT r2 missing #2):
model/rnn.py (the LIVE NTU model, main_nturgbd.py:20), model/cnn.py,
model/tcn.py — plus the TCN predict decode semantics (COMPAT #29)."""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3d_tpu.config import ModelConfig  # noqa: E402
from r3d_tpu.models.baselines import (  # noqa: E402
    CNNAnticipator, RNNAnticipator, TCNAnticipator,
)

if HAS_REF:
    import torch
    import torch_ref

    torch_ref.patch_cuda_free()

N_CLASS = 10
PAD_IDX = N_CLASS + 1


def small_cfg(model):
    return ModelConfig(
        model=model, hidden_dim=32, n_head=4, n_encoder_layers=1,
        n_decoder_layers=1, n_query=8, input_dim=16, max_pos_len=64,
        compute_dtype="float32", dropout=0.0, seg_excludes_none=True,
    )


def ref_args():
    return torch_ref.RefArgs(input_dim=16, max_pos_len=64)


def test_rnn_forward_parity():
    from model.rnn import FUTR as RefRNN

    torch.manual_seed(0)
    ref = RefRNN(N_CLASS, 32, PAD_IDX, torch.device("cpu"), ref_args(),
                 n_query=8, n_head=4, num_encoder_layers=1,
                 num_decoder_layers=1)
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(0)
    B, S = 3, 21  # indivisible by the hard-coded pool(8) (rnn.py:97)
    x = rng.randn(B, S, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), mode="test")

    cfg = small_cfg("rnn")
    ours = RNNAnticipator(cfg, N_CLASS)
    params = jax.tree.map(jnp.asarray, torch_ref.rnn_baseline_params(ref))
    out = ours.apply({"params": params}, jnp.array(x), train=False)
    for k in ("action", "duration", "seg", "supcon"):
        np.testing.assert_allclose(
            np.array(out[k]), ref_out[k].detach().numpy(), atol=2e-4,
            err_msg=k,
        )


def test_cnn_forward_parity():
    from model.cnn import FUTR as RefCNN

    torch.manual_seed(1)
    ref = RefCNN(N_CLASS, 32, PAD_IDX, torch.device("cpu"), ref_args(),
                 n_query=8, n_head=4, num_encoder_layers=1,
                 num_decoder_layers=1)
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(1)
    x = rng.randn(2, 19, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), mode="test")

    ours = CNNAnticipator(small_cfg("cnn"), N_CLASS)
    params = jax.tree.map(jnp.asarray, torch_ref.cnn_baseline_params(ref))
    out = ours.apply({"params": params}, jnp.array(x), train=False)
    for k in ("action", "duration", "seg", "supcon"):
        np.testing.assert_allclose(
            np.array(out[k]), ref_out[k].detach().numpy(), atol=2e-4,
            err_msg=k,
        )


def test_tcn_forward_parity():
    from model.tcn import MustafaNet1DTCN, TemporalConvNet1D

    torch.manual_seed(2)
    ref = MustafaNet1DTCN(num_classes=N_CLASS, anticipated_frames=8)
    # shrink the hard-coded 2048-channel stack (tcn.py:70-74)
    ref.tcn_local = TemporalConvNet1D(
        num_inputs=16, num_channels=[8, 12, 12, 8], kernel_size=3,
        dropout=0.2,
    )
    ref.regression = torch.nn.Conv1d(8, N_CLASS * 8, kernel_size=1)
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(2)
    x = rng.randn(2, 23, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x))  # [B, 8, C]

    cfg = small_cfg("tcn")
    ours = TCNAnticipator(cfg, N_CLASS, channels=(8, 12, 12, 8))
    params = jax.tree.map(jnp.asarray, torch_ref.tcn_baseline_params(ref))
    out = ours.apply({"params": params}, jnp.array(x), train=False)
    np.testing.assert_allclose(
        np.array(out["action"]), ref_out.detach().numpy(), atol=2e-4,
    )


def test_tcn_reference_predict_is_unrunnable():
    """Pin WHY there is no TCN predict parity oracle (COMPAT #29): the
    reference decode fills predictions from torch.ones and its accuracy
    helper calls str.replace on tensor elements — the path cannot execute.
    This documents the divergence decode_frames_from_slots replaces."""
    sys_path_ok = True
    try:
        from predict_tcn import accuracy as ref_accuracy
    except ImportError:
        import sys

        sys.path.insert(0, "/root/reference/evaluation")
        from predict_tcn import accuracy as ref_accuracy  # noqa: F401

    gold = torch.tensor([1.0, 2.0])  # future_seq as the sweep builds it
    pred = torch.zeros(2, N_CLASS)
    with pytest.raises(AttributeError):  # gold[i].replace(' ', '')
        ref_accuracy(pred, gold, {"a": 0})


def test_tcn_slot_decode():
    """decode_frames_from_slots: slot q paints frames [q*T/Q, (q+1)*T/Q)."""
    from r3d_tpu.eval.decode import decode_frames_from_slots

    logits = np.zeros((4, 5), np.float32)
    for q, c in enumerate((2, 0, 3, 1)):
        logits[q, c] = 1.0
    frames = decode_frames_from_slots(logits, 10)
    # 10 frames over 4 slots: ceil boundaries at 0-2,3-4,5-7,8-9
    np.testing.assert_array_equal(
        frames, [2, 2, 2, 0, 0, 3, 3, 3, 1, 1]
    )
    assert decode_frames_from_slots(logits, 0).shape == (0,)
    # future longer than Q repeats evenly; shorter truncates head slots
    np.testing.assert_array_equal(decode_frames_from_slots(logits, 2), [2, 3])


def test_tcn_reference_train_loop_is_unrunnable():
    """train_tcn.py:27,85 unpack THREE values from cal_performance, which
    returns four (utils.py:378) — the committed TCN training loop crashes
    on its first batch (COMPAT #30).  Pin the exact crash."""
    import utils as ref_utils

    out = torch.randn(6, N_CLASS)
    gold = torch.randint(0, N_CLASS, (6,))
    with pytest.raises(ValueError):
        loss, n_c, n_t = ref_utils.cal_performance(out, gold, PAD_IDX)


def test_tcn_train_convergence_matches_corrected_loop():
    """loop='tcn' semantics (VERDICT r2 partial #48): plain cal_performance
    CE on the anticipation slots, no seg/duration heads, AdamW — vs the
    reference train_tcn.py loop with its 3-vs-4 unpack corrected (the only
    way it can execute).  Weight-norm v/g parametrization must match
    torch's so gradient TRAJECTORIES track, not just forwards."""
    import optax
    import utils as ref_utils
    from model.tcn import MustafaNet1DTCN, TemporalConvNet1D

    from r3d_tpu.losses import accuracy_counts, cross_entropy_loss

    torch.manual_seed(5)
    ref = MustafaNet1DTCN(num_classes=N_CLASS, anticipated_frames=8)
    ref.tcn_local = TemporalConvNet1D(
        num_inputs=16, num_channels=[8, 12, 12, 8], kernel_size=3,
        dropout=0.2,
    )
    ref.regression = torch.nn.Conv1d(8, N_CLASS * 8, kernel_size=1)
    torch_ref.zero_dropout(ref)
    # jnp.array COPIES: t2n views torch storage and jnp.asarray is zero-copy
    # on CPU, so torch's in-place AdamW below would mutate aliased params
    params = jax.tree.map(jnp.array, torch_ref.tcn_baseline_params(ref))
    ref.train()

    rng_np = np.random.RandomState(5)
    batches = []
    for _ in range(6):
        x = rng_np.randn(4, 23, 16).astype(np.float32)
        tgt = rng_np.randint(0, N_CLASS, size=(4, 8))
        tgt[rng_np.rand(4, 8) < 0.2] = PAD_IDX
        batches.append((x, tgt))

    LR, WD = 1e-3, 5e-3
    opt = torch.optim.AdamW(ref.parameters(), LR, weight_decay=WD)
    torch_losses, torch_val = [], []
    for x, tgt in batches:
        opt.zero_grad()
        out = ref(torch.tensor(x))
        loss, n_c, n_t, _ = ref_utils.cal_performance(
            out.reshape(-1, N_CLASS), torch.tensor(tgt).reshape(-1), PAD_IDX
        )
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))
        torch_val.append((int(n_c), int(n_t)))

    cfg = small_cfg("tcn")
    ours = TCNAnticipator(cfg, N_CLASS, channels=(8, 12, 12, 8))
    tx = optax.adamw(LR, b1=0.9, b2=0.999, eps=1e-8, weight_decay=WD)
    opt_state = tx.init(params)

    def loss_fn(p, x, tgt):
        out = ours.apply({"params": p}, x, train=False)
        logits = out["action"].reshape(-1, N_CLASS)
        loss, _ = cross_entropy_loss(logits, tgt.reshape(-1), PAD_IDX, None)
        return loss, logits

    our_losses, our_val = [], []
    for x, tgt in batches:
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, jnp.asarray(x), jnp.asarray(tgt)
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        our_losses.append(float(loss))
        n_c, n_t = accuracy_counts(
            logits, jnp.asarray(tgt).reshape(-1), PAD_IDX, None
        )
        our_val.append((int(n_c), int(n_t)))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-3)
    assert our_val == torch_val


def test_padded_bucket_matches_unpadded():
    """Bucket padding must not change baseline outputs: the reference
    evaluates per-video/unpadded (predict_nturgbd.py:304, B=1); the masked
    BiLSTM (seq_lengths), per-row pool(8) bins, and masked TCN temporal mean
    make the batched forward equal the per-video one."""
    rng = np.random.RandomState(3)
    cfg = small_cfg("rnn")
    for M in (RNNAnticipator, CNNAnticipator, TCNAnticipator):
        m = M(cfg, N_CLASS)
        B, S = 2, 24
        lens = [13, 19]
        x = np.zeros((B, S, 16), np.float32)
        singles, params = [], None
        for i in range(B):
            xi = rng.randn(1, lens[i], 16).astype(np.float32)
            x[i, : lens[i]] = xi[0]
            if params is None:
                params = m.init(
                    jax.random.PRNGKey(0), jnp.array(x), None, train=False
                )
            singles.append(m.apply(params, jnp.array(xi), None, train=False))
        mask = np.ones((B, S), bool)
        for i in range(B):
            mask[i, : lens[i]] = False
        out = m.apply(params, jnp.array(x), jnp.array(mask), train=False)
        for k in out:
            if k == "supcon":
                continue
            got = np.array(out[k])
            for i in range(B):
                want_i = np.array(singles[i][k])[0]
                got_i = got[i, : lens[i]] if k == "seg" else got[i]
                np.testing.assert_allclose(
                    got_i, want_i, atol=2e-5, err_msg=f"{M.__name__}.{k}"
                )
