"""Golden-parity tests: our flax models vs the reference PyTorch forward on
identical weights and inputs (fp32, CPU)."""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3d_tpu.config import ModelConfig  # noqa: E402
from r3d_tpu.models.futr import FUTR  # noqa: E402
from r3d_tpu.models.futr_fusion import FUTRFusion  # noqa: E402

if HAS_REF:
    import torch
    import torch_ref

    torch_ref.patch_cuda_free()


N_CLASS = 12
PAD_IDX = N_CLASS + 1


def small_cfg(**kw):
    base = dict(
        model="futr", hidden_dim=64, n_head=4, n_encoder_layers=2,
        n_decoder_layers=2, n_query=8, input_dim=32, max_pos_len=128,
        compute_dtype="float32", seg_excludes_none=True, dropout=0.1,
    )
    base.update(kw)
    return ModelConfig(**base)


def make_ref_futr(cfg):
    from model.futr import FUTR as RefFUTR

    args = torch_ref.RefArgs(
        input_dim=cfg.input_dim, max_pos_len=cfg.max_pos_len,
    )
    torch.manual_seed(0)
    m = RefFUTR(
        N_CLASS, cfg.hidden_dim, PAD_IDX, torch.device("cpu"), args,
        n_query=cfg.n_query, n_head=cfg.n_head,
        num_encoder_layers=cfg.n_encoder_layers,
        num_decoder_layers=cfg.n_decoder_layers,
    )
    m.eval()
    torch_ref.zero_dropout(m)
    return m


def test_futr_forward_parity_eval():
    """mode='test': no masks, encoder bypassed."""
    cfg = small_cfg()
    ref = make_ref_futr(cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 40, cfg.input_dim).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.tensor(x), mode="test")

    ours = FUTR(cfg, N_CLASS)
    params = jax.tree.map(jnp.asarray, torch_ref.futr_params(ref))
    out = ours.apply({"params": params}, jnp.array(x), train=False)

    np.testing.assert_allclose(
        np.array(out["action"]), ref_out["action"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.array(out["duration"]), ref_out["duration"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.array(out["seg"]), ref_out["seg"].numpy(), atol=2e-4)


def test_futr_forward_parity_train_mask():
    """mode='train': src pad mask derived from labels, dropout zeroed."""
    cfg = small_cfg(dropout=0.0)
    ref = make_ref_futr(cfg)
    ref.train()
    torch_ref.zero_dropout(ref)
    rng = np.random.RandomState(1)
    B, S = 3, 50
    x = rng.randn(B, S, cfg.input_dim).astype(np.float32)
    labels = rng.randint(0, N_CLASS, size=(B, S)).astype(np.float32)
    labels[0, 35:] = PAD_IDX
    labels[2, 20:] = PAD_IDX

    ref_out = ref((torch.tensor(x), torch.tensor(labels)), mode="train")

    ours = FUTR(cfg, N_CLASS)
    params = jax.tree.map(jnp.asarray, torch_ref.futr_params(ref))
    mask = jnp.array(labels == PAD_IDX)
    out = ours.apply(
        {"params": params}, jnp.array(x), mask, train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(
        np.array(out["action"]), ref_out["action"].detach().numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.array(out["seg"]), ref_out["seg"].detach().numpy(), atol=2e-4
    )


def make_ref_fusion(cfg, query_num=49):
    from model.futr_safuser_batchnormalization import FUTR as RefFusion

    args = torch_ref.RefArgs(
        input_dim=cfg.input_dim, max_pos_len=cfg.max_pos_len,
    )
    torch.manual_seed(0)
    m = RefFusion(
        N_CLASS, cfg.hidden_dim, PAD_IDX, torch.device("cpu"), args,
        n_query=cfg.n_query, n_head=cfg.n_head,
        num_encoder_layers=cfg.n_encoder_layers,
        num_decoder_layers=cfg.n_decoder_layers, query_num=query_num,
    )
    # reference hard-codes depth 160*120; shrink for the test
    m.depth_projection = torch.nn.Linear(8 * 6, cfg.hidden_dim)
    torch.nn.init.xavier_uniform_(m.depth_projection.weight)
    m.eval()
    torch_ref.zero_dropout(m)
    # randomize BN running stats so the eval path is non-trivial
    g = torch.Generator().manual_seed(3)
    for bn in (m.fuser.bn_rgb, m.fuser.bn_depth):
        bn.running_mean.copy_(torch.randn(cfg.hidden_dim, generator=g) * 0.3)
        bn.running_var.copy_(torch.rand(cfg.hidden_dim, generator=g) + 0.5)
        with torch.no_grad():
            bn.weight.copy_(torch.randn(cfg.hidden_dim, generator=g))
    return m


@pytest.mark.parametrize("mode", ["test", "train"])
def test_fusion_forward_parity(mode):
    cfg = small_cfg(model="futr_fusion_bn", seg_excludes_none=False,
                    fuser_dropout=0.0, dropout=0.0)
    ref = make_ref_fusion(cfg)
    rng = np.random.RandomState(2)
    B, S = 8, 30
    x = rng.randn(B, S, cfg.input_dim).astype(np.float32)
    depth = rng.randn(B, S, 8, 6).astype(np.float32)
    labels = rng.randint(0, N_CLASS, size=(B, S)).astype(np.float32)
    labels[0, 20:] = PAD_IDX

    if mode == "train":
        ref.train()
        torch_ref.zero_dropout(ref)
        ref_out = ref(
            (torch.tensor(x), torch.tensor(labels)),
            torch.tensor(depth).reshape(B, S, -1),
            mode="train",
        )
    else:
        with torch.no_grad():
            ref_out = ref(
                torch.tensor(x), torch.tensor(depth).reshape(B, S, -1), mode="test"
            )

    ours = FUTRFusion(cfg, N_CLASS)
    params, batch_stats = torch_ref.fusion_params(ref)
    params = jax.tree.map(jnp.asarray, params)
    batch_stats = jax.tree.map(jnp.asarray, batch_stats)

    variables = {"params": params, "batch_stats": batch_stats}
    if mode == "train":
        mask = jnp.array(labels == PAD_IDX)
        out, _ = ours.apply(
            variables, jnp.array(x), jnp.array(depth), mask, train=True,
            rngs={"dropout": jax.random.PRNGKey(0)}, mutable=["batch_stats"],
        )
    else:
        out = ours.apply(variables, jnp.array(x), jnp.array(depth), train=False)

    np.testing.assert_allclose(
        np.array(out["action"]), ref_out["action"].detach().numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.array(out["duration"]), ref_out["duration"].detach().numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.array(out["seg"]), ref_out["seg"].detach().numpy(), atol=2e-4
    )


def test_two_token_exact_equals_general():
    """The closed-form 2-token attention must equal the masked softmax path."""
    from r3d_tpu.models.fuser import FuserBlock

    rng = np.random.RandomState(4)
    x = jnp.array(rng.randn(16, 2, 64).astype(np.float32))
    exact = FuserBlock(64, 4, two_token_exact=True)
    general = FuserBlock(64, 4, two_token_exact=False)
    params = exact.init(jax.random.PRNGKey(0), x)["params"]
    out_e = exact.apply({"params": params}, x)
    out_g = general.apply({"params": params}, x)
    np.testing.assert_allclose(np.array(out_e), np.array(out_g), atol=1e-5)


def test_grad_probe_fuser_eval_parity():
    """CMFuserGrad (tokenfusion variant) eval forward vs the reference:
    activation-magnitude ranking, hard channel swap, outer residual."""
    from model.futr_safuser_tokenfusion import CMFuser as RefGradFuser

    from r3d_tpu.models.fuser import CMFuserGrad

    C = 64
    torch.manual_seed(3)
    ref = RefGradFuser(dim=C, depth=1, num_heads=4)
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(6)
    rgb = rng.randn(4, 18, C).astype(np.float32)
    depth = rng.randn(4, 18, C).astype(np.float32)
    with torch.no_grad():
        ref_out = ref({"rgb": torch.tensor(rgb), "depth": torch.tensor(depth)},
                      "test")

    ours = CMFuserGrad(C, depth=1, n_head=4, drop_rate=0.0)
    safuser = {"block0": torch_ref.fuser_block_params(ref.blocks[0]),
               "norm_scale": torch_ref.t2n(ref.norm.weight),
               "norm_bias": torch_ref.t2n(ref.norm.bias)}
    params = jax.tree.map(jnp.asarray, {"safuser": safuser})
    out = ours.apply({"params": params}, jnp.array(rgb), jnp.array(depth),
                     train=False)
    np.testing.assert_allclose(np.array(out), ref_out.numpy(), atol=2e-4)


def test_futr_baseline_forward_parity_eval():
    """model/futr_baseline.py = futr + output['supcon'] = decoder output
    (futr_baseline.py:128); weight-copy parity incl. the supcon stream."""
    from model.futr_baseline import FUTR as RefBaseline

    from r3d_tpu.models import build_model

    cfg = small_cfg(model="futr_baseline")
    args = torch_ref.RefArgs(
        input_dim=cfg.input_dim, max_pos_len=cfg.max_pos_len,
    )
    torch.manual_seed(1)
    ref = RefBaseline(
        N_CLASS, cfg.hidden_dim, PAD_IDX, torch.device("cpu"), args,
        n_query=cfg.n_query, n_head=cfg.n_head,
        num_encoder_layers=cfg.n_encoder_layers,
        num_decoder_layers=cfg.n_decoder_layers,
    )
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(4)
    x = rng.randn(2, 36, cfg.input_dim).astype(np.float32)
    labels = rng.randint(0, N_CLASS - 1, size=(2, 36))
    with torch.no_grad():
        # test mode still unpacks ``src, _ = inputs`` (futr_baseline.py:77)
        out_eval = ref((torch.tensor(x), None), mode="test")
        out_train = ref(
            (torch.tensor(x), torch.tensor(labels)), mode="train"
        )

    ours = build_model(cfg, N_CLASS)
    params = jax.tree.map(jnp.asarray, torch_ref.futr_params(ref))
    got_eval = ours.apply({"params": params}, jnp.array(x), train=False)
    got_train = ours.apply(
        {"params": params}, jnp.array(x),
        jnp.array(labels == PAD_IDX), train=False,
    )
    for key in ("action", "duration", "seg", "supcon"):
        np.testing.assert_allclose(
            np.array(got_eval[key]), out_eval[key].numpy(), atol=2e-4,
            err_msg=f"eval {key}",
        )
        np.testing.assert_allclose(
            np.array(got_train[key]), out_train[key].numpy(), atol=2e-4,
            err_msg=f"train {key}",
        )
