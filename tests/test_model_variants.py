"""Forward-shape smoke tests for every model family in the registry
(the reference's 16 model files -> our registry names)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3d_tpu.config import ModelConfig
from r3d_tpu.models import build_model

N_CLASS = 10
B, S, D = 2, 24, 32


def cfg(model, **kw):
    base = dict(
        model=model, hidden_dim=32, n_head=4, n_encoder_layers=1,
        n_decoder_layers=1, n_query=8, input_dim=D, max_pos_len=64,
        compute_dtype="float32", query_num=12,
    )
    base.update(kw)
    return ModelConfig(**base)


def run_forward(model, *args, **kw):
    variables = model.init(jax.random.PRNGKey(0), *args, train=False, **kw)
    return model.apply(variables, *args, train=False, **kw)


@pytest.fixture(scope="module")
def feats():
    return jnp.array(np.random.RandomState(0).randn(B, S, D), jnp.float32)


def test_futr(feats):
    out = run_forward(build_model(cfg("futr", seg_excludes_none=True), N_CLASS), feats)
    assert out["action"].shape == (B, 8, N_CLASS)
    assert out["duration"].shape == (B, 8)
    assert out["seg"].shape == (B, S, N_CLASS - 1)


def test_futr_with_encoder(feats):
    out = run_forward(build_model(cfg("futr", use_encoder=True), N_CLASS), feats)
    assert out["action"].shape == (B, 8, N_CLASS)


@pytest.mark.parametrize("name", ["futr_fusion_grad", "futr_fusion_vary",
                                  "futr_fusion_nox"])
def test_fusion_variants(feats, name):
    depth = jnp.array(np.random.RandomState(1).randn(B, S, 6, 5), jnp.float32)
    model = build_model(cfg(name), N_CLASS)
    out = run_forward(model, feats, depth)
    assert out["action"].shape == (B, 8, N_CLASS)
    assert out["seg"].shape == (B, S, N_CLASS)


def test_afft(feats):
    depth = jnp.array(np.random.RandomState(1).randn(B, S, 6, 5), jnp.float32)
    out = run_forward(build_model(cfg("afft"), N_CLASS), feats, depth)
    assert out["action"].shape == (B, 8, N_CLASS)
    assert "seg" not in out  # afft.py:203 disables the seg head


def test_futr_proposed_gt_queries(feats):
    q = jnp.array(np.random.RandomState(2).randint(0, 12, (B, S)))
    out = run_forward(build_model(cfg("futr_proposed"), N_CLASS), feats, q)
    assert out["action"].shape == (B, 8, N_CLASS)
    assert out["l3"].shape == (B, S, 12)


def test_futr_gaze(feats):
    gaze = jnp.array(np.random.RandomState(3).rand(B, S, 2), jnp.float32)
    out = run_forward(build_model(cfg("futr_gaze"), N_CLASS), feats, gaze)
    assert out["action"].shape == (B, 8, N_CLASS)


def test_futr_unsupervised_depth_queries(feats):
    depth = jnp.array(np.random.RandomState(4).randn(B, S, 6, 5), jnp.float32)
    out = run_forward(
        build_model(cfg("futr_unsupervised_depth"), N_CLASS), feats, depth
    )
    assert out["action"].shape == (B, 8, N_CLASS)


def test_rnn_cnn(feats):
    for name in ("rnn", "cnn"):
        out = run_forward(
            build_model(cfg(name, seg_excludes_none=True), N_CLASS), feats
        )
        assert out["action"].shape == (B, 8, N_CLASS)
        assert out["seg"].shape == (B, S, N_CLASS - 1)
        assert "supcon" in out


def test_tcn():
    x = jnp.array(np.random.RandomState(5).randn(B, S, 2048), jnp.float32)
    out = run_forward(build_model(cfg("tcn", input_dim=2048), N_CLASS), x)
    assert out["action"].shape == (B, 8, N_CLASS)


def test_bf16_forward_within_tolerance(feats):
    """The bf16 compute path (50salads/50salads_proposed configs ship it)
    must track fp32 within bf16 rounding on both flagship families —
    guards against silent dtype-driven divergence (VERDICT r1 weak #5)."""
    for name, extra_args in (
        ("futr", ()),
        ("futr_fusion_bn", (jnp.array(
            np.random.RandomState(1).randn(B, S, 8, 6), jnp.float32),)),
    ):
        m32 = build_model(cfg(name), N_CLASS)
        m16 = build_model(cfg(name, compute_dtype="bfloat16"), N_CLASS)
        variables = m32.init(jax.random.PRNGKey(0), feats, *extra_args,
                             train=False)
        out32 = m32.apply(variables, feats, *extra_args, train=False)
        out16 = m16.apply(variables, feats, *extra_args, train=False)
        for k in ("action", "duration", "seg"):
            a, b = np.array(out32[k]), np.array(out16[k], np.float32)
            scale = max(float(np.abs(a).max()), 1.0)
            np.testing.assert_allclose(
                b, a, atol=0.05 * scale,
                err_msg=f"{name}:{k} bf16 diverged from fp32",
            )
            # and the decisions must broadly agree where it matters
            if k == "action":
                agree = np.mean(np.argmax(a, -1) == np.argmax(b, -1))
                assert agree > 0.9, f"{name}: argmax agreement {agree}"


def test_mixed_embed_dtype_close_to_fp32(feats):
    """embed_dtype='bfloat16' (bf16 on only the wide input projections) must
    stay strictly closer to fp32 than the all-bf16 path."""
    depth = jnp.array(np.random.RandomState(2).randn(B, S, 8, 6), jnp.float32)
    m32 = build_model(cfg("futr_fusion_bn"), N_CLASS)
    mmix = build_model(cfg("futr_fusion_bn", embed_dtype="bfloat16"), N_CLASS)
    variables = m32.init(jax.random.PRNGKey(0), feats, depth, train=False)
    out32 = m32.apply(variables, feats, depth, train=False)
    outmix = mmix.apply(variables, feats, depth, train=False)
    for k in ("action", "duration", "seg"):
        a = np.array(out32[k])
        b = np.array(outmix[k], np.float32)
        scale = max(float(np.abs(a).max()), 1.0)
        np.testing.assert_allclose(b, a, atol=0.02 * scale)
