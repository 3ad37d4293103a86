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
