"""Int8 weight-only quantized serving (ops/quant.py).

No reference counterpart (the reference has no deployment story); bounds
here are the quantizer's own: per-channel symmetric int8 keeps every weight
within scale/2 = absmax/254 of its float value, and the served logits stay
within a few percent of the full-precision session's.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_datasets import disk_dataset, make_cfg  # noqa: F401
from test_predict import small_model_cfg
from r3d_tpu.config import get_config, TrainConfig
from r3d_tpu.data.datasets import build_loader, build_source
from r3d_tpu.models import build_model
from r3d_tpu.ops.quant import (
    QuantizedTensor,
    dequantize_tree,
    quantize_tree,
    quantized_nbytes,
)
from r3d_tpu.serving import InferenceSession
from r3d_tpu.train.checkpoint import Checkpointer
from r3d_tpu.train.loop import Trainer


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 128).astype(np.float32) * rng.rand(128)  # varied scales
    qt = quantize_tree({"x": {"kernel": jnp.asarray(w)}})["x"]["kernel"]
    assert isinstance(qt, QuantizedTensor) and qt.q.dtype == jnp.int8
    deq = np.asarray(dequantize_tree({"k": qt})["k"])
    bound = np.abs(w).max(axis=0, keepdims=True) / 254.0 + 1e-7
    assert np.all(np.abs(deq - w) <= bound)

    # ineligible leaves pass through: bias (1-D), tiny kernel, int array
    tree = {
        "bias": jnp.zeros((128,)),
        "small": {"kernel": jnp.zeros((4, 4))},
        "table": jnp.zeros((100, 100), jnp.int32),
    }
    out = quantize_tree(tree)
    assert not any(
        isinstance(l, QuantizedTensor)
        for l in jax.tree.leaves(
            out, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    )


def test_quantized_footprint_at_real_shapes():
    """At the utkinects config's real kernel shapes the quantized tree is
    under 0.3x the f32 bytes (the 19200-wide depth projection and the
    2048-wide input embed dominate)."""
    params = {
        "embed": {"input_embed": {"kernel": jnp.zeros((2048, 128))}},
        "depth_embed": {"depth_projection": {"kernel": jnp.zeros((19200, 128))}},
        "heads": {"fc": {"kernel": jnp.zeros((128, 17)),
                         "bias": jnp.zeros((17,))}},
        "pos_embedding": jnp.zeros((1, 2000, 128)),
    }
    q = quantize_tree(params)
    kernels = ["embed", "depth_embed"]
    full_b = sum(quantized_nbytes(params[k]) for k in kernels)
    q_b = sum(quantized_nbytes(q[k]) for k in kernels)
    assert q_b < 0.3 * full_b
    # positional table + bias stay float
    assert not isinstance(q["pos_embedding"], QuantizedTensor)
    assert not isinstance(q["heads"]["fc"]["bias"], QuantizedTensor)


def test_quantized_session_matches_full(disk_dataset, tmp_path):  # noqa: F811
    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0,
                          batch_size=4),
    )
    source = build_source(cfg.data, "train_split.txt")
    loader = build_loader(source, cfg.data, 4, cfg.model.n_query, mode="train")
    trainer = Trainer(cfg, source.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    Checkpointer(str(tmp_path)).save_best(state, seed=1, epoch=0)

    full = InferenceSession.from_checkpoint(
        cfg, str(tmp_path), seed=1, n_class=source.n_class, max_batch=4
    )
    q8 = InferenceSession.from_checkpoint(
        cfg, str(tmp_path), seed=1, n_class=source.n_class, max_batch=4,
        quantize="int8",
    )

    # something actually quantized, and the device params shrank (the tiny
    # test model has few kernels above the element floor; the 4x claim is
    # checked at real shapes in test_quantized_footprint_at_real_shapes)
    q_nodes = [
        l for l in jax.tree.leaves(
            q8.variables["params"],
            is_leaf=lambda x: isinstance(x, QuantizedTensor))
        if isinstance(l, QuantizedTensor)
    ]
    assert q_nodes
    assert quantized_nbytes(q8.variables["params"]) < quantized_nbytes(
        full.variables["params"]
    )

    v0 = source.load_video(source.vid_list[0])
    feats = np.asarray(v0["features"][:30], np.float32)
    depth = np.asarray(v0["depth"][:30], np.float32)
    S = 32
    f = np.zeros((1, S, feats.shape[-1]), np.float32)
    f[0, :30] = feats
    d = np.zeros((1, S) + depth.shape[1:], np.float32)
    d[0, :30] = depth
    mask = np.ones((1, S), bool)
    mask[0, :30] = False
    out_f = full._forward(full.variables, f, d, mask)
    out_q = q8._forward(q8.variables, f, d, mask)
    # logits within a few percent of the full-precision forward
    a_f = np.asarray(out_f["action"], np.float32)
    a_q = np.asarray(out_q["action"], np.float32)
    scale = np.abs(a_f).max() + 1e-6
    assert np.max(np.abs(a_f - a_q)) / scale < 0.05

    # the end-to-end serving API runs and produces the full protocol output
    res = q8.anticipate(feats, depth, future_len=25)
    assert res["future_frames"].shape == (25,)
    assert res["transcript"].shape == (cfg.model.n_query,)

    # unknown mode / mesh combination are rejected clearly
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    with pytest.raises(ValueError):
        InferenceSession(cfg, variables, source.n_class, quantize="int4")


def test_quantized_export_roundtrip(disk_dataset, tmp_path):  # noqa: F811
    """export() of a quantized session bakes the int8 tree into the
    artifact; the loaded StableHLO program reproduces the live outputs."""
    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0,
                          batch_size=4),
    )
    source = build_source(cfg.data, "train_split.txt")
    loader = build_loader(source, cfg.data, 4, cfg.model.n_query, mode="train")
    trainer = Trainer(cfg, source.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), next(iter(loader)), steps_per_epoch=1
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    q8 = InferenceSession(cfg, variables, source.n_class, max_batch=2,
                          quantize="int8")

    from r3d_tpu.serving import ExportedSession

    q8.export(str(tmp_path / "artifact"))
    served = ExportedSession.load(str(tmp_path / "artifact"))

    v0 = source.load_video(source.vid_list[0])
    feats = np.asarray(v0["features"][:20], np.float32)
    depth = np.asarray(v0["depth"][:20], np.float32)
    live = q8.anticipate(feats, depth, future_len=16)
    loaded = served.anticipate(feats, depth, future_len=16)
    np.testing.assert_array_equal(live["future_frames"],
                                  loaded["future_frames"])
    np.testing.assert_array_equal(live["transcript"], loaded["transcript"])


def test_uint8_input_session_matches_full(disk_dataset, tmp_path):  # noqa: F811
    """input_dtype='uint8' ships the depth stream as uint8 + per-video
    (lo, scale) and dequantizes on device (serving.py:_maybe_dequant_input).

    No reference counterpart (no serving story there); the bound is the
    quantizer's own: depth reconstructs within scale/2 = range/510 per
    element, so logits stay within a few percent and the decoded protocol
    output (transcript argmax) agrees with the float session.
    """
    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0,
                          batch_size=4),
    )
    source = build_source(cfg.data, "train_split.txt")
    loader = build_loader(source, cfg.data, 4, cfg.model.n_query, mode="train")
    trainer = Trainer(cfg, source.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), next(iter(loader)), steps_per_epoch=1
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    full = InferenceSession(cfg, variables, source.n_class, max_batch=4)
    u8 = InferenceSession(cfg, variables, source.n_class, max_batch=4,
                          input_dtype="uint8")

    v0 = source.load_video(source.vid_list[0])
    feats = np.asarray(v0["features"][:30], np.float32)
    # min-max normalized depth, like the reference preprocessing emits
    d = np.asarray(v0["depth"][:30], np.float32)
    depth = (d - d.min()) / (d.max() - d.min())

    res_f = full.anticipate(feats, depth, future_len=25)
    res_u = u8.anticipate(feats, depth, future_len=25)
    # protocol outputs agree exactly (argmax agreement)...
    np.testing.assert_array_equal(res_f["transcript"], res_u["transcript"])
    np.testing.assert_array_equal(res_f["future_frames"],
                                  res_u["future_frames"])
    # ...and the raw logits within a small tolerance of the float forward
    S = 32
    f = np.zeros((1, S, feats.shape[-1]), np.float32)
    f[0, :30] = feats
    dq = np.zeros((1, S) + depth.shape[1:], np.float32)
    dq[0, :30] = depth
    mask = np.ones((1, S), bool)
    mask[0, :30] = False
    u, lo, scale = InferenceSession.quantize_depth(depth)
    du8 = np.zeros((1, S) + depth.shape[1:], np.uint8)
    du8[0, :30] = u
    qp = np.array([[lo, scale]], np.float32)
    out_f = full._forward(full.variables, f, dq, mask)
    out_u = u8._forward(u8.variables, f, du8, qp, mask)
    a_f = np.asarray(out_f["action"], np.float32)
    a_u = np.asarray(out_u["action"], np.float32)
    assert np.max(np.abs(a_f - a_u)) / (np.abs(a_f).max() + 1e-6) < 0.05

    # uint8 client input passes through with zero host quantize cost under
    # the [0, 1] convention: u/255 == dequant(quantize(u/255)) exactly
    d_u8 = np.clip(np.rint(depth * 255), 0, 255).astype(np.uint8)
    res_direct = u8.anticipate(feats, d_u8, future_len=25)
    res_same = u8.anticipate(feats, d_u8.astype(np.float32) / 255.0,
                             future_len=25)
    np.testing.assert_array_equal(res_direct["transcript"],
                                  res_same["transcript"])

    # composes with int8 weight quantization (both dequants in one program)
    both = InferenceSession(cfg, variables, source.n_class, max_batch=4,
                            quantize="int8", input_dtype="uint8")
    res_b = both.anticipate(feats, depth, future_len=25)
    assert res_b["future_frames"].shape == (25,)

    # rejected clearly: unknown dtype, and a depth-less model
    with pytest.raises(ValueError):
        InferenceSession(cfg, variables, source.n_class, input_dtype="int4")
    futr_cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, model="futr"))
    futr_model = build_model(futr_cfg.model, source.n_class)
    fv = futr_model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 32, 12), jnp.float32),
                         None, train=False)
    with pytest.raises(ValueError, match="depth"):
        InferenceSession(futr_cfg, fv, source.n_class, input_dtype="uint8")


def test_uint8_input_export_roundtrip(disk_dataset, tmp_path):  # noqa: F811
    """The exported artifact records input_dtype; the loaded StableHLO
    programs take (feats, depth_u8, qp, mask) and reproduce the live
    session's protocol outputs."""
    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0,
                          batch_size=4),
    )
    source = build_source(cfg.data, "train_split.txt")
    loader = build_loader(source, cfg.data, 4, cfg.model.n_query, mode="train")
    trainer = Trainer(cfg, source.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), next(iter(loader)), steps_per_epoch=1
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    u8 = InferenceSession(cfg, variables, source.n_class, max_batch=2,
                          input_dtype="uint8")

    from r3d_tpu.serving import ExportedSession

    u8.export(str(tmp_path / "artifact"))
    served = ExportedSession.load(str(tmp_path / "artifact"))
    assert served.input_dtype == "uint8"

    v0 = source.load_video(source.vid_list[0])
    feats = np.asarray(v0["features"][:20], np.float32)
    d = np.asarray(v0["depth"][:20], np.float32)
    depth = (d - d.min()) / (d.max() - d.min())
    live = u8.anticipate(feats, depth, future_len=16)
    loaded = served.anticipate(feats, depth, future_len=16)
    np.testing.assert_array_equal(live["future_frames"],
                                  loaded["future_frames"])
    np.testing.assert_array_equal(live["transcript"], loaded["transcript"])
