"""Predictor tests: bucket-padded batched inference must equal unpadded
per-video forwards, and the MoC sweep must produce sane results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_datasets import disk_dataset, make_cfg  # fixtures  # noqa: F401
from r3d_tpu.config import get_config, ModelConfig, TrainConfig
from r3d_tpu.data.datasets import build_source
from r3d_tpu.eval.predict import Predictor
from r3d_tpu.models import build_model


def small_model_cfg():
    return ModelConfig(
        model="futr_fusion_bn", hidden_dim=32, n_head=4, n_encoder_layers=1,
        n_decoder_layers=1, n_query=8, input_dim=12, max_pos_len=64,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def setup(disk_dataset):  # noqa: F811
    cfg = get_config("utkinects").replace(
        data=make_cfg(disk_dataset),
        model=small_model_cfg(),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0),
    )
    source = build_source(cfg.data, "train_split.txt")
    model = build_model(cfg.model, source.n_class)
    v = source.load_video(source.vid_list[0])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(v["features"][None], jnp.float32),
        jnp.asarray(v["depth"][None], jnp.float32),
        None, train=False,
    )
    return cfg, source, model, variables


def test_padded_batch_forward_is_exact(setup):
    """Bucket padding + key mask + filler rows must not change a video's
    logits vs an unpadded single-video forward."""
    cfg, source, model, variables = setup
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    groups = predictor._prepare(source, obs_p=0.5)
    (S, items), = groups.items()  # all test videos land in the 64 bucket
    outputs = predictor._forward_batch(variables, items[:3], S)

    for i, it in enumerate(items[:3]):
        direct = model.apply(
            variables,
            jnp.asarray(it["feats"][None], jnp.float32),
            jnp.asarray(it["depth"][None], jnp.float32),
            None, train=False,
        )
        np.testing.assert_allclose(
            outputs["action"][i], np.array(direct["action"][0]), atol=2e-4
        )
        np.testing.assert_allclose(
            outputs["seg"][i][: it["real_s"]],
            np.array(direct["seg"][0]), atol=2e-4,
        )


def test_predict_sweep_outputs(setup):
    cfg, source, model, variables = setup
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p=0.3, log=lambda *a: None)
    for p in (10, 20, 30, 50):
        key = f"obs30_pred{p}"
        assert key in res and 0.0 <= res[key] <= 1.0
    assert 0.0 <= res["ant_acc"] <= 1.0
    assert 0.0 <= res["seg_acc"] <= 1.0


def test_predict_with_gifs(setup, tmp_path):
    pytest.importorskip("imageio")
    pytest.importorskip("matplotlib")
    cfg, source, model, variables = setup
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(
        variables, source, obs_p=0.3, log=lambda *a: None,
        gif_dir=str(tmp_path), frames_root="/nonexistent",  # black frames
    )
    import os

    gifs = [f for f in os.listdir(tmp_path) if f.endswith(".gif")]
    assert len(gifs) == len(source.vid_list)


def test_predict_multi_equals_per_obs(setup):
    """The single-pass multi-ratio sweep must reproduce the per-ratio
    results exactly (same videos, same compiled forwards, fuller chunks)."""
    cfg, source, model, variables = setup
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    multi = predictor.predict_multi(
        variables, source, [0.2, 0.3, 0.5], log=lambda *a: None
    )
    for obs in (0.2, 0.3, 0.5):
        single = predictor.predict(
            variables, source, obs_p=obs, log=lambda *a: None
        )
        assert set(single) == set(multi[obs])
        for k in single:
            np.testing.assert_allclose(multi[obs][k], single[k], atol=1e-6)


def test_predict_cached_equals_host(setup):
    """The device-cached sweep (HBM video arrays, gather fused into the
    forward) must reproduce the host-padded sweep exactly — every metric,
    every obs ratio, including partial filler chunks."""
    from r3d_tpu.data.device_cache import (
        build_video_arrays, videos_from_source,
    )

    cfg, source, model, variables = setup
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    host = predictor.predict_multi(
        variables, source, [0.2, 0.3, 0.5], log=lambda *a: None
    )
    data = build_video_arrays(
        videos_from_source(source, cfg.data), cfg.data.feature_dtype
    )
    cached = predictor.predict_multi(
        variables, source, [0.2, 0.3, 0.5], log=lambda *a: None,
        cache_data=data,
    )
    for obs in (0.2, 0.3, 0.5):
        assert set(host[obs]) == set(cached[obs])
        for k in host[obs]:
            np.testing.assert_allclose(
                cached[obs][k], host[obs][k], atol=1e-6, err_msg=f"{obs}/{k}"
            )


def test_predict_seed_ensemble(setup):
    """Logit ensembling: [v, v] must equal the single-checkpoint sweep, and
    two genuinely different checkpoints must produce a valid sweep."""
    cfg, source, model, variables = setup
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    single = predictor.predict(variables, source, obs_p=0.3, log=lambda *a: None)
    same = predictor.predict([variables, variables], source, obs_p=0.3,
                             log=lambda *a: None)
    for k in single:
        np.testing.assert_allclose(same[k], single[k], atol=1e-6)

    v = source.load_video(source.vid_list[0])
    other = model.init(
        jax.random.PRNGKey(7),
        jnp.asarray(v["features"][None], jnp.float32),
        jnp.asarray(v["depth"][None], jnp.float32),
        None, train=False,
    )
    mixed = predictor.predict([variables, other], source, obs_p=0.3,
                              log=lambda *a: None)
    assert 0.0 <= mixed["obs30_pred50"] <= 1.0


def test_predict_l3_accuracy(disk_dataset):
    """Models with an l3 head report predict-time L3/query accuracy
    (reference predict_breakfast.py:121-131)."""
    import dataclasses
    import os

    root = os.path.join(disk_dataset, "utkinect")
    mapping = os.path.join(root, "mapping_l3.txt")
    if not os.path.exists(mapping):
        with open(mapping, "w") as f:
            f.write("0 q0\n1 q1\n2 q2\n")

    data_cfg = dataclasses.replace(
        make_cfg(disk_dataset), query_mapping_file="mapping_l3.txt",
        depth_features_dir=None,
    )
    cfg = get_config("utkinects").replace(
        data=data_cfg,
        model=dataclasses.replace(
            small_model_cfg(), model="futr_unsupervised", query_num=3,
        ),
        train=TrainConfig(loop="unsupervised", min_train_batch=0),
    )
    source = build_source(cfg.data, "train_split.txt")
    model = build_model(cfg.model, source.n_class)
    v = source.load_video(source.vid_list[0])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(v["features"][None], jnp.float32),
        jnp.asarray(v["query_idx"][None]),
        None, train=False,
    )
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p=0.5, log=lambda *a: None)
    assert "l3_acc" in res and 0.0 <= res["l3_acc"] <= 1.0

    # oracle: recount from the same chunked forwards (the l3 stream attends
    # ACROSS THE BATCH — reference quirk COMPAT #17 — so per-video forwards
    # are intentionally not comparable; this pins the counting/masking logic)
    it_groups = predictor._prepare(source, 0.5)
    (S, items), = it_groups.items()
    correct = total = 0
    for start in range(0, len(items), predictor.eval_batch):
        chunk = items[start : start + predictor.eval_batch]
        outputs = predictor._forward_batch(variables, chunk, S)
        for i, it in enumerate(chunk):
            r = it["real_s"]
            pred = np.argmax(outputs["l3"][i][:r], axis=-1)
            correct += int(np.sum(pred == it["query"][:r]))
            total += r
    np.testing.assert_allclose(res["l3_acc"], correct / total, atol=1e-6)


def test_predict_query_conditioned_model(disk_dataset, tmp_path):
    """futr_proposed (gt-query conditioning) through the MoC sweep
    (reference predict_with_query / predict.py:74 protocol)."""
    import dataclasses
    import os

    # the csv gt carries q0..q2 L3 labels; add their mapping
    root = os.path.join(disk_dataset, "utkinect")
    with open(os.path.join(root, "mapping_l3.txt"), "w") as f:
        f.write("0 q0\n1 q1\n2 q2\n")

    data_cfg = dataclasses.replace(
        make_cfg(disk_dataset), query_mapping_file="mapping_l3.txt",
        depth_features_dir=None,
    )
    cfg = get_config("utkinects").replace(
        data=data_cfg,
        model=dataclasses.replace(
            small_model_cfg(), model="futr_proposed", query_num=3,
        ),
        train=TrainConfig(loop="futr", min_train_batch=0),
    )
    source = build_source(cfg.data, "train_split.txt")
    model = build_model(cfg.model, source.n_class)
    v = source.load_video(source.vid_list[0])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(v["features"][None], jnp.float32),
        jnp.asarray(v["query_idx"][None]),
        None, train=False,
    )
    predictor = Predictor(cfg, model, source.n_class, eval_batch=4)
    res = predictor.predict(variables, source, obs_p=0.3, log=lambda *a: None)
    assert "obs30_pred50" in res and 0.0 <= res["obs30_pred50"] <= 1.0
