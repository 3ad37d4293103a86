"""Device-resident dataset cache: on-device batch assembly must be
bit-identical to the host collate, and fit_cached() must reproduce fit().
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3d_tpu.config import get_config, DataConfig, TrainConfig
from r3d_tpu.data.device_cache import assemble, build_cache, epoch_plan
from r3d_tpu.data.pipeline import pad_batch
from r3d_tpu.data.synthetic import SyntheticSource
from r3d_tpu.train.loop import Trainer

OBS = (0.2, 0.3, 0.5)
SR = 2
NQ = 8
BUCKETS = (48, 64)


def make_source(depth=True, query=0):
    return SyntheticSource(
        n_videos=6, n_actions=5, vid_len_range=(60, 120), input_dim=16,
        depth_shape=(6, 4) if depth else None, n_query_classes=query, seed=3,
    )


def source_videos(src):
    vids = []
    for v in src.videos:
        d = {
            "features": v["features"],
            "label_idx": np.array([src.actions_dict[l] for l in v["labels"]]),
        }
        if "depth" in v:
            d["depth"] = v["depth"]
        if "query" in v:
            d["query_idx"] = np.array(
                [src.query_dict[q] for q in v["query"]]
            )
        vids.append(d)
    return vids


@pytest.mark.parametrize("feature_dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("query", [0, 7])
def test_assemble_matches_host_collate(feature_dtype, query):
    src = make_source(depth=True, query=query)
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
        feature_dtype=feature_dtype,
        query_pad_idx=query or None,
    )
    fn, n = src.make_example_fn(OBS, SR, NQ)
    assert n == cache.n_views

    view_ids = np.array([0, 5, 11, 17], np.int32)
    examples = [fn(int(i)) for i in view_ids]
    host = pad_batch(
        examples, src.pad_idx, BUCKETS, NQ, with_depth=True,
        with_query=bool(query), feature_dtype=feature_dtype,
        query_pad_idx=query or None,
    )
    S = host["features"].shape[1]
    dev = assemble(cache.data, jnp.asarray(view_ids), S, SR, cache.pad_idx,
                   cache.query_pad_idx)
    assert set(dev) == set(host)
    for k in host:
        got = np.asarray(jax.device_get(dev[k]))
        want = np.asarray(host[k])
        assert got.dtype == want.dtype, k
        np.testing.assert_array_equal(got, want, err_msg=k)


def small_cfg(src, loop="futr", **train_kw):
    cfg = get_config("utkinects")
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset="synthetic", seq_buckets=BUCKETS,
            train_obs_percs=OBS, sample_rate=SR, depth_shape=(6, 4),
        ),
        model=dataclasses.replace(
            cfg.model, model="futr_fusion_bn", input_dim=16, hidden_dim=16,
            n_head=2, n_query=NQ, n_encoder_layers=1, n_decoder_layers=1,
            compute_dtype="float32", log_erank=False, max_pos_len=128,
        ),
        train=TrainConfig(
            loop=loop, batch_size=4, epochs=2, warmup_epochs=1,
            min_train_batch=0, seeds=(1,), **train_kw,
        ),
    )


def test_cached_steps_equal_host_steps():
    """A scanned cached dispatch == sequential host-batch train steps."""
    src = make_source(depth=True)
    cfg = small_cfg(src)
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
    )
    trainer = Trainer(cfg, src.n_class)

    plan = epoch_plan(cache, 4, seed=1, epoch=0, drop_remainder=True)
    # keep only same-bucket batches so one scan covers them
    S0 = plan[0][0]
    idxs = [idx for S, idx in plan if S == S0][:2]
    fn, _ = src.make_example_fn(OBS, SR, NQ)

    host_batches = []
    for idx in idxs:
        ex = [fn(int(i)) for i in idx]
        host_batches.append(
            jax.tree.map(
                jnp.asarray,
                pad_batch(ex, src.pad_idx, (S0,), NQ, with_depth=True),
            )
        )

    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(jax.random.PRNGKey(7), host_batches[0], 2)
    host_state = state
    train_step = trainer.make_train_step()
    host_metrics = []
    for b in host_batches:
        host_state, m = train_step(host_state, b, rng, 0)
        host_metrics.append(m)

    state2 = trainer.init_state(jax.random.PRNGKey(7), host_batches[0], 2)
    cached = trainer.make_cached_train_fn(cache)
    stacked = jnp.asarray(np.stack(idxs))
    cached_state, msum = cached(state2, cache.data, stacked, rng, S0, 0)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        ),
        jax.device_get(host_state.params), jax.device_get(cached_state.params),
    )
    want = {
        k: sum(float(m[k]) for m in host_metrics) for k in host_metrics[0]
    }
    for k, v in want.items():
        np.testing.assert_allclose(float(msum[k]), v, rtol=1e-5, err_msg=k)


def test_fit_cached_equals_fit():
    """Full fit() vs fit_cached(): same shuffles, same final params."""
    from r3d_tpu.data.pipeline import BucketedLoader

    src = make_source(depth=True)
    cfg = small_cfg(src, steps_per_dispatch=3)
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
    )
    fn, n = src.make_example_fn(OBS, SR, NQ)

    def loader(shuffle, seed=1):
        return BucketedLoader(
            num_examples=n, make_example_fn=fn, batch_size=4,
            pad_idx=src.pad_idx, buckets=BUCKETS, n_query=NQ,
            with_depth=True, shuffle=shuffle, seed=seed,
        )

    val = loader(False)
    example = next(iter(val))

    logs = {"host": [], "cached": []}
    capture = lambda tag: lambda *a: logs[tag].append(" ".join(map(str, a)))

    t1 = Trainer(cfg, src.n_class)
    s1 = t1.init_state(jax.random.PRNGKey(7), example, 2)
    s1 = t1.fit(s1, loader(True, seed=1), loader(False), seed=1,
                log=capture("host"))

    t2 = Trainer(cfg, src.n_class)
    s2 = t2.init_state(jax.random.PRNGKey(7), example, 2)
    # the val set assembles on device too (same cache here: synthetic source)
    s2 = t2.fit_cached(s2, cache, None, seed=1, log=capture("cached"),
                       val_cache=cache)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        ),
        jax.device_get(s1.params), jax.device_get(s2.params),
    )
    # cached validation must report the same numbers as the host val loader
    host_val = [l for l in logs["host"] if l.startswith("Validation")]
    cached_val = [l for l in logs["cached"] if l.startswith("Validation")]
    assert host_val and host_val == cached_val


def test_fit_cached_unsupervised_equals_fit():
    """The DARai curriculum loop: seg_ids derive in-step from the cached
    query stream (segment_ids_from_labels_jnp) — trajectory must match the
    host loop, which computes them on host per batch."""
    import dataclasses

    from r3d_tpu.config import DataConfig, ModelConfig, TrainConfig
    from r3d_tpu.data.pipeline import BucketedLoader

    src = SyntheticSource(
        n_videos=6, n_actions=5, vid_len_range=(60, 120), input_dim=16,
        n_query_classes=7, seed=3,
    )
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model="futr_unsupervised", hidden_dim=16, n_head=2,
            n_encoder_layers=1, n_decoder_layers=1, n_query=NQ, input_dim=16,
            max_pos_len=128, compute_dtype="float32", query_num=7,
        ),
        train=TrainConfig(
            loop="unsupervised", batch_size=4, epochs=2, warmup_epochs=1,
            min_train_batch=0, l3_pad_idx=7, l3_exclude_idx=None,
            max_segments=16, seeds=(1,), steps_per_dispatch=2,
        ),
        data=DataConfig(
            dataset="synthetic", seq_buckets=BUCKETS, train_obs_percs=OBS,
            sample_rate=SR,
        ),
    )
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
        query_pad_idx=7,
    )
    fn, n = src.make_example_fn(OBS, SR, NQ)

    def loader(shuffle, seed=1):
        return BucketedLoader(
            num_examples=n, make_example_fn=fn, batch_size=4,
            pad_idx=src.pad_idx, buckets=BUCKETS, n_query=NQ,
            with_query=True, shuffle=shuffle, seed=seed, query_pad_idx=7,
        )

    example = next(iter(loader(False)))
    t1 = Trainer(cfg, src.n_class)
    s1 = t1.init_state(jax.random.PRNGKey(7), example, 2)
    s1 = t1.fit(s1, loader(True, seed=1), loader(False), seed=1,
                log=lambda *a: None)

    t2 = Trainer(cfg, src.n_class)
    s2 = t2.init_state(jax.random.PRNGKey(7), example, 2)
    s2 = t2.fit_cached(s2, cache, loader(False), seed=1, log=lambda *a: None)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=0
        ),
        jax.device_get(s1.params), jax.device_get(s2.params),
    )


def test_fit_cached_resume(tmp_path):
    """--resume through the cached path: restore the rolling last checkpoint
    and continue from the recorded epoch."""
    from r3d_tpu.train.checkpoint import Checkpointer

    src = make_source(depth=True)
    cfg = small_cfg(src)
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
    )
    fn, n = src.make_example_fn(OBS, SR, NQ)
    from r3d_tpu.data.pipeline import BucketedLoader

    val = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=4,
        pad_idx=src.pad_idx, buckets=BUCKETS, n_query=NQ, with_depth=True,
        shuffle=False,
    )
    example = next(iter(val))
    ckpt = Checkpointer(str(tmp_path))

    t = Trainer(cfg, src.n_class)
    s = t.init_state(jax.random.PRNGKey(7), example, 2)
    s = t.fit_cached(s, cache, val, seed=1, checkpointer=ckpt,
                     log=lambda *a: None)
    steps_after_2 = int(s.step)
    assert ckpt.has("seed_1_last")

    t2 = Trainer(cfg, src.n_class)
    template = t2.init_state(jax.random.PRNGKey(0), example, 2)
    restored = ckpt.restore_last(1, template)
    assert int(restored.step) == steps_after_2
    cfg3 = cfg.replace(train=dataclasses.replace(cfg.train, epochs=3))
    t3 = Trainer(cfg3, src.n_class)
    t3.tx = t2.tx
    s3 = t3.fit_cached(restored, cache, val, seed=1, log=lambda *a: None,
                       start_epoch=2)
    assert int(s3.step) > steps_after_2  # one more epoch ran


def test_cache_memory_guard():
    src = make_source(depth=True)
    with pytest.raises(MemoryError):
        build_cache(
            source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class,
            BUCKETS, max_bytes=1024,
        )


def test_assemble_short_feature_stream():
    """A video whose feature file has FEWER rows than its gt must still
    match the host collate bit-for-bit: pad_batch truncates past_label to
    the feature stream's strided length (pipeline.py s = min(feat rows, S)),
    so the cache's view window clamps the same way (advisor round-2 #1)."""
    from r3d_tpu.data.protocol import make_example_from_indices

    rng = np.random.RandomState(0)
    videos = []
    for n_lab, n_feat in [(100, 100), (100, 91), (80, 62)]:
        videos.append({
            "features": rng.randn(n_feat, 16).astype(np.float32),
            "label_idx": rng.randint(0, 4, size=n_lab),
            "depth": rng.randn(n_feat, 6, 4).astype(np.float32),
        })
    pad_idx, n_class = 4, 6
    cache = build_cache(videos, OBS, SR, NQ, pad_idx, n_class, BUCKETS)

    examples, view_ids = [], []
    for vi, v in enumerate(videos):
        for oi, obs in enumerate(OBS):
            examples.append(make_example_from_indices(
                v["features"], v["label_idx"], obs, SR, NQ, pad_idx,
                n_class, depth_features=v["depth"],
            ))
            view_ids.append(vi * len(OBS) + oi)
    host = pad_batch(examples, pad_idx, BUCKETS, NQ, with_depth=True)
    S = host["features"].shape[1]
    dev = assemble(cache.data, jnp.asarray(np.array(view_ids, np.int32)), S,
                   SR, pad_idx, None)
    for k in host:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(dev[k])), np.asarray(host[k]),
            err_msg=k,
        )


def test_gather_5d_knob_matches_flat(monkeypatch):
    """R3D_GATHER_5D=1 (the direct multi-axis slice, kept as the
    measurement arm of the r5 layout A/B — tools/measure_mfu.py
    --ab_gather) must stay value-identical to the default flattened
    gather, or the A/B silently compares against broken code."""
    src = make_source(depth=True)
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
    )
    view_ids = jnp.asarray(np.array([0, 5, 11, 17], np.int32))
    S = BUCKETS[-1]
    flat = assemble(cache.data, view_ids, S, SR, cache.pad_idx, None)
    monkeypatch.setenv("R3D_GATHER_5D", "1")
    direct = assemble(cache.data, view_ids, S, SR, cache.pad_idx, None)
    assert set(flat) == set(direct)
    for k in flat:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(flat[k])),
            np.asarray(jax.device_get(direct[k])), err_msg=k)
