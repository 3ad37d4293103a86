"""Reference quirk COMPAT #37: training epochs >= 1 run in module-eval mode.

Every reference train loop calls ``validate()`` (which flips the module to
eval, e.g. train_proposed_depth.py:53) at the end of every epoch, and only
train_proposed.py:252 / train_unimodal.py:270 flip it back — so on the other
loops (train.py:168, train_proposed_depth.py:235, train_unsupervised.py:411,
train_tcn.py:105) every epoch after the first TRAINS with eval-mode
BatchNorm (running stats frozen at their end-of-epoch-0 values, never
updated again) and dropout disabled, while gradients still flow.

Discovered by the composed-protocol parity run (its trajectory diverged
from epoch 1 until our trainer reproduced the quirk); the torch-vs-jax
trajectory equality itself is pinned end-to-end there
(test_composed_protocol_parity). THIS file pins our trainer's semantics
directly: which loops freeze, when, on which fit paths, and that the
override flag flips both ways.
"""

import dataclasses

import numpy as np
import pytest

import jax

from r3d_tpu.config import TrainConfig, get_config
from r3d_tpu.data.pipeline import BucketedLoader
from r3d_tpu.data.synthetic import SyntheticSource
from r3d_tpu.train.loop import Trainer

OBS = (0.2, 0.3, 0.5)
SR = 2
NQ = 8
BUCKETS = (48, 64)


@pytest.fixture(scope="module")
def src():
    return SyntheticSource(n_videos=6, n_actions=5, vid_len_range=(60, 120),
                           input_dim=16, depth_shape=(6, 4), seed=3)


def small_cfg(loop: str, sticky=None, epochs: int = 3):
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
            dropout=0.0, fuser_dropout=0.0,
        ),
        train=TrainConfig(
            loop=loop, batch_size=4, epochs=epochs, warmup_epochs=1,
            min_train_batch=0, seeds=(1,), sticky_eval=sticky,
            device_cache=False,
        ),
    )


def _loaders(src):
    fn, n = src.make_example_fn(OBS, SR, NQ)
    train = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=4,
        pad_idx=src.pad_idx, buckets=BUCKETS, n_query=NQ, with_depth=True,
        shuffle=True, seed=1,
    )
    val = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=4,
        pad_idx=src.pad_idx, buckets=BUCKETS, n_query=NQ, with_depth=True,
        shuffle=False,
    )
    return train, val


def _stats_per_epoch(cfg, src, use_cache=False):
    """BN running stats after each epoch of one fit/fit_cached run (driven
    one epoch at a time via start_epoch, same schedule/config)."""
    trainer = Trainer(cfg, src.n_class)
    train, val = _loaders(src)
    state = trainer.init_state(jax.random.PRNGKey(7), next(iter(train)),
                               steps_per_epoch=max(len(train), 1))
    cache = None
    if use_cache:
        from r3d_tpu.data.device_cache import build_cache
        from test_device_cache import source_videos

        cache = build_cache(source_videos(src), OBS, SR, NQ, src.pad_idx,
                            src.n_class, BUCKETS)
    out = [jax.tree.map(np.array, state.batch_stats)]  # init
    for e in range(cfg.train.epochs):
        trainer.config = cfg.replace(
            train=dataclasses.replace(cfg.train, epochs=e + 1))
        if cache is not None:
            state = trainer.fit_cached(state, cache, val, seed=0,
                                       log=lambda *a: None, start_epoch=e)
        else:
            state = trainer.fit(state, train, val, seed=0,
                                log=lambda *a: None, start_epoch=e)
        out.append(jax.tree.map(np.array, state.batch_stats))
    return trainer, state, out


def _max_delta(a, b):
    return max(
        jax.tree.leaves(
            jax.tree.map(lambda x, y: float(np.abs(x - y).max()), a, b)
        )
    )


def test_sticky_loop_freezes_bn_stats_after_epoch0(src):
    """proposed_depth (train_proposed_depth.py:235 never restores
    model.train()): BN running stats move during epoch 0 and are BIT-FROZEN
    from epoch 1 on."""
    _, _, s = _stats_per_epoch(small_cfg("proposed_depth"), src)
    assert _max_delta(s[1], s[0]) > 0.0          # epoch 0 updated them
    assert _max_delta(s[2], s[1]) == 0.0         # epoch 1 froze them
    assert _max_delta(s[3], s[1]) == 0.0


def test_nonsticky_loop_keeps_updating_bn_stats(src):
    """proposed (train_proposed.py:252 restores model.train()): stats keep
    moving every epoch."""
    _, _, s = _stats_per_epoch(small_cfg("proposed"), src)
    assert _max_delta(s[2], s[1]) > 0.0
    assert _max_delta(s[3], s[2]) > 0.0


def test_sticky_override_flag(src):
    """TrainConfig.sticky_eval overrides the per-loop default both ways."""
    _, _, s = _stats_per_epoch(small_cfg("proposed", sticky=True), src)
    assert _max_delta(s[2], s[1]) == 0.0
    _, _, s = _stats_per_epoch(small_cfg("proposed_depth", sticky=False), src)
    assert _max_delta(s[2], s[1]) > 0.0


def test_sticky_applies_on_cached_path(src):
    """fit_cached implements the same flip (loop-semantics invariant:
    fit_cached matches fit)."""
    _, _, s = _stats_per_epoch(small_cfg("proposed_depth"), src,
                               use_cache=True)
    assert _max_delta(s[1], s[0]) > 0.0
    assert _max_delta(s[2], s[1]) == 0.0


def test_frozen_epochs_still_learn(src):
    """Sticky epochs freeze BN/dropout, NOT the gradients: params keep
    moving through frozen epochs."""
    cfg = small_cfg("proposed_depth", epochs=3)
    trainer = Trainer(cfg, src.n_class)
    train, val = _loaders(src)
    state = trainer.init_state(jax.random.PRNGKey(7), next(iter(train)),
                               steps_per_epoch=max(len(train), 1))
    # epochs 0-1
    trainer.config = cfg.replace(
        train=dataclasses.replace(cfg.train, epochs=2))
    state = trainer.fit(state, train, val, seed=0, log=lambda *a: None)
    p1 = jax.tree.map(np.array, state.params)
    # epoch 2 (frozen) still updates params
    trainer.config = cfg
    state = trainer.fit(state, train, val, seed=0, log=lambda *a: None,
                        start_epoch=2)
    assert _max_delta(jax.tree.map(np.array, state.params), p1) > 0.0
