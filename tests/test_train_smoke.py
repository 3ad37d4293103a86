"""End-to-end smoke: synthetic data -> Trainer -> loss drops, acc > chance.

This is the minimum end-to-end slice (SURVEY.md §7 step 3): dataset protocol
-> bucketed loader -> jitted train step -> validation, on CPU.
"""

import numpy as np
import jax
import pytest

from r3d_tpu.config import get_config, DataConfig, ModelConfig, TrainConfig
from r3d_tpu.data.pipeline import BucketedLoader
from r3d_tpu.data.synthetic import SyntheticSource
from r3d_tpu.train.loop import Trainer, last_non_padding_labels


def make_setup(model="futr", with_depth=False, **train_kw):
    src = SyntheticSource(
        n_videos=8, n_actions=5, vid_len_range=(60, 100), input_dim=32,
        depth_shape=(8, 6) if with_depth else None, seed=0,
    )
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model=model, hidden_dim=32, n_head=4, n_encoder_layers=1,
            n_decoder_layers=1, n_query=8, input_dim=32, max_pos_len=128,
            compute_dtype="float32", dropout=0.1,
            seg_excludes_none=(model == "futr"),
        ),
        train=TrainConfig(
            loop="proposed_depth" if with_depth else "futr",
            batch_size=8, epochs=3, warmup_epochs=1, lr=1e-3,
            min_train_batch=0, **train_kw,
        ),
        data=DataConfig(dataset="synthetic", seq_buckets=(128,)),
    )
    fn, n = src.make_example_fn(obs_percs=(0.2, 0.3, 0.5), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=8, pad_idx=src.pad_idx,
        buckets=(128,), n_query=8, with_depth=with_depth, seed=0,
    )
    return src, cfg, loader


@pytest.mark.parametrize("model,with_depth", [("futr", False), ("futr_fusion_bn", True)])
def test_train_smoke(model, with_depth):
    src, cfg, loader = make_setup(model, with_depth)
    trainer = Trainer(cfg, src.n_class)
    example = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), example, steps_per_epoch=len(loader)
    )
    step = trainer.make_train_step()

    losses = []
    rng = jax.random.PRNGKey(1)
    for epoch in range(3):
        ep = []
        for batch in loader:
            rng, r = jax.random.split(rng)
            state, metrics = step(state, batch, r, epoch)
            ep.append(float(metrics["loss"]))
        losses.append(np.mean(ep))
    # epoch 0 runs at lr=0 (pl_bolts warmup quirk); epochs 1-2 must improve
    assert losses[2] < losses[0], losses

    # eval step runs and produces finite metrics
    eval_step = trainer.make_eval_step()
    m = eval_step(state, example)
    assert np.isfinite(float(m["loss"]))


def test_train_smoke_weighted_and_erank():
    """proposed_depth loop: weighted CE + exclude class + effective-rank reg."""
    src, cfg, loader = make_setup("futr_fusion_bn", True, weighted_ce=True,
                                  exclude_class_idx=4)
    import dataclasses

    cfg = cfg.replace(model=dataclasses.replace(cfg.model, erank_weight=0.01))
    trainer = Trainer(cfg, src.n_class)
    example = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), example, steps_per_epoch=len(loader))
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, example, rng, 0)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_erank" in metrics


def test_last_non_padding_labels():
    import jax.numpy as jnp

    x = jnp.array([[1, 2, 9, 9], [9, 9, 9, 9], [3, 9, 4, 9]])
    out = last_non_padding_labels(x, pad_idx=9)
    assert out.tolist() == [2, 9, 4]


def test_train_smoke_unsupervised():
    """DARai-style curriculum loop: focal L3 + temporal-cluster + gated sum."""
    import dataclasses
    from r3d_tpu.losses.temporal import segment_ids_from_labels

    src = SyntheticSource(
        n_videos=8, n_actions=5, vid_len_range=(60, 100), input_dim=32,
        n_query_classes=12, seed=0,
    )
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model="futr_unsupervised", hidden_dim=32, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=32,
            max_pos_len=128, compute_dtype="float32", query_num=12,
        ),
        train=TrainConfig(
            loop="unsupervised", batch_size=8, epochs=1, warmup_epochs=1,
            min_train_batch=0, l3_pad_idx=10, l3_exclude_idx=11,
            max_segments=32,
        ),
        data=DataConfig(dataset="synthetic", seq_buckets=(128,)),
    )
    fn, n = src.make_example_fn(obs_percs=(0.3, 0.5), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=8, pad_idx=src.pad_idx,
        buckets=(128,), n_query=8, with_query=True, seed=0,
    )
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader))
    step = trainer.make_train_step()
    batch = dict(batch)
    batch["seg_ids"] = segment_ids_from_labels(batch["query_label"], None, 32)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 5)
    for k in ("loss", "loss_l3", "loss_supcon"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])

    ev = trainer.make_eval_step()
    m = ev(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_unsupervised_with_supcon_term():
    import dataclasses
    from r3d_tpu.losses.temporal import segment_ids_from_labels

    src = SyntheticSource(
        n_videos=8, n_actions=5, vid_len_range=(60, 100), input_dim=32,
        n_query_classes=12, seed=0,
    )
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model="futr_unsupervised", hidden_dim=32, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=32,
            max_pos_len=128, compute_dtype="float32", query_num=12,
        ),
        train=TrainConfig(
            loop="unsupervised", batch_size=8, epochs=1, warmup_epochs=1,
            min_train_batch=0, l3_pad_idx=10, l3_exclude_idx=11,
            max_segments=32, supcon_weight=0.1, supcon_samples=128,
        ),
        data=DataConfig(dataset="synthetic", seq_buckets=(128,)),
    )
    fn, n = src.make_example_fn(obs_percs=(0.3,), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=8, pad_idx=src.pad_idx,
        buckets=(128,), n_query=8, with_query=True, seed=0,
    )
    trainer = Trainer(cfg, src.n_class)
    batch = dict(next(iter(loader)))
    batch["seg_ids"] = segment_ids_from_labels(batch["query_label"], None, 32)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    step = trainer.make_train_step()
    state, metrics = step(state, batch, jax.random.PRNGKey(1), 20)
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_supcon2" in metrics
