"""Gradient accumulation (TrainConfig.grad_accum, Trainer.make_accum_step).

New capability — the reference couples one backward to one optimizer step
(train/train_proposed_depth.py:150-156). Semantics pinned here:

- accumulating K copies of the SAME microbatch equals one plain train step
  on it (mean of identical grads = the grad; dropout off so the arms draw
  no stochasticity);
- the accumulated gradient is the exact mean of the per-microbatch
  gradients (oracle: jax.grad per microbatch, averaged by hand);
- BN stats advance once per microbatch, like K small sequential forwards;
- fit() integration: grouping, accounting, and the steps_per_dispatch
  exclusivity guard.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r3d_tpu.config import DataConfig, ModelConfig, TrainConfig, get_config
from r3d_tpu.data.pipeline import BucketedLoader
from r3d_tpu.data.synthetic import SyntheticSource
from r3d_tpu.train.loop import Trainer


def _setup(loop="futr", model="futr", grad_accum=1, dropout=0.0, **model_kw):
    src = SyntheticSource(
        n_videos=8, n_actions=5, vid_len_range=(60, 100), input_dim=32,
        depth_shape=(8, 6), seed=0,
    )
    fusion = model.startswith("futr_fusion")
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model=model, hidden_dim=32, n_head=4, n_encoder_layers=1,
            n_decoder_layers=1, n_query=8, input_dim=32, max_pos_len=128,
            compute_dtype="float32", dropout=dropout,
            seg_excludes_none=not fusion, **model_kw,
        ),
        train=TrainConfig(
            loop=loop, batch_size=4, epochs=1, warmup_epochs=1, lr=1e-3,
            min_train_batch=0, grad_accum=grad_accum,
        ),
        data=DataConfig(dataset="synthetic", seq_buckets=(128,),
                        depth_shape=(8, 6)),
    )
    fn, n = src.make_example_fn(
        obs_percs=(0.2, 0.3, 0.5), sample_rate=1, n_query=8
    )
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=4,
        pad_idx=src.pad_idx, buckets=(128,), n_query=8, with_depth=fusion,
        seed=0,
    )
    return src, cfg, loader


def _stack(batches):
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def test_accum_of_identical_microbatches_is_one_step():
    src, cfg, loader = _setup()
    batch = next(iter(loader))
    trainer = Trainer(cfg, src.n_class)
    state1 = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=2)
    state2 = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=2)
    rng = jax.random.PRNGKey(3)

    state1, m1 = trainer.make_train_step()(state1, batch, rng, 0)
    state2, m2 = trainer.make_accum_step()(state2, _stack([batch] * 4), rng, 0)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    # step counts CONSUMED LOADER BATCHES on every path (schedule/resume
    # arithmetic stays accumulation-agnostic)
    assert int(state1.step) == 1 and int(state2.step) == 4
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params, state2.params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-6, diff


def test_accum_gradient_is_mean_of_microbatch_gradients():
    src, cfg, loader = _setup()
    it = iter(loader)
    b1, b2 = next(it), next(it)
    trainer = Trainer(cfg, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), b1, steps_per_epoch=2)
    rng = jax.random.PRNGKey(3)
    base = jax.random.fold_in(rng, state.step)

    # oracle: per-microbatch grads with the accum path's own key schedule
    g1, _, bs1 = trainer._grad_core(
        state.params, state.batch_stats, b1, jax.random.fold_in(base, 0), 0
    )
    g2, _, _ = trainer._grad_core(
        state.params, bs1, b2, jax.random.fold_in(base, 1), 0
    )
    mean_g = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    ref = trainer.init_state(jax.random.PRNGKey(0), b1, steps_per_epoch=2)
    ref = ref.apply_gradients(mean_g, trainer.tx, new_batch_stats=ref.batch_stats)

    state2 = trainer.init_state(jax.random.PRNGKey(0), b1, steps_per_epoch=2)
    state2, _ = trainer.make_accum_step()(state2, _stack([b1, b2]), rng, 0)

    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        ref.params, state2.params,
    )
    assert max(jax.tree.leaves(diff)) < 1e-6, diff


def test_accum_bn_stats_advance_per_microbatch():
    src, cfg, loader = _setup(loop="proposed_depth", model="futr_fusion_bn")
    it = iter(loader)
    b1, b2 = next(it), next(it)
    trainer = Trainer(cfg, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), b1, steps_per_epoch=2)
    rng = jax.random.PRNGKey(3)
    base = jax.random.fold_in(rng, state.step)

    _, _, bs1 = trainer._grad_core(
        state.params, state.batch_stats, b1, jax.random.fold_in(base, 0), 0
    )
    _, _, bs2 = trainer._grad_core(
        state.params, bs1, b2, jax.random.fold_in(base, 1), 0
    )

    state2 = trainer.init_state(jax.random.PRNGKey(0), b1, steps_per_epoch=2)
    state2, _ = trainer.make_accum_step()(state2, _stack([b1, b2]), rng, 0)
    for a, b in zip(jax.tree.leaves(bs2), jax.tree.leaves(state2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fit_with_grad_accum_runs_and_counts_updates():
    src, cfg, loader = _setup(grad_accum=2)
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    logs = []
    state = trainer.fit(state, loader, loader, seed=1, log=logs.append)
    # step counts loader batches regardless of how they grouped into
    # updates, so resume's epoch math (step // len(loader)) stays exact
    assert int(state.step) == len(loader)
    # ... while the LR schedule's epoch length counts UPDATES
    n = len(loader)
    assert trainer.sched_steps_per_epoch == n // 2 + n % 2
    assert any("Epoch" in l for l in logs)


def test_grad_accum_excludes_steps_per_dispatch():
    src, cfg, loader = _setup(grad_accum=2)
    cfg = cfg.replace(
        train=__import__("dataclasses").replace(
            cfg.train, steps_per_dispatch=4
        )
    )
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        trainer.fit(state, loader, loader, seed=1, log=lambda *_: None)
