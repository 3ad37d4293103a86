"""Device-side step batching (Trainer.make_multi_step).

One dispatch scans K train steps over a stacked batch. Must be semantically
identical to K sequential make_train_step() calls: same params, same BN
stats, same optimizer state, same summed metrics. The per-step dropout key
folds state.step, which the scan increments, so the rng path matches too.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from r3d_tpu.train.loop import Trainer
from tests.test_train_smoke import make_setup


def _tree_allclose(a, b, atol=1e-6):
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-6)


def test_multi_step_equals_sequential():
    """3 scanned steps == 3 sequential steps (fusion model: BN + dropout)."""
    src, cfg, loader = make_setup("futr_fusion_bn", with_depth=True)
    trainer = Trainer(cfg, src.n_class)
    batches = [b for b in loader][:3]
    assert len(batches) == 3 and len({b["features"].shape for b in batches}) == 1
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0], steps_per_epoch=3)

    rng = jax.random.PRNGKey(7)
    step = trainer.make_train_step()
    seq_state = state
    seq_metrics = None
    for b in batches:
        seq_state, m = step(seq_state, b, rng, 0)
        m = jax.tree.map(jnp.asarray, m)
        seq_metrics = m if seq_metrics is None else jax.tree.map(
            lambda a, b2: a + b2, seq_metrics, m
        )

    # rebuild the initial state (the single-step path donated it)
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0], steps_per_epoch=3)
    stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    multi = trainer.make_multi_step()
    multi_state, multi_metrics = multi(state, stacked, rng, 0)

    assert int(multi_state.step) == int(seq_state.step) == 3
    _tree_allclose(multi_state.params, seq_state.params)
    _tree_allclose(multi_state.batch_stats, seq_state.batch_stats)
    _tree_allclose(multi_state.opt_state, seq_state.opt_state)
    _tree_allclose(multi_metrics, seq_metrics, atol=1e-5)


def test_fit_steps_per_dispatch_equivalent():
    """fit() with steps_per_dispatch=2 reaches the same params as =1."""
    finals = []
    for k in (1, 2):
        src, cfg, loader = make_setup("futr_fusion_bn", with_depth=True)
        cfg = cfg.replace(
            train=dataclasses.replace(
                cfg.train, epochs=1, steps_per_dispatch=k
            )
        )
        trainer = Trainer(cfg, src.n_class)
        example = next(iter(loader))
        state = trainer.init_state(
            jax.random.PRNGKey(0), example, steps_per_epoch=len(loader)
        )
        state = trainer.fit(state, loader, loader, seed=3, log=lambda *a: None)
        finals.append(jax.device_get(state.params))
    _tree_allclose(finals[0], finals[1])
