"""Opt-in training knobs with no reference counterpart: the dropout PRNG
implementation (TrainConfig.rng_impl — threefry vs TPU hardware 'rbg') and
the AdamW first-moment storage dtype (TrainConfig.opt_mu_dtype). Both are
perf levers measured in tools/measure_r3.py; these tests pin their
semantics: rbg keys flow through every step path (single, multi-step scan)
with the same fold_in discipline, and bf16 mu stays numerically adjacent to
the fp32 default while actually storing bf16."""

import numpy as np

import jax
import jax.numpy as jnp

from test_train_smoke import make_setup

from r3d_tpu.train.loop import Trainer


def test_rbg_rng_fit_and_multi_step_equivalence():
    src, cfg, loader = make_setup("futr", rng_impl="rbg",
                                  steps_per_dispatch=2)
    trainer = Trainer(cfg, src.n_class)
    assert trainer._base_key(1).dtype != jax.random.PRNGKey(1).dtype

    batch = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader))
    rng = trainer._base_key(7)

    # K sequential steps == one multi-step dispatch under the rbg stream
    # (the per-step key folds state.step inside the jitted step; both step
    # fns donate their state, so each arm gets its own copy upfront)
    step = trainer.make_train_step()
    s1 = jax.tree.map(jnp.array, state)
    s3_init = jax.tree.map(jnp.array, state)
    first_loss_rbg = None
    for _ in range(2):
        s1, m1 = step(s1, batch, rng, 0)
        if first_loss_rbg is None:
            first_loss_rbg = float(m1["loss"])
    stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
    s2, m2 = trainer.make_multi_step()(state, stacked, rng, 0)
    np.testing.assert_allclose(
        np.array(jax.tree.leaves(s1.params)[0]),
        np.array(jax.tree.leaves(s2.params)[0]), atol=0)
    assert np.isfinite(float(m2["loss"]))

    # the stream really differs from threefry (same seed, different masks:
    # identical init state + batch, first-step losses diverge via dropout)
    s3, m3 = step(s3_init, batch, jax.random.PRNGKey(7), 0)
    assert float(m3["loss"]) != first_loss_rbg


def test_mu_dtype_bf16_state_and_step():
    src, cfg, loader = make_setup("futr", opt_mu_dtype="bfloat16")
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader))
    mus = [l for l in jax.tree.leaves(state.opt_state)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 first-moment leaves in opt_state"

    src_f, cfg_f, _ = make_setup("futr")
    ref_trainer = Trainer(cfg_f, src_f.n_class)
    ref_state = ref_trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader))

    rng = jax.random.PRNGKey(3)
    step = trainer.make_train_step()
    ref_step = ref_trainer.make_train_step()
    for i in range(3):
        state, m = step(state, batch, rng, 0)
        ref_state, mr = ref_step(ref_state, batch, rng, 0)
    # bf16 mu rounds the update direction slightly; parameters stay adjacent
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        state.params, ref_state.params)
    assert max(jax.tree.leaves(diffs)) < 5e-4
    np.testing.assert_allclose(float(m["loss"]), float(mr["loss"]), rtol=1e-4)
