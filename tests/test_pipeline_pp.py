"""Pipeline parallelism ('pp' mesh axis) on the virtual 8-device CPU mesh.

The reference has no pipeline parallelism (SURVEY.md §2.7: deepest stack =
two decoder layers on one GPU); parallel/pipeline.py adds it as a GPipe
microbatch schedule over ICI. These tests hold it to the repo's sharding
standard: pipelined values AND grads equal the sequential stack, composed
with dp, for any microbatch count — and the plan falls back to the
sequential path whenever the shapes don't divide.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from r3d_tpu.config import DataConfig, ModelConfig, TrainConfig, get_config
from r3d_tpu.data.pipeline import BucketedLoader
from r3d_tpu.data.synthetic import SyntheticSource
from r3d_tpu.models.transformer import TransformerDecoder
from r3d_tpu.parallel.mesh import make_mesh, set_active_mesh
from r3d_tpu.parallel.pipeline import pipeline_plan, set_pipeline_microbatches
from r3d_tpu.train.loop import Trainer


@pytest.fixture(autouse=True)
def clean_mesh():
    yield
    set_active_mesh(None)
    set_pipeline_microbatches(0)


def _decoder_setup(n_layers=4, dropout=0.0, B=8, Q=6, S=32, C=16):
    rng = jax.random.PRNGKey(0)
    dec = TransformerDecoder(
        dim=C, n_head=4, n_layers=n_layers, ffn_dim=32, dropout=dropout
    )
    args = (
        jax.random.normal(rng, (B, Q, C)),                    # tgt
        jax.random.normal(jax.random.PRNGKey(1), (B, S, C)),  # memory
        jax.random.normal(jax.random.PRNGKey(2), (B, S, C)),  # pos
        jax.random.normal(jax.random.PRNGKey(3), (B, Q, C)),  # query_pos
    )
    mask = np.zeros((B, S), bool)
    mask[:, S - 4:] = True
    args = args + (jnp.asarray(mask),)
    variables = dec.init(rng, *args)
    return dec, variables, args


@pytest.mark.parametrize("dp,pp,microbatches", [
    (1, 4, 0),   # pure pipeline, auto M = pp
    (2, 4, 0),   # composed with dp
    (2, 4, 2),   # fewer microbatches than stages
    (1, 2, 8),   # more microbatches than stages (Bm = 1)
])
def test_pipelined_decoder_matches_sequential(dp, pp, microbatches):
    dec, variables, args = _decoder_setup()
    ref = dec.apply(variables, *args)

    mesh = make_mesh(dp=dp, pp=pp, devices=jax.devices()[: dp * pp])
    set_active_mesh(mesh)
    set_pipeline_microbatches(microbatches)
    assert pipeline_plan(4, args[0].shape[0]) is not None
    out = jax.jit(lambda *a: dec.apply(variables, *a))(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipelined_decoder_grads_match():
    dec, variables, args = _decoder_setup()

    def loss(v, tgt):
        return jnp.sum(dec.apply(v, tgt, *args[1:]) ** 2)

    ref_val, ref_grads = jax.value_and_grad(loss)(variables, args[0])

    set_active_mesh(make_mesh(dp=2, pp=4))
    pp_val, pp_grads = jax.jit(jax.value_and_grad(loss))(variables, args[0])

    np.testing.assert_allclose(float(pp_val), float(ref_val), rtol=1e-5)
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ref_grads, pp_grads
    )
    assert max(jax.tree.leaves(diff)) < 5e-4, diff


def test_pipeline_plan_fallbacks():
    """Every pp>1 decline warns LOUDLY with the reason (VERDICT r3 weak #2 —
    no silent GSPMD fallback); pp==1/no-mesh cases stay silent."""
    from r3d_tpu.parallel.pipeline import PipelineFallbackWarning

    set_active_mesh(make_mesh(dp=2, pp=4))
    assert pipeline_plan(4, 8) is not None
    with pytest.warns(PipelineFallbackWarning, match="equal stages"):
        assert pipeline_plan(3, 8) is None    # layers not stage-divisible
    with pytest.warns(PipelineFallbackWarning, match="equal stages"):
        assert pipeline_plan(2, 8) is None    # fewer layers than stages
    with pytest.warns(PipelineFallbackWarning, match="sowing"):
        assert pipeline_plan(4, 8, sow_attn=True) is None
    with pytest.warns(PipelineFallbackWarning, match="microbatches"):
        assert pipeline_plan(4, 6) is None    # batch not microbatchable
    set_pipeline_microbatches(2)
    assert pipeline_plan(4, 6) is not None    # ... unless M is set to fit
    set_pipeline_microbatches(0)
    set_active_mesh(make_mesh(dp=2, sp=2, pp=2))
    with pytest.warns(PipelineFallbackWarning, match="sp > 1"):
        assert pipeline_plan(4, 8) is None    # sp meshes keep GSPMD path
    set_active_mesh(None)
    assert pipeline_plan(4, 8) is None        # no mesh — silent


def test_pipelined_decoder_dropout_train_mode_runs():
    """Train-mode dropout keys derive per (layer, microbatch) inside the
    schedule — a different stream than the sequential path's, so assert
    execution + determinism-per-key rather than equality."""
    dec, variables, args = _decoder_setup(dropout=0.3)
    set_active_mesh(make_mesh(dp=1, pp=4, devices=jax.devices()[:4]))

    def run(key):
        return dec.apply(
            variables, *args, deterministic=False, rngs={"dropout": key}
        )

    a = run(jax.random.PRNGKey(5))
    b = run(jax.random.PRNGKey(5))
    c = run(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
    assert float(jnp.abs(a - c).max()) > 0  # key actually matters


def _deep_futr_setup():
    """futr with a 4-layer decoder (pipeline-divisible), dropout 0 so the
    pp and single-device train paths draw identical stochasticity."""
    src = SyntheticSource(
        n_videos=8, n_actions=5, vid_len_range=(60, 100), input_dim=32,
        seed=0,
    )
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model="futr", hidden_dim=32, n_head=4, n_encoder_layers=1,
            n_decoder_layers=4, n_query=8, input_dim=32, max_pos_len=128,
            compute_dtype="float32", dropout=0.0, seg_excludes_none=True,
        ),
        train=TrainConfig(
            loop="futr", batch_size=8, epochs=1, warmup_epochs=1, lr=1e-3,
            min_train_batch=0,
        ),
        data=DataConfig(dataset="synthetic", seq_buckets=(128,)),
    )
    fn, n = src.make_example_fn(obs_percs=(0.2, 0.3, 0.5), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=8, pad_idx=src.pad_idx,
        buckets=(128,), n_query=8, with_depth=False, seed=0,
    )
    return src, cfg, loader


def test_full_train_step_pp_matches_single_device():
    from r3d_tpu.parallel import param_shardings, shard_batch

    src, cfg, loader = _deep_futr_setup()
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(7)

    trainer1 = Trainer(cfg, src.n_class)
    state1 = trainer1.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    params_init = jax.tree.map(jnp.array, state1.params)
    state1, metrics1 = trainer1.make_train_step()(state1, batch, rng, 0)

    mesh = make_mesh(dp=2, pp=4)
    trainer2 = Trainer(cfg, src.n_class, mesh=mesh)
    state2 = trainer2.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    # same init on both arms regardless of mesh-local RNG layout
    state2 = state2.replace(params=jax.tree.map(
        lambda p, sh: jax.device_put(p, sh), params_init,
        param_shardings(mesh, params_init),
    ))
    state2, metrics2 = trainer2.make_train_step()(
        state2, shard_batch(batch, mesh), rng, 0
    )

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=2e-4
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params, state2.params,
    )
    assert max(jax.tree.leaves(diff)) < 5e-4, diff
