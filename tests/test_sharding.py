"""Mesh/sharding tests on the virtual 8-device CPU mesh.

Asserts (a) the dp+tp-sharded train step compiles and runs, and (b) sharded
execution is numerically equivalent to single-device execution — the
TPU-world analog of fake-backend distributed tests (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from r3d_tpu.parallel import (
    make_mesh,
    batch_sharding,
    param_shardings,
    shard_batch,
)
from test_train_smoke import make_setup
from r3d_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 fake CPU devices"
    return make_mesh(dp=4, tp=2)


def test_mesh_shapes(mesh8):
    assert mesh8.shape == {"dp": 4, "tp": 2}


def test_param_sharding_rules(mesh8):
    params = {
        "depth_embed": {"depth_projection": {"kernel": jnp.zeros((48, 32))}},
        "transformer": {
            "decoder": {"layer0": {"ffn": {"linear1": {"kernel": jnp.zeros((32, 128))}}}}
        },
        "heads": {"fc": {"kernel": jnp.zeros((32, 13))}},
    }
    sh = param_shardings(mesh8, params)
    assert sh["depth_embed"]["depth_projection"]["kernel"].spec == P(None, "tp")
    assert (
        sh["transformer"]["decoder"]["layer0"]["ffn"]["linear1"]["kernel"].spec
        == P(None, "tp")
    )
    assert sh["heads"]["fc"]["kernel"].spec == P()


def test_sharded_step_matches_single_device(mesh8):
    src, cfg, loader = make_setup("futr_fusion_bn", with_depth=True)
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader))
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(7)

    # the train step donates its input state; keep an unsharded copy alive
    state_copy = jax.tree.map(jnp.array, state)

    # single device
    state1, metrics1 = step(state, batch, rng, 0)
    state = state_copy

    # dp=4, tp=2 mesh: params tp-sharded per rules, batch dp-sharded
    p_sh = param_shardings(mesh8, state.params)
    bs_sh = jax.tree.map(lambda _: NamedSharding(mesh8, P()), state.batch_stats)
    opt_sh = param_shardings(mesh8, state.opt_state)
    sharded_params = jax.tree.map(jax.device_put, state.params, p_sh)
    sharded_state = state.replace(
        params=sharded_params,
        opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh),
        batch_stats=jax.tree.map(jax.device_put, state.batch_stats, bs_sh),
    )
    sharded_batch = shard_batch(batch, mesh8)
    state2, metrics2 = step(sharded_state, sharded_batch, rng, 0)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=2e-4
    )
    # updated params numerically equivalent
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state1.params, state2.params
    )
    max_diff = max(jax.tree.leaves(diff))
    assert max_diff < 5e-4, max_diff
