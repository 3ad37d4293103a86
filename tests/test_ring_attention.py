"""Sequence-parallel (ring) attention on the virtual 8-device CPU mesh.

The reference has no sequence parallelism (longest sequence S=3100 fits one
GPU, SURVEY.md §5.7); the rebuild's 'sp' mesh axis scales past one chip's
HBM. These tests assert the ring (K/V rotating via ppermute with online
softmax) is numerically equivalent to single-device composed attention —
values AND gradients — and that the full train step runs with the batch's
sequence axis sharded over sp.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from r3d_tpu.ops.attention import composed_attention
from r3d_tpu.ops.ring_attention import (
    ring_attention_eligible,
    ring_attention_sharded,
)
from r3d_tpu.parallel.mesh import make_mesh, set_active_mesh, shard_batch


def make_qkv(rng, B, H, S, D):
    f = lambda: jnp.array(rng.randn(B, H, S, D).astype(np.float32))
    return f(), f(), f()


@pytest.mark.parametrize("dp,tp,sp", [(1, 1, 8), (2, 1, 4), (1, 2, 4)])
def test_ring_matches_composed(dp, tp, sp):
    rng = np.random.RandomState(0)
    B, H, S, D = 4, 2, 64 * sp, 16
    q, k, v = make_qkv(rng, B, H, S, D)
    pad = np.zeros((B, S), bool)
    pad[:, S - 37:] = True                      # ragged tail crosses blocks
    bias = jnp.where(jnp.array(pad), jnp.finfo(jnp.float32).min, 0.0)[
        :, None, None, :
    ]
    scale = 1.0 / np.sqrt(D)

    ref = composed_attention(q, k, v, bias, scale)
    ref_g = jax.grad(
        lambda q_, k_, v_: jnp.sum(
            composed_attention(q_, k_, v_, bias, scale) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)

    mesh = make_mesh(dp=dp, tp=tp, sp=sp)
    set_active_mesh(mesh)
    try:
        assert ring_attention_eligible(S, S)
        # shard the S axis like the train loop would
        spec = P("dp" if dp > 1 else None, "tp" if tp > 1 else None, "sp")
        qs = jax.device_put(q, NamedSharding(mesh, spec))
        ks = jax.device_put(k, NamedSharding(mesh, spec))
        vs = jax.device_put(v, NamedSharding(mesh, spec))
        out = jax.jit(
            lambda a, b, c: ring_attention_sharded(a, b, c, bias, scale)
        )(qs, ks, vs)
        g = jax.jit(jax.grad(
            lambda a, b, c: jnp.sum(
                ring_attention_sharded(a, b, c, bias, scale) ** 2),
            argnums=(0, 1, 2),
        ))(qs, ks, vs)
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(np.array(out), np.array(ref), atol=3e-5)
    for a, b, name in zip(g, ref_g, "qkv"):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-3,
                                   rtol=1e-3, err_msg=name)


def test_ring_eligibility_gates():
    mesh = make_mesh(dp=2, tp=1, sp=4)
    set_active_mesh(mesh)
    try:
        assert ring_attention_eligible(256, 256)
        assert not ring_attention_eligible(20, 20)       # decoder queries
        assert not ring_attention_eligible(256, 3100)    # cross-attention
        assert not ring_attention_eligible(255, 255)     # not divisible
    finally:
        set_active_mesh(None)
    assert not ring_attention_eligible(256, 256)         # no mesh


def test_mha_module_routes_to_ring():
    """MultiheadAttention on an sp mesh must produce the same output as the
    no-mesh composed path (deterministic self-attention, S sharded)."""
    from r3d_tpu.models.layers import MultiheadAttention

    rng = np.random.RandomState(1)
    B, S, C = 4, 512, 32
    x = jnp.array(rng.randn(B, S, C).astype(np.float32))
    pad = np.zeros((B, S), bool)
    pad[:, 400:] = True
    mha = MultiheadAttention(dim=C, n_head=4, dropout=0.0)
    variables = mha.init(jax.random.PRNGKey(0), x, x, x, jnp.array(pad))

    ref = mha.apply(variables, x, x, x, jnp.array(pad), deterministic=True)

    mesh = make_mesh(dp=1, tp=1, sp=8)
    set_active_mesh(mesh)
    try:
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp")))
        out = jax.jit(
            lambda v, a: mha.apply(v, a, a, a, jnp.array(pad),
                                   deterministic=True)
        )(variables, xs)
    finally:
        set_active_mesh(None)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=3e-5)


def test_sp_sharded_train_step_matches_single_device():
    """Full futr train step with the batch's SEQUENCE axis sharded over a
    dp2 x sp4 mesh == the single-device step (mirrors
    test_sharding.test_sharded_step_matches_single_device; ring handles
    eval-path attention, GSPMD inserts the collectives for the train-path
    dropout attention and every S-axis reduction in the losses)."""
    from test_train_smoke import make_setup

    from r3d_tpu.parallel import param_shardings
    from r3d_tpu.train.loop import Trainer

    src, cfg, loader = make_setup("futr")
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader))
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(7)
    state_copy = jax.tree.map(jnp.array, state)

    state1, metrics1 = step(state, batch, rng, 0)
    state = state_copy

    mesh = make_mesh(dp=2, tp=1, sp=4)
    set_active_mesh(mesh)
    try:
        p_sh = param_shardings(mesh, state.params)
        opt_sh = param_shardings(mesh, state.opt_state)
        sharded_state = state.replace(
            params=jax.tree.map(jax.device_put, state.params, p_sh),
            opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh),
        )
        sharded_batch = shard_batch(batch, mesh)
        # the sequence-length arrays really are sp-sharded
        feats = sharded_batch["features"]
        assert feats.sharding.spec == P("dp", "sp"), feats.sharding
        state2, metrics2 = step(sharded_state, sharded_batch, rng, 0)
    finally:
        set_active_mesh(None)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=2e-4)
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params, state2.params)
    assert max(jax.tree.leaves(diff)) < 5e-4
