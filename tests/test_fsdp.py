"""FSDP/ZeRO state sharding on the virtual 8-device CPU mesh.

The reference replicates all state per GPU (nn.DataParallel, main.py:115);
here MeshConfig.fsdp shards params + optimizer moments over the dp axis
(parallel/mesh.py: _fsdp_spec / shard_state). These tests assert (a) the
spec rules, (b) per-device state memory actually drops, and (c) a full
fsdp-sharded train step is numerically equivalent to single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from r3d_tpu.parallel import make_mesh, param_shardings, shard_batch
from r3d_tpu.parallel.mesh import shard_state
from r3d_tpu.train.loop import Trainer
from test_train_smoke import make_setup


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 fake CPU devices"
    return make_mesh(dp=4, tp=2)


def test_fsdp_spec_rules(mesh8):
    params = {
        # TP rule matches: fsdp adds dp on the remaining (first) axis
        "ffn": {"linear1": {"kernel": jnp.zeros((64, 256))}},
        # no TP rule: dp goes on the largest divisible axis
        "embed": {"kernel": jnp.zeros((48, 256))},
        # too small: stays replicated
        "norm": {"scale": jnp.zeros((64,))},
        # no axis divides dp=4: stays as-is
        "odd": {"kernel": jnp.zeros((33, 333))},
    }
    sh = param_shardings(mesh8, params, fsdp=True, fsdp_min_elems=128)
    assert sh["ffn"]["linear1"]["kernel"].spec == P("dp", "tp")
    assert sh["embed"]["kernel"].spec == P(None, "dp")
    assert sh["norm"]["scale"].spec == P()
    assert sh["odd"]["kernel"].spec == P()
    # without fsdp the same tree keeps plain TP rules
    sh0 = param_shardings(mesh8, params)
    assert sh0["ffn"]["linear1"]["kernel"].spec == P(None, "tp")
    assert sh0["embed"]["kernel"].spec == P()


def test_fsdp_step_matches_single_device(mesh8):
    src, cfg, loader = make_setup("futr_fusion_bn", with_depth=True)
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(7)

    # the train step donates its input state; keep an unsharded copy alive
    state_copy = jax.tree.map(jnp.array, state)

    state1, metrics1 = step(state, batch, rng, 0)
    state = state_copy

    sharded = shard_state(state, mesh8, fsdp=True, fsdp_min_elems=128)

    # per-device state memory actually drops: a dp-sharded kernel's
    # addressable shard holds 1/dp (x 1/tp where TP rules also hit) of it
    emb = state.params["embed"]["input_embed"]["kernel"]
    emb_sh = sharded.params["embed"]["input_embed"]["kernel"]
    assert (
        emb_sh.addressable_shards[0].data.size * mesh8.shape["dp"]
        <= emb.size
    )
    # optimizer moments mirror the param sharding
    mu = [
        leaf for leaf in jax.tree.leaves(sharded.opt_state)
        if hasattr(leaf, "shape") and leaf.shape == emb.shape
    ]
    assert mu and all(
        m.addressable_shards[0].data.size < m.size for m in mu
    )

    state2, metrics2 = step(sharded, shard_batch(batch, mesh8), rng, 0)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=2e-4
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params, state2.params,
    )
    assert max(jax.tree.leaves(diff)) < 5e-4
    # the step preserves the fsdp placement (no silent re-replication)
    emb2 = state2.params["embed"]["input_embed"]["kernel"]
    assert emb2.addressable_shards[0].data.size < emb2.size


def test_fsdp_fit_cached_checkpoint_roundtrip(mesh8, tmp_path):
    """--fsdp through the REAL training path, not just make_train_step: the
    default-on device-cache scan (fit_cached), an orbax checkpoint save of
    the dp-sharded params + moments, and a restore — final params must match
    the unsharded single-device fit_cached run."""
    import dataclasses

    from r3d_tpu.data.device_cache import build_cache
    from r3d_tpu.train.checkpoint import Checkpointer
    from test_device_cache import source_videos

    src, cfg, loader = make_setup("futr_fusion_bn", with_depth=True)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, epochs=2))
    cache = build_cache(
        source_videos(src), obs_percs=(0.2, 0.3, 0.5), sample_rate=1,
        n_query=8, pad_idx=src.pad_idx, n_class=src.n_class, buckets=(128,),
    )

    def fresh_state(trainer):
        batch = next(iter(loader))
        return trainer.init_state(
            jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
        )

    # arm A: single-device semantics (the source of truth)
    trainer0 = Trainer(cfg, src.n_class)
    final0 = trainer0.fit_cached(
        fresh_state(trainer0), cache, loader, seed=1, log=lambda *_: None
    )

    # arm B: fsdp-sharded state through the same cached scan + checkpointing
    trainer = Trainer(cfg, src.n_class, mesh=mesh8)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    state = shard_state(fresh_state(trainer), mesh8, fsdp=True,
                        fsdp_min_elems=128)
    final = trainer.fit_cached(
        state, cache, loader, seed=1, checkpointer=ckpt, log=lambda *_: None
    )

    # the scan kept the fsdp placement (no silent re-replication)
    emb = final.params["embed"]["input_embed"]["kernel"]
    assert emb.addressable_shards[0].data.size < emb.size
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        final0.params, final.params,
    )
    # 6 AdamW updates compound reduction-order drift; the worst leaves are
    # attention biases whose grads are ~0, where m/sqrt(v) amplifies noise
    # (measured max 8e-4 across the tree, everything else < 3e-4)
    assert max(jax.tree.leaves(diff)) < 2e-3, diff

    # orbax wrote the dp-sharded state; restoring into an unsharded template
    # round-trips the values
    assert ckpt.has("seed_1_last")
    template = fresh_state(trainer0)
    restored = ckpt.restore_last(1, template)
    rdiff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        restored.params, jax.tree.map(np.asarray, final.params),
    )
    assert max(jax.tree.leaves(rdiff)) == 0.0, rdiff


def test_fsdp_cli_flag():
    from r3d_tpu.cli.opts import build_parser, config_from_args

    args = build_parser().parse_args(
        ["--config", "synthetic", "--fsdp", "--mesh_dp", "4"]
    )
    cfg = config_from_args(args)
    assert cfg.mesh.fsdp and cfg.mesh.dp == 4
    # default stays off
    args0 = build_parser().parse_args(["--config", "synthetic"])
    assert not config_from_args(args0).mesh.fsdp
