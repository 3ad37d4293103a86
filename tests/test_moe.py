"""Mixture-of-Experts FFN (models/moe.py) + expert parallelism ('ep' axis).

The reference has no MoE (its FFNs are the dense DETR pair,
model/extras/transformer.py:200-202); moe.py adds it as an opt-in capacity
knob. These tests pin the semantics the module promises:

- with identical experts and ample capacity the layer IS the dense FFN;
- capacity overflow sheds assignments deterministically (k-major, token
  order) and dropped tokens contribute zero;
- the Switch aux loss is sown, collected by the trainer, and scaled by
  moe_aux_weight;
- ep-sharded values and grads equal the single-device run (the repo's
  sharding standard, mirroring tests/test_sharding.py / test_pipeline_pp.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from r3d_tpu.config import DataConfig, ModelConfig, TrainConfig, get_config
from r3d_tpu.data.pipeline import BucketedLoader
from r3d_tpu.data.synthetic import SyntheticSource
from r3d_tpu.models.layers import FeedForward
from r3d_tpu.models.moe import MoEFeedForward
from r3d_tpu.parallel.mesh import make_mesh, param_shardings, set_active_mesh
from r3d_tpu.train.loop import Trainer


@pytest.fixture(autouse=True)
def clean_mesh():
    yield
    set_active_mesh(None)


def _broadcast_expert(dense_params, n_experts):
    """Stack one dense FFN's params into an identical [E, ...] expert stack."""
    return jax.tree.map(
        lambda p: jnp.broadcast_to(p, (n_experts,) + p.shape), dense_params
    )


def test_moe_equals_dense_with_identical_experts():
    B, L, C, H, E = 2, 12, 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    dense = FeedForward(C, H)
    dense_vars = dense.init(jax.random.PRNGKey(1), x)
    ref = dense.apply(dense_vars, x)

    # top_k = E with renormalized gates => output = sum_e g_e * FFN_e(x),
    # and identical experts collapse that to FFN(x) exactly (ample capacity)
    moe = MoEFeedForward(C, H, n_experts=E, top_k=E, capacity_factor=4.0)
    moe_vars = moe.init(jax.random.PRNGKey(2), x)
    params = dict(moe_vars["params"])
    params["experts"] = _broadcast_expert(dense_vars["params"], E)
    out = moe.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_moe_capacity_overflow_drops_tokens():
    B, L, C, H, E = 1, 16, 8, 16, 4
    T = B * L
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    dense = FeedForward(C, H)
    dense_vars = dense.init(jax.random.PRNGKey(1), x)

    # zero router logits => every token's top-1 is expert 0 (top_k tie
    # break picks the lowest index); capacity_factor 1.0 => cap = T/E.
    # top-1 keeps the RAW softmax prob (1/E here) as the gate — the
    # Switch convention; renormalizing would sever the router's gradient
    moe = MoEFeedForward(C, H, n_experts=E, top_k=1, capacity_factor=1.0)
    moe_vars = moe.init(jax.random.PRNGKey(2), x)
    params = dict(moe_vars["params"])
    params["experts"] = _broadcast_expert(dense_vars["params"], E)
    params["router"] = jax.tree.map(jnp.zeros_like, params["router"])
    out = np.asarray(moe.apply({"params": params}, x)).reshape(T, C)

    cap = T // E
    ref = np.asarray(dense.apply(dense_vars, x)).reshape(T, C) / E
    np.testing.assert_allclose(out[:cap], ref[:cap], atol=1e-5)
    np.testing.assert_array_equal(out[cap:], np.zeros((T - cap, C)))


def test_moe_top1_router_gets_task_gradient():
    """The top-1 gate is the raw softmax prob, so the task loss reaches
    the router (review finding: a renormalized top-1 gate is identically
    1.0 and the router would train only through the aux loss)."""
    C, H, E = 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, C))
    moe = MoEFeedForward(C, H, n_experts=E, top_k=1)
    variables = moe.init(jax.random.PRNGKey(1), x)

    def task_loss(params):
        return jnp.sum(moe.apply({"params": params}, x) ** 2)

    g = jax.grad(task_loss)(variables["params"])
    assert float(jnp.abs(g["router"]["kernel"]).max()) > 0.0


def test_moe_pad_mask_excludes_padding():
    """Pad tokens neither claim expert capacity nor enter the balance
    statistics (review finding): with ample capacity a padded batch plus
    the mask reproduces the unpadded outputs AND aux loss exactly; at
    tight capacity the mask is what keeps early pad rows from shedding
    every real token behind them."""
    C, H, E = 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, C))
    # pads FIRST: token-order priority would hand them the capacity
    xp = jnp.concatenate([jnp.zeros((1, 8, C)), x], axis=1)
    pad = jnp.concatenate(
        [jnp.ones((1, 8), bool), jnp.zeros((1, 8), bool)], axis=1
    )

    # ample capacity (no shedding on either arm): exact equality
    moe = MoEFeedForward(C, H, n_experts=E, top_k=2, capacity_factor=2.0)
    variables = moe.init(jax.random.PRNGKey(1), x)
    ref, mut_ref = moe.apply(
        {"params": variables["params"]}, x, mutable=["losses"]
    )
    (aux_ref,) = jax.tree.leaves(mut_ref["losses"])
    out, mut = moe.apply(
        {"params": variables["params"]}, xp, pad_mask=pad,
        mutable=["losses"],
    )
    (aux,) = jax.tree.leaves(mut["losses"])
    np.testing.assert_allclose(
        np.asarray(out[:, 8:]), np.asarray(ref), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(out[:, :8]), 0.0)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-6)

    # tight capacity, zero router => all top-1 to expert 0, cap = T/E = 4:
    # unmasked, the 8 leading pads fill expert 0 and EVERY real token
    # drops; masked, the first 4 real tokens are served
    moe_t = MoEFeedForward(C, H, n_experts=E, top_k=1, capacity_factor=1.0)
    v_t = moe_t.init(jax.random.PRNGKey(2), x)
    params = dict(v_t["params"])
    params["router"] = jax.tree.map(jnp.zeros_like, params["router"])
    out_unmasked = moe_t.apply({"params": params}, xp)
    np.testing.assert_array_equal(np.asarray(out_unmasked[:, 8:]), 0.0)
    out_masked = moe_t.apply({"params": params}, xp, pad_mask=pad)
    assert float(jnp.abs(out_masked[:, 8:12]).max()) > 0.0
    np.testing.assert_array_equal(np.asarray(out_masked[:, 12:]), 0.0)


def test_moe_aux_loss_sown():
    B, L, C, H, E = 2, 8, 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, C))
    moe = MoEFeedForward(C, H, n_experts=E, top_k=2)
    variables = moe.init(jax.random.PRNGKey(1), x)
    _, mutated = moe.apply(
        {"params": variables["params"]}, x, mutable=["losses"]
    )
    (aux,) = jax.tree.leaves(mutated["losses"])
    aux = float(aux)
    # Switch LB loss: 1.0 at perfect balance, <= E when fully collapsed
    assert np.isfinite(aux) and 0.0 < aux <= E + 1e-6

    # collapsed router (huge bias toward expert 0 via the kernel) => ~E
    params = dict(variables["params"])
    k = params["router"]["kernel"]
    params["router"] = {"kernel": jnp.zeros_like(k).at[0, 0].set(1e4)}
    x1 = jnp.ones((B, L, C)) * 0.5
    _, mutated = moe.apply({"params": params}, x1, mutable=["losses"])
    (aux1,) = jax.tree.leaves(mutated["losses"])
    assert float(aux1) > E - 0.1


def _moe_futr_setup(moe_experts=4):
    src = SyntheticSource(
        n_videos=8, n_actions=5, vid_len_range=(60, 100), input_dim=32,
        seed=0,
    )
    cfg = get_config("synthetic").replace(
        model=ModelConfig(
            model="futr", hidden_dim=32, n_head=4, n_encoder_layers=1,
            n_decoder_layers=2, n_query=8, input_dim=32, max_pos_len=128,
            compute_dtype="float32", dropout=0.0, seg_excludes_none=True,
            moe_experts=moe_experts, moe_top_k=2,
        ),
        train=TrainConfig(
            loop="futr", batch_size=8, epochs=1, warmup_epochs=1, lr=1e-3,
            min_train_batch=0,
        ),
        data=DataConfig(dataset="synthetic", seq_buckets=(128,)),
    )
    fn, n = src.make_example_fn(
        obs_percs=(0.2, 0.3, 0.5), sample_rate=1, n_query=8
    )
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=8,
        pad_idx=src.pad_idx, buckets=(128,), n_query=8, with_depth=False,
        seed=0,
    )
    return src, cfg, loader


def test_moe_train_step_collects_aux():
    src, cfg, loader = _moe_futr_setup()
    batch = next(iter(loader))
    trainer = Trainer(cfg, src.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    state, metrics = trainer.make_train_step()(
        state, batch, jax.random.PRNGKey(1), 0
    )
    assert "moe_aux" in metrics
    aux = float(metrics["moe_aux"])
    assert np.isfinite(aux) and aux > 0.0
    assert np.isfinite(float(metrics["loss"]))
    # the aux term must reach the router through the update
    router_paths = [
        p for p in jax.tree_util.tree_leaves_with_path(state.params)
        if "router" in "/".join(str(x) for x in p[0])
    ]
    assert router_paths, "MoE router params missing from the train state"


def test_moe_param_shardings_use_ep():
    src, cfg, loader = _moe_futr_setup()
    batch = next(iter(loader))
    mesh = make_mesh(dp=2, ep=4)
    set_active_mesh(None)  # shardings are mesh-explicit here
    trainer = Trainer(cfg, src.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    sh = param_shardings(mesh, state.params)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    expert_kernels = [k for k in flat if "experts/linear1/kernel" in k]
    assert expert_kernels
    for k in expert_kernels:
        assert flat[k].spec[0] == "ep", (k, flat[k].spec)


def test_moe_ep_sharded_matches_single_device():
    from r3d_tpu.parallel import shard_batch

    src, cfg, loader = _moe_futr_setup()
    batch = next(iter(loader))
    rng = jax.random.PRNGKey(7)

    trainer1 = Trainer(cfg, src.n_class)
    state1 = trainer1.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    params_init = jax.tree.map(jnp.array, state1.params)
    state1, metrics1 = trainer1.make_train_step()(state1, batch, rng, 0)

    mesh = make_mesh(dp=2, ep=4)
    trainer2 = Trainer(cfg, src.n_class, mesh=mesh)
    state2 = trainer2.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
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
    np.testing.assert_allclose(
        float(metrics1["moe_aux"]), float(metrics2["moe_aux"]), rtol=2e-4
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state1.params, state2.params,
    )
    assert max(jax.tree.leaves(diff)) < 5e-4, diff


def test_moe_padded_rows_exact_with_ample_capacity():
    """Routing is per-token, so with capacity that guarantees zero shedding
    the real rows of a padded batch equal the unpadded forward exactly —
    the repo's bucketed-eval standard. (At tight capacity pad tokens
    compete for expert slots; ModelConfig.moe_capacity_factor documents
    the tradeoff.)"""
    C, H, E = 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, C))
    moe = MoEFeedForward(C, H, n_experts=E, top_k=2, capacity_factor=float(E))
    variables = moe.init(jax.random.PRNGKey(1), x)
    ref = moe.apply(variables, x)
    xp = jnp.concatenate([x, jnp.zeros((1, 4, C))], axis=1)
    out = moe.apply(variables, xp)
    np.testing.assert_allclose(
        np.asarray(out[:, :4]), np.asarray(ref), atol=1e-6
    )


def test_moe_checkpoint_roundtrip(tmp_path):
    """Stacked [E, ...] expert params roundtrip through orbax exactly."""
    from r3d_tpu.train.checkpoint import Checkpointer

    src, cfg, loader = _moe_futr_setup()
    batch = next(iter(loader))
    trainer = Trainer(cfg, src.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    ckpt = Checkpointer(str(tmp_path))
    ckpt.save_best(state, seed=1, epoch=0)
    template = trainer.init_state(
        jax.random.PRNGKey(42), batch, steps_per_epoch=len(loader)
    )
    restored = ckpt.restore_best(1, template)
    for a, b in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(restored.params)
    ):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_moe_predict_forward():
    """The bucketed eval path runs a MoE model (aux sow is a no-op when
    'losses' is not mutable — eval needs no special casing)."""
    from r3d_tpu.eval.predict import Predictor

    src, cfg, loader = _moe_futr_setup()
    batch = next(iter(loader))
    trainer = Trainer(cfg, src.n_class)
    state = trainer.init_state(
        jax.random.PRNGKey(0), batch, steps_per_epoch=len(loader)
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    predictor = Predictor(cfg, trainer.model, src.n_class, eval_batch=4)
    items = []
    for i, v in enumerate(src.videos[:3]):
        feats = np.asarray(v["features"][:32], np.float32)
        items.append({
            "vid": f"v{i}", "seq": None, "ui": i,
            "labels_idx": np.zeros(40, np.int64), "past_len": 32,
            "future_len": 16, "real_s": feats.shape[0], "feats": feats,
        })
    out = predictor._forward_batch(variables, items, S=128)
    assert np.isfinite(np.asarray(out["action"])).all()
