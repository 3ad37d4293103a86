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
    assert mesh8.shape == {"dp": 4, "ep": 1, "tp": 2, "sp": 1, "pp": 1}
    assert make_mesh(dp=2, tp=1, sp=4).shape == {
        "dp": 2, "ep": 1, "tp": 1, "sp": 4, "pp": 1
    }
    assert make_mesh(dp=2, pp=4).shape == {
        "dp": 2, "ep": 1, "tp": 1, "sp": 1, "pp": 4
    }
    assert make_mesh(dp=2, ep=4).shape == {
        "dp": 2, "ep": 4, "tp": 1, "sp": 1, "pp": 1
    }


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

    # Megatron-style attention TP: q/k/v column-parallel, out row-parallel;
    # fuser-kernel params stay replicated (they shard_map over dp instead)
    attn = {
        "transformer": {"decoder": {"layer0": {
            "self_attn": {
                "q_proj": {"kernel": jnp.zeros((32, 32))},
                "out_proj": {"kernel": jnp.zeros((32, 32))},
            },
            "cross_attn": {"v_proj": {"kernel": jnp.zeros((32, 32))}},
        }}},
        "fuser": {"safuser": {"block0": {"qkv_kernel": jnp.zeros((32, 96))}}},
    }
    sh = param_shardings(mesh8, attn)
    dec = sh["transformer"]["decoder"]["layer0"]
    assert dec["self_attn"]["q_proj"]["kernel"].spec == P(None, "tp")
    assert dec["self_attn"]["out_proj"]["kernel"].spec == P("tp", None)
    assert dec["cross_attn"]["v_proj"]["kernel"].spec == P(None, "tp")
    assert sh["fuser"]["safuser"]["block0"]["qkv_kernel"].spec == P()


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


def test_sharded_pallas_kernel_matches_composed(mesh8):
    """Row-parallel fuser kernels shard_map over dp: fwd + grads equal the
    composed (unsharded) math on the 8-device CPU mesh (interpret mode)."""
    import os

    from r3d_tpu.models.fuser import CMFuserBN
    from r3d_tpu.parallel.mesh import set_active_mesh

    rng = np.random.RandomState(0)
    rgb = jnp.array(rng.randn(8, 16, 64).astype(np.float32))
    depth = jnp.array(rng.randn(8, 16, 64).astype(np.float32))

    composed = CMFuserBN(64, n_head=4, drop_rate=0.0, use_pallas=False)
    variables = composed.init(jax.random.PRNGKey(0), rgb, depth, train=False)

    def loss(fuser, params):
        out, _ = fuser.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            rgb, depth, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.sum(out ** 2)

    ref_val, ref_grads = jax.value_and_grad(
        lambda p: loss(composed, p)
    )(variables["params"])

    kernelized = CMFuserBN(64, n_head=4, drop_rate=0.0, use_pallas=True)
    os.environ["R3D_FORCE_PALLAS"] = "1"
    set_active_mesh(mesh8)
    try:
        # shard the batch over dp like the train loop does
        sharded_rgb = jax.device_put(rgb, batch_sharding(mesh8))
        sharded_depth = jax.device_put(depth, batch_sharding(mesh8))

        def loss_k(p):
            out, _ = kernelized.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                sharded_rgb, sharded_depth, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            return jnp.sum(out ** 2)

        val, grads = jax.jit(jax.value_and_grad(loss_k))(variables["params"])
    finally:
        set_active_mesh(None)
        del os.environ["R3D_FORCE_PALLAS"]

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-3, rtol=2e-3)


def test_sharded_unsupervised_step_matches_single_device(mesh8):
    """The DARai curriculum loop on the mesh: the L3 query generation
    attends ACROSS THE BATCH (COMPAT #17), so a dp-sharded batch forces XLA
    to insert collectives inside the step — sharded numerics must still
    equal single-device."""
    from r3d_tpu.config import (
        DataConfig,
        ModelConfig,
        TrainConfig,
        get_config,
    )
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
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
    batch = dict(next(iter(loader)))
    batch["seg_ids"] = segment_ids_from_labels(batch["query_label"], None, 32)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=2)
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(3)

    state_copy = jax.tree.map(jnp.array, state)
    state1, metrics1 = step(state, batch, rng, 5)
    state = state_copy

    p_sh = param_shardings(mesh8, state.params)
    opt_sh = param_shardings(mesh8, state.opt_state)
    sharded_state = state.replace(
        params=jax.tree.map(jax.device_put, state.params, p_sh),
        opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh),
    )
    sharded_batch = shard_batch(batch, mesh8)
    state2, metrics2 = step(sharded_state, sharded_batch, rng, 5)

    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics2["loss"]), rtol=2e-4
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state1.params, state2.params
    )
    assert max(jax.tree.leaves(diff)) < 5e-4


def test_sharded_cached_steps_match_single_device(mesh8):
    """Device-cache path on the mesh: dataset arrays replicated, the [K, B]
    index table dp-sharded — the in-step gather must produce a dp-sharded
    batch and the scanned steps must match the unsharded cached run."""
    from test_device_cache import (
        BUCKETS, NQ, OBS, SR, make_source, small_cfg, source_videos,
    )
    from r3d_tpu.data.device_cache import build_cache, epoch_plan

    src = make_source(depth=True)
    cfg = small_cfg(src)
    cache = build_cache(
        source_videos(src), OBS, SR, NQ, src.pad_idx, src.n_class, BUCKETS,
    )
    trainer = Trainer(cfg, src.n_class)
    plan = epoch_plan(cache, 4, seed=1, epoch=0, drop_remainder=True)
    S0 = plan[0][0]
    idxs = [idx for S, idx in plan if S == S0][:2]
    stacked = np.stack(idxs)

    from test_device_cache import pad_batch
    fn, _ = src.make_example_fn(OBS, SR, NQ)
    example = jax.tree.map(
        jnp.asarray,
        pad_batch([fn(int(i)) for i in idxs[0]], src.pad_idx, (S0,), NQ,
                  with_depth=True),
    )
    state = trainer.init_state(jax.random.PRNGKey(7), example, 2)
    state_copy = jax.tree.map(jnp.array, state)
    cached = trainer.make_cached_train_fn(cache)
    rng = jax.random.PRNGKey(0)

    ref_state, ref_metrics = cached(
        state, cache.data, jnp.asarray(stacked), rng, S0, 0
    )

    rep = NamedSharding(mesh8, P())
    data_sh = jax.tree.map(lambda x: jax.device_put(x, rep), cache.data)
    idx_sh = jax.device_put(stacked, NamedSharding(mesh8, P(None, "dp")))
    p_sh = param_shardings(mesh8, state_copy.params)
    opt_sh = param_shardings(mesh8, state_copy.opt_state)
    sharded_state = state_copy.replace(
        params=jax.tree.map(jax.device_put, state_copy.params, p_sh),
        opt_state=jax.tree.map(jax.device_put, state_copy.opt_state, opt_sh),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, rep), state_copy.batch_stats
        ),
    )
    mesh_state, mesh_metrics = cached(
        sharded_state, data_sh, idx_sh, rng, S0, 0
    )

    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(mesh_metrics["loss"]), rtol=2e-4
    )
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        ref_state.params, mesh_state.params,
    )
    assert max(jax.tree.leaves(diff)) < 5e-4


def test_sharded_multi_step_matches_sequential(mesh8):
    """make_multi_step on the mesh: a stacked batch sharded [None, 'dp']
    scans K dp-sharded steps, equal to K sequential single-device steps."""
    src, cfg, loader = make_setup("futr_fusion_bn", with_depth=True)
    trainer = Trainer(cfg, src.n_class)
    batches = [b for b in loader][:2]
    state = trainer.init_state(
        jax.random.PRNGKey(0), batches[0], steps_per_epoch=2
    )
    rng = jax.random.PRNGKey(7)
    state_copy = jax.tree.map(jnp.array, state)

    step = trainer.make_train_step()
    for b in batches:
        state, _ = step(state, b, rng, 0)
    seq_state = state

    stacked = {
        k: np.stack([b[k] for b in batches]) for k in batches[0]
    }
    stacked_sh = {
        k: jax.device_put(v, NamedSharding(mesh8, P(None, "dp")))
        for k, v in stacked.items()
    }
    p_sh = param_shardings(mesh8, state_copy.params)
    opt_sh = param_shardings(mesh8, state_copy.opt_state)
    sharded_state = state_copy.replace(
        params=jax.tree.map(jax.device_put, state_copy.params, p_sh),
        opt_state=jax.tree.map(jax.device_put, state_copy.opt_state, opt_sh),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh8, P())),
            state_copy.batch_stats,
        ),
    )
    multi = trainer.make_multi_step()
    multi_state, _ = multi(sharded_state, stacked_sh, rng, 0)

    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        seq_state.params, multi_state.params,
    )
    assert max(jax.tree.leaves(diff)) < 5e-4


def test_sharded_predict_matches_single_device(mesh8):
    """Mesh-aware MoC sweep (VERDICT r2 #4): the dp-sharded Predictor —
    host-padded AND device-cached paths — must produce the same results
    dict as the single-device sweep."""
    import dataclasses

    from r3d_tpu.config import TrainConfig, get_config
    from r3d_tpu.data.device_cache import build_video_arrays
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.eval.predict import Predictor
    from r3d_tpu.models import build_model
    from r3d_tpu.parallel.mesh import set_active_mesh

    src = SyntheticSource(
        n_videos=6, n_actions=5, vid_len_range=(40, 70), input_dim=12,
        depth_shape=(6, 4), seed=11,
    )
    cfg = get_config("synthetic").replace(
        data=dataclasses.replace(
            get_config("synthetic").data, seq_buckets=(48, 64),
            depth_shape=(6, 4), sample_rate=1,
        ),
        model=dataclasses.replace(
            get_config("synthetic").model, model="futr_fusion_bn",
            hidden_dim=16, n_head=2, n_query=8, input_dim=12,
            max_pos_len=128, compute_dtype="float32",
        ),
        train=TrainConfig(loop="proposed_depth", min_train_batch=0),
    )

    class SyntheticVideoSource:
        """Minimal VideoSource facade over SyntheticSource for Predictor."""

        def __init__(self, s):
            self.s = s
            self.actions_dict = s.actions_dict
            self.n_class = s.n_class
            self.pad_idx = s.pad_idx

        def units(self):
            return [(f"v{i}", None) for i in range(len(self.s.videos))]

        def load_video(self, vid, seq=None):
            v = self.s.videos[int(vid[1:])]
            return {
                "features": v["features"],
                "label_idx": np.array(
                    [self.s.actions_dict[l] for l in v["labels"]]
                ),
                "depth": v["depth"],
            }

    source = SyntheticVideoSource(src)
    model = build_model(cfg.model, src.n_class)
    v0 = source.load_video("v0")
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(v0["features"][None], jnp.float32),
        jnp.asarray(v0["depth"][None], jnp.float32),
        None, train=False,
    )

    set_active_mesh(None)
    single = Predictor(cfg, model, src.n_class, eval_batch=4)
    res_single = single.predict(variables, source, 0.3, log=lambda *a: None)

    sharded = Predictor(cfg, model, src.n_class, eval_batch=4, mesh=mesh8)
    res_mesh = sharded.predict(variables, source, 0.3, log=lambda *a: None)
    set_active_mesh(None)
    assert set(res_single) == set(res_mesh)
    for k in res_single:
        np.testing.assert_allclose(res_mesh[k], res_single[k], atol=2e-5,
                                   err_msg=k)

    # device-cached sweep under the mesh
    videos = [source.load_video(f"v{i}") for i in range(6)]
    data = build_video_arrays(videos)
    sharded2 = Predictor(cfg, model, src.n_class, eval_batch=4, mesh=mesh8)
    res_cached = sharded2.predict(
        variables, source, 0.3, log=lambda *a: None, cache_data=data
    )
    set_active_mesh(None)
    for k in res_single:
        np.testing.assert_allclose(res_cached[k], res_single[k], atol=2e-5,
                                   err_msg=k)


def test_cli_train_automesh(tmp_path):
    """cli.run.train on a multi-device host must auto-build the MeshConfig
    mesh (the reference wraps in nn.DataParallel unconditionally,
    main_utkinects.py:129) and complete an epoch through the device-cached
    fit path with the batch index tables sharded over dp."""
    import dataclasses
    import os

    from r3d_tpu.cli.run import train as cli_train
    from r3d_tpu.config import CONFIGS

    root = tmp_path / "utkinect"
    rng = np.random.RandomState(0)
    acts = [f"a{i}" for i in range(5)]
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts)))
    vids = []
    for v in range(4):
        L = int(rng.randint(50, 70))
        labels = [acts[int(x)] for x in (np.arange(L) // 9) % 5]
        np.save(root / "features_img" / f"v{v}.npy",
                rng.randn(L, 16).astype(np.float32))
        np.save(root / "features_depth" / f"v{v}.npy",
                rng.randn(L, 6, 4).astype(np.float32))
        with open(root / "groundTruth" / f"v{v}.txt", "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")
    (root / "splits" / "val_split.txt").write_text(vids[0] + "\n")

    cfg = CONFIGS["utkinects"]
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, data_root=str(tmp_path), seq_buckets=(64,),
            depth_shape=(6, 4), train_obs_percs=(0.3, 0.5)),
        model=dataclasses.replace(
            cfg.model, hidden_dim=16, n_head=2, input_dim=16,
            max_pos_len=64),
        train=dataclasses.replace(
            cfg.train, epochs=1, batch_size=8, min_train_batch=0,
            save_dir=str(tmp_path / "save"), seeds=(1,)),
    )
    logs = []
    trainer, state, _ = cli_train(cfg, seed=1, log=logs.append)
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {
        "dp": 8, "ep": 1, "tp": 1, "sp": 1, "pp": 1
    }
    assert any("mesh" in str(l) for l in logs)
    assert np.isfinite(float(jnp.sum(jax.tree.leaves(state.params)[0])))


def test_batch_attending_predict_keeps_eval_batch_on_mesh(mesh8, tmp_path):
    """ADVICE r4 (medium): a batch-ATTENDING model (COMPAT #17 —
    futr_unsupervised's l3 attention mixes rows, so outputs depend on batch
    composition) must NOT have eval_batch=1 silently rounded up to the dp
    extent on a mesh: filler rows would feed the cross-batch attention.  The
    sweep instead runs replicated over the mesh and equals the no-mesh
    per-video protocol exactly.  Also pins the structural eval_batch>1
    warning (ADVICE low #3)."""
    import dataclasses
    import os
    import warnings

    from r3d_tpu.config import CONFIGS, ModelConfig, TrainConfig
    from r3d_tpu.data.datasets import build_source
    from r3d_tpu.eval.predict import Predictor
    from r3d_tpu.models import build_model
    from r3d_tpu.parallel.mesh import set_active_mesh

    rng = np.random.RandomState(0)
    root = tmp_path / "utkinect"
    for d in ["features_img", "groundTruth", "splits"]:
        os.makedirs(root / d, exist_ok=True)
    acts = [f"a{i}" for i in range(4)]
    (root / "mapping_l2_changed.txt").write_text(
        "".join(f"{i} {a}\n" for i, a in enumerate(acts)))
    (root / "mapping_l3.txt").write_text("0 q0\n1 q1\n2 q2\n")
    vids = []
    for v in range(5):
        L = int(rng.randint(40, 60))
        labels = [acts[int(x)] for x in (np.arange(L) // 7) % 4]
        np.save(root / "features_img" / f"v{v}.npy",
                rng.randn(L, 12).astype(np.float32))
        with open(root / "groundTruth" / f"v{v}.txt", "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    (root / "splits" / "train_split.txt").write_text("\n".join(vids) + "\n")

    base = CONFIGS["utkinects"]
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, data_root=str(tmp_path), seq_buckets=(64,),
            depth_features_dir=None, query_mapping_file="mapping_l3.txt",
            train_obs_percs=(0.3, 0.5)),
        model=ModelConfig(
            model="futr_unsupervised", hidden_dim=32, n_head=4,
            n_encoder_layers=1, n_decoder_layers=1, n_query=8, input_dim=12,
            max_pos_len=64, compute_dtype="float32", query_num=3,
        ),
        train=TrainConfig(loop="unsupervised", min_train_batch=0),
    )
    source = build_source(cfg.data, "train_split.txt")
    model = build_model(cfg.model, source.n_class)
    v = source.load_video(source.vid_list[0])
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(v["features"][None], jnp.float32),
        jnp.asarray(v["query_idx"][None]),
        None, train=False,
    )

    set_active_mesh(None)
    single = Predictor(cfg, model, source.n_class, eval_batch=1)
    assert single._batch_attending and single.eval_batch == 1
    res_single = single.predict(variables, source, 0.3, log=lambda *a: None)

    meshed = Predictor(cfg, model, source.n_class, eval_batch=1, mesh=mesh8)
    assert meshed.eval_batch == 1, "eval_batch must not round up to dp"
    assert meshed._replicate_batches
    res_mesh = meshed.predict(variables, source, 0.3, log=lambda *a: None)
    set_active_mesh(None)
    assert set(res_single) == set(res_mesh)
    for k in res_single:
        np.testing.assert_allclose(res_mesh[k], res_single[k], atol=1e-6,
                                   err_msg=k)

    # the structural guard: batching a batch-attending model warns
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        Predictor(cfg, model, source.n_class, eval_batch=4)
    assert any("COMPAT #17" in str(x.message) for x in w)

    # non-attending models keep the exact round-up behavior
    cfg_gt = cfg.replace(model=dataclasses.replace(cfg.model, model="futr_proposed"))
    model_gt = build_model(cfg_gt.model, source.n_class)
    p_gt = Predictor(cfg_gt, model_gt, source.n_class, eval_batch=1, mesh=mesh8)
    set_active_mesh(None)
    assert p_gt.eval_batch == mesh8.shape["dp"] and not p_gt._replicate_batches
