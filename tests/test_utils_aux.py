"""Auxiliary subsystem tests: prompts (vs reference generate_prompt),
metrics logger, checkpoint roundtrip, schedule parity."""

import json
import os

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()

from r3d_tpu.utils.prompts import batch_prompts, build_prompt, parse_answer
from r3d_tpu.utils.metrics import MetricsLogger
from r3d_tpu.train.optim import linear_warmup_cosine_schedule


def test_prompt_contains_contract():
    p = build_prompt([5, 5, 7, 16], 4)
    assert "Answer: <ONLY numbers separated by commas>" in p
    assert "Mix_ingredients: Add_water" in p  # candidate list present
    assert "0 Add_batter" in p                # label mapping present


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_prompt_candidates_match_reference_taxonomy():
    import utils as ref_utils

    from r3d_tpu.utils.prompts import COARSE_LABELS, COARSE_TO_FINE, FINE_LABELS

    assert COARSE_LABELS == ref_utils.COARSE_LABEL_LIST
    assert FINE_LABELS == ref_utils.FINE_GRAINED_LABEL_LIST
    assert COARSE_TO_FINE == ref_utils.coarse_to_fine_mapping


def test_batch_prompts_shape():
    ps = batch_prompts([[1, 2], [3, 4]], 2)
    assert len(ps) == 2 and all(isinstance(p, str) for p in ps)


def test_parse_answer():
    text = "Reasoning blah.\nAnswer: 3, 7, 12\nmore text"
    assert parse_answer(text, 3) == [3, 7, 12]
    assert parse_answer(text, 5) == [3, 7, 12, 47, 47]   # padded
    assert parse_answer(text, 2) == [3, 7]               # truncated
    assert parse_answer("no answer here", 2) == [47, 47]


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path), "testrun")
    log.log({"loss": 1.5, "acc": 0.3}, step=1)
    log.log({"loss": 1.2}, step=2)
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "testrun.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 2


@pytest.mark.skipif(not HAS_REF, reason="reference not mounted")
def test_schedule_matches_pl_bolts():
    """Per-epoch lr values vs pl_bolts' closed form (if importable) or the
    documented formula."""
    import math

    base_lr, warmup, max_epochs = 1e-3, 10, 60
    sched = linear_warmup_cosine_schedule(base_lr, warmup, max_epochs,
                                          steps_per_epoch=7)
    for epoch in range(max_epochs):
        got = float(sched(epoch * 7 + 3))  # mid-epoch step
        if epoch < warmup:
            want = 0.0 + epoch * (base_lr - 0.0) / (warmup - 1)
        else:
            want = 0.5 * base_lr * (
                1 + math.cos(math.pi * (epoch - warmup) / (max_epochs - warmup))
            )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-10)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from r3d_tpu.config import get_config, DataConfig, ModelConfig, TrainConfig
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.train.loop import Trainer
    from r3d_tpu.train.checkpoint import Checkpointer

    src = SyntheticSource(n_videos=4, n_actions=4, vid_len_range=(30, 40),
                          input_dim=16, seed=0)
    cfg = get_config("synthetic").replace(
        model=ModelConfig(model="futr", hidden_dim=16, n_head=2,
                          n_encoder_layers=1, n_decoder_layers=1, n_query=8,
                          input_dim=16, max_pos_len=64,
                          compute_dtype="float32", seg_excludes_none=True),
        train=TrainConfig(loop="futr", batch_size=4, epochs=1,
                          min_train_batch=0),
        data=DataConfig(dataset="synthetic", seq_buckets=(64,)),
    )
    fn, n = src.make_example_fn((0.3,), 1, 8)
    loader = BucketedLoader(num_examples=n, make_example_fn=fn, batch_size=4,
                            pad_idx=src.pad_idx, buckets=(64,), n_query=8)
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(loader))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)

    ckpt = Checkpointer(str(tmp_path))
    ckpt.save_best(state, seed=1, epoch=0)
    assert ckpt.has("seed_1_best")

    template = trainer.init_state(jax.random.PRNGKey(42), batch, steps_per_epoch=1)
    restored = ckpt.restore_best(1, template)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.array(a), np.array(b))


def test_resume_from_last(tmp_path):
    """--resume: rolling seed_{s}_last restores exact step/opt state."""
    import jax
    from r3d_tpu.config import get_config, DataConfig, ModelConfig, TrainConfig
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.train.loop import Trainer
    from r3d_tpu.train.checkpoint import Checkpointer

    src = SyntheticSource(n_videos=4, n_actions=4, vid_len_range=(30, 40),
                          input_dim=16, seed=0)
    cfg = get_config("synthetic").replace(
        model=ModelConfig(model="futr", hidden_dim=16, n_head=2,
                          n_encoder_layers=1, n_decoder_layers=1, n_query=8,
                          input_dim=16, max_pos_len=64,
                          compute_dtype="float32", seg_excludes_none=True),
        train=TrainConfig(loop="futr", batch_size=4, epochs=2,
                          min_train_batch=0),
        data=DataConfig(dataset="synthetic", seq_buckets=(64,)),
    )
    fn, n = src.make_example_fn((0.3,), 1, 8)
    mk = lambda: BucketedLoader(num_examples=n, make_example_fn=fn,
                                batch_size=4, pad_idx=src.pad_idx,
                                buckets=(64,), n_query=8, shuffle=False)
    trainer = Trainer(cfg, src.n_class)
    batch = next(iter(mk()))
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=1)
    ckpt = Checkpointer(str(tmp_path))
    state = trainer.fit(state, mk(), mk(), seed=1, checkpointer=ckpt)
    assert ckpt.has("seed_1_last")
    template = trainer.init_state(jax.random.PRNGKey(9), batch, steps_per_epoch=1)
    restored = ckpt.restore_last(1, template)
    assert int(restored.step) == int(state.step) and int(restored.step) > 0


def test_tbwriter_roundtrip(tmp_path):
    """Native tfevents writer (SURVEY §5.5): frames + protos parse back with
    valid CRCs, and MetricsLogger mirrors numeric records into it."""
    import glob

    from r3d_tpu.utils.metrics import MetricsLogger
    from r3d_tpu.utils.tbwriter import SummaryWriter, read_events

    d = str(tmp_path / "tb")
    w = SummaryWriter(d)
    w.scalar("loss", 1.5, step=0)
    w.scalar("loss", 0.75, step=1)
    w.scalar("val_acc", 0.25, step=1)
    w.close()
    (path,) = glob.glob(d + "/events.out.tfevents.*")
    events = list(read_events(path))
    assert events[0]["file_version"] == "brain.Event:2"
    scalars = [(e["step"], e["scalars"]) for e in events[1:]]
    assert scalars == [(0, {"loss": 1.5}), (1, {"loss": 0.75}),
                       (1, {"val_acc": 0.25})]

    m = MetricsLogger(str(tmp_path / "runs"), run_name="r", tensorboard=True)
    m.log({"loss": 2.0, "note": "text ignored"}, step=3)
    m.close()
    (path2,) = glob.glob(str(tmp_path / "runs" / "tb" / "r" /
                             "events.out.tfevents.*"))
    evs = list(read_events(path2))
    assert evs[-1]["scalars"] == {"loss": 2.0} and evs[-1]["step"] == 3


def test_compile_cache_enable(tmp_path, monkeypatch):
    """enable_compilation_cache points jax at the dir (and the env knobs
    opt out / override) — the replay itself is exercised on the tunnel
    (measured 193 s -> 1.4 s across processes, ROADMAP r5)."""
    import jax

    from r3d_tpu.utils.compile_cache import enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.setenv("R3D_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
        assert enable_compilation_cache(min_compile_secs=3.0)
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
        assert (tmp_path / "cc").is_dir()

        monkeypatch.setenv("R3D_COMPILE_CACHE", "0")
        assert not enable_compilation_cache()
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min)
