"""Round-2 measurement campaign on the real TPU chip.

Answers VERDICT r1 items with numbers:
  #3  50salads-scale (h512/S3100/enc2/dec2/nq20, scripts/50s_train.sh:1-5)
      train/infer throughput, fp32 vs bf16
  #5  Pallas hand-written fuser backward on/off (B=8 and B=64)
  #6  bf16 vs fp32 on the fusion workload at B=64
  #9/#3 flash_attention kernel vs composed XLA at S=3100 (fwd and train grad)

Timing discipline per CLAUDE.md: chain data-dependent steps, fetch ONE scalar
at the window end (block_until_ready lies under the axon tunnel), best-of-N
windows within one process.

Usage: python tools/measure_r2.py [--out /tmp/measure_r2.json] [--only PART]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _chain_time(step_fn, state, batch, rng, n_steps=10, reps=3):
    """Best-of-reps mean step time; state-donating chained steps + one
    scalar fetch per window."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        s = state
        for i in range(n_steps):
            s, m = step_fn(s, batch, jax.random.fold_in(rng, i), 0)
        float(m["loss"])
        best = min(best, (time.time() - t0) / n_steps)
        state = s
    return best, state


def make_futr_50s(compute_dtype="float32", batch_size=8,
                  feature_dtype="float32"):
    """50salads-published-shape trainer + batch on synthetic data."""
    import dataclasses

    from r3d_tpu.config import get_config
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.train.loop import Trainer

    S = 3100
    src = SyntheticSource(
        n_videos=batch_size, n_actions=19, vid_len_range=(S, S + 1),
        input_dim=2048, seed=0,
    )
    config = get_config("50salads")
    config = config.replace(
        data=dataclasses.replace(
            config.data, dataset="synthetic", seq_buckets=(S,)),
        train=dataclasses.replace(
            config.train, batch_size=batch_size, min_train_batch=0),
        model=dataclasses.replace(
            config.model, compute_dtype=compute_dtype, log_erank=False),
    )
    fn, n = src.make_example_fn(obs_percs=(0.99,), sample_rate=1, n_query=20)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=batch_size,
        pad_idx=src.pad_idx, buckets=(S,), n_query=20, with_depth=False,
        drop_remainder=True, feature_dtype=feature_dtype,
    )
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    trainer = Trainer(config, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=100)
    return trainer, state, batch


def make_futr_bf(batch_size=16):
    """Breakfast-published-shape trainer + batch on synthetic data
    (scripts/bf_train.sh:2-6: bs16 h128 enc2 dec1 S2000; bf16 per the
    shipped breakfast config)."""
    import dataclasses

    from r3d_tpu.config import get_config
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.train.loop import Trainer

    S = 2000
    src = SyntheticSource(
        n_videos=batch_size, n_actions=48, vid_len_range=(S, S + 1),
        input_dim=2048, seed=0,
    )
    config = get_config("breakfast")
    config = config.replace(
        data=dataclasses.replace(
            config.data, dataset="synthetic", seq_buckets=(S,)),
        train=dataclasses.replace(
            config.train, batch_size=batch_size, min_train_batch=0),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    fn, n = src.make_example_fn(obs_percs=(0.99,), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=batch_size,
        pad_idx=src.pad_idx, buckets=(S,), n_query=8, with_depth=False,
        drop_remainder=True, feature_dtype=config.data.feature_dtype,
    )
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    trainer = Trainer(config, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=100)
    return trainer, state, batch


def make_unsup_darai(batch_size=8, S=512):
    """darai unsupervised-curriculum trainer + batch: futr_unsupervised
    (query_num 48) under loop='unsupervised' — the gated composite of
    train_unsupervised.py:294-362 (focal L3 + temporal-cluster supcon
    blended by the triangular warmup, cls/dur/seg gated by how-much-wrong;
    parity: tests/test_unsupervised_composite.py)."""
    import dataclasses

    from r3d_tpu.config import get_config
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.losses.temporal import segment_ids_from_labels
    from r3d_tpu.train.loop import Trainer

    src = SyntheticSource(
        n_videos=batch_size, n_actions=17, vid_len_range=(S, S + 1),
        input_dim=2048, seed=0, n_query_classes=40,
    )
    config = get_config("darai")
    config = config.replace(
        data=dataclasses.replace(
            config.data, dataset="synthetic", seq_buckets=(S,),
            multi_sequence=False),
        train=dataclasses.replace(
            config.train, batch_size=batch_size, min_train_batch=0),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    fn, n = src.make_example_fn(obs_percs=(0.99,), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=batch_size,
        pad_idx=src.pad_idx, buckets=(S,), n_query=8, with_depth=False,
        with_query=True, drop_remainder=True,
        feature_dtype=config.data.feature_dtype,
    )
    batch = dict(next(iter(loader)))
    # the unsupervised loop's host path derives seg_ids per batch
    # (train/loop.py: host_batches)
    batch["seg_ids"] = segment_ids_from_labels(
        batch["query_label"], None, config.train.max_segments
    )
    batch = jax.tree.map(jnp.asarray, batch)
    trainer = Trainer(config, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=100)
    return trainer, state, batch


def make_fusion(compute_dtype="float32", batch_size=8, use_pallas=True,
                embed_dtype=None, feature_dtype="float32"):
    import dataclasses

    from r3d_tpu.config import get_config
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.train.loop import Trainer

    S = 256
    src = SyntheticSource(
        n_videos=batch_size, n_actions=16, vid_len_range=(S, S + 1),
        input_dim=2048, depth_shape=(160, 120), seed=0,
    )
    config = get_config("utkinects")
    config = config.replace(
        data=dataclasses.replace(
            config.data, dataset="synthetic", seq_buckets=(S,),
            depth_shape=(160, 120), feature_dtype=feature_dtype),
        train=dataclasses.replace(
            config.train, batch_size=batch_size, min_train_batch=0,
            exclude_class_idx=None),
        model=dataclasses.replace(
            config.model, compute_dtype=compute_dtype, log_erank=False,
            use_pallas=use_pallas, embed_dtype=embed_dtype),
    )
    fn, n = src.make_example_fn(obs_percs=(0.99,), sample_rate=1, n_query=8)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=batch_size,
        pad_idx=src.pad_idx, buckets=(S,), n_query=8, with_depth=True,
        drop_remainder=True, feature_dtype=feature_dtype,
    )
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    trainer = Trainer(config, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=100)
    return trainer, state, batch


def bench_train(tag, trainer, state, batch, results, batch_size, n_steps=10):
    step = trainer.make_train_step()
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    state, m = step(state, batch, rng, 0)
    float(m["loss"])
    compile_s = time.time() - t0
    sec, state = _chain_time(step, state, batch, rng, n_steps=n_steps)
    results[tag] = {
        "train_step_ms": round(sec * 1e3, 3),
        "train_clips_per_sec": round(batch_size / sec, 1),
        "compile_s": round(compile_s, 1),
    }
    print(tag, results[tag], flush=True)
    return state


def bench_attention(results):
    """flash_attention vs composed XLA at the 50salads scale."""
    from r3d_tpu.ops.attention import composed_attention, flash_attention

    B, H, S, D = 8, 8, 3100, 64
    rng = np.random.RandomState(0)
    q = jnp.array(rng.randn(B, H, S, D).astype(np.float32))
    k = jnp.array(rng.randn(B, H, S, D).astype(np.float32))
    v = jnp.array(rng.randn(B, H, S, D).astype(np.float32))
    scale = 1.0 / math.sqrt(D)

    def run(fn, tag, grad):
        if grad:
            f = jax.jit(jax.grad(lambda q_: jnp.sum(fn(q_, k, v, None, scale) ** 2)))
        else:
            f = jax.jit(lambda q_: fn(q_, k, v, None, scale))
        out = f(q)
        float(jnp.sum(out))  # force compile + first run
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            acc = jnp.zeros(())
            for _ in range(5):
                acc = acc + jnp.sum(f(q + acc * 0))  # chain via data dependence
            float(acc)
            best = min(best, (time.time() - t0) / 5)
        results[tag] = round(best * 1e3, 3)
        print(tag, results[tag], "ms", flush=True)

    run(flash_attention, "attn_kernel_fwd_ms", grad=False)
    run(composed_attention, "attn_composed_fwd_ms", grad=False)
    run(flash_attention, "attn_kernel_grad_ms", grad=True)
    run(composed_attention, "attn_composed_grad_ms", grad=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/measure_r2.json")
    p.add_argument("--only", default=None,
                   help="comma list: 50s,fusion_bwd,bf16,attn")
    args = p.parse_args()
    parts = set(args.only.split(",")) if args.only else {
        "50s", "fusion_bwd", "bf16", "attn"}
    results = {"device": str(jax.devices()[0])}

    if "attn" in parts:
        bench_attention(results)

    if "50s" in parts:
        tr, st, b = make_futr_50s("float32")
        bench_train("futr_50s_fp32_B8", tr, st, b, results, 8)
        tr, st, b = make_futr_50s("bfloat16")
        bench_train("futr_50s_bf16_B8", tr, st, b, results, 8)

    if "fusion_bwd" in parts:
        for B in (8, 64):
            # pallas bwd is default-ON since round 2: the XLA leg must set
            # R3D_PALLAS_BWD=0 explicitly (popping it would measure Pallas
            # twice)
            os.environ["R3D_PALLAS_BWD"] = "0"
            tr, st, b = make_fusion("float32", B)
            bench_train(f"fusion_fp32_B{B}_xla_bwd", tr, st, b, results, B)
            os.environ["R3D_PALLAS_BWD"] = "1"
            tr, st, b = make_fusion("float32", B)
            bench_train(f"fusion_fp32_B{B}_pallas_bwd", tr, st, b, results, B)
            os.environ.pop("R3D_PALLAS_BWD", None)

    if "bf16" in parts:
        tr, st, b = make_fusion("bfloat16", 64)
        bench_train("fusion_bf16_B64", tr, st, b, results, 64)
        tr, st, b = make_fusion("bfloat16", 8)
        bench_train("fusion_bf16_B8", tr, st, b, results, 8)

    if "mixed" in parts:
        # selective bf16 on ONLY the wide input projections
        for B in (8, 64):
            tr, st, b = make_fusion("float32", B, embed_dtype="bfloat16")
            bench_train(f"fusion_mixed_embed_bf16_B{B}", tr, st, b, results, B)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
