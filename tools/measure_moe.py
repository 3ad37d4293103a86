"""MoE train-step cost on the TPU — same-process interleaved A/B vs dense.

What this pins down (single v5e chip; ep=1, so no expert all-to-alls —
this isolates the ROUTING + DISPATCH overhead, the part a single chip
pays): the 50salads-shape futr step with every FFN swapped for an
E-expert top-2 MoE vs the dense step, at matched per-token FLOPs (each
expert is the same [h, 4h] FFN; top-2 routing doubles FFN token-FLOPs, so
a second arm measures top-1 for the iso-FLOP comparison).

Method follows CLAUDE.md: both arms build in ONE process, timed windows
interleave, each window is a chained donate-state step sequence closed by
a scalar value fetch (block_until_ready alone can return early under
axon).

Usage: python tools/measure_moe.py [E ...]   (default E = 4)
"""

import dataclasses
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.measure_r2 import _chain_time, make_futr_50s  # noqa: E402


def make_moe_50s(n_experts, top_k=2):
    from r3d_tpu.config import get_config
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.train.loop import Trainer

    S = 3100
    B = 8
    src = SyntheticSource(
        n_videos=B, n_actions=19, vid_len_range=(S, S + 1),
        input_dim=2048, seed=0,
    )
    config = get_config("50salads")
    config = config.replace(
        data=dataclasses.replace(
            config.data, dataset="synthetic", seq_buckets=(S,)),
        train=dataclasses.replace(
            config.train, batch_size=B, min_train_batch=0),
        model=dataclasses.replace(
            config.model, log_erank=False,
            moe_experts=n_experts, moe_top_k=top_k),
    )
    fn, n = src.make_example_fn(obs_percs=(0.99,), sample_rate=1, n_query=20)
    loader = BucketedLoader(
        num_examples=n, make_example_fn=fn, batch_size=B,
        pad_idx=src.pad_idx, buckets=(S,), n_query=20, with_depth=False,
        drop_remainder=True,
        feature_dtype=config.data.feature_dtype,
    )
    batch = jax.tree.map(jnp.asarray, next(iter(loader)))
    trainer = Trainer(config, src.n_class)
    state = trainer.init_state(jax.random.PRNGKey(0), batch, steps_per_epoch=100)
    return trainer, state, batch


def main(experts_list):
    rng = jax.random.PRNGKey(1)
    print(f"devices: {jax.devices()}")

    tr_d, st_d, b_d = make_futr_50s(
        "bfloat16", 8, feature_dtype="bfloat16")
    step_d = tr_d.make_train_step()
    st_d, m = step_d(st_d, b_d, rng, 0)
    float(m["loss"])  # compile + sync

    arms = []
    for E in experts_list:
        for k in (2, 1):
            tr, st, b = make_moe_50s(E, top_k=k)
            step = tr.make_train_step()
            st, m = step(st, b, rng, 0)
            float(m["loss"])
            n_params = sum(
                int(np.prod(p.shape)) for p in jax.tree.leaves(st.params)
            )
            arms.append((f"moe E={E} top{k} ({n_params/1e6:.1f}M params)",
                         step, st, b))

    n_params_d = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(st_d.params))
    best_d = float("inf")
    bests = [float("inf")] * len(arms)
    for _ in range(4):
        s, st_d = _chain_time(step_d, st_d, b_d, rng, reps=1)
        best_d = min(best_d, s)
        for i, (tag, step, st, b) in enumerate(arms):
            s, st = _chain_time(step, st, b, rng, reps=1)
            arms[i] = (tag, step, st, b)
            bests[i] = min(bests[i], s)

    print(f"dense ({n_params_d/1e6:.1f}M params): {best_d*1e3:.2f} ms/step")
    for (tag, *_), s in zip(arms, bests):
        print(f"{tag}: {s*1e3:.2f} ms/step ({best_d/s:.3f}x of dense)")


if __name__ == "__main__":
    experts = [int(a) for a in sys.argv[1:]] or [4]
    main(experts)
