"""Trace-backed MFU dispositions + fit_cached hot-path measurement.

VERDICT r4 weak #7: the 50salads shape got a full utilization analysis
(matmul floor, AdamW roofline, ~27% MFU = bandwidth-bound — ROADMAP r3);
the Breakfast shape (10.14 achieved TFLOPs in BENCH_r04) and the darai
unsupervised composite (4.14 ms/step) had ratios but no named bound.

This harness AOT-compiles each published train step ONCE (axon returns
cost_analysis only post-compile — CLAUDE.md), reads XLA's flop and
bytes-accessed counts, times a best-of-N window (scalar value fetch at the
window end, per the axon ready-flag pitfall), and captures an xprof trace
for tools/trace_summary.py. The roofline bound is then named from the
DEVICE-time op table (robust to host contention), not wall clock:

    python tools/measure_mfu.py bf     --trace /tmp/mfu_bf --cached
    python tools/measure_mfu.py unsup  --trace /tmp/mfu_unsup --cached
    python tools/measure_mfu.py fusion --cached --trace_cached /tmp/fus_c
    python tools/measure_mfu.py fusion --ab_gather   # flat vs 5D gather
    python tools/trace_summary.py /tmp/mfu_bf --top 30

`--ab_gather` reproduces the round-5 depth-gather layout A/B
(device_cache._gather_window: multi-axis rows gather flattened): both
arms compile in ONE process and interleave their timing windows per the
CLAUDE.md drift rule — the R3D_GATHER_5D env knob must straddle each
arm's COMPILING call (it is read at trace time, not closure creation).
Recorded result: 5D 1.49 ms/step vs flat 1.32 (1.13x), fusion cached
shape (ROADMAP r5).

v5e-1 rooflines used for the disposition: ~197 bf16 TFLOPs peak (MXU),
~819 GB/s HBM. bound = max(flops/peak, bytes/bw) vs measured device time.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aot(step_fn, *args):
    compiled = step_fn.lower(*args).compile()
    flops = nbytes = None
    try:  # cost_analysis can return None or raise on some platforms
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
        nbytes = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass
    return compiled, flops, nbytes


def chain_time(step, state, batch, rng, n_steps=10, reps=3):
    """Donated-chain best-of-reps timing — tools/measure_r2._chain_time."""
    from tools.measure_r2 import _chain_time

    return _chain_time(step, state, batch, rng, n_steps=n_steps, reps=reps)


def build_shape_cache(trainer, src, batch, query=False):
    """DeviceCache + a K-batch index-table builder for this shape."""
    import numpy as np

    from r3d_tpu.data.device_cache import build_cache, epoch_plan

    videos = []
    for v in src.videos:
        d = {
            "features": v["features"],
            "label_idx": np.array([src.actions_dict[l] for l in v["labels"]]),
        }
        if "depth" in v:
            d["depth"] = v["depth"]
        if query:
            d["query_idx"] = np.array([src.query_dict[q] for q in v["query"]])
        videos.append(d)
    S = trainer.config.data.seq_buckets[0]
    n_query = batch["trans_future_target"].shape[1]
    cache = build_cache(
        videos, (0.99, 0.98), 1, n_query, src.pad_idx, src.n_class, (S,),
        feature_dtype=trainer.config.data.feature_dtype,
        query_pad_idx=src.pad_idx if query else None,
    )
    B = batch["features"].shape[0]

    def idx_table(K):
        import numpy as np

        plan = epoch_plan(cache, B, seed=0, epoch=0, drop_remainder=True)
        if len(plan) < K:
            raise ValueError(f"epoch plan has {len(plan)} batches < K={K}")
        return jnp.asarray(np.stack([idx for _sb, idx in plan[:K]]))

    return cache, idx_table, S


def cached_time(trainer, state, src, batch, K, rng, n_disp=4, reps=3,
                query=False):
    """fit_cached hot-path rate at this shape: K steps per dispatch, batches
    gathered in-step from the HBM dataset cache over DISTINCT views (the
    default-on end-to-end path for supervised configs — cli/run.py).
    Returns (best_sec_per_step, final_state) — the input state is DONATED
    by the cached fn, so callers must continue from the returned one."""
    cache, idx_table, S = build_shape_cache(trainer, src, batch, query=query)
    cached_fn = trainer.make_cached_train_fn(cache)
    idxs = idx_table(K)
    state, m = cached_fn(state, cache.data, idxs, rng, S, 0)  # compile
    float(m["loss"])
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for i in range(n_disp):
            state, m = cached_fn(
                state, cache.data, idxs, jax.random.fold_in(rng, i), S, 0
            )
        float(m["loss"])
        best = min(best, (time.time() - t0) / (n_disp * K))
    return best, state


def ab_gather(trainer, state, src, batch, K, rng, n_disp=4, reps=6):
    """Interleaved flat-vs-5D depth-gather A/B on the fusion cached step."""
    cache, idx_table, S = build_shape_cache(trainer, src, batch)
    idxs = idx_table(K)
    fns = {
        "5d": trainer.make_cached_train_fn(cache),
        "flat": trainer.make_cached_train_fn(cache),
    }
    # the env knob is read when the jitted closure first TRACES
    os.environ["R3D_GATHER_5D"] = "1"
    state, m = fns["5d"](state, cache.data, idxs, rng, S, 0)
    float(m["loss"])
    os.environ.pop("R3D_GATHER_5D")
    state, m = fns["flat"](state, cache.data, idxs, rng, S, 0)
    float(m["loss"])

    best = {"5d": float("inf"), "flat": float("inf")}
    for rep in range(reps):
        order = ("5d", "flat") if rep % 2 == 0 else ("flat", "5d")
        for tag in order:
            t0 = time.time()
            for i in range(n_disp):
                state, m = fns[tag](
                    state, cache.data, idxs,
                    jax.random.fold_in(rng, rep * 10 + i), S, 0,
                )
            float(m["loss"])
            best[tag] = min(best[tag], (time.time() - t0) / (n_disp * K))
    return best, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("shape", choices=["bf", "unsup", "fusion"])
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="xprof trace of 5 single-dispatch steps")
    p.add_argument("--trace_cached", default=None, metavar="DIR",
                   help="xprof trace of one cached K-step dispatch")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--cached", action="store_true",
                   help="also time the fit_cached K-step hot path")
    p.add_argument("--ab_gather", action="store_true",
                   help="interleaved flat-vs-5D gather A/B (fusion only)")
    args = p.parse_args()
    if args.ab_gather and args.shape != "fusion":
        p.error("--ab_gather needs the fusion shape (the only 5D stream)")

    from r3d_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    from r3d_tpu.data.synthetic import SyntheticSource
    from tools.measure_r2 import make_fusion, make_futr_bf, make_unsup_darai

    if args.shape == "bf":
        trainer, state, batch = make_futr_bf(batch_size=16)
        B = 16
        cache_src = SyntheticSource(
            n_videos=64, n_actions=48, vid_len_range=(2000, 2001),
            input_dim=2048, seed=2,
        )
    elif args.shape == "unsup":
        trainer, state, batch = make_unsup_darai(batch_size=8, S=512)
        B = 8
        cache_src = SyntheticSource(
            n_videos=64, n_actions=17, vid_len_range=(512, 513),
            input_dim=2048, seed=2, n_query_classes=40,
        )
    else:
        trainer, state, batch = make_fusion(
            "float32", 8, feature_dtype="bfloat16")
        B = 8
        cache_src = SyntheticSource(
            n_videos=64, n_actions=16, vid_len_range=(256, 257),
            input_dim=2048, depth_shape=(160, 120), seed=1,
        )
    rng = jax.random.PRNGKey(1)
    step, flops, nbytes = aot(trainer.make_train_step(), state, batch, rng, 0)
    state, m = step(state, batch, rng, 0)
    float(m["loss"])

    sec, state = chain_time(step, state, batch, rng, n_steps=args.steps)

    cached_sec = ab = None
    cached_parts = None  # (cached_fn, cache, idxs, S) shared with trace_cached
    if args.ab_gather:
        ab, state = ab_gather(trainer, state, cache_src, batch, args.K, rng)
    elif args.cached or args.trace_cached:
        cache, idx_table, S = build_shape_cache(
            trainer, cache_src, batch, query=args.shape == "unsup")
        cached_fn = trainer.make_cached_train_fn(cache)
        idxs = idx_table(args.K)
        state, m = cached_fn(state, cache.data, idxs, rng, S, 0)  # compile
        float(m["loss"])
        cached_parts = (cached_fn, cache, idxs, S)
    if args.cached and cached_parts is not None:
        cached_fn, cache, idxs, S = cached_parts
        best = float("inf")
        for rep in range(3):
            t0 = time.time()
            for i in range(4):
                state, m = cached_fn(
                    state, cache.data, idxs,
                    jax.random.fold_in(rng, rep * 10 + i), S, 0)
            float(m["loss"])
            best = min(best, (time.time() - t0) / (4 * args.K))
        cached_sec = best

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(5):
                state, m = step(state, batch, jax.random.fold_in(rng, 99 + i), 0)
            float(m["loss"])
    if args.trace_cached and cached_parts is not None:
        cached_fn, cache, idxs, S = cached_parts
        with jax.profiler.trace(args.trace_cached):
            state, m = cached_fn(
                state, cache.data, idxs, jax.random.fold_in(rng, 99), S, 0)
            float(m["loss"])

    peak_tflops = 197e12  # v5e bf16
    hbm_bw = 819e9  # v5e HBM bytes/s
    out = {
        "shape": args.shape,
        "train_step_ms": round(sec * 1e3, 3),
        "clips_per_sec": round(B / sec, 1),
        "xla_gflop_per_step": round(flops / 1e9, 2) if flops else None,
        "xla_gbytes_per_step": round(nbytes / 1e9, 3) if nbytes else None,
        "achieved_tflops": round(flops / sec / 1e12, 2) if flops else None,
        "mfu_pct": round(100 * flops / sec / peak_tflops, 1) if flops else None,
        "matmul_floor_ms": (
            round(flops / peak_tflops * 1e3, 3) if flops else None
        ),
        "hbm_floor_ms": (
            round(nbytes / hbm_bw * 1e3, 3) if nbytes else None
        ),
        "device": str(jax.devices()[0]),
    }
    if cached_sec is not None:
        out["cached_train_step_ms"] = round(cached_sec * 1e3, 3)
        out["cached_clips_per_sec"] = round(B / cached_sec, 1)
    if ab is not None:
        out["ab_gather"] = {
            t: {"step_ms": round(s * 1e3, 3), "clips_per_sec": round(B / s, 1)}
            for t, s in ab.items()
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
