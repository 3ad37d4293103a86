"""Measure device-side step batching (Trainer.make_multi_step) on the TPU.

Compares per-step time of the B=8 fusion headline workload: one dispatch per
step vs one dispatch per K scanned steps. Timing per CLAUDE.md: donated-state
chains + one scalar fetch per window, best-of-3 within one process.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tools.measure_r2 import make_fusion, _chain_time


def main(K=16, B=8, n_windows=3):
    from r3d_tpu.config import get_config

    config = get_config("utkinects")
    tr, st, b = make_fusion(
        "float32", B, embed_dtype=config.model.embed_dtype,
        feature_dtype=config.data.feature_dtype,
    )
    rng = jax.random.PRNGKey(1)

    # single-step arm
    step = tr.make_train_step()
    st, m = step(st, b, rng, 0)
    float(m["loss"])
    single_sec, st = _chain_time(step, st, b, rng, n_steps=20, reps=n_windows)

    # multi-step arm: one dispatch = K scanned steps over a stacked batch
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), b
    )
    stacked = jax.tree.map(jnp.asarray, stacked)
    multi = tr.make_multi_step()
    st, m = multi(st, stacked, rng, 0)
    float(m["loss"])
    n_disp = max(2, 20 // K)
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.time()
        s = st
        for i in range(n_disp):
            s, m = multi(s, stacked, jax.random.fold_in(rng, i), 0)
        float(m["loss"])
        best = min(best, (time.time() - t0) / (n_disp * K))
        st = s
    multi_sec = best

    out = {
        "workload": f"futr_fusion_bn B={B} S=256 h=128 (headline shapes)",
        "K": K,
        "single_step_ms": round(single_sec * 1e3, 3),
        "multi_step_ms_per_step": round(multi_sec * 1e3, 3),
        "single_clips_per_sec": round(B / single_sec, 1),
        "multi_clips_per_sec": round(B / multi_sec, 1),
        "speedup": round(single_sec / multi_sec, 2),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--k", type=int, default=16)
    p.add_argument("--b", type=int, default=8)
    args = p.parse_args()
    main(K=args.k, B=args.b)
