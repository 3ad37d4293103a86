"""Int8 weight-only serving vs full precision, on the TPU (interleaved A/B).

Both sessions share one process and alternate per iteration (CLAUDE.md:
step timings drift 2x between processes — never compare detached runs).
Latency is end-to-end ``anticipate`` (pad -> H2D -> forward -> host decode;
the decode fetches values, forcing execution). Also reports the device
checkpoint bytes of each session's variables.

Expected shape of the result: serving latency at these sizes is dominated
by the raw-depth H2D, so int8 weights are a memory feature first (the
number records whether the fused dequant costs anything), while
``input_dtype='uint8'`` attacks the actual bound: uint8 depth + device
dequant ships 2x fewer bytes than the bf16 path (4x vs fp32).

Measured on the tunnel v5e (2026-08 r4, interleaved in one process):
p50 full 367.2 ms; int8 weights 382.8 (1.04x — noise, dequant is free);
uint8 input 285.0 (0.78x — host quantize cost included); uint8 input with
a pre-quantized client buffer 248.7 (0.68x). Device checkpoint int8 4.26 MB
vs 13.78 MB (bytes_ratio 0.31). Round-3 numbers at the same shapes: p50
444.7 int8 vs 447.6 full (0.99x) — the absolute level drifts between
sessions (CLAUDE.md), ratios within one process are the signal.

Usage: python tools/measure_quant_serving.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main(n_warm=3, n_iter=20):
    from r3d_tpu.config import get_config
    from r3d_tpu.models import build_model
    from r3d_tpu.ops.quant import quantized_nbytes
    from r3d_tpu.serving import InferenceSession

    config = get_config("utkinects")
    config = config.replace(
        data=dataclasses.replace(config.data, seq_buckets=(256,),
                                 depth_shape=(160, 120)),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    n_class = 17
    model = build_model(config.model, n_class)
    rng = jax.random.PRNGKey(0)
    S = 256
    feats0 = jax.random.normal(rng, (1, S, config.model.input_dim))
    depth0 = jax.random.normal(rng, (1, S, 160, 120))
    variables = model.init({"params": rng, "dropout": rng},
                           feats0, depth0, None, train=False)
    sessions = {
        "full": InferenceSession(config, variables, n_class, max_batch=8),
        "int8": InferenceSession(config, variables, n_class, max_batch=8,
                                 quantize="int8"),
        # the round-3 finding: latency is DEPTH-H2D-bound, so quantize the
        # input stream (uint8 depth + device dequant), not just the weights
        "u8in": InferenceSession(config, variables, n_class, max_batch=8,
                                 input_dtype="uint8"),
        "u8in_pre": InferenceSession(config, variables, n_class, max_batch=8,
                                     input_dtype="uint8"),
    }

    rs = np.random.RandomState(0)
    # min-max normalized depth in [0, 1), like the reference preprocessing
    # emits (data/utkinect-preprocess-depth.py:30-78)
    video = {
        "features": rs.randn(230, config.model.input_dim).astype(np.float32),
        "depth": rs.rand(230, 160, 120).astype(np.float32),
    }
    # the u8in_pre arm models a client that ships sensor-side uint8 (the
    # session's host quantize cost drops out of the request path)
    args = {
        k: (video["features"],
            np.clip(np.rint(video["depth"] * 255), 0, 255).astype(np.uint8)
            if k == "u8in_pre" else video["depth"])
        for k in sessions
    }
    for _ in range(n_warm):
        for k, s in sessions.items():
            s.anticipate(*args[k])

    lat = {k: [] for k in sessions}
    for _ in range(n_iter):
        for k, s in sessions.items():  # interleaved: one process, ABAB
            t0 = time.time()
            s.anticipate(*args[k])
            lat[k].append(time.time() - t0)

    out = {"platform": jax.devices()[0].platform}
    for k in sessions:
        ms = np.array(lat[k]) * 1e3
        out[f"p50_ms_{k}"] = float(np.percentile(ms, 50))
        out[f"p95_ms_{k}"] = float(np.percentile(ms, 95))
    out["device_bytes_full"] = int(quantized_nbytes(
        sessions["full"].variables))
    out["device_bytes_int8"] = int(quantized_nbytes(
        sessions["int8"].variables))
    out["bytes_ratio"] = out["device_bytes_int8"] / out["device_bytes_full"]
    out["latency_ratio"] = out["p50_ms_int8"] / out["p50_ms_full"]
    out["u8in_latency_ratio"] = out["p50_ms_u8in"] / out["p50_ms_full"]
    out["u8in_pre_latency_ratio"] = (
        out["p50_ms_u8in_pre"] / out["p50_ms_full"]
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
