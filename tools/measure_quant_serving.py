"""Int8 weight-only serving vs full precision, on the TPU (interleaved A/B).

Both sessions share one process and alternate per iteration (CLAUDE.md:
step timings drift 2x between processes — never compare detached runs).
Latency is end-to-end ``anticipate`` (pad -> H2D -> forward -> host decode;
the decode fetches values, forcing execution). Also reports the device
checkpoint bytes of each session's variables.

Expected shape of the result: serving latency at these sizes is dominated
by the raw-depth H2D, so int8 weights are a memory feature first; the
number here records whether the fused dequant costs anything.

Measured on the tunnel v5e (2026-08, interleaved in one process):
p50 444.7 ms int8 vs 447.6 ms full (latency_ratio 0.99 — free), device
checkpoint 4.26 MB vs 13.78 MB (bytes_ratio 0.31).

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
    full = InferenceSession(config, variables, n_class, max_batch=8)
    q8 = InferenceSession(config, variables, n_class, max_batch=8,
                          quantize="int8")

    rs = np.random.RandomState(0)
    video = {
        "features": rs.randn(230, config.model.input_dim).astype(np.float32),
        "depth": rs.randn(230, 160, 120).astype(np.float32),
    }
    for _ in range(n_warm):
        full.anticipate(video["features"], video["depth"])
        q8.anticipate(video["features"], video["depth"])

    lat = {"full": [], "int8": []}
    for _ in range(n_iter):
        t0 = time.time()
        full.anticipate(video["features"], video["depth"])
        lat["full"].append(time.time() - t0)
        t0 = time.time()
        q8.anticipate(video["features"], video["depth"])
        lat["int8"].append(time.time() - t0)

    out = {
        "platform": jax.devices()[0].platform,
        "p50_ms_full": float(np.percentile(np.array(lat["full"]) * 1e3, 50)),
        "p50_ms_int8": float(np.percentile(np.array(lat["int8"]) * 1e3, 50)),
        "device_bytes_full": int(quantized_nbytes(full.variables)),
        "device_bytes_int8": int(quantized_nbytes(q8.variables)),
    }
    out["bytes_ratio"] = out["device_bytes_int8"] / out["device_bytes_full"]
    out["latency_ratio"] = out["p50_ms_int8"] / out["p50_ms_full"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
