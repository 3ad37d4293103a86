"""Serving-path latency/throughput on the TPU (InferenceSession).

Single-video p50/p95 latency (end-to-end: pad -> device forward -> host
decode) and batched throughput at max_batch, on the flagship UTKinect-config
fusion model with random weights (weights don't affect timing). Timing per
CLAUDE.md: the decode consumes the outputs on host, which forces execution.

Usage: python tools/measure_serving.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main(n_warm=3, n_iter=30):
    import dataclasses

    from r3d_tpu.config import get_config
    from r3d_tpu.serving import InferenceSession
    from r3d_tpu.models import build_model

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
    session = InferenceSession(config, variables, n_class, max_batch=8)

    rs = np.random.RandomState(0)
    video = {
        "features": rs.randn(230, config.model.input_dim).astype(np.float32),
        "depth": rs.randn(230, 160, 120).astype(np.float32),
    }
    # warm (compile)
    for _ in range(n_warm):
        session.anticipate(video["features"], video["depth"])

    lats = []
    for _ in range(n_iter):
        t0 = time.time()
        session.anticipate(video["features"], video["depth"])
        lats.append(time.time() - t0)
    lats = np.array(lats) * 1e3

    videos = [
        {
            "features": rs.randn(int(rs.randint(180, 256)),
                                 config.model.input_dim).astype(np.float32),
            "depth": rs.randn(0, 160, 120).astype(np.float32),
        }
        for _ in range(32)
    ]
    for v in videos:
        v["depth"] = rs.randn(v["features"].shape[0], 160, 120).astype(np.float32)
    # warm every power-of-two chunk shape the queue/batcher can form —
    # an unwarmed shape inside a timing window costs a 2-5 min tunnel compile
    for nwarm in (2, 3, 8):
        session.anticipate_batch(videos[:nwarm])
    t0 = time.time()
    session.anticipate_batch(videos)
    batch_sec = time.time() - t0

    # concurrent clients through the batching front-end: 4 threads x 8
    # videos submitted individually, coalesced by ServingQueue
    import threading

    from r3d_tpu.serving import ServingQueue

    q = ServingQueue(session, max_wait_ms=20)
    futs = []
    lock = threading.Lock()

    def client(chunk):
        for v in chunk:
            f = q.submit(v["features"], v["depth"])
            with lock:
                futs.append(f)

    t0 = time.time()
    threads = [
        threading.Thread(target=client, args=(videos[i::4],)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for f in futs:
        f.result()
    queue_sec = time.time() - t0
    q.close()

    out = {
        "workload": "serving futr_fusion_bn S<=256 h=128 (bucket 256)",
        "p50_latency_ms": round(float(np.percentile(lats, 50)), 2),
        "p95_latency_ms": round(float(np.percentile(lats, 95)), 2),
        "batched_videos_per_sec": round(32 / batch_sec, 1),
        "queued_concurrent_videos_per_sec": round(32 / queue_sec, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
