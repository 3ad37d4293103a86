"""End-to-end fit() vs fit_cached() on the TPU: does the device-resident
dataset close the gap between real training and the bench microloop?

The bench's train-step numbers reuse a device-resident batch, but real
``Trainer.fit`` pays host collation + an H2D per dispatch (~80 MB for a
K=16-stacked fusion batch) through the tunnel.  ``fit_cached`` ships a [K, B]
int32 index table instead.  Both arms run interleaved in ONE process
(CLAUDE.md: step timings drift 2x between processes), same model/config, same
synthetic dataset, epochs timed wall-clock via each loop's own clips/s log.

Usage: python tools/measure_cached_fit.py
"""

import dataclasses
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main(n_videos=64, epochs=3, K=16):
    from r3d_tpu.config import get_config
    from r3d_tpu.data.device_cache import build_cache
    from r3d_tpu.data.pipeline import BucketedLoader
    from r3d_tpu.data.synthetic import SyntheticSource
    from r3d_tpu.train.loop import Trainer

    S = 256
    B = 8
    src = SyntheticSource(
        n_videos=n_videos, n_actions=16, vid_len_range=(S, S + 1),
        input_dim=2048, depth_shape=(160, 120), seed=0,
    )
    config = get_config("utkinects")
    feature_dtype = config.data.feature_dtype  # bf16 on the fusion config
    config = config.replace(
        data=dataclasses.replace(
            config.data, dataset="synthetic", seq_buckets=(S,),
            depth_shape=(160, 120), feature_dtype=feature_dtype),
        train=dataclasses.replace(
            config.train, batch_size=B, min_train_batch=0,
            exclude_class_idx=None, epochs=epochs, steps_per_dispatch=K),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    obs = (0.99,)
    fn, n = src.make_example_fn(obs_percs=obs, sample_rate=1, n_query=8)

    def loader(shuffle=True, seed=1):
        return BucketedLoader(
            num_examples=n, make_example_fn=fn, batch_size=B,
            pad_idx=src.pad_idx, buckets=(S,), n_query=8, with_depth=True,
            drop_remainder=True, feature_dtype=feature_dtype, shuffle=shuffle,
            seed=seed,
        )

    videos = [
        {
            "features": v["features"],
            "label_idx": np.array([src.actions_dict[l] for l in v["labels"]]),
            "depth": v["depth"],
        }
        for v in src.videos
    ]
    cache = build_cache(
        videos, obs, 1, 8, src.pad_idx, src.n_class, (S,),
        feature_dtype=feature_dtype,
    )

    example = jax.tree.map(jnp.asarray, next(iter(loader(False))))
    trainer = Trainer(config, src.n_class)
    state0 = trainer.init_state(jax.random.PRNGKey(0), example,
                                steps_per_epoch=n // B)
    # the train step donates its state arg — keep a host copy and restore a
    # fresh device state per arm
    state_host = jax.device_get(state0)

    cps = {"host_fit": [], "cached_fit": []}

    def capture(tag):
        def log(msg):
            m = re.search(r"\(([\d.]+) clips/s\)", str(msg))
            if m:
                cps[tag].append(float(m.group(1)))
        return log

    # interleave arms: host, cached, host, cached (first of each = compile)
    fit_secs = {"host_fit": [], "cached_fit": []}
    for arm in range(2):
        cfg1 = config.replace(
            train=dataclasses.replace(config.train, epochs=epochs)
        )
        t = Trainer(cfg1, src.n_class)
        t.tx = trainer.tx
        t0 = time.time()
        t.fit(jax.tree.map(jnp.asarray, state_host), loader(True),
              loader(False), seed=1, log=capture("host_fit"))
        fit_secs["host_fit"].append(time.time() - t0)
        t2 = Trainer(cfg1, src.n_class)
        t2.tx = trainer.tx
        t0 = time.time()
        t2.fit_cached(jax.tree.map(jnp.asarray, state_host), cache,
                      None, seed=1, log=capture("cached_fit"),
                      val_cache=cache)
        fit_secs["cached_fit"].append(time.time() - t0)

    # drop compile-affected first epoch of each arm's first run
    host = max(cps["host_fit"][1:])
    cached = max(cps["cached_fit"][1:])
    out = {
        "workload": f"futr_fusion_bn B={B} S={S} depth=160x120 "
                    f"{feature_dtype} K={K}, {n_videos} videos x {obs}",
        "host_fit_clips_per_sec": round(host, 1),
        "cached_fit_clips_per_sec": round(cached, 1),
        "speedup": round(cached / host, 2),
        # post-compile wall clock of a full fit run incl. per-epoch validation
        "host_fit_total_s": round(fit_secs["host_fit"][-1], 1),
        "cached_fit_total_s": round(fit_secs["cached_fit"][-1], 1),
        "cache_mib": cache.nbytes >> 20,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
