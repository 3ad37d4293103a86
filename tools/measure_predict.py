"""Predict-sweep throughput on the TPU: host-padded vs device-cached.

Runs Predictor.predict_multi over the full obs-ratio protocol on a synthetic
on-disk UTKinect-style dataset, both arms interleaved in ONE process
(CLAUDE.md: step timings drift between processes). The cached arm gathers
each observation window from HBM inside the jitted forward; the host arm
pads and ships feature/depth buffers per chunk.

Usage: python tools/measure_predict.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def make_dataset(root, n_videos=24, input_dim=2048, depth=(160, 120)):
    rng = np.random.RandomState(0)
    acts = [f"a{i}" for i in range(10)]
    base = os.path.join(root, "utkinect")
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(os.path.join(base, d), exist_ok=True)
    with open(os.path.join(base, "mapping_l2_changed.txt"), "w") as f:
        f.write("".join(f"{i} {a}\n" for i, a in enumerate(acts)))
    vids = []
    for v in range(n_videos):
        L = int(rng.randint(180, 250))
        labels = [acts[int(x)] for x in (np.arange(L) // 11) % 10]
        np.save(os.path.join(base, "features_img", f"v{v}.npy"),
                rng.randn(L, input_dim).astype(np.float32))
        np.save(os.path.join(base, "features_depth", f"v{v}.npy"),
                rng.randn(L, *depth).astype(np.float32))
        with open(os.path.join(base, "groundTruth", f"v{v}.txt"), "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    with open(os.path.join(base, "splits", "val_split.txt"), "w") as f:
        f.write("\n".join(vids) + "\n")
    return root


def main():
    import dataclasses
    import tempfile

    from r3d_tpu.config import get_config
    from r3d_tpu.data.datasets import build_source
    from r3d_tpu.data.device_cache import arrays_from_source
    from r3d_tpu.eval.predict import Predictor
    from r3d_tpu.models import build_model

    root = make_dataset(tempfile.mkdtemp())
    config = get_config("utkinects")
    config = config.replace(
        data=dataclasses.replace(
            config.data, data_root=root, seq_buckets=(256,),
            depth_shape=(160, 120)),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    source = build_source(config.data, "val_split.txt")
    model = build_model(config.model, source.n_class)
    v = source.load_video(source.vid_list[0])
    variables = model.init(
        jax.random.PRNGKey(0), v["features"][None], v["depth"][None],
        None, train=False,
    )
    predictor = Predictor(config, model, source.n_class)
    obs = list(config.eval.obs_percs)
    data = arrays_from_source(source, config.data)

    quiet = lambda *a: None
    times = {"host": [], "cached": []}
    for arm in range(2):
        t0 = time.time()
        predictor.predict_multi(variables, source, obs, log=quiet)
        times["host"].append(time.time() - t0)
        t0 = time.time()
        predictor.predict_multi(variables, source, obs, log=quiet,
                                cache_data=data)
        times["cached"].append(time.time() - t0)

    n_windows = sum(
        sum(len(items) for items in predictor._prepare(source, o).values())
        for o in obs
    )
    host, cached = times["host"][-1], times["cached"][-1]
    print(json.dumps({
        "workload": f"predict_multi {len(obs)} obs ratios x 24 videos "
                    f"({n_windows} windows), futr_fusion_bn S<=256",
        "host_sweep_s": round(host, 1),
        "cached_sweep_s": round(cached, 1),
        "speedup": round(host / cached, 2),
        "host_windows_per_sec": round(n_windows / host, 1),
        "cached_windows_per_sec": round(n_windows / cached, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
