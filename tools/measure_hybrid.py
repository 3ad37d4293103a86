"""fit() vs fit_hybrid() vs fit_cached() on the TPU.

HybridCache targets datasets OVER the HBM budget, where fit_cached is
unavailable and the host loader is the alternative — so the decision number
is hybrid vs host fit at the same batch composition (they are bit-equal,
tests/test_hybrid_cache.py); fit_cached (everything resident) is the
ceiling.  All arms interleave in ONE process (CLAUDE.md: timings drift 2x
between processes); clips/s read from each loop's own epoch log; first
epochs pay compiles (hybrid compiles one program per host-row-count bucket
{1,2,4,8} per (S, B)), so the max over the later epochs is reported.

``python tools/measure_hybrid.py ab [residency]`` runs the residency-POLICY
A/B instead (VERDICT r4 item 6): 'ascending' vs 'longest' at the same byte
budget on a bimodal 128/512-frame set. Measured 2026-08 on the tunnel v5e:
longest 16.8 clips/s (9.88x host) vs ascending 2.4 (1.41x) vs host 1.7 —
longest-first leaves only SHORT rows on the host path (they ship at their
own small bucket) and fills the whole budget, while ascending strands 3/4
of it under the pad-to-resident-max cost model; 'longest' is now the
default policy (data/device_cache.py: hybrid_cache_from_source).

Usage: python tools/measure_hybrid.py [residency_frac]
"""

import dataclasses
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build_tree(root, n_videos, S, in_dim, depth_shape, lengths=None):
    rng = np.random.RandomState(0)
    acts = [f"a{i}" for i in range(16)]
    base = os.path.join(root, "utkinect")
    for d in ["features_img", "features_depth", "groundTruth", "splits"]:
        os.makedirs(os.path.join(base, d), exist_ok=True)
    with open(os.path.join(base, "mapping_l2_changed.txt"), "w") as f:
        f.write("".join(f"{i} {a}\n" for i, a in enumerate(acts)))
    vids = []
    for v in range(n_videos):
        L = S if lengths is None else int(lengths[v])
        labels = [acts[int(x)] for x in (np.arange(L) // 16) % 16]
        np.save(os.path.join(base, "features_img", f"v{v}.npy"),
                rng.randn(L, in_dim).astype(np.float32))
        np.save(os.path.join(base, "features_depth", f"v{v}.npy"),
                rng.randn(L, *depth_shape).astype(np.float32))
        with open(os.path.join(base, "groundTruth", f"v{v}.txt"), "w") as f:
            for t, l in enumerate(labels):
                f.write(f"img{t},{l},q{t % 3}\n")
        vids.append(f"v{v}.txt")
    with open(os.path.join(base, "splits", "train_split.txt"), "w") as f:
        f.write("\n".join(vids) + "\n")


def main(residency=0.5, n_videos=64, epochs=4, B=8, S=256):
    from r3d_tpu.config import get_config
    from r3d_tpu.data.datasets import build_loader, build_source
    from r3d_tpu.data.device_cache import (
        _unit_probe, cache_from_source, hybrid_cache_from_source,
    )
    from r3d_tpu.train.loop import Trainer

    tmp = tempfile.mkdtemp(prefix="hybrid_bench_")
    build_tree(tmp, n_videos, S, 2048, (160, 120))

    config = get_config("utkinects")
    feature_dtype = config.data.feature_dtype  # bf16 on the fusion config
    config = config.replace(
        data=dataclasses.replace(
            config.data, data_root=tmp, seq_buckets=(S,),
            depth_shape=(160, 120), train_obs_percs=(0.5, 0.99),
            sample_rate=1),
        train=dataclasses.replace(
            config.train, batch_size=B, min_train_batch=0,
            exclude_class_idx=None, epochs=epochs, steps_per_dispatch=1),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    src = build_source(config.data, "train_split.txt")
    units, frows, frb, drows, drb, lrows = _unit_probe(src, config.data)
    full = len(units) * (
        int(frows.max()) * frb + int(drows.max()) * drb + int(lrows.max()) * 4
    )
    hybrid = hybrid_cache_from_source(
        src, config.data, config.model.n_query,
        max_bytes=int(full * residency),
    )
    cache = cache_from_source(src, config.data, config.model.n_query)

    def loader(shuffle=True, seed=1):
        return build_loader(src, config.data, B, config.model.n_query,
                            mode="train", shuffle=shuffle, seed=seed)

    example = next(iter(loader(False)))
    trainer = Trainer(config, src.n_class)
    state0 = trainer.init_state(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, example),
        steps_per_epoch=hybrid.n_views // B,
    )
    state_host = jax.device_get(state0)

    cps = {"host_fit": [], "hybrid_fit": [], "cached_fit": []}

    def capture(tag):
        def log(msg):
            m = re.search(r"\(([\d.]+) clips/s\)", str(msg))
            if m:
                cps[tag].append(float(m.group(1)))
        return log

    secs = {}
    for arm in range(2):
        t = Trainer(config, src.n_class)
        t.tx = trainer.tx
        t0 = time.time()
        t.fit(jax.tree.map(jnp.asarray, state_host), loader(True),
              loader(False), seed=1, log=capture("host_fit"))
        secs["host_fit"] = time.time() - t0
        t2 = Trainer(config, src.n_class)
        t2.tx = trainer.tx
        t0 = time.time()
        t2.fit_hybrid(jax.tree.map(jnp.asarray, state_host), hybrid,
                      loader(False), seed=1, log=capture("hybrid_fit"))
        secs["hybrid_fit"] = time.time() - t0
        t3 = Trainer(config, src.n_class)
        t3.tx = trainer.tx
        t0 = time.time()
        t3.fit_cached(jax.tree.map(jnp.asarray, state_host), cache, None,
                      seed=1, log=capture("cached_fit"), val_cache=cache)
        secs["cached_fit"] = time.time() - t0

    # post-compile number: max over every epoch after each arm's first run
    pick = lambda tag: max(cps[tag][epochs:])
    host, hyb, cach = pick("host_fit"), pick("hybrid_fit"), pick("cached_fit")
    print(json.dumps({
        "workload": f"futr_fusion_bn B={B} S={S} depth=160x120 "
                    f"{feature_dtype}, {n_videos} videos x 2 obs, "
                    f"single-dispatch",
        "device_resident_views_pct": round(100 * (1 - hybrid.host_frac), 1),
        "host_fit_clips_per_sec": round(host, 1),
        "hybrid_fit_clips_per_sec": round(hyb, 1),
        "cached_fit_clips_per_sec": round(cach, 1),
        "hybrid_vs_host": round(hyb / host, 2),
        "cached_vs_host": round(cach / host, 2),
        "hybrid_cache_mib": hybrid.cache.nbytes >> 20,
        "full_cache_mib": cache.nbytes >> 20,
        "device": str(jax.devices()[0]),
    }))


def policy_ab(residency=0.5, n_videos=32, epochs=3, B=8):
    """Residency-policy A/B (VERDICT r3 next #6): 'ascending' vs 'longest'
    at the SAME byte budget, on a MIXED-length dataset (half 128-frame,
    half 512-frame videos — bimodal, so the compile-shape count stays
    bounded on the tunnel) where the policies genuinely diverge —
    ascending keeps more (short) views resident, longest keeps the big rows
    off the host path so the per-batch host part ships at a small own
    bucket.  Both arms interleave in one process with the host-fit control.
    """
    from r3d_tpu.config import get_config
    from r3d_tpu.data.datasets import build_loader, build_source
    from r3d_tpu.data.device_cache import (
        _unit_probe, hybrid_cache_from_source,
    )
    from r3d_tpu.train.loop import Trainer

    rng = np.random.RandomState(7)
    lengths = np.array([128, 512] * (n_videos // 2))
    rng.shuffle(lengths)
    tmp = tempfile.mkdtemp(prefix="hybrid_ab_")
    build_tree(tmp, n_videos, 512, 2048, (160, 120), lengths=lengths)

    config = get_config("utkinects")
    config = config.replace(
        data=dataclasses.replace(
            config.data, data_root=tmp, seq_buckets=(128, 512),
            depth_shape=(160, 120), train_obs_percs=(0.5, 0.99),
            sample_rate=1),
        train=dataclasses.replace(
            config.train, batch_size=B, min_train_batch=0,
            exclude_class_idx=None, epochs=epochs, steps_per_dispatch=1),
        model=dataclasses.replace(config.model, log_erank=False),
    )
    src = build_source(config.data, "train_split.txt")
    units, frows, frb, drows, drb, lrows = _unit_probe(src, config.data)
    full = len(units) * (
        int(frows.max()) * frb + int(drows.max()) * drb + int(lrows.max()) * 4
    )
    budget = int(full * residency)
    hybrids = {
        p: hybrid_cache_from_source(
            src, config.data, config.model.n_query, max_bytes=budget,
            policy=p,
        )
        for p in ("ascending", "longest")
    }

    def loader(shuffle=True, seed=1):
        return build_loader(src, config.data, B, config.model.n_query,
                            mode="train", shuffle=shuffle, seed=seed)

    example = next(iter(loader(False)))
    trainer = Trainer(config, src.n_class)
    state0 = trainer.init_state(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, example),
        steps_per_epoch=max(1, len(units) * 2 // B),
    )
    state_host = jax.device_get(state0)

    cps = {"host_fit": [], "ascending": [], "longest": []}

    def capture(tag):
        def log(msg):
            m = re.search(r"\(([\d.]+) clips/s\)", str(msg))
            if m:
                cps[tag].append(float(m.group(1)))
        return log

    for arm in range(2):
        t = Trainer(config, src.n_class)
        t.tx = trainer.tx
        t.fit(jax.tree.map(jnp.asarray, state_host), loader(True),
              loader(False), seed=1, log=capture("host_fit"))
        for p, h in hybrids.items():
            tp = Trainer(config, src.n_class)
            tp.tx = trainer.tx
            tp.fit_hybrid(jax.tree.map(jnp.asarray, state_host), h,
                          loader(False), seed=1, log=capture(p))

    pick = lambda tag: max(cps[tag][epochs:])
    host = pick("host_fit")
    out = {
        "workload": (
            f"futr_fusion_bn B={B} depth=160x120 bf16, {n_videos} videos "
            f"bimodal 128/512 frames x 2 obs, budget={residency:.0%} of full"
        ),
        "host_fit_clips_per_sec": round(host, 1),
        "device": str(jax.devices()[0]),
    }
    for p, h in hybrids.items():
        out[f"{p}_clips_per_sec"] = round(pick(p), 1)
        out[f"{p}_vs_host"] = round(pick(p) / host, 2)
        out[f"{p}_resident_views_pct"] = round(100 * (1 - h.host_frac), 1)
        out[f"{p}_cache_mib"] = h.cache.nbytes >> 20
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ab":
        policy_ab(*(float(a) for a in sys.argv[2:]))
    else:
        main(*(float(a) for a in sys.argv[1:]))
