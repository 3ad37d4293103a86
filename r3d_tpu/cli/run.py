"""Train / predict orchestration — the reference main_*.py flow, config-driven.

Reference flow (main_utkinects.py:50-188): seed everything, read mapping +
splits, build model + AdamW + warmup-cosine + datasets, then either train
(with per-epoch validation and best-ckpt saving) or sweep obs ratios x seeds
loading each best checkpoint and printing MoC lines.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from r3d_tpu.config import Config
from r3d_tpu.data.datasets import VideoSource, build_loader, build_source
from r3d_tpu.eval.predict import Predictor
from r3d_tpu.models import build_model
from r3d_tpu.train.checkpoint import Checkpointer
from r3d_tpu.train.loop import Trainer


def save_path(config: Config, dataset_ops: str = "") -> str:
    # mirrors main_utkinects.py:118-119 layout
    return os.path.join(
        config.train.save_dir, config.data.dataset, "long", "model/transformer",
        config.data.split, config.model.input_type, "runs0", f"_{dataset_ops}",
    )


def _splits(config: Config):
    d = config.data
    return (
        d.train_split.format(split=d.split),
        d.val_split.format(split=d.split),
    )


def train(config: Config, seed: int, dataset_ops: str = "",
          sources: Optional[Dict[str, VideoSource]] = None, log=print,
          resume: bool = False):
    """Train one seed; returns (trainer, final_state, checkpointer)."""
    # tunnel compiles cost minutes; replay them from the on-disk cache
    # (utils/compile_cache.py — R3D_COMPILE_CACHE=0 opts out). Lives here,
    # not in main(), so the library-level train()/predict() entry points
    # (tests, scripts) get it too.
    from r3d_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    train_name, val_name = _splits(config)
    if sources is None:
        sources = {
            "train": build_source(config.data, train_name),
            "val": build_source(config.data, val_name),
        }
    src = sources["train"]
    mesh = None
    if len(jax.devices()) > 1:
        # multi-chip hosts train data-parallel by default (the reference
        # wraps in nn.DataParallel unconditionally, main_utkinects.py:129);
        # tp/sp/pp come from MeshConfig for the wide/long/deep configs
        from r3d_tpu.parallel.mesh import make_mesh
        from r3d_tpu.parallel.pipeline import set_pipeline_microbatches

        mesh = make_mesh(
            config.mesh.dp, config.mesh.tp, config.mesh.sp, config.mesh.pp,
            config.mesh.ep,
        )
        set_pipeline_microbatches(config.mesh.pp_microbatches)
        log(f"mesh: {dict(mesh.shape)}")
    trainer = Trainer(config, src.n_class, mesh=mesh)

    train_loader = build_loader(
        src, config.data, config.train.batch_size, config.model.n_query,
        mode="train", shuffle=True, seed=seed,
    )
    val_loader = build_loader(
        sources["val"], config.data,
        config.train.val_batch_size or config.train.batch_size,
        config.model.n_query, mode="val", shuffle=False,
    )

    example = next(iter(train_loader))
    state = trainer.init_state(
        jax.random.PRNGKey(seed), example, steps_per_epoch=max(len(train_loader), 1)
    )
    if config.train.init_ckpt:
        # warm start from converted/exported weights: params (+batch_stats)
        # only — the optimizer state and LR schedule start fresh, unlike
        # --resume which restores the full state + step
        import jax.numpy as jnp
        from flax import serialization

        with open(config.train.init_ckpt, "rb") as f:
            blob = serialization.msgpack_restore(f.read())
        state = state.replace(
            params=jax.tree.map(jnp.asarray, blob["params"]),
            batch_stats=jax.tree.map(
                jnp.asarray, blob.get("batch_stats", state.batch_stats)
            ),
        )
        log(f"warm start: params loaded from {config.train.init_ckpt}")
    path = save_path(config, dataset_ops)
    ckpt = Checkpointer(path)
    start_epoch = 0
    if resume and ckpt.has(f"seed_{seed}_last"):
        state = ckpt.restore_last(seed, state)
        start_epoch = int(state.step) // max(len(train_loader), 1)
        log(f"resumed seed {seed} at step {int(state.step)} (epoch {start_epoch})")
    if mesh is not None and config.mesh.fsdp:
        # ZeRO/FSDP: params + optimizer moments shard over dp; the jitted
        # step propagates the placement, so one device_put pins the run
        from r3d_tpu.parallel.mesh import shard_state

        state = shard_state(state, mesh, fsdp=True)
        log("fsdp: state sharded over dp")
    from r3d_tpu.utils.metrics import MetricsLogger

    metrics = MetricsLogger(path, run_name=f"seed_{seed}_metrics",
                            tensorboard=config.train.tensorboard)
    cache = hybrid = None
    if (config.train.device_cache and config.train.grad_accum <= 1
            and not config.data.raw_frames
            and config.data.gaze_dir is None):
        # grad_accum trains through fit()'s microbatch stacking; the cached
        # scan paths update per batch and would silently change semantics
        from r3d_tpu.data.device_cache import cache_from_source

        try:
            cache = cache_from_source(src, config.data, config.model.n_query)
            val_cache = cache_from_source(
                sources["val"], config.data, config.model.n_query,
                max_bytes=4 << 30,
            )
            log(f"device cache: {(cache.nbytes + val_cache.nbytes) >> 20} "
                f"MiB in HBM, {cache.n_views}+{val_cache.n_views} views")
        except MemoryError as e:
            val_cache = None
            if cache is None:
                log(f"device cache over budget: {e}")
                if not config.data.multi_sequence:
                    # partial residency: cache the units that fit, stream
                    # the rest — batch composition unchanged (fit_hybrid
                    # == fit bit-exactly, tests/test_hybrid_cache.py; on a
                    # dp mesh the view ids shard and host parts replicate,
                    # equality pinned by the mesh arms of that file)
                    from r3d_tpu.data.device_cache import (
                        hybrid_cache_from_source,
                    )

                    try:
                        try:
                            hybrid = hybrid_cache_from_source(
                                src, config.data, config.model.n_query
                            )
                        except MemoryError:
                            # 'longest' (the measured-best default) needs
                            # the longest unit to fit; fall back to
                            # shortest-first rather than no cache at all
                            hybrid = hybrid_cache_from_source(
                                src, config.data, config.model.n_query,
                                policy="ascending",
                            )
                        log(f"hybrid cache: {hybrid.cache.nbytes >> 20} MiB "
                            f"in HBM, {100 * (1 - hybrid.host_frac):.0f}% of "
                            f"views device-resident")
                    except (MemoryError, ValueError) as e2:
                        log(f"hybrid cache unavailable: {e2}")
            else:
                log(f"device cache: train only ({cache.nbytes >> 20} MiB); "
                    f"val stays on the host loader: {e}")
    if cache is not None:
        state = trainer.fit_cached(
            state, cache, val_loader, seed, checkpointer=ckpt, log=log,
            metrics_logger=metrics, start_epoch=start_epoch,
            val_cache=val_cache,
        )
    elif hybrid is not None:
        state = trainer.fit_hybrid(
            state, hybrid, val_loader, seed, checkpointer=ckpt, log=log,
            metrics_logger=metrics, start_epoch=start_epoch,
        )
    else:
        state = trainer.fit(
            state, train_loader, val_loader, seed, checkpointer=ckpt, log=log,
            metrics_logger=metrics, start_epoch=start_epoch,
        )
    metrics.close()
    return trainer, state, ckpt


def predict(config: Config, dataset_ops: str = "", seeds=None,
            source: Optional[VideoSource] = None, log=print,
            ensemble: bool = False,
            results_save_path: Optional[str] = None) -> Dict[str, Dict[str, float]]:
    """Obs-ratio sweep x seed average (main_utkinects.py:138-165).

    ``ensemble=True``: one sweep with the seed checkpoints' output heads
    averaged (logit ensemble) instead of averaging per-seed accuracies.
    ``results_save_path``: write results.json (obs x metric table) plus the
    reference-style per-obs gt/pred transcript logs there."""
    from r3d_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()  # see train(): covers library-level callers
    _, val_name = _splits(config)
    if source is None:
        source = build_source(config.data, val_name)
    seeds = seeds if seeds is not None else config.train.seeds
    model = build_model(config.model, source.n_class)
    mesh = None
    if len(jax.devices()) > 1:
        # shard the MoC sweep over the data axis (the reference
        # DataParallel's inference counterpart, main.py:115)
        from r3d_tpu.parallel.mesh import make_mesh
        from r3d_tpu.parallel.pipeline import set_pipeline_microbatches

        mesh = make_mesh(
            config.mesh.dp, config.mesh.tp, config.mesh.sp, config.mesh.pp,
            config.mesh.ep,
        )
        set_pipeline_microbatches(config.mesh.pp_microbatches)
    predictor = Predictor(config, model, source.n_class,
                          eval_batch=config.eval.eval_batch, mesh=mesh)

    cache_data = None
    if (config.train.device_cache and not config.data.raw_frames
            and config.data.gaze_dir is None):
        from r3d_tpu.data.device_cache import arrays_from_source

        try:
            cache_data = arrays_from_source(source, config.data)
            log("predict: eval videos cached in HBM")
        except MemoryError as e:
            log(f"predict device cache disabled: {e}")

    # template state for checkpoint restore
    trainer = Trainer(config, source.n_class)
    loader = build_loader(
        source, config.data, config.train.batch_size, config.model.n_query,
        mode="val", shuffle=False,
    )
    example = next(iter(loader))
    template = trainer.init_state(jax.random.PRNGKey(0), example, steps_per_epoch=1)

    ckpt = Checkpointer(save_path(config, dataset_ops))
    # seed-outer, one multi-ratio pass per seed: every obs window buckets into
    # the same compiled programs (Predictor.predict_multi), and each
    # checkpoint restores once instead of once per ratio. The reference runs
    # a fresh per-(ratio, seed) pass (main_utkinects.py:138-165); accuracies
    # average across seeds the same way.
    seed_variables = []
    found_seeds = []
    for seed in seeds:
        if ckpt.has(f"seed_{seed}_best"):
            state = ckpt.restore_best(seed, template)
        elif ckpt.has(f"seed_{seed}_last"):
            # a run whose val accuracy never improved past 0 saves no "best"
            # (strict-improvement rule, as the reference); fall back to the
            # rolling last checkpoint rather than skipping the seed
            log(f"seed_{seed}_best missing — using seed_{seed}_last")
            state = ckpt.restore_last(seed, template)
        else:
            log(f"missing checkpoint seed_{seed}_best — skipping")
            continue
        seed_variables.append(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        found_seeds.append(seed)
    per_seed: list = []
    if ensemble and seed_variables:
        per_seed.append(
            predictor.predict_multi(
                seed_variables, source, list(config.eval.obs_percs), log=log,
                dump_dir=(
                    os.path.join(results_save_path, "ensemble")
                    if results_save_path else None
                ),
                cache_data=cache_data,
            )
        )
    else:
        for seed, variables in zip(found_seeds, seed_variables):
            per_seed.append(
                predictor.predict_multi(
                    variables, source, list(config.eval.obs_percs), log=log,
                    # per-seed subdir: one predict_multi call truncates its
                    # own log files, so seeds must not share them
                    dump_dir=(
                        os.path.join(results_save_path, f"seed_{seed}")
                        if results_save_path else None
                    ),
                    cache_data=cache_data,
                )
            )
    all_results: Dict[str, Dict[str, float]] = {}
    for obs_p in config.eval.obs_percs:
        rs = [r[obs_p] for r in per_seed if obs_p in r]
        if rs:
            all_results[f"obs{obs_p}"] = {
                k: float(np.mean([r[k] for r in rs])) for k in rs[0].keys()
            }
    if results_save_path is not None:
        import json

        os.makedirs(results_save_path, exist_ok=True)
        with open(os.path.join(results_save_path, "results.json"), "w") as f:
            json.dump(all_results, f, indent=2)
    return all_results


def main(config: Config, mode: str = "train", dataset_ops: str = "", log=print,
         resume: bool = False, ensemble: bool = False,
         results_save_path: Optional[str] = None):
    if mode in ("train", "train_eval"):
        for seed in config.train.seeds:
            log(f"=== training seed {seed} ===")
            train(config, seed, dataset_ops, log=log, resume=resume)
    if mode in ("predict", "train_eval"):
        return predict(config, dataset_ops, log=log, ensemble=ensemble,
                       results_save_path=results_save_path)
