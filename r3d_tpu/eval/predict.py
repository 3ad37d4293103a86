"""Prediction / MoC evaluation driver.

Re-implements the protocol every reference ``evaluation/predict_*.py``
shares (predict_utkinects.py:215-392): per video, slice the observed prefix,
run test-mode inference, decode the anticipated frames, then accumulate MoC
counters at the eval horizons, plus the secondary anticipation/segmentation
accuracies.

TPU design (the reference runs one python forward per video with a fresh
graph per sequence length): observed windows pad up to the config's sequence
buckets with an explicit key-padding mask (numerically exact — the softmax
only sees real keys), videos of the same bucket batch together, and the
whole sweep reuses one compiled program per (bucket, batch) shape.
"""

from __future__ import annotations

import collections
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from r3d_tpu.config import Config
from r3d_tpu.data.datasets import VideoSource
from r3d_tpu.parallel.mesh import mesh_scope
from r3d_tpu.data.pipeline import bucket_length
from r3d_tpu.eval.decode import decode_anticipation
from r3d_tpu.eval.moc import MoCAccumulator


def alternating_query(q: np.ndarray) -> np.ndarray:
    """predict_breakfast.py:239-252 (live code): re-encode a query id
    sequence as segment-parity 0/1 — 0 for the first run of equal ids,
    toggling at every change.  Equals (number of changes so far) mod 2."""
    q = np.asarray(q)
    changes = np.concatenate([[0], (q[1:] != q[:-1]).astype(np.int64)])
    return (np.cumsum(changes) % 2).astype(q.dtype)


def alternating_query_jnp(q: jnp.ndarray) -> jnp.ndarray:
    """jnp twin of alternating_query over [B, S] rows (device-cached sweep).
    Rows past a view's real length are harmless: masked keys don't reach
    real outputs and their metrics are never read."""
    changes = jnp.concatenate(
        [jnp.zeros_like(q[:, :1]), (q[:, 1:] != q[:, :-1]).astype(q.dtype)],
        axis=1,
    )
    return jnp.cumsum(changes, axis=1) % 2


def weighted_anticipation_accuracy(
    pred_actions: np.ndarray,     # [Q] decoded transcript actions
    future_labels: np.ndarray,    # [T_future] gt labels (subsampled window)
    last_observed: int,
    exclude_class_idx: Optional[int] = None,
    weight_same: float = 1.0,
    weight_different: float = 10.0,
) -> float:
    """predict_utkinects.py:105-137: compare the first min(Q, T) anticipated
    transcript entries against the future gt frames, 10x weight when the
    first future label differs from the last observed one."""
    weight = (
        weight_different
        if (len(future_labels) and future_labels[0] != last_observed)
        else weight_same
    )
    length = min(len(future_labels), len(pred_actions))
    correct = 0.0
    total = 0.0
    for i in range(length):
        gt = future_labels[i]
        if exclude_class_idx is not None and gt == exclude_class_idx:
            continue
        if pred_actions[i] == gt:
            correct += weight
        total += weight
    return correct / total if total > 0 else 0.0


class Predictor:
    def __init__(self, config: Config, model, n_class: int,
                 eval_batch: int = 8, mesh=None):
        self.config = config
        self.model = model
        self.n_class = n_class
        self.eval_batch = eval_batch
        # mesh: shard the sweep's padded batches over the dp axis (the
        # reference DataParallel's inference counterpart, main.py:115);
        # results are sharding-invariant (tests/test_sharding.py)
        self.mesh = mesh
        # COMPAT #17: the self-attention-source unsupervised family attends
        # ACROSS the batch, so sweep outputs depend on batch composition and
        # the reference's per-video protocol needs eval_batch=1
        # (MIGRATION.md).  Guard it structurally instead of per-config:
        # warn when a caller batches such a model, and never round its
        # eval_batch up to the dp extent — the zero filler rows
        # _forward_batch pads in would feed the cross-batch l3 attention.
        self._batch_attending = bool(
            getattr(model, "query_source", None) == "self_attention"
            and getattr(model, "attend_over_batch", True)
        )
        self._replicate_batches = False
        if self._batch_attending and eval_batch != 1:
            import warnings

            warnings.warn(
                f"model {config.model.model!r} attends across the batch "
                f"(COMPAT #17): eval_batch={eval_batch} makes the sweep "
                "batch-composition-dependent; the reference protocol is "
                "per-video (eval_batch=1)."
            )
        if mesh is not None:
            dp = mesh.shape.get("dp", 1)
            rounded = -(-eval_batch // dp) * dp
            if rounded != eval_batch and self._batch_attending:
                # refuse the silent round-up: keep the faithful batch size
                # and run the sweep replicated over the mesh instead of
                # dp-sharded (numerically identical to no mesh at all)
                self._replicate_batches = True
            else:
                # numerically exact for every other model: filler rows are
                # fully masked and their outputs discarded (padding
                # exactness tests)
                self.eval_batch = rounded
        # query-conditioned family (reference predict_with_query/predict.py:74:
        # model(inputs, query, mode='test'))
        from r3d_tpu.models import model_needs_query

        self.needs_query = model_needs_query(config.model.model)
        self._jit_forward = jax.jit(
            lambda variables, *args: model.apply(variables, *args, train=False)
        )

        # device-cached sweep: batch assembly (device_cache.assemble_eval)
        # fuses INTO the jitted forward, so a chunk's dispatch ships two [B]
        # int32 vectors instead of padded fp32 feature/depth buffers
        import functools

        from r3d_tpu.data.device_cache import assemble_eval

        sr = config.data.sample_rate
        needs_query = self.needs_query
        qmod2 = config.eval.query_mod2

        @functools.partial(jax.jit, static_argnums=(4,))
        def cached_forward(variables, data, vid, real_s, S):
            b = assemble_eval(data, vid, real_s, S, sr)
            args = [b["features"]]
            if "depth" in b:
                args.append(b["depth"])
            elif needs_query:
                q = b.get("query")
                if (
                    qmod2 and q is not None
                    and jnp.issubdtype(q.dtype, jnp.integer)
                ):
                    q = alternating_query_jnp(q)
                args.append(q)
            args.append(b["mask"])
            return model.apply(variables, *args, train=False)

        self._cached_forward = cached_forward

    def _prepare(self, source: VideoSource, obs_p: float):
        """Slice/pad every video; group by bucket."""
        cfg = self.config
        sample_rate = cfg.data.sample_rate
        groups: Dict[int, List[Dict]] = collections.defaultdict(list)
        for ui, (vid, seq) in enumerate(source.units()):
            v = source.load_video(vid, seq)
            labels_idx = v["label_idx"]
            vid_len = len(labels_idx)
            past_len = int(obs_p * vid_len)
            if past_len < 1:
                continue
            feats = v["features"][:past_len][::sample_rate]
            real_s = feats.shape[0]
            if cfg.eval.max_eval_len and real_s > cfg.eval.max_eval_len:
                # the reference skips on the OBSERVED strided row count
                # (past_len/sample_rate > 2000, predict_breakfast.py:216) —
                # a long video still evaluates at small obs ratios
                continue
            S = bucket_length(real_s, cfg.data.seq_buckets)
            item = {
                "vid": vid, "seq": seq, "ui": ui,
                "labels_idx": labels_idx, "past_len": past_len,
                "future_len": int(cfg.eval.pred_p * vid_len),
                "real_s": real_s, "feats": feats,
            }
            if "depth" in v:
                item["depth"] = v["depth"][:past_len][::sample_rate]
            if self.needs_query and v.get("query_idx") is not None:
                if cfg.data.gaze_dir is not None:
                    # gaze stream: observation window over the RAW gaze
                    # sample count, no subsampling
                    # (basedataset_darai_gaze.py:186-188)
                    g = v["query_idx"]
                    item["query"] = g[: int(obs_p * len(g))]
                else:
                    q = v["query_idx"][:past_len][::sample_rate]
                    if cfg.eval.query_mod2 and np.issubdtype(
                        np.asarray(q).dtype, np.integer
                    ):
                        q = alternating_query(np.asarray(q))
                    item["query"] = q
            groups[S].append(item)
        return groups

    def _forward_batch(self, variables, items: List[Dict], S: int):
        """Pad a bucket group chunk to (eval_batch, S, ...) and run one
        compiled forward. Filler rows keep frame 0 valid so no softmax row is
        fully masked; their outputs are discarded."""
        B = self.eval_batch
        n = len(items)
        feat_dim = items[0]["feats"].shape[1:]
        # pad in the config's storage dtype (bf16 on the fusion configs) —
        # same rule as the train collate and the serving path
        in_dtype = jnp.dtype(self.config.data.feature_dtype)
        feats = np.zeros((B, S) + feat_dim, in_dtype)
        mask = np.ones((B, S), bool)
        mask[:, 0] = False  # filler rows stay numerically safe
        depth = None
        if "depth" in items[0]:
            depth = np.zeros((B, S) + items[0]["depth"].shape[1:], in_dtype)
        query = None
        query_len = None
        query_float = False
        if self.needs_query and "query" in items[0]:
            q0 = items[0]["query"]
            query_float = q0.ndim > 1 or np.issubdtype(q0.dtype, np.floating)
            if query_float:
                # gaze stream pads to its OWN static length (raw gaze counts
                # are unrelated to the frame bucket) with true lengths so
                # the GazeCNN masks the pad rows (COMPAT #31)
                Sq = (self.config.data.gaze_pad_len
                      or self.config.data.seq_buckets[-1])
                query = np.zeros((B, Sq) + q0.shape[1:], np.float32)
                query_len = np.zeros((B,), np.int32)
            else:
                query = np.zeros((B, S), np.int32)
        for i, it in enumerate(items):
            r = it["real_s"]
            feats[i, :r] = it["feats"]
            mask[i, :r] = False
            mask[i, r:] = True
            if depth is not None:
                depth[i, :r] = it["depth"]
            if query is not None:
                if query_float:
                    sq = min(len(it["query"]), query.shape[1])
                    query[i, :sq] = it["query"][:sq]
                    query_len[i] = sq
                else:
                    query[i, :r] = it["query"][:r]
        args = [jnp.asarray(feats)]
        if depth is not None:
            args.append(jnp.asarray(depth))
        elif self.needs_query:
            args.append(jnp.asarray(query) if query is not None else None)
        args.append(jnp.asarray(mask))
        if query_len is not None:
            args.append(jnp.asarray(query_len))
        if self.mesh is not None:
            from r3d_tpu.parallel.mesh import batch_sharding, replicated_sharding

            sh = (replicated_sharding(self.mesh) if self._replicate_batches
                  else batch_sharding(self.mesh))
            args = [None if a is None else jax.device_put(a, sh) for a in args]
        if isinstance(variables, (list, tuple)):
            # seed-ensemble: average the output heads (logits/durations)
            # across checkpoints — an extension over the reference, which
            # averages per-seed ACCURACIES (main_utkinects.py:152-165)
            with mesh_scope(self.mesh):
                outs = [self._jit_forward(v, *args) for v in variables]
            outputs = {
                k: sum(o[k] for o in outs) / len(outs) for k in outs[0]
            }
        else:
            with mesh_scope(self.mesh):
                outputs = self._jit_forward(variables, *args)
        return {k: np.array(v[:n], np.float32) for k, v in outputs.items()}

    def _forward_batch_cached(self, variables, items: List[Dict], S: int,
                              data) -> Dict[str, np.ndarray]:
        """Like _forward_batch, but the windows gather from the HBM-resident
        video arrays inside the jitted forward — the dispatch ships only the
        chunk's [B] video indices and row counts."""
        B = self.eval_batch
        vid = np.zeros(B, np.int32)
        real_s = np.zeros(B, np.int32)   # filler rows: real_s=0, all-masked
        for i, it in enumerate(items):
            vid[i] = it["ui"]
            real_s[i] = it["real_s"]
        if self.mesh is not None:
            from r3d_tpu.parallel.mesh import batch_sharding, replicated_sharding

            sh = (replicated_sharding(self.mesh) if self._replicate_batches
                  else batch_sharding(self.mesh))
            vid = jax.device_put(jnp.asarray(vid), sh)
            real_s = jax.device_put(jnp.asarray(real_s), sh)
        if isinstance(variables, (list, tuple)):
            with mesh_scope(self.mesh):
                outs = [
                    self._cached_forward(v, data, vid, real_s, S)
                    for v in variables
                ]
            outputs = {
                k: sum(o[k] for o in outs) / len(outs) for k in outs[0]
            }
        else:
            with mesh_scope(self.mesh):
                outputs = self._cached_forward(
                    variables, data, vid, real_s, S
                )
        return {
            k: np.array(v[: len(items)], np.float32)
            for k, v in outputs.items()
        }

    def _accumulate(self, it: Dict, outputs: Dict, i: int, acc, stats: Dict,
                    source: VideoSource, obs_p: float,
                    gif_dir: Optional[str], frames_root: str,
                    dump: Optional[List[str]] = None):
        """Fold one video's outputs into the per-obs accumulators."""
        cfg = self.config
        sample_rate = cfg.data.sample_rate
        none_idx = self.n_class - 1
        labels_idx = it["labels_idx"]
        past_len, future_len = it["past_len"], it["future_len"]
        action_logits = outputs["action"][i]

        if "duration" in outputs:
            frames, _ = decode_anticipation(
                action_logits, outputs["duration"][i], future_len, none_idx
            )
        else:
            # duration-less slot-regression models (TCN): per-slot paint
            from r3d_tpu.eval.decode import decode_frames_from_slots

            frames = decode_frames_from_slots(action_logits, future_len)
        prediction = np.concatenate([labels_idx[:past_len], frames])
        acc.add_video(labels_idx, prediction, obs_p)

        if gif_dir is not None:
            meta = source.load_meta(it["vid"], it["seq"])
            if meta.get("images"):
                import os

                from r3d_tpu.eval.visualize import render_anticipation_gif

                idx_to_name = {v: k for k, v in source.actions_dict.items()}
                idx_to_name[none_idx] = "NONE"
                n_show = min(len(meta["images"]), len(prediction))
                render_anticipation_gif(
                    [os.path.join(frames_root, p) for p in meta["images"][:n_show]],
                    [idx_to_name.get(int(x), "?") for x in labels_idx[:n_show]],
                    [idx_to_name.get(int(x), "?") for x in prediction[:n_show]],
                    os.path.join(
                        gif_dir,
                        f"{it['vid'].split('/')[-1].split('.')[0]}"
                        + (f"_{it['seq']}" if it["seq"] is not None else "")
                        + f"_{obs_p}.gif",
                    ),
                    observed_count=past_len,
                )

        # secondary metrics (predict_utkinects.py:305-328)
        future_sub = labels_idx[past_len : past_len + future_len][::sample_rate]
        pred_actions = np.argmax(action_logits, axis=-1)
        last_obs = labels_idx[past_len - 1]
        if dump is not None:
            # gt/pred transcript log (the reference's debugging dump,
            # predict_utkinects.py:118-134/252-327 — ours appends all videos
            # per obs file instead of truncating per video)
            vid_tag = it["vid"] + (f"::{it['seq']}" if it["seq"] is not None else "")
            dump.append(f"--- {vid_tag} (obs {obs_p}) ---")
            dump.append("idx\tgt\tpred")
            n = min(len(future_sub), len(pred_actions))
            for j in range(n):
                dump.append(f"{j}\t{int(future_sub[j])}\t{int(pred_actions[j])}")
        # ant-accuracy protocol follows the entry point's live predict file
        # (EvalConfig.ant_acc_mode); the exclusion id is the EVAL-side one
        # (predict_utkinects.py:328 passes 16 where the train loop uses 47)
        mode = cfg.eval.ant_acc_mode
        if mode == "weighted":
            stats["ant"] += weighted_anticipation_accuracy(
                pred_actions, future_sub, last_obs,
                exclude_class_idx=cfg.eval.exclude_class_idx,
            )
        else:
            nn_ = min(len(future_sub), len(pred_actions))
            ok = pred_actions[:nn_] == future_sub[:nn_]
            if (mode == "unweighted_excl"
                    and cfg.eval.exclude_class_idx is not None):
                # predict_tcn_darai.py:146-155: gt==exclude skipped from the
                # numerator only; the denominator keeps the full length
                ok = ok & (future_sub[:nn_] != cfg.eval.exclude_class_idx)
            correct = int(np.sum(ok))
            if mode == "micro":
                # predict_50salads.py:198-232: counts pool over all videos
                stats["ant_correct"] += correct
                stats["ant_total"] += nn_
            else:
                # predict_breakfast.py:36-70: per-video plain accuracy
                stats["ant"] += (correct / nn_) if nn_ else 0.0
        if "seg" in outputs:
            seg_pred = np.argmax(outputs["seg"][i], axis=-1)
            past_sub = labels_idx[:past_len][::sample_rate]
            n = min(it["real_s"], len(past_sub))
            if n:
                stats["seg"] += float(np.mean(seg_pred[:n] == past_sub[:n]))
        # predict-time L3/query accuracy (predict_breakfast.py:121-131:
        # cal_performance_focal over the per-frame L3 logits, pad+exclude ids
        # dropped from the count)
        if "l3" in outputs and "query" in it:
            q = np.asarray(it["query"])
            if q.ndim == 1 and np.issubdtype(q.dtype, np.integer):
                r = it["real_s"]
                l3_pred = np.argmax(outputs["l3"][i][:r], axis=-1)
                gt = q[:r]
                valid = np.ones(r, bool)
                if self.config.train.l3_pad_idx is not None:
                    valid &= gt != self.config.train.l3_pad_idx
                if self.config.train.l3_exclude_idx is not None:
                    valid &= gt != self.config.train.l3_exclude_idx
                stats["l3_correct"] += int(np.sum((l3_pred == gt) & valid))
                stats["l3_total"] += int(valid.sum())
        stats["n"] += 1

    def predict_multi(
        self,
        variables: Dict,
        source: VideoSource,
        obs_list,
        log: Callable = print,
        gif_dir: Optional[str] = None,
        frames_root: str = "",
        dump_dir: Optional[str] = None,
        cache_data=None,
    ) -> Dict[float, Dict[str, float]]:
        """One device sweep serving EVERY observation ratio (ROADMAP #4): all
        ratios' windows bucket together, so chunks fill across ratios and one
        compiled program per (bucket, batch) shape covers the whole protocol
        (the reference runs a fresh pass per ratio,
        main_utkinects.py:138-165)."""
        cfg = self.config
        if self.mesh is not None:
            from r3d_tpu.parallel.mesh import replicated_sharding

            rep = replicated_sharding(self.mesh)

            def rput(tree):
                return jax.tree.map(lambda x: jax.device_put(x, rep), tree)

            variables = (
                [rput(v) for v in variables]
                if isinstance(variables, (list, tuple)) else rput(variables)
            )
            if cache_data is not None:
                cache_data = rput(cache_data)
        groups: Dict[int, List[Dict]] = collections.defaultdict(list)
        for obs_p in obs_list:
            for S, items in self._prepare(source, obs_p).items():
                for it in items:
                    it["obs_p"] = obs_p
                groups[S].extend(items)

        accs = {
            o: MoCAccumulator(cfg.eval.eval_p, len(source.actions_dict))
            for o in obs_list
        }
        stats = {
            o: dict(ant=0.0, seg=0.0, l3_correct=0, l3_total=0, n=0,
                    ant_correct=0, ant_total=0)
            for o in obs_list
        }
        dumps = {o: [] for o in obs_list} if dump_dir is not None else None
        for S, items in sorted(groups.items()):
            for start in range(0, len(items), self.eval_batch):
                chunk = items[start : start + self.eval_batch]
                outputs = (
                    self._forward_batch_cached(variables, chunk, S, cache_data)
                    if cache_data is not None
                    else self._forward_batch(variables, chunk, S)
                )
                for i, it in enumerate(chunk):
                    o = it["obs_p"]
                    self._accumulate(
                        it, outputs, i, accs[o], stats[o], source, o,
                        gif_dir, frames_root,
                        dump=None if dumps is None else dumps[o],
                    )
        if dumps is not None:
            import os

            os.makedirs(dump_dir, exist_ok=True)
            for o, lines in dumps.items():
                with open(
                    os.path.join(dump_dir, f"gt_pred_log_{o}.txt"), "w"
                ) as f:
                    f.write("\n".join(lines) + "\n")

        all_results: Dict[float, Dict[str, float]] = {}
        for o in obs_list:
            results = accs[o].results(o)
            accs[o].print_results(o)
            st = stats[o]
            if cfg.eval.ant_acc_mode == "micro":
                results["ant_acc"] = st["ant_correct"] / max(st["ant_total"], 1)
            else:
                results["ant_acc"] = st["ant"] / max(st["n"], 1)
            results["seg_acc"] = st["seg"] / max(st["n"], 1)
            if st["l3_total"]:
                results["l3_acc"] = st["l3_correct"] / st["l3_total"]
            all_results[o] = results
        return all_results

    def predict(
        self,
        variables: Dict,
        source: VideoSource,
        obs_p: float,
        log: Callable = print,
        gif_dir: Optional[str] = None,
        frames_root: str = "",
        cache_data=None,
    ) -> Dict[str, float]:
        """Single-ratio protocol (reference predict_utkinects.py:215-392).
        ``gif_dir``: also render gt-vs-pred anticipation GIFs per video
        (reference make_gif.py flow) when the gt carries image paths."""
        return self.predict_multi(
            variables, source, [obs_p], log=log, gif_dir=gif_dir,
            frames_root=frames_root, cache_data=cache_data,
        )[obs_p]
