"""Config-driven training loop.

One loop replaces the reference's seven forked ``train/train_*.py`` files;
the per-variant differences (which CE, which exclude class, weighted or not,
curriculum gating) are data, not code (TrainConfig.loop).

The hot path is a single jitted+donated train step: forward, all losses,
backward, AdamW update, BN stat update — one XLA program per bucket shape.
On a mesh, the batch arrives dp-sharded and XLA inserts the gradient
all-reduce (the TPU equivalent of the reference's nn.DataParallel,
SURVEY.md §2.7).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from r3d_tpu.config import Config
from r3d_tpu.losses import (
    accuracy_counts,
    cross_entropy_loss,
    duration_loss,
    focal_loss,
    temporal_cluster_loss,
    weighted_cross_entropy_loss,
)
from r3d_tpu.models import build_model, is_fusion_model
from r3d_tpu.ops import effective_rank_loss
from r3d_tpu.train.optim import make_optimizer
from r3d_tpu.train.state import TrainState, create_train_state


def triangular_warmup(epoch, start: int, peak: int, end: int):
    """train_unsupervised.get_warmup_factor:10-32: 0 -> 1 over [start,peak],
    1 -> 0 over [peak,end], 0 outside."""
    e = jnp.asarray(epoch, jnp.float32)
    up = (e - start) / max(peak - start, 1)
    down = 1.0 - (e - peak) / max(end - peak, 1)
    return jnp.clip(jnp.where(e < peak, up, down), 0.0, 1.0)


def last_non_padding_labels(past_label: jnp.ndarray, pad_idx: int) -> jnp.ndarray:
    """[B, S] -> [B]: the last non-pad label per row; pad_idx if all-pad
    (train_proposed_depth.py:28-50)."""
    B, S = past_label.shape
    valid = past_label != pad_idx
    any_valid = jnp.any(valid, axis=-1)
    last_idx = jnp.argmax(
        jnp.where(valid, jnp.arange(S)[None, :], -1), axis=-1
    )
    last = jnp.take_along_axis(past_label, last_idx[:, None], axis=-1)[:, 0]
    return jnp.where(any_valid, last, pad_idx)


class Trainer:
    """Builds jitted train/eval steps for a Config and runs the epoch loop."""

    def __init__(self, config: Config, n_class: int, mesh=None):
        self.config = config
        self.n_class = n_class
        self.pad_idx = n_class + 1  # main_utkinects.py:109
        self.model = build_model(config.model, n_class)
        self.is_fusion = is_fusion_model(config.model.model)
        from r3d_tpu.models import model_needs_query

        self.needs_query = model_needs_query(config.model.model)
        self.mesh = mesh
        if mesh is not None:
            # lets row-parallel Pallas ops shard_map themselves over dp
            from r3d_tpu.parallel.mesh import set_active_mesh

            set_active_mesh(mesh)
        self.tx = None
        self._train_step = None
        self._eval_step = None
        # Reference quirk (COMPAT #37): most train loops never restore
        # model.train() after the per-epoch validate()'s model.eval(), so
        # epochs >= 1 train with eval-mode BN + dropout (config.py:
        # TrainConfig.sticky_eval cites each loop's lines)
        se = config.train.sticky_eval
        self.sticky_eval = (
            config.train.loop in ("futr", "proposed_depth", "unsupervised",
                                  "tcn")
            if se is None else bool(se)
        )
        self._frozen_model = None

    def _model_for(self, frozen: bool):
        """The forward to train with: the configured model, or its
        module-eval() twin (BN running stats frozen, dropout rates 0 —
        identical params/variables) for sticky-eval epochs >= 1."""
        if not frozen:
            return self.model
        if self._frozen_model is None:
            import dataclasses

            self._frozen_model = build_model(
                dataclasses.replace(
                    self.config.model, dropout=0.0, fuser_dropout=0.0,
                    frozen_stats=True,
                ),
                self.n_class,
            )
        return self._frozen_model

    def _sticky(self, epoch: int) -> bool:
        """True when this TRAINING epoch runs the eval-mode forward: the
        reference's first validate (end of epoch 0) flips the module to
        eval and sticky loops never flip it back."""
        return self.sticky_eval and epoch >= 1

    # ------------------------------------------------------------------ setup
    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray],
                   steps_per_epoch: int) -> TrainState:
        # the schedule advances on optax's internal UPDATE count; under
        # gradient accumulation an epoch of steps_per_epoch batches makes
        # only full-stack + leftover-single updates, so scale the schedule's
        # epoch length accordingly (review finding: without this the warmup
        # ran K x too slowly, starting at pl_bolts' epoch-0 lr of 0.0)
        ga = max(1, self.config.train.grad_accum)
        sched_steps = (
            steps_per_epoch if ga == 1
            else max(1, steps_per_epoch // ga + steps_per_epoch % ga)
        )
        self.sched_steps_per_epoch = sched_steps
        self.tx = make_optimizer(self.config.train, sched_steps)
        inputs = self._model_inputs(example_batch, with_mask=False)
        return create_train_state(rng, self.model, self.tx, inputs)

    def _model_inputs(self, batch, with_mask: bool) -> Tuple:
        mask = (
            (batch["past_label"] == self.pad_idx) if with_mask else None
        )
        if self.is_fusion:
            return (batch["features"], batch["depth_features"], mask)
        if self.needs_query:
            # 4th slot: true gaze-row counts (query_len) so the GazeCNN can
            # mask bucket padding (pipeline.pad_batch emits it for float
            # query streams; None for int L3 queries)
            return (batch["features"], batch.get("query_label"), mask,
                    batch.get("query_len"))
        return (batch["features"], mask)

    # ------------------------------------------------------------- loss logic
    def _losses(self, outputs, batch, epoch=0, train: bool = True):
        cfg = self.config
        pad = self.pad_idx
        excl = cfg.train.exclude_class_idx
        past_label = batch["past_label"]
        target = batch["trans_future_target"]
        dur = batch["trans_future_dur"]
        dur_mask = (dur != pad).astype(jnp.float32)
        unsup = cfg.train.loop == "unsupervised"

        total = jnp.zeros((), jnp.float32)
        metrics: Dict[str, jnp.ndarray] = {}

        loss_seg = jnp.zeros((), jnp.float32)
        seg_correct_mask = None
        if cfg.model.seg and "seg" in outputs:
            seg = outputs["seg"]
            seg_flat = seg.reshape(-1, seg.shape[-1])
            gold = past_label.reshape(-1)
            # the unsupervised loop's seg CE has no exclude class
            # (train_unsupervised.py:327)
            seg_excl = None if unsup else excl
            loss_seg, seg_correct_mask = cross_entropy_loss(seg_flat, gold, pad, seg_excl)
            nc, nw = accuracy_counts(seg_flat, gold, pad, seg_excl)
            if not unsup:
                total = total + loss_seg
            metrics.update(loss_seg=loss_seg, seg_correct=nc, seg_total=nw)

        loss_cls = jnp.zeros((), jnp.float32)
        loss_dur = jnp.zeros((), jnp.float32)
        if cfg.model.anticipate:
            act = outputs["action"]
            act_flat = act.reshape(-1, act.shape[-1])
            gold_t = target.reshape(-1)
            # unsupervised uses weighted CE without an exclude class
            # (train_unsupervised.py:340)
            cls_excl = None if unsup else excl
            if cfg.train.weighted_ce or unsup:
                reference = last_non_padding_labels(past_label, pad)
                loss_cls, _ = weighted_cross_entropy_loss(
                    act_flat, gold_t, pad, reference, target[:, 0], cls_excl
                )
            else:
                loss_cls, _ = cross_entropy_loss(act_flat, gold_t, pad, cls_excl)
            nc, nw = accuracy_counts(act_flat, gold_t, pad, cls_excl)
            if not unsup:
                total = total + loss_cls
            metrics.update(loss_cls=loss_cls, cls_correct=nc, cls_total=nw)

            if not train:
                # the reference validate's "weighted accuracy"
                # (train_proposed_depth.py:9-26,91-95): the single uniform
                # batch weight cancels, leaving plain non-pad accuracy with
                # NO exclude idx.  The reference val DataLoader runs
                # batch_size=1 (main_utkinects.py:176), so its per-batch
                # mean is a PER-EXAMPLE mean — computed per row here so the
                # gate metric is identical for ANY of our val batch sizes
                # (a per-batch pooled mean would drift from the protocol
                # whenever examples carry different non-pad slot counts)
                pred_q = jnp.argmax(act, -1)          # [B, Q]
                nonpad_q = target != pad
                row_nc = jnp.sum((pred_q == target) & nonpad_q, axis=1)
                row_nw = jnp.sum(nonpad_q, axis=1)
                row_acc = jnp.where(
                    row_nw > 0, row_nc / jnp.maximum(row_nw, 1), 0.0
                )
                metrics["weight_acc_sum"] = jnp.sum(row_acc).astype(jnp.float32)
                metrics["weight_acc_cnt"] = jnp.asarray(
                    target.shape[0], jnp.float32
                )

            if "duration" in outputs:  # the TCN baseline has no duration head
                loss_dur = duration_loss(
                    outputs["duration"], dur * dur_mask, dur_mask
                )
                if not unsup:
                    total = total + loss_dur
                metrics.update(loss_dur=loss_dur)

        if unsup and "l3" in outputs:
            # curriculum composite (train_unsupervised.py:294-362)
            tr = cfg.train
            l3 = outputs["l3"]
            l3_flat = l3.reshape(-1, l3.shape[-1])
            q_flat = batch["query_label"].reshape(-1)
            loss_l3, l3_correct = focal_loss(
                l3_flat, q_flat, tr.l3_pad_idx, tr.l3_exclude_idx
            )
            l3_nc, l3_nw = accuracy_counts(
                l3_flat, q_flat, tr.l3_pad_idx, tr.l3_exclude_idx
            )
            if train:
                loss_supcon = temporal_cluster_loss(
                    l3, batch["seg_ids"], tr.max_segments
                )
                # correctness gate: 1.0 where both l3 and seg are right,
                # else 5.0 (train_unsupervised.py:357)
                both = l3_correct & (
                    seg_correct_mask
                    if seg_correct_mask is not None
                    else jnp.zeros_like(l3_correct)
                )
                how_much_wrong = jnp.where(both, 1.0, 5.0)
                wbar = jnp.mean(how_much_wrong)
                start, (peak, end) = 0, tr.warmup_loss_epochs
                wf = triangular_warmup(epoch, start, peak, end)
                total = (1.0 - 1.0 / wbar) * (
                    (1.0 - wf) * loss_l3 + wf * loss_supcon
                ) + (1.0 / wbar) * (loss_cls + loss_dur + loss_seg)
                metrics.update(loss_supcon=loss_supcon)
            else:
                # reference validate sums l3 + seg + cls, no duration/supcon
                # (train_unsupervised.py:147-198)
                total = loss_l3 + loss_seg + loss_cls
            metrics.update(loss_l3=loss_l3, l3_correct=l3_nc, l3_total=l3_nw)

            if train and tr.supcon_weight > 0.0 and "supcon" in outputs:
                # commented "soft label loss" (train_unsupervised.py:314-319):
                # SupCon over per-frame embeddings vs L3 labels, ramped over
                # the warmup peak; frames subsample (quadratic similarity)
                from r3d_tpu.losses import supcon_loss

                feats = outputs["supcon"].reshape(-1, outputs["supcon"].shape[-1])
                # SupCon is defined on the unit hypersphere; unnormalized
                # embeddings at tau=0.07 underflow exp() to all-zero rows
                # (0 * -inf = NaN) — the reference's commented call would
                # have hit the same
                feats = feats / jnp.maximum(
                    jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-6
                )
                labels_sc = batch["query_label"].reshape(-1)
                n_take = min(tr.supcon_samples, feats.shape[0])
                loss_sc = supcon_loss(
                    feats[:n_take, None, :], labels_sc[:n_take],
                    temperature=tr.supcon_temperature,
                )
                ramp = jnp.minimum(
                    1.0, jnp.asarray(epoch, jnp.float32) / max(tr.warmup_loss_epochs[0], 1)
                )
                total = total + tr.supcon_weight * ramp * loss_sc
                metrics.update(loss_supcon2=loss_sc)

        if "fused" in outputs and (cfg.model.erank_weight > 0.0 or cfg.model.log_erank):
            valid = (past_label != pad).astype(jnp.float32)
            if cfg.model.erank_weight > 0.0:
                loss_rank = effective_rank_loss(
                    outputs["fused"], valid, cfg.model.erank_target
                )
                total = total + cfg.model.erank_weight * loss_rank
                metrics.update(loss_erank=loss_rank)
            # the eigh costs ~0.4ms/step on v5e (measured) — the analysis
            # curve logs from the per-epoch eval step, keeping the train hot
            # loop free unless the regularizer itself is on
            if cfg.model.log_erank and (not train or cfg.model.erank_weight > 0.0):
                from r3d_tpu.ops import effective_rank

                er = effective_rank(
                    jax.lax.stop_gradient(outputs["fused"]), valid
                )
                metrics.update(erank=jnp.mean(er))

        metrics["loss"] = total
        return total, metrics

    # ------------------------------------------------------------------ rng
    def _base_key(self, seed: int):
        """Base dropout key for a fit run. TrainConfig.rng_impl selects the
        bit-generator: None keeps JAX's default threefry2x32; 'rbg' draws
        from the TPU hardware RNG (measured SLOWER at the 50salads shape —
        0.83x, see the config field note and tools/measure_r3.py). Every
        per-step key derives from this one via fold_in, so the impl
        propagates to all dropout."""
        impl = self.config.train.rng_impl
        if impl is None:
            return jax.random.PRNGKey(seed)
        return jax.random.key(seed, impl=impl)

    # ------------------------------------------------------------- train step
    def _grad_core(self, params, batch_stats, batch, step_rng, epoch,
                   frozen: bool = False):
        """Forward + losses + backward for ONE (micro)batch: returns
        (grads, metrics, new_batch_stats). Shared by the full train step
        and make_accum_step's gradient-accumulation scan. ``frozen`` selects
        the module-eval() forward of sticky-eval epochs (COMPAT #37)."""
        model, is_fusion = self._model_for(frozen), self.is_fusion

        def loss_fn(params):
            variables = {"params": params, "batch_stats": batch_stats}
            mask = batch["past_label"] == self.pad_idx
            if is_fusion:
                args = (batch["features"], batch["depth_features"], mask)
            elif self.needs_query:
                args = (batch["features"], batch.get("query_label"), mask,
                        batch.get("query_len"))
            else:
                args = (batch["features"], mask)
            # 'losses' collects per-layer aux terms sown by MoE FFNs
            # (models/moe.py); empty for dense models
            outputs, mutated = model.apply(
                variables, *args, train=True,
                rngs={"dropout": step_rng}, mutable=["batch_stats", "losses"],
            )
            total, metrics = self._losses(outputs, batch, epoch, train=True)
            moe_w = self.config.model.moe_aux_weight
            if self.config.model.moe_experts > 0 and moe_w > 0.0:
                aux = sum(
                    jnp.sum(jnp.asarray(v))
                    for v in jax.tree.leaves(mutated.get("losses", {}))
                )
                total = total + moe_w * aux
                metrics = dict(metrics, moe_aux=aux, loss=total)
            return total, (metrics, mutated.get("batch_stats", {}))

        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, metrics, new_bs

    def _train_step_core(self, state: TrainState, batch, rng, epoch,
                         frozen: bool = False):
        """One un-jitted train step: forward, losses, backward, AdamW, BN.

        Shared by make_train_step (jit) and make_multi_step (lax.scan body);
        pure so both paths are semantically identical.
        """
        # derive the per-step dropout key INSIDE the jitted step: the
        # caller passes one base key per epoch instead of host-splitting
        # every step (each host-side split is an extra dispatch)
        step_rng = jax.random.fold_in(rng, state.step)
        grads, metrics, new_bs = self._grad_core(
            state.params, state.batch_stats, batch, step_rng, epoch,
            frozen=frozen,
        )
        state = state.apply_gradients(grads, self.tx, new_batch_stats=new_bs)
        return state, metrics

    def _wants_1f1b(self) -> bool:
        from r3d_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        return (
            self.config.mesh.pp_schedule == "1f1b"
            and mesh is not None and mesh.shape.get("pp", 1) > 1
        )

    def make_train_step(self, frozen: bool = False):
        if self._wants_1f1b():
            return self.make_1f1b_train_step(frozen=frozen)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng, epoch):
            return self._train_step_core(state, batch, rng, epoch,
                                         frozen=frozen)

        return train_step

    def make_1f1b_train_step(self, frozen: bool = False):
        """Train step scheduled 1F1B over the 'pp' mesh axis
        (parallel/pipeline_1f1b.py): the batch splits into M microbatches,
        each flows through the stage-partitioned decoder, the LAST stage
        computes its per-microbatch loss and seeds the backward while later
        microbatches still stream forward — in-flight activations stay
        O(pp), not O(M).

        Semantics = ``make_accum_step`` over M microbatches (mean of
        per-microbatch losses/grads; the integration test uses it as the
        oracle); batch consumption = ONE loader batch, so state.step
        advances by 1 like the plain step.  Supported: the futr family AND
        the fusion family (pre = input embed [+ depth embed + fuser],
        stages = decoder layers, last = final norm + heads + loss) on
        dp x pp meshes.  For the fusion models the fuser runs in the pre
        stage as a ``lax.scan`` over the M microbatches with the BN
        batch_stats as carry — per-microbatch train-mode statistics and the
        sequential running-stat trajectory both match ``make_accum_step``
        exactly (the VERDICT r4 weak #5 blocker: BN stats never need to
        cross pipeline stages, because no BatchNorm lives in the decoder —
        only the pre).  Anything else raises — a requested schedule must
        never silently degrade."""
        import flax.linen as fnn

        from r3d_tpu.models.futr import Heads, InputEmbed
        from r3d_tpu.models.transformer import DecoderLayer
        from r3d_tpu.parallel.mesh import active_mesh
        from r3d_tpu.parallel.pipeline_1f1b import pipelined_value_and_grad

        mesh = active_mesh()
        cfg = self.config.model
        mc = self.config.mesh
        pp = mesh.shape["pp"]
        M = mc.pp_microbatches or pp
        B = self.config.train.batch_size

        def bail(reason: str):
            raise ValueError(
                f"pp_schedule='1f1b' requested but unsupported: {reason}. "
                "Use pp_schedule='gpipe' (the default) for this config."
            )

        fusion = self.is_fusion and cfg.model != "afft"
        if cfg.model != "futr" and not fusion:
            bail(f"model {cfg.model!r} (only the futr/fusion families have "
                 "the pre/stage/last split; afft has no decoder stack to "
                 "pipeline, the query family reads pre-decoder streams)")
        if self.config.train.loop not in ("futr", "proposed",
                                          "proposed_depth"):
            bail(f"loop {self.config.train.loop!r} (losses must live "
                 "entirely in the last stage; the unsupervised composite "
                 "reads pre-decoder streams)")
        if cfg.use_encoder or cfg.moe_experts > 0 or cfg.sow_attn:
            bail("use_encoder/moe_experts/sow_attn")
        if not cfg.pos_emb:
            bail("pos_emb=False")
        if mesh.shape.get("tp", 1) != 1 or mesh.shape.get("sp", 1) != 1 \
                or mesh.shape.get("ep", 1) != 1:
            bail("tp/sp/ep > 1 (1f1b shards pp x dp only)")
        if mc.fsdp:
            bail("fsdp (grads are assembled manually)")
        if cfg.n_decoder_layers % pp != 0:
            bail(f"{cfg.n_decoder_layers} decoder layers do not split "
                 f"into {pp} stages")
        if B % M != 0:
            bail(f"batch {B} does not divide into {M} microbatches")
        if self.config.train.grad_accum > 1 \
                or self.config.train.steps_per_dispatch > 1:
            bail("grad_accum/steps_per_dispatch > 1")

        L = cfg.n_decoder_layers
        Lps = L // pp
        dtype = jnp.dtype(cfg.compute_dtype)
        C = cfg.hidden_dim
        embed_mod = InputEmbed(cfg, self.n_class)
        heads_mod = Heads(cfg, self.n_class)
        layer_mod = DecoderLayer(
            C, cfg.n_head, C * 4, cfg.dropout, sow_attn=False, dtype=dtype
        )
        norm_mod = fnn.LayerNorm(epsilon=1e-5, dtype=dtype)
        # sticky-eval epochs (COMPAT #37) train with dropout off; futr has
        # no BatchNorm, so the frozen twin is just the deterministic forward
        use_dropout = (cfg.dropout > 0.0) and not frozen
        depth_mod = fuser_mod = None
        use_fuser_dropout = False
        if fusion:
            import dataclasses

            from r3d_tpu.models.futr_fusion import FUSERS, DepthEmbed

            # frozen twin (sticky-eval epochs): running-stat BN + dropout 0,
            # mirroring Trainer._model_for
            fcfg = (
                dataclasses.replace(cfg, fuser_dropout=0.0, frozen_stats=True)
                if frozen else cfg
            )
            depth_mod = DepthEmbed(fcfg)
            fuser_kw = dict(
                depth=fcfg.fuser_depth, n_head=fcfg.fuser_heads,
                two_token_exact=True, drop_rate=fcfg.fuser_dropout,
                use_pallas=fcfg.use_pallas, dtype=dtype,
            )
            if fcfg.model == "futr_fusion_bn":
                fuser_kw["exchange_frac"] = fcfg.fuser_exchange_frac
                fuser_kw["frozen"] = fcfg.frozen_stats
            fuser_mod = FUSERS[fcfg.model](fcfg.hidden_dim, **fuser_kw)
            use_fuser_dropout = (fcfg.fuser_dropout > 0.0) and not frozen
        Bm = B // M

        def mb(x):
            return x.reshape((M, Bm) + x.shape[1:])

        def stage_fn(local, x, cd, ca, extras, m):
            d = jax.lax.axis_index("pp")

            def one(x, p_i):
                p, li = p_i
                rngs = None
                if use_dropout:
                    k = jax.random.fold_in(extras["rng"], d * Lps + li)
                    rngs = {"dropout": jax.random.fold_in(k, m)}
                x = layer_mod.apply(
                    {"params": p}, x, cd["memory"], cd["pos"],
                    cd["query_pos"], ca["mask"], not use_dropout, None,
                    rngs=rngs,
                )
                return x, None

            x, _ = jax.lax.scan(one, x, (local, jnp.arange(Lps)))
            return x

        def last_fn(last_p, y, cd, ca, m):
            hs = norm_mod.apply({"params": last_p["norm"]}, y)
            outputs = heads_mod.apply(
                {"params": last_p["heads"]}, hs, cd["memory"]
            )
            if fusion:
                # memory IS the fused stream (futr_fusion.py:121-134) — the
                # erank regularizer/metric reads it per microbatch, exactly
                # as make_accum_step's per-microbatch forward does
                outputs["fused"] = cd["memory"].astype(jnp.float32)
            batch_m = {
                "past_label": ca["past_label"],
                "trans_future_target": ca["target"],
                "trans_future_dur": ca["dur"],
            }
            # epoch only steers the unsupervised ramp — unused by the futr
            # loop's losses (and a closed-over tracer would not cross the
            # shard_map boundary)
            return self._losses(outputs, batch_m, epoch=0, train=True)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, rng, epoch):
            params = state.params
            feats = batch["features"]
            S = feats.shape[1]
            mask = batch["past_label"] == self.pad_idx
            step_rng = jax.random.fold_in(rng, state.step)

            pre_keys = (
                ("embed", "depth_embed", "fuser", "pos_embedding",
                 "query_embed")
                if fusion else ("embed", "pos_embedding", "query_embed")
            )
            pre_params = {k: params[k] for k in pre_keys}
            bs0 = dict(state.batch_stats).get("fuser", {}) if fusion else {}
            has_stats = bool(jax.tree.leaves(bs0))
            fuser_key = jax.random.fold_in(step_rng, 997)

            def pre(p):
                src = embed_mod.apply({"params": p["embed"]}, feats)
                if not fusion:
                    # memory = src (encoder bypass)
                    new_bs = bs0
                    memory = src
                else:
                    dep = depth_mod.apply(
                        {"params": p["depth_embed"]}, batch["depth_features"]
                    )

                    def fuse_one(bs, xs):
                        s_m, d_m, mi = xs
                        rngs = (
                            {"dropout": jax.random.fold_in(fuser_key, mi)}
                            if use_fuser_dropout else None
                        )
                        if has_stats and not frozen:
                            fused_m, mut = fuser_mod.apply(
                                {"params": p["fuser"], "batch_stats": bs},
                                s_m, d_m, train=True,
                                mutable=["batch_stats"], rngs=rngs,
                            )
                            return mut["batch_stats"], fused_m
                        fused_m = fuser_mod.apply(
                            {"params": p["fuser"], "batch_stats": bs},
                            s_m, d_m, train=True, rngs=rngs,
                        )
                        return bs, fused_m

                    # per-microbatch fuser with the BN stats as scan carry:
                    # train-mode statistics AND the sequential running-stat
                    # trajectory both equal make_accum_step's (the oracle)
                    new_bs, fused_M = jax.lax.scan(
                        fuse_one, bs0,
                        (mb(src), mb(dep), jnp.arange(M)),
                    )
                    memory = fused_M.reshape((B,) + fused_M.shape[2:])
                pos = jnp.broadcast_to(
                    p["pos_embedding"][:, :S].astype(src.dtype), (B, S, C)
                )
                query_pos = jnp.broadcast_to(
                    p["query_embed"][None].astype(src.dtype),
                    (B, cfg.n_query, C),
                )
                return (memory, pos, query_pos), new_bs

            (memory, pos, query_pos), pre_vjp, new_fuser_bs = jax.vjp(
                pre, pre_params, has_aux=True
            )

            inject = jnp.zeros((M, Bm, cfg.n_query, C), dtype)
            cdiff = {
                "memory": mb(memory), "pos": mb(pos),
                "query_pos": mb(query_pos),
            }
            caux = {
                "mask": mb(mask),
                "past_label": mb(batch["past_label"]),
                "target": mb(batch["trans_future_target"]),
                "dur": mb(batch["trans_future_dur"]),
            }
            extras = {"rng": step_rng} if use_dropout else {}

            dec = params["transformer"]["decoder"]
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[dec[f"layer{i}"] for i in range(L)],
            )
            # pin the stack to P('pp') so GSPMD doesn't replicate-and-
            # repartition the concatenate every step (tp/sp/ep are guarded
            # to 1 on this path, so trailing axes replicate)
            from jax.sharding import NamedSharding, PartitionSpec as PSpec

            pp_sh = NamedSharding(mesh, PSpec("pp"))
            stacked = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, pp_sh), stacked
            )
            last_p = {"norm": dec["norm"], "heads": params["heads"]}

            loss_sum, metric_sums, g_stacked, g_last, _d_inject, d_cdiff = (
                pipelined_value_and_grad(
                    stage_fn, last_fn, stacked, last_p, inject, cdiff,
                    caux, extras, mesh, M,
                )
            )
            # _d_inject is the cotangent of the constant zeros tgt — dropped

            def unmb(x):
                return x.reshape((B,) + x.shape[2:])

            (d_pre,) = pre_vjp((
                unmb(d_cdiff["memory"]).astype(memory.dtype),
                unmb(d_cdiff["pos"]).astype(pos.dtype),
                unmb(d_cdiff["query_pos"]).astype(query_pos.dtype),
            ))

            grads = dict(
                {k: d_pre[k] for k in pre_keys},
                transformer={"decoder": dict(
                    {f"layer{i}": jax.tree.map(lambda a, i=i: a[i],
                                               g_stacked)
                     for i in range(L)},
                    norm=g_last["norm"],
                )},
                heads=g_last["heads"],
            )
            grads = jax.tree.map(lambda g: (g / M).astype(jnp.float32),
                                 grads)
            metrics = jax.tree.map(lambda s: s / M, metric_sums)
            new_stats = (
                {**dict(state.batch_stats), "fuser": new_fuser_bs}
                if (fusion and has_stats and not frozen)
                else state.batch_stats
            )
            state = state.apply_gradients(
                grads, self.tx, new_batch_stats=new_stats
            )
            return state, metrics

        return train_step

    def make_multi_step(self, frozen: bool = False):
        """One dispatch = K sequential train steps via lax.scan.

        Takes a STACKED batch (every leaf [K, ...]) and runs the exact
        single-step computation K times on device, returning the final state
        and the per-metric SUM over the K steps. Amortizes per-step host
        dispatch latency — the dominant cost of small steps through a remote
        TPU — while staying bit-identical to K make_train_step() calls (the
        per-step dropout key folds state.step, which the scan increments).
        The reference has no equivalent (its DataLoader feeds one step per
        Python iteration, train/train_proposed_depth.py:127).
        """

        @functools.partial(jax.jit, donate_argnums=(0,))
        def multi_step(state: TrainState, stacked_batch, rng, epoch):
            def body(state, batch):
                return self._train_step_core(state, batch, rng, epoch,
                                             frozen=frozen)

            state, per_step = jax.lax.scan(body, state, stacked_batch)
            return state, jax.tree.map(lambda m: jnp.sum(m, axis=0), per_step)

        return multi_step

    def make_accum_step(self, frozen: bool = False):
        """One optimizer update from the MEAN gradient over K stacked
        microbatches (TrainConfig.grad_accum): train at an effective batch
        of K x batch_size with the activation footprint of one microbatch.

        The reference has no equivalent (one backward = one optimizer step,
        train/train_proposed_depth.py:150-156). Semantics: gradients
        average with equal microbatch weighting; BN running stats update
        sequentially per microbatch (exactly K small forwards); the
        dropout key folds the microbatch index so masks decorrelate;
        metrics return as the mean over microbatches. state.step advances
        by K — it counts CONSUMED LOADER BATCHES on every path, so the
        pl_bolts schedule's epoch arithmetic (optim.py: epoch =
        step // steps_per_epoch) and --resume's epoch reconstruction
        (cli/run.py) stay correct without accumulation-awareness
        (review finding: advancing once per update starved the warmup at
        lr=0 for the first K epochs and broke resume).
        """

        @functools.partial(jax.jit, donate_argnums=(0,))
        def accum_step(state: TrainState, stacked_batch, rng, epoch):
            K = jax.tree.leaves(stacked_batch)[0].shape[0]
            base = jax.random.fold_in(rng, state.step)

            def body(carry, xs):
                bs, gsum = carry
                i, batch = xs
                g, m, new_bs = self._grad_core(
                    state.params, bs, batch,
                    jax.random.fold_in(base, i), epoch, frozen=frozen,
                )
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (new_bs, gsum), m

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (new_bs, gsum), per = jax.lax.scan(
                body, (state.batch_stats, zeros),
                (jnp.arange(K), stacked_batch),
            )
            grads = jax.tree.map(lambda g: g / K, gsum)
            state = state.apply_gradients(
                grads, self.tx, new_batch_stats=new_bs
            )
            state = state.replace(step=state.step + (K - 1))
            return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), per)

        return accum_step

    def make_cached_train_fn(self, cache, frozen: bool = False):
        """Train steps that ASSEMBLE their batches on device from a
        DeviceCache (data/device_cache.py): the host sends only a tiny
        [K, B] int32 view-index table per dispatch — no batch H2D at all.
        ``S`` (the bucket length) is static per compilation, mirroring the
        host loader's bucketed shapes."""
        from r3d_tpu.data import device_cache as dc

        sample_rate = cache.sample_rate
        pad_idx = cache.pad_idx
        query_pad_idx = cache.query_pad_idx

        unsup = self.config.train.loop == "unsupervised"
        max_segments = self.config.train.max_segments

        @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0,))
        def cached_multi_step(state, data, idx, rng, S, epoch):
            def body(st, ids):
                batch = dc.assemble(
                    data, ids, S, sample_rate, pad_idx, query_pad_idx
                )
                if unsup:
                    # the host loop derives seg_ids per batch on host
                    # (fit.host_batches); here the jnp twin runs in-step
                    from r3d_tpu.losses.temporal import (
                        segment_ids_from_labels_jnp,
                    )

                    batch["seg_ids"] = segment_ids_from_labels_jnp(
                        batch["query_label"], max_segments
                    )
                return self._train_step_core(st, batch, rng, epoch,
                                             frozen=frozen)

            state, per_step = jax.lax.scan(body, state, idx)
            return state, jax.tree.map(lambda m: jnp.sum(m, axis=0), per_step)

        return cached_multi_step

    def make_cached_eval_fn(self, cache):
        """Scanned eval steps over a DeviceCache index table (validation
        counterpart of make_cached_train_fn); metrics return pre-summed."""
        from r3d_tpu.data import device_cache as dc

        sample_rate = cache.sample_rate
        pad_idx = cache.pad_idx
        query_pad_idx = cache.query_pad_idx
        eval_step = self.make_eval_step()

        @functools.partial(jax.jit, static_argnums=(3,))
        def cached_eval(state, data, idx, S):
            def body(_, ids):
                batch = dc.assemble(
                    data, ids, S, sample_rate, pad_idx, query_pad_idx
                )
                return None, eval_step(state, batch)

            _, per_step = jax.lax.scan(body, None, idx)
            return jax.tree.map(lambda m: jnp.sum(m, axis=0), per_step)

        return cached_eval

    def make_eval_step(self):
        model, is_fusion = self.model, self.is_fusion

        @jax.jit
        def eval_step(state: TrainState, batch):
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            # reference validate runs the test-mode forward: no pad masks, BN
            # running stats, no dropout (train_proposed_depth.py:52-108;
            # see COMPAT.md on the reference's tuple-input crash there)
            if is_fusion:
                args = (batch["features"], batch["depth_features"], None)
            elif self.needs_query:
                args = (batch["features"], batch.get("query_label"), None,
                        batch.get("query_len"))
            else:
                args = (batch["features"], None)
            outputs = model.apply(variables, *args, train=False)
            _, metrics = self._losses(outputs, batch, train=False)
            return metrics

        return eval_step

    # ------------------------------------------------------------ outer loop
    def fit(
        self,
        state: TrainState,
        train_loader,
        val_loader,
        seed: int,
        checkpointer=None,
        log=print,
        metrics_logger=None,
        start_epoch: int = 0,
    ) -> TrainState:
        cfg = self.config.train
        eval_step = self.make_eval_step()
        accum = max(1, cfg.grad_accum)
        if accum > 1 and cfg.steps_per_dispatch > 1:
            raise ValueError(
                "grad_accum and steps_per_dispatch are mutually exclusive: "
                "one stacks microbatches per UPDATE, the other updates per "
                "scanned step"
            )
        K = accum if accum > 1 else max(1, cfg.steps_per_dispatch)
        # steps build lazily PER sticky-eval phase (epoch 0 trains in train
        # mode; sticky loops train epochs >= 1 with the eval-mode forward)
        _steps: Dict[bool, tuple] = {}

        def step_fns(epoch):
            fz = self._sticky(epoch)
            if fz not in _steps:
                _steps[fz] = (
                    self.make_train_step(frozen=fz),
                    self.make_accum_step(frozen=fz) if accum > 1
                    else self.make_multi_step(frozen=fz) if K > 1 else None,
                )
            return _steps[fz]

        rng = jax.random.fold_in(self._base_key(seed), start_epoch)

        def host_batches(loader):
            """min-batch filter + host-side extras (seg_ids)."""
            for batch in loader:
                if batch["features"].shape[0] < cfg.min_train_batch:
                    continue  # BN guard (train_proposed_depth.py:148)
                if self.config.train.loop == "unsupervised":
                    from r3d_tpu.losses.temporal import segment_ids_from_labels

                    batch = dict(batch)
                    batch["seg_ids"] = segment_ids_from_labels(
                        batch["query_label"], None,
                        self.config.train.max_segments,
                    )
                yield batch

        def dispatch_groups(gen):
            """Group consecutive same-shape batches into stacks of K for
            make_multi_step; partial/odd-shaped groups fall back to single
            steps. Yields (n_steps, batch): n_steps > 1 means a stacked
            batch with leading axis n_steps."""
            if K == 1:
                for b in gen:
                    yield 1, b
                return
            buf, sig = [], None

            def flush():
                if len(buf) == K:
                    yield K, {
                        key: np.stack([b[key] for b in buf]) for key in buf[0]
                    }
                else:
                    for b in buf:
                        yield 1, b
                buf.clear()

            for b in gen:
                s = {key: np.shape(v) for key, v in b.items()}
                if buf and s != sig:
                    yield from flush()
                sig = s
                buf.append(b)
                if len(buf) == K:
                    yield from flush()
            yield from flush()

        def device_prefetch(gen):
            """Land the NEXT batch on device while the current step runs —
            overlaps H2D with compute (the reference's DataLoader only
            overlaps host work)."""
            sharding = stacked_sharding = None
            sp = 1
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from r3d_tpu.parallel.mesh import batch_sharding

                sharding = batch_sharding(self.mesh)
                # stacked batches [K, B, ...]: dp shards the BATCH axis (1)
                stacked_sharding = NamedSharding(self.mesh, P(None, "dp"))
                sp = self.mesh.shape.get("sp", 1)
                dp_ax = "dp" if self.mesh.shape.get("dp", 1) > 1 else None

            def put_batch(batch, n_steps):
                if sharding is None:
                    return {k: jnp.asarray(v) for k, v in batch.items()}
                # sp meshes additionally split every sequence-length axis
                # (features/depth/past_label share the bucket length S)
                ax = 1 if n_steps == 1 else 2
                feats = batch.get("features")
                S = (
                    feats.shape[ax]
                    if feats is not None and feats.ndim > ax else -1
                )
                # a remainder batch smaller than the dp extent can't split
                # over dp — replicate its batch axis (it compiles its own
                # program for the new B anyway)
                b_ax = ax - 1
                B = feats.shape[b_ax] if feats is not None else 0
                dp = self.mesh.shape.get("dp", 1)
                dp_batch = dp_ax if B % max(dp, 1) == 0 else None
                batch_sh = (
                    sharding if n_steps == 1 else stacked_sharding
                ) if dp_batch is not None else NamedSharding(
                    self.mesh, P() if n_steps == 1 else P(None)
                )
                out = {}
                for k, v in batch.items():
                    sh = batch_sh
                    if (
                        sp > 1 and hasattr(v, "ndim") and v.ndim > ax
                        and v.shape[ax] == S and S % sp == 0
                    ):
                        spec = (
                            P(dp_batch, "sp") if n_steps == 1
                            else P(None, dp_batch, "sp")
                        )
                        sh = NamedSharding(self.mesh, spec)
                    out[k] = jax.device_put(v, sh)
                return out

            prev = None
            for n_steps, batch in gen:
                nxt = (n_steps, put_batch(batch, n_steps))
                if prev is not None:
                    yield prev
                prev = nxt
            if prev is not None:
                yield prev

        best = (0.0, 0.0)
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            # metrics accumulate ON DEVICE: float() per step would block the
            # async dispatch pipeline (one host sync per epoch instead)
            agg_dev: Dict[str, jnp.ndarray] = {}
            n_batches = 0
            n_clips = 0
            epoch_rng = jax.random.fold_in(rng, epoch)
            train_step, multi_step = step_fns(epoch)
            for n_steps, batch in device_prefetch(
                dispatch_groups(host_batches(train_loader))
            ):
                if n_steps > 1:
                    # one dispatch: either n_steps scanned train steps
                    # (metrics pre-summed) or ONE grad-accumulated update
                    # over n_steps microbatches (metrics pre-meaned)
                    state, metrics = multi_step(state, batch, epoch_rng, epoch)
                    n_clips += batch["features"].shape[0] * batch["features"].shape[1]
                    n_batches += 1 if accum > 1 else n_steps
                else:
                    state, metrics = train_step(state, batch, epoch_rng, epoch)
                    n_clips += batch["features"].shape[0]
                    n_batches += 1
                for k, v in metrics.items():
                    agg_dev[k] = agg_dev.get(k, 0.0) + v

            agg = {k: float(v) for k, v in agg_dev.items()}  # one sync
            best = self._finish_epoch(
                state, epoch, seed, agg, n_batches, n_clips,
                time.time() - t0,
                lambda st: self._validate(st, eval_step, val_loader,
                                          device_prefetch),
                best, log, metrics_logger, checkpointer,
            )

        return state

    def _finish_epoch(self, state, epoch, seed, agg, n_batches, n_clips, dt,
                      validate, best, log, metrics_logger, checkpointer):
        """Shared epoch tail of fit/fit_cached/fit_hybrid: train log line,
        validation (caller closure -> (metrics, n_batches)), metrics record,
        and the reference's best/last checkpoint rule.  Returns the updated
        (best_val_acc, best_weight_acc)."""
        cfg = self.config.train
        best_val_acc, best_weight_acc = best
        loss = agg.get("loss", 0.0) / max(n_batches, 1)
        acc = agg.get("cls_correct", 0.0) / max(agg.get("cls_total", 0.0), 1.0)
        log(
            f"Epoch [{epoch + 1}/{cfg.epochs}] Loss : {loss:.3f} "
            f"Acc : {acc:.3f} ({n_clips / max(dt, 1e-9):.1f} clips/s)"
        )

        # validation (per epoch, as every reference loop does)
        vagg, vb = validate(state)
        val_acc = vagg.get("cls_correct", 0.0) / max(vagg.get("cls_total", 0.0), 1.0)
        val_loss = vagg.get("loss", 0.0) / max(vb, 1)
        # the reference's "weighted accuracy" — no exclude idx, mean of
        # PER-EXAMPLE accuracies (its val loader is batch_size=1,
        # main_utkinects.py:176 + train_proposed_depth.py:91-95,106);
        # distinct from val_acc in general
        weight_acc = vagg.get("weight_acc_sum", 0.0) / max(
            vagg.get("weight_acc_cnt", 0.0), 1.0
        )
        log(
            f"Validation Loss: {val_loss:.3f}, Class Accuracy: {val_acc:.3f}, "
            f"Weighted Accuracy: {weight_acc:.3f}"
        )
        if metrics_logger is not None:
            rec = {f"train_{k}": v / max(n_batches, 1) for k, v in agg.items()}
            rec.update(
                epoch=epoch, seed=seed, train_acc=acc, val_loss=val_loss,
                val_acc=val_acc, val_weight_acc=weight_acc,
                clips_per_sec=n_clips / max(dt, 1e-9),
            )
            if "erank" in vagg:  # the paper's analysis curve, per epoch
                rec["val_erank"] = vagg["erank"] / max(vb, 1)
            metrics_logger.log(rec, step=int(state.step))

        # best-ckpt rule per reference loop family: train.py:63 and
        # train_tcn.py:44 gate on accuracy alone; proposed/unimodal/
        # unsupervised OR the two metrics and OVERWRITE both bests on
        # improvement (train_proposed_depth.py:237-241 — best_val_acc
        # can go DOWN when only weight_acc improved)
        two_metric = cfg.loop not in ("futr", "tcn")
        if val_acc > best_val_acc or (
            two_metric and weight_acc > best_weight_acc
        ):
            best_val_acc = val_acc
            best_weight_acc = weight_acc
            if checkpointer is not None:
                checkpointer.save_best(state, seed=seed, epoch=epoch)
                log(f"Best model saved (val acc {val_acc:.3f})")
        if checkpointer is not None:
            checkpointer.save_last(state, seed=seed)
        return best_val_acc, best_weight_acc

    def _validate(self, state, eval_step, val_loader, device_prefetch=None):
        """One pass over val_loader with device-side metric accumulation;
        returns (float metrics dict, n_batches)."""
        gen = ((1, b) for b in val_loader)
        if device_prefetch is not None:
            gen = device_prefetch(gen)
        vagg_dev: Dict[str, jnp.ndarray] = {}
        vb = 0
        for _, batch in gen:
            if device_prefetch is None:
                batch = jax.tree.map(jnp.asarray, batch)
            metrics = eval_step(state, batch)
            vb += 1
            for k, v in metrics.items():
                vagg_dev[k] = vagg_dev.get(k, 0.0) + v
        return {k: float(v) for k, v in vagg_dev.items()}, vb

    @staticmethod
    def _group_same_shape(plan, K: int):
        """Group consecutive same-(bucket, batch-size) plan entries into
        stacks of EXACTLY K, leftovers as singles: [((S, B), [idx...]), ...].

        Same rule as fit()'s dispatch_groups: a variable stack height would
        compile one scan program per distinct k — up to K x buckets programs
        at 2-5 min tunnel compile each; exactly-K-or-1 bounds it at two
        shapes per (S, B)."""
        groups: list = []
        run: list = []
        sig = None

        def flush():
            while len(run) >= K:
                groups.append((sig, run[:K]))
                del run[:K]
            groups.extend((sig, [idx]) for idx in run)
            run.clear()

        for S, idx in plan:
            s = (S, len(idx))
            if run and s != sig:
                flush()
            sig = s
            run.append(idx)
        if run:
            flush()
        return groups

    def fit_cached(
        self,
        state: TrainState,
        cache,
        val_loader,
        seed: int,
        checkpointer=None,
        log=print,
        metrics_logger=None,
        start_epoch: int = 0,
        val_cache=None,
    ) -> TrainState:
        """fit() against a DeviceCache: the whole train set lives in HBM and
        each dispatch scans up to ``steps_per_dispatch`` train steps whose
        batches are gathered ON DEVICE (make_cached_train_fn).  Per epoch the
        host ships only shuffled [K, B] int32 index tables — with one bucket
        and K >= steps/epoch, an entire epoch is a single dispatch.  Loop
        semantics (bucket padding, dropout keys, metric aggregation, the
        best-checkpoint rule) match fit(); step equivalence is tested in
        tests/test_device_cache.py."""
        from r3d_tpu.data.device_cache import epoch_plan

        cfg = self.config.train
        _steps: Dict[bool, object] = {}

        def step_fn_for(epoch):
            fz = self._sticky(epoch)
            if fz not in _steps:
                _steps[fz] = self.make_cached_train_fn(cache, frozen=fz)
            return _steps[fz]

        eval_step = self.make_eval_step()
        K = max(1, cfg.steps_per_dispatch)
        rng = jax.random.fold_in(self._base_key(seed), start_epoch)
        data = cache.data
        idx_sharding = None
        if self.mesh is not None:
            # dp mesh: the dataset replicates (it is small — that's why it
            # fits in HBM), the [K, B] index tables shard over dp, and the
            # in-step gather yields a dp-sharded batch with no collectives
            # (tests/test_sharding.py::test_sharded_cached_steps...)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            data = jax.tree.map(lambda x: jax.device_put(x, rep), data)
            idx_sharding = NamedSharding(self.mesh, P(None, "dp"))
        cached_eval = val_data = None
        if val_cache is not None:
            # validation from HBM too: the val set assembles on device the
            # same way (host loader validation was the last per-epoch H2D)
            cached_eval = self.make_cached_eval_fn(val_cache)
            val_data = val_cache.data
            if self.mesh is not None:
                val_data = jax.tree.map(
                    lambda x: jax.device_put(x, rep), val_data
                )

        def validate(st):
            if cached_eval is None:
                return self._validate(st, eval_step, val_loader)
            vagg_dev: Dict[str, jnp.ndarray] = {}
            vb = 0
            vplan = epoch_plan(
                val_cache, cfg.val_batch_size or cfg.batch_size, 0, 0,
                shuffle=False, drop_remainder=False,
            )
            for (S, _B), idxs in self._group_same_shape(vplan, K):
                vm = cached_eval(st, val_data, jnp.asarray(np.stack(idxs)), S)
                vb += len(idxs)
                for k, v in vm.items():
                    vagg_dev[k] = vagg_dev.get(k, 0.0) + v
            return {k: float(v) for k, v in vagg_dev.items()}, vb

        best = (0.0, 0.0)
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            plan = [
                (S, idx)
                for S, idx in epoch_plan(
                    cache, cfg.batch_size, seed, epoch, drop_remainder=False
                )
                if len(idx) >= cfg.min_train_batch
            ]
            groups = self._group_same_shape(plan, K)

            agg_dev: Dict[str, jnp.ndarray] = {}
            n_batches = 0
            n_clips = 0
            epoch_rng = jax.random.fold_in(rng, epoch)
            step_fn = step_fn_for(epoch)
            for (S, B), idxs in groups:
                stacked = np.stack(idxs)                       # [k, B]
                if (
                    idx_sharding is not None
                    and B % self.mesh.shape["dp"] == 0
                ):
                    stacked = jax.device_put(stacked, idx_sharding)
                else:
                    stacked = jnp.asarray(stacked)
                state, metrics = step_fn(
                    state, data, stacked, epoch_rng, S, epoch
                )
                n_batches += len(idxs)
                n_clips += len(idxs) * B
                for k, v in metrics.items():
                    agg_dev[k] = agg_dev.get(k, 0.0) + v

            agg = {k: float(v) for k, v in agg_dev.items()}  # one sync
            best = self._finish_epoch(
                state, epoch, seed, agg, n_batches, n_clips,
                time.time() - t0, validate, best, log, metrics_logger,
                checkpointer,
            )
        return state

    def make_hybrid_train_fn(self, hybrid, frozen: bool = False):
        """Train step over a HybridCache batch: the batch's device-resident
        rows assemble via the cached gather while its host rows arrive as a
        compacted [Bh, ...] buffer and scatter into their batch positions —
        the assembled batch is bit-identical to the host collate's
        (tests/test_hybrid_cache.py), the per-step H2D shrinks by the cached
        fraction."""
        from r3d_tpu.data import device_cache as dc

        cache = hybrid.cache
        sample_rate = cache.sample_rate
        pad_idx = cache.pad_idx
        query_pad_idx = cache.query_pad_idx
        unsup = self.config.train.loop == "unsupervised"
        max_segments = self.config.train.max_segments

        # pad constants for extending a host row from its own bucket Sh to
        # the batch bucket S on device — identical to pad_batch's
        # (data/pipeline.py: features/depth 0, labels pad_idx, int query
        # streams query_pad_idx), so the assembled batch stays bit-equal to
        # the host collate at S
        s_axis_pad = {
            "features": 0, "depth_features": 0, "past_label": pad_idx,
            "query_label": (
                pad_idx if query_pad_idx is None else query_pad_idx
            ),
        }

        @functools.partial(jax.jit, static_argnums=(5,), donate_argnums=(0,))
        def hybrid_step(state, data, view_ids, host_pos, host_part, S, rng,
                        epoch):
            batch = dc.assemble(
                data, view_ids, S, sample_rate, pad_idx, query_pad_idx
            )
            for k, v in host_part.items():
                if k in s_axis_pad and v.shape[1] < S:
                    # the host part ships at ITS OWN bucket (host rows can
                    # be far shorter than the batch's cached rows — fewer
                    # H2D bytes); extend to S here with pad_batch's values
                    v = jnp.pad(
                        v,
                        ((0, 0), (0, S - v.shape[1]))
                        + ((0, 0),) * (v.ndim - 2),
                        constant_values=s_axis_pad[k],
                    )
                # duplicate positions (power-of-two padding repeats the last
                # host row) write identical values — deterministic scatter
                batch[k] = batch[k].at[host_pos].set(v.astype(batch[k].dtype))
            if unsup:
                from r3d_tpu.losses.temporal import (
                    segment_ids_from_labels_jnp,
                )

                batch["seg_ids"] = segment_ids_from_labels_jnp(
                    batch["query_label"], max_segments
                )
            return self._train_step_core(state, batch, rng, epoch,
                                         frozen=frozen)

        return hybrid_step

    def fit_hybrid(
        self,
        state: TrainState,
        hybrid,
        val_loader,
        seed: int,
        checkpointer=None,
        log=print,
        metrics_logger=None,
        start_epoch: int = 0,
        val_cache=None,
    ) -> TrainState:
        """fit() for datasets OVER the HBM budget (data/device_cache.py:
        HybridCache): units that fit stay device-resident, the rest stream
        through the host collate — while every batch keeps fit()'s exact
        global-shuffle composition, so the trajectory is bit-equal to fit()
        (tests/test_hybrid_cache.py).  Per batch the host ships only the
        compacted host rows (count padded to the next power of two to bound
        compile shapes) plus two small int32 vectors.  steps_per_dispatch
        does not apply (batches differ in host-row count).  On a dp mesh
        the dataset and the compacted host parts replicate while the [B]
        view-id vector shards over dp — the host-row scatter writes into
        the dp-sharded assembled batch under GSPMD
        (tests/test_hybrid_cache.py mesh arms)."""
        from r3d_tpu.data.device_cache import epoch_plan, hybrid_epoch_plan
        from r3d_tpu.data.pipeline import bucket_length, pad_batch

        cfg = self.config.train
        cache = hybrid.cache
        _steps: Dict[bool, object] = {}

        def step_fn_for(epoch):
            fz = self._sticky(epoch)
            if fz not in _steps:
                _steps[fz] = self.make_hybrid_train_fn(hybrid, frozen=fz)
            return _steps[fz]

        eval_step = self.make_eval_step()
        rng = jax.random.fold_in(self._base_key(seed), start_epoch)
        data = cache.data
        cached_id = hybrid.view_cached_id
        vid_sharding = rep_sharding = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep_sharding = NamedSharding(self.mesh, P())
            data = jax.tree.map(
                lambda x: jax.device_put(x, rep_sharding), data
            )
            vid_sharding = NamedSharding(self.mesh, P("dp"))
        cached_eval = val_data = None
        if val_cache is not None:
            cached_eval = self.make_cached_eval_fn(val_cache)
            val_data = val_cache.data
            if rep_sharding is not None:
                val_data = jax.tree.map(
                    lambda x: jax.device_put(x, rep_sharding), val_data
                )

        def validate(st):
            if cached_eval is None:
                return self._validate(st, eval_step, val_loader)
            vagg_dev: Dict[str, jnp.ndarray] = {}
            vb = 0
            vplan = epoch_plan(
                val_cache, cfg.val_batch_size or cfg.batch_size, 0, 0,
                shuffle=False, drop_remainder=False,
            )
            for (S, _B), idxs in self._group_same_shape(vplan, 1):
                vm = cached_eval(st, val_data, jnp.asarray(np.stack(idxs)), S)
                vb += len(idxs)
                for k, v in vm.items():
                    vagg_dev[k] = vagg_dev.get(k, 0.0) + v
            return {k: float(v) for k, v in vagg_dev.items()}, vb

        best = (0.0, 0.0)
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            agg_dev: Dict[str, jnp.ndarray] = {}
            n_batches = 0
            n_clips = 0
            epoch_rng = jax.random.fold_in(rng, epoch)
            step_fn = step_fn_for(epoch)
            for chunk in hybrid_epoch_plan(
                hybrid, cfg.batch_size, seed, epoch
            ):
                if len(chunk) < cfg.min_train_batch:
                    continue  # BN guard, as fit()'s host_batches
                host_sel = np.where(cached_id[chunk] < 0)[0]
                examples = [
                    hybrid.host_example(int(chunk[i])) for i in host_sel
                ]
                nrows = [
                    int(cache.nrows_host[cached_id[g]])
                    for g in chunk if cached_id[g] >= 0
                ] + [len(e.features) for e in examples]
                S = bucket_length(max(nrows), cache.buckets)
                view_ids = np.where(
                    cached_id[chunk] >= 0, cached_id[chunk], 0
                ).astype(np.int32)
                if examples:
                    # the host part pads to its OWN bucket (<= the batch
                    # bucket S): when the resident set holds the long videos
                    # the host rows are short and the H2D shrinks with them;
                    # hybrid_step extends rows to S on device
                    Sh = bucket_length(
                        max(len(e.features) for e in examples), cache.buckets
                    )
                    part = pad_batch(
                        examples, cache.pad_idx, (Sh,), cache.n_query,
                        with_depth=hybrid.with_depth,
                        with_query=hybrid.with_query,
                        feature_dtype=cache.feature_dtype,
                        query_pad_idx=cache.query_pad_idx,
                    )
                    pos = host_sel.astype(np.int32)
                    Bh = len(examples)
                    Bp = 1 << (Bh - 1).bit_length()
                    if Bp != Bh:  # pad to pow2: one compile shape per size
                        reps = Bp - Bh
                        part = {
                            k: np.concatenate(
                                [v, np.repeat(v[-1:], reps, axis=0)]
                            )
                            for k, v in part.items()
                        }
                        pos = np.concatenate([pos, np.repeat(pos[-1:], reps)])
                else:
                    part = {}
                    pos = np.zeros((0,), np.int32)
                vids = jnp.asarray(view_ids)
                posj = jnp.asarray(pos)
                partj = jax.tree.map(jnp.asarray, part)
                if (
                    vid_sharding is not None
                    and len(view_ids) % self.mesh.shape["dp"] == 0
                ):
                    # view ids shard over dp; the compacted host rows and
                    # their scatter positions replicate (they target
                    # arbitrary batch positions across shards)
                    vids = jax.device_put(vids, vid_sharding)
                    posj = jax.device_put(posj, rep_sharding)
                    partj = jax.tree.map(
                        lambda x: jax.device_put(x, rep_sharding), partj
                    )
                state, metrics = step_fn(
                    state, data, vids, posj, partj, int(S), epoch_rng, epoch,
                )
                n_batches += 1
                n_clips += len(chunk)
                for k, v in metrics.items():
                    agg_dev[k] = agg_dev.get(k, 0.0) + v

            agg = {k: float(v) for k, v in agg_dev.items()}  # one sync
            best = self._finish_epoch(
                state, epoch, seed, agg, n_batches, n_clips,
                time.time() - t0, validate, best, log, metrics_logger,
                checkpointer,
            )
        return state
