"""Config system.

The reference selects (dataset, model, train-loop, predict-fn) combinations by
comment-toggling imports inside each ``main_*.py`` (reference
main_utkinects.py:17-43) and per-dataset argparse blocks (reference
opts.py:18-69).  Here every toggle is a first-class enum/dataclass field and
each reference entry point becomes one named config in ``CONFIGS``.

Canonical hyperparameters come from reference opts.py:72-103 and
scripts/50s_train.sh / scripts/bf_train.sh.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset protocol knobs (reference data/basedataset*.py)."""

    dataset: str = "utkinects"          # breakfast|50salads|darai|utkinects|nturgbd|synthetic
    data_root: str = "./datasets"
    mapping_file: str = "mapping_l2_changed.txt"
    features_dir: str = "features_img"
    depth_features_dir: Optional[str] = "features_depth"  # None => RGB-only
    gt_dir: str = "groundTruth"
    splits_dir: str = "splits"
    split: str = "1"
    # split file templates: utk/darai/ntu use train_split.txt/val_split.txt
    # (main_utkinects.py:89-94); breakfast/50salads use
    # train.split{split}.bundle/test.split{split}.bundle (main.py:62-73)
    train_split: str = "train_split.txt"
    val_split: str = "val_split.txt"
    # csv ground-truth files carry "img,L2,L3" rows (basedataset_utkinects.py:96-102);
    # plain files carry one label per line (basedataset.py:57).
    gt_format: str = "csv"              # csv|plain
    # breakfast/50salads feature files are stored [C, S] and transposed at
    # load (basedataset.py:53-54); utk/ntu/darai are frame-major already.
    features_transposed: bool = False
    # 50salads proposed path: targets are L1 activities derived from the L2
    # gt via ACTION_MAPPING; the raw L2 stream becomes the query
    # (basedataset_proposed_50salads.py:10-66,118,132-134)
    l1_relabel: bool = False
    # proposed-breakfast (basedataset_proposed_breakfast.py:60-66): the gt
    # file CONTENT becomes the fine-grained query stream, and the per-frame
    # TARGET is the coarse activity parsed from the FILENAME
    # (basename.split('_')[-1], e.g. P03_cereals.txt -> 'cereals').
    label_from_filename: bool = False
    query_mapping_file: Optional[str] = None  # e.g. mapping_l2.txt / mapping_l3_changed.txt
    sample_rate: int = 1                # opts.py:82-85 (bf 3, 50salads 6, darai 15, utk/ntu 1)
    # Train-time observation-ratio replication (basedataset.py:28-32 vs
    # basedataset_utkinects.py:31-42).
    train_obs_percs: Tuple[float, ...] = (0.4, 0.45, 0.2, 0.25, 0.3, 0.35, 0.5, 0.55, 0.6, 0.65)
    pred_perc: float = 0.5              # future horizon (basedataset.py:60)
    # LLM-labeled darai loaders bound the future window to n_query
    # transcript samples instead of pred_perc*vid_len: the slice takes
    # ``future_frames * sample_rate`` gt frames after the observed prefix
    # (basedataset_darai_llm.py:428, basedataset_darai_llm_train.py). None
    # keeps the pred_perc window.
    future_frames: Optional[int] = None
    # Bucketed static shapes for XLA. Sequences pad up to the smallest bucket.
    seq_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2000)
    depth_shape: Tuple[int, int] = (160, 120)  # utk (futr_safuser_batchnormalization.py:154)
    # Whole-stack depth min-max to [0,255] uint8 at load. The reference
    # DEFINES this for NTU (basedataset_nturgbd.py:42-52) but comments the
    # call out at the load site (:148) — so it defaults OFF everywhere and
    # exists as the documented-intent knob.
    normalize_depth: bool = False
    # Static padded length of the gaze query stream (raw gaze sample counts
    # are unrelated to the frame buckets); None = largest seq bucket.
    # Overlong streams truncate (documented in COMPAT #31).
    gaze_pad_len: Optional[int] = None
    # gaze modality (basedataset_darai_gaze.py:95-186): per-video gaze CSVs
    # under this dir become the [N, 2] query stream
    gaze_dir: Optional[str] = None
    # DARai multi-sequence on-disk layout (basedataset_darai_depth.py:44-82):
    # each split entry is a video whose sequences live as {base}_{seq}.txt /
    # {base}_{seq}.npy, walked from seq=1 until a file is missing or the gt
    # has <= sample_rate lines. The depth stream is the single {base}_1.npy
    # (seq-independent), window-aligned to the gt's image indices
    # (basedataset_darai_depth.py:105-113).
    multi_sequence: bool = False
    # camera->depth directory rewrite applied to depth paths
    # (basedataset_darai_depth.py:47-50,95-98)
    depth_dir_rewrite: Tuple[Tuple[str, str], ...] = (
        ("camera_1_fps_15", "depth_1"),
        ("camera_2_fps_15", "depth_2"),
    )
    # raw-frame ablation (basedataset_utkinects_raw.py:80-104): features_dir
    # holds one FOLDER of numbered .jpg frames per video (resized to
    # raw_frame_wh, /255), depth_features_dir one folder of Kinect XMLs.
    raw_frames: bool = False
    raw_frame_wh: Tuple[int, int] = (224, 168)  # cv2.resize (width, height)
    # Storage dtype of the feature/depth streams in collated batches.
    # 'bfloat16' halves the step's HBM read of the raw depth (the measured
    # bottleneck of the fusion step at B=64 — see pipeline.pad_batch).
    feature_dtype: str = "float32"


@dataclass(frozen=True)
class ModelConfig:
    """FUTR + fuser architecture (reference opts.py:91-103, model/*.py)."""

    model: str = "futr_fusion_bn"
    # futr | futr_fusion_bn | futr_fusion_grad | futr_fusion_vary | futr_fusion_nox |
    # afft | futr_unsupervised | rnn | cnn | tcn
    hidden_dim: int = 128
    n_head: int = 8
    n_encoder_layers: int = 2
    n_decoder_layers: int = 1
    n_query: int = 8
    input_dim: int = 2048
    max_pos_len: int = 2000
    dropout: float = 0.1                # transformer-internal (transformer.py:23)
    seg: bool = True
    anticipate: bool = True
    pos_emb: bool = True
    input_type: str = "i3d_transcript"  # i3d_transcript|gt
    # The reference bypasses its encoder: memory = src (transformer.py:77-78).
    # False reproduces that observable behavior; True re-enables the stack.
    use_encoder: bool = False
    # Seg head width: n_class-1 in futr.py:34, n_class in fusion models
    # (futr_safuser_batchnormalization.py:133).
    seg_excludes_none: bool = False
    # Fuser knobs (futr_safuser_batchnormalization.py / futr_safuser_tokenfusion.py)
    fuser_depth: int = 1
    fuser_heads: int = 8
    fuser_dropout: float = 0.1          # embd_drop (bn:26); independent of `dropout`
    fuser_exchange_frac: float = 0.1    # BN variant: bottom 10% (bn:58); grad/vary hardcode C//4
    # (outer residual is hardcoded per variant to match the reference: grad
    # keeps x+x_res, BN/vary/no-exchange don't — see models/fuser.py)
    query_num: int = 49                 # L3 label vocabulary (fc_l3 head width)
    # Effective-rank regularizer (new component, paper-faithful; absent from
    # reference code — SURVEY.md §0). 0.0 disables.
    erank_weight: float = 0.0
    erank_target: Optional[float] = None
    log_erank: bool = True              # log the fused-stream effective rank
                                        # every step (the paper's analysis curve)
    sow_attn: bool = False              # capture attention weights into the
                                        # 'intermediates' collection (viz)
    # Compute dtype for the hot path. Measured on v5e (tools/measure_r2.py):
    # bf16 wins 1.31x on the matmul-bound 50salads shape (h512/S3100) but
    # LOSES ~6% on the fusion workload (h128, BN/blend elementwise-bound),
    # so fusion configs default fp32 and the wide futr configs set bfloat16.
    compute_dtype: str = "float32"
    # Dtype for ONLY the wide input projections (input_embed 2048->h and
    # depth_projection H*W->h — the fusion model's FLOPs live there). None
    # follows compute_dtype; 'bfloat16' runs those matmuls on the MXU in
    # bf16 (fp32 accumulation) while the BN/fuser/transformer stay fp32.
    # Measured (same-process interleaved A/B, v5e): LOSES ~3-12% on the
    # fusion shape at B=8 and B=64 — the device-side bf16 cast of the
    # [B,S,19200] depth stream costs an extra HBM pass that exceeds the
    # matmul savings. BUT paired with DataConfig.feature_dtype='bfloat16'
    # (bf16 batch storage: the cast is free and the depth read halves) it
    # WINS +25% at B=64 — the fusion step is bandwidth-bound on the
    # raw-depth read. The fusion configs ship that pairing; default None.
    embed_dtype: Optional[str] = None
    # Gates the fused Pallas SA-Fuser kernels (the attention kernel is gated
    # separately by ops.attention.attention_kernel_eligible + the platform
    # check in ops.fuser_kernel.pallas_enabled).
    use_pallas: bool = True
    # Mixture-of-Experts FFNs (models/moe.py; new capability — the
    # reference's FFNs are always dense, transformer.py:200-202). > 0
    # replaces every transformer FFN with moe_experts experts routed
    # top-k; expert params shard over the mesh's 'ep' axis.
    moe_experts: int = 0
    moe_top_k: int = 2
    # Expert capacity = ceil(top_k * tokens / E * capacity_factor). Token
    # assignments past an expert's capacity DROP (GShard semantics), and
    # which ones drop depends on batch composition — for exact
    # padded == unpadded eval behavior raise this until no expert
    # overflows (tests/test_moe.py pins both regimes).
    moe_capacity_factor: float = 1.25
    # Switch load-balancing aux-loss weight (moe.py sows it; the train
    # loop adds weight * aux to the total when experts are on).
    moe_aux_weight: float = 0.01
    # Module-eval()-semantics forward while still TRAINING: BatchNorm reads
    # running statistics and never updates them (torch module.eval()); pair
    # with dropout=0 / fuser_dropout=0 for the full effect. The Trainer
    # builds this variant internally for the reference's sticky-eval loops
    # (TrainConfig.sticky_eval) — not meant to be set by hand.
    frozen_stats: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Optimizer/loop (reference opts.py:72-88, main_utkinects.py:131-134)."""

    loop: str = "proposed_depth"        # futr|proposed|proposed_depth|unimodal|unsupervised|tcn
    batch_size: int = 8
    # Validation batch size (None = batch_size).  Every reference entry point
    # builds its val loader with batch_size=1 (main_utkinects.py:176,
    # main_darai.py:181, main.py:150); batching validation is safe only for
    # batch-INVARIANT forwards — the gate metrics are computed per-row
    # (COMPAT #5) so counters match at any batch size.  Models that attend
    # ACROSS the batch (the futr_unsupervised self-attention family,
    # COMPAT #17) are forward-batch-SENSITIVE: set 1 for the faithful
    # reference protocol (the darai config does).
    val_batch_size: Optional[int] = None
    epochs: int = 60
    warmup_epochs: int = 10
    lr: float = 1e-3
    weight_decay: float = 5e-3
    seeds: Tuple[int, ...] = (1, 10, 13452)   # main_utkinects.py:184
    min_train_batch: int = 8            # BN guard: skip batches <8 (train_proposed_depth.py:148)
    # Reference quirk (COMPAT #37): validate() flips the module to eval()
    # and most train loops never flip it back, so epochs >= 1 TRAIN with
    # eval-mode BatchNorm (running stats frozen at end-of-epoch-0, never
    # updated again) and dropout off — gradients still flow.  Sticky loops:
    # train.py:168, train_proposed_depth.py:235, train_unsupervised.py:411,
    # train_tcn.py:105 (no model.train() after validate); NON-sticky:
    # train_proposed.py:252 and train_unimodal.py:270 restore model.train().
    # None = faithful per-loop default; True/False overrides (False = the
    # "fixed" loop that stays in train mode every epoch).
    sticky_eval: Optional[bool] = None
    # warm start: path to a flax-msgpack file holding {'params', 'batch_stats'}
    # loaded into the fresh state before training; the optimizer state and
    # LR schedule stay fresh (distinct from --resume, which restores the
    # full state + step). Written with
    # flax.serialization.msgpack_serialize; see cli/run.py:train.
    init_ckpt: Optional[str] = None
    exclude_class_idx: Optional[int] = None   # UNDEFINED class (utk 47, ntu 120)
    weighted_ce: bool = False           # cal_weighted_loss path (utils.py:410)
    label_smoothing: bool = False
    save_dir: str = "./save_dir"
    log_every: int = 50
    # curriculum loop (train_unsupervised.py:360: triangular 0 -> peak -> end)
    warmup_loss_epochs: Tuple[int, int] = (30, 60)
    # L3 focal-loss pad/exclude ids (train_unsupervised.py:306 passes 47, 48)
    l3_pad_idx: Optional[int] = None
    l3_exclude_idx: Optional[int] = None
    max_segments: int = 32              # static cap for the cluster losses
    # optional supervised-contrastive term over the supcon stream, the
    # reference's commented "soft label loss" (train_unsupervised.py:314-319),
    # ramped by min(1, epoch/peak). 0.0 disables. Frames subsample to
    # supcon_samples: the full B*T x B*T similarity matrix is quadratic.
    supcon_weight: float = 0.0
    supcon_samples: int = 512
    supcon_temperature: float = 0.07    # opts.py:106
    # device-side step batching: one dispatch runs this many train steps via
    # lax.scan over stacked micro-batches (Trainer.make_multi_step). Amortizes
    # per-step host dispatch latency; semantically identical to sequential
    # steps (equivalence-tested). 1 = one dispatch per step.
    steps_per_dispatch: int = 1
    # gradient accumulation: one optimizer update from the MEAN gradient
    # over this many consecutive loader batches (Trainer.make_accum_step) —
    # effective batch grad_accum x batch_size at one microbatch's activation
    # footprint. BN stats update per microbatch; state.step counts UPDATES.
    # Mutually exclusive with steps_per_dispatch > 1; > 1 keeps the host
    # loader (the cached scan paths update per batch).
    grad_accum: int = 1
    # device-resident dataset (data/device_cache.py): land the train set in
    # HBM once, assemble batches by on-device gather — zero per-step H2D.
    # Falls back to the host loader when the data doesn't fit (or the loop
    # needs host-side extras, e.g. the unsupervised curriculum's seg_ids).
    device_cache: bool = False
    # also mirror epoch/step metrics to TensorBoard event files (native
    # writer, utils/tbwriter.py — no tensorflow dependency); JSONL always on
    tensorboard: bool = False
    # PRNG implementation for the training dropout stream. None = JAX's
    # default (threefry2x32, counter-based in software). 'rbg' draws from
    # the TPU's hardware RNG instead. MEASURED 0.83x on the 50salads step
    # (8.04 -> 9.65 ms, same-process interleaved, tools/measure_r3.py
    # measure_rng): XLA fuses the threefry bit-generation into the mask
    # consumers, while rng_bit_generator stays an unfused op with its own
    # HBM round trip — so the default stays threefry and 'rbg' is a knob
    # for shapes where mask generation dominates. Streams differ across
    # impls (same seed, different masks) but both are valid dropout;
    # torch-parity tests run dropout off, and same-config paths (fit vs
    # fit_cached, multi-step vs sequential) share the impl on both arms.
    rng_impl: Optional[str] = None
    # AdamW first-moment (mu) storage dtype; None = fp32 (torch parity).
    # 'bfloat16' halves the mu stream's HBM traffic and the optimizer's
    # memory footprint (optax.adamw mu_dtype; update math stays fp32).
    # The second moment stays fp32 — bf16's 8-bit mantissa distorts
    # 1/sqrt(nu) too much. MEASURED perf-neutral on the 50salads step
    # (1.001x, tools/measure_r3.py measure_mu_dtype) — it's a MEMORY
    # knob: -25% optimizer state for models where that matters.
    opt_mu_dtype: Optional[str] = None


@dataclass(frozen=True)
class EvalConfig:
    """MoC protocol (reference evaluation/predict_utkinects.py:235-241)."""

    eval_p: Tuple[float, ...] = (0.1, 0.2, 0.3, 0.5)
    # Sweep forward batch (CLI predict -> Predictor(eval_batch=...)).  The
    # reference evaluates one video at a time (predict_utkinects.py:302);
    # batching the sweep is exact for batch-invariant forwards (padding
    # exactness tests) — batch-attending models (COMPAT #17) need 1 for the
    # faithful per-video protocol.
    eval_batch: int = 8
    obs_percs: Tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    pred_p: float = 0.5
    # predict_breakfast.py:116 skips a video when its OBSERVED strided row
    # count exceeds this (past_len/sample_rate > 2000), not its total length
    max_eval_len: Optional[int] = None
    # anticipation-accuracy protocol of the entry point's live predict file:
    # 'weighted'   — 10x transition weight, per-video mean
    #                (predict_utkinects.py:105-137, make_gif.py:105,
    #                predict_nturgbd.py:105)
    # 'unweighted' — plain accuracy, per-video mean (predict_breakfast.py:36)
    # 'micro'      — correct/total counts pooled over all videos
    #                (predict_50salads.py:66-96, 198-232)
    # 'unweighted_excl' — plain accuracy where gt==exclude_class_idx frames
    #                are skipped from the NUMERATOR only while the
    #                denominator keeps the full compare length
    #                (predict_tcn_darai.py:146-155 — the one live exclusion
    #                among the normal-accuracy variants; COMPAT #41)
    ant_acc_mode: str = "weighted"
    # gt class dropped from the ant-accuracy count — the EVAL-side id the
    # live predict passes (16 predict_utkinects.py:328 / make_gif.py:370,
    # 120 predict_nturgbd.py:330; breakfast/50salads pass 10/5 but their
    # accuracy fns comment the exclusion out, so None there)
    exclude_class_idx: Optional[int] = None
    # predict_breakfast.py:239-252 (LIVE code): the gt query stream is
    # re-encoded as an ALTERNATING 0/1 segment-parity sequence before
    # conditioning the model — train feeds raw ids (train_proposed.py:72-85
    # keeps the same loop commented out).  Replicated at predict only,
    # matching the reference's observable behavior (COMPAT #27).
    query_mod2: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Reference has DataParallel only (main.py:115);
    here the batch rides a ('dp','ep','tp','sp','pp') mesh with XLA
    collectives over ICI — dp shards the batch, tp the wide kernels
    (Megatron rules, parallel/mesh.py), sp the sequence axis (ring
    attention, ops/ring_attention.py), pp the decoder layer stack (GPipe
    microbatch pipeline, parallel/pipeline.py), ep the MoE expert axis
    (models/moe.py)."""

    dp: int = -1        # -1 => remaining devices on the dp axis
    tp: int = 1
    sp: int = 1         # sequence-parallel axis (long-S configs)
    pp: int = 1         # pipeline-parallel stages (deep-decoder configs)
    pp_microbatches: int = 0  # 0 => auto (= pp); more => smaller bubble
    # pipeline schedule: 'gpipe' (fill-drain forward, autodiff mirrors the
    # backward; activation residuals live O(M) microbatches) or '1f1b'
    # (Megatron-style one-forward-one-backward at the TRAIN-STEP level,
    # parallel/pipeline_1f1b.py: per-microbatch loss at the last stage,
    # in-flight window O(pp), remat per stage; same bubble fraction).
    # 1f1b currently supports the futr family on dp x pp meshes and FAILS
    # LOUDLY elsewhere (Trainer.make_1f1b_train_step lists the checks).
    pp_schedule: str = "gpipe"
    ep: int = 1         # expert-parallel axis (moe_experts configs)
    fsdp: bool = False  # ZeRO/FSDP: shard params + optimizer moments over dp


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    name: str = "utkinects"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _cfg(**kw) -> Config:
    return Config(**kw)


# One named config per reference entry point (BASELINE.md "configs to cover").
CONFIGS = {
    # FUTR baseline on 50salads (main.py:68 uses mapping_l2.txt +
    # scripts/50s_train.sh:1-5 hyperparams)
    "50salads": _cfg(
        name="50salads",
        data=DataConfig(
            dataset="50salads", mapping_file="mapping_l2.txt", features_dir="features",
            train_split="train.split{split}.bundle", val_split="test.split{split}.bundle",
            depth_features_dir=None, gt_format="plain", sample_rate=6,
            features_transposed=True,
            train_obs_percs=(0.2, 0.3, 0.5), seq_buckets=(128, 256, 512, 1024, 3100),
            # model compute is bf16; bf16 batches halve H2D (~neutral
            # on-device at B=8, measured)
            feature_dtype="bfloat16",
        ),
        model=ModelConfig(
            model="futr", hidden_dim=512, n_encoder_layers=2, n_decoder_layers=2,
            n_query=20, max_pos_len=3100, seg_excludes_none=True,
            compute_dtype="bfloat16",   # 1.31x at this shape (measure_r2)
        ),
        train=TrainConfig(loop="futr", batch_size=8, epochs=70, min_train_batch=0,
                          device_cache=True),
        eval=EvalConfig(ant_acc_mode="micro"),  # main.py:23 -> predict_50salads
    ),
    # 50salads proposed path (main_proposed_50salads.py): L1 targets derived
    # from the L2 gt, gt-L2 query conditioning, 3-seed protocol
    "50salads_proposed": _cfg(
        name="50salads_proposed",
        data=DataConfig(
            dataset="50salads", mapping_file="mapping_l1.txt",
            query_mapping_file="mapping_l2.txt", l1_relabel=True,
            features_dir="features",
            train_split="train.split{split}.bundle",
            val_split="test.split{split}.bundle",
            depth_features_dir=None, gt_format="plain", sample_rate=6,
            features_transposed=True,
            train_obs_percs=(0.2, 0.3, 0.5),
            seq_buckets=(128, 256, 512, 1024, 3100),
            feature_dtype="bfloat16",
        ),
        model=ModelConfig(
            model="futr_proposed", hidden_dim=512, n_encoder_layers=2,
            n_decoder_layers=2, n_query=20, max_pos_len=3100,
            # 19 L2 classes + the query pad slot (the reference collate pads
            # queries with id 19, which its own Embedding(19) cannot index —
            # COMPAT #26)
            query_num=20,
            seg_excludes_none=True, compute_dtype="bfloat16",
        ),
        # main_proposed_50salads.py:27 imports train_proposed: two-metric
        # best gate + model.train() restored after validate (non-sticky);
        # batches under 8 rows skip (train_proposed.py:164)
        train=TrainConfig(loop="proposed", batch_size=8, epochs=70,
                          min_train_batch=8, device_cache=True),
        # predict_50salads.py:198-232: micro-pooled plain ant accuracy
        eval=EvalConfig(ant_acc_mode="micro"),
    ),
    # FUTR on Breakfast (scripts/bf_train.sh:2-6)
    "breakfast": _cfg(
        name="breakfast",
        data=DataConfig(
            dataset="breakfast", mapping_file="mapping.txt", features_dir="features",
            train_split="train.split{split}.bundle", val_split="test.split{split}.bundle",
            depth_features_dir=None, gt_format="plain", sample_rate=3,
            features_transposed=True,
            train_obs_percs=(0.2, 0.3, 0.5), seq_buckets=(128, 256, 512, 1024, 2000),
        ),
        model=ModelConfig(
            model="futr", hidden_dim=128, n_encoder_layers=2, n_decoder_layers=1,
            n_query=8, max_pos_len=2000, seg_excludes_none=True,
        ),
        train=TrainConfig(loop="futr", batch_size=16, epochs=60, min_train_batch=0,
                          device_cache=True),
        eval=EvalConfig(ant_acc_mode="micro"),  # main.py:23 -> predict_50salads
    ),
    # Breakfast with the L3-query channel (main_proposed.py: actions from
    # mapping_l2.txt, query stream from mapping.txt via
    # basedataset_proposed_breakfast). The reference file is comment-toggled
    # to futr_baseline; the query-consuming futr_proposed (its commented
    # sibling) is the live default here — `--model futr` reproduces the
    # baseline toggle.
    "breakfast_proposed": _cfg(
        name="breakfast_proposed",
        data=DataConfig(
            dataset="breakfast", mapping_file="mapping_l2.txt",
            query_mapping_file="mapping.txt", features_dir="features",
            label_from_filename=True,
            train_split="train.split{split}.bundle",
            val_split="test.split{split}.bundle",
            depth_features_dir=None, gt_format="plain", sample_rate=3,
            features_transposed=True,
            train_obs_percs=(0.2, 0.3, 0.5),
            seq_buckets=(128, 256, 512, 1024, 2000),
            feature_dtype="bfloat16",
        ),
        model=ModelConfig(
            model="futr_proposed", hidden_dim=128, n_encoder_layers=2,
            n_decoder_layers=1, n_query=8, max_pos_len=2000,
            query_num=49,  # 48 fine classes + query pad slot (COMPAT #26)
            seg_excludes_none=True, compute_dtype="bfloat16",
        ),
        # main_proposed.py:21 imports train_proposed: two-metric best gate +
        # model.train() restored after validate (non-sticky); batches under
        # 8 rows skip (train_proposed.py:164)
        train=TrainConfig(loop="proposed", batch_size=16, epochs=60,
                          min_train_batch=8, device_cache=True),
        # predict_breakfast.py: observed-row skip at 2000 (:216), per-video
        # plain ant accuracy (:36), live 0/1 query re-encoding (:239-252)
        eval=EvalConfig(max_eval_len=2000, ant_acc_mode="unweighted",
                        query_mod2=True),
    ),
    # UTKinect RGB+depth token fuser (main_utkinects.py — primary proposed path).
    # Batches store bf16 and the wide input projections run bf16 (fp32
    # accumulation; everything downstream fp32): +25% at B=64, neutral at
    # B=8 — the step is bandwidth-bound on the raw-depth read (profiled +
    # same-process A/B, ROADMAP r2).
    "utkinects": _cfg(
        name="utkinects",
        data=DataConfig(dataset="utkinects", feature_dtype="bfloat16"),
        model=ModelConfig(model="futr_fusion_bn", embed_dtype="bfloat16"),
        train=TrainConfig(loop="proposed_depth", exclude_class_idx=47, weighted_ce=True,
                          device_cache=True),
        # eval-side ant exclusion is 16 (predict_utkinects.py:328), distinct
        # from the train loop's 47
        eval=EvalConfig(exclude_class_idx=16),
    ),
    # DARai multi-modal unsupervised curriculum (main_darai.py)
    "darai": _cfg(
        name="darai",
        data=DataConfig(
            dataset="darai", sample_rate=15, depth_shape=(224, 224),
            train_obs_percs=(0.2, 0.3, 0.5),
            # L3 query stream from mapping_l3_changed.txt (main_darai.py:88-89);
            # the unsupervised model consumes queries, not raw depth
            query_mapping_file="mapping_l3_changed.txt",
            depth_features_dir=None,
            # real DARai trees store {base}_{seq}.npy sequence files
            # (basedataset_darai_depth.py:44-82)
            multi_sequence=True,
        ),
        model=ModelConfig(model="futr_unsupervised", query_num=48),
        train=TrainConfig(
            loop="unsupervised", exclude_class_idx=None,
            l3_pad_idx=47, l3_exclude_idx=48, device_cache=True,
            # the self-attention query family attends ACROSS the batch
            # (COMPAT #17) — per-video validation is the only batch size
            # that reproduces the reference protocol (main_darai.py:181)
            val_batch_size=1,
        ),
        # eval_batch=1: same batch-attending forward at the sweep
        eval=EvalConfig(exclude_class_idx=16, eval_batch=1),  # make_gif.py:370
    ),
    # DARai gaze-query model (main_darai.py:19,34 comment toggles:
    # basedataset_darai_gaze + futr_unsupervised_multimodal). The gaze model
    # emits no 'l3' output, so it pairs with the supervised futr loop — the
    # reference's unsupervised loop crashes on it (COMPAT #32).
    "darai_gaze": _cfg(
        name="darai_gaze",
        data=DataConfig(
            dataset="darai", sample_rate=15,
            train_obs_percs=(0.2, 0.3, 0.5),
            depth_features_dir=None, multi_sequence=True,
            gaze_dir="gaze",
        ),
        # fc_seg is n_class-1 wide in the gaze reference (multimodal.py:59)
        model=ModelConfig(model="futr_gaze", seg_excludes_none=True),
        train=TrainConfig(loop="futr", exclude_class_idx=None),
        eval=EvalConfig(exclude_class_idx=16),  # make_gif.py:370
    ),
    # NTURGBD RGB-D fusion (main_nturgbd.py; fusion wiring, not the RNN ablation)
    "nturgbd": _cfg(
        name="nturgbd",
        data=DataConfig(
            dataset="nturgbd", train_obs_percs=(0.2, 0.3, 0.5), depth_shape=(224, 224),
            # normalize_depth stays OFF: the reference defines the min-max
            # helper but its load site comments the call out — depth loads
            # raw (basedataset_nturgbd.py:148; test_nturgbd_parity.py)
            normalize_depth=False, feature_dtype="bfloat16",
        ),
        model=ModelConfig(model="futr_fusion_bn", query_num=121,
                          embed_dtype="bfloat16"),
        train=TrainConfig(loop="proposed_depth", exclude_class_idx=120, weighted_ce=True,
                          device_cache=True),
        eval=EvalConfig(exclude_class_idx=120),  # predict_nturgbd.py:330
    ),
    # Synthetic smoke config (tests / bench without datasets on disk)
    "synthetic": _cfg(
        name="synthetic",
        data=DataConfig(
            dataset="synthetic", gt_format="plain", seq_buckets=(64, 128),
            train_obs_percs=(0.2, 0.3, 0.5), depth_shape=(160, 120),
        ),
        model=ModelConfig(model="futr_fusion_bn", max_pos_len=256),
        train=TrainConfig(loop="proposed_depth", epochs=2, min_train_batch=0),
    ),
}


def get_config(name: str) -> Config:
    return CONFIGS[name]
