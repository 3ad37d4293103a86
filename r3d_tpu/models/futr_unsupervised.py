"""L3-query FUTR family (reference model/futr_unsupervised*.py,
model/futr_proposed.py).

These variants replace the learned n_query action queries with per-frame
"L3" (fine-grained) queries:

- ``query_source='self_attention'`` (futr_unsupervised.py:124-137): queries
  are generated from the source stream itself — src goes through a
  MultiheadAttention, sinusoidal PE is added, and the decoder runs with S
  queries. The reference constructs that attention with ``batch_first=True``
  but feeds (T, B, C) tensors, so it actually attends ACROSS THE BATCH at
  each timestep; ``attend_over_batch=True`` reproduces that observable
  behavior (COMPAT.md #17), False gives the evidently-intended per-sequence
  temporal attention.
- ``query_source='gt'`` (futr_proposed.py): queries are embeddings of the
  ground-truth L3 label sequence + sinusoidal PE.

Extra heads (futr_unsupervised.py:162-167): ``l3`` = fc_l3(action_query)
computed on the PRE-decoder queries, and ``supcon`` = the query stream.
Baseline-FUTR variant note: futr_baseline.py returns supcon=tgt; covered by
the same flag.

Ablation ``variant``s of the self-attention mode:

- ``'temp2'`` (futr_unsupervised_temp2.py): the L3 stream ADDs into src
  (``src = src + l3_stream``) instead of becoming the queries; the decoder
  runs on learned n_query action queries (Embedding(n_query, hidden)), fc_l3
  reads the L3 stream, and no supcon output is returned.
- ``'temp3'`` (futr_unsupervised_temp3.py): pooled self-attention queries
  with fc_l3 on the full stream and no supcon — identical to this module's
  default pooling (COMPAT.md #18) minus the supcon head. (The reference file
  also constructs a ``query_attention`` MultiheadAttention it never calls —
  dead code, not reproduced.)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.config import ModelConfig
from r3d_tpu.models.futr import Heads, InputEmbed, _dtype
from r3d_tpu.models.layers import (
    MultiheadAttention,
    sinusoidal_positional_encoding,
    xavier,
)
from r3d_tpu.models.transformer import FUTRTransformer


class GazeCNN(nn.Module):
    """Gaze (x, y) series -> query embeddings
    (futr_unsupervised_multimodal.py GazeCNN): three 3x3 convs over the
    [B, S, 1, 2] signal, then adaptive pooling. The reference pools the
    width-1 axis UP to ``output_steps`` (AdaptiveAvgPool2d((1, 8)) on a
    [B, C, S, 1] map), which replicates the temporal mean — i.e. the 8 query
    slots are identical before PE; reproduced faithfully.  ``output_steps``
    is ALWAYS 8 in the reference (GazeCNN ctor default, never overridden,
    multimodal.py:82) regardless of n_query — the decoder output pools
    8 -> n_query afterwards.

    ``lengths`` masks zero-padded gaze rows out of every conv and the
    temporal mean so a bucketed batch reproduces the reference's unpadded
    per-video forward exactly (COMPAT #31: the reference's own train-time
    zero-pad leaks conv bias from pad rows into the mean, making outputs
    batch-composition-dependent; test mode is per-video/unpadded)."""

    hidden_dim: int
    output_steps: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, gaze: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = gaze.astype(self.dtype)[:, :, None, :]  # NHWC: [B, S, 1, 2]
        row_ok = None
        if lengths is not None:
            S = x.shape[1]
            row_ok = (
                jnp.arange(S)[None, :] < lengths[:, None]
            )[:, :, None, None].astype(x.dtype)
            x = x * row_ok
        for i, ch in enumerate((32, 64, self.hidden_dim)):
            x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.relu(x)
            if row_ok is not None:
                # zero rows >= length: the next conv then sees the same
                # zero boundary its unpadded run would get from SAME padding
                x = x * row_ok
        if row_ok is None:
            pooled = jnp.mean(x, axis=(1, 2))  # [B, C]
        else:
            denom = jnp.maximum(lengths, 1).astype(x.dtype)[:, None]
            pooled = jnp.sum(x, axis=(1, 2)) / denom
        return jnp.repeat(pooled[:, None, :], self.output_steps, axis=1)


class FUTRUnsupervised(nn.Module):
    cfg: ModelConfig
    n_class: int
    # self_attention (futr_unsupervised.py) | gt (futr_proposed.py) |
    # gaze (futr_unsupervised_multimodal.py) | depth (futr_unsupervised_depth.py)
    query_source: str = "self_attention"
    attend_over_batch: bool = True        # reference layout quirk (see module doc)
    variant: str = ""                     # '' | 'temp2' | 'temp3' (see module doc)

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,
        query: Optional[jnp.ndarray] = None,      # [B, S] L3 label ids (gt mode)
        src_pad_mask: Optional[jnp.ndarray] = None,
        query_len: Optional[jnp.ndarray] = None,  # [B] true gaze rows (gaze mode)
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, S = features.shape[0], features.shape[1]
        dt = _dtype(cfg)
        src = InputEmbed(cfg, self.n_class, name="embed")(features)

        pe = sinusoidal_positional_encoding(cfg.max_pos_len, cfg.hidden_dim)[:S]
        if self.query_source in ("self_attention", "depth"):
            # sinusoidal PE + dropout on the source (futr_unsupervised.py:106,
            # futr_unsupervised_depth.py:99, extras/position.py:15-35).
            # futr_proposed.py:93-97 and the gaze model (multimodal.py:117-121)
            # do NOT position-encode src — the learned pos embedding rides
            # into the attention layers instead.
            src = src + pe[None].astype(src.dtype)
            src = nn.Dropout(0.1)(src, deterministic=not train)

        l3_stream = None
        seg_override = None  # temp2: seg rides the pre-l3-add stream
        pos = None
        if cfg.pos_emb:
            pos_embedding = self.param(
                "pos_embedding", xavier, (1, cfg.max_pos_len, cfg.hidden_dim)
            )
            pos = jnp.broadcast_to(
                pos_embedding[:, :S].astype(src.dtype), (B, S, cfg.hidden_dim)
            )

        if self.query_source == "gt":
            # futr_proposed.py: queries = query_embed(gt L3 ids) + PE
            assert query is not None, "gt query mode needs the L3 label sequence"
            q_emb = nn.Embed(
                cfg.query_num, cfg.hidden_dim, embedding_init=xavier,
                dtype=dt, name="query_embed",
            )(query.astype(jnp.int32))
            action_query = q_emb + pe[None].astype(q_emb.dtype)
        elif self.query_source == "gaze":
            # futr_unsupervised_multimodal.py: GazeCNN queries + L2-normalized
            # sinusoidal PE over the first 8 positions (GazeCNN output_steps
            # is always 8 and the PE slice is the literal ``[:, :8]``,
            # multimodal.py:82,125); the decoder output pools 8 -> n_query
            # below.  ``query.long()`` (multimodal.py:95) floors the
            # normalized gaze to {0, 1} before the CNN — reproduced.
            assert query is not None, "gaze mode needs the [B, N, 2] gaze signal"
            q_in = jnp.trunc(query.astype(jnp.float32))
            q = GazeCNN(cfg.hidden_dim, dtype=dt, name="gaze_cnn")(
                q_in.astype(dt), query_len
            )
            pe_full = sinusoidal_positional_encoding(
                cfg.max_pos_len, cfg.hidden_dim
            )
            pe_q = pe_full[:8]
            pe_q = pe_q / jnp.maximum(
                jnp.linalg.norm(pe_q, axis=-1, keepdims=True), 1e-12
            )
            action_query = q + pe_q[None].astype(q.dtype)
        elif self.query_source == "depth":
            # futr_unsupervised_depth.py:108-115: queries = sinusoidal-PE'd
            # projected depth frames (depth_projection + LN + ReLU, then
            # pos_enc_depth — a PositionalEncoding module, so the PE add is
            # followed by its dropout(0.1))
            assert query is not None, "depth mode needs the raw depth stream"
            from r3d_tpu.models.futr_fusion import DepthEmbed

            q = DepthEmbed(cfg, name="depth_embed")(query)
            action_query = q + pe[None].astype(q.dtype)
            action_query = nn.Dropout(0.1)(
                action_query, deterministic=not train
            )
        else:
            attn = MultiheadAttention(
                cfg.hidden_dim, cfg.n_head, dropout=0.0, dtype=dt,
                name="l3_attention",
            )
            if self.attend_over_batch:
                # (T,B,C) through a batch_first MHA == attention across the
                # batch at each timestep
                src_t = jnp.swapaxes(src, 0, 1)
                src_l3 = jnp.swapaxes(
                    attn(src_t, src_t, src_t, deterministic=not train), 0, 1
                )
            else:
                src_l3 = attn(src, src, src, deterministic=not train)
            action_query = src_l3 + pe[None].astype(src_l3.dtype)
            if self.variant == "temp2":
                # futr_unsupervised_temp2.py: L3 stream adds into src; the
                # decoder gets learned n_query action queries instead. The
                # seg head keeps riding the PRE-add stream (temp2.py:164
                # applies fc_seg to the original src, not src+l3).
                l3_stream = action_query
                seg_override = src
                src = src + l3_stream
                q_emb = self.param(
                    "query_embed", xavier, (cfg.n_query, cfg.hidden_dim)
                )
                action_query = jnp.broadcast_to(
                    q_emb[None].astype(src.dtype), (B, cfg.n_query, cfg.hidden_dim)
                )

        # Decoder query length differs per variant:
        # - gt/depth (futr_proposed.py:101-124, futr_unsupervised_depth.py:
        #   115-135): the decoder runs on ALL S queries and the decoder
        #   OUTPUT adaptive-avg-pools down to n_query (pooled_tgt) before the
        #   action/duration heads.
        # - self_attention: the as-committed futr_unsupervised.py feeds S
        #   queries and does NOT pool the decoder output, so its [B,S,C]
        #   anticipation logits cannot meet the loop's [B,n_query] targets
        #   (train_unsupervised.py:340 would crash); the runnable variants
        #   (futr_unsupervised_temp4.py, transformer.py:121's internal L3
        #   path) adaptive-avg-pool the QUERIES to n_query — adopted here
        #   (COMPAT.md #18).
        query_stream = l3_stream if self.variant == "temp2" else action_query
        from r3d_tpu.models.layers import (
            adaptive_avg_pool1d,
            masked_adaptive_avg_pool1d,
        )

        pool_after_decode = self.query_source in ("gt", "depth")
        gaze_mode = self.query_source == "gaze"
        pooled_query = (
            action_query
            if self.variant == "temp2" or pool_after_decode or gaze_mode
            else adaptive_avg_pool1d(action_query, cfg.n_query)
        )

        memory, hs = FUTRTransformer(
            cfg.hidden_dim, cfg.n_head, cfg.n_encoder_layers, cfg.n_decoder_layers,
            cfg.hidden_dim * 4, cfg.dropout, use_encoder=cfg.use_encoder,
            n_query=cfg.n_query, max_pos_len=cfg.max_pos_len,
            sow_attn=cfg.sow_attn,
            moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            dtype=dt, name="transformer",
        )(src, pos, pooled_query, src_pad_mask, deterministic=not train,
          tgt_key_padding_mask=src_pad_mask if pool_after_decode else None)
        if pool_after_decode:
            # pooled_tgt (futr_proposed.py:124, futr_unsupervised_depth.py:
            # 135): the decoder output over all S queries adaptive-avg-pools
            # down to n_query. On padded bucket batches the pool bins follow
            # each row's TRUE length (and padded query rows are masked out of
            # the decoder self-attention above), so the batched result equals
            # the reference's unpadded per-video forward.
            if src_pad_mask is not None:
                lengths = jnp.sum(~src_pad_mask, axis=1)
                hs = masked_adaptive_avg_pool1d(hs, cfg.n_query, lengths)
            else:
                hs = adaptive_avg_pool1d(hs, cfg.n_query)
        elif gaze_mode:
            # multimodal.py:146: pooled_tgt over the decoder's 8 gaze-query
            # rows (all real — plain pool; identity when n_query == 8)
            hs = adaptive_avg_pool1d(hs, cfg.n_query)

        out = Heads(cfg, self.n_class, name="heads")(
            hs, memory if seg_override is None else seg_override
        )
        if not gaze_mode:
            # the gaze model has NO fc_l3 head or 'l3' output
            # (futr_unsupervised_multimodal.py emits action/duration/seg/
            # supcon only) — pairing it with the unsupervised loop's focal-L3
            # term crashes in the reference too (train_unsupervised.py:297)
            out["l3"] = nn.Dense(
                cfg.query_num, kernel_init=xavier, dtype=dt, name="fc_l3"
            )(query_stream).astype(jnp.float32)
        if self.variant not in ("temp2", "temp3"):
            # temp2/temp3 drop the supcon output (temp2 diff: commented out)
            out["supcon"] = query_stream
        return out
