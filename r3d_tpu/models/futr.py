"""FUTR: Future Transformer for long-term action anticipation.

TPU-native re-implementation of reference ``model/futr.py`` (baseline) and
``model/futr_baseline.py``. One flax module, batch-major, static shapes; the
pad mask is an explicit input (the reference derives it from labels inside
forward, futr.py:58-60 — here the caller passes it so eval can pass None).

Outputs (futr.py:94-110):
    action   [B, n_query, n_class]
    duration [B, n_query]
    seg      [B, S, n_class - 1]  (baseline excludes the NONE class)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.config import ModelConfig
from r3d_tpu.models.layers import xavier
from r3d_tpu.models.transformer import FUTRTransformer


def _dtype(cfg: ModelConfig) -> jnp.dtype:
    return jnp.dtype(cfg.compute_dtype)


def _embed_dtype(cfg: ModelConfig) -> jnp.dtype:
    """Dtype for the wide input projections only (config.embed_dtype)."""
    return jnp.dtype(cfg.embed_dtype or cfg.compute_dtype)


class InputEmbed(nn.Module):
    """2048-d features (or gt label ids) -> hidden, ReLU (futr.py:71-75)."""

    cfg: ModelConfig
    n_class: int

    @nn.compact
    def __call__(self, src: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        if cfg.input_type == "gt":
            emb = nn.Embed(
                self.n_class + 2, cfg.hidden_dim,
                embedding_init=xavier, dtype=_dtype(cfg), name="gt_emb",
            )(src.astype(jnp.int32))
        else:
            emb = nn.Dense(
                cfg.hidden_dim, kernel_init=xavier, dtype=_embed_dtype(cfg),
                name="input_embed",
            )(src.astype(_embed_dtype(cfg)))
        return nn.relu(emb).astype(_dtype(cfg))


class Heads(nn.Module):
    """Classification / duration / segmentation heads (futr.py:33-41)."""

    cfg: ModelConfig
    n_class: int

    @nn.compact
    def __call__(self, hs: jnp.ndarray, memory: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        out: Dict[str, jnp.ndarray] = {}
        if cfg.anticipate:
            action = nn.Dense(
                self.n_class, kernel_init=xavier, dtype=_dtype(cfg), name="fc"
            )(hs)
            duration = nn.Dense(
                1, kernel_init=xavier, dtype=_dtype(cfg), name="fc_len"
            )(hs)[..., 0]
            out["action"] = action.astype(jnp.float32)
            out["duration"] = duration.astype(jnp.float32)
        if cfg.seg:
            seg_classes = self.n_class - 1 if cfg.seg_excludes_none else self.n_class
            seg = nn.Dense(
                seg_classes, kernel_init=xavier, dtype=_dtype(cfg), name="fc_seg"
            )(memory)
            out["seg"] = seg.astype(jnp.float32)
        return out


class FUTR(nn.Module):
    """Baseline FUTR (reference model/futr.py).

    ``emit_supcon=True`` is the futr_baseline variant (model/futr_baseline.py):
    the same forward plus ``output['supcon'] = tgt`` — the raw decoder output
    (futr_baseline.py:128).  Its ctor-only extras (positional_embedding_l3,
    pos_enc) never appear in the forward and carry no parameters worth
    reproducing."""

    cfg: ModelConfig
    n_class: int
    emit_supcon: bool = False

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,                     # [B, S, input_dim] (or [B,S] ids)
        src_pad_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, S = features.shape[0], features.shape[1]
        src = InputEmbed(cfg, self.n_class, name="embed")(features)

        pos = None
        if cfg.pos_emb:
            pos_embedding = self.param(
                "pos_embedding", xavier, (1, cfg.max_pos_len, cfg.hidden_dim)
            )
            pos = jnp.broadcast_to(
                pos_embedding[:, :S].astype(src.dtype), (B, S, cfg.hidden_dim)
            )

        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (cfg.n_query, cfg.hidden_dim)
        )
        action_query = jnp.broadcast_to(
            query_embed[None].astype(src.dtype), (B, cfg.n_query, cfg.hidden_dim)
        )

        memory, hs = FUTRTransformer(
            cfg.hidden_dim, cfg.n_head, cfg.n_encoder_layers, cfg.n_decoder_layers,
            cfg.hidden_dim * 4, cfg.dropout, use_encoder=cfg.use_encoder,
            n_query=cfg.n_query, max_pos_len=cfg.max_pos_len,
            sow_attn=cfg.sow_attn,
            moe_experts=cfg.moe_experts, moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            dtype=_dtype(cfg), name="transformer",
        )(src, pos, action_query, src_pad_mask, deterministic=not train)

        out = Heads(cfg, self.n_class, name="heads")(hs, memory)
        if self.emit_supcon:
            out["supcon"] = hs.astype(jnp.float32)
        return out
