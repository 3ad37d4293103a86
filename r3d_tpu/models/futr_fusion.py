"""RGB+depth fusion FUTR (reference model/futr_safuser_batchnormalization.py
FUTR wrapper, :109-234; also hosts the other fuser variants and the AFFT
ablation).

Flow (bn:174-232): embed RGB -> project+LN+ReLU raw depth frames -> CMFuser
-> (bypassed-encoder) transformer with learned action queries -> heads.
The fusion models' seg head is n_class wide (bn:133), unlike baseline FUTR.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.config import ModelConfig
from r3d_tpu.models.layers import adaptive_avg_pool1d, xavier
from r3d_tpu.models.futr import Heads, InputEmbed, _dtype
from r3d_tpu.models.fuser import (
    CMFuserBN,
    CMFuserGrad,
    CMFuserNoExchange,
    CMFuserVary,
)
from r3d_tpu.models.transformer import FUTRTransformer

FUSERS = {
    "futr_fusion_bn": CMFuserBN,
    "futr_fusion_grad": CMFuserGrad,
    "futr_fusion_vary": CMFuserVary,
    "futr_fusion_nox": CMFuserNoExchange,
    "afft": CMFuserNoExchange,
}


class DepthEmbed(nn.Module):
    """Raw depth frames -> hidden: flatten, Linear, LayerNorm, ReLU
    (bn:153-157, 198-201)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, depth: jnp.ndarray) -> jnp.ndarray:
        from r3d_tpu.models.futr import _embed_dtype

        B, S = depth.shape[0], depth.shape[1]
        flat = depth.reshape(B, S, -1).astype(_embed_dtype(self.cfg))
        h = nn.Dense(
            self.cfg.hidden_dim, kernel_init=xavier,
            dtype=_embed_dtype(self.cfg), name="depth_projection",
        )(flat).astype(_dtype(self.cfg))
        h = nn.LayerNorm(epsilon=1e-5, dtype=_dtype(self.cfg), name="depth_layernorm")(h)
        return nn.relu(h)


class FUTRFusion(nn.Module):
    """FUTR with the Rank-enhancing Token Fuser front end."""

    cfg: ModelConfig
    n_class: int

    @nn.compact
    def __call__(
        self,
        features: jnp.ndarray,                      # [B, S, input_dim]
        depth_features: jnp.ndarray,                # [B, S, H, W] or [B, S, D]
        src_pad_mask: Optional[jnp.ndarray] = None,  # [B, S] True = pad
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, S = features.shape[0], features.shape[1]
        src = InputEmbed(cfg, self.n_class, name="embed")(features)
        depth = DepthEmbed(cfg, name="depth_embed")(depth_features)

        fuser_cls = FUSERS[cfg.model]
        fuser_kw = dict(
            depth=cfg.fuser_depth, n_head=cfg.fuser_heads,
            two_token_exact=True, drop_rate=cfg.fuser_dropout,
            use_pallas=cfg.use_pallas, dtype=_dtype(cfg), name="fuser",
        )
        if cfg.model == "futr_fusion_bn":
            # BN variant's bottom-k fraction (bn:58); grad/vary hardcode C//4
            fuser_kw["exchange_frac"] = cfg.fuser_exchange_frac
            # sticky-eval training epochs freeze the BN running stats
            # (module.eval() semantics; Trainer._model_for)
            fuser_kw["frozen"] = cfg.frozen_stats
        fused = fuser_cls(cfg.hidden_dim, **fuser_kw)(src, depth, train=train)

        if cfg.model == "afft":
            # AFFT ablation: transformer bypassed entirely; heads run on the
            # fused stream pooled to n_query steps (afft.py:174-201); seg off.
            pooled = adaptive_avg_pool1d(fused, cfg.n_query)
            out: Dict[str, jnp.ndarray] = {}
            if cfg.anticipate:
                out["action"] = nn.Dense(
                    self.n_class, kernel_init=xavier, dtype=_dtype(cfg), name="fc"
                )(pooled).astype(jnp.float32)
                out["duration"] = nn.Dense(
                    1, kernel_init=xavier, dtype=_dtype(cfg), name="fc_len"
                )(pooled)[..., 0].astype(jnp.float32)
            return out

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
        )(fused, pos, action_query, src_pad_mask, deterministic=not train)

        out = Heads(cfg, self.n_class, name="heads")(hs, memory)
        # fused stream exposed for the effective-rank regularizer/metric
        # (XLA drops it when unused)
        out["fused"] = fused.astype(jnp.float32)
        return out
