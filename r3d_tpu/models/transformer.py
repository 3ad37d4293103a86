"""FUTR encoder–decoder stack (reference model/extras/transformer.py).

Key faithfulness decision: every reference entry point runs with the encoder
BYPASSED — ``memory = src`` (transformer.py:77-78, the encoder call is
commented out). ``use_encoder=False`` reproduces that; ``use_encoder=True``
re-enables the stack for the configs that want it (SURVEY.md §7 policy).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.models.layers import (
    DecoderLayer,
    EncoderLayer,
    adaptive_avg_pool1d,
    sinusoidal_positional_encoding,
)


class TransformerEncoder(nn.Module):
    dim: int
    n_head: int
    n_layers: int
    ffn_dim: int
    dropout: float = 0.1
    sow_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, deterministic=True):
        out = src
        for i in range(self.n_layers):
            out = EncoderLayer(
                self.dim, self.n_head, self.ffn_dim, self.dropout,
                sow_attn=self.sow_attn, dtype=self.dtype, name=f"layer{i}",
            )(out, pos, key_padding_mask, deterministic)
        return out


class TransformerDecoder(nn.Module):
    """Decoder stack with the reference's unconditional final LayerNorm
    (transformer.py:37,182-183)."""

    dim: int
    n_head: int
    n_layers: int
    ffn_dim: int
    dropout: float = 0.1
    sow_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, memory_key_padding_mask=None,
                 deterministic=True, tgt_key_padding_mask=None):
        out = tgt
        for i in range(self.n_layers):
            out = DecoderLayer(
                self.dim, self.n_head, self.ffn_dim, self.dropout,
                sow_attn=self.sow_attn, dtype=self.dtype, name=f"layer{i}",
            )(out, memory, pos, query_pos, memory_key_padding_mask,
              deterministic, tgt_key_padding_mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)


class FUTRTransformer(nn.Module):
    """(memory, hs) = transformer(src, queries) — reference Transformer.forward.

    When ``query_pos`` is None the L3-query path activates: queries are
    generated from the (bypassed) memory by self-attention + sinusoidal PE +
    adaptive average pooling down to ``n_query`` steps
    (transformer.py:111-124), as used by the futr_unsupervised family.
    """

    dim: int
    n_head: int
    n_encoder_layers: int
    n_decoder_layers: int
    ffn_dim: int
    dropout: float = 0.1
    use_encoder: bool = False
    n_query: int = 8
    max_pos_len: int = 2000
    sow_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,                       # [B, S, C]
        pos: Optional[jnp.ndarray],             # [B, S, C] learned pos embed
        query_pos: Optional[jnp.ndarray],       # [B, Q, C] action queries
        src_key_padding_mask: Optional[jnp.ndarray] = None,  # [B, S] True=pad
        deterministic: bool = True,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Q] True=pad
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.use_encoder:
            memory = TransformerEncoder(
                self.dim, self.n_head, self.n_encoder_layers, self.ffn_dim,
                self.dropout, sow_attn=self.sow_attn, dtype=self.dtype,
                name="encoder",
            )(src, pos, src_key_padding_mask, deterministic)
        else:
            memory = src  # reference behavior (transformer.py:78)

        if query_pos is None:
            # L3 query generation (transformer.py:111-124), done batch-major.
            from r3d_tpu.models.layers import MultiheadAttention

            src_l3 = MultiheadAttention(
                self.dim, self.n_head, dropout=0.0, dtype=self.dtype,
                name="l3_attention",
            )(memory, src, src, deterministic=deterministic)
            S = src_l3.shape[1]
            pe = sinusoidal_positional_encoding(self.max_pos_len, self.dim)[:S]
            labels_list = src_l3 + pe[None].astype(src_l3.dtype)
            query_pos = adaptive_avg_pool1d(labels_list, self.n_query)

        tgt = jnp.zeros_like(query_pos)
        hs = TransformerDecoder(
            self.dim, self.n_head, self.n_decoder_layers, self.ffn_dim,
            self.dropout, sow_attn=self.sow_attn, dtype=self.dtype,
            name="decoder",
        )(tgt, memory, pos, query_pos, src_key_padding_mask, deterministic,
          tgt_key_padding_mask)
        return memory, hs
