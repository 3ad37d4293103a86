"""Core transformer layers (flax.linen) with DETR post-norm semantics.

Re-implements the observable math of the reference
``model/extras/transformer.py`` (a DETR fork):

- Multi-head attention with additive positional embeddings applied to q, k
  AND v (the reference passes ``with_pos_embed(...)`` as the value too —
  transformer.py:222,300-302).
- Post-norm residual blocks (normalize_before=False is the only configuration
  any entry point uses).
- Key-padding masks (True = pad) added as -inf before the softmax.

Layout is batch-major [B, L, C] throughout — the torch (T, B, C) layout is a
cuDNN-era artifact with no meaning on TPU.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

xavier = nn.initializers.xavier_uniform()


def attention_bias_from_padding(
    key_padding_mask: Optional[jnp.ndarray], dtype: Dtype
) -> Optional[jnp.ndarray]:
    """[B, S] bool (True = pad) -> additive bias [B, 1, 1, S]."""
    if key_padding_mask is None:
        return None
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, dtype=dtype)
    return jnp.where(key_padding_mask, neg, 0.0).astype(dtype)[:, None, None, :]


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (separate q/k/v/out projections,
    biases on, attention-weight dropout)."""

    dim: int
    n_head: int
    dropout: float = 0.0
    # sow attention weights into the 'intermediates' collection for the
    # attention-map dumps the reference keeps commented out
    # (transformer.py:305-322; plot via eval/visualize.attention_map_plot)
    sow_weights: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        key_padding_mask: Optional[jnp.ndarray] = None,
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, Lq, C = q.shape
        Lk = k.shape[1]
        H, D = self.n_head, self.dim // self.n_head
        dense = lambda name: nn.Dense(
            self.dim, kernel_init=xavier, dtype=self.dtype, name=name
        )
        qf = dense("q_proj")(q)
        kf = dense("k_proj")(k)
        vf = dense("v_proj")(v)

        bias = attention_bias_from_padding(key_padding_mask, jnp.float32)

        from r3d_tpu.ops.attention import (
            attention_dropout_kernel_eligible,
            attention_kernel_eligible,
            flash_attention_dropout_sharded,
            flash_attention_sharded,
        )
        from r3d_tpu.ops.cross_attention import (
            cross_attention_native_eligible,
            cross_attention_native_sharded,
        )

        # decoder cross-attention (tiny Lq, long keys): the native-layout
        # kernel consumes the projection outputs as-is (no [B,S,C] head-
        # major relayouts), but measured 0.976-0.986x on the full 50salads
        # step, so it is OPT-IN (ops/cross_attention.py docstring)
        rate = 0.0 if (deterministic or self.dropout == 0.0) else self.dropout
        if (
            attn_bias is None
            and not self.sow_weights
            and cross_attention_native_eligible(Lq, Lk, self.dim, H, rate)
        ):
            seed = 0
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            out = cross_attention_native_sharded(
                qf, kf, vf, bias, seed, 1.0 / math.sqrt(D), rate, H
            )
            return dense("out_proj")(out)

        qh = qf.reshape(B, Lq, H, D)
        kh = kf.reshape(B, Lk, H, D)
        vh = vf.reshape(B, Lk, H, D)

        # sequence-parallel mesh: self-attention over an sp-sharded S axis
        # runs as ring attention (K/V rotate over ICI, no S gather). The
        # dropout train path stays composed — GSPMD inserts the collectives
        # (ops/ring_attention.py docstring on why the mask can't ride the
        # ring).
        from r3d_tpu.ops.ring_attention import (
            ring_attention_eligible,
            ring_attention_sharded,
        )

        if (
            attn_bias is None
            and not self.sow_weights
            and (deterministic or self.dropout == 0.0)
            and ring_attention_eligible(Lq, Lk)
        ):
            out = ring_attention_sharded(
                jnp.swapaxes(qh, 1, 2), jnp.swapaxes(kh, 1, 2),
                jnp.swapaxes(vh, 1, 2), bias, 1.0 / math.sqrt(D),
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, Lq, C)
            return dense("out_proj")(out)

        if (
            attn_bias is None
            and (deterministic or self.dropout == 0.0)
            and attention_kernel_eligible(Lq, Lk, D)
        ):
            out = flash_attention_sharded(
                jnp.swapaxes(qh, 1, 2), jnp.swapaxes(kh, 1, 2),
                jnp.swapaxes(vh, 1, 2), bias, 1.0 / math.sqrt(D),
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, Lq, C)
            return dense("out_proj")(out)

        if (
            attn_bias is None
            and not deterministic
            and self.dropout > 0.0
            and not self.sow_weights
            and attention_dropout_kernel_eligible(Lq, Lk, D)
        ):
            # TRAIN path: attention-weight dropout runs inside the kernel
            # (regenerable TPU-PRNG keep-mask; the backward kernel redraws
            # the same bits) — without this the composed path round-trips
            # the [Lq, Lk] score matrix through HBM on every train step
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            )
            out = flash_attention_dropout_sharded(
                jnp.swapaxes(qh, 1, 2), jnp.swapaxes(kh, 1, 2),
                jnp.swapaxes(vh, 1, 2), bias, seed,
                1.0 / math.sqrt(D), self.dropout,
            )
            out = jnp.swapaxes(out, 1, 2).reshape(B, Lq, C)
            return dense("out_proj")(out)

        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(D)
        if bias is not None:
            scores = scores + bias.astype(scores.dtype)
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.sow_weights:
            self.sow("intermediates", "attn_weights", weights)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, vh).reshape(B, Lq, C)
        return dense("out_proj")(out)


class FeedForward(nn.Module):
    """linear1 -> activation -> dropout -> linear2 (transformer.py:200-202)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        act = {"relu": nn.relu, "gelu": lambda y: nn.gelu(y, approximate=False)}[
            self.activation
        ]
        h = nn.Dense(self.hidden_dim, kernel_init=xavier, dtype=self.dtype, name="linear1")(x)
        h = nn.Dropout(self.dropout)(act(h), deterministic=deterministic)
        return nn.Dense(self.dim, kernel_init=xavier, dtype=self.dtype, name="linear2")(h)


def _apply_ffn(layer, x, deterministic, pad_mask=None, name="ffn"):
    """Dense FFN, or MoE when the layer carries moe_experts > 0
    (models/moe.py; reference FFNs are always dense, transformer.py:200).
    ``pad_mask`` (the layer's key-padding mask) keeps bucket padding out
    of MoE expert capacity and balance statistics; dense FFNs are
    per-token so they never need it."""
    if layer.moe_experts > 0:
        from r3d_tpu.models.moe import MoEFeedForward

        return MoEFeedForward(
            layer.dim, layer.ffn_dim,
            n_experts=layer.moe_experts, top_k=layer.moe_top_k,
            capacity_factor=layer.moe_capacity_factor,
            dropout=layer.dropout, dtype=layer.dtype, name=name,
        )(x, deterministic, pad_mask)
    return FeedForward(
        layer.dim, layer.ffn_dim, layer.dropout,
        dtype=layer.dtype, name=name,
    )(x, deterministic)


class EncoderLayer(nn.Module):
    """Post-norm encoder layer (transformer.py:217-230)."""

    dim: int
    n_head: int
    ffn_dim: int
    dropout: float = 0.1
    sow_attn: bool = False
    dtype: Dtype = jnp.float32
    moe_experts: int = 0      # > 0: FFN becomes MoE (models/moe.py)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,
        pos: Optional[jnp.ndarray],
        key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        qkv = src if pos is None else src + pos
        attn = MultiheadAttention(
            self.dim, self.n_head, self.dropout, sow_weights=self.sow_attn,
            dtype=self.dtype, name="self_attn",
        )(qkv, qkv, qkv, key_padding_mask, deterministic=deterministic)
        src = src + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(src)
        ffn = _apply_ffn(self, src, deterministic, key_padding_mask)
        src = src + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(src)


class DecoderLayer(nn.Module):
    """Post-norm decoder layer (transformer.py:281-330): query self-attention,
    cross-attention into (memory + pos) keys AND values, FFN."""

    dim: int
    n_head: int
    ffn_dim: int
    dropout: float = 0.1
    sow_attn: bool = False
    dtype: Dtype = jnp.float32
    moe_experts: int = 0      # > 0: FFN becomes MoE (models/moe.py)
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        pos: Optional[jnp.ndarray],
        query_pos: Optional[jnp.ndarray],
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        # tgt_key_padding_mask: used by the S-length query models (gt/depth)
        # so padded query rows cannot contaminate real rows through the
        # decoder self-attention — the reference evaluates per video with no
        # padding (predict_breakfast.py:255), so masked == its B=1 forward
        q = tgt if query_pos is None else tgt + query_pos
        sa = MultiheadAttention(
            self.dim, self.n_head, self.dropout, sow_weights=self.sow_attn,
            dtype=self.dtype, name="self_attn",
        )(q, q, q, tgt_key_padding_mask, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(sa, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)

        mem = memory if pos is None else memory + pos
        ca = MultiheadAttention(
            self.dim, self.n_head, self.dropout, sow_weights=self.sow_attn,
            dtype=self.dtype, name="cross_attn",
        )(
            tgt if query_pos is None else tgt + query_pos,
            mem,
            mem,
            memory_key_padding_mask,
            deterministic=deterministic,
        )
        tgt = tgt + nn.Dropout(self.dropout)(ca, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)

        ffn = _apply_ffn(self, tgt, deterministic, tgt_key_padding_mask)
        tgt = tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)


def sinusoidal_positional_encoding(seq_len: int, dim: int) -> jnp.ndarray:
    """Standard sin/cos table (transformer.py:62-68). Returns [seq_len, dim]."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim)
    )
    pe = jnp.zeros((seq_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.adaptive_avg_pool1d over the middle axis of [B, T, C].

    Bin i averages x[floor(i*T/out), ceil((i+1)*T/out)) — computed as a
    static pooling matrix so it stays a single matmul under jit.
    """
    T = x.shape[1]
    starts = (jnp.arange(out_len) * T) // out_len
    ends = -((-(jnp.arange(out_len) + 1) * T) // out_len)  # ceil
    t = jnp.arange(T)
    sel = (t[None, :] >= starts[:, None]) & (t[None, :] < ends[:, None])
    weights = sel.astype(x.dtype) / jnp.maximum(ends - starts, 1)[:, None].astype(x.dtype)
    return jnp.einsum("ot,btc->boc", weights, x)


def masked_adaptive_avg_pool1d(
    x: jnp.ndarray, out_len: int, lengths: jnp.ndarray
) -> jnp.ndarray:
    """adaptive_avg_pool1d over only the first ``lengths[b]`` valid rows of
    each example — bin boundaries follow each row's TRUE length, exactly what
    torch's pool computes on an unpadded [1, L, C] input.

    Needed because the gt/depth query models pool the DECODER OUTPUT
    (futr_proposed.py:124); on our padded bucket batches a static pool would
    mix pad rows into every bin and shift the bin edges.  Per-row boundaries
    make the batched result equal the reference's per-video forward.
    """
    S = x.shape[1]
    q = jnp.arange(out_len)[None, :]                      # [1, n]
    L = lengths.astype(jnp.int32)[:, None]                # [B, 1]
    starts = (q * L) // out_len                           # [B, n]
    ends = -((-(q + 1) * L) // out_len)                   # ceil
    s = jnp.arange(S)[None, None, :]
    sel = (s >= starts[..., None]) & (s < ends[..., None])  # [B, n, S]
    w = sel.astype(x.dtype)
    w = w / jnp.maximum(w.sum(-1, keepdims=True), 1)
    return jnp.einsum("bns,bsc->bnc", w, x)
