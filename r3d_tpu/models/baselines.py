"""Ablation baselines: BiLSTM ("RNN"), pooling-only ("CNN"), dilated TCN.

Re-implement reference model/rnn.py, model/cnn.py, model/tcn.py with the
FUTR output contract (action/duration/seg + supcon stream).

TPU notes: the BiLSTM is expressed as two jax.lax.scan passes (fused cells);
the TCN's weight-normalized causal convolutions map to lax.conv with
left-padding + static dilation — all static-shape, MXU-eligible.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.config import ModelConfig
from r3d_tpu.models.futr import InputEmbed, _dtype
from r3d_tpu.models.layers import (
    adaptive_avg_pool1d, masked_adaptive_avg_pool1d, xavier,
)


def _lengths(src_pad_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """True-row counts from a (True = pad) suffix mask; None passes through."""
    if src_pad_mask is None:
        return None
    return jnp.sum(~src_pad_mask, axis=-1).astype(jnp.int32)


def _pool8(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> jnp.ndarray:
    """pool(8) over only each row's TRUE length: the reference evaluates
    per-video/unpadded (predict_nturgbd.py:304, B=1), so bucketed batches
    must pool with per-row bin edges or pad rows shift every bin
    (same rule as COMPAT #28 for the S-query models)."""
    if lengths is None:
        return adaptive_avg_pool1d(x, 8)  # rnn.py:97 hard-codes 8
    return masked_adaptive_avg_pool1d(x, 8, lengths)


class LSTMStack(nn.Module):
    """2-layer bidirectional LSTM, torch nn.LSTM semantics
    (rnn.py:20-21: hidden = dim//2 per direction, concat -> dim).

    ``seq_lengths`` makes the REVERSE pass start at each row's last true
    frame instead of the bucket's zero pad rows — without it a padded batch
    feeds pad state into every real row's backward direction and the
    bucketed forward diverges from the reference's unpadded per-video run.
    (Forward-direction pad contamination only reaches pad-row outputs,
    which downstream pooling/heads discard.)"""

    hidden: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 seq_lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        h = self.hidden // 2
        for layer in range(self.num_layers):
            fwd = nn.RNN(
                nn.OptimizedLSTMCell(h), name=f"l{layer}_fwd"
            )(x, seq_lengths=seq_lengths)
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(h), reverse=True, keep_order=True,
                name=f"l{layer}_bwd",
            )(x, seq_lengths=seq_lengths)
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class RNNAnticipator(nn.Module):
    """reference model/rnn.py: embed -> BiLSTM -> fc -> pool(8) -> heads."""

    cfg: ModelConfig
    n_class: int

    @nn.compact
    def __call__(self, features, src_pad_mask=None, *, train: bool = False) -> Dict:
        cfg = self.cfg
        lengths = _lengths(src_pad_mask)
        src = InputEmbed(cfg, self.n_class, name="embed")(features)
        rnn_out = LSTMStack(cfg.hidden_dim, dtype=_dtype(cfg), name="rnn")(
            src, lengths
        )
        tgt = nn.Dense(cfg.hidden_dim, kernel_init=xavier, dtype=_dtype(cfg),
                       name="rnn_fc")(rnn_out)
        pooled = _pool8(tgt, lengths)
        out: Dict = {}
        if cfg.anticipate:
            out["action"] = nn.Dense(self.n_class, kernel_init=xavier,
                                     dtype=_dtype(cfg), name="fc")(pooled).astype(jnp.float32)
            out["duration"] = nn.Dense(1, kernel_init=xavier, dtype=_dtype(cfg),
                                       name="fc_len")(pooled)[..., 0].astype(jnp.float32)
        if cfg.seg:
            out["seg"] = nn.Dense(self.n_class - 1, kernel_init=xavier,
                                  dtype=_dtype(cfg), name="fc_seg")(src).astype(jnp.float32)
        out["supcon"] = tgt
        return out


class CNNAnticipator(nn.Module):
    """reference model/cnn.py: embed -> pool(8) -> heads (no temporal model)."""

    cfg: ModelConfig
    n_class: int

    @nn.compact
    def __call__(self, features, src_pad_mask=None, *, train: bool = False) -> Dict:
        cfg = self.cfg
        lengths = _lengths(src_pad_mask)
        src = InputEmbed(cfg, self.n_class, name="embed")(features)
        pooled = _pool8(src, lengths)
        out: Dict = {}
        if cfg.anticipate:
            out["action"] = nn.Dense(self.n_class, kernel_init=xavier,
                                     dtype=_dtype(cfg), name="fc")(pooled).astype(jnp.float32)
            out["duration"] = nn.Dense(1, kernel_init=xavier, dtype=_dtype(cfg),
                                       name="fc_len")(pooled)[..., 0].astype(jnp.float32)
        if cfg.seg:
            out["seg"] = nn.Dense(self.n_class - 1, kernel_init=xavier,
                                  dtype=_dtype(cfg), name="fc_seg")(src).astype(jnp.float32)
        out["supcon"] = src
        return out


class WNCausalConv(nn.Module):
    """Weight-normalized causal dilated 1-D conv (tcn.py:17-19: conv +
    symmetric pad + chomp == left-pad only)."""

    features: int
    kernel_size: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        C_in = x.shape[-1]
        v = self.param(
            "v", nn.initializers.normal(0.01),
            (self.kernel_size, C_in, self.features),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(
                v.reshape(-1, self.features), axis=0
            ),
            (self.features,),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        norm = jnp.linalg.norm(v.reshape(-1, self.features), axis=0)
        kernel = (v * (g / jnp.maximum(norm, 1e-12))).astype(self.dtype)
        pad = (self.kernel_size - 1) * self.dilation
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel,
            window_strides=(1,), padding=[(pad, 0)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b.astype(self.dtype)


class TCNAnticipator(nn.Module):
    """reference model/tcn.py MustafaNet1DTCN: 4-level dilated TCN ->
    1x1 regression -> [B, anticipated_frames, n_class]."""

    cfg: ModelConfig
    n_class: int
    channels: Tuple[int, ...] = (256, 512, 512, 256)
    kernel_size: int = 3
    anticipated_frames: int = 8
    drop: float = 0.2

    @nn.compact
    def __call__(self, features, src_pad_mask=None, *, train: bool = False) -> Dict:
        x = features.astype(_dtype(self.cfg))
        deterministic = not train
        for i, ch in enumerate(self.channels):
            dilation = 2 ** i
            y = WNCausalConv(ch, self.kernel_size, dilation,
                             dtype=_dtype(self.cfg), name=f"block{i}_conv1")(x)
            y = nn.Dropout(self.drop)(nn.relu(y), deterministic=deterministic)
            y = WNCausalConv(ch, self.kernel_size, dilation,
                             dtype=_dtype(self.cfg), name=f"block{i}_conv2")(y)
            y = nn.Dropout(self.drop)(nn.relu(y), deterministic=deterministic)
            if x.shape[-1] != ch:
                x = nn.Conv(ch, (1,), kernel_init=nn.initializers.normal(0.01),
                            dtype=_dtype(self.cfg), name=f"block{i}_down")(x)
            x = nn.relu(y + x)
        logits = nn.Conv(
            self.n_class * self.anticipated_frames, (1,),
            dtype=_dtype(self.cfg), name="regression",
        )(x)  # [B, T, Q*C]
        B, T, _ = logits.shape
        logits = logits.reshape(B, T, self.anticipated_frames, self.n_class)
        lengths = _lengths(src_pad_mask)
        if lengths is None:
            action = jnp.mean(logits, axis=1)  # mean over time
        else:
            # causal (left-pad-only) convs keep valid rows clean of suffix
            # padding; only the temporal mean needs the true length
            valid = (
                jnp.arange(T)[None, :] < lengths[:, None]
            ).astype(logits.dtype)[..., None, None]
            action = jnp.sum(logits * valid, axis=1) / jnp.maximum(
                lengths, 1
            ).astype(logits.dtype)[:, None, None]
        return {"action": action.astype(jnp.float32)}
