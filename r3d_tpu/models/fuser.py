"""Rank-enhancing Token Fuser (CMFuser) variants — the heart of R3D.

Re-implements the observable math of:
- ``model/futr_safuser_batchnormalization.py:17-107`` (BN-γ ranked α-blend,
  the variant main_utkinects/main_darai actually run) — ``CMFuserBN``;
- ``model/futr_safuser_tokenfusion.py:17-97`` (gradient-probe ranked hard
  channel swap + outer residual) — ``CMFuserGrad``;
- ``model/futr_safuser_tokenfusion_vary.py`` (activation ranking, α·other
  exchange, α init ones) — ``CMFuserVary``;
- ``model/futr_safuser_depth.py`` / ``model/afft.py`` (AFFT-style SA fusion
  with no channel exchange) — ``CMFuserNoExchange``.

TPU-first notes
---------------
The fuser's "2-token self-attention" uses a -inf diagonal mask over exactly
two modality tokens (bn:80-88). For N=2 the post-mask softmax row is one-hot
on the *other* token, so the whole QK^T/softmax dance reduces EXACTLY to a
value swap: ``attn_out_i = W_o (W_v h_{1-i}) + b_o`` (no approximation; the
reference's attn_drop/proj_drop are 0). ``two_token_exact=True`` uses that
closed form — one [B*T,2,C]x[C,C] matmul instead of qkv+softmax+pv — and is
tested bit-close against the general path.

Channel selection (bottom-k by |BN γ|) is data-dependent but tiny (a [C]
vector); it compiles to one top_k + scatter per step, not a kernel concern.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.models.layers import xavier


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch BatchNorm1d semantics over [B, T, C] inputs:
    batch statistics reduce over (B, T); normalization uses biased variance;
    the running-variance update uses the unbiased estimate; running stats
    update as ``running = 0.9*running + 0.1*batch`` (torch momentum 0.1).

    Written out (rather than flax nn.BatchNorm) so the fuser can read γ for
    channel ranking (futr_safuser_batchnormalization.py:48-49) and so running
    statistics match the torch reference bit-for-bit in parity tests.
    """

    features: int
    epsilon: float = 1e-5
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool, stats_only: bool = False
    ):
        """Returns (normalized, |gamma|), or (mean, var, scale, bias) when
        ``stats_only`` (the fused-kernel path folds the affine itself).
        Running statistics update in train mode either way."""
        C = self.features
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))

        if train:
            # Plain two-reduction statistics. A single-pass shifted-E[x^2]
            # form was built and A/B-measured (tools/measure_r3.py, v5e,
            # interleaved): 0.95x at B=8 / 1.00x at B=64 — XLA already
            # fuses the mean and centered-variance reductions into one pass
            # over the stream, so the "saved read" did not exist and the
            # extra shift was pure overhead. Keeping the numerically
            # simplest form (ROADMAP round-3 measurements).
            n = x.shape[0] * x.shape[1]
            mean = jnp.mean(x.astype(jnp.float32), axis=(0, 1))
            var = jnp.mean(
                (x.astype(jnp.float32) - mean) ** 2, axis=(0, 1)
            )
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        if stats_only:
            return mean, var, scale, bias

        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x - mean.astype(x.dtype)) * (inv * scale).astype(x.dtype) + bias.astype(x.dtype)
        return y, jnp.abs(scale)


def bottomk_mask(scores: jnp.ndarray, k: int) -> jnp.ndarray:
    """Boolean [C] mask of the k smallest entries (torch.topk largest=False)."""
    C = scores.shape[-1]
    if k <= 0:
        return jnp.zeros((C,), dtype=bool)
    _, idx = jax.lax.top_k(-scores, k)
    return jnp.zeros((C,), dtype=bool).at[idx].set(True)


def _layernorm(x, scale, bias, dtype, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


class FuserBlock(nn.Module):
    """Pre-norm timm Block (transformerblock.py:118-135): masked multi-head
    self-attention + GELU MLP, both residual.

    Params are owned flat (setup, not submodules) so the fused Pallas path in
    ``_SAFuserCore`` can consume them directly alongside this composed path.
    """

    dim: int
    n_head: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    two_token_exact: bool = True
    drop_rate: float = 0.1
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.dim
        Ch = int(C * self.mlp_ratio)
        zeros = nn.initializers.zeros
        ones = nn.initializers.ones
        self.norm1_scale = self.param("norm1_scale", ones, (C,))
        self.norm1_bias = self.param("norm1_bias", zeros, (C,))
        self.qkv_kernel = self.param("qkv_kernel", xavier, (C, 3 * C))
        self.qkv_b = (
            self.param("qkv_bias", zeros, (3 * C,)) if self.qkv_bias else None
        )
        self.proj_kernel = self.param("proj_kernel", xavier, (C, C))
        self.proj_bias = self.param("proj_bias", zeros, (C,))
        self.norm2_scale = self.param("norm2_scale", ones, (C,))
        self.norm2_bias = self.param("norm2_bias", zeros, (C,))
        self.mlp1_kernel = self.param("mlp1_kernel", xavier, (C, Ch))
        self.mlp1_bias = self.param("mlp1_bias", zeros, (Ch,))
        self.mlp2_kernel = self.param("mlp2_kernel", xavier, (Ch, C))
        self.mlp2_bias = self.param("mlp2_bias", zeros, (C,))

    def __call__(
        self,
        x: jnp.ndarray,                 # [B, N, C]
        diag_neg_inf_mask: bool = True,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        C, H = self.dim, self.n_head
        dt = self.dtype
        h = _layernorm(x, self.norm1_scale, self.norm1_bias, dt)

        def apply(y, kernel, b):
            out = y @ kernel.astype(y.dtype)
            return out if b is None else out + b.astype(y.dtype)

        N = x.shape[1]
        if self.two_token_exact and N == 2 and diag_neg_inf_mask:
            # exact closed form: softmax over {-inf self, finite other} is
            # one-hot(other) -> attention output is the value of the OTHER
            # token. Only the V third of the qkv projection is needed.
            v = apply(
                h, self.qkv_kernel[:, 2 * C :],
                None if self.qkv_b is None else self.qkv_b[2 * C :],
            )
            attn_out = apply(v[:, ::-1, :], self.proj_kernel, self.proj_bias)
        else:
            qkv = apply(h, self.qkv_kernel, self.qkv_b).reshape(
                x.shape[0], N, 3, H, C // H
            )
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scale = (C // H) ** -0.5
            scores = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            if diag_neg_inf_mask:
                neg = jnp.finfo(jnp.float32).min
                scores = scores + jnp.where(
                    jnp.eye(N, dtype=bool), neg, 0.0
                ).astype(scores.dtype)
            w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(dt)
            attn_out = apply(
                jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(x.shape[0], N, C),
                self.proj_kernel, self.proj_bias,
            )
        x = x + attn_out

        h2 = _layernorm(x, self.norm2_scale, self.norm2_bias, dt)
        m = nn.gelu(apply(h2, self.mlp1_kernel, self.mlp1_bias), approximate=False)
        return x + apply(m, self.mlp2_kernel, self.mlp2_bias)


class _SAFuserCore(nn.Module):
    """Shared tail: stack two modality streams, dropout, Blocks with the
    -inf-diagonal mask, (optional outer residual), LayerNorm, mean over the
    modality axis (bn:85-105, tokenfusion:74-97)."""

    dim: int
    depth: int
    n_head: int
    outer_residual: bool
    two_token_exact: bool = True
    drop_rate: float = 0.1
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stacked: jnp.ndarray, deterministic: bool = True,
                 blend=None) -> jnp.ndarray:
        """``blend``: optional BlendParams — ``stacked`` then carries the RAW
        modality streams and the BN-affine + alpha-blend prologue fuses into
        the kernel (or runs composed first)."""
        B, T, M, C = stacked.shape
        x = stacked.reshape(B * T, M, C)

        block0 = FuserBlock(
            self.dim, self.n_head, two_token_exact=self.two_token_exact,
            dtype=self.dtype, name="block0",
        )
        norm_scale = self.param("norm_scale", nn.initializers.ones, (C,))
        norm_bias = self.param("norm_bias", nn.initializers.zeros, (C,))

        from r3d_tpu.ops.fuser_kernel import pallas_enabled

        kernel_ok = (
            self.use_pallas
            and self.depth == 1
            and self.two_token_exact
            and M == 2
            and not block0.qkv_bias
            and pallas_enabled()
        )
        no_dropout = deterministic or self.drop_rate == 0.0

        def tail_params():
            from r3d_tpu.ops.fuser_kernel import FuserTailParams

            wvp = block0.qkv_kernel[:, 2 * C :] @ block0.proj_kernel
            return FuserTailParams(
                norm1_scale=block0.norm1_scale, norm1_bias=block0.norm1_bias,
                wvp=wvp, proj_bias=block0.proj_bias,
                norm2_scale=block0.norm2_scale, norm2_bias=block0.norm2_bias,
                mlp1_kernel=block0.mlp1_kernel, mlp1_bias=block0.mlp1_bias,
                mlp2_kernel=block0.mlp2_kernel, mlp2_bias=block0.mlp2_bias,
                norm_out_scale=norm_scale, norm_out_bias=norm_bias,
            )

        if kernel_ok and blend is not None and no_dropout:
            # whole CMFuser in one kernel (BN + blend + tail)
            from r3d_tpu.ops.fuser_kernel import fused_bn_blend_tail_sharded

            fused = fused_bn_blend_tail_sharded(
                x[:, 0, :], x[:, 1, :], blend, tail_params(), self.outer_residual
            )
            return fused.astype(self.dtype).reshape(B, T, C)

        if blend is not None:
            # composed prologue (dropout must sit between blend and blocks)
            from r3d_tpu.ops.fuser_kernel import composed_bn_blend

            ex_r, ex_d = composed_bn_blend(x[:, 0, :], x[:, 1, :], blend)
            x = jnp.stack([ex_r, ex_d], axis=1)

        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)

        if kernel_ok:
            from r3d_tpu.ops.fuser_kernel import fused_safuser_tail_sharded

            fused = fused_safuser_tail_sharded(
                x[:, 0, :], x[:, 1, :], tail_params(), self.outer_residual
            )
            return fused.astype(self.dtype).reshape(B, T, C)

        x_res = x
        x = block0(x, diag_neg_inf_mask=True, deterministic=deterministic)
        for i in range(1, self.depth):
            x = FuserBlock(
                self.dim, self.n_head, two_token_exact=self.two_token_exact,
                dtype=self.dtype, name=f"block{i}",
            )(x, diag_neg_inf_mask=True, deterministic=deterministic)
        if self.outer_residual:
            x = x + x_res
        x = _layernorm(x, norm_scale, norm_bias, self.dtype)
        return jnp.mean(x, axis=1).reshape(B, T, C)


class CMFuserBN(nn.Module):
    """BN variant (futr_safuser_batchnormalization.py): per-modality
    BatchNorm over (B,T); bottom-10% channels by |γ| are α-blended with the
    other modality; SA-Fuser tail WITHOUT outer residual."""

    dim: int
    depth: int = 1
    n_head: int = 8
    exchange_frac: float = 0.1
    two_token_exact: bool = True
    drop_rate: float = 0.1
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32
    # torch module.eval() BN semantics while training (sticky-eval loops,
    # TrainConfig.sticky_eval): normalize with running stats, never update.
    frozen: bool = False

    @nn.compact
    def __call__(
        self, rgb: jnp.ndarray, depth: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        from r3d_tpu.ops.fuser_kernel import BlendParams

        C = self.dim
        eps = 1e-5
        bn_train = train and not self.frozen
        mean_r, var_r, sc_r, bi_r = TorchBatchNorm(
            C, dtype=self.dtype, name="bn_rgb"
        )(rgb, train=bn_train, stats_only=True)
        mean_d, var_d, sc_d, bi_d = TorchBatchNorm(
            C, dtype=self.dtype, name="bn_depth"
        )(depth, train=bn_train, stats_only=True)

        k = max(0, int(C * self.exchange_frac))
        mask_rgb = bottomk_mask(jnp.abs(sc_r), k)
        mask_depth = bottomk_mask(jnp.abs(sc_d), k)
        alpha = self.param("alpha", nn.initializers.uniform(1.0), (1, 1, C))

        # fold BN into per-channel affine vectors (scale = gamma*rsqrt(var+eps))
        scale_r = sc_r * jax.lax.rsqrt(var_r + eps)
        scale_d = sc_d * jax.lax.rsqrt(var_d + eps)
        blend = BlendParams(
            scale_r=scale_r, shift_r=bi_r - mean_r * scale_r,
            scale_d=scale_d, shift_d=bi_d - mean_d * scale_d,
            mask_r=mask_rgb.astype(jnp.float32),
            mask_d=mask_depth.astype(jnp.float32),
            alpha=alpha[0, 0],
        )

        stacked = jnp.stack([rgb, depth], axis=2)  # raw streams [B,T,2,C]
        return _SAFuserCore(
            self.dim, self.depth, self.n_head, outer_residual=False,
            two_token_exact=self.two_token_exact, drop_rate=self.drop_rate,
            use_pallas=self.use_pallas, dtype=self.dtype, name="safuser",
        )(stacked, deterministic=not train, blend=blend)


class CMFuserGrad(nn.Module):
    """Gradient-probe variant (futr_safuser_tokenfusion.py): rank channels by
    |∂(mean(rgb)+mean(depth))/∂feats| in train (a constant — the probe is
    vacuous, so bottom-k == the first C/4 channels; reproduced faithfully and
    recorded in COMPAT.md) or by activation magnitude at eval; HARD swap of
    the selected channels; SA-Fuser tail WITH outer residual."""

    dim: int
    depth: int = 1
    n_head: int = 8
    two_token_exact: bool = True
    drop_rate: float = 0.1
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, rgb: jnp.ndarray, depth: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        C = self.dim
        if train:
            # literal probe: grads of (rgb.mean() + depth.mean()) w.r.t. inputs
            g_rgb, g_depth = jax.grad(
                lambda r, d: jnp.mean(r) + jnp.mean(d), argnums=(0, 1)
            )(rgb, depth)
            score_rgb = jnp.mean(jnp.abs(g_rgb), axis=(0, 1))
            score_depth = jnp.mean(jnp.abs(g_depth), axis=(0, 1))
        else:
            score_rgb = jnp.mean(jnp.abs(rgb), axis=(0, 1))
            score_depth = jnp.mean(jnp.abs(depth), axis=(0, 1))

        k = C // 4
        mask_rgb = bottomk_mask(score_rgb, k)
        mask_depth = bottomk_mask(score_depth, k)
        ex_rgb = jnp.where(mask_rgb, depth, rgb)
        ex_depth = jnp.where(mask_depth, rgb, depth)

        stacked = jnp.stack([ex_rgb, ex_depth], axis=2)
        return _SAFuserCore(
            self.dim, self.depth, self.n_head, outer_residual=True,
            two_token_exact=self.two_token_exact, drop_rate=self.drop_rate,
            use_pallas=self.use_pallas, dtype=self.dtype, name="safuser",
        )(stacked, deterministic=not train)


class CMFuserVary(nn.Module):
    """Vary ablation (futr_safuser_tokenfusion_vary.py): activation-magnitude
    ranking always; exchanged channels become α·other (no blend of own);
    α initialized to ones; NO outer residual (the vary file comments out
    ``x = x + x_res`` that the grad variant keeps, _vary.py:79-81)."""

    dim: int
    depth: int = 1
    n_head: int = 8
    two_token_exact: bool = True
    drop_rate: float = 0.1
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, rgb: jnp.ndarray, depth: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        C = self.dim
        score_rgb = jnp.mean(jnp.abs(rgb), axis=(0, 1))
        score_depth = jnp.mean(jnp.abs(depth), axis=(0, 1))
        k = C // 4
        mask_rgb = bottomk_mask(score_rgb, k)
        mask_depth = bottomk_mask(score_depth, k)

        alpha = self.param("alpha", nn.initializers.ones, (1, 1, C))
        a = alpha.astype(rgb.dtype)
        ex_rgb = jnp.where(mask_rgb, a * depth, rgb)
        ex_depth = jnp.where(mask_depth, a * rgb, depth)

        stacked = jnp.stack([ex_rgb, ex_depth], axis=2)
        return _SAFuserCore(
            self.dim, self.depth, self.n_head, outer_residual=False,
            two_token_exact=self.two_token_exact, drop_rate=self.drop_rate,
            use_pallas=self.use_pallas, dtype=self.dtype, name="safuser",
        )(stacked, deterministic=not train)


class CMFuserNoExchange(nn.Module):
    """AFFT-style fusion without channel exchange (futr_safuser_depth.py /
    afft.py): a learned modality token is added to each stream, then the
    SA-Fuser tail runs on the plain stack."""

    dim: int
    depth: int = 1
    n_head: int = 8
    use_modality_token: bool = True
    two_token_exact: bool = True
    drop_rate: float = 0.1
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, rgb: jnp.ndarray, depth: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        stacked = jnp.stack([rgb, depth], axis=2)  # [B,T,2,C]
        if self.use_modality_token:
            tok = self.param(
                "modality_token", nn.initializers.normal(1.0), (1, 1, 1, self.dim)
            )
            stacked = stacked + tok.astype(stacked.dtype)
        return _SAFuserCore(
            self.dim, self.depth, self.n_head, outer_residual=False,
            two_token_exact=self.two_token_exact, drop_rate=self.drop_rate,
            use_pallas=self.use_pallas, dtype=self.dtype, name="safuser",
        )(stacked, deterministic=not train)
