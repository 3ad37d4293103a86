"""Pallas TPU attention kernel (encoder / long-sequence path).

The reference runs full O(S^2) nn.MultiheadAttention over sequences up to
3100 frames (opts.py:103, scripts/50s_train.sh). On TPU, K/V for one
(batch, head) easily fit VMEM at these scales (3100 x 64 fp32 = 0.8 MB), so
the kernel keeps whole K/V resident and tiles the query axis — one softmax
pass per q-tile, fp32 accumulation, key-padding folded in as an additive
bias row. No HBM round trip for the [S, S] score matrix (XLA materializes
it; at S=3100 that's 38 MB per head).

Backward = custom VJP with rematerialized composed math (same recipe as the
fuser kernel) — validated against autodiff in tests/test_attention_kernel.py.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min)


def composed_attention(q, k, v, bias, scale):
    """Plain-JAX reference: q,k,v [B,H,S,D]; bias [B,1,1,S] additive."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if bias is not None:
        scores = scores + bias
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0]                       # [BQ, D]
    k = k_ref[0]                       # [S, D]
    v = v_ref[0]
    b = bias_ref[0]                    # [1, S]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + b.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        w.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_attention(q, k, v, bias, scale, block_q: int = 256):
    B, H, S, D = q.shape
    Sk = k.shape[2]
    pad_q = (-S) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    Sq = q.shape[2]
    # lane-align K/V length; padded keys masked via bias
    pad_k = (-Sk) % 128
    if bias is None:
        bias = jnp.zeros((B, 1, 1, Sk), jnp.float32)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad_k)),
                       constant_values=_NEG)
    Skp = k.shape[2]
    bias_b = jnp.broadcast_to(bias, (B, H, 1, Skp))

    grid = (B * H, Sq // block_q)
    qs = q.reshape(B * H, Sq, D)
    ks = k.reshape(B * H, Skp, D)
    vs = v.reshape(B * H, Skp, D)
    bs = bias_b.reshape(B * H, 1, Skp)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skp, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skp, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Skp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sq * Skp * D,
            bytes_accessed=(2 * B * H * Sq * D + 2 * B * H * Skp * D)
            * q.dtype.itemsize,
            transcendentals=B * H * Sq * Skp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(qs, ks, vs, bs)
    out = out.reshape(B, H, Sq, D)
    return out[:, :, :S] if pad_q else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, bias, scale):
    """[B, H, S, D] attention with whole-K/V-in-VMEM query tiling."""
    return _pallas_attention(q, k, v, bias, scale)


def _fwd(q, k, v, bias, scale):
    return _pallas_attention(q, k, v, bias, scale), (q, k, v, bias)


def _bwd(scale, res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: composed_attention(q_, k_, v_, b_, scale),
        q, k, v, bias,
    )
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def flash_attention_sharded(q, k, v, bias, scale):
    """Mesh-aware entry point: shard the kernel over the active mesh's dp
    axis (batch) AND tp axis (heads, matching mesh.py's Megatron attention
    rules — q/k/v projections are head-parallel over tp, so keeping the head
    axis sharded here avoids an all-gather plus tp-redundant attention
    compute). A bare pallas_call under jit with sharded operands would make
    XLA gather everything to one device — same pattern as
    fuser_kernel._maybe_shard_mapped. Identity wrapper off-mesh."""
    from r3d_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.size == 1:
        return flash_attention(q, k, v, bias, scale)
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    batch_axis = "dp" if (dp > 1 and q.shape[0] % dp == 0) else None
    head_axis = "tp" if (tp > 1 and q.shape[1] % tp == 0) else None
    if batch_axis is None and head_axis is None:
        # nothing shardable on this mesh: the composed path partitions
        # cleanly under jit; a bare pallas_call would gather to one device
        return composed_attention(q, k, v, bias, scale)
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, k.shape[2]), jnp.float32)
    qkv_spec = P(batch_axis, head_axis)
    f = jax.shard_map(
        lambda q_, k_, v_, b_: flash_attention(q_, k_, v_, b_, scale),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(batch_axis)),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return f(q, k, v, bias)


def attention_kernel_eligible(Lq: int, Lk: int, D: int) -> bool:
    """Use the kernel when sequences are long enough to matter and one
    (batch, head)'s K/V fits VMEM with headroom."""
    from r3d_tpu.ops.fuser_kernel import pallas_enabled

    return (
        pallas_enabled()
        and Lq >= 256
        and Lq == Lk                     # self-attention shapes
        and Lk * D * 4 * 2 <= 4 * 1024 * 1024
    )
