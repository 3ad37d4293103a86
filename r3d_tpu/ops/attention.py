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
    # cross-attention shapes (decoder: n_query=20 against S=3100 keys,
    # scripts/50s_train.sh) have tiny Lq — shrink the q tile to the next
    # sublane multiple instead of padding 20 rows up to 256
    block_q = min(block_q, -(-S // 8) * 8)
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
    import os

    if os.environ.get("R3D_ATTN_PALLAS_BWD") != "0":
        # Pallas backward is the default (measured, tools/measure_r3.py,
        # v5e, S=3100 bf16 self-attention): 1.49x vs the remat-composed vjp
        # at B=8 (20.0 vs 29.8 ms), and at B=64 it is the ONLY form that
        # runs — rematerializing the [S, S] scores in fp32 needs ~19.7 GB
        # HBM (measured OOM). rate=0 takes the PRNG-free path, so this also
        # works in interpret mode.
        had_bias = bias is not None
        dq, dk, dv, db = _pallas_attention_bwd(
            q, k, v, bias, 0, scale, 0.0, g
        )
        return dq, dk, dv, (db if had_bias else None)
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


def _dropout_keep(rate: float, shape):
    """Regenerable keep-mask: MUST be called right after pltpu.prng_seed
    with identical arguments in the forward and backward kernels so both
    see the same bits."""
    bits = pltpu.prng_random_bits(shape)  # int32 on Mosaic — bitcast!
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    threshold = jnp.uint32(int(rate * 4294967296.0))
    return (bits >= threshold).astype(jnp.float32) / (1.0 - rate)


def _kernel_dropout(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                    scale, rate):
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b = bias_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + b.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    if rate > 0.0:  # static; rate=0 must not touch the TPU PRNG primitives
        # Mosaic caps prng_seed at 2 values — fold the grid position into
        # one (j < 2^16 q-tiles per (batch, head) is ample)
        pltpu.prng_seed(seed_ref[0], i * 65536 + j)
        w = w * _dropout_keep(rate, w.shape)
    o_ref[0] = jnp.dot(
        w.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel_dropout(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, db_ref, *, scale, rate):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])
        db_ref[0] = jnp.zeros_like(db_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b = bias_ref[0]
    g = g_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    s = s + b.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)       # pre-dropout softmax
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * 65536 + j)  # same stream as fwd
        keep = _dropout_keep(rate, w.shape)
    else:
        keep = 1.0
    wd = w * keep
    dv_ref[0] += jnp.dot(
        wd.astype(g.dtype).T, g, preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dwd = jnp.dot(g, v.astype(g.dtype).T, preferred_element_type=jnp.float32)
    dw = dwd * keep
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq_ref[0] = (jnp.dot(ds, k.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_ref[0] += (jnp.dot(ds.T, q.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
                  * scale).astype(dk_ref.dtype)
    db_ref[0] += jnp.sum(ds, axis=0, keepdims=True).astype(db_ref.dtype)


def _prep(q, k, v, bias, block_q):
    """Shared padding/reshape for the dropout fwd+bwd kernels; returns
    (qs, ks, vs, bs, shapes)."""
    B, H, S, D = q.shape
    Sk = k.shape[2]
    block_q = min(block_q, -(-S // 8) * 8)
    pad_q = (-S) % block_q
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    Sq = q.shape[2]
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
    return (
        q.reshape(B * H, Sq, D), k.reshape(B * H, Skp, D),
        v.reshape(B * H, Skp, D), bias_b.reshape(B * H, 1, Skp),
        (B, H, S, Sk, D, Sq, Skp, block_q),
    )


def _train_block_q(Lk: int, block_q: int = 256) -> int:
    """q-tile size shared by the dropout forward AND backward kernels.

    The backward keeps ~4 live [block_q, Skp] fp32 intermediates (w, dwd,
    dw, ds) next to K/V and the dk/dv accumulators — at Skp>1024 a 256-row
    tile blows the 16MB scoped-VMEM limit (measured 17.2M at S=3100), so
    long-key shapes halve the tile. The FORWARD must use the identical rule:
    the dropout keep-mask is regenerated in the backward from (seed, grid
    position, block shape), so any fwd/bwd tile mismatch silently
    decorrelates the masks (tests/test_attention_kernel.py pins fwd == bwd
    tiling; the TPU mask-consistency test covers Lk > 1024)."""
    return min(block_q, 128) if Lk > 1024 else block_q


def _pallas_attention_dropout(q, k, v, bias, seed, scale, rate,
                              block_q: int = 256):
    block_q = _train_block_q(k.shape[2], block_q)
    qs, ks, vs, bs, (B, H, S, Sk, D, Sq, Skp, block_q) = _prep(
        q, k, v, bias, block_q
    )
    grid = (B * H, Sq // block_q)
    out = pl.pallas_call(
        functools.partial(_kernel_dropout, scale=scale, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, Skp, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, Skp, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, Skp), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda i, j, *_: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), qs, ks, vs, bs)
    out = out.reshape(B, H, Sq, D)
    return out[:, :, :S] if Sq != S else out


def _pallas_attention_bwd(q, k, v, bias, seed, scale, rate, g,
                          block_q: int = 256):
    # tile rule MUST match the dropout forward's (see _train_block_q)
    block_q = _train_block_q(k.shape[2], block_q)
    qs, ks, vs, bs, (B, H, S, Sk, D, Sq, Skp, block_q) = _prep(
        q, k, v, bias, block_q
    )
    gp = g
    if Sq != S:
        gp = jnp.pad(g, ((0, 0), (0, 0), (0, Sq - S), (0, 0)))
    gs = gp.reshape(B * H, Sq, D)
    grid = (B * H, Sq // block_q)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel_dropout, scale=scale, rate=rate),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, Skp, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, Skp, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, Skp), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, block_q, D), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, Skp, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, Skp, D), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, Skp), lambda i, j, *_: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, Sq, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, Skp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, Skp, D), jnp.float32),
            jax.ShapeDtypeStruct((B * H, 1, Skp), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), qs, ks, vs, bs, gs)
    dq = dq.reshape(B, H, Sq, D)[:, :, :S]
    dk = dk.reshape(B, H, Skp, D)[:, :, :Sk].astype(k.dtype)
    dv = dv.reshape(B, H, Skp, D)[:, :, :Sk].astype(v.dtype)
    # bias is [B, 1, 1, Sk] broadcast over heads and query rows
    db = db.reshape(B, H, 1, Skp)[:, :, :, :Sk].sum(axis=1, keepdims=True)
    return dq, dk, dv, db.astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_dropout(q, k, v, bias, seed, scale, rate):
    """Training-path attention: kernel forward WITH attention-weight dropout
    (torch nn.MultiheadAttention semantics — dropout on the softmax weights,
    scaled 1/(1-p)) and a Pallas backward that regenerates the identical
    keep-mask from (seed, grid position) instead of storing the [Lq, Lk]
    mask. The mask stream is the TPU PRNG's, not flax's — same marginal
    distribution, different draws (dropout is the one place train
    trajectories are allowed to differ from composed XLA)."""
    return _pallas_attention_dropout(q, k, v, bias, seed, scale, rate)


def _fwd_do(q, k, v, bias, seed, scale, rate):
    out = _pallas_attention_dropout(q, k, v, bias, seed, scale, rate)
    return out, (q, k, v, bias, seed)


def _bwd_do(scale, rate, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv, db = _pallas_attention_bwd(q, k, v, bias, seed, scale, rate, g)
    return dq, dk, dv, db, None


flash_attention_dropout.defvjp(_fwd_do, _bwd_do)


def flash_attention_dropout_sharded(q, k, v, bias, seed, scale, rate):
    """Mesh-aware twin of flash_attention_sharded for the dropout path; the
    per-shard seed folds in the dp/tp coordinates so shards draw independent
    masks."""
    from r3d_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.size == 1:
        return flash_attention_dropout(q, k, v, bias, seed, scale, rate)
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    batch_axis = "dp" if (dp > 1 and q.shape[0] % dp == 0) else None
    head_axis = "tp" if (tp > 1 and q.shape[1] % tp == 0) else None
    if batch_axis is None and head_axis is None:
        # nothing shardable: composed attention with the same dropout
        # semantics (bernoulli keep-mask scaled 1/(1-p))
        w_keep = jax.random.bernoulli(
            jax.random.PRNGKey(seed), 1.0 - rate,
            (q.shape[0], q.shape[1], q.shape[2], k.shape[2]),
        )
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if bias is not None:
            s = s + bias
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        w = w * w_keep / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", w.astype(q.dtype), v)
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, k.shape[2]), jnp.float32)
    qkv_spec = P(batch_axis, head_axis)

    def local(q_, k_, v_, b_):
        s = seed
        if batch_axis:
            s = s + 1000003 * jax.lax.axis_index(batch_axis)
        if head_axis:
            s = s + 7919 * jax.lax.axis_index(head_axis)
        return flash_attention_dropout(q_, k_, v_, b_, s, scale, rate)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, P(batch_axis)),
        out_specs=qkv_spec, check_vma=False,
    )
    return f(q, k, v, bias)


def attention_kernel_eligible(Lq: int, Lk: int, D: int) -> bool:
    """Use the kernel when the KEY side is long enough to matter (the [Lq,
    Lk] score matrix is what XLA round-trips through HBM) and one (batch,
    head)'s K/V fits VMEM with headroom. Covers both self-attention
    (Lq == Lk) and the decoder's cross-attention (tiny Lq, e.g. n_query=20
    against S=3100 keys) — the kernel tiles q adaptively."""
    from r3d_tpu.ops.fuser_kernel import pallas_enabled

    # Cross-attention boundary is MEASURED (tools/measure_r3.py, v5e,
    # interleaved A/B of the full train step): tiny-Lq kernels win at short
    # keys (fusion 8x256: 1.17x) but LOSE at long keys (50salads 20x3100:
    # 0.80x — the per-(batch,head) sequential grid underutilizes against
    # XLA's batched einsum when q has so few rows), so small-Lq cross
    # shapes stay composed beyond Lk=512. Self-attention keeps the r2 win
    # (1.35x at S=3100).
    return (
        pallas_enabled()
        and Lk >= 256
        and (Lq == Lk or Lk <= 512 or Lq >= 256)
        and Lk * D * 4 * 2 <= 4 * 1024 * 1024
    )


def attention_dropout_kernel_eligible(Lq: int, Lk: int, D: int) -> bool:
    """The train path (attention-weight dropout > 0) additionally requires a
    REAL TPU: the in-kernel keep-mask comes from the TPU PRNG
    (pltpu.prng_random_bits), which interpret mode stubs out to zeros."""
    return attention_kernel_eligible(Lq, Lk, D) and jax.default_backend() == "tpu"
