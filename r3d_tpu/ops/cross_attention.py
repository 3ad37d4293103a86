"""Native-layout decoder cross-attention kernel (tiny Lq vs long keys).

The 50salads decoder attends n_query=20 queries against S=3100 keys
(scripts/50s_train.sh; model/extras/transformer.py:300-304). The composed
XLA path and the generic [B,H,S,D] kernel (ops/attention.py) both force the
K/V projection outputs through head-major relayouts — profiling the train
step shows 8 full [B,S,C] copies (~0.66 ms of a ~5 ms step) plus head-axis
batched einsums that underutilize with 20-row LHS tiles.

This kernel consumes q [B,Lq,C] and k/v in their NATIVE [B,S,C] projection
layout (C = H*D), so the relayouts vanish on both the forward AND backward
paths (dk/dv are written in native layout too). Grid = (batch, key-blocks);
the head loop runs inside the kernel on VMEM-resident slabs; softmax is
accumulated online (flash style) in f32 scratch, so VMEM stays small and
the eligibility is not capped by whole-K/V residency.

Dropout on the attention weights (torch semantics) regenerates the keep
mask in the backward from (seed, batch, key-block, head) — same recipe as
ops/attention.py's train path.

Equivalence vs composed XLA: tests/test_attention_kernel.py (interpret mode
on CPU; rate=0 bit-close, grads included).

MEASURED OFF BY DEFAULT (tools/measure_r3.py measure_cross_native, v5e,
same-process interleaved): the full 50salads train step is 0.986x at B=8
(7.237 -> 7.338 ms) and 0.976x at B=64 (36.93 -> 37.83 ms) with this kernel
vs the composed decoder cross — the relayout copies it removes are repaid
by the per-head 20-row matmuls underutilizing the MXU, which XLA's batched
einsum avoids. Opt in with R3D_CROSS_NATIVE=1 (or R3D_FORCE_PALLAS=1 for
tests); the routing stays honest to the measurement by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min)

# the keep-mask generator is shared with ops/attention.py — both kernels'
# backwards regenerate the forward's mask from the same PRNG recipe, and the
# two modules must never drift apart on it
from r3d_tpu.ops.attention import _dropout_keep as _keep_mask  # noqa: E402


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                m_out_ref, l_out_ref, m_ref, l_ref, acc_ref, *,
                scale, rate, H, NK):
    """One (batch, key-block) cell: online-softmax update for every head.

    acc/m/l scratch persist across the sequential key-block axis; the
    normalized output writes once at the last block.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                           # [Lqp, C]
    k = k_ref[0]                           # [SB, C]
    v = v_ref[0]
    b = bias_ref[0].astype(jnp.float32)    # [1, SB]
    Lqp = q.shape[0]
    D = q.shape[1] // H
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D]
        kh = k[:, h * D:(h + 1) * D]
        vh = v[:, h * D:(h + 1) * D]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        s = s + b                          # [Lqp, SB]
        m_prev = m_ref[h]                  # [Lqp]
        l_prev = l_ref[h]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)    # rescale of old accumulators
        e = jnp.exp(s - m_new[:, None])
        l_ref[h] = l_prev * alpha + jnp.sum(e, axis=-1)
        m_ref[h] = m_new
        if rate > 0.0:                     # static branch
            pltpu.prng_seed(seed_ref[0], (i * NK + j) * H + h)
            e = e * _keep_mask(rate, e.shape)
        acc_ref[:, h * D:(h + 1) * D] = (
            acc_ref[:, h * D:(h + 1) * D] * alpha[:, None]
            + jnp.dot(e.astype(v.dtype), vh,
                      preferred_element_type=jnp.float32)
        )

    @pl.when(j == NK - 1)
    def _finalize():
        acc = acc_ref[...]
        out = jnp.concatenate(
            [
                acc[:, h * D:(h + 1) * D]
                / jnp.maximum(l_ref[h], 1e-30)[:, None]
                for h in range(H)
            ],
            axis=1,
        )
        o_ref[0] = out.astype(o_ref.dtype)
        # softmax stats ship as tiny [B,H,Lqp] outputs (8 KB at the
        # 50salads shape) so the backward rebuilds w without touching the
        # scores — no big recompute einsum, no K relayout
        m_out_ref[0] = m_ref[...]
        l_out_ref[0] = l_ref[...]


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref, o_ref,
                m_in_ref, l_in_ref,
                dq_ref, dk_ref, dv_ref, db_ref, dq_acc, *,
                scale, rate, H, NK):
    """One (batch, key-block) cell of the backward.

    Uses the flash identity delta = rowsum(g * o) (valid under weight
    dropout too: sum_k w.keep.(g v^T) = g . sum_k w.keep.v = g.o), and the
    softmax stats (m, l) recomputed on host side per batch (tiny).
    dk/dv/db write per-block in NATIVE layout; dq accumulates in scratch.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    b = bias_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)       # [Lqp, C]
    o = o_ref[0].astype(jnp.float32)
    D = q.shape[1] // H
    db = jnp.zeros(b.shape, jnp.float32)
    for h in range(H):
        qh = q[:, h * D:(h + 1) * D]
        kh = k[:, h * D:(h + 1) * D]
        vh = v[:, h * D:(h + 1) * D]
        gh = g[:, h * D:(h + 1) * D]
        oh = o[:, h * D:(h + 1) * D]
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32) * scale
        s = s + b
        # full softmax weights from the forward's stats
        w = jnp.exp(s - m_in_ref[0, h][:, None]) / jnp.maximum(
            l_in_ref[0, h], 1e-30
        )[:, None]
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], (i * NK + j) * H + h)
            keep = _keep_mask(rate, w.shape)
        else:
            keep = 1.0
        wd = w * keep
        dv_ref[0, :, h * D:(h + 1) * D] = jnp.dot(
            wd.astype(gh.dtype).T, gh, preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        dwd = jnp.dot(gh, vh.astype(gh.dtype).T,
                      preferred_element_type=jnp.float32)
        dw = dwd * keep
        delta = jnp.sum(gh * oh, axis=-1)          # [Lqp]
        ds = w * (dw - delta[:, None])
        dq_acc[:, h * D:(h + 1) * D] += (
            jnp.dot(ds.astype(k.dtype), kh, preferred_element_type=jnp.float32)
            * scale
        )
        dk_ref[0, :, h * D:(h + 1) * D] = (
            jnp.dot(ds.astype(q.dtype).T, qh,
                    preferred_element_type=jnp.float32) * scale
        ).astype(dk_ref.dtype)
        db = db + jnp.sum(ds, axis=0, keepdims=True)
    db_ref[0] = db.astype(db_ref.dtype)

    @pl.when(j == NK - 1)
    def _write_dq():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _prep(q, k, v, bias, block_k):
    B, Lq, C = q.shape
    Sk = k.shape[1]
    pad_q = (-Lq) % 8
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    Lqp = q.shape[1]
    block_k = min(block_k, -(-Sk // 128) * 128)
    pad_k = (-Sk) % block_k
    if bias is None:
        bias = jnp.zeros((B, 1, 1, Sk), jnp.float32)
    bias2 = bias.reshape(B, 1, Sk)
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
        bias2 = jnp.pad(bias2, ((0, 0), (0, 0), (0, pad_k)),
                        constant_values=_NEG)
    Skp = k.shape[1]
    return q, k, v, bias2, (B, Lq, C, Sk, Lqp, Skp, block_k)


def _cross_attention_fwd_impl(q, k, v, bias, seed, scale, rate, H,
                              block_k=512, with_stats=False):
    q, k, v, bias2, (B, Lq, C, Sk, Lqp, Skp, block_k) = _prep(
        q, k, v, bias, block_k
    )
    NK = Skp // block_k
    grid = (B, NK)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, rate=rate, H=H, NK=NK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Lqp, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, block_k, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_k, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda i, j, *_: (i, 0, j)),
            ],
            out_specs=[
                pl.BlockSpec((1, Lqp, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, H, Lqp), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, H, Lqp), lambda i, j, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((H, Lqp), jnp.float32),      # m
                pltpu.VMEM((H, Lqp), jnp.float32),      # l
                pltpu.VMEM((Lqp, C), jnp.float32),      # output accumulator
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Lqp, C), q.dtype),
            jax.ShapeDtypeStruct((B, H, Lqp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lqp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Lqp * Skp * C,
            bytes_accessed=(2 * B * Skp * C + 2 * B * Lqp * C)
            * q.dtype.itemsize,
            transcendentals=B * H * Lqp * Skp,
        ),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), q, k, v, bias2)
    out, m, l = out
    out = out[:, :Lq] if Lqp != Lq else out
    return (out, m, l) if with_stats else out


def _cross_attention_bwd_impl(q, k, v, bias, seed, scale, rate, H, g, o,
                              m, l, block_k=512):
    qp, kp, vp, bias2, (B, Lq, C, Sk, Lqp, Skp, block_k) = _prep(
        q, k, v, bias, block_k
    )
    NK = Skp // block_k
    gp, op = g, o
    if Lqp != Lq:
        gp = jnp.pad(g, ((0, 0), (0, Lqp - Lq), (0, 0)))
        op = jnp.pad(o, ((0, 0), (0, Lqp - Lq), (0, 0)))
    grid = (B, NK)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, rate=rate, H=H, NK=NK),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, Lqp, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, block_k, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_k, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, Lqp, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, Lqp, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, H, Lqp), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, H, Lqp), lambda i, j, *_: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, Lqp, C), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, block_k, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, block_k, C), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, 1, block_k), lambda i, j, *_: (i, 0, j)),
            ],
            scratch_shapes=[
                pltpu.VMEM((Lqp, C), jnp.float32),      # dq accumulator
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Lqp, C), q.dtype),
            jax.ShapeDtypeStruct((B, Skp, C), k.dtype),
            jax.ShapeDtypeStruct((B, Skp, C), v.dtype),
            jax.ShapeDtypeStruct((B, 1, Skp), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray([seed], jnp.int32), qp, kp, vp, bias2, gp, op, m, l)
    dq = dq[:, :Lq]
    dk = dk[:, :Sk]
    dv = dv[:, :Sk]
    db = db[:, :, :Sk].reshape(B, 1, 1, Sk)
    return dq, dk, dv, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def cross_attention_native(q, k, v, bias, seed, scale, rate, H):
    """Multi-head attention on NATIVE [B, L, C] projection outputs.

    q [B,Lq,C], k/v [B,Sk,C], bias [B,1,1,Sk] additive or None; returns
    [B,Lq,C] (concatenated heads, ready for the output projection). rate>0
    applies attention-weight dropout from the TPU PRNG (train path).
    """
    return _cross_attention_fwd_impl(q, k, v, bias, seed, scale, rate, H)


def _ca_fwd(q, k, v, bias, seed, scale, rate, H):
    out, m, l = _cross_attention_fwd_impl(
        q, k, v, bias, seed, scale, rate, H, with_stats=True
    )
    return out, (q, k, v, bias, seed, out, m, l)


def _ca_bwd(scale, rate, H, res, g):
    q, k, v, bias, seed, out, m, l = res
    had_bias = bias is not None
    dq, dk, dv, db = _cross_attention_bwd_impl(
        q, k, v, bias, seed, scale, rate, H, g, out, m, l
    )
    return dq, dk, dv, (db if had_bias else None), None


cross_attention_native.defvjp(_ca_fwd, _ca_bwd)


def cross_attention_native_sharded(q, k, v, bias, seed, scale, rate, H):
    """dp-mesh wrapper (heads live inside C here, so tp does not apply —
    matching layers.py, which only routes to this kernel off-tp)."""
    from r3d_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None or mesh.size == 1:
        return cross_attention_native(q, k, v, bias, seed, scale, rate, H)
    from jax.sharding import PartitionSpec as P

    dp = mesh.shape.get("dp", 1)
    if dp <= 1 or q.shape[0] % dp != 0:
        # composed fallback partitions cleanly under jit — and must keep the
        # attention-weight dropout semantics (bernoulli keep-mask scaled
        # 1/(1-p), same as flash_attention_dropout_sharded's fallback)
        from r3d_tpu.ops.attention import composed_attention

        B, Lq, C = q.shape
        D = C // H
        qh = jnp.swapaxes(q.reshape(B, Lq, H, D), 1, 2)
        kh = jnp.swapaxes(k.reshape(B, k.shape[1], H, D), 1, 2)
        vh = jnp.swapaxes(v.reshape(B, v.shape[1], H, D), 1, 2)
        if rate > 0.0:
            s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
            if bias is not None:
                s = s + bias
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
            keep = jax.random.bernoulli(
                jax.random.PRNGKey(seed), 1.0 - rate, w.shape
            )
            w = w * keep / (1.0 - rate)
            o = jnp.einsum("bhqk,bhkd->bhqd", w.astype(qh.dtype), vh)
        else:
            o = composed_attention(qh, kh, vh, bias, scale)
        return jnp.swapaxes(o, 1, 2).reshape(B, Lq, C)
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, k.shape[1]), jnp.float32)

    def local(q_, k_, v_, b_):
        s = seed + 1000003 * jax.lax.axis_index("dp")
        return cross_attention_native(q_, k_, v_, b_, s, scale, rate, H)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        out_specs=P("dp"), check_vma=False,
    )
    return f(q, k, v, bias)


def cross_attention_native_eligible(Lq: int, Lk: int, C: int, H: int,
                                    rate: float) -> bool:
    """Decoder cross shapes: tiny query count against long keys. OPT-IN
    ONLY (R3D_CROSS_NATIVE=1, or R3D_FORCE_PALLAS=1 for the CPU interpret
    tests): the same-process A/B measured 0.976-0.986x on the full 50salads
    train step (module docstring), so the default routing keeps the
    composed path. Short keys keep the measured ops/attention.py routing
    (fusion shape: its dropout kernel wins 1.17x); the PRNG (rate>0) needs
    a real TPU."""
    import os

    from r3d_tpu.ops.fuser_kernel import pallas_enabled

    # "1" enables; any other value (incl. "0") keeps the measured default
    # off — same convention as fuser_kernel.pallas_enabled()
    if not (os.environ.get("R3D_CROSS_NATIVE") == "1"
            or os.environ.get("R3D_FORCE_PALLAS") == "1"):
        return False
    if not pallas_enabled() or C % H != 0 or (C // H) % 8 != 0:
        return False
    if rate > 0.0 and jax.default_backend() != "tpu":
        return False
    return Lq <= 64 and Lk > 512 and C <= 1024
