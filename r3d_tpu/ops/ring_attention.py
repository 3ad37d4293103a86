"""Ring attention over the mesh's sequence-parallel ('sp') axis.

The reference never needs sequence parallelism — its longest sequence is
S=3100 (scripts/50s_train.sh max_pos 3100) and fits one GPU (SURVEY.md
§5.7). The rebuild reserves a mesh axis for it anyway: self-attention is
O(S^2) and the S x S score matrix is the first thing that stops fitting
when sequences grow, so scaling past one chip's HBM means sharding the
SEQUENCE, not just the batch.

Design (the standard TPU recipe — blockwise attention with K/V rotating
around the ring):

- q/k/v [B, H, S, D] shard S over 'sp'; each device holds one S/sp block.
- sp steps of online softmax: compute the local q-block against the
  currently-held k/v block, then rotate k/v (and the key-padding bias) to
  the next device with ``jax.lax.ppermute`` over ICI. Running max m,
  normalizer l, and output accumulator update exactly like a flash kernel's
  q-tile loop — the ring axis plays the role of the key-tile axis.
- After sp hops every q-block has seen every key: out = acc / l. No device
  ever materializes more than an [S/sp, S/sp] score block, and no
  all-gather of K/V happens at all — peak memory per device drops sp-fold
  against the all-gather strategy.
- The whole thing is plain jnp + lax inside ``jax.shard_map``; autodiff
  differentiates through scan + ppermute (ppermute's transpose is the
  inverse rotation), so the backward is also a ring. XLA overlaps the
  ppermute with the block compute where profitable.

Numerics match composed softmax(QK^T)V to fp32-accumulation tolerance
(tests/test_ring_attention.py asserts values AND grads against the
single-device composed oracle on the fake 8-device mesh).

Dropout: the train path with attention-weight dropout does NOT route here
(mask regeneration across rotating blocks would couple the PRNG stream to
the ring schedule); MultiheadAttention keeps the composed/GSPMD path for
that case, where XLA inserts the collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

_NEG = float(jnp.finfo(jnp.float32).min)


def _ring_local(q, k, v, bias, scale, sp_size):
    """Per-shard body: q/k/v [B, H, Sb, D] local blocks, bias [B, 1, 1, Sb].

    Runs sp_size online-softmax steps, rotating (k, v, bias) one hop per
    step. Written for a named axis 'sp' in scope (inside shard_map).
    """
    B, H, Sb, D = q.shape
    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]

    def step(carry, _):
        k_blk, v_blk, b_blk, m, l, acc = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_blk,
            preferred_element_type=jnp.float32,
        ) * scale
        s = s + b_blk.astype(jnp.float32)           # [B, H, Sb, Sb]
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)                   # rescale old state
        e = jnp.exp(s - m_new[..., None])
        l = l * alpha + jnp.sum(e, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", e.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        k_blk = jax.lax.ppermute(k_blk, "sp", perm)
        v_blk = jax.lax.ppermute(v_blk, "sp", perm)
        b_blk = jax.lax.ppermute(b_blk, "sp", perm)
        return (k_blk, v_blk, b_blk, m_new, l, acc), None

    m0 = jnp.full((B, H, Sb), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Sb), jnp.float32)
    acc0 = jnp.zeros((B, H, Sb, D), jnp.float32)
    (k, v, bias, m, l, acc), _ = jax.lax.scan(
        step, (k, v, bias, m0, l0, acc0), None, length=sp_size
    )
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention_sharded(q, k, v, bias, scale):
    """Sequence-parallel attention: [B, H, S, D] with S sharded over 'sp'.

    Composes with dp (batch) and tp (heads) exactly like
    flash_attention_sharded; requires an active mesh with sp > 1 and
    S % sp == 0 (callers check via ring_attention_eligible). bias is the
    additive key-padding row [B, 1, 1, S] or None.
    """
    from r3d_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    sp = mesh.shape.get("sp", 1)
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    batch_axis = "dp" if (dp > 1 and q.shape[0] % dp == 0) else None
    head_axis = "tp" if (tp > 1 and q.shape[1] % tp == 0) else None
    if bias is None:
        bias = jnp.zeros((q.shape[0], 1, 1, k.shape[2]), jnp.float32)

    qkv_spec = P(batch_axis, head_axis, "sp", None)
    bias_spec = P(batch_axis, None, None, "sp")

    f = jax.shard_map(
        lambda q_, k_, v_, b_: _ring_local(q_, k_, v_, b_, scale, sp),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return f(q, k, v, bias)


def ring_attention_eligible(Lq: int, Lk: int) -> bool:
    """Self-attention on an sp>1 mesh with block-divisible lengths. The
    floor keeps tiny self-attentions (the decoder's n_query=20 rows, which
    are never sp-sharded) on the composed path — ringing those would force
    a pointless reshard."""
    from r3d_tpu.parallel.mesh import active_mesh

    mesh = active_mesh()
    if mesh is None:
        return False
    sp = mesh.shape.get("sp", 1)
    return sp > 1 and Lq == Lk and Lq % sp == 0 and Lq >= 64 * sp
