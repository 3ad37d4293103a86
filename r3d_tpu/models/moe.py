"""Mixture-of-Experts feed-forward with expert parallelism ('ep' mesh axis).

The reference has no MoE — its FFNs are the two dense linears of the DETR
fork (model/extras/transformer.py:200-202).  The rebuild adds MoE as an
opt-in capacity knob (``ModelConfig.moe_experts``) because it is the
TPU-idiomatic way to grow parameters without growing per-token FLOPs, and
because the framework's mesh story should cover the expert axis: expert
params carry a leading [E, ...] axis sharded over 'ep'
(parallel/mesh.py), tokens ride 'dp', and XLA inserts the dispatch/return
all-to-alls over ICI on its own.

Design — GShard/Switch-style static-shape dispatch (everything is dense
one-hot matmuls; no dynamic shapes, no host control flow):

- Router: a bias-free linear to E logits in fp32, softmax, top-k gates
  renormalized to sum 1 (the Switch/GShard convention).
- Capacity: each expert processes at most
  ``cap = ceil(top_k * T / E * capacity_factor)`` tokens (T static under
  jit, so cap is a compile-time constant).  Slot priority is k-major —
  every token's first choice queues ahead of any second choice — and
  within a slot, token order (cumsum position).  Overflowing assignments
  drop: the token's output loses that expert's contribution (standard
  GShard semantics; with identical experts and ample capacity the layer
  is exactly the dense FFN — tests/test_moe.py).
- Dispatch/combine: one-hot [T', E, cap] tensors contracted on the MXU
  (``einsum('tec,td->ecd')`` in, ``einsum('tec,ecd->td')`` out, combine
  weighted by the gate).  Experts themselves are the existing
  ``FeedForward`` vmapped over E (``nn.vmap`` stacks params [E, ...]).
- Aux loss: the Switch load-balancing term ``E * Σ_e f_e · P_e`` (f_e =
  fraction of tokens whose FIRST choice is e, P_e = mean router prob) is
  sown into the 'losses' collection; the trainer adds it to the total
  scaled by ``ModelConfig.moe_aux_weight`` when the collection is marked
  mutable (train/loop.py).  At eval the sow is a no-op.

Measured (tools/measure_moe.py, v5e single chip, same-process interleaved
A/B at the 50salads published shape, B=8 S=3100 h=512 bf16): dense 11.1M
params 10.18 ms/step vs MoE E=4 23.7M params 9.83 ms/step (top-2) /
9.59 ms (top-1) — the routing + one-hot dispatch overhead is within
timing noise; the step stays attention/bandwidth-dominated, so MoE buys
2.1x parameter capacity at unchanged step time on this workload.

Sharding notes: with B dp-sharded and experts ep-sharded, the dispatch
contraction reduces over the dp-sharded token axis into ep-sharded
[E, cap, C] blocks — GSPMD lowers that to an all-to-all + local matmul.
The MoE layer does not route through the pp pipeline (TransformerDecoder
declines the pipelined path when moe_experts > 0): the GPipe stage body
applies layers with only 'params' bound, which would silently drop the
aux sow.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from r3d_tpu.models.layers import FeedForward


class MoEFeedForward(nn.Module):
    """Drop-in replacement for ``FeedForward`` ([B, L, C] -> [B, L, C])."""

    dim: int
    hidden_dim: int
    n_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout: float = 0.0
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 pad_mask=None) -> jnp.ndarray:
        """``pad_mask`` [B, L] (True = bucket padding): pad tokens are
        excluded from expert capacity (they can't shed real tokens — the
        cumsum priority is token-order, so an early pad row would
        otherwise outrank every real token behind it) and from the
        balance loss's f/P statistics (review finding: on a 60-frame
        video in the 128 bucket, >50% of tokens are padding — unmasked,
        the aux loss optimizes the routing of junk). Their output rows
        are zero; every consumer masks pad rows anyway (attention key
        masks, length-aware pools, masked losses)."""
        B, L, C = x.shape
        T = B * L
        E = self.n_experts
        K = min(self.top_k, E)
        cap = int(math.ceil(K * T / E * self.capacity_factor))
        cap = min(cap, T)

        xt = x.reshape(T, C)
        valid = (
            jnp.ones((T,), jnp.float32) if pad_mask is None
            else 1.0 - pad_mask.reshape(T).astype(jnp.float32)
        )
        logits = nn.Dense(
            E, use_bias=False, dtype=jnp.float32, name="router"
        )(xt.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)                  # [T, E] fp32
        gate_vals, gate_idx = jax.lax.top_k(probs, K)            # [T, K]
        if K > 1:
            gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)
        # K == 1 keeps the RAW softmax prob as the gate (the Switch top-1
        # convention): renormalizing would make the gate identically 1.0 —
        # a constant — severing the router from the task-loss gradient
        # (review finding; the one-hot dispatch itself is piecewise
        # constant, so the gate is the only differentiable routing path)

        # k-major flattening: all first choices queue before any second
        # choice, so capacity overflow sheds the lowest-gate assignments
        idx_flat = gate_idx.T.reshape(K * T)                     # [K*T]
        gate_flat = gate_vals.T.reshape(K * T)
        valid_flat = jnp.tile(valid, K)
        onehot = (
            jax.nn.one_hot(idx_flat, E, dtype=jnp.int32)
            * valid_flat[:, None].astype(jnp.int32)
        )
        pos = jnp.sum(jnp.cumsum(onehot, axis=0) * onehot, axis=-1) - 1
        keep = ((pos < cap) & (pos >= 0)).astype(jnp.float32)

        de = onehot.astype(jnp.float32) * keep[:, None]
        dc = jax.nn.one_hot(jnp.clip(pos, 0, cap - 1), cap, dtype=jnp.float32)
        dispatch = jnp.einsum("te,tc->tec", de, dc)              # [K*T, E, cap]

        xr = jnp.tile(xt, (K, 1)).astype(self.dtype)             # k-major copies
        expert_in = jnp.einsum(
            "tec,td->ecd", dispatch.astype(self.dtype), xr
        )                                                        # [E, cap, C]

        experts = nn.vmap(
            FeedForward,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0, None),
            out_axes=0,
        )(
            self.dim, self.hidden_dim, self.dropout, self.activation,
            self.dtype, name="experts",
        )
        expert_out = experts(expert_in, deterministic)           # [E, cap, C]

        combine = dispatch * gate_flat[:, None, None]
        yt = jnp.einsum(
            "tec,ecd->td", combine.astype(self.dtype), expert_out
        )
        y = yt.reshape(K, T, C).sum(0)

        # Switch load-balancing loss (Fedus et al. eq. 4): first-choice
        # token fractions vs mean router probability over the VALID tokens
        # only, scaled by E so a perfectly uniform router scores 1.0
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        f = (
            jnp.sum(
                jax.nn.one_hot(gate_idx[:, 0], E, dtype=jnp.float32)
                * valid[:, None], axis=0,
            ) / n_valid
        )
        P = jnp.sum(probs * valid[:, None], axis=0) / n_valid
        aux = E * jnp.sum(f * P)
        self.sow("losses", "moe_aux", aux)

        return y.reshape(B, L, C).astype(self.dtype)
