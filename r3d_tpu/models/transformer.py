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
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, src, pos, key_padding_mask=None, deterministic=True):
        out = src
        for i in range(self.n_layers):
            out = EncoderLayer(
                self.dim, self.n_head, self.ffn_dim, self.dropout,
                sow_attn=self.sow_attn, dtype=self.dtype,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                name=f"layer{i}",
            )(out, pos, key_padding_mask, deterministic)
        return out


class TransformerDecoder(nn.Module):
    """Decoder stack with the reference's unconditional final LayerNorm
    (transformer.py:37,182-183).

    On a mesh with a pp axis (and stage-divisible depth/batch) the stack
    runs as a GPipe microbatch pipeline over ICI instead of the sequential
    loop — same params, same math, values and grads equal
    (parallel/pipeline.py, tests/test_pipeline_pp.py). Init always takes
    the sequential path so the param layout is identical either way."""

    dim: int
    n_head: int
    n_layers: int
    ffn_dim: int
    dropout: float = 0.1
    sow_attn: bool = False
    dtype: jnp.dtype = jnp.float32
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, memory_key_padding_mask=None,
                 deterministic=True, tgt_key_padding_mask=None):
        import warnings

        from r3d_tpu.parallel.mesh import active_mesh
        from r3d_tpu.parallel.pipeline import (
            PipelineFallbackWarning,
            pipeline_plan,
        )

        # MoE decoders keep the GSPMD path: the pipeline stage body binds
        # only 'params', which would drop the MoE aux-loss sow (moe.py)
        if self.moe_experts > 0 and not self.is_initializing():
            mesh = active_mesh()
            if mesh is not None and mesh.shape.get("pp", 1) > 1:
                warnings.warn(
                    "mesh has pp>1 but the MoE decoder declined the pipeline"
                    " (the stage body would drop the MoE aux-loss sow) — the"
                    " layer stack runs sequentially under GSPMD",
                    PipelineFallbackWarning, stacklevel=2,
                )
        plan = (
            None if (self.is_initializing() or self.moe_experts > 0)
            else pipeline_plan(self.n_layers, tgt.shape[0], self.sow_attn)
        )
        if plan is not None:
            out = self._pipelined(
                plan, tgt, memory, pos, query_pos, memory_key_padding_mask,
                deterministic, tgt_key_padding_mask,
            )
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)
        out = tgt
        for i in range(self.n_layers):
            out = DecoderLayer(
                self.dim, self.n_head, self.ffn_dim, self.dropout,
                sow_attn=self.sow_attn, dtype=self.dtype,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                name=f"layer{i}",
            )(out, memory, pos, query_pos, memory_key_padding_mask,
              deterministic, tgt_key_padding_mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(out)

    def _pipelined(self, plan, tgt, memory, pos, query_pos,
                   memory_key_padding_mask, deterministic,
                   tgt_key_padding_mask):
        """Apply the layer stack as a pp-axis microbatch pipeline.

        The per-layer params created by the sequential path stack into
        [n_layers, ...] leaves (read off ``self.variables`` — init never
        routes here) and shard over 'pp'; the decoder's side inputs
        (memory/pos/masks) ride replicated. Dropout keys derive per
        (global layer, microbatch) by fold_in — a different mask
        realization than the sequential path's flax-internal stream, so
        train-mode stochastic draws differ (equally valid; the
        equivalence tests pin dropout=0).

        Cost note: the jnp.stack of the layer subtrees (and its transpose
        split in the backward) executes inside every train step — one
        device-side copy of the decoder params per step plus the reshard
        to P('pp'). Negligible against the activations for this model
        family's decoders (h<=512, <=4 layers); storing decoder params
        pre-stacked [L, ...] would eliminate it at the price of a
        pp-specific checkpoint layout."""
        import jax

        from r3d_tpu.parallel.pipeline import gpipe

        mesh, pp, M = plan
        Lps = self.n_layers // pp
        params = self.variables["params"]
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[params[f"layer{i}"] for i in range(self.n_layers)],
        )
        # Pin the stack's sharding explicitly: [L, ...] over 'pp' with each
        # layer's own TP spec on the trailing axes.  Without this GSPMD
        # propagates an arbitrary sharding onto the stack concatenate and
        # then replicate-and-repartitions it to P('pp') every step — the
        # "Involuntary full rematerialization" warnings in the r4 dryrun
        # log (VERDICT r4 weak #4).
        from jax.sharding import NamedSharding, PartitionSpec

        from r3d_tpu.parallel.mesh import param_shardings

        layer_sh = param_shardings(mesh, params["layer0"])
        stacked = jax.tree.map(
            lambda x, s: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, PartitionSpec("pp", *s.spec))
            ),
            stacked, layer_sh,
        )
        B = tgt.shape[0]
        Bm = B // M
        mb = lambda x: x.reshape((M, Bm) + x.shape[1:])
        consts = {"memory": mb(memory)}
        if pos is not None:
            consts["pos"] = mb(pos)
        if query_pos is not None:
            consts["query_pos"] = mb(query_pos)
        if memory_key_padding_mask is not None:
            consts["mkpm"] = mb(memory_key_padding_mask)
        if tgt_key_padding_mask is not None:
            consts["tkpm"] = mb(tgt_key_padding_mask)
        needs_rng = (not deterministic) and self.dropout > 0.0
        extras = {"rng": self.make_rng("dropout")} if needs_rng else {}
        layer = DecoderLayer(
            self.dim, self.n_head, self.ffn_dim, self.dropout,
            sow_attn=False, dtype=self.dtype,
        )

        def stage_fn(local, x, c, ex, m):
            d = jax.lax.axis_index("pp")

            def one(x, p_i):
                p, li = p_i
                rngs = None
                if needs_rng:
                    k = jax.random.fold_in(ex["rng"], d * Lps + li)
                    rngs = {"dropout": jax.random.fold_in(k, m)}
                x = layer.apply(
                    {"params": p}, x, c["memory"], c.get("pos"),
                    c.get("query_pos"), c.get("mkpm"), deterministic,
                    c.get("tkpm"), rngs=rngs,
                )
                return x, None

            x, _ = jax.lax.scan(one, x, (local, jnp.arange(Lps)))
            return x

        out = gpipe(stage_fn, stacked, mb(tgt), consts, extras, mesh, M)
        return out.reshape((B,) + out.shape[2:])


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
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25

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
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
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
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
            name="decoder",
        )(tgt, memory, pos, query_pos, src_key_padding_mask, deterministic,
          tgt_key_padding_mask)
        return memory, hs
