"""Int8 weight-only quantization for serving.

The reference has no deployment story at all (research scripts; SURVEY.md
§5); this is a production feature of the rebuild: matmul weights store as
symmetric per-output-channel int8 + one f32 scale row, cutting the
checkpoint's device footprint ~4x (vs f32). Dequantization happens INSIDE
the jitted forward — HBM holds int8, XLA fuses the convert+multiply into
the weight operand of the consuming matmul — so quantized serving needs no
model-code changes: ``InferenceSession(..., quantize='int8')``.

Only leaves named ``*kernel*`` quantize (the matmul weights, which dominate
param bytes: the 2048-wide input embed and the 19200-wide depth projection
in particular). Biases, LayerNorm/BN params, positional tables, and the
learned queries stay in float — they are tiny and sit on the activation
path where int8 error would add directly to the logits.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class QuantizedTensor:
    """Symmetric int8 weights + per-output-channel (last axis) f32 scales."""

    q: jnp.ndarray       # int8, original shape
    scale: jnp.ndarray   # f32, shape (1, ..., 1, out)

    @property
    def shape(self):
        return self.q.shape


QUANT_MIN_ELEMS = 4096

# jax.export serializes the calling convention's pytree structure; register
# the node so export() of a quantized session works (flax.struct already
# registered the pytree itself; the auxdata is empty for this dataclass).
# Catch narrowly: a ValueError means re-registration (benign, re-import);
# anything import-shaped means this jax lacks the API — warn so a later
# export() failure of a quantized session is diagnosable instead of opaque.
try:
    from jax import export as _jexport

    _jexport.register_pytree_node_serialization(
        QuantizedTensor,
        serialized_name="r3d_tpu.ops.quant.QuantizedTensor",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: (),  # flax.struct auxdata: empty tuple
    )
except ValueError:
    pass  # already registered (module re-import)
except (ImportError, AttributeError) as e:
    import warnings

    warnings.warn(
        "jax.export pytree serialization unavailable; export() of a "
        f"quantized InferenceSession will fail: {e!r}",
        RuntimeWarning,
    )


def quantize_array(w: jnp.ndarray) -> QuantizedTensor:
    """absmax/127 per output channel; zero channels get scale 1."""
    w = jnp.asarray(w, jnp.float32)
    red = tuple(range(w.ndim - 1))
    absmax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale.astype(jnp.float32))


def _eligible(name: str, leaf) -> bool:
    return (
        hasattr(leaf, "ndim") and leaf.ndim >= 2
        and jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
        and leaf.size >= QUANT_MIN_ELEMS
        and "kernel" in name
    )


def quantize_tree(params: Any) -> Any:
    """Quantize every eligible kernel leaf of a param pytree to int8."""
    def assign(path, leaf):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        return quantize_array(leaf) if _eligible(name, leaf) else leaf

    return jax.tree_util.tree_map_with_path(assign, params)


def dequantize_tree(params: Any, dtype=jnp.float32) -> Any:
    """Inverse of quantize_tree; call INSIDE jit so storage stays int8."""
    def deq(leaf):
        if isinstance(leaf, QuantizedTensor):
            return (leaf.q.astype(jnp.float32) * leaf.scale).astype(dtype)
        return leaf

    return jax.tree_util.tree_map(
        deq, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def quantized_nbytes(tree: Any) -> int:
    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "nbytes")
    )
