"""GPipe-style pipeline parallelism over the mesh's 'pp' axis.

The reference has no pipeline parallelism — its deepest stack is two
decoder layers on one GPU (scripts/50s_train.sh, SURVEY.md §2.7: "PP …
none exist").  The rebuild reserves the axis anyway: depth is the first
thing that stops fitting when models grow, and on TPU the idiomatic form
is a collective microbatch pipeline over ICI neighbours, not a
torch-style per-stage process group.

Design (fill–drain / GPipe schedule as one jitted collective program):

- The layer stack's params stack along a leading axis [L, ...] and shard
  over 'pp': device d holds layers [d·L/pp, (d+1)·L/pp) — its *stage*.
- The batch splits into M microbatches.  The schedule runs
  T = M + pp − 1 ticks inside one ``lax.scan``; at tick t device d runs
  its stage over microbatch m = t − d (devices idle in the fill/drain
  bubble compute on don't-care data that is never collected), then the
  activation rotates one hop to the next stage with ``jax.lax.ppermute``
  over ICI.  Stage 0 injects microbatch t; the last stage collects its
  output into the result buffer, which a final ``psum`` over 'pp'
  replicates (all other devices contribute zeros).
- Side inputs every stage needs (decoder memory, positional embeds,
  padding masks) ride along replicated over 'pp' and are indexed per
  tick; the flowing activation is only the microbatch-sized query block.
- Autodiff differentiates the whole schedule: ppermute's transpose is
  the reverse rotation, so the backward runs as the mirrored drain–fill
  pipeline without any hand-written schedule.  Fill–drain keeps
  activation liveness at one scan carry + residuals and is bit-stable
  to test.  The 1F1B alternative ships in ``parallel/pipeline_1f1b.py``
  (``MeshConfig.pp_schedule='1f1b'``): per-microbatch loss at the last
  stage, O(pp) in-flight activations — see its module docstring for the
  schedule and memory accounting.

The bubble fraction is (pp−1)/(M+pp−1): raise ``MeshConfig.pp_microbatches``
to amortise it.  Values and grads match the sequential stack exactly
(tests/test_pipeline_pp.py asserts both on the fake 8-device mesh,
composed with dp).
"""

from __future__ import annotations

import warnings
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from r3d_tpu.parallel.mesh import active_mesh, suppress_active_mesh


class PipelineFallbackWarning(UserWarning):
    """The mesh has pp > 1 but the pipelined decoder path declined — the
    layer stack runs sequentially under GSPMD instead. Emitted at trace
    time (once per compilation) so an unsupported composition is LOUD,
    not a silent perf cliff (VERDICT r3 weak #2)."""


_PP_MICROBATCHES = 0  # 0 => auto (= pp); set from MeshConfig by the CLI


def set_pipeline_microbatches(m: int) -> None:
    """Advertise the microbatch count for the pp schedule (module global,
    mirroring set_active_mesh — the model reads it at trace time)."""
    global _PP_MICROBATCHES
    _PP_MICROBATCHES = int(m)


def pipeline_plan(
    n_layers: int, batch: int, sow_attn: bool = False
) -> Optional[Tuple[Mesh, int, int]]:
    """(mesh, pp, n_microbatches) when the pipelined path applies, else None.

    Requirements: an active mesh with pp > 1, layers divisible into equal
    stages, the batch divisible into microbatches, no attention-weight
    sowing (the pipeline body does not thread the 'intermediates'
    collection), and sp == 1 (an sp-sharded S axis would need the ring
    collective inside each stage — out of scope; such meshes keep the
    GSPMD path).
    """
    mesh = active_mesh()
    if mesh is None:
        return None
    pp = mesh.shape.get("pp", 1)
    if pp <= 1:
        return None

    def decline(reason: str) -> None:
        warnings.warn(
            f"mesh has pp={pp} but the pipelined decoder declined: {reason}"
            " — the layer stack runs sequentially under GSPMD on this mesh",
            PipelineFallbackWarning, stacklevel=3,
        )
        return None

    if sow_attn:
        return decline("attention-weight sowing requested (the pipeline "
                       "body does not thread the 'intermediates' collection)")
    if mesh.shape.get("sp", 1) != 1:
        return decline("sp > 1 (an sp-sharded sequence axis would need the "
                       "ring collective inside each stage)")
    if n_layers < pp or n_layers % pp != 0:
        return decline(f"{n_layers} decoder layers do not split into "
                       f"{pp} equal stages")
    M = _PP_MICROBATCHES or pp
    if batch % M != 0:
        return decline(f"batch {batch} does not divide into {M} microbatches"
                       " (set MeshConfig.pp_microbatches)")
    return mesh, pp, M


def gpipe(
    stage_fn: Callable[[Any, jnp.ndarray, Any, Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    inject: jnp.ndarray,
    consts: Any,
    extras: Any,
    mesh: Mesh,
    n_microbatches: int,
) -> jnp.ndarray:
    """Run the fill–drain pipeline; returns the last stage's outputs.

    - ``stage_fn(local_params, x, consts_m, extras, m)`` applies one
      stage (``local_params``: this device's [L/pp, ...] layer slice) to
      activation ``x`` [Bm, ...]; must preserve x's shape/dtype.
    - ``inject``: [M, Bm, ...] microbatched input entering stage 0.
    - ``consts``: pytree of [M, Bm, ...] per-microbatch side inputs.
    - ``extras``: pytree replicated everywhere (e.g. a dropout key).
    """
    pp = mesh.shape["pp"]
    M = n_microbatches
    dp = mesh.shape.get("dp", 1)
    Bm = inject.shape[1]
    # microbatch rows additionally shard over dp when they divide; a
    # remainder-sized Bm replicates (matching train/loop.py's put_batch)
    dp_axis = "dp" if (dp > 1 and Bm % dp == 0) else None
    T = M + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def body(local, inject, consts, extras):
        d = jax.lax.axis_index("pp")

        def tick(carry, t):
            buf, outs = carry
            m = t - d                      # microbatch at this device/tick
            mc = jnp.clip(m, 0, M - 1)
            x_in = jax.lax.dynamic_index_in_dim(
                inject, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            x = jnp.where(d == 0, x_in, buf)
            consts_m = jax.tree.map(
                lambda c: jax.lax.dynamic_index_in_dim(
                    c, mc, 0, keepdims=False
                ),
                consts,
            )
            y = stage_fn(local, x, consts_m, extras, mc)
            keep = (m >= 0) & (m < M) & (d == pp - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, mc, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(keep, y, cur), mc, 0
            )
            buf = jax.lax.ppermute(y, "pp", perm)
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(
            tick,
            (jnp.zeros_like(inject[0]), jnp.zeros_like(inject)),
            jnp.arange(T),
        )
        # only the last stage wrote real rows; everyone else holds zeros
        return jax.lax.psum(outs, "pp")

    mb_spec = P(None, dp_axis)
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("pp"), mb_spec, mb_spec, P()),
        out_specs=mb_spec,
        check_vma=False,
    )
    # ops traced inside the body (attention kernels, ring attention) must
    # not try to shard_map themselves again — axes are already bound
    with suppress_active_mesh():
        return f(stacked_params, inject, consts, extras)
