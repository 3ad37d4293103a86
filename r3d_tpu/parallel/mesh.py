"""Device mesh + sharding layout.

The reference's entire distribution story is single-process
``nn.DataParallel`` over local GPUs (main.py:115) — no process groups, no
collectives (SURVEY.md §2.7).  The TPU-native equivalent is declarative: one
``jax.sharding.Mesh`` over the ICI fabric with

- axis ``dp``: the batch dimension (the DataParallel counterpart). Gradients
  are reduced by XLA-inserted all-reduces over ICI inside the jitted step.
- axis ``tp``: optional tensor parallelism for wide layers (the 19200->h
  depth projection kernel and the 4h FFNs shard column-/row-wise). The
  reference has no TP; the axis exists so larger configs scale without a
  rewrite, and is exercised by the multi-chip dry run.
- axis ``sp``: optional sequence (context) parallelism — the S axis of
  activations shards over devices, self-attention runs as ring attention
  (ops/ring_attention.py, K/V rotating via ppermute over ICI), and every
  other op partitions along S for free (embed/LN/heads are row-local;
  losses psum). For sequences past one chip's HBM; exercised by the
  multi-chip dry run and the fake-8-device tests.
- axis ``pp``: optional pipeline parallelism — the decoder layer stack
  splits into equal stages, microbatches stream through them on a GPipe
  fill–drain schedule with activations hopping stage→stage via ppermute
  (parallel/pipeline.py). Last axis so consecutive stages are ICI
  neighbours.
- axis ``ep``: optional expert parallelism — MoE expert params carry a
  leading [E, ...] axis sharded over 'ep' (models/moe.py); GSPMD lowers
  the one-hot dispatch/combine contractions to all-to-alls over ICI.

No communication code lives anywhere else: shardings go in, XLA emits
psum/all-gather over ICI.
"""

from __future__ import annotations

import contextlib
import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_ACTIVE_MESH: Optional[Mesh] = None


def set_active_mesh(mesh: Optional[Mesh]) -> None:
    """Advertise the mesh that batches are sharded over, so row-parallel
    Pallas ops can shard_map themselves over the dp axis (read at trace
    time by r3d_tpu/ops/fuser_kernel.py)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


@contextlib.contextmanager
def mesh_scope(mesh: Optional[Mesh]):
    """Pin the active mesh for the duration of a trace, restoring the
    previous one after. Long-lived objects that own a mesh (serving
    sessions, predictors) trace their jitted calls inside this scope so
    a mesh session and a plain session can coexist in one process
    without the module-global leaking between them."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def suppress_active_mesh():
    """Hide the active mesh while TRACING the body of an explicit
    shard_map (the pp pipeline): mesh-aware ops called inside would try
    to shard_map themselves again over axes that are already bound.
    Trace-time only — the contextmanager wraps the shard_map call, and
    every active_mesh() read happens during that trace."""
    return mesh_scope(None)


def make_mesh(
    dp: int = -1, tp: int = 1, sp: int = 1, pp: int = 1, ep: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        dp = n // (tp * sp * pp * ep)
    assert dp * tp * sp * pp * ep == n, (
        f"mesh {dp}x{ep}x{tp}x{sp}x{pp} != {n} devices"
    )
    arr = np.array(devices).reshape(dp, ep, tp, sp, pp)
    return Mesh(arr, ("dp", "ep", "tp", "sp", "pp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# param-path regex -> PartitionSpec for tensor parallelism. Kernels are
# [in, out]; column-parallel on the first projection, row-parallel on the
# second so each FFN (and each attention block, Megatron-style: q/k/v
# column-parallel = head-parallel, out_proj row-parallel) needs one psum.
# Fuser-kernel params (safuser/qkv_kernel etc.) intentionally do NOT match:
# those ops shard_map row-parallel over dp with replicated weights.
_TP_RULES = [
    # MoE expert stacks (models/moe.py, nn.vmap leading [E, ...] axis):
    # experts shard over 'ep', and within each expert the two linears
    # follow the same column-/row-parallel split over 'tp'. Rules are
    # first-match, so these precede the dense-FFN patterns.
    (r".*experts/linear1/kernel", P("ep", None, "tp")),
    (r".*experts/linear1/bias", P("ep", "tp")),
    (r".*experts/linear2/kernel", P("ep", "tp", None)),
    (r".*experts/linear2/bias", P("ep")),
    (r".*depth_projection.*kernel", P(None, "tp")),
    (r".*ffn/linear1/kernel", P(None, "tp")),
    (r".*ffn/linear1/bias", P("tp")),
    (r".*ffn/linear2/kernel", P("tp", None)),
    (r".*mlp1/kernel", P(None, "tp")),
    (r".*mlp1/bias", P("tp")),
    (r".*mlp2/kernel", P("tp", None)),
    (r".*(self|cross)_attn/[qkv]_proj/kernel", P(None, "tp")),
    (r".*(self|cross)_attn/[qkv]_proj/bias", P("tp")),
    (r".*(self|cross)_attn/out_proj/kernel", P("tp", None)),
]


def _spec_for_path(path: str, shape) -> P:
    for pattern, spec in _TP_RULES:
        if re.fullmatch(pattern, path):
            # only shard if the dimension divides evenly at trace time; the
            # caller checks against the mesh size
            return spec
    return P()


# Leaves smaller than this (elements) stay replicated under FSDP: biases and
# LN scales cost more in all-gather latency than they save in HBM.
FSDP_MIN_ELEMS = 8192


def _fsdp_spec(spec: P, shape, dp: int, min_elems: int) -> P:
    """ZeRO/FSDP: put 'dp' on the largest still-unsharded axis that divides.

    The reference has no counterpart (nn.DataParallel replicates everything,
    main.py:115); this is the GSPMD recipe — params and optimizer moments
    shard over the data axis, XLA inserts the all-gathers before use and
    reduce-scatters the grads, so per-device state memory drops ~dp-fold.
    """
    if dp <= 1 or not shape:
        return spec
    size = 1
    for s in shape:
        size *= int(s)
    if size < min_elems:
        return spec
    dims = list(spec) + [None] * (len(shape) - len(spec))
    best = -1
    for d, a in enumerate(dims):
        if a is None and shape[d] % dp == 0 and shape[d] > 1:
            if best == -1 or shape[d] > shape[best]:
                best = d
    if best == -1:
        return spec
    dims[best] = "dp"
    return P(*dims)


def param_shardings(mesh: Mesh, params: Any, fsdp: bool = False,
                    fsdp_min_elems: int = FSDP_MIN_ELEMS) -> Any:
    """NamedSharding tree for a param/opt-state/batch_stats pytree: TP rules
    where they match and divide evenly, replicated otherwise. With
    ``fsdp=True`` every large leaf additionally shards its largest free axis
    over 'dp' (ZeRO-3 style; optimizer moments mirror param paths so the
    same call covers opt_state)."""
    def assign(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        spec = _spec_for_path(name, leaf.shape)
        if spec != P():
            # verify divisibility on every sharded axis; drop only the
            # axes that don't divide (e.g. keep 'ep' when 'tp' doesn't fit)
            dims = [
                None if (a is not None and leaf.shape[d] % mesh.shape[a] != 0)
                else a
                for d, a in enumerate(spec)
            ]
            spec = P(*dims) if any(a is not None for a in dims) else P()
        if fsdp:
            spec = _fsdp_spec(
                spec, leaf.shape, mesh.shape.get("dp", 1), fsdp_min_elems
            )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_state(state, mesh: Mesh, fsdp: bool = False,
                fsdp_min_elems: int = FSDP_MIN_ELEMS):
    """Land a TrainState on the mesh: params + optimizer moments follow the
    TP rules (+ FSDP over dp when asked), BN batch_stats and the step
    counter replicate. The jitted train step propagates these shardings to
    its outputs, so one placement at startup pins the whole run."""
    rep = NamedSharding(mesh, P())
    p_sh = param_shardings(mesh, state.params, fsdp=fsdp,
                           fsdp_min_elems=fsdp_min_elems)
    opt_sh = param_shardings(mesh, state.opt_state, fsdp=fsdp,
                             fsdp_min_elems=fsdp_min_elems)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=jax.tree.map(jax.device_put, state.params, p_sh),
        opt_state=jax.tree.map(jax.device_put, state.opt_state, opt_sh),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, rep), state.batch_stats
        ),
    )


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Land a host batch on device, split over the dp axis — and, when the
    mesh has an sp axis, split every SEQUENCE-length axis-1 over sp too
    (features/depth/past_label share the bucket length S; n_query-sized
    arrays like target/duration stay dp-only)."""
    sharding = batch_sharding(mesh)
    sp = mesh.shape.get("sp", 1)
    if sp == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    feats = batch.get("features")
    S = feats.shape[1] if feats is not None and feats.ndim >= 2 else -1
    dp_ax = "dp" if mesh.shape.get("dp", 1) > 1 else None

    def put(x):
        if (
            hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[1] == S and S % sp == 0
        ):
            return jax.device_put(x, NamedSharding(mesh, P(dp_ax, "sp")))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
