"""1F1B (one-forward-one-backward) pipeline-parallel training schedule.

The GPipe path (parallel/pipeline.py) pipelines only the decoder segment's
FORWARD and lets autodiff mirror it — correct and simple, but every
microbatch's stage residuals stay live until the loss (computed outside
the pipeline) produces cotangents, so activation memory grows O(M) in the
microbatch count.  True 1F1B (Megatron-LM's PipeDream-flush schedule)
starts microbatch m's backward as soon as its forward reaches the LAST
stage — which requires the per-microbatch loss to be computed AT the last
stage, inside the schedule.  This module provides exactly that: a jitted
SPMD program over the mesh's 'pp' axis that runs the full
forward+loss+backward of a stage-partitioned model and returns the loss
AND the gradients directly.

Schedule (lockstep, one op per device per tick; derived in closed form):

    fwd(m, d)  at tick  m + d            if m + d <= pp-1   (fill)
                        2m + d           otherwise          (steady)
    bwd(m, d)  at tick  2m + 2pp - 1 - d

    total ticks T = 2(M + pp - 1) — the same bubble fraction
    (pp-1)/(M+pp-1) as GPipe fwd+bwd, but the in-flight activation window
    per device is  <= pp - d  microbatches (vs M for GPipe-autodiff):
    device d's saved stage inputs live from arrival to bwd, a span of
    2(pp-d)-1 ticks, so a ring buffer of pp slots (indexed m mod pp)
    suffices.  Each bwd tick REMATERIALIZES its stage forward under
    ``jax.vjp`` from the saved boundary input (praxis-style circular
    pipelining), so per-tick liveness is one stage's internals + pp
    boundary tensors.

Memory accounting per device (flow tensor x: [Bm, ...]):
    GPipe-autodiff:  (M + pp) ticks x full stage residuals
    1F1B here:       pp x |x|  (ring) + one stage's residuals (inside vjp)

Scheduling facts used by the implementation (verified in
tests/test_pipeline_1f1b.py):
  - fwd and bwd ticks never collide on one device: bwd has (t - d) odd in
    steady state, fwd has it even; fill ticks end (t <= pp-1) before the
    first bwd (t >= pp).
  - an arriving activation's ring slot (m mod pp) is free: microbatch
    m + pp arrives at tick 2m + 2pp + d - 1 + 1, after slot-holder m's bwd
    at 2m + 2pp - 1 - d, for every d >= 0.
  - collectives (two ``ppermute`` rotations: activations forward,
    cotangents backward) run UNCONDITIONALLY at every tick, outside the
    ``lax.cond`` branches — SPMD branches diverge per device, so a
    collective inside one would deadlock.

The last stage never runs a separate forward tick: at its bwd tick it
rematerializes its stage forward, chains ``last_fn`` (heads + loss) and
differentiates the fused function, seeding the pipeline's cotangent wave.
Per-microbatch losses are SUMMED; with every microbatch weighted equally
this reproduces gradient accumulation's mean-of-microbatches semantics
(divide by M outside), NOT the full-batch mean — identical when per-
microbatch denominators match, and exactly ``Trainer.make_accum_step``'s
contract otherwise (the integration test uses it as the oracle).

No reference counterpart (the reference is single-GPU DataParallel,
SURVEY.md §2.7); this is the TPU-native scale-out path named as future
work in parallel/pipeline.py:30.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from r3d_tpu.parallel.mesh import suppress_active_mesh


def _index(tree: Any, i: jnp.ndarray) -> Any:
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree
    )


def pipelined_value_and_grad(
    stage_fn: Callable[..., Any],
    last_fn: Callable[..., Tuple[jnp.ndarray, Any]],
    stacked_params: Any,
    last_params: Any,
    inject: Any,
    consts_diff: Any,
    consts_aux: Any,
    extras: Any,
    mesh: Mesh,
    n_microbatches: int,
):
    """Run the 1F1B schedule; returns losses, metrics and gradients.

    - ``stage_fn(local_params, x, cd_m, ca_m, extras, m) -> y``: one stage
      (this device's [L/pp, ...] layer slice) applied to the flowing
      activation pytree ``x``; must preserve x's structure/shapes.
    - ``last_fn(last_params, y, cd_m, ca_m, m) -> (loss, metrics)``: the
      post-stage tail (final norm, heads, per-microbatch loss). ``loss``
      is a scalar; ``metrics`` a pytree of scalars (summed over
      microbatches).
    - ``stacked_params``: [L, ...] pytree sharded P('pp') — device d holds
      layers [d*L/pp, (d+1)*L/pp).
    - ``inject``: [M, Bm, ...] pytree of microbatched stage-0 inputs.
    - ``consts_diff``: [M, Bm, ...] pytree of DIFFERENTIABLE side inputs
      every stage reads (decoder memory, positional embeds); their summed
      cotangents are returned so the caller can backprop the pre-pipeline
      network.
    - ``consts_aux``: [M, ...] pytree of non-differentiable side inputs
      (masks, integer targets).
    - ``extras``: replicated pytree (e.g. a dropout key); not
      differentiated.

    Returns ``(loss_sum, metrics_sums, g_stacked, g_last, d_inject,
    d_consts_diff)`` — loss/metrics/grads summed over ALL microbatches.
    When the mesh has dp > 1 and it divides M, the MICROBATCH axis shards
    over dp (each replica pipelines M/dp microbatches, grads/losses psum);
    rows within a microbatch are never split, so mean-normalized
    per-microbatch losses stay exact.
    """
    pp = mesh.shape["pp"]
    dp = mesh.shape.get("dp", 1)
    fwd_perm = [(i, (i + 1) % pp) for i in range(pp)]
    bwd_perm = [(i, (i - 1) % pp) for i in range(pp)]

    # dp shards the MICROBATCH axis: each dp replica pipelines its own
    # M/dp microbatches and the grads/losses psum at the end.  (Sharding
    # the rows WITHIN a microbatch would be wrong for mean-normalized
    # losses — each microbatch must be normalized whole, the
    # grad-accumulation semantics.)
    dp_axis = "dp" if (dp > 1 and n_microbatches % dp == 0) else None
    M = n_microbatches // dp if dp_axis else n_microbatches
    T = 2 * (M + pp - 1)

    def body(local, last_p, inject, cdiff, caux, extras):
        d = jax.lax.axis_index("pp")
        x0 = _index(inject, jnp.zeros((), jnp.int32))  # structure template
        zeros_x = jax.tree.map(jnp.zeros_like, x0)
        cd0 = _index(cdiff, jnp.zeros((), jnp.int32))
        ca0 = _index(caux, jnp.zeros((), jnp.int32))
        loss_shape, metrics_shape = jax.eval_shape(
            last_fn, last_p, x0, cd0, ca0, 0
        )
        zeros_metrics = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape
        )

        carry = dict(
            ring=jax.tree.map(
                lambda a: jnp.zeros((pp,) + a.shape, a.dtype), x0
            ),
            # activation / cotangent in flight (one tick of transit each)
            y_in=zeros_x, y_m_in=jnp.int32(-1), dx_in=zeros_x,
            g_stage=jax.tree.map(jnp.zeros_like, local),
            g_last=jax.tree.map(jnp.zeros_like, last_p),
            d_inject=jax.tree.map(jnp.zeros_like, inject),
            d_cdiff=jax.tree.map(jnp.zeros_like, cdiff),
            loss=jnp.zeros((), jnp.float32),
            metrics=zeros_metrics,
        )

        def tick(carry, t):
            # ---- stash the arriving activation into its ring slot
            m_in = carry["y_m_in"]
            slot = jnp.maximum(m_in, 0) % pp
            store = (m_in >= 0) & (d > 0)
            ring = jax.tree.map(
                lambda r, y: jnp.where(
                    store,
                    jax.lax.dynamic_update_index_in_dim(
                        r, y.astype(r.dtype), slot, 0
                    ),
                    r,
                ),
                carry["ring"], carry["y_in"],
            )
            carry = dict(carry, ring=ring)

            # ---- schedule: which op (if any) runs on this device now
            tmd = t - d
            fill_m = tmd
            is_fill = (t <= pp - 1) & (fill_m >= 0) & (fill_m < M)
            steady_m = tmd // 2
            is_steady = (
                (tmd >= 0) & (tmd % 2 == 0) & (t > pp - 1)
                & (steady_m > pp - 1 - d) & (steady_m < M)
            )
            # the last stage computes fwd+loss+bwd fused at its bwd tick
            is_fwd = (is_fill | is_steady) & (d < pp - 1)
            m_f = jnp.where(is_fill, fill_m, steady_m)
            tb = t - (2 * pp - 1) + d
            m_b = tb // 2
            is_bwd = (tb >= 0) & (tb % 2 == 0) & (m_b < M)

            def my_x(m):
                mc = jnp.clip(m, 0, M - 1)
                from_inj = _index(inject, mc)
                from_ring = _index(carry["ring"], mc % pp)
                return jax.tree.map(
                    lambda a, b: jnp.where(d == 0, a, b.astype(a.dtype)),
                    from_inj, from_ring,
                ), mc

            def fwd_branch(carry):
                x, mc = my_x(m_f)
                cd_m = _index(cdiff, mc)
                ca_m = _index(caux, mc)
                y = stage_fn(local, x, cd_m, ca_m, extras, mc)
                y_send = jax.tree.map(
                    lambda a: jnp.where(is_fwd, a, jnp.zeros_like(a)), y
                )
                m_send = jnp.where(is_fwd, m_f, -1)
                return carry, y_send, m_send, jax.tree.map(
                    jnp.zeros_like, zeros_x
                )

            def bwd_branch(carry):
                x, mc = my_x(m_b)
                cd_m = _index(cdiff, mc)
                ca_m = _index(caux, mc)

                def mid(carry):
                    def f(local, x, cd):
                        return stage_fn(local, x, cd, ca_m, extras, mc)

                    _, vjp = jax.vjp(f, local, x, cd_m)
                    dlocal, dx, dcd = vjp(
                        jax.tree.map(
                            lambda a, ref: a.astype(ref.dtype),
                            carry["dx_in"],
                            jax.eval_shape(f, local, x, cd_m),
                        )
                    )
                    return (carry, dlocal,
                            jax.tree.map(jnp.zeros_like, last_p), dx, dcd,
                            jnp.zeros((), jnp.float32), zeros_metrics)

                def last(carry):
                    def f(local, last_p, x, cd):
                        y = stage_fn(local, x, cd, ca_m, extras, mc)
                        loss, metrics = last_fn(last_p, y, cd, ca_m, mc)
                        return loss.astype(jnp.float32), metrics

                    loss, vjp, metrics = jax.vjp(
                        f, local, last_p, x, cd_m, has_aux=True
                    )
                    dlocal, dlast, dx, dcd = vjp(jnp.ones((), jnp.float32))
                    return carry, dlocal, dlast, dx, dcd, loss, metrics

                carry, dlocal, dlast, dx, dcd, loss, metrics = jax.lax.cond(
                    d == pp - 1, last, mid, carry
                )
                add = lambda a, b: a + b.astype(a.dtype)
                g_stage = jax.tree.map(add, carry["g_stage"], dlocal)
                g_last = jax.tree.map(add, carry["g_last"], dlast)
                d_cdiff = jax.tree.map(
                    lambda buf, g: buf.at[mc].add(g.astype(buf.dtype)),
                    carry["d_cdiff"], dcd,
                )
                d_inject = jax.tree.map(
                    lambda buf, g: jnp.where(
                        d == 0,
                        buf.at[mc].set(g.astype(buf.dtype)),
                        buf,
                    ),
                    carry["d_inject"], dx,
                )
                carry = dict(
                    carry, g_stage=g_stage, g_last=g_last, d_cdiff=d_cdiff,
                    d_inject=d_inject, loss=carry["loss"] + loss,
                    metrics=jax.tree.map(add, carry["metrics"], metrics),
                )
                return carry, zeros_x, jnp.int32(-1), dx

            carry, y_send, m_send, dx_send = jax.lax.cond(
                is_bwd, bwd_branch, fwd_branch, carry
            )

            # ---- communication: unconditional, every tick (see docstring)
            y_in = jax.lax.ppermute(y_send, "pp", fwd_perm)
            y_m_in = jax.lax.ppermute(m_send, "pp", fwd_perm)
            dx_in = jax.lax.ppermute(
                jax.tree.map(lambda a, z: a.astype(z.dtype), dx_send,
                             zeros_x),
                "pp", bwd_perm,
            )
            carry = dict(carry, y_in=y_in, y_m_in=y_m_in, dx_in=dx_in)
            return carry, None

        carry, _ = jax.lax.scan(tick, carry, jnp.arange(T, dtype=jnp.int32))

        # loss/metrics/grads sum over batch rows -> psum dp too; the
        # per-row cotangents (d_inject, d_cdiff) belong to each dp shard's
        # own rows -> psum over pp ONLY (stage contributions are summed,
        # dp keeps its shard)
        axes = ("pp",) + (("dp",) if dp_axis else ())
        g_stage = carry["g_stage"]
        if dp_axis:
            g_stage = jax.lax.psum(g_stage, "dp")
        return (
            jax.lax.psum(carry["loss"], axes),
            jax.lax.psum(carry["metrics"], axes),
            g_stage,
            jax.lax.psum(carry["g_last"], axes),
            jax.lax.psum(carry["d_inject"], "pp"),
            jax.lax.psum(carry["d_cdiff"], "pp"),
        )

    mb = P(dp_axis)
    f = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P("pp"), P(), mb, mb, mb, P()),
        out_specs=(P(), P(), P("pp"), P(), mb, mb),
        check_vma=False,
    )
    with suppress_active_mesh():
        return f(stacked_params, last_params, inject, consts_diff,
                 consts_aux, extras)
