"""Pallas TPU kernel: fused SA-Fuser tail.

The Rank-enhancing Token Fuser's hot path (futr_safuser_*.py:74-105) runs,
per frame, a 2-token pre-norm transformer block + LayerNorm + modality mean.
Composed XLA executes it as a chain of LN-reduction-broken fusions with ~10
HBM round trips of the [B*T, 2, C] stream. This kernel computes the whole
tail in one pass over VMEM-resident tiles:

    h_r = LN1(r)            h_d = LN1(d)
    x_r = r + h_d @ Wvp + b      (exact 2-token masked attention == value
    x_d = d + h_r @ Wvp + b       swap; Wvp = W_v @ W_proj prefolded)
    x_* += GELU(LN2(x_*) @ W1 + b1) @ W2 + b2
    x_* += input (optional outer residual, tokenfusion.py:92)
    out = (LN_out(x_r) + LN_out(x_d)) / 2

Weights live in VMEM across the whole grid (C<=512 easily fits); the r/d
streams are tiled over rows. All LayerNorm statistics in fp32.

Backward: ``fused_safuser_tail`` is a jax.custom_vjp whose bwd re-runs the
composed-JAX math under jax.vjp — i.e. rematerialized backward (no saved
intermediates), validated against autodiff of the composed forward in
tests/test_fuser_kernel.py.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_enabled() -> bool:
    """Kernel path gate: real TPU, or forced (interpret mode) for tests.

    Multi-device note: a bare pallas_call under jit with dp-sharded operands
    makes XLA gather them to one device. The fuser ops are row-parallel, so
    when a mesh is active (parallel.mesh.set_active_mesh) they shard_map
    themselves over dp; without an active mesh, multi-device runs take the
    composed XLA path, which partitions cleanly.
    """
    if os.environ.get("R3D_FORCE_PALLAS") == "1":
        return True
    if jax.default_backend() != "tpu":
        return False
    if jax.device_count() == 1:
        return True
    from r3d_tpu.parallel.mesh import active_mesh

    return active_mesh() is not None


def _maybe_shard_mapped(op, n_diff_args: int):
    """Wrap a row-parallel op (leading axis = B*T rows) in shard_map over the
    active mesh's dp axis; identity when no multi-device mesh is active.

    ``op(r, d, *tree_args, static_flag)``: first two args row-sharded, the
    rest replicated parameter pytrees, one trailing static bool.
    """

    def call(r, d, *args):
        *tree_args, static_flag = args
        from r3d_tpu.parallel.mesh import active_mesh

        mesh = active_mesh()
        if mesh is None or mesh.shape.get("dp", 1) == 1:
            return op(r, d, *tree_args, static_flag)
        from jax.sharding import PartitionSpec as P

        f = jax.shard_map(
            lambda r_, d_, *t: op(r_, d_, *t, static_flag),
            mesh=mesh,
            in_specs=(P("dp"), P("dp")) + (P(),) * n_diff_args,
            out_specs=P("dp"),
            check_vma=False,
        )
        return f(r, d, *tree_args)

    return call


class BlendParams(NamedTuple):
    """BN-affine + channel-blend prologue (futr_safuser_batchnormalization
    token_fusion): normalized = x*scale + shift with
    scale = gamma*rsqrt(var+eps), shift = beta - mean*scale precomputed;
    bottom-k channels (mask as float) alpha-blend with the other modality."""

    scale_r: jnp.ndarray   # [C]
    shift_r: jnp.ndarray
    scale_d: jnp.ndarray
    shift_d: jnp.ndarray
    mask_r: jnp.ndarray    # [C] float 0/1
    mask_d: jnp.ndarray
    alpha: jnp.ndarray     # [C]


class FuserTailParams(NamedTuple):
    norm1_scale: jnp.ndarray   # [C]
    norm1_bias: jnp.ndarray
    wvp: jnp.ndarray           # [C, C] = W_v @ W_proj (prefolded)
    proj_bias: jnp.ndarray     # [C]
    norm2_scale: jnp.ndarray
    norm2_bias: jnp.ndarray
    mlp1_kernel: jnp.ndarray   # [C, Ch]
    mlp1_bias: jnp.ndarray     # [Ch]
    mlp2_kernel: jnp.ndarray   # [Ch, C]
    mlp2_bias: jnp.ndarray     # [C]
    norm_out_scale: jnp.ndarray
    norm_out_bias: jnp.ndarray


def _erf_approx(x):
    """erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7) — Mosaic in this
    image lowers neither erf nor erfc, so exact-GELU needs its own erf."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _ln(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def composed_bn_blend(r_raw, d_raw, blend: BlendParams):
    """Plain-JAX BN-affine + alpha-blend prologue."""
    dt = r_raw.dtype
    rn = r_raw * blend.scale_r.astype(dt) + blend.shift_r.astype(dt)
    dn = d_raw * blend.scale_d.astype(dt) + blend.shift_d.astype(dt)
    a = blend.alpha.astype(dt)
    mr = blend.mask_r.astype(dt)
    md = blend.mask_d.astype(dt)
    ex_r = mr * (a * rn + (1 - a) * dn) + (1 - mr) * rn
    ex_d = md * (a * dn + (1 - a) * rn) + (1 - md) * dn
    return ex_r, ex_d


def composed_tail(
    r: jnp.ndarray, d: jnp.ndarray, params: FuserTailParams, outer_residual: bool
) -> jnp.ndarray:
    """Reference math in plain JAX (used for the VJP and as fallback)."""
    p = params
    dt = r.dtype
    h_r = _ln(r, p.norm1_scale, p.norm1_bias).astype(dt)
    h_d = _ln(d, p.norm1_scale, p.norm1_bias).astype(dt)
    x_r = r + h_d @ p.wvp.astype(dt) + p.proj_bias.astype(dt)
    x_d = d + h_r @ p.wvp.astype(dt) + p.proj_bias.astype(dt)

    def mlp(x):
        h = _ln(x, p.norm2_scale, p.norm2_bias).astype(dt)
        m = jax.nn.gelu(h @ p.mlp1_kernel.astype(dt) + p.mlp1_bias.astype(dt),
                        approximate=False)
        return m @ p.mlp2_kernel.astype(dt) + p.mlp2_bias.astype(dt)

    x_r = x_r + mlp(x_r)
    x_d = x_d + mlp(x_d)
    if outer_residual:
        x_r = x_r + r
        x_d = x_d + d
    y = 0.5 * (
        _ln(x_r, p.norm_out_scale, p.norm_out_bias)
        + _ln(x_d, p.norm_out_scale, p.norm_out_bias)
    )
    return y.astype(dt)


def _kernel(r_ref, d_ref, *refs, outer_residual: bool, with_blend: bool):
    r = r_ref[:]
    d = d_ref[:]
    dt = r.dtype
    if with_blend:
        (sr, hr, sd, hd, mr, md, al), refs = refs[:7], refs[7:]
        rn = r * sr[0].astype(dt) + hr[0].astype(dt)
        dn = d * sd[0].astype(dt) + hd[0].astype(dt)
        a = al[0].astype(dt)
        mr_ = mr[0].astype(dt)
        md_ = md[0].astype(dt)
        r = mr_ * (a * rn + (1 - a) * dn) + (1 - mr_) * rn
        d = md_ * (a * dn + (1 - a) * rn) + (1 - md_) * dn
    n1s, n1b, wvp, pb, n2s, n2b, w1, b1, w2, b2, nos, nob, out_ref = refs
    ln = lambda x, s, b: _ln(x, s[0], b[0]).astype(dt)

    h_r = ln(r, n1s, n1b)
    h_d = ln(d, n1s, n1b)
    wvp_ = wvp[:].astype(dt)
    bp = pb[0].astype(dt)
    x_r = r + jnp.dot(h_d, wvp_, preferred_element_type=jnp.float32).astype(dt) + bp
    x_d = d + jnp.dot(h_r, wvp_, preferred_element_type=jnp.float32).astype(dt) + bp

    w1_ = w1[:].astype(dt)
    w2_ = w2[:].astype(dt)
    b1_ = b1[0].astype(dt)
    b2_ = b2[0].astype(dt)

    def mlp(x):
        h = ln(x, n2s, n2b)
        m = jnp.dot(h, w1_, preferred_element_type=jnp.float32).astype(dt) + b1_
        # exact erf-form GELU (jax.nn.gelu's erfc path doesn't lower in Mosaic)
        m32 = m.astype(jnp.float32)
        m = (0.5 * m32 * (1.0 + _erf_approx(m32 * 0.7071067811865476))).astype(dt)
        return jnp.dot(m, w2_, preferred_element_type=jnp.float32).astype(dt) + b2_

    x_r = x_r + mlp(x_r)
    x_d = x_d + mlp(x_d)
    if outer_residual:
        x_r = x_r + r
        x_d = x_d + d
    y = 0.5 * (ln(x_r, nos, nob).astype(jnp.float32)
               + ln(x_d, nos, nob).astype(jnp.float32))
    out_ref[:] = y.astype(out_ref.dtype)


def _pallas_forward(r, d, params: FuserTailParams, outer_residual: bool,
                    blend=None, tile_n: int = 512):
    N, C = r.shape
    Ch = params.mlp1_kernel.shape[1]
    pad_n = (-N) % tile_n
    if pad_n:
        r = jnp.pad(r, ((0, pad_n), (0, 0)))
        d = jnp.pad(d, ((0, pad_n), (0, 0)))
    Np = r.shape[0]

    row2 = lambda a: a.reshape(1, -1)
    vec_spec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hid_spec = pl.BlockSpec((1, Ch), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((tile_n, C), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    blend_args = []
    blend_specs = []
    if blend is not None:
        blend_args = [
            row2(blend.scale_r), row2(blend.shift_r),
            row2(blend.scale_d), row2(blend.shift_d),
            row2(blend.mask_r), row2(blend.mask_d), row2(blend.alpha),
        ]
        blend_specs = [vec_spec] * 7

    out = pl.pallas_call(
        functools.partial(
            _kernel, outer_residual=outer_residual, with_blend=blend is not None
        ),
        grid=(Np // tile_n,),
        in_specs=[tile_spec, tile_spec] + blend_specs + [
            vec_spec, vec_spec,                 # norm1
            mat_spec(C, C), vec_spec,           # wvp, proj bias
            vec_spec, vec_spec,                 # norm2
            mat_spec(C, Ch), hid_spec,          # mlp1
            mat_spec(Ch, C), vec_spec,          # mlp2
            vec_spec, vec_spec,                 # norm out
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((Np, C), r.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * (2 * C * C + 4 * C * Ch),
            bytes_accessed=3 * Np * C * r.dtype.itemsize,
            transcendentals=2 * Np * Ch,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        r, d, *blend_args,
        row2(params.norm1_scale), row2(params.norm1_bias),
        params.wvp, row2(params.proj_bias),
        row2(params.norm2_scale), row2(params.norm2_bias),
        params.mlp1_kernel, row2(params.mlp1_bias),
        params.mlp2_kernel, row2(params.mlp2_bias),
        row2(params.norm_out_scale), row2(params.norm_out_bias),
    )
    return out[:N] if pad_n else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_safuser_tail(r, d, params: FuserTailParams, outer_residual: bool):
    """[N, C] x 2 streams -> fused [N, C]. Pallas forward, remat backward."""
    return _pallas_forward(r, d, params, outer_residual)


def _fwd(r, d, params, outer_residual):
    return _pallas_forward(r, d, params, outer_residual), (r, d, params)


def _bwd(outer_residual, res, g):
    r, d, params = res
    from r3d_tpu.ops.fuser_kernel_bwd import pallas_bwd_enabled, pallas_tail_bwd

    if pallas_bwd_enabled():
        return pallas_tail_bwd(r, d, g, params, outer_residual)
    _, vjp = jax.vjp(
        lambda r_, d_, p_: composed_tail(r_, d_, p_, outer_residual), r, d, params
    )
    return vjp(g)


fused_safuser_tail.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_bn_blend_tail(r_raw, d_raw, blend: BlendParams,
                        params: FuserTailParams, outer_residual: bool):
    """The COMPLETE CMFuser in one kernel pass: BN-affine normalize +
    bottom-k alpha-blend + 2-token attention + MLP + LN + modality mean.
    BN statistics (batch or running) fold into blend.scale/shift outside."""
    return _pallas_forward(r_raw, d_raw, params, outer_residual, blend=blend)


def _fwd_bn(r_raw, d_raw, blend, params, outer_residual):
    out = _pallas_forward(r_raw, d_raw, params, outer_residual, blend=blend)
    return out, (r_raw, d_raw, blend, params)


def _bwd_bn(outer_residual, res, g):
    r_raw, d_raw, blend, params = res

    def f(r_, d_, b_, p_):
        ex_r, ex_d = composed_bn_blend(r_, d_, b_)
        return composed_tail(ex_r, ex_d, p_, outer_residual)

    _, vjp = jax.vjp(f, r_raw, d_raw, blend, params)
    return vjp(g)


fused_bn_blend_tail.defvjp(_fwd_bn, _bwd_bn)

# mesh-aware entry points (row-shard over dp when a mesh is active)
fused_safuser_tail_sharded = _maybe_shard_mapped(fused_safuser_tail, 1)
fused_bn_blend_tail_sharded = _maybe_shard_mapped(fused_bn_blend_tail, 2)
