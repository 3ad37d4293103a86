"""Pallas backward kernel for the fused SA-Fuser tail.

The default backward rematerializes the composed math through XLA
(fuser_kernel._bwd). This kernel computes the whole backward in one pass per
row tile — recomputing forward intermediates in VMEM and accumulating
parameter gradients across the (sequential) TPU grid into resident output
blocks, so the [N, C] streams make exactly one HBM round trip in backward.

Derivation (streams r, d; W = W_v@W_proj prefolded; LN eps 1e-5):

    h_* = LN1(*)            x_r = r + h_d W + b      (cross swap!)
    u_* = LN2(x_*)          z_* = u_* W1 + b1        p_* = gelu(z_*)
    y_* = x_* + p_* W2 + b2 (+ input if outer residual)
    out = (LNo(y_r) + LNo(y_d)) / 2

LN backward (per row, params gamma):
    dx = rstd * (ghat - mean(ghat) - xhat * mean(ghat * xhat)),
    ghat = g * gamma;  dgamma += sum_rows g * xhat;  dbeta += sum_rows g.

Exact GELU': 0.5*(1+erf(z/sqrt2)) + z * exp(-z^2/2)/sqrt(2*pi).

Used by fused_safuser_tail by default (R3D_PALLAS_BWD=0 opts back into the
XLA-remat backward); equality vs jax.vjp(composed_tail) is tested in
tests/test_fuser_kernel.py.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from r3d_tpu.ops.fuser_kernel import FuserTailParams, _erf_approx

_EPS = 1e-5
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _ln_fwd(x, scale, bias):
    """Returns (y, xhat, rstd) in fp32."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = (x32 - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(g, xhat, rstd, scale):
    """Input cotangent of LN (per-row)."""
    gh = g * scale
    m1 = jnp.mean(gh, axis=-1, keepdims=True)
    m2 = jnp.mean(gh * xhat, axis=-1, keepdims=True)
    return (gh - m1 - xhat * m2) * rstd


def _gelu_fwd_grad(z):
    """(gelu(z), gelu'(z)) exact-erf form, fp32."""
    cdf = 0.5 * (1.0 + _erf_approx(z * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    return z * cdf, cdf + z * pdf


def _bwd_kernel(
    r_ref, d_ref, g_ref,
    n1s, n1b, wvp, pb, n2s, n2b, w1, b1, w2, b2, nos, nob,
    dr_ref, dd_ref,
    dn1s, dn1b, dwvp, dpb, dn2s, dn2b, dw1, db1, dw2, db2, dnos, dnob,
    *, outer_residual: bool,
):
    first = pl.program_id(0) == 0

    @pl.when(first)
    def _init():
        for ref in (dn1s, dn1b, dpb, dn2s, dn2b, db1, db2, dnos, dnob,
                    dwvp, dw1, dw2):
            ref[:] = jnp.zeros_like(ref)

    r = r_ref[:].astype(jnp.float32)
    d = d_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32) * 0.5  # mean over the two streams

    W = wvp[:].astype(jnp.float32)
    W1 = w1[:].astype(jnp.float32)
    W2 = w2[:].astype(jnp.float32)
    s1, bb1 = n1s[0].astype(jnp.float32), n1b[0].astype(jnp.float32)
    s2, bb2 = n2s[0].astype(jnp.float32), n2b[0].astype(jnp.float32)
    so, bo = nos[0].astype(jnp.float32), nob[0].astype(jnp.float32)
    bp = pb[0].astype(jnp.float32)
    bias1 = b1[0].astype(jnp.float32)
    bias2 = b2[0].astype(jnp.float32)

    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)

    # ---- recompute forward ----
    h_r, xhat1_r, rstd1_r = _ln_fwd(r, s1, bb1)
    h_d, xhat1_d, rstd1_d = _ln_fwd(d, s1, bb1)
    x_r = r + dot(h_d, W) + bp
    x_d = d + dot(h_r, W) + bp
    u_r, xhat2_r, rstd2_r = _ln_fwd(x_r, s2, bb2)
    u_d, xhat2_d, rstd2_d = _ln_fwd(x_d, s2, bb2)
    z_r = dot(u_r, W1) + bias1
    z_d = dot(u_d, W1) + bias1
    p_r, dp_r = _gelu_fwd_grad(z_r)
    p_d, dp_d = _gelu_fwd_grad(z_d)
    y_r = x_r + dot(p_r, W2) + bias2
    y_d = x_d + dot(p_d, W2) + bias2
    if outer_residual:
        y_r = y_r + r
        y_d = y_d + d
    _, xhato_r, rstdo_r = _ln_fwd(y_r, so, bo)
    _, xhato_d, rstdo_d = _ln_fwd(y_d, so, bo)

    # ---- backward ----
    # output LN (both streams share params)
    dnos[:] += (jnp.sum(g * xhato_r, axis=0) + jnp.sum(g * xhato_d, axis=0))[None]
    dnob[:] += (2.0 * jnp.sum(g, axis=0))[None]
    gy_r = _ln_bwd(g, xhato_r, rstdo_r, so)
    gy_d = _ln_bwd(g, xhato_d, rstdo_d, so)

    # MLP branch (per stream): y = x + gelu(LN2(x) W1 + b1) W2 + b2
    def mlp_bwd(gy, p, dp, u, xhat2, rstd2):
        dm = gy                      # cotangent at the W2 matmul output
        dp_in = dot(dm, W2.T)
        dz = dp_in * dp
        du = dot(dz, W1.T)
        dx = _ln_bwd(du, xhat2, rstd2, s2)
        return dx, dm, dz, du

    dx_r_mlp, dm_r, dz_r, du_r = mlp_bwd(gy_r, p_r, dp_r, u_r, xhat2_r, rstd2_r)
    dx_d_mlp, dm_d, dz_d, du_d = mlp_bwd(gy_d, p_d, dp_d, u_d, xhat2_d, rstd2_d)

    dw2[:] += dot(p_r.T, dm_r) + dot(p_d.T, dm_d)
    db2[:] += (jnp.sum(dm_r, axis=0) + jnp.sum(dm_d, axis=0))[None]
    dw1[:] += dot(u_r.T, dz_r) + dot(u_d.T, dz_d)
    db1[:] += (jnp.sum(dz_r, axis=0) + jnp.sum(dz_d, axis=0))[None]
    dn2s[:] += (jnp.sum(du_r * xhat2_r, axis=0) + jnp.sum(du_d * xhat2_d, axis=0))[None]
    dn2b[:] += (jnp.sum(du_r, axis=0) + jnp.sum(du_d, axis=0))[None]

    dx_r = gy_r + dx_r_mlp
    dx_d = gy_d + dx_d_mlp

    # attention swap: x_r = r + h_d W + b ; x_d = d + h_r W + b
    dwvp[:] += dot(h_d.T, dx_r) + dot(h_r.T, dx_d)
    dpb[:] += (jnp.sum(dx_r, axis=0) + jnp.sum(dx_d, axis=0))[None]
    dh_d = dot(dx_r, W.T)
    dh_r = dot(dx_d, W.T)

    dn1s[:] += (jnp.sum(dh_r * xhat1_r, axis=0) + jnp.sum(dh_d * xhat1_d, axis=0))[None]
    dn1b[:] += (jnp.sum(dh_r, axis=0) + jnp.sum(dh_d, axis=0))[None]

    dr = dx_r + _ln_bwd(dh_r, xhat1_r, rstd1_r, s1)
    dd = dx_d + _ln_bwd(dh_d, xhat1_d, rstd1_d, s1)
    if outer_residual:
        dr = dr + gy_r
        dd = dd + gy_d

    dr_ref[:] = dr.astype(dr_ref.dtype)
    dd_ref[:] = dd.astype(dd_ref.dtype)


def pallas_tail_bwd(r, d, g, params: FuserTailParams, outer_residual: bool,
                    tile_n: int = 512):
    """Returns (dr, dd, FuserTailParams-shaped grads)."""
    N, C = r.shape
    Ch = params.mlp1_kernel.shape[1]
    pad_n = (-N) % tile_n
    if pad_n:
        # zero-padded rows produce zero cotangents for params because g pads
        # with zeros; row grads slice back
        r = jnp.pad(r, ((0, pad_n), (0, 0)))
        d = jnp.pad(d, ((0, pad_n), (0, 0)))
        g = jnp.pad(g, ((0, pad_n), (0, 0)))
    Np = r.shape[0]

    row2 = lambda a: a.reshape(1, -1)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hid = pl.BlockSpec((1, Ch), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((tile_n, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32

    out_shapes = [
        jax.ShapeDtypeStruct((Np, C), r.dtype),        # dr
        jax.ShapeDtypeStruct((Np, C), d.dtype),        # dd
        jax.ShapeDtypeStruct((1, C), f32),             # dn1s
        jax.ShapeDtypeStruct((1, C), f32),             # dn1b
        jax.ShapeDtypeStruct((C, C), f32),             # dwvp
        jax.ShapeDtypeStruct((1, C), f32),             # dpb
        jax.ShapeDtypeStruct((1, C), f32),             # dn2s
        jax.ShapeDtypeStruct((1, C), f32),             # dn2b
        jax.ShapeDtypeStruct((C, Ch), f32),            # dw1
        jax.ShapeDtypeStruct((1, Ch), f32),            # db1
        jax.ShapeDtypeStruct((Ch, C), f32),            # dw2
        jax.ShapeDtypeStruct((1, C), f32),             # db2
        jax.ShapeDtypeStruct((1, C), f32),             # dnos
        jax.ShapeDtypeStruct((1, C), f32),             # dnob
    ]
    out_specs = [
        tile, tile,
        vec, vec, mat(C, C), vec, vec, vec,
        mat(C, Ch), hid, mat(Ch, C), vec, vec, vec,
    ]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, outer_residual=outer_residual),
        grid=(Np // tile_n,),
        in_specs=[
            tile, tile, tile,
            vec, vec, mat(C, C), vec, vec, vec,
            mat(C, Ch), hid, mat(Ch, C), vec, vec, vec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=6 * Np * (2 * C * C + 4 * C * Ch),
            bytes_accessed=5 * Np * C * r.dtype.itemsize,
            transcendentals=4 * Np * Ch,
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        r, d, g,
        row2(params.norm1_scale), row2(params.norm1_bias),
        params.wvp, row2(params.proj_bias),
        row2(params.norm2_scale), row2(params.norm2_bias),
        params.mlp1_kernel, row2(params.mlp1_bias),
        params.mlp2_kernel, row2(params.mlp2_bias),
        row2(params.norm_out_scale), row2(params.norm_out_bias),
    )
    (dr, dd, dn1s, dn1b, dwvp, dpb, dn2s, dn2b, dw1, db1, dw2, db2,
     dnos, dnob) = outs
    if pad_n:
        dr, dd = dr[:N], dd[:N]
    dparams = FuserTailParams(
        norm1_scale=dn1s[0], norm1_bias=dn1b[0], wvp=dwvp, proj_bias=dpb[0],
        norm2_scale=dn2s[0], norm2_bias=dn2b[0],
        mlp1_kernel=dw1, mlp1_bias=db1[0], mlp2_kernel=dw2, mlp2_bias=db2[0],
        norm_out_scale=dnos[0], norm_out_bias=dnob[0],
    )
    dparams = jax.tree.map(
        lambda gr, p: gr.astype(p.dtype), dparams, params
    )
    return dr, dd, dparams


def pallas_bwd_enabled() -> bool:
    """Default ON since round 2: measured faster than the XLA-remat backward
    on v5e at both B=8 (7.0 -> 6.9 ms/step) and B=64 (10.0 -> 8.9 ms/step,
    +10%) on the fusion workload (tools/measure_r2.py). R3D_PALLAS_BWD=0
    opts back into the remat path."""
    return os.environ.get("R3D_PALLAS_BWD", "1") == "1"
