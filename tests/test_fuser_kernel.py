"""Pallas fused SA-Fuser tail: kernel == composed math, grads correct, and
the flax pallas path == the composed module path.

On CPU the kernel runs in interpreter mode (forced via R3D_FORCE_PALLAS);
the same code compiles on the real chip (exercised by bench.py).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from r3d_tpu.ops.fuser_kernel import (
    FuserTailParams,
    composed_tail,
    fused_safuser_tail,
)


def make_params(rng, C=64, Ch=256):
    f = lambda *s: jnp.array(rng.randn(*s).astype(np.float32) * 0.3)
    return FuserTailParams(
        norm1_scale=f(C) + 1.0, norm1_bias=f(C),
        wvp=f(C, C), proj_bias=f(C),
        norm2_scale=f(C) + 1.0, norm2_bias=f(C),
        mlp1_kernel=f(C, Ch), mlp1_bias=f(Ch),
        mlp2_kernel=f(Ch, C), mlp2_bias=f(C),
        norm_out_scale=f(C) + 1.0, norm_out_bias=f(C),
    )


@pytest.mark.parametrize("outer_residual", [False, True])
def test_kernel_matches_composed(outer_residual):
    rng = np.random.RandomState(0)
    N, C = 300, 64  # N deliberately not a tile multiple (exercises padding)
    params = make_params(rng, C)
    r = jnp.array(rng.randn(N, C).astype(np.float32))
    d = jnp.array(rng.randn(N, C).astype(np.float32))
    ref = composed_tail(r, d, params, outer_residual)
    out = fused_safuser_tail(r, d, params, outer_residual)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=2e-5)


def test_kernel_gradients_match_composed():
    rng = np.random.RandomState(1)
    N, C = 128, 64
    params = make_params(rng, C)
    r = jnp.array(rng.randn(N, C).astype(np.float32))
    d = jnp.array(rng.randn(N, C).astype(np.float32))

    def loss_fused(r_, d_, p_):
        return jnp.sum(fused_safuser_tail(r_, d_, p_, False) ** 2)

    def loss_composed(r_, d_, p_):
        return jnp.sum(composed_tail(r_, d_, p_, False) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(r, d, params)
    g2 = jax.grad(loss_composed, argnums=(0, 1, 2))(r, d, params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3, rtol=1e-3)


def test_safuser_core_pallas_path_matches_composed():
    from r3d_tpu.models.fuser import _SAFuserCore

    rng = np.random.RandomState(2)
    stacked = jnp.array(rng.randn(4, 25, 2, 64).astype(np.float32))

    composed = _SAFuserCore(64, 1, 4, outer_residual=False, use_pallas=False,
                            drop_rate=0.0)
    params = composed.init(jax.random.PRNGKey(0), stacked)["params"]
    out_composed = composed.apply({"params": params}, stacked)

    os.environ["R3D_FORCE_PALLAS"] = "1"
    try:
        kernelized = _SAFuserCore(64, 1, 4, outer_residual=False,
                                  use_pallas=True, drop_rate=0.0)
        # identical param structure regardless of path
        params_k = kernelized.init(jax.random.PRNGKey(0), stacked)["params"]
        assert jax.tree.structure(params_k) == jax.tree.structure(params)
        out_kernel = kernelized.apply({"params": params}, stacked)
    finally:
        del os.environ["R3D_FORCE_PALLAS"]

    np.testing.assert_allclose(
        np.array(out_kernel), np.array(out_composed), atol=2e-5
    )


def test_cmfuser_bn_fully_fused_matches_composed():
    """CMFuserBN end-to-end (BN + blend + tail) kernel path vs composed,
    eval and train(drop=0) including gradients."""
    from r3d_tpu.models.fuser import CMFuserBN

    rng = np.random.RandomState(5)
    rgb = jnp.array(rng.randn(6, 20, 64).astype(np.float32))
    depth = jnp.array(rng.randn(6, 20, 64).astype(np.float32))

    composed = CMFuserBN(64, n_head=4, drop_rate=0.0, use_pallas=False)
    variables = composed.init(jax.random.PRNGKey(0), rgb, depth, train=False)
    # randomize BN params/stats so the prologue is non-trivial
    p = jax.device_get(variables["params"])
    p["bn_rgb"]["scale"] = rng.randn(64).astype(np.float32)
    p["bn_depth"]["scale"] = rng.randn(64).astype(np.float32)
    bs = {
        "bn_rgb": {"mean": rng.randn(64).astype(np.float32) * 0.3,
                   "var": rng.rand(64).astype(np.float32) + 0.5},
        "bn_depth": {"mean": rng.randn(64).astype(np.float32) * 0.3,
                     "var": rng.rand(64).astype(np.float32) + 0.5},
    }
    variables = {"params": jax.tree.map(jnp.asarray, p),
                 "batch_stats": jax.tree.map(jnp.asarray, bs)}

    kernelized = CMFuserBN(64, n_head=4, drop_rate=0.0, use_pallas=True)

    for train in (False, True):
        kw = dict(train=train)
        if train:
            kw["rngs"] = {"dropout": jax.random.PRNGKey(1)}
        out_c = composed.apply(variables, rgb, depth,
                               mutable=["batch_stats"], **kw)[0]
        os.environ["R3D_FORCE_PALLAS"] = "1"
        try:
            out_k = kernelized.apply(variables, rgb, depth,
                                     mutable=["batch_stats"], **kw)[0]
        finally:
            del os.environ["R3D_FORCE_PALLAS"]
        np.testing.assert_allclose(np.array(out_k), np.array(out_c), atol=3e-5)

    # gradients through the fully fused op (train mode, batch stats)
    def loss(fuser, force):
        def f(params):
            if force:
                os.environ["R3D_FORCE_PALLAS"] = "1"
            try:
                out, _ = fuser.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    rgb, depth, train=True, mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(1)},
                )
            finally:
                os.environ.pop("R3D_FORCE_PALLAS", None)
            return jnp.sum(out ** 2)

        return f

    g_c = jax.grad(loss(composed, False))(variables["params"])
    g_k = jax.grad(loss(kernelized, True))(variables["params"])
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-3, rtol=2e-3)


def test_pallas_backward_kernel_matches_autodiff():
    """Hand-written backward kernel == jax.vjp of the composed math."""
    from r3d_tpu.ops.fuser_kernel import composed_tail
    from r3d_tpu.ops.fuser_kernel_bwd import pallas_tail_bwd

    rng = np.random.RandomState(11)
    for outer in (False, True):
        N, C = 300, 64   # non-tile-multiple rows exercise padding
        params = make_params(rng, C)
        r = jnp.array(rng.randn(N, C).astype(np.float32))
        d = jnp.array(rng.randn(N, C).astype(np.float32))
        g = jnp.array(rng.randn(N, C).astype(np.float32))

        _, vjp = jax.vjp(
            lambda r_, d_, p_: composed_tail(r_, d_, p_, outer), r, d, params
        )
        ref_dr, ref_dd, ref_dp = vjp(g)
        dr, dd, dp = pallas_tail_bwd(r, d, g, params, outer)

        np.testing.assert_allclose(np.array(dr), np.array(ref_dr),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.array(dd), np.array(ref_dd),
                                   atol=2e-4, rtol=1e-4)
        for name, a, b in zip(ref_dp._fields, dp, ref_dp):
            scale = max(float(np.abs(np.array(b)).max()), 1e-6)
            np.testing.assert_allclose(
                np.array(a), np.array(b), atol=3e-4 * scale, rtol=2e-3,
                err_msg=f"param grad mismatch: {name} (outer={outer})",
            )


def test_end_to_end_with_pallas_backward():
    """Full train-style grad through fused_safuser_tail with the kernelized
    backward enabled equals the remat backward."""
    from r3d_tpu.ops.fuser_kernel import fused_safuser_tail

    rng = np.random.RandomState(12)
    params = make_params(rng, 64)
    r = jnp.array(rng.randn(256, 64).astype(np.float32))
    d = jnp.array(rng.randn(256, 64).astype(np.float32))

    def loss(r_, d_, p_):
        return jnp.sum(fused_safuser_tail(r_, d_, p_, False) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(r, d, params)
    os.environ["R3D_PALLAS_BWD"] = "1"
    try:
        g_k = jax.grad(loss, argnums=(0, 1, 2))(r, d, params)
    finally:
        del os.environ["R3D_PALLAS_BWD"]
    for a, b in zip(jax.tree.leaves(g_k), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3, rtol=2e-3)
