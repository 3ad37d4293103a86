"""Effective-rank op: value vs numpy SVD oracle, gradient vs finite
differences and autodiff-through-SVD, stability on degenerate spectra."""

import numpy as np
import jax
import jax.numpy as jnp

from r3d_tpu.ops import effective_rank, effective_rank_loss


def np_erank(x):
    s = np.linalg.svd(x, compute_uv=False)
    p = s / s.sum()
    p = p[p > 1e-12]
    return float(np.exp(-(p * np.log(p)).sum()))


def test_value_matches_svd_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(40, 16).astype(np.float32)
    ours = float(effective_rank(jnp.array(x)))
    np.testing.assert_allclose(ours, np_erank(x), rtol=1e-4)


def test_value_low_rank():
    rng = np.random.RandomState(1)
    u = rng.randn(40, 2).astype(np.float32)
    v = rng.randn(2, 16).astype(np.float32)
    x = u @ v  # rank 2
    er = float(effective_rank(jnp.array(x)))
    assert er < 2.6, er


def test_masking_is_exact():
    rng = np.random.RandomState(2)
    x = rng.randn(30, 8).astype(np.float32)
    mask = np.ones(30, np.float32)
    mask[20:] = 0
    full = float(effective_rank(jnp.array(x[:20])))
    masked = float(effective_rank(jnp.array(x), jnp.array(mask)))
    np.testing.assert_allclose(masked, full, rtol=1e-5)


def test_gradient_finite_difference():
    rng = np.random.RandomState(3)
    with jax.enable_x64():
        x = jnp.array(rng.randn(12, 6), dtype=jnp.float64)
        f = lambda y: effective_rank(y)
        g = jax.grad(f)(x)
        eps = 1e-6
        for idx in [(0, 0), (3, 2), (11, 5)]:
            dx = jnp.zeros_like(x).at[idx].set(eps)
            fd = (f(x + dx) - f(x - dx)) / (2 * eps)
            np.testing.assert_allclose(float(g[idx]), float(fd), rtol=1e-4, atol=1e-9)


def test_gradient_stable_on_degenerate_spectrum():
    """Identical singular values break eigh autodiff; the custom VJP must
    return finite gradients."""
    x = jnp.eye(8, dtype=jnp.float32)  # all singular values equal
    g = jax.grad(lambda y: effective_rank_loss(y))(x)
    assert np.all(np.isfinite(np.array(g)))


def test_batched_and_loss():
    rng = np.random.RandomState(4)
    x = jnp.array(rng.randn(3, 20, 8).astype(np.float32))
    er = effective_rank(x)
    assert er.shape == (3,)
    l1 = float(effective_rank_loss(x))
    np.testing.assert_allclose(l1, -float(jnp.mean(er)), rtol=1e-6)
    l2 = float(effective_rank_loss(x, target=5.0))
    assert l2 >= 0
