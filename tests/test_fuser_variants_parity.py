"""Fuser-ablation parity vs the reference on copied torch weights
(VERDICT r1 weak #7: vary / no-exchange / afft were shape-smoke only).

- CMFuserVary vs model/futr_safuser_tokenfusion_vary.py CMFuser
  (activation ranking, alpha*other exchange, NO outer residual — the vary
  file comments out the ``x = x + x_res`` the grad variant keeps);
- CMFuserNoExchange vs model/futr_safuser_depth.py CMFuser (modality token,
  no exchange, no residual). model/afft.py's CMFuser is line-identical to
  the depth one, so this also covers the AFFT fusion stage.
"""

import numpy as np
import pytest

from conftest import reference_on_path

HAS_REF = reference_on_path()
pytestmark = pytest.mark.skipif(not HAS_REF, reason="reference not mounted")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from r3d_tpu.models.fuser import CMFuserNoExchange, CMFuserVary  # noqa: E402

if HAS_REF:
    import torch
    import torch_ref

    torch_ref.patch_cuda_free()

C, HEADS = 32, 4
B, T = 3, 10


def _safuser_params(ref_fuser):
    p = {"block0": torch_ref.fuser_block_params(ref_fuser.blocks[0])}
    p["norm_scale"] = torch_ref.t2n(ref_fuser.norm.weight)
    p["norm_bias"] = torch_ref.t2n(ref_fuser.norm.bias)
    return p


def test_vary_fuser_parity():
    from model.futr_safuser_tokenfusion_vary import CMFuser as RefVary

    torch.manual_seed(0)
    ref = RefVary(dim=C, depth=1, num_heads=HEADS)
    with torch.no_grad():
        ref.alpha.copy_(torch.randn(1, 1, C))  # non-trivial alpha
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(2)
    rgb = rng.randn(B, T, C).astype(np.float32)
    depth = rng.randn(B, T, C).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(
            {"rgb": torch.tensor(rgb), "depth": torch.tensor(depth)},
            mode="test",
        )

    ours = CMFuserVary(C, depth=1, n_head=HEADS, drop_rate=0.0)
    params = {
        "alpha": torch_ref.t2n(ref.alpha),
        "safuser": _safuser_params(ref),
    }
    params = jax.tree.map(jnp.asarray, params)
    out = ours.apply({"params": params}, jnp.array(rgb), jnp.array(depth),
                     train=False)
    np.testing.assert_allclose(np.array(out), ref_out.numpy(), atol=3e-5)


def test_no_exchange_fuser_parity():
    from model.futr_safuser_depth import CMFuser as RefDepth

    torch.manual_seed(1)
    ref = RefDepth(dim=C, depth=1, num_heads=HEADS)
    ref.eval()
    torch_ref.zero_dropout(ref)

    rng = np.random.RandomState(3)
    rgb = rng.randn(B, T, C).astype(np.float32)
    depth = rng.randn(B, T, C).astype(np.float32)
    with torch.no_grad():
        ref_out, _attn = ref(
            {"rgb": torch.tensor(rgb), "depth": torch.tensor(depth)}
        )

    ours = CMFuserNoExchange(C, depth=1, n_head=HEADS, drop_rate=0.0)
    params = {
        "modality_token": torch_ref.t2n(ref.modality_token),
        "safuser": _safuser_params(ref),
    }
    params = jax.tree.map(jnp.asarray, params)
    out = ours.apply({"params": params}, jnp.array(rgb), jnp.array(depth),
                     train=False)
    np.testing.assert_allclose(np.array(out), ref_out.numpy(), atol=3e-5)


def test_afft_fuser_is_depth_fuser():
    """model/afft.py's CMFuser forward must be line-identical to
    futr_safuser_depth.py's (so the parity above covers both); guards
    against silent divergence between the two reference files."""
    import inspect

    from model.afft import CMFuser as RefAfft
    from model.futr_safuser_depth import CMFuser as RefDepth

    assert inspect.getsource(RefAfft.forward) == inspect.getsource(
        RefDepth.forward
    )
