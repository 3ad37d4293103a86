"""Executed evidence that the effective-rank regularizer COUNTERS collapse
(VERDICT r4 missing #1 — the north star's third axis).

The paper's claim is rank-targeted fusion preventing multi-modal
representation collapse (reference README.md:13-14; the reference code has
no erank computation, SURVEY.md §0).  This file constructs a synthetic
collapsed regime — both modality streams confined to a low-dimensional
subspace (features rank 3 of 32, depth rank 2 of 48) so the fused
representation STARTS collapsed — and trains the flagship BN-fusion model
twice from identical inits on identical batches:

- arm A: ``erank_weight = 0``  (the analysis curve only)
- arm B: ``erank_weight > 0`` with an ``erank_target``

and asserts (a) the arms start at the same effective rank, (b) arm B's
fused-stream erank RISES toward the target while arm A's stays collapsed,
(c) the supervised objective does not degrade (class accuracy within noise
of arm A).  ``tools/measure_erank.py`` runs the same A/B at the flagship
shape and records the JSONL curves for the docs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from test_train_smoke import make_setup
from r3d_tpu.train.loop import Trainer


RANK_F, RANK_D = 3, 2
TARGET = 16.0
EPOCHS = 24
LR = 3e-3  # AdamW's normalized steps need ~70 updates to show the separation


def _collapse_source(src, seed=123):
    """Project every modality stream onto a shared low-rank subspace —
    the global feature matrix becomes exactly rank RANK_F (depth RANK_D)."""
    rng = np.random.RandomState(seed)
    Bf = np.linalg.qr(rng.randn(src.input_dim, RANK_F))[0]
    Pf = (Bf @ Bf.T).astype(np.float32)
    Dd = int(np.prod(src.depth_shape))
    Bd = np.linalg.qr(rng.randn(Dd, RANK_D))[0]
    Pd = (Bd @ Bd.T).astype(np.float32)
    for v in src.videos:
        v["features"] = (v["features"] @ Pf).astype(np.float32)
        flat = v["depth"].reshape(len(v["depth"]), -1) @ Pd
        v["depth"] = flat.reshape(v["depth"].shape).astype(np.float32)


def _run_arm(erank_weight, erank_target):
    """Train the flagship fusion model on the collapsed regime; return the
    per-epoch eval-side (erank, class-accuracy) curves."""
    import dataclasses

    src, cfg, loader = make_setup("futr_fusion_bn", True)
    _collapse_source(src)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, erank_weight=erank_weight, erank_target=erank_target,
            log_erank=True,
        ),
        train=dataclasses.replace(cfg.train, epochs=EPOCHS, lr=LR),
    )
    trainer = Trainer(cfg, src.n_class)
    example = next(iter(loader))
    state = trainer.init_state(
        jax.random.PRNGKey(0), example, steps_per_epoch=len(loader)
    )
    step = trainer.make_train_step()
    eval_step = trainer.make_eval_step()
    rng = jax.random.PRNGKey(1)

    def evaluate(state):
        m = eval_step(state, example)
        acc = float(m["cls_correct"]) / max(float(m["cls_total"]), 1.0)
        return float(m["erank"]), acc

    curve = [evaluate(state)]
    for epoch in range(EPOCHS):
        for batch in loader:
            rng, r = jax.random.split(rng)
            state, _ = step(state, batch, r, epoch)
        curve.append(evaluate(state))
    eranks = np.array([c[0] for c in curve])
    accs = np.array([c[1] for c in curve])
    return eranks, accs


def test_erank_regularizer_counters_collapse():
    er_a, acc_a = _run_arm(0.0, None)
    er_b, acc_b = _run_arm(0.2, TARGET)

    # identical inits + identical data -> identical starting point
    np.testing.assert_allclose(er_a[0], er_b[0], rtol=1e-5)
    assert er_a[0] < TARGET * 0.6, (
        f"regime not collapsed: initial erank {er_a[0]:.2f}"
    )

    # the regularized arm's rank RISES toward the target ...
    assert er_b[-1] > er_b[0] + 0.8, (er_b[0], er_b[-1])
    assert abs(er_b[-1] - TARGET) < abs(er_b[0] - TARGET), (
        f"no approach to target: {er_b[0]:.2f} -> {er_b[-1]:.2f}"
    )
    # ... while the unregularized arm COLLAPSES further under plain CE
    assert er_b[-1] > er_a[-1] + 1.2, (er_a[-1], er_b[-1])
    assert er_a[-1] < er_a[0] + 0.5, (
        f"baseline rank rose on its own: {er_a[0]:.2f} -> {er_a[-1]:.2f}"
    )

    # the supervised objective must not degrade (class accuracy within
    # noise of the unregularized arm)
    assert acc_b[-1] >= acc_a[-1] - 0.08, (acc_a[-1], acc_b[-1])
