"""Round-3 measurement harness — same-process interleaved A/Bs (CLAUDE.md:
cross-process comparisons drift up to 2x, so both arms build in ONE process
and interleave their timed windows).

1. BN statistics: single-pass (shifted E[x^2]) vs naive two-pass
   (R3D_BN_TWO_PASS=1 at trace time) — fusion step at B=8 and B=64.
2. 50salads train step: attention kernel TRAIN path (in-kernel dropout,
   decoder cross-attention 20x3100) vs composed attention.
3. Attention backward at the 50salads self-attention shape (B=64 bf16,
   VERDICT r2 #9): Pallas bwd kernel vs remat-composed bwd.
4. Dropout PRNG impl (threefry vs TPU hardware 'rbg') on the 50salads
   step — measured 0.833x (8.04 -> 9.65 ms): threefry fuses into the mask
   consumers, rng_bit_generator doesn't. Default stays threefry.
5. AdamW mu storage dtype fp32 vs bf16 — measured 1.001x (neutral);
   shipped as an opt-in MEMORY knob (TrainConfig.opt_mu_dtype).

Usage: python tools/measure_r3.py [fusion|attn|bwd|cross|rng|mu|all]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_step(step, state, batch, rng, n_steps=10, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        for i in range(n_steps):
            state, m = step(state, batch, jax.random.fold_in(rng, i), 0)
        float(m["loss"])  # value fetch forces the chain (axon)
        best = min(best, (time.time() - t0) / n_steps)
    return best, state


# measure_bn (removed): the single-pass shifted-E[x^2] BN statistics were
# A/B-measured on v5e (interleaved): two-pass 5.933 ms vs single-pass
# 6.243 ms at B=8 (0.95x), 7.551 vs 7.587 ms at B=64 (1.00x) — XLA already
# fuses the two reductions into one stream pass, so the variant was
# reverted (models/fuser.py TorchBatchNorm keeps the plain form).


def measure_attn_fusion(B=8):
    """Fusion shape (S=256): does the attention kernel help or hurt the
    short-sequence train step? (decoder cross 8x256 + dropout kernel)."""
    import r3d_tpu.ops.attention as attn
    from tools.measure_r2 import make_fusion

    rng = jax.random.PRNGKey(0)
    orig_e, orig_de = attn.attention_kernel_eligible, attn.attention_dropout_kernel_eligible
    attn.attention_kernel_eligible = lambda *a: False
    attn.attention_dropout_kernel_eligible = lambda *a: False
    tr_a, st_a, b_a = make_fusion("float32", B, embed_dtype="bfloat16",
                                  feature_dtype="bfloat16")
    step_a = tr_a.make_train_step().lower(st_a, b_a, rng, 0).compile()
    attn.attention_kernel_eligible = orig_e
    attn.attention_dropout_kernel_eligible = orig_de
    tr_b, st_b, b_b = make_fusion("float32", B, embed_dtype="bfloat16",
                                  feature_dtype="bfloat16")
    step_b = tr_b.make_train_step().lower(st_b, b_b, rng, 0).compile()
    st_a, m = step_a(st_a, b_a, rng, 0); float(m["loss"])
    st_b, m = step_b(st_b, b_b, rng, 0); float(m["loss"])
    best_a = best_b = float("inf")
    for _ in range(4):
        s, st_a = _time_step(step_a, st_a, b_a, rng, reps=1)
        best_a = min(best_a, s)
        s, st_b = _time_step(step_b, st_b, b_b, rng, reps=1)
        best_b = min(best_b, s)
    print(f"fusion B={B} train step: composed-attn {best_a*1e3:.3f} ms  "
          f"attn-kernel {best_b*1e3:.3f} ms  ({best_a/best_b:.3f}x)")
    return best_a, best_b


def measure_attn_train():
    import r3d_tpu.ops.attention as attn
    from tools.measure_r2 import make_futr_50s

    rng = jax.random.PRNGKey(0)
    # arm A: composed attention (kernel paths patched ineligible at trace)
    orig_e, orig_de = attn.attention_kernel_eligible, attn.attention_dropout_kernel_eligible
    attn.attention_kernel_eligible = lambda *a: False
    attn.attention_dropout_kernel_eligible = lambda *a: False
    tr_a, st_a, b_a = make_futr_50s("bfloat16", batch_size=8)
    step_a = tr_a.make_train_step().lower(st_a, b_a, rng, 0).compile()
    attn.attention_kernel_eligible = orig_e
    attn.attention_dropout_kernel_eligible = orig_de
    # arm B: kernel train path (in-kernel dropout cross-attention)
    tr_b, st_b, b_b = make_futr_50s("bfloat16", batch_size=8)
    step_b = tr_b.make_train_step().lower(st_b, b_b, rng, 0).compile()

    st_a, m = step_a(st_a, b_a, rng, 0); float(m["loss"])
    st_b, m = step_b(st_b, b_b, rng, 0); float(m["loss"])
    best_a = best_b = float("inf")
    for _ in range(4):
        s, st_a = _time_step(step_a, st_a, b_a, rng, reps=1)
        best_a = min(best_a, s)
        s, st_b = _time_step(step_b, st_b, b_b, rng, reps=1)
        best_b = min(best_b, s)
    print(f"50salads train step: composed {best_a*1e3:.3f} ms  "
          f"attn-kernel {best_b*1e3:.3f} ms  ({best_a/best_b:.3f}x)")
    return best_a, best_b


def measure_attn_bwd(B=64):
    """VERDICT r2 #9. Finding at B=64/bf16/S=3100: the remat-composed
    backward CANNOT run — rematerializing the [S, S] scores in fp32 needs
    ~19.7 GB HBM (measured OOM: 18.95G of 15.75G) — so arms that OOM are
    reported as such and re-measured at B=8 for a rate comparison."""
    from r3d_tpu.ops.attention import (
        composed_attention, flash_attention, flash_attention_dropout,
    )

    H, S, D = 8, 3100, 64

    def arms_for(Bx):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(Bx, H, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(Bx, H, S, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(Bx, H, S, D), jnp.bfloat16)

        def make_grad(fn):
            return jax.jit(jax.grad(
                lambda a, b, c: jnp.sum(fn(a, b, c).astype(jnp.float32) ** 2),
                argnums=(0, 1, 2),
            ))

        return (q, k, v), {
            "remat-composed bwd": make_grad(
                lambda a, b, c: flash_attention(a, b, c, None, 0.125)),
            "pallas bwd": make_grad(
                lambda a, b, c: flash_attention_dropout(a, b, c, None, 3,
                                                        0.125, 0.0)),
            "composed fwd+bwd": make_grad(
                lambda a, b, c: composed_attention(a, b, c, None, 0.125)),
        }

    for Bx in (B, 8):
        (q, k, v), arms = arms_for(Bx)
        live = {}
        for name, g in arms.items():
            try:
                out = g(q, k, v)
                float(jnp.sum(out[0].astype(jnp.float32)))
                live[name] = g
            except Exception as e:
                print(f"B={Bx} attn grad {name}: OOM/err "
                      f"({str(e).splitlines()[0][:90]})")
        results = {}
        for _ in range(3):
            for name, g in live.items():
                t0 = time.time()
                for i in range(3):
                    out = g(q, k, v)
                float(jnp.sum(out[0].astype(jnp.float32)))
                dt = (time.time() - t0) / 3
                results[name] = min(results.get(name, float("inf")), dt)
        for name, dt in results.items():
            print(f"B={Bx} attn grad {name}: {dt*1e3:.2f} ms "
                  f"({Bx/dt:.1f} seq/s)")


def measure_cross_native(B=8):
    """Native-layout cross-attention kernel (ops/cross_attention.py) vs the
    previous routing (composed decoder cross at 20x3100 — the generic
    kernel measured 0.80x there and is ineligible) on the full 50salads
    train step."""
    import r3d_tpu.ops.cross_attention as xattn
    from tools.measure_r2 import make_futr_50s

    rng = jax.random.PRNGKey(0)
    # arm A: native cross kernel patched ineligible at trace time
    orig = xattn.cross_attention_native_eligible
    xattn.cross_attention_native_eligible = lambda *a: False
    tr_a, st_a, b_a = make_futr_50s("bfloat16", batch_size=B)
    step_a = tr_a.make_train_step().lower(st_a, b_a, rng, 0).compile()
    xattn.cross_attention_native_eligible = orig
    # arm B: default routing (native kernel takes the decoder cross)
    tr_b, st_b, b_b = make_futr_50s("bfloat16", batch_size=B)
    step_b = tr_b.make_train_step().lower(st_b, b_b, rng, 0).compile()

    st_a, m = step_a(st_a, b_a, rng, 0); float(m["loss"])
    st_b, m = step_b(st_b, b_b, rng, 0); float(m["loss"])
    best_a = best_b = float("inf")
    for _ in range(4):
        s, st_a = _time_step(step_a, st_a, b_a, rng, reps=1)
        best_a = min(best_a, s)
        s, st_b = _time_step(step_b, st_b, b_b, rng, reps=1)
        best_b = min(best_b, s)
    print(f"50salads B={B} train step: prev-routing {best_a*1e3:.3f} ms  "
          f"native-cross {best_b*1e3:.3f} ms  ({best_a/best_b:.3f}x)")
    return best_a, best_b


def measure_rng(B=8):
    """TrainConfig.rng_impl: threefry2x32 (JAX default, software
    counter-based bits) vs 'rbg' (TPU hardware RNG) on the dropout-heavy
    50salads train step. The key is a step argument, so one make_train_step
    lowers twice — once per key type — and the arms interleave."""
    from tools.measure_r2 import make_futr_50s

    tr, st, b = make_futr_50s("bfloat16", batch_size=B,
                              feature_dtype="bfloat16")
    step = tr.make_train_step()
    key_tf = jax.random.PRNGKey(0)
    key_rbg = jax.random.key(0, impl="rbg")
    st2 = jax.tree.map(jnp.array, st)
    step_tf = step.lower(st, b, key_tf, 0).compile()
    step_rbg = step.lower(st2, b, key_rbg, 0).compile()
    st, m = step_tf(st, b, key_tf, 0); float(m["loss"])
    st2, m = step_rbg(st2, b, key_rbg, 0); float(m["loss"])
    best_a = best_b = float("inf")
    for _ in range(4):
        s, st = _time_step(step_tf, st, b, key_tf, reps=1)
        best_a = min(best_a, s)
        s, st2 = _time_step(step_rbg, st2, b, key_rbg, reps=1)
        best_b = min(best_b, s)
    print(f"50salads B={B} train step: threefry {best_a*1e3:.3f} ms  "
          f"rbg {best_b*1e3:.3f} ms  ({best_a/best_b:.3f}x)")
    return best_a, best_b


def measure_mu_dtype(B=8):
    """AdamW first-moment storage dtype: fp32 (default) vs bf16
    (TrainConfig.opt_mu_dtype) on the 50salads step — the trace puts the
    AdamW update at ~0.65 ms/step, bandwidth-bound on 3 fp32 streams."""
    import dataclasses

    from tools.measure_r2 import make_futr_50s

    rng = jax.random.PRNGKey(0)
    tr_a, st_a, b_a = make_futr_50s("bfloat16", batch_size=B,
                                    feature_dtype="bfloat16")
    step_a = tr_a.make_train_step().lower(st_a, b_a, rng, 0).compile()
    tr_b, st_b, b_b = make_futr_50s("bfloat16", batch_size=B,
                                    feature_dtype="bfloat16")
    tr_b.config = dataclasses.replace(
        tr_b.config,
        train=dataclasses.replace(tr_b.config.train, opt_mu_dtype="bfloat16"))
    st_b = tr_b.init_state(jax.random.PRNGKey(0), b_b, steps_per_epoch=10)
    step_b = tr_b.make_train_step().lower(st_b, b_b, rng, 0).compile()
    st_a, m = step_a(st_a, b_a, rng, 0); float(m["loss"])
    st_b, m = step_b(st_b, b_b, rng, 0); float(m["loss"])
    best_a = best_b = float("inf")
    for _ in range(4):
        s, st_a = _time_step(step_a, st_a, b_a, rng, reps=1)
        best_a = min(best_a, s)
        s, st_b = _time_step(step_b, st_b, b_b, rng, reps=1)
        best_b = min(best_b, s)
    print(f"50salads B={B} train step: mu-fp32 {best_a*1e3:.3f} ms  "
          f"mu-bf16 {best_b*1e3:.3f} ms  ({best_a/best_b:.3f}x)")
    return best_a, best_b


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("fusion", "all"):
        measure_attn_fusion()
    if which in ("attn", "all"):
        measure_attn_train()
    if which in ("bwd", "all"):
        measure_attn_bwd()
    if which in ("cross", "all"):
        measure_cross_native()
    if which in ("rng", "all"):
        measure_rng()
    if which in ("mu", "all"):
        measure_mu_dtype()
