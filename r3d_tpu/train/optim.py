"""Optimizer: AdamW + epoch-stepped linear-warmup-cosine schedule.

The reference uses ``torch.optim.AdamW`` with pl_bolts'
``LinearWarmupCosineAnnealingLR`` stepped once per EPOCH
(main_utkinects.py:131-133, train loops call scheduler.step() per epoch).
The schedule below reproduces pl_bolts' closed form exactly — including the
quirk that epoch 0 trains at warmup_start_lr (0.0) — as a per-step function
of ``step // steps_per_epoch``.

torch AdamW decays EVERY parameter (biases and norms included); optax.adamw
with no mask matches that.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

from r3d_tpu.config import TrainConfig


def linear_warmup_cosine_schedule(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def schedule(step):
        epoch = step // steps_per_epoch
        warm = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / max(
            warmup_epochs - 1, 1
        )
        progress = (epoch - warmup_epochs) / max(max_epochs - warmup_epochs, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = linear_warmup_cosine_schedule(
        cfg.lr, cfg.warmup_epochs, cfg.epochs, steps_per_epoch
    )
    return optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=cfg.weight_decay,
        # None = fp32 (matches torch.optim.AdamW state). 'bfloat16' halves
        # the first-moment stream's HBM traffic + optimizer memory; the
        # update math is still fp32 (optax casts mu back per step).
        mu_dtype=cfg.opt_mu_dtype,
    )
