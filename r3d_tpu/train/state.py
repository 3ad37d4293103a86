"""Train state: params + BN batch stats + optimizer state, one pytree."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any          # {} for models without BN
    opt_state: Any

    def apply_gradients(self, grads, tx: optax.GradientTransformation,
                        new_batch_stats: Optional[Any] = None) -> "TrainState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=(
                self.batch_stats if new_batch_stats is None else new_batch_stats
            ),
        )


def create_train_state(
    rng: jax.Array,
    model,
    tx: optax.GradientTransformation,
    example_inputs: tuple,
) -> TrainState:
    """Initialize params (+batch_stats) from example inputs."""
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        *example_inputs,
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
