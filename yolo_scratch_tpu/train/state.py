"""Functional train state: params + BN stats + optimizer state + EMA.

The reference keeps this implicitly in mutable nn.Module/optimizer objects;
here it is one pytree, which is what gets sharded, checkpointed (orbax) and
donated through the jitted step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    ema_tau: float = struct.field(pytree_node=False, default=2000.0)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            # Ultralytics-style ramped decay: d = decay * (1 - exp(-step/tau))
            d = self.ema_decay * (1.0 - jnp.exp(-(self.step + 1) / self.ema_tau))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), new_ema, new_params
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
    ema_decay: float = 0.9999,
    ema_tau: float = 2000.0,
) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
        tx=tx,
        ema_decay=ema_decay,
        ema_tau=ema_tau,
    )
