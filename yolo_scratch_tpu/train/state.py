"""Functional train state: params + BN stats + optimizer state + EMA.

The reference keeps this implicitly in mutable nn.Module/optimizer objects;
here it is one pytree, which is what gets sharded, checkpointed (orbax) and
donated through the jitted step.

``flat_opt=True`` runs the whole update (clip + AdamW + EMA) on ONE
raveled (N,) master vector instead of ~300 parameter leaves. Measured
head-to-head inside the full jitted YOLO11n B=64 @640 bf16 train step
(``scripts/probe_opt_flat.py``, in-jit ``lax.scan`` repeats, one
process): grads-only floor 86.8 ms, per-leaf update +5.5 ms, flat update
+6.2 ms — the flat form is marginally SLOWER (its ravel/unravel copies
cost more than the ~300 small fused kernels it removes), so per-leaf
stays the default. The round-2 trace bucket that motivated flattening
("45% param-shaped ops") turned out to be backward weight-gradient
reductions — param-shaped *outputs* over activation-sized *inputs* —
not optimizer overhead (docs/PERF.md round-3 train section). The flat
path is kept, tested, and checkpoint-compatible (the optax chain state
is the same pytree either way) for configurations with much higher
leaf counts, where the tradeoff can flip.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.flatten_util import ravel_pytree


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None  # FLAT (N,) when flat_opt, else a tree
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    ema_tau: float = struct.field(pytree_node=False, default=2000.0)
    flat_opt: bool = struct.field(pytree_node=False, default=False)

    def apply_gradients(self, grads):
        if self.flat_opt:
            flat_g, unravel = ravel_pytree(grads)
            flat_p, _ = ravel_pytree(self.params)
            updates, new_opt_state = self.tx.update(flat_g, self.opt_state, flat_p)
            new_flat_p = optax.apply_updates(flat_p, updates)
            new_params = unravel(new_flat_p)
            new_ema = self.ema_params
            if new_ema is not None:
                # Ultralytics-style ramped decay: d = decay*(1 - exp(-t/tau))
                d = self.ema_decay * (1.0 - jnp.exp(-(self.step + 1) / self.ema_tau))
                new_ema = new_ema * d + new_flat_p * (1.0 - d)
        else:
            updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
            new_params = optax.apply_updates(self.params, updates)
            new_ema = self.ema_params
            if new_ema is not None:
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


def ema_as_tree(ema_params: Any, params_template: Any) -> Any:
    """Flat-or-tree EMA -> parameter tree (for eval / export)."""
    if ema_params is None:
        return None
    if isinstance(ema_params, dict):  # legacy per-leaf storage
        return ema_params
    _, unravel = ravel_pytree(params_template)
    return unravel(ema_params)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
    ema_decay: float = 0.9999,
    ema_tau: float = 2000.0,
    flat_opt: bool = False,
) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # Only flat_opt consumes the flattened copy; skip the full-model-size
    # concatenation for the default per-leaf configuration.
    flat_p = ravel_pytree(params)[0] if flat_opt else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(flat_p if flat_opt else params),
        ema_params=(
            (jnp.copy(flat_p) if flat_opt else jax.tree_util.tree_map(jnp.copy, params))
            if use_ema
            else None
        ),
        tx=tx,
        ema_decay=ema_decay,
        ema_tau=ema_tau,
        flat_opt=flat_opt,
    )
