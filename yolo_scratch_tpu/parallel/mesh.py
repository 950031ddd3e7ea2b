"""Device-mesh data parallelism.

The reference is strictly single-device (SURVEY.md §2.3: no DDP/NCCL
anywhere); scaling is a new, TPU-first capability: a 1-D ``dp`` mesh over
all local chips (or a pod slice), the global batch sharded over ``dp``,
state replicated. Under ``jax.jit`` this is ONE logical computation — XLA
inserts the gradient allreduce (psum over ICI) and computes BatchNorm batch
statistics over the *global* batch (sync-BN; at equal global batch this is
exactly the reference's single-device BN semantics).

The same code runs on a virtual CPU mesh
(``--xla_force_host_platform_device_count=N``) for tests and the driver's
multi-chip dry-run; on real hardware the axis spans a v5e/v6e slice. The
mesh API keeps extra axes (tp/pp) expressible — out of scope for these
model sizes (SURVEY.md §2.3) but the entry points accept any 1-D+ mesh and
shard only on ``dp``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    backend: Optional[str] = None,
) -> Mesh:
    """Build a 1-D dp mesh. If the default platform has too few devices and
    no explicit backend was requested, fall back to the virtual CPU devices
    (available when XLA_FLAGS=--xla_force_host_platform_device_count=N is
    set, even when the default platform is a single TPU)."""
    devs = jax.devices(backend) if backend else jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n and backend is None:
        try:
            cpu = jax.devices("cpu")
        except RuntimeError:
            cpu = []
        if len(cpu) >= n:
            devs = cpu
    if len(devs) < n:
        raise ValueError(
            f"mesh needs {n} devices but only {len(devs)} visible "
            f"({jax.default_backend()}); for a virtual CPU mesh set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    if len(axis_names) != 1:
        raise ValueError("only 1-D (dp) meshes are built today; tp/pp axes reserved")
    return Mesh(np.array(devs[:n]), axis_names=axis_names)


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "dp") -> Dict[str, Any]:
    """Place a host batch with its leading dim sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_sharded_train_step(model, loss_cfg, mesh: Mesh, donate: bool = True, axis: str = "dp",
                            loss_fn=None):
    """jit the train step with explicit input/output shardings over ``mesh``.

    state: replicated; batch: sharded on the leading dim; outputs replicated.
    ``loss_fn`` overrides the default v8 loss (e.g. YOLOX/SimOTA adapter).
    """
    from yolo_scratch_tpu.train.steps import build_train_step, build_train_step_custom

    if loss_fn is not None:
        inner = build_train_step_custom(model, loss_fn)
    else:
        inner = build_train_step(model, loss_cfg)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    return jax.jit(
        inner,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
