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

from functools import partial
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


def _spans_processes(mesh: Mesh) -> bool:
    return len({d.process_index for d in mesh.devices.flat}) > 1


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "dp") -> Dict[str, Any]:
    """Place a host batch with its leading dim sharded over the mesh.

    On a multi-process mesh, ``batch`` is this process's LOCAL shard: the
    global array is assembled from per-process data
    (``jax.make_array_from_process_local_data`` — per-host input sharding,
    SURVEY §5.8); the global batch dim is local_B x process_count.
    """
    sharding = NamedSharding(mesh, P(axis))
    if _spans_processes(mesh):
        return {
            k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/state) over the mesh.

    On a multi-process mesh each process must hold the same host values
    (e.g. same-seed init); the global replicated arrays are assembled via
    ``make_array_from_process_local_data`` with a replicated spec.
    """
    sharding = NamedSharding(mesh, P())
    if _spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            tree,
        )
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


def make_ddp_train_step(model, loss_fn, mesh: Mesh, axis: str = "dp",
                        sync_bn_stats: bool = True, compute_dtype=None,
                        donate: bool = True, remat: bool = False):
    """DDP-semantics train step via ``shard_map``: each replica computes the
    loss/gradients on its LOCAL shard (BatchNorm normalizes over the local
    batch — the reference's per-replica BN semantics, SURVEY §5.8), then
    gradients are pmean'd over ICI. ``sync_bn_stats`` pmeans the *running*
    statistics so the replicated state stays identical across replicas
    (torch-DDP buffer-broadcast equivalence); with False, stats come from
    replica 0 (psum of a masked contribution).

    Contrast: the jit-sharding path (``make_sharded_train_step``) computes
    BN over the GLOBAL batch (sync-BN), which equals single-device training
    at the same global batch. Both are valid; this one matches multi-GPU
    DDP numerics.
    """
    import jax.numpy as jnp
    import optax

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def forward(p, bs, img):
        return model.apply(
            {"params": p, "batch_stats": bs}, img, train=True, mutable=["batch_stats"]
        )

    # activation recompute in the backward pass (same as steps.py's remat)
    fwd = jax.checkpoint(forward) if remat else forward

    def local_step(state, batch):
        def wrapped(params):
            p = params
            if compute_dtype is not None:
                p = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), params)
            img = batch["img"].astype(compute_dtype) if compute_dtype is not None else batch["img"]
            feats, mutated = fwd(p, state.batch_stats, img)
            if compute_dtype is not None:
                feats = jax.tree_util.tree_map(lambda f: f.astype(jnp.float32), feats)
            total, metrics = loss_fn(feats, batch)
            return total, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(wrapped, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        metrics = jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, axis), metrics)
        if sync_bn_stats:
            new_bs = jax.tree_util.tree_map(lambda s: jax.lax.pmean(s, axis), new_bs)
        else:
            # replicate rank-0's stats (DDP buffer broadcast)
            rank = jax.lax.axis_index(axis)
            new_bs = jax.tree_util.tree_map(
                lambda s: jax.lax.psum(jnp.where(rank == 0, s, jnp.zeros_like(s)), axis),
                new_bs,
            )
        if compute_dtype is not None:
            new_bs = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), new_bs)
        state = state.replace(batch_stats=new_bs).apply_gradients(grads)
        return state, {"loss": loss, **metrics}

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
