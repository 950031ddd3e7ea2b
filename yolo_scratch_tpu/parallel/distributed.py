"""Multi-host (pod / pod-slice) distribution.

The reference is strictly single-process (SURVEY §2.3: no torch.distributed
anywhere); this is the TPU-native scaling tier above ``parallel.mesh``:

* ``initialize()`` — one call per process, wrapping
  ``jax.distributed.initialize``. On Cloud TPU pods the coordinator/process
  topology is auto-detected from the TPU environment; elsewhere (tests,
  CPU fleets) pass coordinator/num_processes/process_id explicitly.
* ``make_global_mesh()`` — a 1-D dp mesh over ALL processes' devices.
  Within a host/slice the dp axis rides ICI; across hosts XLA routes the
  gradient psum over DCN automatically.
* per-process data sharding lives in ``mesh.shard_batch`` /
  ``mesh.replicate``: both detect multi-process meshes and build global
  arrays from process-local shards (``jax.make_array_from_process_local_data``).

Each process feeds its own slice of the dataset: ``process_slice(n)``
returns this process's sample indices (round-robin, the per-host input
sharding named in SURVEY §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Start the JAX distributed runtime for this process.

    With no args on a Cloud TPU pod, topology is auto-detected. Explicit
    args support CPU/GPU fleets and the 2-process CPU integration test.
    Safe to call once per process, before heavy backend use.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        if local_device_ids is not None:
            kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_slice(n: int, process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> np.ndarray:
    """This process's sample indices: round-robin over the dataset.

    Every process must iterate the SAME number of batches per epoch (the
    jitted step is a collective); round-robin keeps per-process counts
    within 1 — combine with the loader's wrap-padding for exact alignment.
    """
    pid = jax.process_index() if process_id is None else process_id
    np_ = jax.process_count() if num_processes is None else num_processes
    return np.arange(pid, n, np_)


def make_global_mesh(axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """1-D dp mesh over every device of every process."""
    if len(axis_names) != 1:
        raise ValueError("only 1-D (dp) global meshes are built today")
    return Mesh(np.array(jax.devices()), axis_names=tuple(axis_names))


def barrier(mesh: Optional[Mesh] = None) -> None:
    """Establish the cross-process collective context with a trivial psum.

    Gloo (the CPU/DCN transport standing in for a real pod's fabric in
    tests) gives peers ~30 s to join a communicator the first time a
    collective RUNS. The first real collective is normally the first
    train step — reached minutes apart when processes compile big
    programs under host contention, which kills the job with
    "Gloo context initialization failed: Connect timeout". Running one
    tiny all-reduce right after ``initialize()`` creates the communicator
    while all processes are still in lockstep (compile cost: seconds),
    and later heavy collectives reuse it. Also serves as a fail-fast
    connectivity check on real pods.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not is_multiprocess():
        return
    if mesh is None:
        mesh = make_global_mesh()
    sh = NamedSharding(mesh, P("dp"))
    local = np.ones((len(mesh.local_devices),), np.float32)
    x = jax.make_array_from_process_local_data(sh, local)
    out = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(x)
    n = float(np.asarray(out))
    expected = float(len(list(mesh.devices.flat)))
    if n != expected:  # not an assert: must fire under python -O too
        raise RuntimeError(
            f"barrier: allreduce over the global mesh saw {n:.0f} of "
            f"{expected:.0f} devices — some processes are missing or the "
            "mesh is partially connected"
        )
