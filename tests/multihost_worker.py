"""Worker process for the 2-process multi-host integration test.

Usage: python tests/multihost_worker.py <port> <process_id> <num_processes>
           [epochs] [save_dir]

Each process gets 4 virtual CPU devices; together they form an 8-device
global dp mesh. Drives the FULL Trainer (fit: sharded train steps with the
gradient psum crossing the process boundary — gloo standing in for DCN —
plus validate: device TP-marking with cross-process allgather) on
per-process slices of a synthetic dataset, then prints the replicated loss
and mAP. The parent asserts both processes printed identical values.

With ``save_dir`` set, checkpoints are written (process 0 only — the
state is replicated) and ``fit(resume=True)`` restores them, so the
parent can kill + relaunch both processes and assert the run continues
from the saved epoch (the reference's recovery semantics,
``train_yolo11_cuda.py:576-587``, under ``jax.distributed``).
"""

import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 1
save_dir = sys.argv[5] if len(sys.argv) > 5 else None
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache (CPU backend hits across processes) — phase-2
# relaunches in the resume test would otherwise recompile everything
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from yolo_scratch_tpu.parallel import distributed as D

D.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc, jax.devices()
D.barrier()  # create the gloo communicator while processes are in lockstep

from yolo_scratch_tpu.data.loader import Loader
from yolo_scratch_tpu.data.synthetic import SyntheticDataset
from yolo_scratch_tpu.models.builder import build_yolo11
from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

ds = SyntheticDataset(n=24, img_size=32, channels=1, num_classes=5, seed=3)

# per-process data sharding: disjoint slices, same step count everywhere
train_sl = D.process_slice(16, pid, nproc)
val_sl = D.process_slice(8, pid, nproc) + 16
train_loader = Loader(ds, batch_size=4, max_gt=8, shuffle=True, seed=0,
                      indices=train_sl, prefetch=0)
val_loader = Loader(ds, batch_size=4, max_gt=8, indices=val_sl, prefetch=0)

model = build_yolo11(
    str(REPO / "yolo_scratch_tpu/configs/yolo11_crater.yaml"), ch=1, nc=5, scale="n"
)
mesh = D.make_global_mesh()
cfg = TrainerConfig(epochs=epochs, lr=1e-3, val_conf=0.01, pre_nms_topk=64, max_det=20,
                    save_dir=save_dir)
trainer = Trainer(model, train_loader, val_loader, cfg, mesh=mesh)
assert trainer._multiprocess

result = trainer.fit(resume=save_dir is not None)
h = result["history"][-1]
loss = h["train"]["loss"]
map50 = h["val"]["mAP50"]
assert np.isfinite(loss)
print(f"MHLOSS {pid} {loss:.10f} {map50:.10f} "
      f"start={trainer.start_epoch} ran={len(result['history'])}", flush=True)
