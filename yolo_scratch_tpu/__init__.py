"""yolo_scratch_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A ground-up re-design of the capabilities of the reference repo
``Pratye/yolo-scratch`` (a from-scratch PyTorch YOLO11 trainer for lunar-crater
detection) as an idiomatic JAX framework:

* NHWC tensors everywhere (TPU-preferred layout); the reference is NCHW.
* All compute-path code (model, loss, assignment, decode, NMS) is pure,
  shape-static and jit-compiled; no host loops in the hot path.
* Multi-chip scaling via ``jax.sharding.Mesh`` + jit shardings (data-parallel
  gradient allreduce rides ICI); testable on a virtual CPU mesh.
* BatchNorm statistics, checkpointing (orbax), EMA and the trainer loop are
  functional-state pytrees.

Layer map (bottom-up):
  ``nn/``       module zoo (ConvBNAct, C3k2, SPPF, C2PSA, Detect, ...)
  ``ops/``      box math, anchors, decode, NMS, Pallas kernels
  ``models/``   YAML graph builder (same dialect as the reference configs)
  ``losses/``   TAL assigner + v8 detection loss, SimOTA, crater aux losses
  ``data/``     host decode + device-side preprocessing (letterbox/mosaic/HSV)
  ``parallel/`` mesh setup and sharded train/eval steps
  ``train/``    Trainer, optimizer, schedules, checkpoints, CLI
  ``utils/``    metrics (mAP, CDA scorer), logging, profiling
  ``val.py`` / ``infer.py`` / ``export.py``  eval CLI, streaming deploy
                CLI, and AOT StableHLO serving-artifact export
"""

__version__ = "0.1.0"

from yolo_scratch_tpu.models.builder import build_yolo11, YOLOModel  # noqa: F401
