"""AOT export of the deploy graph — serialized StableHLO serving artifacts.

``export_predictor`` traces the Predictor's jitted u8→detections program
(bf16 model with folded BN → fused select-then-decode → NMS) with the
weights embedded as constants and returns a ``jax.export.Exported``;
``save_artifact``/``load_artifact`` round-trip it through jax.export's
versioned serialization. A serving process needs only jax and the
artifact bytes — none of this framework's model/builder/checkpoint code
— and gets exactly the graph the benchmarks measure.

The torch reference has no ahead-of-time deployment story (serving means
importing the training stack, ``train_yolo11_cuda.py:265-399``); this
subsystem is the TPU-native equivalent of its CUDA-runtime deploy path,
done the XLA way: one hermetic compiled program per (batch, image-size)
shape, static everything.

Backend notes:
- Artifacts are single-platform (recorded at export). A TPU export embeds
  the Pallas NMS as a ``tpu_custom_call`` (jax.export's stability check
  for it is disabled deliberately — the artifact is rebuilt alongside the
  framework, not archived across jax versions); pass
  ``nms_impl="xla"`` for a pure stable-HLO artifact instead.
- Fixed batch: callers pad the tail batch (Predictor.predict_paths
  already does) — symbolic batch dims would force XLA to re-tile the
  whole program per shape anyway.

CLI: ``python -m yolo_scratch_tpu.export --ckpt <dir> --out model.jaxexp``
then smoke-check with ``--check`` (deserializes and runs zeros through
the artifact).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jexport

from yolo_scratch_tpu.infer import (
    Predictor,
    PredictorConfig,
    load_deploy_model,
    pack_detections,
)

ARTIFACT_SUFFIX = ".jaxexp"


def export_predictor(predictor: Predictor, batch_size: Optional[int] = None):
    """Export a Predictor's device program as a ``jax.export.Exported``.

    The returned artifact is a function of ONE argument — the image batch
    ``(B, S, S, ch)`` uint8 (or f32 if the predictor was built with
    ``u8_transfer=False``) — with the (BN-folded, bf16) weights baked in
    as constants. Output pytree: ``(boxes, scores, labels, valid)`` with
    shapes ``(B, max_det, 4) f32, (B, max_det) f32, (B, max_det) i32,
    (B, max_det) bool`` — boxes normalized to [0, 1] model space
    (host-side unmapping to original pixels stays host-side, it depends
    on per-image letterbox metadata).
    """
    cfg = predictor.cfg
    B = batch_size or cfg.batch_size
    ch = predictor.in_ch  # family-agnostic (YOLOX models carry no in_ch attr)
    dtype = jnp.uint8 if cfg.u8_transfer else jnp.float32
    spec = jax.ShapeDtypeStruct((B, cfg.img_size, cfg.img_size, ch), dtype)

    variables = predictor.variables

    @jax.jit
    def serve(x):
        return predictor._infer(variables, x)

    # the Pallas NMS lowers to tpu_custom_call on TPU; jax.export refuses
    # custom calls not on its stability allowlist unless told otherwise
    disabled = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")]
    return jexport.export(serve, disabled_checks=disabled)(spec)


def _sidecar_path(path: str) -> str:
    return path + ".meta.json"


def save_artifact(exported, path: str, host_prep: Optional[dict] = None) -> int:
    """Serialize an Exported to ``path``; returns the byte count.

    ``host_prep``: host-side preprocessing semantics the compiled program
    was built against (letterbox vs stretch, fast_jpeg) — written as a
    ``<path>.meta.json`` sidecar so a serving process that has only the
    artifact (``yst-serve --artifact``) reproduces the SAME prep instead
    of silently assuming defaults. The weights/thresholds inside the
    artifact were calibrated against this prep; mismatching it degrades
    detections with no error.
    """
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    if host_prep is not None:
        import json

        with open(_sidecar_path(path), "w") as f:
            json.dump(host_prep, f, indent=2)
    return len(blob)


def load_artifact(path: str):
    """Deserialize a serving artifact; ``.call`` (jit-able) runs it."""
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def load_host_prep(path: str) -> Optional[dict]:
    """Read the host-prep sidecar next to an artifact (see save_artifact).

    Returns None for artifacts exported before the sidecar existed —
    callers should then assume the PredictorConfig defaults and say so.
    """
    import json
    import os

    p = _sidecar_path(path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


class ArtifactPredictor:
    """The Predictor host surface over a deserialized serving artifact.

    Duck-types exactly the slice of ``Predictor`` that the streaming path
    (``predict_paths``) and the serving daemon's ``BatchingServer`` use —
    ``cfg``, ``in_ch``, ``variables``, ``_prepare``, ``_unmap_boxes``,
    ``_infer``, ``_infer_packed`` — so a saved ``.jaxexp`` can be served
    with NO model/builder/checkpoint code in the process: host decode +
    letterbox feed the artifact's compiled program directly.

    Geometry (batch, image size, channels, input dtype, max_det) is read
    off the artifact's input/output specs and overrides whatever the
    passed config says; compute-side knobs (conf/iou thresholds, NMS
    impl, bf16) were baked in at export time and are inert here. The
    optional ``config`` carries only host-side behavior (letterbox
    semantics, fast_jpeg, host_threads, pipeline depth).
    """

    _prepare = Predictor._prepare
    _unmap_boxes = Predictor._unmap_boxes
    predict_paths = Predictor.predict_paths

    def __init__(self, exported, config: Optional[PredictorConfig] = None,
                 host_prep: Optional[dict] = None):
        from dataclasses import replace

        (aval,) = exported.in_avals
        B, S, S2, ch = aval.shape
        if S != S2:
            raise ValueError(f"non-square artifact input: {aval.shape}")
        base = config or PredictorConfig()
        if host_prep:
            # the sidecar written at export time wins over defaults: the
            # program's weights/thresholds were calibrated against THAT prep
            base = replace(base, **{k: host_prep[k]
                                    for k in ("letterbox", "fast_jpeg")
                                    if k in host_prep})
        self.cfg = replace(
            base,
            img_size=int(S), batch_size=int(B),
            u8_transfer=bool(aval.dtype == jnp.uint8),
            max_det=int(exported.out_avals[0].shape[1]),
        )
        self.in_ch = int(ch)
        self.variables = None  # weights are constants inside the artifact
        call = exported.call

        def _infer(v, x):
            del v  # Predictor API shape; the artifact owns its weights
            return call(x)

        def _infer_packed(v, x):
            return pack_detections(*_infer(v, x))

        self._infer = jax.jit(_infer)
        self._infer_packed = jax.jit(_infer_packed)


def main(argv=None):
    import argparse
    from pathlib import Path

    p = argparse.ArgumentParser(description="Export the deploy graph to a StableHLO artifact")
    p.add_argument("--cfg", type=str,
                   default=str(Path(__file__).parent / "configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--ckpt", type=str, default=None, help="checkpoint dir (orbax 'last'/'best')")
    p.add_argument("--torch-ckpt", type=str, default=None, help="reference .pt checkpoint")
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--topk", type=int, default=PredictorConfig.pre_nms_topk,
                   help="fixed-shape prefilter cap (pre_nms_topk), baked "
                        "into the artifact; raise toward 2048 for dense "
                        "scenes (docs/PERF.md 'prefilter cap')")
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--ch", type=int, default=None)
    p.add_argument("--class-aware", action="store_true")
    p.add_argument("--stretch", action="store_true",
                   help="export for stretch-resize host prep instead of "
                        "letterbox (must match how the weights were "
                        "trained/evaluated; recorded in the artifact's "
                        ".meta.json sidecar and honored by yst-serve)")
    p.add_argument("--nms-impl", type=str, default="pallas", choices=["pallas", "xla"],
                   help="'xla' emits a pure stable-HLO artifact (no TPU custom calls)")
    p.add_argument("--out", type=str, required=True, help=f"artifact path ({ARTIFACT_SUFFIX})")
    p.add_argument("--check", action="store_true",
                   help="deserialize the written artifact and run a zeros batch through it")
    p.add_argument("--int8-calib-dir", type=str, default=None, metavar="DIR",
                   help="export the int8 deploy graph (nn/quant.py): "
                        "calibrate activation scales on the images under DIR")
    args = p.parse_args(argv)

    model, variables = load_deploy_model(
        args.cfg, scale=args.scale, imgsz=args.imgsz, ckpt=args.ckpt,
        torch_ckpt=args.torch_ckpt, which=args.which, ch=args.ch, nc=args.nc,
    )
    cfg = PredictorConfig(
        img_size=args.imgsz, batch_size=args.batch, conf_threshold=args.conf,
        iou_threshold=args.iou, max_det=args.max_det,
        class_aware_nms=args.class_aware, nms_impl=args.nms_impl,
        pre_nms_topk=args.topk,
        letterbox=not args.stretch,
    )
    if args.int8_calib_dir:
        from pathlib import Path as _P

        from yolo_scratch_tpu.nn.quant import (
            count_quantized,
            prepare_calib_batches,
            quantize_for_deploy,
        )

        exts = {".png", ".jpg", ".jpeg", ".bmp"}
        paths = sorted(str(q) for q in _P(args.int8_calib_dir).rglob("*")
                       if q.suffix.lower() in exts)
        if not paths:
            raise SystemExit(f"--int8-calib-dir: no images under {args.int8_calib_dir}")
        prep = Predictor(model, variables, cfg)  # host _prepare only
        batches = prepare_calib_batches(
            prep, paths, max_batches=-(-len(paths) // args.batch))
        variables = quantize_for_deploy(model, variables, batches)
        print(f"int8: quantized {count_quantized(variables['quant'])} conv blocks "
              f"(calibrated on {len(paths)} images)")
    predictor = Predictor(model, variables, cfg)
    exported = export_predictor(predictor)
    # record host-prep semantics (+ the baked compute knobs, informational)
    # so a pure-artifact server reproduces the same preprocessing
    host_prep = {
        "letterbox": cfg.letterbox,
        "fast_jpeg": cfg.fast_jpeg,
        "baked": {"conf_threshold": cfg.conf_threshold,
                  "iou_threshold": cfg.iou_threshold,
                  "class_aware_nms": cfg.class_aware_nms,
                  "pre_nms_topk": cfg.pre_nms_topk,
                  "nms_impl": cfg.nms_impl},
    }
    nbytes = save_artifact(exported, args.out, host_prep=host_prep)
    print(f"wrote {args.out}: {nbytes / 1e6:.2f} MB, platforms={exported.platforms}, "
          f"in={exported.in_avals}, out={len(exported.out_avals)} arrays")

    if args.check:
        art = load_artifact(args.out)
        x = np.zeros(art.in_avals[0].shape, art.in_avals[0].dtype)
        boxes, scores, labels, valid = jax.jit(art.call)(x)
        np.asarray(boxes)  # sync (tunnel-safe)
        print(f"check ok: boxes {boxes.shape} {boxes.dtype}, "
              f"valid {int(np.asarray(valid).sum())} detections on zeros")
    return exported


def cli(argv=None):
    """Console-script entry: run main() and discard its return value.

    setuptools entry points pass main()'s return to sys.exit(); main()
    returns a result object for programmatic use, which would make every
    successful run exit with status 1. This wrapper keeps exit status 0.
    """
    main(argv)


if __name__ == "__main__":
    cli()
