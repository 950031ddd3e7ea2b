"""Streaming batched inference — the deploy path (BASELINE.json config 5).

Pipeline: native C++ host decode+letterbox (thread pool, csrc/yst_host.cpp)
-> double-buffered device feed -> one jit program (bf16 model with folded
BN -> DFL decode -> confidence filter -> NMS) -> detections mapped back to
original-image coordinates. Host prep of batch N+1 overlaps device compute
of batch N (the async dispatch queue provides the overlap).

CLI: ``python -m yolo_scratch_tpu.infer --images <dir> --ckpt <dir> --out
preds.json``.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class PredictorConfig:
    img_size: int = 640
    batch_size: int = 32
    conf_threshold: float = 0.25
    iou_threshold: float = 0.45
    max_det: int = 300
    # Fixed-shape prefilter cap: the NMS sweep's length (and its latency)
    # is this K. 512 is the measured throughput point for the headline
    # bench — but it is a RECALL trade on dense scenes: trained weights
    # @640 reach ~1.5k above-conf candidates on crowded val images, and a
    # binding cap silently drops the lowest-scoring real detections
    # (docs/H2H.md "the prefilter cap" — it cost 13/218 detections at
    # K=1000). Raise toward 2048 (CLI: --topk) when detections-per-image
    # matters more than per-batch latency; the val path (TrainerConfig)
    # defaults to 2048 for exactly this reason. Measured price at the
    # headline point (docs/PERF.md): 1024 is −10.6% img/s, 2048 −32.6%
    # (the NMS sweep is O(K²)).
    pre_nms_topk: int = 512
    letterbox: bool = True
    bf16: bool = True
    fuse_bn: bool = True
    class_aware_nms: bool = False
    host_threads: int = 4
    u8_transfer: bool = True  # ship uint8 to the device; /255 runs in-jit
    # JPEG decode-time downscale (libjpeg M/8 IDCT scaling) in the native
    # ingest tier — ~2x faster JPEG ingest on downscale-heavy streams.
    # Pixels differ slightly from full-decode+bilinear (DCT-domain
    # downsample); set False for exact cv2-parity semantics. PNG unaffected.
    fast_jpeg: bool = True
    # Two-stage blocked candidate selection (ops/decode.py::topk_scores).
    # 0 (exact top_k) is the default: validation on trained-model score
    # distributions (scripts/validate_blocked_topk.py) measured up to 68
    # of the global top-512 in a single 128-anchor block on dense scenes,
    # so a 32-cutoff blocked pass visibly changes detections. Opt in
    # (e.g. 32, ~0.76 ms faster at B=128) only after validating your own
    # workload's block occupancy with that script.
    blocked_topk: int = 0
    # Streaming pipeline depth: how many batches predict_paths keeps in
    # flight before blocking on the oldest result. 1 = fully synchronous
    # (each batch is fetched right after its own dispatch — no overlap);
    # 2 = overlap host prep of batch i+1 with device compute of batch i
    # (the round-2 behavior). Deeper helps when the host<->device
    # transport has high latency (the axon tunnel's ~0.5 s round trip at
    # B=32 — see docs/PERF.md "disk -> detections"): with k batches in
    # flight the per-batch round trip is paid once per k prepares instead
    # of serializing with every one.
    inflight: int = 3
    # NMS backend: "pallas" (the batched kernel, class-aware since
    # b3a219e; interpret mode on CPU) or "xla" (pure stable-HLO sweep —
    # required for cross-platform jax.export artifacts, see export.py).
    nms_impl: str = "pallas"


def pack_detections(boxes, scores, labels, valid):
    """(B, max_det, 7) f32 rows [x1 y1 x2 y2 score label valid] — THE
    single-fetch packed layout. Every producer (Predictor._infer_packed,
    export.ArtifactPredictor) and consumer (predict_paths drain,
    BatchingServer._run) goes through this one definition so a layout
    change can't desynchronize them. Label indices are exact in f32
    (< 2^24); scores upcast losslessly."""
    return jnp.concatenate(
        [
            boxes.astype(jnp.float32),
            scores.astype(jnp.float32)[..., None],
            labels.astype(jnp.float32)[..., None],
            valid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )


class Predictor:
    """Batched streaming predictor over a YOLO11 (builder) model."""

    def __init__(self, model, variables, config: PredictorConfig = PredictorConfig()):
        from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
        from yolo_scratch_tpu.ops.decode import postprocess, postprocess_from_feats

        self.model = model
        self.cfg = config
        if config.fuse_bn:
            variables = fuse_conv_bn(variables)
        if config.bf16:
            # cast params only; keep every other collection (batch_stats,
            # the int8 "quant" tree from nn/quant.py, ...) as-is
            variables = {
                **variables,
                "params": jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), variables["params"]
                ),
            }
        self.variables = variables

        cfg = config
        # Family dispatch: the YOLO11 builder family exposes reg_max (DFL
        # head -> fused select-then-decode); YOLOX-family models decode to
        # the common (B, A, 4+nc) format and share the generic postprocess.
        is_dfl = hasattr(model, "reg_max")
        if not is_dfl:
            from yolo_scratch_tpu.models.yolox import yolox_arch_from_params, yolox_eval_decode
        # input channels: builder models carry in_ch; YOLOX reads it off
        # the stem kernel (host prep needs it to decode gray vs RGB)
        self.in_ch = getattr(model, "in_ch", None) or (
            yolox_arch_from_params(variables["params"])[0] if not is_dfl else 1
        )

        def _infer(v, x):
            xx = x.astype(jnp.bfloat16) if cfg.bf16 else x.astype(jnp.float32)
            if x.dtype == jnp.uint8:
                xx = xx / 255.0
            feats = model.apply(v, xx, train=False)
            if is_dfl:
                # fused select-then-decode (exact; see ops/decode.py) — the
                # DFL integral runs on pre_nms_topk candidates, not all
                # anchors
                return postprocess_from_feats(
                    feats,  # native dtype — row selection is dtype-exact
                    nc=model.nc,
                    strides=tuple(float(s) for s in model.strides),
                    reg_max=model.reg_max,
                    img_size=cfg.img_size,
                    conf_threshold=cfg.conf_threshold,
                    iou_threshold=cfg.iou_threshold,
                    max_det=cfg.max_det,
                    pre_nms_topk=cfg.pre_nms_topk,
                    class_aware=cfg.class_aware_nms,
                    nms_impl=cfg.nms_impl,
                    blocked_topk=cfg.blocked_topk,
                )
            # YOLOX: decode in f32 (bf16 box coords would quantize to
            # ~2.5 px at 640 — the exp(wh)*stride math is the sensitive
            # part; the DFL family avoids this by decoding after selection)
            decoded = yolox_eval_decode(
                [f.astype(jnp.float32) for f in feats],
                model.nc, tuple(float(s) for s in model.strides),
            )
            return postprocess(
                decoded,
                img_size=cfg.img_size,
                conf_threshold=cfg.conf_threshold,
                iou_threshold=cfg.iou_threshold,
                max_det=cfg.max_det,
                pre_nms_topk=cfg.pre_nms_topk,
                class_aware=cfg.class_aware_nms,
                nms_impl=cfg.nms_impl,
            )

        self._infer = jax.jit(_infer)

        # Packed variant for the streaming/serving paths: one (B, max_det,
        # 7) f32 array [x1 y1 x2 y2 score label valid] instead of four
        # separate outputs. Fetching a device array over the axon tunnel
        # pays a full WAN round trip PER ARRAY — four blocking
        # np.asarray() calls were ~4 RTTs per batch (docs/PERF.md); one
        # packed fetch is one. Layout lives in pack_detections above.
        def _infer_packed(v, x):
            return pack_detections(*_infer(v, x))

        self._infer_packed = jax.jit(_infer_packed)

    # -- scale-out serving -------------------------------------------------

    def shard_over(self, mesh, axis: str = "dp"):
        """Batch-parallel serving over a device mesh (in place; returns self).

        Detection inference is embarrassingly batch-parallel, so the
        scale-out design is: weights replicated, batch dim sharded, the
        WHOLE per-image program (forward + decode + NMS) wrapped in
        ``shard_map`` so every op — the Pallas NMS kernel included — runs
        on its device's local shard with zero collectives. (Plain jit
        sharding propagation would replicate around the Pallas custom
        call; shard_map is the TPU-right formulation.) ``batch_size``
        must divide by the mesh size.
        """
        import functools

        # the varying-mesh-axes check can't see through pallas_call's
        # ShapeDtypeStruct outputs — disable it (old API name: check_rep)
        try:
            from jax import shard_map  # jax >= 0.8
            shard_map = functools.partial(shard_map, check_vma=False)
        except ImportError:
            from jax.experimental.shard_map import shard_map
            shard_map = functools.partial(shard_map, check_rep=False)
        from jax.sharding import PartitionSpec as P

        from yolo_scratch_tpu.parallel.mesh import replicate

        n = mesh.devices.size
        if self.cfg.batch_size % n:
            raise ValueError(
                f"batch_size {self.cfg.batch_size} not divisible by mesh size {n}")
        self.variables = replicate(self.variables, mesh)
        inner = self._infer
        inner_packed = self._infer_packed

        self._infer = jax.jit(shard_map(
            lambda v, x: inner(v, x),
            mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis),
        ))
        self._infer_packed = jax.jit(shard_map(
            lambda v, x: inner_packed(v, x),
            mesh=mesh, in_specs=(P(), P(axis)), out_specs=P(axis),
        ))
        return self

    # -- host prep ---------------------------------------------------------

    def _prepare(self, paths: Sequence[str]):
        """-> (imgs (B, S, S, C) f32, meta (B, 5)). Native path preferred."""
        from yolo_scratch_tpu.data import native

        S = self.cfg.img_size
        ch = self.in_ch
        if native.available():
            imgs, meta, status = native.prepare_batch(
                paths, S, channels=ch, letterbox=self.cfg.letterbox,
                threads=self.cfg.host_threads,
                dtype="uint8" if self.cfg.u8_transfer else "float32",
                fast_jpeg=self.cfg.fast_jpeg,
            )
            if (status != 0).any():
                bad = [p for p, s in zip(paths, status) if s != 0]
                raise IOError(f"decode failed: {bad}")
            return imgs, meta
        # cv2 fallback
        import cv2

        imgs = np.zeros((len(paths), S, S, ch), np.float32)
        meta = np.zeros((len(paths), 5), np.float32)
        for i, p in enumerate(paths):
            flag = cv2.IMREAD_GRAYSCALE if ch == 1 else cv2.IMREAD_COLOR
            im = cv2.imdecode(np.fromfile(p, np.uint8), flag)
            if im is None:
                raise IOError(p)
            if ch == 3:
                im = im[..., ::-1]
            h0, w0 = im.shape[:2]
            if self.cfg.letterbox:
                r = min(S / w0, S / h0)
                nw, nh = int(round(w0 * r)), int(round(h0 * r))
                px, py = (S - nw) // 2, (S - nh) // 2
                resized = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
                canvas = np.full((S, S, ch), 114, np.uint8)
                canvas[py : py + nh, px : px + nw] = resized.reshape(nh, nw, ch)
                imgs[i] = canvas.astype(np.float32) / 255
                meta[i] = [w0, h0, r, px, py]
            else:
                imgs[i] = (
                    cv2.resize(im, (S, S), interpolation=cv2.INTER_LINEAR)
                    .reshape(S, S, ch)
                    .astype(np.float32)
                    / 255
                )
                meta[i] = [w0, h0, 0.0, 0, 0]
        return imgs, meta

    def _unmap_boxes(self, boxes_norm: np.ndarray, meta_row: np.ndarray) -> np.ndarray:
        """Normalized model-space xyxy -> original-image pixel xyxy."""
        S = self.cfg.img_size
        w0, h0, r, px, py = meta_row
        b = boxes_norm * S
        if r > 0:  # letterboxed
            b[:, [0, 2]] = (b[:, [0, 2]] - px) / r
            b[:, [1, 3]] = (b[:, [1, 3]] - py) / r
        else:  # stretch
            b[:, [0, 2]] *= w0 / S
            b[:, [1, 3]] *= h0 / S
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w0)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h0)
        return b

    # -- public API --------------------------------------------------------

    def predict_paths(self, paths: Sequence[str]) -> Iterator[Dict]:
        """Stream detections for a list of image paths.

        Pipelined: host prep of batch i overlaps device compute AND the
        device->host fetch of up to ``cfg.inflight`` earlier batches
        (dispatch is async; only the drain of the oldest entry blocks).
        Each batch fetches ONE packed array — see ``_infer_packed``.
        """
        B = self.cfg.batch_size
        depth = max(1, self.cfg.inflight)
        pending: List[tuple] = []  # (paths_chunk, meta, packed_device_out)

        def drain(entry):
            chunk, meta, out = entry
            packed = np.asarray(out)  # one blocking fetch per batch
            for j, p in enumerate(chunk):
                row = packed[j]
                v = row[:, 6] > 0.5
                yield {
                    "path": str(p),
                    "boxes": self._unmap_boxes(row[v, :4], meta[j]).tolist(),
                    "scores": row[v, 4].tolist(),
                    "labels": row[v, 5].astype(np.int64).tolist(),
                }

        for i in range(0, len(paths), B):
            chunk = list(paths[i : i + B])
            n = len(chunk)
            if n < B:
                chunk_padded = chunk + [chunk[-1]] * (B - n)
            else:
                chunk_padded = chunk
            imgs, meta = self._prepare(chunk_padded)
            out = self._infer_packed(self.variables, imgs)  # async dispatch
            pending.append((chunk, meta, out))
            if len(pending) >= depth:
                yield from drain(pending.pop(0))
        for entry in pending:
            yield from drain(entry)


def load_deploy_model(
    cfg_path: str,
    scale: str = "n",
    imgsz: int = 640,
    ckpt: Optional[str] = None,
    torch_ckpt: Optional[str] = None,
    which: str = "best",
    ch: Optional[int] = None,
    nc: Optional[int] = None,
    model_kind: str = "auto",
):
    """Build the model + variables a deploy CLI serves.

    Explicit ``ch``/``nc`` win; otherwise they are read off the checkpoint's
    params tree so deploy serves whatever the train CLI produced (nc=80
    COCO models included) without being told. ``model_kind`` "auto"
    likewise reads the family off the checkpoint: a YOLOX tree
    (backbone/neck/head modules) rebuilds the exact architecture —
    depth/width included — via ``yolox_arch_from_params``; everything
    else is the YOLO11 builder family. Shared by the infer and export
    CLIs. Returns ``(model, variables)``.
    """
    from yolo_scratch_tpu.models.builder import build_yolo11, dims_from_params

    loaded_torch = None
    raw = None
    if torch_ckpt:
        from yolo_scratch_tpu.utils.torch_import import load_reference_checkpoint

        # the torch reference has no YOLOX implementation (SURVEY.md §0.6)
        model_kind = "yolo11"
        loaded_torch = load_reference_checkpoint(torch_ckpt)
        if ch is None or nc is None:
            d_ch, d_nc = dims_from_params(loaded_torch[0])
            ch, nc = ch or d_ch, nc or d_nc
    elif ckpt:
        from yolo_scratch_tpu.train.checkpoints import CheckpointManager

        raw = CheckpointManager(ckpt).peek_raw(which)
        if raw is not None and model_kind == "auto":
            model_kind = "yolox" if "backbone" in raw["params"] else "yolo11"

    if model_kind == "yolox":
        from yolo_scratch_tpu.models.yolox import (
            SCALES as YOLOX_SCALES,
            YOLOXModel,
            yolox_arch_from_params,
        )

        if raw is not None:
            d_ch, d_nc, depth, width = yolox_arch_from_params(raw["params"])
            ch, nc = ch or d_ch, nc or d_nc
            model = YOLOXModel(nc=nc, depth=depth, width=width)
        else:
            ch, nc = ch or 3, nc or 80
            yx_scale = {"n": "nano", "x": "x"}.get(scale, scale)
            if yx_scale not in YOLOX_SCALES:
                raise ValueError(
                    f"unknown YOLOX scale {scale!r}; choose from "
                    f"{sorted(YOLOX_SCALES)} (or 'n' for nano)"
                )
            model = YOLOXModel.from_scale(yx_scale, nc=nc)
    else:
        if raw is not None and (ch is None or nc is None):
            d_ch, d_nc = dims_from_params(raw["params"])
            ch, nc = ch or d_ch, nc or d_nc
        ch, nc = ch or 1, nc or 5  # reference defaults (train_yolo11_cuda.py:554)
        model = build_yolo11(cfg_path, ch=ch, nc=nc, scale=scale)
    if loaded_torch is not None:
        variables = {"params": loaded_torch[0], "batch_stats": loaded_torch[1]}
    elif raw is not None:
        # The orbax tree was already read once for dims auto-detect; serve it
        # directly — no un-jitted model.init (minutes on a 1-core host) and
        # no second checkpoint read. Validate shapes abstractly (eval_shape
        # traces without executing) so a forced wrong --nc/--ch fails loudly.
        from yolo_scratch_tpu.train.checkpoints import _tree_mismatch

        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1, imgsz, imgsz, ch), np.float32),
        )
        for key in ("params", "batch_stats"):
            mismatch = _tree_mismatch(raw.get(key), shapes.get(key, {}))
            if mismatch:
                raise ValueError(
                    f"checkpoint '{which}': {key} do not match the model "
                    f"being served ({mismatch}). Wrong --cfg/--scale/--nc/"
                    "--ch for this checkpoint?"
                )
        variables = {"params": raw["params"], "batch_stats": raw["batch_stats"]}
    elif ckpt:
        # npz-fallback checkpoints store no tree structure: restore through
        # a target state (this is the one path that must pay model.init).
        from yolo_scratch_tpu.train.checkpoints import CheckpointManager
        from yolo_scratch_tpu.train.optim import make_optimizer
        from yolo_scratch_tpu.train.state import create_train_state

        state = create_train_state(
            model, jax.random.PRNGKey(0),
            np.zeros((1, imgsz, imgsz, ch), np.float32), make_optimizer(),
        )
        mgr = CheckpointManager(ckpt)
        state, _, _, _ = mgr.try_resume(state, name=which)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        variables = model.init(
            jax.random.PRNGKey(0), np.zeros((1, imgsz, imgsz, ch), np.float32)
        )
    return model, variables


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Batched streaming inference")
    p.add_argument("--images", type=str, required=True, help="image dir or file")
    p.add_argument("--cfg", type=str,
                   default=str(Path(__file__).parent / "configs/yolo11_crater.yaml"))
    p.add_argument("--scale", type=str, default="n")
    p.add_argument("--ckpt", type=str, default=None, help="checkpoint dir (orbax 'last'/'best')")
    p.add_argument("--torch-ckpt", type=str, default=None, help="reference .pt checkpoint")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--out", type=str, default=None, help="write JSON here")
    p.add_argument("--stretch", action="store_true", help="stretch-resize (reference semantics)")
    p.add_argument("--nc", type=int, default=None,
                   help="class count (default: read from the checkpoint)")
    p.add_argument("--ch", type=int, default=None,
                   help="input channels (default: read from the checkpoint)")
    p.add_argument("--which", type=str, default="best", choices=["best", "last"])
    p.add_argument("--model", type=str, default="auto",
                   choices=["auto", "yolo11", "yolox"],
                   help="model family (default: read from the checkpoint)")
    p.add_argument("--class-aware", action="store_true",
                   help="class-aware NMS (per-class suppression; COCO-style serving)")
    p.add_argument("--topk", type=int, default=PredictorConfig.pre_nms_topk,
                   help="fixed-shape prefilter cap (pre_nms_topk): the NMS "
                        "sweep length. A binding cap silently drops the "
                        "lowest-scoring candidates on dense scenes — raise "
                        "toward 2048 when detections-per-image matters more "
                        "than latency (docs/PERF.md 'prefilter cap')")
    p.add_argument("--blocked-topk", type=int, default=0,
                   help="opt-in approximate two-stage candidate selection "
                        "(validate with scripts/validate_blocked_topk.py first); "
                        "0 = exact (default)")
    p.add_argument("--int8-calib", type=int, default=0, metavar="N",
                   help="serve int8 (nn/quant.py): calibrate activation "
                        "scales on the first N input batches, then quantize "
                        "every ConvBNAct to symmetric int8 (0 = off)")
    p.add_argument("--save-viz", type=str, default=None, metavar="DIR",
                   help="write annotated PNGs (class-colored boxes + scores "
                        "on the original images) to DIR")
    p.add_argument("--names", type=str, default=None,
                   help="class-name file for --save-viz: one name per line, "
                        "a JSON array, or a COCO annotations json")
    args = p.parse_args(argv)

    root = Path(args.images)
    exts = {".png", ".jpg", ".jpeg", ".bmp"}
    paths = (
        [str(root)]
        if root.is_file()
        else sorted(str(q) for q in root.rglob("*") if q.suffix.lower() in exts)
    )
    if not paths:
        raise SystemExit(f"no images under {root}")

    model, variables = load_deploy_model(
        args.cfg, scale=args.scale, imgsz=args.imgsz, ckpt=args.ckpt,
        torch_ckpt=args.torch_ckpt, which=args.which, ch=args.ch, nc=args.nc,
        model_kind=args.model,
    )

    cfg = PredictorConfig(
        img_size=args.imgsz, batch_size=args.batch, conf_threshold=args.conf,
        iou_threshold=args.iou, letterbox=not args.stretch,
        class_aware_nms=args.class_aware,
        pre_nms_topk=args.topk,
        blocked_topk=args.blocked_topk,
    )
    if args.int8_calib:
        from yolo_scratch_tpu.nn.quant import (
            count_quantized,
            prepare_calib_batches,
            quantize_for_deploy,
        )

        # calibrate on real deploy inputs: host-prep the first N batches
        # exactly as the Predictor will see them (letterbox + /255)
        calib_pred = Predictor(model, variables, cfg)  # for _prepare only
        calib_batches = prepare_calib_batches(calib_pred, paths, args.int8_calib)
        variables = quantize_for_deploy(model, variables, calib_batches)
        print(f"int8: quantized {count_quantized(variables['quant'])} conv blocks "
              f"(calibrated on {len(calib_batches)} batches)")
    predictor = Predictor(model, variables, cfg)

    t0 = time.perf_counter()
    results = list(predictor.predict_paths(paths))
    dt = time.perf_counter() - t0
    print(f"{len(paths)} images in {dt:.2f}s ({len(paths) / dt:.1f} img/s)")
    if args.save_viz:
        from yolo_scratch_tpu.utils.viz import load_class_names, save_annotated

        written = save_annotated(
            results, args.save_viz, class_names=load_class_names(args.names)
        )
        print(f"wrote {len(written)} annotated images to {args.save_viz}")
    elif args.names:
        print("warning: --names only labels --save-viz renderings; the JSON "
              "output keeps integer labels. Pass --save-viz DIR to use it.")
    if args.out:
        Path(args.out).write_text(json.dumps(results))
        print(f"wrote {args.out}")
    else:
        for r in results[:5]:
            print(r["path"], len(r["scores"]), "detections")
    return results


def cli(argv=None):
    """Console-script entry: run main() and discard its return value.

    setuptools entry points pass main()'s return to sys.exit(); main()
    returns a result object for programmatic use, which would make every
    successful run exit with status 1. This wrapper keeps exit status 0.
    """
    main(argv)


if __name__ == "__main__":
    cli()
