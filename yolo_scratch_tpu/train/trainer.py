"""Trainer: epoch loop, validation, checkpoints — the reference's
``main()``/``train_one_epoch``/``validate`` (``train_yolo11_cuda.py:31-262,
454-661``) as a real API instead of a script.

Differences by design:
  * the whole train step is one jitted program (no per-step ``.item()``
    syncs — metrics are fetched once per log interval);
  * validation decode+NMS runs on device with fixed shapes; only the final
    mAP/CDA reduction is host-side;
  * optional dp mesh: pass ``mesh=`` and the same loop runs sharded.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
from yolo_scratch_tpu.train.checkpoints import CheckpointManager
from yolo_scratch_tpu.train.optim import cosine_epoch_schedule, make_optimizer
from yolo_scratch_tpu.train.state import create_train_state
from yolo_scratch_tpu.train.steps import build_train_step, make_eval_step, make_train_step
from yolo_scratch_tpu.utils.metrics import (
    detections_to_lists,
    evaluate_detections,
    targets_to_lists,
)


@dataclass
class TrainerConfig:
    epochs: int = 150
    lr: float = 1e-3
    weight_decay: float = 5e-4
    warmup_epochs: int = 3
    clip_norm: float = 10.0
    val_conf: float = 0.25
    nms_iou: float = 0.45
    max_det: int = 300
    # prefilter cap for the fixed-shape NMS. The reference's eval NMS is
    # UNCAPPED (train_yolo11_cuda.py:306-331); a cap that binds silently
    # drops real detections — measured on trained weights @640, dense val
    # scenes reach 1476 above-conf candidates, and the old 1000 cap cost
    # 13/218 final detections (docs/H2H.md). 2048 gives headroom at
    # conf 0.25; the per-epoch `prefilter_saturated` val metric reports
    # when even this binds.
    pre_nms_topk: int = 2048
    # precision of the EVAL forward (jax.default_matmul_precision name;
    # None = platform default). "highest" because validation is an
    # accuracy measurement: the MXU's default bf16-pass f32 matmuls cost
    # ~0.01 mAP50-95 of scoring error at strict IoU on trained weights
    # (docs/H2H.md). Training and deploy keep the fast default.
    val_matmul_precision: Optional[str] = "highest"
    max_val_batches: Optional[int] = None
    # validate() defers device->host fetches and stacks them; flushing
    # every K batches bounds the live device/host footprint to
    # K x B x max_det rows instead of the whole val set (COCO-val-shaped
    # measurement in docs/PERF.md "eval deferred-fetch memory") while
    # still amortizing the per-fetch round trip (a WAN RTT over the axon
    # tunnel). 128 batches x B=8 x max_det=300 x 10 thresholds ~ 25 MB.
    val_fetch_chunk: int = 128
    save_dir: Optional[str] = None
    use_ema: bool = False
    eval_with_ema: bool = False
    log_interval: int = 50
    augment: Optional[Any] = None  # data.augment.AugmentConfig; applied on device
    mixed_precision: bool = False  # bf16 fwd/bwd, f32 master weights + loss
    remat: bool = False  # activation recompute (jax.checkpoint) in backward
    # k>1: lax.scan over k microbatches, mean gradient applied once —
    # effective batch scales past HBM at one microbatch's activation
    # memory (steps.build_train_step_custom docstring for the semantics)
    grad_accum: int = 1
    # TRAIN-step matmul precision. Default "high" (bf16x3 MXU passes):
    # the round-5 precision-accuracy frontier (H2H640_frontier.json,
    # docs/H2H.md) measured, at 640/60ep vs the f32-CPU reference's
    # 0.8895 mAP50-95: f32-platform-default −0.032 (780 img/s @ B=128),
    # bf16-mixed −0.010 (1,222), "high" +0.001 (645), "highest" +0.003
    # (483). "high" is parity at 1.33x the speed of "highest";
    # f32-platform-default is dominated by bf16-mixed on BOTH axes (use
    # --bf16 for throughput, not precision=default), so it is no longer
    # the default. None = platform default (fastest f32, known −0.03).
    # Not on the shard_map DDP (bn_mode='local') path.
    train_matmul_precision: Optional[str] = "high"
    bn_mode: str = "sync"  # 'sync' (global-batch BN) | 'local' (DDP per-replica)
    # Final no-aug phase (YOLOX paper recipe: last ~15 epochs train with
    # mosaic/strong aug OFF; for YOLOX the L1 reg loss also turns ON).
    # 0 disables the phase.
    final_epochs: int = 0
    # TP/FP matching on device inside the jitted eval step (ops.matching);
    # host keeps only AP accumulation. False falls back to the numpy
    # greedy matcher (utils.metrics.evaluate_detections).
    device_matching: bool = True
    # Warm-start weights before training: an orbax checkpoint dir (ours)
    # or a reference .pt file. Partial load with the reference's
    # strict=False semantics (models/yolo11_model.py:273-286): missing
    # keys and shape mismatches (different nc/ch head) keep their init.
    pretrained: Optional[str] = None
    # Early stopping: stop after N epochs in which val fitness (mAP50,
    # falling back to -val_loss) did not reach its running best. The gate
    # is >= (Ultralytics semantics): an exact plateau — including the
    # cold-start mAP=0 epochs before the model detects anything — refreshes
    # the clock rather than counting toward the stop, so patience only
    # fires on genuine regression from a peak. 0 disables. The reference
    # always runs the full --epochs budget; this is extra capability. The
    # counter/best persist in the checkpoint meta, so a kill/relaunch run
    # stops at the same epoch as an uninterrupted one.
    patience: int = 0


class Trainer:
    def __init__(
        self,
        model,
        train_loader,
        val_loader=None,
        config: TrainerConfig = TrainerConfig(),
        mesh=None,
        seed: int = 0,
        model_kind: str = "yolo11",
    ):
        """``model_kind``: 'yolo11' (v8 loss + DFL decode) or 'yolox'
        (SimOTA loss + obj*cls decode). Both share the rest of the stack."""
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.cfg = config
        self.mesh = mesh
        self.model_kind = model_kind

        self.loss_cfg = DetectionLossConfig(nc=model.nc, strides=model.strides)
        self._loss_fn_final = None  # final-phase loss (YOLOX: use_l1=True)
        if model_kind == "yolox":
            from yolo_scratch_tpu.losses.simota import YOLOXLossConfig
            from yolo_scratch_tpu.models.yolox import yolox_eval_decode
            from yolo_scratch_tpu.train.steps import yolox_loss_adapter

            self._loss_fn = yolox_loss_adapter(
                YOLOXLossConfig(nc=model.nc, strides=tuple(model.strides))
            )
            if config.final_epochs > 0:
                self._loss_fn_final = yolox_loss_adapter(
                    YOLOXLossConfig(nc=model.nc, strides=tuple(model.strides), use_l1=True)
                )
            self._decode_fn = lambda feats: yolox_eval_decode(
                feats, model.nc, tuple(model.strides)
            )
        else:
            self._loss_fn = None  # steps default to the v8 adapters
            self._decode_fn = None
        steps_per_epoch = max(len(train_loader), 1)
        schedule = cosine_epoch_schedule(
            config.lr, config.epochs, steps_per_epoch, config.warmup_epochs
        )
        self.schedule = schedule
        tx = make_optimizer(schedule, config.weight_decay, config.clip_norm)

        sample = next(iter(train_loader))
        self.state = create_train_state(
            model, jax.random.PRNGKey(seed), sample["img"][:1], tx, use_ema=config.use_ema
        )
        if config.pretrained:
            self._apply_pretrained(config.pretrained)

        from yolo_scratch_tpu.train.steps import v8_loss_adapter

        if mesh is None and config.bn_mode == "local":
            import warnings

            warnings.warn(
                "bn_mode='local' has no effect without a mesh — training uses "
                "single-device BN (identical to 'sync' at mesh size 1)",
                stacklevel=2,
            )
        loss_fn = self._loss_fn if self._loss_fn is not None else v8_loss_adapter(self.loss_cfg)
        self._multiprocess = False
        if mesh is not None:
            from yolo_scratch_tpu.parallel.mesh import _spans_processes, replicate

            self._multiprocess = _spans_processes(mesh)
            self.state = replicate(self.state, mesh)
        self._train_step = self._wrap_train_step(loss_fn)
        # Final-phase step (different loss -> one extra compile); built lazily
        # at the phase transition so runs that never reach it pay nothing.
        self._train_step_final = None
        self._finish_init(seed)

    def _apply_pretrained(self, path: str):
        """Overlay pretrained weights onto the fresh state (reference
        ``build_yolo11(pretrained=...)`` semantics: strict=False partial
        load, ``models/yolo11_model.py:273-286``). Accepts an orbax
        checkpoint dir (best, else last) or a reference ``.pt`` file."""
        from pathlib import Path

        from yolo_scratch_tpu.utils.torch_import import merge_pretrained

        p = Path(path)
        if p.is_dir():
            from yolo_scratch_tpu.train.checkpoints import CheckpointManager

            mgr = CheckpointManager(str(p))
            raw = mgr.peek_raw("best") or mgr.peek_raw("last")
            if raw is None:
                raise FileNotFoundError(f"no orbax checkpoint under {p}")
            loaded_p, loaded_bs = raw["params"], raw["batch_stats"]
        else:
            from yolo_scratch_tpu.utils.torch_import import load_reference_checkpoint

            loaded_p, loaded_bs = load_reference_checkpoint(str(p))
        params, skipped_p = merge_pretrained(self.state.params, loaded_p)
        stats, skipped_s = merge_pretrained(self.state.batch_stats, loaded_bs)
        skipped = skipped_p + skipped_s
        self.state = self.state.replace(params=params, batch_stats=stats)
        total = len(jax.tree_util.tree_leaves(params))
        print(f"pretrained: loaded {path} "
              f"({total - len(skipped_p)}/{total} param leaves; "
              f"{len(skipped)} kept init: "
              f"{', '.join(skipped[:4])}{'...' if len(skipped) > 4 else ''})"
              if skipped else
              f"pretrained: loaded {path} (all {total} param leaves)")

    def _wrap_train_step(self, loss_fn):
        """Compile ``loss_fn`` into a train step honoring mesh/bn_mode/bf16/
        remat config. ``self.state`` must already be placed (replicated)."""
        import jax.numpy as jnp

        from yolo_scratch_tpu.train.steps import build_train_step_custom

        config, mesh, model = self.cfg, self.mesh, self.model
        compute_dtype = jnp.bfloat16 if config.mixed_precision else None

        if mesh is not None and config.bn_mode == "local":
            if config.grad_accum > 1:
                raise ValueError(
                    "grad_accum>1 is supported on the jit-sharded (sync-BN) "
                    "path, not the shard_map DDP (bn_mode='local') path"
                )
            from yolo_scratch_tpu.parallel.mesh import make_ddp_train_step

            return make_ddp_train_step(
                model, loss_fn, mesh, compute_dtype=compute_dtype, donate=True,
                remat=config.remat,
            )
        raw_step = build_train_step_custom(
            model, loss_fn, compute_dtype=compute_dtype, remat=config.remat,
            grad_accum=config.grad_accum,
            matmul_precision=config.train_matmul_precision,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("dp"))
            return jax.jit(
                raw_step, in_shardings=(repl, data), out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(raw_step, donate_argnums=(0,))

    def _finish_init(self, seed: int):
        config = self.cfg
        if self._multiprocess and not config.device_matching:
            raise ValueError(
                "multi-process meshes require device_matching=True (host-side "
                "greedy matching cannot see other processes' targets)"
            )
        if config.device_matching:
            from yolo_scratch_tpu.ops.matching import DEFAULT_THRESHOLDS

            self._match_thresholds = DEFAULT_THRESHOLDS
        else:
            self._match_thresholds = None
        self._eval_step = make_eval_step(
            self.model,
            self.loss_cfg,
            conf_threshold=config.val_conf,
            iou_threshold=config.nms_iou,
            max_det=config.max_det,
            pre_nms_topk=config.pre_nms_topk,
            use_ema=config.eval_with_ema,
            loss_fn=self._loss_fn,
            decode_fn=self._decode_fn,
            match_thresholds=self._match_thresholds,
            matmul_precision=config.val_matmul_precision,
        )

        self._aug_key = jax.random.PRNGKey(seed + 1)
        if config.augment is not None:
            from yolo_scratch_tpu.data.augment import augment_batch

            self._augment = lambda b, k: augment_batch(b, k, config.augment)
        else:
            self._augment = None

        self.ckpt = CheckpointManager(config.save_dir) if config.save_dir else None
        self.logger = None
        if config.save_dir:
            from yolo_scratch_tpu.utils.logging import JsonlWriter, MetricsLogger

            self.logger = MetricsLogger(
                [JsonlWriter(str(Path(config.save_dir) / "metrics.jsonl"))]
            )
        self.best_loss = float("inf")
        self.best_map50 = 0.0
        self.start_epoch = 0
        # early-stopping state; checkpointed in the meta json and restored
        # by resume() so patience counts across kill/relaunch
        self.since_improve = 0
        self.patience_best = -float("inf")

    # ------------------------------------------------------------------

    def resume(self) -> bool:
        if self.ckpt is None:
            return False
        if self._multiprocess:
            # orbax restore is collective (sync_global_processes) and its
            # first sync creates a NEW gloo communicator with a ~30 s join
            # window. Processes can be minutes apart here (startup compile
            # skew under host contention), so realign them first on the
            # communicator that barrier() already established at
            # initialize() time — same failure mode barrier()'s docstring
            # describes for the first train step.
            from yolo_scratch_tpu.parallel import distributed as D

            D.barrier(self.mesh)
        state, self.start_epoch, self.best_loss, self.best_map50 = self.ckpt.try_resume(
            self.state
        )
        if self.start_epoch > 0 and self.mesh is not None:
            # try_resume returns host numpy trees; the sharded train step
            # requires mesh-placed (globally replicated) arrays — on a
            # multi-process mesh jit cannot auto-place host arrays, so
            # re-replicate explicitly (same as __init__)
            from yolo_scratch_tpu.parallel.mesh import replicate

            state = replicate(jax.device_get(state), self.mesh)
        self.state = state
        if self.start_epoch > 0:
            meta = self.ckpt.load_meta("last") or {}
            pat = meta.get("patience")
            if pat is not None:
                self.since_improve = int(pat["since_improve"])
                # null = no val fitness recorded before the save (see save
                # side) — restore the fresh-run sentinel
                self.patience_best = (-float("inf") if pat["best"] is None
                                      else float(pat["best"]))
        return self.start_epoch > 0

    def _place(self, batch: Dict[str, np.ndarray]):
        if self.mesh is not None:
            from yolo_scratch_tpu.parallel.mesh import shard_batch

            return shard_batch(batch, self.mesh)
        return batch

    def _in_final_phase(self, epoch: int) -> bool:
        """Last ``final_epochs`` epochs: augmentation off (+ L1 on for YOLOX),
        per the YOLOX paper's no-aug end phase."""
        return self.cfg.final_epochs > 0 and epoch >= self.cfg.epochs - self.cfg.final_epochs

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        t0 = time.perf_counter()
        images = 0
        final_phase = self._in_final_phase(epoch)
        step_fn = self._train_step
        if final_phase and self._loss_fn_final is not None:
            if self._train_step_final is None:
                self._train_step_final = self._wrap_train_step(self._loss_fn_final)
            step_fn = self._train_step_final
        collected = []  # device arrays; fetched once at epoch end (no per-step sync)
        for bi, batch in enumerate(self.train_loader):
            images += batch["img"].shape[0]
            batch = self._place(batch)
            if self._augment is not None and not final_phase:
                key = jax.random.fold_in(self._aug_key, epoch * 100003 + bi)
                batch = self._augment(batch, key)
            self.state, metrics = step_fn(self.state, batch)
            collected.append(metrics)
        out: Dict[str, float] = {}
        if collected:
            # one stacked fetch for the whole epoch: every np.asarray on a
            # device scalar is a blocking host<->device round trip (over
            # the axon tunnel a full WAN RTT), so per-step-per-key fetches
            # were steps*keys round trips at epoch end
            keys = list(collected[0].keys())
            stacked = jnp.stack(
                [jnp.stack([m[k] for m in collected]) for k in keys])
            vals = np.asarray(stacked).mean(axis=1)
            out = {k: float(v) for k, v in zip(keys, vals)}
        dt = time.perf_counter() - t0
        out["imgs_per_sec"] = images / dt if dt > 0 else 0.0
        out["epoch_time_s"] = dt
        return out

    def validate(self) -> Dict[str, float]:
        if self.val_loader is None:
            return {}
        n = 0
        all_preds, all_targets = [], []        # host-matching path
        all_marks, all_scores, all_valid = [], [], []  # device-matching path
        n_gt = 0
        # Single-process: DEFER every device->host fetch to one stacked
        # transfer per kind after the loop — each blocking np.asarray is a
        # full host<->device round trip (a WAN RTT over the axon tunnel),
        # and the per-batch pattern paid ~(len(metrics)+3) of them per val
        # batch. Val batches are fixed-shape (the loader wrap-pads), so
        # device outputs stack cleanly. Multi-process keeps the per-batch
        # collective allgather (symmetric schedule across hosts).
        metric_accum = []  # device scalar dicts, fetched stacked at the end
        deferred = []      # (device arrays..., sv, targets) per batch
        if self._multiprocess:
            # detections/marks come back dp-sharded across processes; gather
            # them to full global arrays on every host (DCN allgather)
            from jax.experimental import multihost_utils as _mh

            fetch = lambda x: np.asarray(_mh.process_allgather(x, tiled=True))
        else:
            fetch = np.asarray
        def flush_deferred():
            """Stacked fetch of the deferred batches (one transfer per
            kind), then release the device arrays. Called every
            cfg.val_fetch_chunk batches and once after the loop, so the
            live footprint is bounded by the chunk, not the val set."""
            if not deferred:
                return
            if self._match_thresholds is not None:
                marks_h = np.asarray(jnp.stack([d[0] for d in deferred]))
                scores_h = np.asarray(jnp.stack([d[1] for d in deferred]))
                valid_h = np.asarray(jnp.stack([d[2] for d in deferred]))
                for i, d in enumerate(deferred):
                    sv = d[3]
                    all_marks.append(marks_h[i][sv])
                    all_scores.append(scores_h[i][sv])
                    all_valid.append(valid_h[i][sv])
            else:
                boxes_h = np.asarray(jnp.stack([d[0] for d in deferred]))
                scores_h = np.asarray(jnp.stack([d[1] for d in deferred]))
                labels_h = np.asarray(jnp.stack([d[2] for d in deferred]))
                valid_h = np.asarray(jnp.stack([d[3] for d in deferred]))
                for i, d in enumerate(deferred):
                    sv, targets = d[4], d[5]
                    preds = detections_to_lists(
                        boxes_h[i], scores_h[i], labels_h[i], valid_h[i])
                    all_preds.extend(p for p, ok in zip(preds, sv) if ok)
                    all_targets.extend(t for t, ok in zip(targets, sv) if ok)
            deferred.clear()

        for batch in self.val_loader:
            if self.cfg.max_val_batches is not None and n >= self.cfg.max_val_batches:
                break
            placed = self._place(batch)
            out_step = self._eval_step(self.state, placed)
            metrics, (boxes, scores, labels, valid) = out_step[0], out_step[1]
            metric_accum.append(metrics)
            # score each val image exactly once: drop the loader's wrap-padding
            # duplicates on the final short batch (reference evaluates every
            # image once, train_yolo11_cuda.py:101-262)
            B = batch["img"].shape[0]
            if self._multiprocess:
                # global row-validity travels with the sharded batch
                sv = fetch(placed["sample_valid"]).astype(bool)
                gt_mask_host = fetch(placed["gt_mask"])
            else:
                sv = np.asarray(batch.get("sample_valid", np.ones(B, bool)))
                gt_mask_host = np.asarray(batch["gt_mask"])
            if self._match_thresholds is not None:
                if self._multiprocess:
                    marks = fetch(out_step[2])
                    all_marks.append(marks[sv])
                    all_scores.append(fetch(scores)[sv])
                    all_valid.append(fetch(valid)[sv])
                else:
                    deferred.append((out_step[2], scores, valid, sv, None))
                n_gt += int(gt_mask_host[sv].sum())
            else:
                targets = targets_to_lists(
                    batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"]
                )
                if self._multiprocess:
                    boxes, scores, labels, valid = (
                        fetch(boxes), fetch(scores), fetch(labels), fetch(valid)
                    )
                    preds = detections_to_lists(boxes, scores, labels, valid)
                    all_preds.extend(p for p, ok in zip(preds, sv) if ok)
                    all_targets.extend(t for t, ok in zip(targets, sv) if ok)
                else:
                    deferred.append((boxes, scores, labels, valid, sv, targets))
            if len(deferred) >= max(self.cfg.val_fetch_chunk, 1):
                flush_deferred()
            n += 1
        flush_deferred()
        loss_sums: Dict[str, float] = {}
        if metric_accum:
            keys = list(metric_accum[0].keys())
            stacked = jnp.stack(
                [jnp.stack([m[k] for m in metric_accum]) for k in keys])
            vals = np.asarray(stacked).sum(axis=1)
            loss_sums = {k: float(v) for k, v in zip(keys, vals)}
        out = {k: v / max(n, 1) for k, v in loss_sums.items()}
        if self._match_thresholds is not None:
            from yolo_scratch_tpu.utils.metrics import metrics_from_marks

            if all_marks:
                out.update(metrics_from_marks(
                    np.concatenate(all_marks), np.concatenate(all_scores),
                    np.concatenate(all_valid), n_gt,
                ))
            else:
                out.update({"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50-95": 0.0})
        else:
            out.update(
                evaluate_detections(
                    all_preds, all_targets, conf_threshold=self.cfg.val_conf, iou_threshold=0.5
                )
            )
        if out.get("prefilter_saturated", 0.0) > 0:
            # the cap dropped real candidates on some images — the mAP
            # below is an UNDER-estimate relative to an uncapped evaluator
            print(f"  ! prefilter cap (pre_nms_topk={self.cfg.pre_nms_topk}) "
                  f"bound on ~{out['prefilter_saturated']:.0%} of val images "
                  "— raise it for exact eval")
        return out

    def fit(self, resume: bool = True) -> Dict[str, Any]:
        try:
            return self._fit(resume)
        finally:
            # the final async orbax save must land before interpreter
            # shutdown kills asyncio's default executor (else the save dies
            # with "cannot schedule new futures after shutdown" and leaves a
            # last.orbax-checkpoint-tmp behind)
            if self.ckpt is not None:
                self.ckpt.wait()

    def _fit(self, resume: bool) -> Dict[str, Any]:
        # fresh-run defaults FIRST: a reused Trainer (sweeps, scripted
        # back-to-back fits) must not carry a stale plateau clock, best-so-
        # far gates, or start epoch from a previous run into this one —
        # resume() then restores the persisted values when there is a
        # checkpoint to continue (stale best_map50 would suppress 'best'
        # saves for the whole second run; stale start_epoch would skip its
        # first epochs outright)
        self.best_loss = float("inf")
        self.best_map50 = 0.0
        self.start_epoch = 0
        self.since_improve = 0
        self.patience_best = -float("inf")
        if resume:
            self.resume()
        history = []
        for epoch in range(self.start_epoch, self.cfg.epochs):
            lr = float(self.schedule(epoch * max(len(self.train_loader), 1)))
            if self._in_final_phase(epoch) and not self._in_final_phase(epoch - 1):
                extra = " + L1 loss on" if self._loss_fn_final is not None else ""
                print(f"--> final phase: augmentation off{extra} "
                      f"(last {self.cfg.final_epochs} epochs)")
            train_metrics = self.train_epoch(epoch)
            val_metrics = self.validate()

            # component keys differ per loss family (v8: box/cls/dfl,
            # YOLOX/SimOTA: iou/obj/cls/l1) — print whichever are present
            parts = " ".join(
                f"{label} {train_metrics[key]:.4f}"
                for label, key in (("box", "box_loss"), ("iou", "iou_loss"),
                                   ("obj", "obj_loss"), ("cls", "cls_loss"),
                                   ("dfl", "dfl_loss"), ("l1", "l1_loss"))
                if key in train_metrics
            )
            print(
                f"Epoch {epoch + 1}/{self.cfg.epochs} | lr {lr:.6f} | "
                f"train loss {train_metrics.get('loss', float('nan')):.4f} "
                f"({parts}) | "
                f"{train_metrics.get('imgs_per_sec', 0):.1f} img/s"
            )
            if val_metrics:
                print(
                    f"  val loss {val_metrics.get('loss', float('nan')):.4f} | "
                    f"P {val_metrics.get('precision', 0):.4f} "
                    f"R {val_metrics.get('recall', 0):.4f} "
                    f"mAP50 {val_metrics.get('mAP50', 0):.4f} "
                    f"mAP50-95 {val_metrics.get('mAP50-95', 0):.4f}"
                )

            if self.logger is not None:
                self.logger.log(
                    epoch,
                    lr=lr,
                    **{f"train/{k}": v for k, v in train_metrics.items()},
                    **{f"val/{k}": v for k, v in val_metrics.items()},
                )
            # update the early-stopping counters BEFORE the checkpoint save so
            # the persisted state reflects this epoch — a kill/relaunch run
            # then stops at the same epoch as an uninterrupted one
            if self.cfg.patience > 0 and val_metrics:
                fitness = val_metrics.get(
                    "mAP50", -val_metrics.get("loss", float("inf")))
                if fitness >= self.patience_best:  # plateau refreshes the clock
                    self.patience_best, self.since_improve = fitness, 0
                else:
                    self.since_improve += 1
            if self.ckpt is not None:
                extra = None
                if self.cfg.patience > 0:
                    # -inf (no val fitness seen yet) lands as null in the
                    # meta json (checkpoints._meta_dumps); the restore in
                    # resume() maps null back to the sentinel
                    extra = {"patience": {"since_improve": self.since_improve,
                                          "best": self.patience_best}}
                self.best_loss, self.best_map50, saved = self.ckpt.save_epoch(
                    self.state, epoch, train_metrics, val_metrics,
                    self.best_loss, self.best_map50, extra_meta=extra,
                )
                if saved:
                    print(f"  ✓ saved best (mAP50 {self.best_map50:.4f})")
            history.append({"epoch": epoch, "train": train_metrics, "val": val_metrics})
            if self.cfg.patience > 0 and self.since_improve >= self.cfg.patience:
                print(f"--> early stop at epoch {epoch + 1}: val fitness "
                      f"below its best ({self.patience_best:.4f}) for "
                      f"{self.cfg.patience} epochs")
                break
        return {
            "history": history,
            "best_mAP50": self.best_map50,
            "best_loss": self.best_loss,
        }
