"""Jitted train / eval steps.

The reference's per-step hot loop (``train_one_epoch``,
``train_yolo11_cuda.py:31-98``) does forward, loss, backward, clip, step as
separate host-driven calls with ``.item()`` syncs each iteration. Here the
whole step — forward (BN batch-stat update), loss (incl. TAL assignment),
backward, clip, AdamW, EMA — is ONE compiled XLA program; metrics come back
as a small device array, fetched asynchronously by the caller.

Batches are dicts of fixed-shape arrays:
  img        (B, H, W, C) float32
  gt_labels  (B, G) int32
  gt_bboxes  (B, G, 4) float32, normalized xyxy, zero-padded
  gt_mask    (B, G) bool

Under a ``Mesh`` with the batch sharded on the ``dp`` axis and state
replicated, jit inserts the gradient/BN psums over ICI automatically
(single logical computation); see ``yolo_scratch_tpu/parallel``.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig, v8_detection_loss
from yolo_scratch_tpu.train.state import TrainState


def v8_loss_adapter(loss_cfg: DetectionLossConfig):
    """feats+batch -> (total, metrics dict) for the v8 (YOLO11) loss."""

    def fn(feats, batch):
        total, items = v8_detection_loss(
            feats, batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"], loss_cfg
        )
        return total, {"box_loss": items[0], "cls_loss": items[1], "dfl_loss": items[2]}

    return fn


def yolox_loss_adapter(loss_cfg):
    """feats+batch -> (total, metrics dict) for the YOLOX/SimOTA loss."""
    from yolo_scratch_tpu.losses.simota import yolox_loss

    def fn(feats, batch):
        total, aux = yolox_loss(
            feats, batch["gt_labels"], batch["gt_bboxes"], batch["gt_mask"], loss_cfg
        )
        return total, aux

    return fn


def build_train_step_custom(model, loss_fn, compute_dtype=None, remat: bool = False,
                            grad_accum: int = 1, matmul_precision=None):
    """Generic unjitted step; ``loss_fn(feats, batch) -> (total, metrics)``.

    ``matmul_precision``: ``jax.default_matmul_precision`` name for the
    whole step (None = platform default). On TPU, default f32 matmuls run
    bf16 MXU passes — fastest, and fine for most training — but the
    accumulated coordinate noise measurably costs strict-IoU
    localization: the 640/60-epoch H2H arm trained at default precision
    landed mAP50-95 −0.029 below the f32-CPU reference, and the identical
    arm at ``"highest"`` matched/beat it (+0.003 best; docs/H2H.md,
    ``H2H640_60ep_hp.json``). Use ``"highest"`` when strict-IoU accuracy
    is the target; measured cost at n@640 B=128 (docs/PERF.md,
    ``probe_train_precision.py``): f32-default 780 img/s → "high" 645 →
    "highest" 483 — extra MXU passes are real work even on an HBM-bound
    step.

    ``compute_dtype=jnp.bfloat16`` enables mixed precision: the forward/
    backward run with bf16 weights and activations (MXU-native), while the
    f32 master params, optimizer state, BN statistics and the loss itself
    stay f32 (raw head outputs are cast back before the loss).

    ``remat=True`` wraps the forward in ``jax.checkpoint``: activations are
    recomputed during the backward pass instead of stored (~ +1/3 compute
    for O(layer) -> O(1) activation memory — the XLA-native equivalent of
    gradient checkpointing; lets batch/resolution scale past HBM).

    ``grad_accum=k>1``: the batch (leading dim divisible by k) is split
    into k microbatches swept by ``lax.scan`` — gradients accumulate in an
    O(params) carry (never k stacked trees), the optimizer applies their
    mean once. Activation memory is that of ONE microbatch, so effective
    batch scales past HBM without remat's recompute. Semantics match
    shard_map DDP over k replicas (each microbatch's loss normalizes over
    its own targets, then gradients average) — NOT bit-identical to one
    large-batch step (which normalizes over the union); BN batch
    statistics update sequentially per microbatch (momentum applied k
    times), vs DDP's per-replica stats.
    """

    def forward(p, bs, img):
        return model.apply(
            {"params": p, "batch_stats": bs}, img, train=True, mutable=["batch_stats"]
        )

    fwd = jax.checkpoint(forward) if remat else forward

    def micro_grads(params, batch_stats, batch):
        def wrapped(p_in):
            p = p_in
            if compute_dtype is not None:
                p = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), p_in)
            img = batch["img"].astype(compute_dtype) if compute_dtype is not None else batch["img"]
            feats, mutated = fwd(p, batch_stats, img)
            if compute_dtype is not None:
                feats = jax.tree_util.tree_map(lambda f: f.astype(jnp.float32), feats)
            total, metrics = loss_fn(feats, batch)
            return total, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(wrapped, has_aux=True)(params)
        if compute_dtype is not None:
            new_bs = jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), new_bs)
        return loss, metrics, new_bs, grads

    def step(state: TrainState, batch: Dict[str, Any]):
        if matmul_precision is not None:
            # trace-time context: the whole step compiles at this precision
            with jax.default_matmul_precision(matmul_precision):
                return _step_body(state, batch)
        return _step_body(state, batch)

    def _step_body(state: TrainState, batch: Dict[str, Any]):
        if grad_accum == 1:
            loss, metrics, new_bs, grads = micro_grads(state.params, state.batch_stats, batch)
            state = state.replace(batch_stats=new_bs).apply_gradients(grads)
            return state, {"loss": loss, **metrics}

        # STRIDED split (microbatch i = rows i, i+k, i+2k, ...): under a dp
        # mesh with the batch axis sharded, every microbatch then draws
        # B/(k*d) rows from EVERY device's contiguous shard, so each scan
        # iteration stays device-local — a contiguous split would leave
        # microbatch i on d/k devices and force GSPMD to reshard per step.
        # Any partition is semantically valid (mean of per-microbatch
        # gradients either way).
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(
                x.shape[0] // grad_accum, grad_accum, *x.shape[1:]
            ).swapaxes(0, 1),
            batch,
        )

        def body(carry, mb):
            bs, g_acc, loss_acc, m_acc = carry
            loss, metrics, new_bs, grads = micro_grads(state.params, bs, mb)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
            return (new_bs, g_acc, loss_acc + loss, m_acc), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        # metrics structure comes from a cheap abstract eval (no FLOPs)
        m_shape = jax.eval_shape(
            lambda: micro_grads(
                state.params, state.batch_stats,
                jax.tree_util.tree_map(lambda x: x[0], micro))[1]
        )
        zero_m = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), m_shape)
        (new_bs, g_sum, loss_sum, m_sum), _ = jax.lax.scan(
            body, (state.batch_stats, zero_g, jnp.zeros(()), zero_m), micro
        )
        inv = 1.0 / grad_accum
        grads = jax.tree_util.tree_map(lambda g: g * inv, g_sum)
        metrics = jax.tree_util.tree_map(lambda m: m * inv, m_sum)
        state = state.replace(batch_stats=new_bs).apply_gradients(grads)
        return state, {"loss": loss_sum * inv, **metrics}

    return step


def build_train_step(model, loss_cfg: DetectionLossConfig):
    """Returns the *unjitted* v8-loss ``train_step`` (for callers that
    re-jit with explicit shardings, e.g. the dp mesh)."""
    return build_train_step_custom(model, v8_loss_adapter(loss_cfg))


def make_train_step(model, loss_cfg: DetectionLossConfig, donate: bool = True):
    """Returns jitted ``train_step(state, batch) -> (state, metrics)``."""
    return jax.jit(build_train_step(model, loss_cfg), donate_argnums=(0,) if donate else ())


def make_eval_step(model, loss_cfg: DetectionLossConfig = None, conf_threshold: float = 0.25,
                   iou_threshold: float = 0.45, max_det: int = 300, pre_nms_topk: int = 2048,
                   use_ema: bool = False, loss_fn=None, decode_fn=None,
                   match_thresholds=None, per_class: bool = False,
                   matmul_precision: str = "highest"):
    """Returns jitted ``eval_step(state, batch) -> (metrics, detections)``.

    Detections are fixed-shape (B, max_det, 6) rows of
    [x1, y1, x2, y2, score, label] in normalized coords + a validity mask —
    the on-device equivalent of ``decode_predictions_for_metrics`` + NMS
    (``train_yolo11_cuda.py:265-399``). The reference NMSes every
    above-conf anchor; fixed shapes force a ``pre_nms_topk`` cap here —
    2048 so it does not bind at conf 0.25 on measured trained weights
    (dense @640 scenes reach ~1.5k candidates), with the
    ``prefilter_saturated`` metric reporting when it does.

    ``match_thresholds``: optional IoU-threshold tuple; when set, the step
    also computes greedy TP marks against the batch GT on device
    (``ops.matching``) and returns ``(metrics, detections, tp_marks)`` with
    tp_marks (B, T, max_det) bool — the host then only accumulates AP
    (``utils.metrics.metrics_from_marks``).

    ``per_class``: with ``match_thresholds`` set, additionally return
    class-restricted marks (same shape) as a 4th element — one device pass
    serves every class's AP (``utils.metrics.per_class_from_marks``)
    instead of re-running a matcher per class.

    ``matmul_precision``: precision for the eval forward's matmuls/convs
    (``jax.default_matmul_precision`` names; None = platform default).
    Defaults to ``"highest"``: on TPU the MXU's default bf16-pass f32
    matmuls put ~1.15 px mean Linf jitter on decoded boxes, which flips
    matches at strict IoU thresholds and mis-scores mAP50-95 by ~0.01
    on measured trained weights (docs/H2H.md "eval-forward matmul
    precision"). Validation exists to measure accuracy — it pays the
    ~25% forward cost for exactness; the DEPLOY path (infer.py) keeps
    the fast default.
    """
    from yolo_scratch_tpu.ops.decode import postprocess, postprocess_from_feats

    if loss_fn is None:
        loss_fn = v8_loss_adapter(loss_cfg)
    fused_decode = decode_fn is None  # default v8 Detect layout -> fused path
    if decode_fn is None:
        decode_fn = lambda feats: model.decode(feats)  # (B, A, 4+nc) xywh px + probs

    def step(state: TrainState, batch: Dict[str, Any]):
        if matmul_precision is not None:
            # context managers apply at trace time — everything inside this
            # jitted step traces under the requested precision
            with jax.default_matmul_precision(matmul_precision):
                return _step_body(state, batch)
        return _step_body(state, batch)

    def _step_body(state: TrainState, batch: Dict[str, Any]):
        if use_ema and state.ema_params is not None:
            from yolo_scratch_tpu.train.state import ema_as_tree

            params = ema_as_tree(state.ema_params, state.params)  # flat (N,) -> tree
        else:
            params = state.params
        feats = model.apply(
            {"params": params, "batch_stats": state.batch_stats}, batch["img"], train=False
        )
        total, items = loss_fn(feats, batch)
        img_size = batch["img"].shape[1]
        if fused_decode:
            # select-then-decode: exact, DFL integral on pre_nms_topk rows
            # only. with_cand_count reuses the conf gate it already computed
            # (re-reducing the dense head maps here would double the val
            # step's dominant HBM traffic)
            boxes, scores, labels, valid, cand = postprocess_from_feats(
                feats,  # native dtype — row selection is dtype-exact
                nc=model.nc,
                strides=tuple(float(s) for s in model.strides),
                reg_max=model.reg_max,
                img_size=img_size,
                conf_threshold=conf_threshold,
                iou_threshold=iou_threshold,
                max_det=max_det,
                pre_nms_topk=pre_nms_topk,
                with_cand_count=True,
            )
        else:
            decoded = decode_fn(feats)
            boxes, scores, labels, valid = postprocess(
                decoded,
                img_size=img_size,
                conf_threshold=conf_threshold,
                iou_threshold=iou_threshold,
                max_det=max_det,
                pre_nms_topk=pre_nms_topk,
            )
            cand = jnp.sum(
                jnp.max(decoded[..., 4:], axis=-1) > conf_threshold, axis=-1)
        # Silent-cap observability (no reference counterpart — its NMS is
        # uncapped, train_yolo11_cuda.py:306-331): fraction of images whose
        # above-conf candidate count exceeds the fixed-shape prefilter cap,
        # i.e. where real candidates were dropped before NMS. Measured on
        # trained weights @640 this binds on dense scenes (up to 1476
        # candidates at conf .25) and costs final detections — see
        # docs/H2H.md "the prefilter cap".
        # fraction of REAL images whose candidates exceed the cap: the
        # loader wrap-pads the final short batch with duplicate images, so
        # count only sample_valid rows (a duplicated dense image must not
        # inflate the fraction). Batches are weighted equally by the
        # trainer's metric mean, so a short final batch's real images weigh
        # slightly more than full batches' — acceptable for a warning metric.
        sat = (cand > pre_nms_topk).astype(jnp.float32)
        sv = batch.get("sample_valid")
        if sv is not None:
            svf = sv.astype(jnp.float32)
            sat_frac = jnp.sum(sat * svf) / jnp.maximum(jnp.sum(svf), 1.0)
        else:
            sat_frac = jnp.mean(sat)
        metrics = {"loss": total, **items, "prefilter_saturated": sat_frac}
        if match_thresholds is not None:
            from yolo_scratch_tpu.ops.matching import batched_tp_marks

            # boxes are normalized xyxy (postprocess) — same space as GT
            marks = batched_tp_marks(
                boxes, valid, batch["gt_bboxes"], batch["gt_mask"],
                thresholds=tuple(match_thresholds),
            )
            if per_class:
                marks_cls = batched_tp_marks(
                    boxes, valid, batch["gt_bboxes"], batch["gt_mask"],
                    thresholds=tuple(match_thresholds),
                    pred_labels=labels, gt_labels=batch["gt_labels"],
                )
                return metrics, (boxes, scores, labels, valid), marks, marks_cls
            return metrics, (boxes, scores, labels, valid), marks
        return metrics, (boxes, scores, labels, valid)

    return jax.jit(step)
