"""Post-training int8 quantization for the deploy path.

TPU v5e runs int8 matmul/conv at 2x the bf16 MXU rate (394 TOPS vs 197
TFLOPS), so weight+activation int8 is the next rung on the serving-speed
ladder after BN folding and bf16. The reference has no quantization story
(SURVEY.md L0: plain fp32 torch + cuDNN); this tier is TPU-native extra
capability.

Scheme — the standard PTQ recipe, chosen for exactness of implementation
rather than calibration sophistication:

* **symmetric, zero-point-free** everywhere: conv zero-padding and the
  residual-add identity stay exact, and the dequant epilogue is a single
  per-channel multiply that XLA fuses into the conv's consumer.
* **weights**: per-output-channel absmax over the BN-folded kernel
  (folding first matters: BN gain is absorbed into the kernel, so the
  int8 grid covers the tensor actually convolved at deploy time).
* **activations**: per-tensor absmax observed over calibration batches
  (each ``ConvBNAct`` sows its conv input's absmax into a ``"calib"``
  collection; see nn/modules.py).
* **coverage**: every ``ConvBNAct`` in the graph (YOLO11 builder family,
  YOLOX, legacy — they all share the block). The Detect/YOLOX-head final
  1x1 prediction convs are plain ``nn.Conv`` and deliberately stay in
  bf16/f32 — quantizing the logits layer is where PTQ accuracy usually
  dies, and those convs are a rounding error of total FLOPs.

Usage::

    variables = quantize_for_deploy(model, variables, calib_batches)
    pred = Predictor(model, variables, cfg)   # picks up the "quant" tree

`skip` rejects individual blocks by path, e.g. ``skip=lambda p: p[:2] ==
("layer_0",)`` to keep the stem in bf16.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def calibrate_absmax(model, variables: Dict[str, Any], batches: Iterable) -> Dict[str, Any]:
    """Run calibration batches; return the per-block input-absmax tree.

    The returned tree mirrors the module hierarchy with an ``absmax`` leaf
    at every ConvBNAct scope (running max across all batches).
    """

    @jax.jit
    def _run(v, x):
        _, mut = model.apply(v, x, train=False, mutable=["calib"])
        return mut["calib"]

    acc: Optional[Dict[str, Any]] = None
    for x in batches:
        got = jax.device_get(_run(variables, x))
        acc = got if acc is None else jax.tree_util.tree_map(np.maximum, acc, got)
    if acc is None:
        raise ValueError("calibrate_absmax: no calibration batches supplied")
    return acc


def calibrate_quantile(
    model, variables: Dict[str, Any], batches: Iterable, q: float = 0.999
) -> Dict[str, Any]:
    """Percentile calibration: per-block q-quantile of |conv input|.

    absmax calibration (the default) is outlier-fragile — one hot pixel
    stretches the int8 grid for the whole tensor. This variant clips the
    top (1-q) tail instead (values beyond the scale saturate at +-127,
    which symmetric quantization handles gracefully). Returns the same
    ``absmax``-leaf tree shape as :func:`calibrate_absmax` (max over
    batches of per-batch quantiles — conservative), so
    :func:`build_quant_tree` consumes either interchangeably.

    Mounts the ``calib_full`` collection (every ConvBNAct sows its full
    conv input), so use small dedicated calibration batches.
    """

    def _quant_tree(calib_full):
        # leaves are 1-tuples (sow's default append); quantile on device
        return jax.tree_util.tree_map(
            lambda t: jnp.quantile(jnp.abs(t[0]), q),
            calib_full, is_leaf=lambda t: isinstance(t, tuple))

    @jax.jit
    def _run(v, x):
        _, mut = model.apply(v, x, train=False, mutable=["calib_full"])
        return _quant_tree(mut["calib_full"])

    acc: Optional[Dict[str, Any]] = None
    for x in batches:
        got = jax.device_get(_run(variables, x))
        acc = got if acc is None else jax.tree_util.tree_map(np.maximum, acc, got)
    if acc is None:
        raise ValueError("calibrate_quantile: no calibration batches supplied")
    # rename leaves: {"x": val} -> {"absmax": val} so build_quant_tree
    # consumes the tree unchanged

    def _rename(node):
        if isinstance(node, dict):
            return {("absmax" if k == "x" else k): _rename(v) for k, v in node.items()}
        return node

    return _rename(acc)


def _quantize_kernel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8: kernel (k,k,ci,co) -> (w_q, s_w)."""
    k = np.asarray(kernel, np.float32)
    absmax = np.max(np.abs(k), axis=(0, 1, 2))  # (co,)
    s_w = np.maximum(absmax, 1e-12) / 127.0
    w_q = np.clip(np.round(k / s_w), -127, 127).astype(np.int8)
    return w_q, s_w.astype(np.float32)


def build_quant_tree(
    params: Dict[str, Any],
    calib: Dict[str, Any],
    skip: Optional[Callable[[Tuple[str, ...]], bool]] = None,
    _path: Tuple[str, ...] = (),
) -> Dict[str, Any]:
    """calib absmax tree + (folded) params -> the ``"quant"`` collection.

    A calib node holding ``absmax`` marks a ConvBNAct scope; its kernel
    lives at the same path under ``params`` as ``conv/kernel``.
    """
    out: Dict[str, Any] = {}
    if "absmax" in calib and isinstance(params, dict) and "conv" in params:
        # this scope is a ConvBNAct (it sowed its input absmax)
        if not (skip is not None and skip(_path)):
            kernel = params["conv"].get("kernel")
            if kernel is not None:
                absmax = float(np.asarray(calib["absmax"]))
                w_q, s_w = _quantize_kernel(kernel)
                out["w_q"] = jnp.asarray(w_q)
                out["s_w"] = jnp.asarray(s_w)
                out["s_act"] = jnp.float32(max(absmax, 1e-12) / 127.0)
    for key, node in calib.items():
        if key == "absmax" or not isinstance(node, dict):
            continue
        sub_params = params.get(key, {}) if isinstance(params, dict) else {}
        sub = build_quant_tree(sub_params, node, skip, _path + (key,))
        if sub:
            out[key] = sub
    return out


def quantize_for_deploy(
    model,
    variables: Dict[str, Any],
    calib_batches: Sequence,
    skip: Optional[Callable[[Tuple[str, ...]], bool]] = None,
    quantile: Optional[float] = None,
) -> Dict[str, Any]:
    """BN-fold, calibrate, and attach the int8 ``"quant"`` collection.

    Returns variables ready for ``model.apply(..., train=False)`` /
    ``Predictor``: params BN-folded (idempotent if already folded), plus a
    ``"quant"`` tree that flips every covered ConvBNAct to the int8 path.
    ``quantile`` (e.g. 0.999) switches activation calibration from absmax
    to percentile clipping (outlier-robust; see :func:`calibrate_quantile`).
    """
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn

    fused = fuse_conv_bn(variables)
    if quantile is not None:
        calib = calibrate_quantile(model, fused, calib_batches, q=quantile)
    else:
        calib = calibrate_absmax(model, fused, calib_batches)
    quant = build_quant_tree(fused["params"], calib, skip=skip)
    out = dict(fused)
    out["quant"] = quant
    return out


def prepare_calib_batches(predictor, paths: Sequence[str], max_batches: int) -> list:
    """Host-prep calibration batches exactly as the Predictor serves them.

    Uses the predictor's own ``_prepare`` (letterbox/stretch per its
    config) and mirrors ``Predictor._infer``'s in-jit normalization
    (uint8 transfer -> /255). Shared by the infer and serve CLIs so the
    two calibration paths cannot drift.
    """
    B = predictor.cfg.batch_size
    batches = []
    for i in range(0, min(len(paths), max_batches * B), B):
        chunk = list(paths[i:i + B])
        chunk = chunk + [chunk[-1]] * (B - len(chunk))
        imgs, _ = predictor._prepare(chunk)
        x = np.asarray(imgs, np.float32)
        batches.append(x / 255.0 if imgs.dtype == np.uint8 else x)
    return batches


def count_quantized(quant: Dict[str, Any]) -> int:
    """Number of ConvBNAct blocks covered by a quant tree."""
    n = 0
    for v in quant.values():
        if isinstance(v, dict):
            n += (1 if "w_q" in v else 0) + count_quantized(
                {k: s for k, s in v.items() if isinstance(s, dict)}
            )
    return n
