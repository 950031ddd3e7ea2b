"""Deploy-path weight transforms: fold BatchNorm into conv kernels.

The reference relies on cuDNN's runtime conv+BN+SiLU fusion (SURVEY.md §2.1
module-zoo row). Here the inference-time equivalent is algebraic: for every
Conv(bias=False) -> BN pair,

    y = scale * (conv(x, K) - mean) / sqrt(var + eps) + bias
      = conv(x, K * g) + (bias - mean * g),  g = scale / sqrt(var + eps)

so the fused graph is a conv with pre-scaled kernels and BN reduced to a
pure channel bias — XLA then fuses that bias (and the SiLU) into the conv
epilogue. ``fuse_conv_bn`` rewrites the variables in place (no module
changes needed): kernels absorb ``g`` and the BN stats are neutralized
(scale=1, mean=0, var=1-eps -> var+eps=1), leaving only the shifted bias.
Works for any model built from ConvBNAct blocks (YOLO11, YOLOX, legacy).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp


def _fuse_tree(params: Dict[str, Any], stats: Dict[str, Any], eps: float) -> Tuple[dict, dict]:
    new_p: Dict[str, Any] = {}
    new_s: Dict[str, Any] = {}
    keys = set(params) | set(stats)
    for k in keys:
        p = params.get(k)
        s = stats.get(k)
        if isinstance(p, dict) and "conv" in p and "bn" in p and s is not None and "bn" in s:
            kernel = p["conv"]["kernel"]
            scale = p["bn"]["scale"]
            bias = p["bn"]["bias"]
            mean = s["bn"]["mean"]
            var = s["bn"]["var"]
            g = scale / jnp.sqrt(var + eps)
            fused = dict(p)
            fused["conv"] = {**p["conv"], "kernel": kernel * g}  # broadcast over out-ch
            fused["bn"] = {
                "scale": jnp.ones_like(scale),
                "bias": bias - mean * g,
            }
            rest_p, rest_s = _fuse_tree(
                {kk: vv for kk, vv in p.items() if kk not in ("conv", "bn")},
                {kk: vv for kk, vv in s.items() if kk != "bn"},
                eps,
            )
            fused.update(rest_p)
            new_p[k] = fused
            new_s[k] = {
                "bn": {"mean": jnp.zeros_like(mean), "var": jnp.ones_like(var) - eps},
                **rest_s,
            }
        elif isinstance(p, dict) or isinstance(s, dict):
            sub_p, sub_s = _fuse_tree(p or {}, s or {}, eps)
            if sub_p:
                new_p[k] = sub_p
            if sub_s:
                new_s[k] = sub_s
        else:
            if p is not None:
                new_p[k] = p
            if s is not None:
                new_s[k] = s
    return new_p, new_s


def fuse_conv_bn(variables: Dict[str, Any], eps: float = 1e-3) -> Dict[str, Any]:
    """Return variables with every Conv->BN pair folded (inference only).

    The returned tree has the same structure (BN stats neutralized), so it
    drops into the unmodified model's ``apply`` with ``train=False``.
    """
    params, stats = _fuse_tree(variables["params"], variables.get("batch_stats", {}), eps)
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out
