"""Model summary: parameter counts and XLA-computed FLOPs.

API-parity with reference ``YOLOv11.info`` (``models/yolo11_model.py:
231-252``), which counts params and asks thop for GFLOPs. Here FLOPs come
from XLA's own cost analysis of the compiled forward — exact for the graph
actually executed, no tracing heuristics.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax


def count_params(params: Any) -> int:
    return int(sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params)))


def model_info(
    model,
    variables: Optional[Dict] = None,
    img_size: int = 640,
    channels: Optional[int] = None,
    verbose: bool = False,
) -> Dict[str, float]:
    """Returns {'params', 'params_m', 'gflops'} for a single-image forward.

    ``gflops`` follows the reference/thop convention (multiply-accumulate
    counted once; XLA reports fused FLOPs which align closely).
    """
    ch = channels if channels is not None else getattr(model, "in_ch", 3)
    x = np.zeros((1, img_size, img_size, ch), np.float32)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), x)
    n_params = count_params(variables["params"])

    fwd = jax.jit(lambda v, xi: model.apply(v, xi, train=False))
    cost = fwd.lower(variables, x).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    info = {
        "params": n_params,
        "params_m": n_params / 1e6,
        "gflops": flops / 1e9,
    }
    if verbose:
        print(
            f"Model Summary: {n_params:,} parameters ({info['params_m']:.2f}M), "
            f"{info['gflops']:.1f} GFLOPs @ {img_size}x{img_size}"
        )
    return info
