"""The eval-precision cell of the H2H decomposition matrix.

det-diff at pre_nms_topk=2048 shows our pipeline and the reference's
produce the SAME detection set from the same weights (218:218 paired,
zero unmatched) — but matched pairs still differ by ~1.15 px mean Linf at
default TPU matmul precision (bf16 MXU passes on the f32 eval forward),
and at strict IoU thresholds (0.8-0.95) pixel-level jitter flips matches.
This probe scores, at the CURRENT global matmul precision:

  (a) the reference's trained weights transplanted into our stack
  (b) our own last checkpoint

Run once per precision and difference the cells:
  JAX_DEFAULT_MATMUL_PRECISION=highest python scripts/probe_eval_precision.py
  python scripts/probe_eval_precision.py          # default precision

Writes ``$H2H_ROOT/eval_precision_<prec>.json``.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.h2h import DATA_DIR, H2H_ROOT, REF_RUN, SEED, TPU_RUN, _build


def main():
    import jax

    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig
    from yolo_scratch_tpu.utils.torch_import import (
        load_reference_checkpoint,
        merge_pretrained,
    )

    prec = os.environ.get("JAX_DEFAULT_MATMUL_PRECISION", "default")
    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    model, _, val_loader = _build(str(DATA_DIR))
    cfg = TrainerConfig(epochs=1, val_conf=0.25, use_ema=False)
    trainer = Trainer(model, val_loader, val_loader, cfg, seed=SEED)

    out = {"matmul_precision": prec, "pre_nms_topk": cfg.pre_nms_topk}

    # (a) transplanted reference weights
    params, batch_stats = load_reference_checkpoint(ckpt_path)
    merged_p, skip_p = merge_pretrained(trainer.state.params, params)
    merged_b, skip_b = merge_pretrained(trainer.state.batch_stats, batch_stats)
    assert not (skip_p or skip_b)
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(np.asarray, merged_p),
        batch_stats=jax.tree_util.tree_map(np.asarray, merged_b),
    )
    out["transplant"] = {k: float(v) for k, v in trainer.validate().items()}
    print("transplant:", json.dumps(out["transplant"]))

    # (b) our last checkpoint — same compiled program, new weights
    mgr = CheckpointManager(str(TPU_RUN))
    state, _, _, _ = mgr.try_resume(trainer.state, name="last")
    trainer.state = state
    out["ours_last"] = {k: float(v) for k, v in trainer.validate().items()}
    print("ours_last:", json.dumps(out["ours_last"]))

    path = H2H_ROOT / f"eval_precision_{prec}.json"
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
