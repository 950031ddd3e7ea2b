"""Count above-conf anchors per val image on the transplanted weights.

If any image has > pre_nms_topk (1000) anchors with score > 0.25, the
eval prefilter's top-k cap is CUTTING real candidates the reference's
uncapped NMS keeps — the remaining term behind det-diff's only-reference
detections. Prints the per-image count distribution and the count for
the images det_diff_trace.json flagged.

Usage:
  H2H_ROOT=/tmp/h2h640 H2H_IMGSZ=640 H2H_REF_RUN=/tmp/h2h640/ref_run60 \
      python scripts/probe_conf_count.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.h2h import DATA_DIR, H2H_ROOT, IMGSZ, REF_RUN, _build

CONF = 0.25


def main():
    import jax
    import jax.numpy as jnp

    from yolo_scratch_tpu.utils.torch_import import (
        load_reference_checkpoint,
        merge_pretrained,
    )

    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    model, _, val_loader = _build(str(DATA_DIR))
    params, batch_stats = load_reference_checkpoint(ckpt_path)
    x0 = np.zeros((1, IMGSZ, IMGSZ, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    merged_p, skip_p = merge_pretrained(variables["params"], params)
    merged_b, skip_b = merge_pretrained(variables["batch_stats"], batch_stats)
    assert not (skip_p or skip_b)
    variables = {"params": merged_p, "batch_stats": merged_b}

    @jax.jit
    def n_above(img):
        feats = model.apply(variables, img, train=False)
        decoded = model.decode(feats)  # (B, A, 4+nc)
        scores = jnp.max(decoded[..., 4:], axis=-1)
        return jnp.sum(scores > CONF, axis=-1)

    counts = []
    for batch in val_loader:
        c = np.asarray(n_above(jnp.asarray(batch["img"])))
        sv = np.asarray(batch.get("sample_valid",
                                  np.ones(len(c), bool))).astype(bool)
        counts.extend(int(v) for v in c[sv])
    counts = np.array(counts)
    out = {
        "conf": CONF,
        "images": len(counts),
        "above_conf_per_image": {
            "min": int(counts.min()), "mean": float(counts.mean()),
            "p90": float(np.percentile(counts, 90)), "max": int(counts.max()),
        },
        "images_over_1000": int((counts > 1000).sum()),
        "per_image": counts.tolist(),
    }
    tr = H2H_ROOT / "det_diff_trace.json"
    if tr.exists():
        flagged = sorted({t["image"] for t in json.loads(tr.read_text())["traces"]})
        out["flagged_images"] = {str(i): int(counts[i]) for i in flagged}
    print(json.dumps(out, indent=2))
    (H2H_ROOT / "conf_count.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
