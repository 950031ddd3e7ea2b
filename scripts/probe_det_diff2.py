"""Trace WHERE our prediction pipeline loses the reference-only detections.

probe_det_diff.py showed the 13-14 only-reference detections (det-diff on
identical transplanted weights @640) are absent from our POST-NMS set even
at conf 1e-3, while matched pairs agree to ~5e-5 px at matmul precision
'highest' — so the loss is inside selection/NMS, not forward numerics.
This probe dumps our PRE-NMS candidate set per val image and, for every
missing reference detection, reports:

- the best-IoU pre-NMS candidate (exists? score? IoU?)
- if it exists and scores > conf: its keep status after our NMS sweep and
  the kept box that suppressed it (IoU with the suppressor as OUR pipeline
  computed it, the number compared against the 0.45 threshold)

Run with JAX_DEFAULT_MATMUL_PRECISION=highest to hold forward numerics
fixed at the already-validated pair-exact level.

Usage:
  H2H_ROOT=/tmp/h2h640 H2H_IMGSZ=640 H2H_REF_RUN=/tmp/h2h640/ref_run60 \
      JAX_DEFAULT_MATMUL_PRECISION=highest python scripts/probe_det_diff2.py
Writes ``$H2H_ROOT/det_diff_trace.json``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.h2h import BATCH, DATA_DIR, H2H_ROOT, IMGSZ, REF_RUN, SEED, VAL_SPLIT, _build

CONF = 0.25
IOU_NMS = 0.45


def main():
    import torch
    import yaml

    import jax
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.decode import _prefilter_batched
    from yolo_scratch_tpu.ops.nms import nms
    from yolo_scratch_tpu.utils.torch_import import (
        load_reference_checkpoint,
        merge_pretrained,
    )

    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    print(f"tracing suppression on {ckpt_path}")

    # --- reference detections (corrected decode, as in h2h.py eval-ref) ---
    sys.path.insert(0, "/root/reference/yolo_scratch_cuda")
    from torch.utils.data import DataLoader, Subset

    from datasets.crater_dataset_cuda import CraterDatasetCUDA, collate_fn_cuda
    from models.yolo11_model import build_yolo11 as ref_build
    from train_yolo11_cuda import decode_predictions_for_metrics

    cfg = yaml.safe_load(open("/root/reference/yolo_scratch_cuda/configs/yolo11n_crater.yaml"))
    cfg["scale"] = "n"
    ref_model = ref_build(cfg=cfg, ch=1, nc=5)
    ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    ref_model.load_state_dict(ck["model_state_dict"])
    ref_model.eval()
    dfl_conv = ref_model.model[-1].dfl.conv
    c1 = dfl_conv.weight.shape[1]
    dfl_conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(1, c1, 1, 1)

    ds = CraterDatasetCUDA(str(DATA_DIR), img_size=IMGSZ, cache_images=False, augment=False)
    n = len(ds)
    n_val = int(n * VAL_SPLIT)
    perm = torch.randperm(n, generator=torch.Generator().manual_seed(SEED)).tolist()
    dl = DataLoader(Subset(ds, perm[n - n_val:]), batch_size=BATCH, shuffle=False,
                    collate_fn=collate_fn_cuda)
    ref_dets = []
    with torch.no_grad():
        for batch in dl:
            dec = ref_model(batch["img"])[0]
            ref_dets.extend(decode_predictions_for_metrics(
                dec.transpose(1, 2), batch["img"].shape[-1], CONF, IOU_NMS, "cpu"))

    # --- our PRE-NMS candidates + keep mask on the transplanted weights ---
    model, _, val_loader = _build(str(DATA_DIR))
    params, batch_stats = load_reference_checkpoint(ckpt_path)
    x0 = np.zeros((1, IMGSZ, IMGSZ, 1), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    merged_p, skip_p = merge_pretrained(variables["params"], params)
    merged_b, skip_b = merge_pretrained(variables["batch_stats"], batch_stats)
    if skip_p or skip_b:
        raise RuntimeError(f"transplant skipped keys: {skip_p + skip_b}")
    variables = {"params": merged_p, "batch_stats": merged_b}

    @jax.jit
    def pre_and_keep(img):
        feats = model.apply(variables, img, train=False)
        decoded = model.decode(feats)  # (B, A, 4+nc) xywh px + probs
        boxes, scores, labels, valid = _prefilter_batched(
            decoded, conf_threshold=CONF, pre_nms_topk=1000)
        keep = jax.vmap(
            lambda b, s, v, c: nms(b, s, iou_threshold=IOU_NMS, max_det=300,
                                   valid=v, class_ids=c, class_aware=False,
                                   presorted=True)
        )(boxes, scores, valid, labels)
        return boxes, scores, labels, valid, keep

    ours = []  # per val image dict of pre-NMS candidates + keep
    for batch in val_loader:
        img = jnp.asarray(batch["img"])
        boxes, scores, labels, valid, keep = (np.asarray(t)
                                              for t in pre_and_keep(img))
        B = batch["img"].shape[0]
        sv = np.asarray(batch.get("sample_valid", np.ones(B, bool))).astype(bool)
        for b in range(B):
            if not sv[b]:
                continue
            m = valid[b].astype(bool)
            ours.append({"boxes": boxes[b][m] / IMGSZ,  # normalized like ref
                         "scores": scores[b][m],
                         "labels": labels[b][m],
                         "keep": keep[b][m].astype(bool)})
    assert len(ref_dets) == len(ours) == n_val, (len(ref_dets), len(ours), n_val)

    def iou_mat(a, b):
        if len(a) == 0 or len(b) == 0:
            return np.zeros((len(a), len(b)))
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)

    traces = []
    for img_i, (rd, od) in enumerate(zip(ref_dets, ours)):
        rb = rd["boxes"].numpy().astype(np.float64)
        rs = rd["scores"].numpy().astype(np.float64)
        ob, os_, ok = od["boxes"].astype(np.float64), od["scores"], od["keep"]
        kept_b, kept_s = ob[ok], os_[ok]
        # pair ref dets against OUR KEPT set (mirrors det-diff)
        M_kept = iou_mat(rb, kept_b)
        used = np.zeros(len(kept_b), bool)
        matched_ref = np.zeros(len(rb), bool)
        for i in np.argsort(-rs):
            if M_kept.shape[1] == 0:
                break
            j = int(np.argmax(np.where(used, -1.0, M_kept[i])))
            if not used[j] and M_kept[i, j] >= 0.5:
                used[j] = True
                matched_ref[i] = True
        M_pre = iou_mat(rb, ob)
        for i in np.where(~matched_ref)[0]:
            t = {"image": img_i, "ref_score": float(rs[i]),
                 "ref_box": [float(v) for v in rb[i]]}
            if M_pre.shape[1] == 0 or float(M_pre[i].max()) < 0.5:
                t["verdict"] = "absent_pre_nms"
                t["best_pre_iou"] = float(M_pre[i].max()) if M_pre.shape[1] else 0.0
            else:
                j = int(np.argmax(M_pre[i]))
                t["pre_candidate"] = {"score": float(os_[j]),
                                      "iou_with_ref": float(M_pre[i, j]),
                                      "kept": bool(ok[j])}
                if ok[j]:
                    t["verdict"] = "kept_but_unpaired"  # pairing artifact
                else:
                    # who killed it: highest-IoU KEPT box with higher score
                    higher = kept_s > os_[j]
                    if higher.any():
                        K = iou_mat(ob[j:j + 1], kept_b[higher])[0]
                        kk = int(np.argmax(K))
                        t["suppressor"] = {
                            "iou_with_victim": float(K[kk]),
                            "score": float(kept_s[higher][kk]),
                        }
                    t["verdict"] = "suppressed"
            traces.append(t)

    by = {}
    for t in traces:
        by[t["verdict"]] = by.get(t["verdict"], 0) + 1
    out = {"checkpoint": ckpt_path, "unmatched_reference": len(traces),
           "by_verdict": by, "traces": traces}
    (H2H_ROOT / "det_diff_trace.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
