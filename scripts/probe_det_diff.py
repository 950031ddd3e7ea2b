"""Classify the reference-only detections from the det-diff pairing.

``scripts/h2h.py det-diff`` showed our pipeline's detection set on the
transplanted reference weights is a strict subset of the reference
pipeline's (205 matched, 13 only-reference, 0 only-ours @640/60ep). This
probe re-runs both pipelines on the same checkpoint but keeps OUR
candidates down to conf 1e-3, then for every unmatched reference
detection reports the best-IoU candidate in our low-conf set:

- candidate IoU >= 0.5 and score just under 0.25  -> conf-threshold edge
  (forward-numerics: same box, score straddles the cutoff)
- candidate IoU >= 0.5 and score far under 0.25   -> score numerics
- no candidate at IoU >= 0.5                      -> decode/NMS drop
  (suppressed or never a candidate — a pipeline difference, not noise)

Usage (same env contract as scripts/h2h.py):
  H2H_ROOT=/tmp/h2h640 H2H_IMGSZ=640 H2H_REF_RUN=/tmp/h2h640/ref_run60 \
      python scripts/probe_det_diff.py
Writes ``$H2H_ROOT/det_diff_classified.json``.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts.h2h import BATCH, DATA_DIR, H2H_ROOT, IMGSZ, REF_RUN, SEED, VAL_SPLIT, _build


def main():
    import torch
    import yaml

    import jax

    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig
    from yolo_scratch_tpu.utils.torch_import import (
        load_reference_checkpoint,
        merge_pretrained,
    )

    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    print(f"classifying pipeline det-diff on {ckpt_path}")

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
                dec.transpose(1, 2), batch["img"].shape[-1], 0.25, 0.45, "cpu"))

    # --- our detections on the transplanted weights, conf 1e-3 ---
    model, _, val_loader = _build(str(DATA_DIR))
    params, batch_stats = load_reference_checkpoint(ckpt_path)
    tcfg = TrainerConfig(epochs=1, val_conf=1e-3, use_ema=False)
    trainer = Trainer(model, val_loader, val_loader, tcfg, seed=SEED)
    merged_p, skip_p = merge_pretrained(trainer.state.params, params)
    merged_b, skip_b = merge_pretrained(trainer.state.batch_stats, batch_stats)
    if skip_p or skip_b:
        raise RuntimeError(f"transplant skipped keys: {skip_p + skip_b}")
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(np.asarray, merged_p),
        batch_stats=jax.tree_util.tree_map(np.asarray, merged_b),
    )
    our_dets = []
    for batch in val_loader:
        placed = trainer._place(batch)
        out_step = trainer._eval_step(trainer.state, placed)
        boxes, scores, labels, valid = (np.asarray(x) for x in out_step[1])
        B = batch["img"].shape[0]
        sv = np.asarray(batch.get("sample_valid", np.ones(B, bool))).astype(bool)
        for b in range(B):
            if not sv[b]:
                continue
            keep = valid[b].astype(bool)
            our_dets.append({
                "boxes": boxes[b][keep].astype(np.float64),
                "scores": scores[b][keep].astype(np.float64),
                "labels": labels[b][keep].astype(np.int64),
            })
    assert len(ref_dets) == len(our_dets) == n_val, (len(ref_dets), len(our_dets), n_val)

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

    # replicate det-diff's pairing at conf>=0.25 on our side, then probe
    # each unmatched reference det against our FULL low-conf candidate set
    unmatched = []
    for img_i, (rd, od) in enumerate(zip(ref_dets, our_dets)):
        rb = rd["boxes"].numpy().astype(np.float64)
        rs = rd["scores"].numpy().astype(np.float64)
        rl = rd["labels"].numpy()
        hi = od["scores"] >= 0.25
        M_hi = iou_mat(rb, od["boxes"][hi])
        used = np.zeros(int(hi.sum()), bool)
        matched_ref = np.zeros(len(rb), bool)
        for i in np.argsort(-rs):
            if M_hi.shape[1] == 0:
                break
            j = int(np.argmax(np.where(used, -1.0, M_hi[i])))
            if not used[j] and M_hi[i, j] >= 0.5:
                used[j] = True
                matched_ref[i] = True
        M_lo = iou_mat(rb, od["boxes"])  # all candidates, conf>=1e-3
        for i in np.where(~matched_ref)[0]:
            if M_lo.shape[1]:
                j = int(np.argmax(M_lo[i]))
                cand = {"iou": float(M_lo[i, j]),
                        "our_score": float(od["scores"][j]),
                        "our_label": int(od["labels"][j]),
                        "same_label": bool(int(od["labels"][j]) == int(rl[i]))}
            else:
                cand = {"iou": 0.0, "our_score": 0.0, "our_label": -1,
                        "same_label": False}
            kind = ("conf_edge" if cand["iou"] >= 0.5 and cand["our_score"] >= 0.20
                    else "score_numerics" if cand["iou"] >= 0.5
                    else "decode_nms_drop")
            unmatched.append({"image": img_i, "ref_score": float(rs[i]),
                              "ref_label": int(rl[i]),
                              "ref_box_px": [float(x * IMGSZ) for x in rb[i]],
                              "best_candidate": cand, "class": kind})

    by_kind = {}
    for u in unmatched:
        by_kind[u["class"]] = by_kind.get(u["class"], 0) + 1
    out = {"checkpoint": ckpt_path, "unmatched_reference": len(unmatched),
           "by_class": by_kind, "details": unmatched}
    (H2H_ROOT / "det_diff_classified.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
