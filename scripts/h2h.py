"""Head-to-head accuracy harness: torch reference vs this framework.

No COCO or real crater data exists in this environment (zero egress), so
the accuracy half of the north star ("mAP within 0.3 of the reference") is
measured on a generated crater dataset (``scripts/gen_crater_synth.py``)
written in the reference's on-disk layout. Both frameworks consume
identical pixels, the identical train/val split (the reference's
``torch.randperm(generator=manual_seed(42))`` split,
``train_yolo11_cuda.py:494-505``) and matched hyperparameters
(AdamW lr 1e-3 / wd 5e-4, cosine schedule with 3 warmup epochs, clip 10,
batch 8, no augmentation, no EMA — the reference has neither).

Subcommands:
  train-tpu    train this framework on the identical split/recipe
  transplant   import the reference's trained ``best.pt`` into our model
               and score it with OUR evaluator on the same val images
               (evaluator-level parity on real trained weights)
  report       collect both runs into docs/H2H.md + H2H.json

Typical sequence (reference training runs separately, see docs/H2H.md):
  python scripts/gen_crater_synth.py --out /tmp/h2h/data --n 150 --img-size 320
  (reference) python train_yolo11_cuda.py --data /tmp/h2h/data --device cpu ...
  python scripts/h2h.py train-tpu
  python scripts/h2h.py transplant
  python scripts/h2h.py report
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

# Env-parameterized so the same harness runs the full-resolution variant
# (H2H_ROOT=/tmp/h2h640 H2H_IMGSZ=640 H2H_EPOCHS=30 ... -> H2H640.json):
H2H_ROOT = Path(os.environ.get("H2H_ROOT", "/tmp/h2h"))
DATA_DIR = H2H_ROOT / "data"
REF_RUN = Path(os.environ.get("H2H_REF_RUN", str(H2H_ROOT / "ref_run")))
# H2H_TPU_RUN: separate run dirs for the precision-frontier arms (round 5)
# so bf16-mixed / f32-high / highest runs coexist under one H2H_ROOT.
TPU_RUN = Path(os.environ.get("H2H_TPU_RUN", str(H2H_ROOT / "tpu_run")))

EPOCHS = int(os.environ.get("H2H_EPOCHS", "60"))
BATCH = int(os.environ.get("H2H_BATCH", "8"))
IMGSZ = int(os.environ.get("H2H_IMGSZ", "320"))
OUT_JSON = os.environ.get("H2H_OUT", "H2H.json")
LR = 1e-3
WD = 5e-4
VAL_SPLIT = 0.2
SEED = 42


def reference_split(data_dir: str):
    """The reference's exact sample ordering and train/val split.

    Imports the reference dataset class so the img_path ordering (unsorted
    ``glob.glob`` + pandas groupby) is exactly what its trainer saw, then
    reproduces the seeded ``torch.randperm`` split (:494-505).
    Returns (train_paths, val_paths) as lists of absolute image paths —
    path-keyed so it can be mapped onto any loader's index space.
    """
    import torch

    sys.path.insert(0, "/root/reference/yolo_scratch_cuda")
    from datasets.crater_dataset_cuda import CraterDatasetCUDA  # noqa: E501

    ref_ds = CraterDatasetCUDA(data_dir, img_size=IMGSZ, cache_images=False, augment=False)
    paths = [s["img_path"] for s in ref_ds.samples]
    n = len(paths)
    n_val = int(n * VAL_SPLIT)
    perm = torch.randperm(n, generator=torch.Generator().manual_seed(SEED)).tolist()
    train_paths = [paths[i] for i in perm[: n - n_val]]
    val_paths = [paths[i] for i in perm[n - n_val:]]
    return train_paths, val_paths


def our_indices_for(paths, ds):
    """Map reference img_paths onto our CraterDataset's index space."""
    by_path = {str(Path(s["img_path"]).resolve()): i for i, s in enumerate(ds.samples)}
    idx = np.array([by_path[str(Path(p).resolve())] for p in paths], np.int64)
    return idx


def _build(data_dir: str):
    from yolo_scratch_tpu.data.crater import CraterDataset
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.models.builder import build_yolo11

    ds = CraterDataset(data_dir, img_size=IMGSZ)
    train_paths, val_paths = reference_split(data_dir)
    train_idx = our_indices_for(train_paths, ds)
    val_idx = our_indices_for(val_paths, ds)
    print(f"train {len(train_idx)} / val {len(val_idx)} images (reference split, seed {SEED})")

    train_loader = Loader(ds, BATCH, max_gt=32, shuffle=True, seed=SEED, indices=train_idx)
    val_loader = Loader(ds, BATCH, max_gt=32, indices=val_idx)
    cfg_path = Path(__file__).parent.parent / "yolo_scratch_tpu/configs/yolo11_crater.yaml"
    model = build_yolo11(str(cfg_path), ch=1, nc=5, scale="n")
    return model, train_loader, val_loader


def cmd_train_tpu(args):
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    model, train_loader, val_loader = _build(args.data)
    # H2H_TRAIN_PRECISION: matmul precision for the TRAIN step (the
    # precision-bisect arms of docs/H2H.md — 'highest' closed the 640
    # training-side gap; '' = platform default, what the headline arm
    # ran). Eval stays exact either way (TrainerConfig.
    # val_matmul_precision defaults to 'highest').
    train_prec = os.environ.get("H2H_TRAIN_PRECISION") or None
    # H2H_MIXED=1: the bf16-mixed frontier arm (round 5) — the training
    # throughput headline's own mode (bf16 fwd/bwd, f32 master weights),
    # whose 640 accuracy was previously unmeasured.
    mixed = os.environ.get("H2H_MIXED", "") == "1"
    # H2H_TRAIN_SEED: trainer init/shuffle seed override (split stays the
    # reference's seed-42). A repeat of an arm at a different train seed
    # prices run-to-run variance — the error bar the precision-frontier
    # deltas must clear before a mode difference is called real.
    train_seed = int(os.environ.get("H2H_TRAIN_SEED", str(SEED)))
    cfg = TrainerConfig(
        epochs=EPOCHS, lr=LR, weight_decay=WD, warmup_epochs=3, clip_norm=10.0,
        val_conf=0.25, save_dir=str(TPU_RUN), use_ema=False,
        train_matmul_precision=train_prec, mixed_precision=mixed,
    )
    trainer = Trainer(model, train_loader, val_loader, cfg, seed=train_seed)
    result = trainer.fit(resume=args.resume)
    best = max(
        (h["val"] for h in result["history"] if h["val"]),
        key=lambda v: v.get("mAP50-95", 0.0),
        default={},
    )
    out = {
        "framework": "yolo_scratch_tpu",
        "train_matmul_precision": train_prec or "default",
        "mixed_precision": mixed,
        "train_seed": train_seed,
        "epochs": EPOCHS, "batch": BATCH, "imgsz": IMGSZ, "lr": LR,
        "best_mAP50": result["best_mAP50"],
        "best_epoch_val": best,
        "final_val": result["history"][-1]["val"] if result["history"] else {},
    }
    (TPU_RUN / "result.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def cmd_eval_ref(args):
    """Score the reference's trained weights through the REFERENCE's own
    decode + evaluate_detections — with its eval-path shape bug corrected.

    Two reference eval-path bugs (both documented in PARITY.md) make its
    reported accuracy 0.0 regardless of model quality; this command scores
    the same trained weights with them corrected in the harness:

    1. Shape bug: ``Detect.inference`` returns (B, 4+nc, A)
       (``models/yolo11_modules.py:248-266``) but
       ``decode_predictions_for_metrics`` indexes it as (B, A, 4+nc)
       (``train_yolo11_cuda.py:289-304``) — labels become anchor indices,
       scores become box coordinates. Fix: transpose before decode.
    2. DFL init bug: ``_initialize_weights`` kaiming-reinitializes every
       Conv2d including DFL's frozen arange conv
       (``yolo11_model.py:179-182`` vs ``yolo11_modules.py:185-187``), so
       eval-time box decode uses random bin weights (training uses
       separate softmax-arange math and is unaffected). Fix: restore the
       arange weight after load.

    All three tiers are recorded: as-shipped (0.0), transpose-only, and
    transpose+DFL corrected (the model's true quality).
    """
    import torch
    import yaml

    sys.path.insert(0, "/root/reference/yolo_scratch_cuda")
    from torch.utils.data import DataLoader, Subset

    from datasets.crater_dataset_cuda import CraterDatasetCUDA, collate_fn_cuda
    from models.yolo11_model import build_yolo11 as ref_build
    from train_yolo11_cuda import decode_predictions_for_metrics
    from utils.metrics import evaluate_detections as ref_eval

    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    cfg = yaml.safe_load(open("/root/reference/yolo_scratch_cuda/configs/yolo11n_crater.yaml"))
    cfg["scale"] = "n"
    model = ref_build(cfg=cfg, ch=1, nc=5)
    ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    model.load_state_dict(ck["model_state_dict"])
    model.eval()

    ds = CraterDatasetCUDA(args.data, img_size=IMGSZ, cache_images=False, augment=False)
    n = len(ds)
    n_val = int(n * VAL_SPLIT)
    perm = torch.randperm(n, generator=torch.Generator().manual_seed(SEED)).tolist()
    dl = DataLoader(Subset(ds, perm[n - n_val:]), batch_size=BATCH, shuffle=False,
                    collate_fn=collate_fn_cuda)

    def score(fix_dfl: bool):
        if fix_dfl:
            dfl_conv = model.model[-1].dfl.conv
            c1 = dfl_conv.weight.shape[1]
            dfl_conv.weight.data[:] = torch.arange(c1, dtype=torch.float).view(1, c1, 1, 1)
        all_preds, all_targets = [], []
        with torch.no_grad():
            for batch in dl:
                dec = model(batch["img"])[0]  # (B, 4+nc, A) as shipped
                preds = decode_predictions_for_metrics(
                    dec.transpose(1, 2), batch["img"].shape[-1], 0.25, 0.45, "cpu"
                )
                all_preds.extend(preds)
                for b in range(batch["img"].shape[0]):
                    m = (batch["batch_idx"] == b)
                    all_targets.append({
                        "boxes": batch["bboxes"][m],
                        "labels": batch["cls"][m].flatten().long(),
                    })
        metrics = ref_eval(all_preds, all_targets, conf_threshold=0.25, iou_threshold=0.5)
        return {k: float(v) for k, v in metrics.items()}

    transpose_only = score(fix_dfl=False)
    fully_corrected = score(fix_dfl=True)
    out = {
        "checkpoint": ckpt_path,
        "epochs_trained": int(ck.get("epoch", -1)) + 1,
        "as_shipped_val_metrics": {k: float(v) for k, v in ck.get("val_metrics", {}).items()},
        "transpose_corrected_metrics": transpose_only,
        "fully_corrected_metrics": fully_corrected,
        "note": "as-shipped eval reads the decode transposed AND decodes boxes "
                "with a kaiming-randomized DFL conv; fully_corrected fixes both "
                "in the harness (reference code untouched)",
    }
    (H2H_ROOT / "ref_eval.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def cmd_transplant(args):
    import jax
    import optax

    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig
    from yolo_scratch_tpu.utils.torch_import import load_reference_checkpoint, merge_pretrained

    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    print(f"transplanting {ckpt_path}")
    import torch

    ref_ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    ref_val = {k: float(v) for k, v in ref_ckpt.get("val_metrics", {}).items()}

    model, _, val_loader = _build(args.data)
    params, batch_stats = load_reference_checkpoint(ckpt_path)
    cfg = TrainerConfig(epochs=1, val_conf=0.25, use_ema=False)
    trainer = Trainer(model, val_loader, val_loader, cfg, seed=SEED)
    merged_p, skip_p = merge_pretrained(trainer.state.params, params)
    merged_b, skip_b = merge_pretrained(trainer.state.batch_stats, batch_stats)
    if skip_p or skip_b:
        raise RuntimeError(f"transplant skipped keys: {skip_p + skip_b}")
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(np.asarray, merged_p),
        batch_stats=jax.tree_util.tree_map(np.asarray, merged_b),
    )
    ours = trainer.validate()
    out = {
        "checkpoint": ckpt_path,
        "reference_val_metrics": ref_val,
        "ours_on_transplanted_weights": {k: float(v) for k, v in ours.items()},
    }
    (H2H_ROOT / "transplant.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def cmd_eval_ours(args):
    """Re-score OUR saved best/last checkpoints through the CURRENT
    evaluator and rewrite result.json's val rows.

    Exists because evaluator fixes can postdate the training run: the
    round-4 prefilter-cap fix (pre_nms_topk 1000 -> 2048; the old cap
    silently dropped candidates on dense @640 scenes) changes the scored
    mAP of already-trained weights. Checkpoint selection (which epoch is
    'best') is NOT revisited — only the recorded scores of the two saved
    checkpoints. The losses are re-measured too (same weights, same data:
    they come out identical).
    """
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    model, _, val_loader = _build(args.data)
    cfg = TrainerConfig(epochs=1, val_conf=0.25, use_ema=False)
    trainer = Trainer(model, val_loader, val_loader, cfg, seed=SEED)
    mgr = CheckpointManager(str(TPU_RUN))
    result = json.loads((TPU_RUN / "result.json").read_text())
    # only 'last' maps onto an existing report row (final_val IS the last
    # epoch). The saved 'best' checkpoint is mAP50-GATED — a different
    # epoch than best_epoch_val (history max over mAP50-95) — so its
    # rescore goes under its own key instead of silently replacing a row
    # that means something else.
    for name, key in (("best", "best_ckpt_mAP50_gated_rescored"),
                      ("last", "final_val")):
        # try_resume silently returns the PASSED-IN state when the meta
        # sidecar is missing — which here is a fresh random init. Scoring
        # that would overwrite result.json rows with plausible-looking
        # garbage; refuse instead.
        if not (TPU_RUN / f"{name}.meta.json").exists():
            raise SystemExit(
                f"no {name!r} checkpoint in {TPU_RUN} ({name}.meta.json "
                "missing) — refusing to rescore an unrestored (random-init) "
                "state into result.json")
        state, _, _, _ = mgr.try_resume(trainer.state, name=name)
        trainer.state = state
        scores = {k: float(v) for k, v in trainer.validate().items()}
        print(f"{name}: {json.dumps(scores)}")
        result[key] = scores
    result["rescored_note"] = (
        f"final_val re-scored through the evaluator at pre_nms_topk="
        f"{cfg.pre_nms_topk} (prefilter-cap fix); best_epoch_val remains "
        "the training-time history max over mAP50-95 (its checkpoint was "
        "not retained — only the mAP50-gated best is)")
    (TPU_RUN / "result.json").write_text(json.dumps(result, indent=2))
    print("result.json updated")


def cmd_cross_eval(args):
    """Score OUR trained detections through the REFERENCE's (corrected)
    evaluator — the decomposition experiment for the strict-IoU offset.

    The golden parity tests show our host matcher == the reference's
    ``evaluate_detections`` to 1e-6 on identical inputs, so this run
    discriminates between the two possible homes of the H2H640 evaluator
    offset: if ``ref_eval(our detections)`` lands on our evaluator's
    number, the AP stacks agree on real data too and the offset is a
    *detection-set* difference (decode/NMS/conf on the reference's
    weights); if it lands on the reference's higher number, our stack
    under-scores real detection sets and the term is in the matcher/AP.

    Pairing: detections come from the exact eval step ``validate()``
    scores (same checkpoint, same conf), targets come from the reference
    dataset iterated exactly as ``cmd_eval_ref`` does; per-image GT
    counts are asserted equal as an ordering guard.
    """
    import torch

    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    model, _, val_loader = _build(args.data)
    cfg = TrainerConfig(epochs=1, val_conf=0.25, use_ema=False)
    trainer = Trainer(model, val_loader, val_loader, cfg, seed=SEED)
    state, _, _, _ = CheckpointManager(str(TPU_RUN)).try_resume(
        trainer.state, name=args.which)
    trainer.state = state
    ours = trainer.validate()  # sanity row: our evaluator, same weights

    # Per-image detections from the SAME jitted eval step validate() uses
    # (normalized xyxy, fixed max_det with validity mask).
    preds, our_gt_counts = [], []
    for batch in val_loader:
        placed = trainer._place(batch)
        out_step = trainer._eval_step(trainer.state, placed)
        boxes, scores, labels, valid = (np.asarray(x) for x in out_step[1])
        B = batch["img"].shape[0]
        sv = np.asarray(batch.get("sample_valid", np.ones(B, bool))).astype(bool)
        gt_mask = np.asarray(batch["gt_mask"]).astype(bool)
        for b in range(B):
            if not sv[b]:
                continue  # loader wrap-padding duplicate
            keep = valid[b].astype(bool) & (scores[b] >= 0.25)
            preds.append({
                "boxes": torch.from_numpy(boxes[b][keep].astype(np.float32)),
                "scores": torch.from_numpy(scores[b][keep].astype(np.float32)),
                "labels": torch.from_numpy(labels[b][keep].astype(np.int64)),
            })
            our_gt_counts.append(int(gt_mask[b].sum()))

    # Targets via the reference dataset, iterated exactly as cmd_eval_ref.
    sys.path.insert(0, "/root/reference/yolo_scratch_cuda")
    from torch.utils.data import DataLoader, Subset

    from datasets.crater_dataset_cuda import CraterDatasetCUDA, collate_fn_cuda
    from utils.metrics import evaluate_detections as ref_eval

    ds = CraterDatasetCUDA(args.data, img_size=IMGSZ, cache_images=False, augment=False)
    n = len(ds)
    n_val = int(n * VAL_SPLIT)
    perm = torch.randperm(n, generator=torch.Generator().manual_seed(SEED)).tolist()
    dl = DataLoader(Subset(ds, perm[n - n_val:]), batch_size=BATCH, shuffle=False,
                    collate_fn=collate_fn_cuda)
    targets = []
    for batch in dl:
        for b in range(batch["img"].shape[0]):
            m = batch["batch_idx"] == b
            targets.append({
                "boxes": batch["bboxes"][m],
                "labels": batch["cls"][m].flatten().long(),
            })

    assert len(preds) == len(targets) == n_val, (len(preds), len(targets), n_val)
    ref_gt_counts = [len(t["boxes"]) for t in targets]
    assert our_gt_counts == ref_gt_counts, "val image ordering mismatch"

    ref_on_ours = {k: float(v) for k, v in
                   ref_eval(preds, targets, conf_threshold=0.25, iou_threshold=0.5).items()}
    out = {
        "checkpoint": f"{TPU_RUN}/{args.which}",
        "our_evaluator": {k: float(v) for k, v in ours.items()},
        "reference_evaluator_on_our_detections": ref_on_ours,
        "note": "same weights, same val images; detections from our jitted "
                "eval step, scored by the reference's corrected torch "
                "evaluate_detections",
    }
    (H2H_ROOT / "cross_eval.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def cmd_det_diff(args):
    """Quantify the detection-set difference between the two prediction
    pipelines on IDENTICAL weights — the term cross-eval names.

    Runs the reference's corrected decode+NMS (torch) and our transplanted
    forward + fused decode + NMS (TPU) on the same reference checkpoint and
    the same val images, then greedily pairs the two detection sets per
    image at IoU >= 0.5 and reports coordinate/score deltas and unmatched
    counts. This bounds "prediction-pipeline numerics" with a measurement
    instead of the golden tests' unit tolerances.
    """
    import torch
    import yaml

    import jax

    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig
    from yolo_scratch_tpu.utils.torch_import import load_reference_checkpoint, merge_pretrained

    ckpt_path = str(REF_RUN / ("best.pt" if (REF_RUN / "best.pt").exists() else "last.pt"))
    print(f"diffing prediction pipelines on {ckpt_path}")

    # --- reference detections (corrected decode, as in eval-ref) ---
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

    ds = CraterDatasetCUDA(args.data, img_size=IMGSZ, cache_images=False, augment=False)
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

    # --- our detections on the transplanted weights ---
    model, _, val_loader = _build(args.data)
    params, batch_stats = load_reference_checkpoint(ckpt_path)
    tcfg = TrainerConfig(epochs=1, val_conf=0.25, use_ema=False)
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
            keep = valid[b].astype(bool) & (scores[b] >= 0.25)
            our_dets.append({
                "boxes": boxes[b][keep].astype(np.float64),
                "scores": scores[b][keep].astype(np.float64),
                "labels": labels[b][keep].astype(np.int64),
            })
    assert len(ref_dets) == len(our_dets) == n_val, (len(ref_dets), len(our_dets), n_val)

    # --- greedy pairing per image at IoU >= 0.5 (ref score order) ---
    def iou_mat(a, b):  # (N,4),(M,4) normalized xyxy -> (N,M)
        if len(a) == 0 or len(b) == 0:
            return np.zeros((len(a), len(b)))
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)

    n_ref_tot = n_ours_tot = n_matched = n_label_mismatch = 0
    coord_px, score_abs, match_iou = [], [], []
    only_ref, only_ours = 0, 0
    for rd, od in zip(ref_dets, our_dets):
        rb = rd["boxes"].numpy().astype(np.float64)
        rs = rd["scores"].numpy().astype(np.float64)
        rl = rd["labels"].numpy()
        ob, os_, ol = od["boxes"], od["scores"], od["labels"]
        n_ref_tot += len(rb); n_ours_tot += len(ob)
        M = iou_mat(rb, ob)
        used = np.zeros(len(ob), bool)
        m_img = 0
        for i in np.argsort(-rs):
            if M.shape[1] == 0:
                break
            j = int(np.argmax(np.where(used, -1.0, M[i])))
            if not used[j] and M[i, j] >= 0.5:
                used[j] = True
                m_img += 1
                match_iou.append(float(M[i, j]))
                coord_px.append(float(np.max(np.abs(rb[i] - ob[j])) * IMGSZ))
                score_abs.append(float(abs(rs[i] - os_[j])))
                if int(rl[i]) != int(ol[j]):
                    n_label_mismatch += 1
        n_matched += m_img
        only_ref += len(rb) - m_img
        only_ours += len(ob) - m_img
    coord_px = np.array(coord_px) if coord_px else np.zeros(1)
    score_abs = np.array(score_abs) if score_abs else np.zeros(1)
    match_iou = np.array(match_iou) if match_iou else np.ones(1)
    out = {
        "checkpoint": ckpt_path,
        "images": n_val,
        "detections": {"reference": n_ref_tot, "ours": n_ours_tot,
                       "matched_iou50": n_matched,
                       "only_reference": only_ref, "only_ours": only_ours,
                       "label_mismatch_on_matched": n_label_mismatch},
        "matched_pair_deltas": {
            "coord_Linf_px": {"mean": float(coord_px.mean()),
                              "p99": float(np.percentile(coord_px, 99)),
                              "max": float(coord_px.max())},
            "score_abs": {"mean": float(score_abs.mean()),
                          "max": float(score_abs.max())},
            "pair_iou": {"mean": float(match_iou.mean()),
                         "min": float(match_iou.min())},
        },
        "note": "same reference checkpoint through both prediction pipelines "
                "(torch corrected decode+NMS vs our transplanted forward + "
                "fused decode + NMS); greedy IoU>=0.5 pairing in ref score "
                "order; coord delta is Linf over the 4 xyxy coords in pixels",
    }
    (H2H_ROOT / "det_diff.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


def cmd_report(args):
    repo = Path(__file__).resolve().parent.parent
    # the reference never writes best.pt: its mAP-gated best policy never
    # fires because its own eval path scores 0.0 (see cmd_eval_ref) — so the
    # honest reference number is last.pt scored through eval-ref's corrected
    # harness (ref_eval.json).
    ref_eval = json.loads((H2H_ROOT / "ref_eval.json").read_text())
    ref_val = ref_eval["fully_corrected_metrics"]
    tpu = json.loads((TPU_RUN / "result.json").read_text())
    transplant = (
        json.loads((H2H_ROOT / "transplant.json").read_text())
        if (H2H_ROOT / "transplant.json").exists()
        else None
    )

    ours_best = tpu["best_epoch_val"]
    ours_final = tpu.get("final_val", {})
    delta_5095 = ours_best.get("mAP50-95", 0.0) - ref_val.get("mAP50-95", 0.0)
    delta_50 = ours_best.get("mAP50", 0.0) - ref_val.get("mAP50", 0.0)
    # symmetric pairing: the reference number is its LAST-epoch checkpoint
    # (its best-checkpoint policy never fires, see above), so also report
    # our last-epoch delta — best-vs-last alone would be asymmetric in our
    # favor. North-star holds on the stricter (more negative) of the two.
    delta_5095_final = ours_final.get("mAP50-95", 0.0) - ref_val.get("mAP50-95", 0.0)
    summary = {
        "dataset": f"generated crater set (scripts/gen_crater_synth.py, {DATA_DIR}, @{IMGSZ})",
        "split": "reference torch.randperm(seed=42), identical for both",
        "recipe": f"AdamW lr {LR} wd {WD}, cosine+3 warmup, clip 10, batch {BATCH}, "
                  f"{EPOCHS} epochs, no augmentation, no EMA",
        "reference": {
            "epochs_trained": ref_eval["epochs_trained"],
            "as_shipped_mAP50": ref_eval["as_shipped_val_metrics"].get("mAP50", 0.0),
            **ref_val,
        },
        "ours": ours_best,
        "ours_final_epoch": ours_final,
        "delta_mAP50": round(delta_50, 4),
        "delta_mAP50_95": round(delta_5095, 4),
        "delta_mAP50_95_final": round(delta_5095_final, 4),
        "pairing_note": "reference row is last.pt (its best policy never "
                        "fires); delta_mAP50_95 pairs our best vs that, "
                        "delta_mAP50_95_final pairs our last vs that",
        "north_star_within_0p3": bool(min(delta_5095, delta_5095_final) >= -0.3),
        "transplant": transplant,
    }
    (repo / OUT_JSON).write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default=str(DATA_DIR))
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_t = sub.add_parser("train-tpu")
    p_t.add_argument("--resume", action="store_true")
    sub.add_parser("transplant")
    sub.add_parser("eval-ref")
    sub.add_parser("report")
    p_x = sub.add_parser("cross-eval")
    p_x.add_argument("--which", default="best", choices=["best", "last"])
    sub.add_parser("det-diff")
    sub.add_parser("eval-ours")
    args = ap.parse_args()
    TPU_RUN.mkdir(parents=True, exist_ok=True)
    {"train-tpu": cmd_train_tpu, "transplant": cmd_transplant,
     "eval-ref": cmd_eval_ref, "report": cmd_report,
     "cross-eval": cmd_cross_eval, "det-diff": cmd_det_diff,
     "eval-ours": cmd_eval_ours}[args.cmd](args)


if __name__ == "__main__":
    main()
