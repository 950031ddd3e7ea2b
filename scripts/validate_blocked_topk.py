"""Validate blocked candidate selection on a TRAINED model's scores.

`topk_scores(blocked=32)` (ops/decode.py) is exact unless a single
128-anchor block holds >32 of the global top-k. Unit tests prove this on
synthetic sparse patterns; this script closes the loop on a real trained
score distribution: the H2H transplant checkpoint (the reference's own
trained weights imported via utils/torch_import) over the real H2H crater
val images. Asserts blocked==exact detections bit-for-bit through the
full deploy postprocess, and records the actually-observed worst-case
block occupancy (margin vs the 32 cutoff).

Run after scripts/h2h.py has populated /tmp/h2h:
    python scripts/validate_blocked_topk.py [--data /tmp/h2h/data]
        [--ckpt /tmp/h2h/ref_run/last.pt] [--imgsz 320] [--k 512]
Forced-CPU (does not touch the TPU runtime); selection logic is
backend-independent.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/h2h/data")
    ap.add_argument("--ckpt", default="/tmp/h2h/ref_run/last.pt")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--k", type=int, default=512, help="pre_nms_topk (deploy contract)")
    ap.add_argument("--kb", type=int, default=32, help="blocked per-block cutoff")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--conf", type=float, default=0.25)
    args = ap.parse_args()

    from yolo_scratch_tpu.data.crater import CraterDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats
    from yolo_scratch_tpu.utils.torch_import import load_reference_checkpoint

    ds = CraterDataset(args.data, img_size=args.imgsz)
    params, batch_stats = load_reference_checkpoint(args.ckpt)
    model = build_yolo11(
        str(Path(__file__).resolve().parent.parent
            / "yolo_scratch_tpu/configs/yolo11_crater.yaml"),
        ch=1, nc=5, scale="n",
    )
    variables = {"params": params, "batch_stats": batch_stats}

    reg_max, nc = model.reg_max, model.nc
    strides = tuple(float(s) for s in model.strides)

    def run(feats, blocked):
        return postprocess_from_feats(
            feats, nc=nc, strides=strides, img_size=args.imgsz, reg_max=reg_max,
            conf_threshold=args.conf, iou_threshold=0.45, max_det=300,
            pre_nms_topk=args.k, nms_impl="xla", blocked_topk=blocked,
        )

    @jax.jit
    def forward(v, x):
        return model.apply(v, x, train=False)

    B = args.batch
    n_img = len(ds)
    worst_block = 0          # max members of the global top-k in one 128-block
    worst_block_thr = 0      # same, counting only above-conf candidates
    mismatches = 0
    checked = 0
    for i0 in range(0, n_img, B):
        idxs = list(range(i0, min(i0 + B, n_img)))
        pad = B - len(idxs)
        imgs = np.stack([ds[j][0] for j in idxs] + [ds[idxs[-1]][0]] * pad)
        x = jnp.asarray(imgs)
        feats = forward(variables, x)

        exact = [np.asarray(t) for t in run(feats, 0)]
        blocked = [np.asarray(t) for t in run(feats, args.kb)]
        for e, b, name in zip(exact, blocked, ("boxes", "scores", "labels", "valid")):
            if not np.array_equal(e[: len(idxs)], b[: len(idxs)]):
                mismatches += 1
                print(f"MISMATCH {name} imgs {idxs[0]}..{idxs[-1]}")

        # block-occupancy census of the exact global top-k
        no = nc + 4 * reg_max
        flat = jnp.concatenate([f.reshape(B, -1, no) for f in feats], axis=1)
        scores = jax.nn.sigmoid(jnp.max(flat[..., 4 * reg_max:], axis=-1).astype(jnp.float32))
        A = scores.shape[1]
        k = min(args.k, A)
        # the deploy selection ranks conf-masked scores; exactness requires
        # every masked-top-k member to sit within its 128-block's top-kb
        masked = jnp.where(scores > args.conf, scores, -jnp.inf)
        top_sc, top_idx = jax.lax.top_k(masked, k)
        _, top_idx_raw = jax.lax.top_k(scores, k)
        top_np = np.asarray(top_idx)[: len(idxs)]
        fin_np = np.isfinite(np.asarray(top_sc))[: len(idxs)]
        raw_np = np.asarray(top_idx_raw)[: len(idxs)]
        nblk = (A + 127) // 128
        for r in range(len(idxs)):
            occ = np.bincount(raw_np[r] // 128, minlength=nblk)
            worst_block = max(worst_block, int(occ.max()))
            conf_idx = top_np[r][fin_np[r]]
            if conf_idx.size:
                occ2 = np.bincount(conf_idx // 128, minlength=nblk)
                worst_block_thr = max(worst_block_thr, int(occ2.max()))
        checked += len(idxs)

    result = {
        "images": checked,
        "pre_nms_topk": args.k,
        "blocked_kb": args.kb,
        "detection_mismatches": mismatches,
        "worst_block_occupancy_topk": worst_block,
        "worst_block_occupancy_above_conf": worst_block_thr,
        "exactness_margin": args.kb - worst_block_thr,
        "ok": mismatches == 0 and worst_block_thr <= args.kb,
    }
    print(json.dumps(result))
    if not result["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
