"""Headline benchmark: YOLO11n 640x640 end-to-end inference throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline: BASELINE.json north star >= 2000 images/sec/chip on v5e.

The measured step is the full deploy path on one chip: model forward (bf16
compute) + DFL decode + confidence filter + class-agnostic NMS — all inside
a single jit program, batched.

Two configurations are measured in one process (one compile each):

* the crater-shaped row (ch=1, nc=5 — the reference's own domain,
  ``train_yolo11_cuda.py:554``), which remains the headline ``value``;
* the COCO-shaped row (ch=3, nc=80 — the north-star config as BASELINE.json
  names it), emitted under ``coco_shaped`` in the same JSON line.

``BENCH_COCO=0`` skips the second measurement (halves a cold-cache run —
TPU compiles over the axon tunnel cost minutes and the persistent cache
does not hit across processes).
"""

import json
import os
import time

import numpy as np

import jax

# persistent compile cache — over the axon tunnel a cold compile of the full
# infer program costs minutes; warm runs land in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
import jax.numpy as jnp


def measure(img, ch, nc, batch, topk, nscan, int8):
    """Build the deploy program for (ch, nc) and time it. Returns img/s."""
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.nn.fuse import fuse_conv_bn
    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=ch, nc=nc, scale="n")
    variables = model.init(jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32))

    # deploy path: fold BN into conv kernels, bf16 weights + activations
    variables = fuse_conv_bn(variables)
    variables = {
        "params": jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), variables["params"]),
        "batch_stats": variables["batch_stats"],
    }

    # BENCH_INT8=1: opt-in int8 PTQ variant (docs/QUANT.md). Random-data
    # calibration — scales are arbitrary for a throughput measurement; the
    # compute graph (s8xs8->s32 convs + fused dequant) is the real one.
    if int8:
        from yolo_scratch_tpu.nn.quant import quantize_for_deploy

        calib = np.random.RandomState(1).randint(
            0, 256, (4, img, img, ch)).astype(np.float32) / 255.0
        variables = quantize_for_deploy(model, variables, [calib])

    def infer_one(variables, x):
        # u8 input (the streaming deploy contract — data/native.py ships
        # uint8; PredictorConfig.u8_transfer): normalize in-jit, in bf16
        xx = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        feats = model.apply(variables, xx, train=False)
        # Fused select-then-decode: DFL integral runs on the topk selected
        # candidates only; payload selection is gather-free (einsum).
        # NMS impl crossover: the Pallas batch-in-kernel sweep wins up to
        # ~B=32 (1.57 vs 2.32 ms at N=512); XLA's cross-batch loop wins at
        # large batch.
        # blocked_topk=0 (EXACT selection): the two-stage blocked variant
        # was validated on trained-model score distributions and found
        # unsafe — dense scenes put up to 68 of the global top-512 in one
        # 128-anchor block (scripts/validate_blocked_topk.py), so the
        # deploy path and this bench both run the exact top-k (~+0.76 ms
        # at B=128 vs blocked; docs/PERF.md "blocked selection" section)
        return postprocess_from_feats(
            feats,  # native bf16 — row selection is dtype-exact; f32 after
            nc=nc, strides=tuple(float(s) for s in model.strides), img_size=img,
            conf_threshold=0.25, iou_threshold=0.45, max_det=300,
            # BENCH_TOPK: A/B the prefilter cap (512 = headline point; a
            # binding cap trades dense-scene recall for NMS latency — see
            # PredictorConfig.pre_nms_topk and docs/H2H.md)
            pre_nms_topk=topk,
            nms_impl="pallas" if batch <= 32 else "xla",
            blocked_topk=0)

    # NSCAN batches are processed per program launch (lax.scan over distinct
    # inputs — every image is fully processed; nothing is hoisted). A real
    # TPU host pays ~0.1 ms per launch; the axon tunnel's RPC dispatch costs
    # ~5 ms per launch (measured), which would otherwise bill pure tunnel
    # overhead against the chip. Serving deployments batch dispatches the
    # same way (see infer.py's pipelined streaming).
    @jax.jit
    def infer(variables, xs):  # xs: (nscan, B, H, W, C)
        def body(_, x):
            return None, infer_one(variables, x)

        _, outs = jax.lax.scan(body, None, xs)
        return outs

    # direct u8 generation — rand() would build 420M float64s first (~45 s
    # on this 1-core host before the TPU sees anything)
    xs = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, (nscan, batch, img, img, ch), dtype=np.uint8))

    def sync(out):
        # NOTE: under the axon TPU tunnel, block_until_ready returns before
        # device work completes; fetching the (small) output bytes is the
        # only honest sync.
        return [np.asarray(o) for o in out]

    # compile + warmup
    sync(infer(variables, xs))
    sync(infer(variables, xs))

    # best-of-3 timing windows: the tunnel adds +-10% run-to-run noise
    # (shared-host contention); min-time is the standard way to report
    # achievable throughput under external interference
    iters = 8
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(variables, xs)
        sync(out)
        best_dt = min(best_dt, time.perf_counter() - t0)

    return batch * nscan * iters / best_dt


def main():
    img = 640
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    topk = int(os.environ.get("BENCH_TOPK", "512"))
    nscan = int(os.environ.get("BENCH_NSCAN", "8"))
    int8 = os.environ.get("BENCH_INT8") == "1"
    with_coco = os.environ.get("BENCH_COCO", "1") != "0"

    imgs_per_sec = measure(img, 1, 5, batch, topk, nscan, int8)
    row = {
        "metric": "yolo11n_640_infer_images_per_sec_per_chip"
        + ("_int8" if int8 else ""),
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / 2000.0, 4),
        # knob keys are emitted unconditionally so a pinned-knob run is
        # distinguishable from the headline in the artifact (ADVICE r4)
        "pre_nms_topk": topk,
        "batch": batch,
        "nscan": nscan,
    }
    if with_coco:
        coco_ips = measure(img, 3, 80, batch, topk, nscan, int8)
        row["coco_shaped"] = {
            "metric": "yolo11n_coco640_infer_images_per_sec_per_chip"
            + ("_int8" if int8 else ""),
            "value": round(coco_ips, 2),
            "unit": "images/sec/chip",
            "vs_baseline": round(coco_ips / 2000.0, 4),
        }
    print(json.dumps(row))


if __name__ == "__main__":
    main()
