"""NMS + postprocess: parity vs the reference host implementation."""

import numpy as np
import pytest

from tests.conftest import requires_reference


def _random_boxes(seed, n=40, img=64.0):
    rng = np.random.RandomState(seed)
    centers = rng.rand(n, 2) * img
    wh = rng.rand(n, 2) * 25 + 3
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


@requires_reference
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("iou_t", [0.45, 0.7])
def test_nms_parity(reference_path, seed, iou_t):
    import torch
    from train_yolo11_cuda import nms_simple

    from yolo_scratch_tpu.ops.nms import nms

    boxes, scores = _random_boxes(seed)
    ref_keep = nms_simple(torch.from_numpy(boxes), torch.from_numpy(scores), iou_t)

    keep_mask = np.asarray(nms(boxes, scores, iou_threshold=iou_t, max_det=300))
    ours = set(np.nonzero(keep_mask)[0].tolist())
    assert ours == set(ref_keep)


def test_nms_max_det_and_validity():
    from yolo_scratch_tpu.ops.nms import nms

    boxes, scores = _random_boxes(3, n=30)
    # spread boxes far apart so nothing suppresses; max_det must cap count
    boxes = boxes + (np.arange(30)[:, None] * 200.0).astype(np.float32)
    keep = np.asarray(nms(boxes, scores, iou_threshold=0.5, max_det=5))
    assert keep.sum() == 5
    # the 5 kept are the top-5 scores
    top5 = set(np.argsort(-scores)[:5].tolist())
    assert set(np.nonzero(keep)[0].tolist()) == top5

    valid = scores > 0.5
    keep = np.asarray(nms(boxes, scores, iou_threshold=0.5, max_det=300, valid=valid))
    assert not (keep & ~valid).any()


def test_postprocess_shapes_and_threshold():
    from yolo_scratch_tpu.ops.decode import postprocess

    rng = np.random.RandomState(0)
    B, A, nc = 2, 100, 5
    pred = np.zeros((B, A, 4 + nc), np.float32)
    pred[..., 0:2] = rng.rand(B, A, 2) * 64  # centers
    pred[..., 2:4] = rng.rand(B, A, 2) * 10 + 2  # wh
    pred[..., 4:] = rng.rand(B, A, nc) * 0.2  # low scores
    pred[0, 7, 4] = 0.9  # one confident detection in image 0

    boxes, scores, labels, valid = postprocess(
        pred, img_size=64, conf_threshold=0.25, iou_threshold=0.45, max_det=10, pre_nms_topk=50
    )
    assert boxes.shape == (2, 10, 4) and valid.shape == (2, 10)
    assert int(valid[0].sum()) >= 1 and int(valid[1].sum()) == 0
    assert float(scores[0, 0]) == pytest.approx(0.9, abs=1e-6)
    assert int(labels[0, 0]) == 0
    assert (np.asarray(boxes) >= 0).all() and (np.asarray(boxes) <= 1).all()


@requires_reference
def test_postprocess_parity_full(reference_path):
    """Full postprocess vs decode_predictions_for_metrics on random preds."""
    import torch
    from train_yolo11_cuda import decode_predictions_for_metrics

    from yolo_scratch_tpu.ops.decode import postprocess

    rng = np.random.RandomState(5)
    B, A, nc, img = 2, 120, 5, 64
    pred = np.zeros((B, A, 4 + nc), np.float32)
    pred[..., 0:2] = rng.rand(B, A, 2) * img
    pred[..., 2:4] = rng.rand(B, A, 2) * 20 + 2
    pred[..., 4:] = rng.rand(B, A, nc).astype(np.float32)

    ref = decode_predictions_for_metrics(
        torch.from_numpy(pred), img, conf_threshold=0.25, iou_threshold=0.45,
        device=torch.device("cpu"),
    )
    boxes, scores, labels, valid = postprocess(
        pred, img_size=img, conf_threshold=0.25, iou_threshold=0.45, max_det=300,
        pre_nms_topk=A,
    )
    for b in range(B):
        nv = int(valid[b].sum())
        r = ref[b]
        assert nv == len(r["scores"])
        order = np.argsort(-r["scores"].numpy(), kind="stable")
        np.testing.assert_allclose(
            np.asarray(scores[b][:nv]), r["scores"].numpy()[order], rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(boxes[b][:nv]), r["boxes"].numpy()[order], rtol=1e-4, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(labels[b][:nv]), r["labels"].numpy()[order])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("iou_t", [0.45, 0.7])
def test_tiled_nms_matches_sequential(seed, iou_t):
    """batched_nms_tiled (tile-parallel fixpoint) == batched_nms (N-step
    greedy sweep), exact keep-set equality, including crowded scenes that
    exercise suppression chains across tile boundaries."""
    from yolo_scratch_tpu.ops.nms import batched_nms, batched_nms_tiled

    rng = np.random.RandomState(seed)
    B, N = 3, 300  # not a multiple of the 128 tile — exercises padding
    centers = rng.rand(B, N, 2) * 200  # dense: many overlaps, long chains
    wh = rng.rand(B, N, 2) * 60 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.rand(B, N).astype(np.float32)
    valid = rng.rand(B, N) > 0.1

    ref = np.asarray(batched_nms(boxes, scores, valid, iou_threshold=iou_t, max_det=300))
    got = np.asarray(batched_nms_tiled(boxes, scores, valid, iou_threshold=iou_t, max_det=300))
    np.testing.assert_array_equal(got, ref)

    # max_det capping picks the same top-k
    ref5 = np.asarray(batched_nms(boxes, scores, valid, iou_threshold=iou_t, max_det=5))
    got5 = np.asarray(batched_nms_tiled(boxes, scores, valid, iou_threshold=iou_t, max_det=5))
    np.testing.assert_array_equal(got5, ref5)


def test_tiled_nms_class_aware():
    from yolo_scratch_tpu.ops.nms import batched_nms, batched_nms_tiled

    rng = np.random.RandomState(7)
    B, N = 2, 150
    centers = rng.rand(B, N, 2) * 100
    wh = rng.rand(B, N, 2) * 50 + 5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = rng.rand(B, N).astype(np.float32)
    valid = np.ones((B, N), bool)
    cls = rng.randint(0, 5, (B, N)).astype(np.int32)

    ref = np.asarray(batched_nms(boxes, scores, valid, class_ids=cls,
                                 iou_threshold=0.45, max_det=300, class_aware=True))
    got = np.asarray(batched_nms_tiled(boxes, scores, valid, class_ids=cls,
                                       iou_threshold=0.45, max_det=300, class_aware=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("nms_impl", ["xla", "tiled"])
def test_postprocess_from_feats_matches_unfused(nms_impl):
    """Fused select-then-decode == decode-then-select, bit-for-bit: the
    candidate ranking depends only on class scores, so running the DFL
    integral on just the selected rows must not change any output."""
    import jax.numpy as jnp

    from yolo_scratch_tpu.nn.modules import detect_decode
    from yolo_scratch_tpu.ops.decode import postprocess, postprocess_from_feats

    rng = np.random.RandomState(11)
    B, nc, reg_max, img = 3, 5, 16, 64
    strides = (8.0, 16.0, 32.0)
    no = nc + 4 * reg_max
    feats = [
        jnp.asarray(rng.randn(B, img // int(s), img // int(s), no).astype(np.float32) * 2)
        for s in strides
    ]

    decoded = detect_decode(feats, nc, strides, reg_max)
    ref = postprocess(decoded, img_size=img, conf_threshold=0.25, iou_threshold=0.45,
                      max_det=20, pre_nms_topk=32, nms_impl=nms_impl)
    got = postprocess_from_feats(
        feats, nc=nc, strides=strides, img_size=img, reg_max=reg_max,
        conf_threshold=0.25, iou_threshold=0.45, max_det=20, pre_nms_topk=32,
        nms_impl=nms_impl)

    for r, g, name in zip(ref, got, ["boxes", "scores", "labels", "valid"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-7, err_msg=name)


def test_blocked_topk_matches_exact_on_sparse():
    """topk_scores(blocked=kb) == exact top_k whenever no 128-lane block
    holds more than kb of the global top-k (the real-scene regime), and
    degrades to a same-shape same-cost selection otherwise."""
    import jax
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.decode import topk_scores

    rng = np.random.RandomState(3)
    B, A, K, KB = 4, 1000, 64, 16
    # sparse: ~40 hot candidates per image, rest -inf (below conf)
    scores = np.full((B, A), -np.inf, np.float32)
    for b in range(B):
        hot = rng.choice(A, 40, replace=False)
        scores[b, hot] = rng.rand(40).astype(np.float32) + 0.5
    s = jnp.asarray(scores)

    es, ei = jax.lax.top_k(s, K)
    bs, bi = topk_scores(s, K, blocked=KB)
    np.testing.assert_array_equal(np.asarray(bs), np.asarray(es))
    # indices must agree wherever the score is finite (the -inf tail's
    # indices are arbitrary in both)
    finite = np.isfinite(np.asarray(es))
    np.testing.assert_array_equal(np.asarray(bi)[finite], np.asarray(ei)[finite])

    # dense data: selection may differ but scores stay sorted, shapes fixed
    d = jnp.asarray(rng.rand(B, A).astype(np.float32))
    bs2, bi2 = topk_scores(d, K, blocked=KB)
    assert bs2.shape == (B, K) and bi2.shape == (B, K)
    assert bool((jnp.diff(bs2, axis=1) <= 1e-7).all())
    assert bool((bi2 >= 0).all()) and bool((bi2 < A + 128).all())


def test_postprocess_from_feats_bf16_native():
    """bf16 feats through the fused path == the unfused path on the same
    bf16 values cast to f32 up front — selection/argmax/max are value-exact
    in bf16 and only the K selected rows reach the f32 DFL integral."""
    import jax.numpy as jnp

    from yolo_scratch_tpu.nn.modules import detect_decode
    from yolo_scratch_tpu.ops.decode import postprocess, postprocess_from_feats

    rng = np.random.RandomState(21)
    B, nc, reg_max, img = 2, 5, 16, 64
    strides = (8.0, 16.0, 32.0)
    no = nc + 4 * reg_max
    feats_bf16 = [
        jnp.asarray(rng.randn(B, img // int(s), img // int(s), no).astype(np.float32) * 2
                    ).astype(jnp.bfloat16)
        for s in strides
    ]
    feats_f32 = [f.astype(jnp.float32) for f in feats_bf16]

    ref = postprocess(detect_decode(feats_f32, nc, strides, reg_max),
                      img_size=img, conf_threshold=0.25, iou_threshold=0.45,
                      max_det=20, pre_nms_topk=32)
    got = postprocess_from_feats(
        feats_bf16, nc=nc, strides=strides, img_size=img, reg_max=reg_max,
        conf_threshold=0.25, iou_threshold=0.45, max_det=20, pre_nms_topk=32)

    for r, g, name in zip(ref, got, ["boxes", "scores", "labels", "valid"]):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-6, atol=1e-7, err_msg=name)


def test_logit_ranked_selection_semantics():
    """The fused path ranks candidates on the raw max-logit instead of the
    f32 sigmoid score. Pins the two halves of that contract:

    1. wherever f32 sigmoid is injective on the bf16 logit domain
       (exhaustive sweep: everywhere except |logit| ≳ 14 and
       sub-1e-7 logits), the selected set, order, tie handling AND
       returned f32 scores are identical to ranking on the f32 sigmoid —
       including bf16-tied logits, which both paths break stably by
       anchor index;
    2. where f32 sigmoid collides on distinct bf16 logits (|logit| ≳ 14,
       saturating fully to 1.0 at ≥ 17.375) the logit ranking is strictly
       FINER: candidates are ordered by their true logit where score
       ranking would see an arbitrary run of equal-score ties.
    """
    import jax
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.decode import topk_scores

    rng = np.random.RandomState(7)
    B, A, K = 4, 512, 64
    # dense bf16 logits with guaranteed ties (quantize to a coarse grid),
    # clipped inside the f32-sigmoid-injective band (|logit| < 14)
    logits = jnp.asarray(
        np.clip(np.round(rng.randn(B, A) * 4) / 4, -12, 12), jnp.bfloat16)
    conf_ok = jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.25

    masked_logit = jnp.where(conf_ok, logits, -jnp.inf * jnp.ones((), logits.dtype))
    masked_score = jnp.where(
        conf_ok, jax.nn.sigmoid(logits.astype(jnp.float32)), -jnp.inf)

    tl, ti = topk_scores(masked_logit, K)
    ts, si = topk_scores(masked_score, K)
    np.testing.assert_array_equal(np.asarray(ti), np.asarray(si))
    np.testing.assert_array_equal(
        np.asarray(jax.nn.sigmoid(tl.astype(jnp.float32))), np.asarray(ts))

    # saturation: scores collapse to 1.0, logits keep the true order
    sat = jnp.asarray(np.array([[20.0, 30.0, 25.0] + [-9.0] * 13]), jnp.bfloat16)
    sat_scores = jax.nn.sigmoid(sat.astype(jnp.float32))
    assert bool((np.asarray(sat_scores)[0, :3] == 1.0).all())  # saturated
    _, li = topk_scores(sat, 3)
    np.testing.assert_array_equal(np.asarray(li)[0], [1, 2, 0])  # by logit


def test_nms_presorted_matches():
    """nms(presorted=True) on score-descending inputs == the sorting path."""
    from yolo_scratch_tpu.ops.nms import nms

    boxes, scores = _random_boxes(9, n=60)
    order = np.argsort(-scores, kind="stable")
    bs, ss = boxes[order], scores[order]
    valid = ss > 0.2

    ref = np.asarray(nms(bs, ss, iou_threshold=0.5, max_det=30, valid=valid))
    got = np.asarray(nms(bs, ss, iou_threshold=0.5, max_det=30, valid=valid,
                         presorted=True))
    np.testing.assert_array_equal(got, ref)


def test_select_rows_exact():
    """select_rows == take_along_axis for arbitrary payloads/indices, in
    f32 and bf16 (one-hot products are value-exact in any dtype)."""
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.decode import select_rows

    rng = np.random.RandomState(5)
    B, A, C, K = 3, 300, 7, 40  # A not a multiple of 128 — exercises pad
    payload = rng.randn(B, A, C).astype(np.float32) * 100
    idx = rng.randint(0, A, (B, K)).astype(np.int32)

    ref = np.take_along_axis(payload, idx[..., None], axis=1)
    got = np.asarray(select_rows(jnp.asarray(payload), jnp.asarray(idx)))
    np.testing.assert_array_equal(got, ref)

    p16 = jnp.asarray(payload).astype(jnp.bfloat16)
    got16 = np.asarray(select_rows(p16, jnp.asarray(idx)).astype(jnp.float32))
    ref16 = np.take_along_axis(
        np.asarray(p16.astype(jnp.float32)), idx[..., None], axis=1)
    np.testing.assert_array_equal(got16, ref16)


def test_class_aware_agreement_at_deploy_shapes():
    """Pallas == XLA == tiled class-aware NMS through the fused deploy
    postprocess at SERVING shapes: nc=80, pre_nms_topk=512, max_det=300,
    320px FPN anchor grid (the nc=80 model the train CLI produces and
    infer.py now serves). Guards the deploy Predictor's
    ``nms_impl="pallas"`` + ``class_aware`` routing."""
    import jax.numpy as jnp

    from yolo_scratch_tpu.ops.decode import postprocess_from_feats

    rng = np.random.RandomState(5)
    B, nc, reg_max, img = 2, 80, 16, 320
    strides = (8.0, 16.0, 32.0)
    no = nc + 4 * reg_max
    feats = []
    for s in strides:
        g = img // int(s)
        f = rng.randn(B, g, g, no).astype(np.float32)
        # bias class logits so a realistic few hundred anchors pass conf
        f[..., 4 * reg_max:] = f[..., 4 * reg_max:] * 2.0 - 3.0
        feats.append(jnp.asarray(f))

    outs = {}
    for impl in ("xla", "pallas", "tiled"):
        outs[impl] = [
            np.asarray(t) for t in postprocess_from_feats(
                feats, nc=nc, strides=strides, img_size=img, reg_max=reg_max,
                conf_threshold=0.25, iou_threshold=0.45, max_det=300,
                pre_nms_topk=512, class_aware=True, nms_impl=impl)
        ]
    n_det = int(outs["xla"][3].sum())
    assert n_det > 50  # the comparison must exercise real suppression
    for impl in ("pallas", "tiled"):
        for a, b, name in zip(outs["xla"], outs[impl], ("boxes", "scores", "labels", "valid")):
            np.testing.assert_array_equal(a, b, err_msg=f"{impl}:{name}")
