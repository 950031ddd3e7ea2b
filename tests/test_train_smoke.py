"""End-to-end training smoke: loss decreases; dp sharding matches single-device."""

import numpy as np
import pytest

IMG, CH, NC, G = 64, 1, 5, 8


def _tiny_setup(seed=0, use_ema=False):
    import jax
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    model = build_yolo11(
        "yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=CH, nc=NC, scale="n"
    )
    tx = make_optimizer(2e-3)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), np.zeros((1, IMG, IMG, CH), np.float32), tx,
        use_ema=use_ema,
    )
    cfg = DetectionLossConfig(nc=NC, strides=model.strides)
    return model, state, cfg


def _batch(B=4, seed=0):
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=B, img_size=IMG, channels=CH, num_classes=NC, seed=seed)
    loader = Loader(ds, batch_size=B, max_gt=G, prefetch=0)
    return next(iter(loader))


def test_train_step_matmul_precision_wrapper():
    """--train-precision plumbs through: the step traces under the
    requested jax.default_matmul_precision and runs (values identical on
    CPU where the context is a no-op; on TPU it switches the MXU pass
    count — the knob that closed the 640 H2H training gap, docs/H2H.md)."""
    import jax
    from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter

    model, state, cfg = _tiny_setup()
    batch = _batch()
    step = jax.jit(build_train_step_custom(
        model, v8_loss_adapter(cfg), matmul_precision="highest"))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # CPU backend: highest is a no-op, so the step must agree with default
    step_d = jax.jit(build_train_step_custom(model, v8_loss_adapter(cfg)))
    _, metrics_d = step_d(state, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_d["loss"]), rtol=1e-6)


def test_train_loss_decreases():
    from yolo_scratch_tpu.train.steps import make_train_step

    model, state, cfg = _tiny_setup(use_ema=True)
    step = make_train_step(model, cfg, donate=False)
    batch = _batch()

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # EMA params drifted from init and stayed finite
    import jax

    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(state.ema_params))


def test_dp_sharded_matches_single_device():
    import jax
    from yolo_scratch_tpu.parallel.mesh import (
        make_mesh, make_sharded_train_step, replicate, shard_batch,
    )
    from yolo_scratch_tpu.train.steps import make_train_step

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")

    model, state, cfg = _tiny_setup()
    batch = _batch(B=8)

    # single-device
    step1 = make_train_step(model, cfg, donate=False)
    s1, m1 = step1(state, batch)

    # 4-way dp
    mesh = make_mesh(4)
    step4 = make_sharded_train_step(model, cfg, mesh, donate=False)
    s4, m4 = step4(replicate(state, mesh), shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]), rtol=1e-4)
    # Parameters after one step agree up to Adam's step-1 sign-flip noise:
    # where the reduction-order float difference flips a near-zero grad's
    # sign, the update moves by up to ~2*lr. Bound by 3*lr absolute.
    lr = 2e-3
    l1 = jax.tree_util.tree_leaves(s1.params)
    l4 = jax.tree_util.tree_leaves(s4.params)
    for a, b in zip(l1, l4):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=3 * lr)

    # and the *second* step's loss (computed from the step-1 params) agrees
    s1b, m1b = step1(s1, batch)
    s4b, m4b = step4(s4, shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1b["loss"]), float(m4b["loss"]), rtol=5e-3)


def test_eval_step_runs():
    from yolo_scratch_tpu.train.steps import make_eval_step

    model, state, cfg = _tiny_setup()
    ev = make_eval_step(model, cfg, conf_threshold=0.01, max_det=20, pre_nms_topk=64)
    metrics, (boxes, scores, labels, valid) = ev(state, _batch())
    assert np.isfinite(float(metrics["loss"]))
    assert boxes.shape[1] == 20


def test_eval_step_reports_prefilter_saturation():
    """The fixed-shape prefilter cap must be OBSERVABLE when it binds: the
    reference's eval NMS is uncapped (train_yolo11_cuda.py:306-331), so a
    binding cap silently drops real detections — measured @640 on trained
    weights it cost 13/218 (docs/H2H.md). At conf ~0 every anchor (84 at
    64px) is a candidate: a cap of 32 must report saturation 1.0, a cap
    above the anchor count 0.0."""
    from yolo_scratch_tpu.train.steps import make_eval_step

    model, state, cfg = _tiny_setup()
    batch = _batch()
    ev_small = make_eval_step(model, cfg, conf_threshold=1e-9, max_det=20,
                              pre_nms_topk=32)
    metrics, _ = ev_small(state, batch)
    assert float(metrics["prefilter_saturated"]) == 1.0
    ev_big = make_eval_step(model, cfg, conf_threshold=1e-9, max_det=20,
                            pre_nms_topk=128)
    metrics, _ = ev_big(state, batch)
    assert float(metrics["prefilter_saturated"]) == 0.0


def test_prefilter_saturation_masks_wrap_padding():
    """A saturated wrap-padding duplicate must NOT inflate the metric: the
    loader pads the final short batch by wrapping (n=3, batch 4 -> row 3
    duplicates row 0), and steps.py counts saturation over sample_valid
    rows only. Constructed so the duplicated image saturates while at
    least one real image does not — the masked fraction then differs from
    the naive batch mean, which is what this asserts."""
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.train.steps import make_eval_step

    model, state, cfg = _tiny_setup()
    ds = SyntheticDataset(n=3, img_size=IMG, channels=CH, num_classes=NC, seed=0)
    batch = next(iter(Loader(ds, batch_size=4, max_gt=G, prefetch=0)))
    assert batch["sample_valid"].tolist() == [True, True, True, False]

    feats = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["img"], train=False,
    )
    probs = np.asarray(model.decode(feats)[..., 4:].max(axis=-1))  # (4, A)
    conf = cap = None
    for q in (0.3, 0.5, 0.7, 0.9):
        c = float(np.quantile(probs, q))
        counts = (probs > c).sum(axis=1)
        if counts[0] > counts[1:3].min():
            conf, cap = c, int((counts[0] + counts[1:3].min()) // 2)
            break
    if conf is None:
        pytest.skip("random init produced no per-image candidate separation")

    counts = (probs > conf).sum(axis=1)
    sat = counts > cap
    assert sat[0] and sat[3] and not sat.all()  # duplicate saturates, a real image doesn't
    expected_masked = float(sat[:3].mean())
    naive_mean = float(sat.mean())
    assert expected_masked != naive_mean  # the construction discriminates

    ev = make_eval_step(model, cfg, conf_threshold=conf, max_det=20, pre_nms_topk=cap)
    metrics, _ = ev(state, batch)
    np.testing.assert_allclose(
        float(metrics["prefilter_saturated"]), expected_masked, atol=1e-6)


def test_lr_schedule_matches_reference_shape():
    from yolo_scratch_tpu.train.optim import cosine_epoch_schedule

    sched = cosine_epoch_schedule(1e-3, epochs=10, steps_per_epoch=5, warmup_epochs=3)
    # epoch 0 -> lr_min
    assert float(sched(0)) == pytest.approx(1e-5)
    # epoch 2 (steps 10-14) -> lr_min + (max-min)*2/3
    assert float(sched(12)) == pytest.approx(1e-5 + (1e-3 - 1e-5) * 2 / 3, rel=1e-6)
    # epoch 3 -> cosine start = lr_max
    assert float(sched(15)) == pytest.approx(1e-3, rel=1e-6)
    # final epoch ~ lr_min region
    assert float(sched(49)) < 1.2e-4
