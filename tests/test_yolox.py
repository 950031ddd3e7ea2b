"""YOLOX family: shapes, decode geometry, SimOTA properties, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_yolox_shapes_and_decode():
    from yolo_scratch_tpu.models.yolox import YOLOXModel

    model = YOLOXModel.from_scale("nano", nc=7)
    x = np.zeros((1, 128, 128, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x, train=False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 4 + 1 + 7),
        (1, 8, 8, 12),
        (1, 4, 4, 12),
    ]
    dec = model.decode(outs)
    assert dec.shape == (1, 16 * 16 + 8 * 8 + 4 * 4, 4 + 1 + 7)
    # obj/cls are probabilities
    assert float(dec[..., 4:].min()) >= 0 and float(dec[..., 4:].max()) <= 1


def test_yolox_decode_geometry():
    """A raw reg of zeros decodes to a stride-sized box at the cell corner."""
    from yolo_scratch_tpu.models.yolox import yolox_decode

    nc = 2
    outs = [np.zeros((1, 4, 4, 5 + nc), np.float32)]
    dec = np.asarray(yolox_decode(outs, nc, [8.0]))
    # anchor (0,0): xy = (0+0)*8 = 0, wh = exp(0)*8 = 8 -> xyxy (-4,-4,4,4)
    np.testing.assert_allclose(dec[0, 0, :4], [-4, -4, 4, 4], atol=1e-5)
    # anchor at grid (x=1, y=0) -> center (8, 0)
    np.testing.assert_allclose(dec[0, 1, :4], [4, -4, 12, 4], atol=1e-5)


def test_simota_assignment_properties():
    from yolo_scratch_tpu.losses.simota import simota_assign
    from yolo_scratch_tpu.ops.anchors import make_anchors

    rng = np.random.RandomState(0)
    anchor_points, stride_t = make_anchors([(8, 8, 8.0), (4, 4, 16.0)], 0.0)
    A = anchor_points.shape[0]
    nc, G = 3, 4

    # predictions that sit exactly on a grid of boxes
    centers = (np.asarray(anchor_points) + 0.5) * np.asarray(stride_t)
    wh = np.full((A, 2), 16.0, np.float32)
    pred_boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    obj = rng.randn(A).astype(np.float32)
    cls = rng.randn(A, nc).astype(np.float32)

    gt = np.zeros((G, 4), np.float32)
    gl = np.zeros((G,), np.int64)
    gm = np.zeros((G,), bool)
    gt[0] = [8, 8, 28, 28]
    gl[0] = 1
    gm[0] = True
    gt[1] = [40, 36, 60, 62]
    gl[1] = 2
    gm[1] = True

    res = simota_assign(
        pred_boxes, obj, cls, np.asarray(anchor_points), np.asarray(stride_t)[:, 0],
        gt, gl, gm,
    )
    fg = np.asarray(res.fg_mask)
    mg = np.asarray(res.matched_gt)
    assert fg.sum() >= 2  # both GTs matched at least one anchor
    assert set(mg[fg]).issubset({0, 1})
    for g in (0, 1):
        assert (mg[fg] == g).any(), f"gt {g} unmatched"
    # matched anchors overlap their GT
    assert np.asarray(res.matched_iou)[fg].min() > 0.05
    # no fg on padded GT columns
    assert not (mg[fg] >= 2).any()


def test_yolox_loss_decreases():
    from yolo_scratch_tpu.losses.simota import YOLOXLossConfig, yolox_loss
    from yolo_scratch_tpu.models.yolox import YOLOXModel

    import optax

    model = YOLOXModel.from_scale("nano", nc=5)
    rng = np.random.RandomState(0)
    B, S, G = 2, 64, 4
    x = rng.rand(B, S, S, 3).astype(np.float32)
    gl = np.zeros((B, G), np.int32)
    gb = np.zeros((B, G, 4), np.float32)
    gm = np.zeros((B, G), bool)
    gb[0, 0] = [0.2, 0.2, 0.6, 0.7]
    gl[0, 0] = 3
    gm[0, 0] = True
    gb[1, 0] = [0.4, 0.1, 0.9, 0.5]
    gm[1, 0] = True

    variables = model.init(jax.random.PRNGKey(0), x)
    cfg = YOLOXLossConfig(nc=5, use_l1=True)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            total, aux = yolox_loss(outs, gl, gb, gm, cfg)
            return total, (aux, mut["batch_stats"])

        (loss, (aux, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, aux

    params, batch_stats = variables["params"], variables["batch_stats"]
    losses = []
    for _ in range(10):
        params, batch_stats, opt_state, loss, aux = step(params, batch_stats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert float(aux["num_fg"]) > 0


def test_yolox_s_init_logits_bounded():
    """Round-3 NaN regression: pred convs must use the torch-default
    (fan_in) init, not the reference trainer's blanket kaiming fan_out —
    fan_out=4 on the 1x1 reg conv gave init wh logits ~±60 at s-width,
    whose exp() made the first gradient infinite and the global-norm clip
    emit NaN params (models/yolox.py TORCH_CONV_DEFAULT rationale)."""
    import jax
    import jax.numpy as jnp

    from yolo_scratch_tpu.models.yolox import YOLOXModel

    model = YOLOXModel.from_scale("s", nc=80)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 160, 160, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    flat = jnp.concatenate([o.reshape(2, -1, 85) for o in outs], axis=1)
    # reg/obj logits O(1) at init; cls carries the -4.595 prior bias
    assert float(jnp.abs(flat[..., :5]).max()) < 8.0
    assert float(jnp.abs(flat[..., 5:]).max()) < 12.0


def test_yolox_wh_cap_nan_safe_and_gradient_preserving():
    """The straight-through wh cap (losses/simota.py) must (a) keep the
    forward value EXACTLY the capped one for any input — the naive STE
    ``l - stop_grad(l - clip(l))`` gives inf-inf=NaN on an inf logit and
    cancels a huge finite logit to 0 — and (b) still pass gradient to
    out-of-band finite logits (the ADVICE round-3 item it implements)."""
    from yolo_scratch_tpu.losses.simota import YOLOXLossConfig, yolox_loss

    B, S, nc = 1, 8, 5
    no = 5 + nc
    cfg = YOLOXLossConfig(nc=nc, strides=(8.0,))
    gl = np.zeros((B, 2), np.int32)
    gb = np.zeros((B, 2, 4), np.float32)
    gm = np.zeros((B, 2), bool)
    # GT centered on cell (4,4) of the 8x8 map (center 36px / 64px img)
    gb[0, 0] = [0.40, 0.40, 0.72, 0.72]
    gm[0, 0] = True

    def loss_of(out):
        total, _ = yolox_loss([out], gl, gb, gm, cfg)
        return total

    base = np.zeros((B, S, S, no), np.float32)
    base[..., 5:] = -4.0
    div = base.copy()
    # saturate the w logit on EVERY anchor so whichever one SimOTA assigns
    # is saturated — a plain clip() would zero its restoring gradient
    div[..., 2] = 1e9
    div[0, 3, 3, 3] = np.inf  # and one h logit diverged all the way to inf
    total, grads = jax.value_and_grad(loss_of)(jnp.asarray(div))
    assert np.isfinite(float(total))
    grads = np.asarray(grads)
    assert np.all(np.isfinite(grads))
    # forward must match the explicitly-capped input bit-for-bit
    capped = div.copy()
    capped[..., 2] = 20.0
    capped[0, 3, 3, 3] = 20.0
    np.testing.assert_allclose(
        float(total), float(loss_of(jnp.asarray(capped))), rtol=1e-6)
    # the assigned anchor's saturated w logit still receives gradient (the
    # restoring IoU-loss signal the straight-through cap exists for)
    assert float(np.abs(grads[..., 2]).max()) > 0.0


def test_yolox_train_step_survives_divergent_wh_logits():
    """Defense-in-depth for the same failure: even with the reg branch
    forced to emit huge wh logits, the capped exp (WH_LOGIT_CAP) must keep
    the loss and the post-step params finite — an unguarded exp turns the
    gradient norm infinite and clip_by_global_norm into inf*0 = NaN."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.losses.simota import YOLOXLossConfig
    from yolo_scratch_tpu.models.yolox import YOLOXModel
    from yolo_scratch_tpu.train.optim import cosine_epoch_schedule, make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.steps import build_train_step_custom, yolox_loss_adapter

    ds = SyntheticDataset(n=4, img_size=64, channels=3, num_classes=5)
    loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)
    batch = next(iter(loader))

    model = YOLOXModel.from_scale("nano", nc=5)
    tx = make_optimizer(cosine_epoch_schedule(1e-3, 2, 1, 1), 5e-4, 10.0)
    state = create_train_state(model, jax.random.PRNGKey(0), batch["img"][:1], tx)

    # force divergence: scale every reg_pred kernel/bias so wh logits >> cap
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: x * 2000.0 if any("reg_pred" in str(p) for p in path) else x,
        state.params,
    )
    state = state.replace(params=params)

    step = jax.jit(build_train_step_custom(
        model, yolox_loss_adapter(YOLOXLossConfig(nc=5))))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert all(bool(jnp.all(jnp.isfinite(x)))
               for x in jax.tree_util.tree_leaves(state.params))
