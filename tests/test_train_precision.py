"""train_matmul_precision plumbing (the H2H precision-bisect knob).

On CPU every precision name lowers to the same f32 matmuls, so the
numeric assertion is equality-within-float-noise; what these tests guard
is the plumbing itself — the ``jax.default_matmul_precision`` trace-time
context in ``build_train_step_custom`` (train/steps.py) and the
TrainerConfig → step wiring — which on TPU selects bf16-pass vs bf16x3
vs f32 MXU passes (measured accuracy/cost: docs/H2H.md, docs/PERF.md).
"""

import numpy as np
import pytest

import jax


def _setup(img=64, ch=1, nc=5, B=2, G=4):
    from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=ch, nc=nc, scale="n")
    state = create_train_state(
        model, jax.random.PRNGKey(0), np.zeros((1, img, img, ch), np.float32),
        make_optimizer(1e-3)
    )
    cfg = DetectionLossConfig(nc=nc, strides=model.strides)
    rng = np.random.RandomState(0)
    batch = {
        "img": rng.rand(B, img, img, ch).astype(np.float32),
        "gt_labels": np.zeros((B, G), np.int32),
        "gt_bboxes": np.tile(np.asarray([0.2, 0.2, 0.6, 0.6], np.float32), (B, G, 1)),
        "gt_mask": np.tile(np.asarray([True, False, False, False]), (B, 1)),
    }
    return model, state, cfg, batch


@pytest.mark.parametrize("precision", ["high", "highest"])
def test_precision_step_matches_default_on_cpu(precision):
    from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter

    model, state, cfg, batch = _setup()
    plain = jax.jit(build_train_step_custom(model, v8_loss_adapter(cfg)))
    prec = jax.jit(build_train_step_custom(model, v8_loss_adapter(cfg),
                                           matmul_precision=precision))
    s1, m1 = plain(state, batch)
    s2, m2 = prec(state, batch)
    assert np.isfinite(float(m2["loss"]))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_precision_composes_with_grad_accum_and_bf16():
    """The context wraps the WHOLE step body: grad-accum scan and mixed
    precision both trace inside it without error."""
    from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter
    import jax.numpy as jnp

    model, state, cfg, batch = _setup(B=4)
    step = jax.jit(build_train_step_custom(
        model, v8_loss_adapter(cfg), compute_dtype=jnp.bfloat16,
        grad_accum=2, matmul_precision="highest"))
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_cli_precision_mapping_tracks_config_default():
    """The CLI must not silently override the evidence-backed trainer
    default: flag absent -> TrainerConfig.train_matmul_precision ('high'
    per the round-5 frontier); explicit 'default' -> None (platform
    fast path, the measured -0.032 A/B setting); explicit names pass
    through."""
    from yolo_scratch_tpu.train.cli import resolve_train_precision
    from yolo_scratch_tpu.train.trainer import TrainerConfig

    assert TrainerConfig.train_matmul_precision == "high"
    assert resolve_train_precision(None) == "high"
    assert resolve_train_precision("default") is None
    assert resolve_train_precision("high") == "high"
    assert resolve_train_precision("highest") == "highest"
