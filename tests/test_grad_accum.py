"""Gradient accumulation: k microbatches per optimizer step via lax.scan.

Semantics (steps.build_train_step_custom docstring): each microbatch's
loss normalizes over its own targets, gradients average, BN statistics
update sequentially — so k=2 must equal a hand-rolled two-pass reference
(same math; tolerance only for XLA compiling the scan body and the
unrolled reference into different fusion/reduction orders), and k=1 must
equal the plain step.
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_scratch_tpu.losses.v8_loss import DetectionLossConfig
from yolo_scratch_tpu.models.builder import build_yolo11
from yolo_scratch_tpu.train.optim import make_optimizer
from yolo_scratch_tpu.train.state import create_train_state
from yolo_scratch_tpu.train.steps import build_train_step_custom, v8_loss_adapter

CFG = str(Path(__file__).resolve().parent.parent
          / "yolo_scratch_tpu/configs/yolo11_crater.yaml")


def _setup(imgsz=96, batch=4, nc=5, seed=0, tx=None):
    model = build_yolo11(CFG, ch=1, nc=nc, scale="n")
    state = create_train_state(
        model, jax.random.PRNGKey(seed),
        np.zeros((1, imgsz, imgsz, 1), np.float32),
        tx if tx is not None else make_optimizer(),
    )
    rng = np.random.RandomState(seed)
    G = 8
    boxes = rng.rand(batch, G, 4).astype(np.float32) * 0.4
    boxes = np.concatenate([boxes[..., :2], boxes[..., :2] + 0.2 + boxes[..., 2:] * 0.5], -1)
    batch_d = {
        "img": jnp.asarray(rng.rand(batch, imgsz, imgsz, 1).astype(np.float32)),
        "gt_labels": jnp.asarray(rng.randint(0, nc, (batch, G)).astype(np.int32)),
        "gt_bboxes": jnp.asarray(np.clip(boxes, 0, 1)),
        "gt_mask": jnp.asarray(rng.rand(batch, G) < 0.7),
    }
    loss_cfg = DetectionLossConfig(nc=model.nc, strides=model.strides)
    return model, state, batch_d, v8_loss_adapter(loss_cfg)


def _tree_allclose(a, b, rtol=0, atol=0):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def test_grad_accum_one_is_plain_step():
    model, state, batch, loss_fn = _setup()
    s1, m1 = jax.jit(build_train_step_custom(model, loss_fn))(state, batch)
    model2, state2, batch2, loss_fn2 = _setup()
    s2, m2 = jax.jit(build_train_step_custom(model2, loss_fn2, grad_accum=1))(state2, batch2)
    _tree_allclose((s1.params, s1.batch_stats, m1), (s2.params, s2.batch_stats, m2))


def test_grad_accum_two_matches_manual_reference():
    """k=2 == run value_and_grad on microbatch 1 (BN stats flow into
    microbatch 2), mean the gradients, apply once — exactly.

    Plain SGD: the update is LINEAR in the gradients, so the post-step
    param delta IS the gradient comparison. (AdamW's m/(sqrt(v)+eps)
    amplifies XLA's scan-vs-unrolled reassociation noise unboundedly for
    near-zero gradients — that would test the optimizer's conditioning,
    not accumulation semantics.)"""
    import optax

    model, state, batch, loss_fn = _setup(batch=4, tx=optax.sgd(0.1))

    accum_step = jax.jit(build_train_step_custom(model, loss_fn, grad_accum=2))
    got_state, got_metrics = accum_step(state, batch)

    # manual reference with the same sequential-BN semantics
    def wrapped(params, bs, mb):
        feats, mut = model.apply(
            {"params": params, "batch_stats": bs}, mb["img"],
            train=True, mutable=["batch_stats"])
        total, metrics = loss_fn(feats, mb)
        return total, (metrics, mut["batch_stats"])

    @jax.jit
    def manual(state, batch):
        # the step uses a STRIDED split (microbatch i = rows i::k) so each
        # scan iteration stays device-local under a dp-sharded batch
        mb1 = jax.tree_util.tree_map(lambda x: x[0::2], batch)
        mb2 = jax.tree_util.tree_map(lambda x: x[1::2], batch)
        (l1, (m1, bs1)), g1 = jax.value_and_grad(wrapped, has_aux=True)(
            state.params, state.batch_stats, mb1)
        (l2, (m2, bs2)), g2 = jax.value_and_grad(wrapped, has_aux=True)(
            state.params, bs1, mb2)
        grads = jax.tree_util.tree_map(lambda a, b: (a + b) * 0.5, g1, g2)
        metrics = jax.tree_util.tree_map(lambda a, b: (a + b) * 0.5, m1, m2)
        new_state = state.replace(batch_stats=bs2).apply_gradients(grads)
        return new_state, {"loss": (l1 + l2) * 0.5, **metrics}

    want_state, want_metrics = manual(state, batch)
    # same math, but the scan body and the unrolled reference are two
    # DIFFERENT XLA programs: backward fusion/reduction orders differ, so
    # per-microbatch grads disagree at the ~1e-5 level (observed max rel
    # 2e-4 on a 16-element BN leaf). Tolerance sits well below any
    # semantic failure: a sum-instead-of-mean is 2x off, broken BN
    # threading shifts stats by >1e-2.
    _tree_allclose(got_state.params, want_state.params, rtol=1e-3, atol=1e-5)
    _tree_allclose(got_state.batch_stats, want_state.batch_stats, rtol=1e-3, atol=1e-5)
    for k in want_metrics:
        np.testing.assert_allclose(
            np.asarray(got_metrics[k]), np.asarray(want_metrics[k]),
            rtol=1e-5, err_msg=k)
    assert int(got_state.step) == int(state.step) + 1  # ONE optimizer step


def test_grad_accum_trainer_converges(tmp_path):
    """Trainer-level: grad_accum=2 trains end-to-end (loss finite and
    decreasing over a few epochs on synthetic data)."""
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    ds = SyntheticDataset(n=8, img_size=96, channels=1, num_classes=5)
    loader = Loader(ds, batch_size=4, max_gt=16, prefetch=0)
    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    cfg = TrainerConfig(
        epochs=3, lr=5e-3, warmup_epochs=0, grad_accum=2,
        save_dir=str(tmp_path / "run"), max_val_batches=1)
    tr = Trainer(model, loader, loader, cfg, seed=0)
    out = tr.fit(resume=False)
    losses = [h["train"]["loss"] for h in out["history"]]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_grad_accum_rejects_indivisible_batch():
    from yolo_scratch_tpu.train.cli import main as cli_main

    with pytest.raises(SystemExit, match="multiple of"):
        cli_main(["--data", "synthetic", "--epochs", "1",
                  "--batch", "6", "--grad-accum", "4", "--imgsz", "96"])


def test_grad_accum_on_dp_mesh():
    """jit-sharded (sync-BN) path with grad_accum=2: the microbatch reshape
    of a dp-sharded batch compiles under GSPMD and the step stays finite
    and replicated. Microbatch size must remain divisible by the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from yolo_scratch_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")

    model, state, batch, loss_fn = _setup(imgsz=64, batch=8)
    mesh = make_mesh(4)
    raw = build_train_step_custom(model, loss_fn, grad_accum=2)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))
    step = jax.jit(raw, in_shardings=(repl, data), out_shardings=(repl, repl))
    s2, metrics = step(replicate(state, mesh), shard_batch(batch, mesh))
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves((s2.params, s2.batch_stats)):
        assert np.isfinite(np.asarray(leaf)).all()
