"""Checkpoint restore validation + console-script exit semantics.

The try_resume fallback for optimizer-format drift must NOT mask real
mismatches: restoring a checkpoint into a wrong-architecture model, or
requesting EMA weights from a checkpoint trained without EMA, has to fail
loudly at restore time (reference resume semantics:
``train_yolo11_cuda.py:576-587`` raise on a state_dict mismatch), not as
an opaque flax apply error later. And every ``yst-*`` console script must
exit 0 on success — setuptools passes main()'s return value to
``sys.exit``, so the packaged entry points go through a ``cli()`` wrapper
that discards it.
"""

from pathlib import Path

import numpy as np
import pytest

import jax

CFG = str(Path(__file__).resolve().parent.parent
          / "yolo_scratch_tpu/configs/yolo11_crater.yaml")


def _make_state(ch=1, nc=5, imgsz=64, use_ema=False):
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    model = build_yolo11(CFG, ch=ch, nc=nc, scale="n")
    return create_train_state(
        model, jax.random.PRNGKey(0),
        np.zeros((1, imgsz, imgsz, ch), np.float32), make_optimizer(),
        use_ema=use_ema,
    )


def _save(tmp_path, state):
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save_epoch(state, 0, {}, {"mAP50": 0.5}, float("inf"), 0.0)
    mgr.wait()
    return mgr


def test_resume_wrong_arch_raises(tmp_path):
    """nc=5 checkpoint into an nc=80 target: a clear ValueError naming the
    mismatch, not a silent wrong-architecture salvage."""
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager

    _save(tmp_path, _make_state(nc=5))
    target = _make_state(nc=80)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="params do not match"):
        mgr.try_resume(target, name="last")


def test_resume_missing_ema_raises(tmp_path):
    """Checkpoint trained WITHOUT EMA restored into a state requesting EMA
    weights: loud error, not ema_params={} crashing inside model.apply."""
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager

    _save(tmp_path, _make_state(use_ema=False))
    target = _make_state(use_ema=True)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="EMA"):
        mgr.try_resume(target, name="last")


def test_resume_opt_drift_salvages(tmp_path):
    """The benign case the fallback exists for: same weights, different
    opt_state structure (flat vs per-leaf optimizer) — weights restore,
    optimizer state resets, a warning names the cause."""
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    _save(tmp_path, _make_state())
    model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    target = create_train_state(
        model, jax.random.PRNGKey(1),
        np.zeros((1, 64, 64, 1), np.float32), make_optimizer(),
        flat_opt=True,  # different opt_state structure than the checkpoint
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    with pytest.warns(UserWarning, match="opt_state structure mismatch"):
        restored, start, _, _ = mgr.try_resume(target, name="last")
    assert start == 1
    # weights came from the checkpoint, optimizer state stayed fresh
    src = _make_state()
    got = jax.tree_util.tree_leaves(restored.params)
    want = jax.tree_util.tree_leaves(src.params)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_resume_unsalvageable_surfaces_original_error(tmp_path):
    """Restore fails AND no raw tree is salvageable (npz fallback has no
    tree structure to peek): try_resume must re-raise the ORIGINAL restore
    failure. A bare ``raise`` at that point sits outside the except block
    and throws ``RuntimeError: No active exception to reraise``, burying
    the real cause — the bug that broke the multihost resume test."""
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager

    state = _make_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), use_orbax=False)
    mgr.save_epoch(state, 0, {}, {"mAP50": 0.5}, float("inf"), 0.0)
    # meta says a checkpoint exists, but the array payload is gone: the
    # np.load failure is the error the user needs to see
    (tmp_path / "ckpt" / "last.npz").unlink()
    with pytest.raises(FileNotFoundError):
        mgr.try_resume(_make_state(), name="last")


def test_load_deploy_model_forced_mismatch_raises(tmp_path):
    """Deploy auto-detect serves the checkpoint directly; forcing a wrong
    --nc must fail with the mismatch named, before any compile."""
    from yolo_scratch_tpu.infer import load_deploy_model

    _save(tmp_path, _make_state(nc=5))
    with pytest.raises(ValueError, match="do not match"):
        load_deploy_model(CFG, imgsz=64, ckpt=str(tmp_path / "ckpt"), nc=80)


def test_load_deploy_model_unknown_yolox_scale_raises():
    from yolo_scratch_tpu.infer import load_deploy_model

    with pytest.raises(ValueError, match="YOLOX scale"):
        load_deploy_model(CFG, scale="m-typo", imgsz=64, model_kind="yolox")


def test_console_script_wrappers_discard_return(monkeypatch):
    """pyproject's yst-* entry points target cli(), which must swallow
    main()'s result object (sys.exit(non-int) would exit 1 on success)."""
    import tomllib

    import yolo_scratch_tpu.export as export_mod
    import yolo_scratch_tpu.infer as infer_mod
    import yolo_scratch_tpu.serve as serve_mod
    import yolo_scratch_tpu.train.cli as train_mod
    import yolo_scratch_tpu.val as val_mod

    pyproject = Path(__file__).resolve().parent.parent / "pyproject.toml"
    scripts = tomllib.loads(pyproject.read_text())["project"]["scripts"]
    assert set(scripts) == {
        "yst-train", "yst-val", "yst-infer", "yst-export", "yst-serve"}
    for target in scripts.values():
        assert target.endswith(":cli"), target

    for mod in (train_mod, val_mod, infer_mod, export_mod, serve_mod):
        monkeypatch.setattr(mod, "main", lambda argv=None: {"not": "an int"})
        assert mod.cli([]) is None
