"""Partial pretrained load (reference strict=False semantics)."""

import numpy as np
import pytest


def test_merge_pretrained_skips_mismatches():
    from yolo_scratch_tpu.utils.torch_import import merge_pretrained

    init = {
        "a": {"kernel": np.zeros((3, 3, 1, 8), np.float32)},
        "b": {"kernel": np.zeros((1, 1, 8, 5), np.float32)},  # e.g. nc head
        "c": {"bias": np.zeros((4,), np.float32)},
    }
    loaded = {
        "a": {"kernel": np.ones((3, 3, 1, 8), np.float32)},
        "b": {"kernel": np.ones((1, 1, 8, 80), np.float32)},  # nc mismatch
        # "c" missing entirely
    }
    merged, skipped = merge_pretrained(init, loaded, strict=False)
    assert (merged["a"]["kernel"] == 1).all()
    assert (merged["b"]["kernel"] == 0).all()  # mismatch kept at init
    assert (merged["c"]["bias"] == 0).all()
    assert any("b" in s for s in skipped) and any("c" in s for s in skipped)

    with pytest.raises(ValueError):
        merge_pretrained(init, loaded, strict=True)


def test_merge_pretrained_full_roundtrip():
    import jax
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.utils.torch_import import merge_pretrained

    model = build_yolo11("yolo_scratch_tpu/configs/yolo11_crater.yaml", ch=1, nc=5, scale="n")
    v = model.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 1), np.float32))
    v2 = model.init(jax.random.PRNGKey(1), np.zeros((1, 64, 64, 1), np.float32))
    merged, skipped = merge_pretrained(v["params"], v2["params"])
    assert not skipped
    a = jax.tree_util.tree_leaves(merged)
    b = jax.tree_util.tree_leaves(v2["params"])
    assert all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_trainer_pretrained_warm_start(tmp_path):
    """TrainerConfig.pretrained: same-arch checkpoint loads fully; a
    different-nc checkpoint loads the backbone and keeps the head init
    (reference strict=False semantics, models/yolo11_model.py:273-286)."""
    import jax

    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    CFG = "yolo_scratch_tpu/configs/yolo11_crater.yaml"
    src_model = build_yolo11(CFG, ch=1, nc=5, scale="n")
    src = create_train_state(
        src_model, jax.random.PRNGKey(123),
        np.zeros((1, 64, 64, 1), np.float32), make_optimizer())
    mgr = CheckpointManager(str(tmp_path / "src"), async_save=False)
    mgr.save_epoch(src, 0, {}, {"mAP50": 0.5}, float("inf"), 0.0)
    mgr.wait()

    ds = SyntheticDataset(n=4, img_size=64, channels=1, num_classes=5)
    loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)

    # same-arch: every leaf equals the checkpoint
    tr = Trainer(build_yolo11(CFG, ch=1, nc=5, scale="n"), loader, loader,
                 TrainerConfig(epochs=1, pretrained=str(tmp_path / "src")),
                 seed=0)
    for got, want in zip(jax.tree_util.tree_leaves(tr.state.params),
                         jax.tree_util.tree_leaves(src.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # nc mismatch: backbone loads, the nc-sized head rows keep their init
    tr80 = Trainer(build_yolo11(CFG, ch=1, nc=80, scale="n"), loader, loader,
                   TrainerConfig(epochs=1, pretrained=str(tmp_path / "src")),
                   seed=0)
    flat_got = jax.tree_util.tree_flatten_with_path(tr80.state.params)[0]
    flat_src = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                jax.tree_util.tree_flatten_with_path(src.params)[0]}
    loaded = mismatch = 0
    for k, v in flat_got:
        key = jax.tree_util.keystr(k)
        if key in flat_src and flat_src[key].shape == np.asarray(v).shape:
            np.testing.assert_array_equal(np.asarray(v), flat_src[key])
            loaded += 1
        else:
            mismatch += 1
    assert loaded > 0 and mismatch > 0  # partial load really is partial
