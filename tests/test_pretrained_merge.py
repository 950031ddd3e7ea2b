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
