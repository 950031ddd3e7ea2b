"""Loader: multiscale bucketing, wrapping, guards."""

import numpy as np
import pytest


def test_multiscale_buckets_static_and_seeded():
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=16, img_size=64, channels=1)
    loader = Loader(
        ds, batch_size=2, max_gt=8, prefetch=0,
        multiscale_sizes=[32, 64, 96], multiscale_interval=2,
    )
    sizes = [b["img"].shape[1] for b in loader]
    assert len(sizes) == 8
    assert set(sizes) <= {32, 64, 96}
    # interval of 2 -> consecutive pairs share a size
    assert all(sizes[i] == sizes[i + 1] for i in range(0, 8, 2))
    assert len(set(sizes)) > 1  # actually varies across buckets

    # boxes remain normalized regardless of image size
    for b in Loader(ds, batch_size=4, max_gt=8, prefetch=0,
                    multiscale_sizes=[32], multiscale_interval=1):
        assert b["img"].shape[1] == 32
        assert (b["gt_bboxes"] >= 0).all() and (b["gt_bboxes"] <= 1).all()


def test_loader_wraps_final_batch():
    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=5, img_size=32, channels=1)
    loader = Loader(ds, batch_size=4, max_gt=8, prefetch=0)
    batches = list(loader)
    assert len(batches) == 2
    assert all(b["img"].shape[0] == 4 for b in batches)


def test_guards():
    import jax.numpy as jnp
    from yolo_scratch_tpu.utils.guards import finite_or_raise, tree_all_finite

    assert bool(tree_all_finite({"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}))
    assert not bool(tree_all_finite({"a": jnp.asarray([1.0, np.nan])}))
    finite_or_raise({"loss": 1.0})
    with pytest.raises(FloatingPointError):
        finite_or_raise({"loss": float("nan")})
