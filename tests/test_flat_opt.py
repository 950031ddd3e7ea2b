"""Per-leaf vs flat (N,)-master optimizer equivalence.

TrainState.flat_opt ravels grads/params to one vector before the optax
chain; per-leaf (the default) applies the chain leafwise. On CPU f32 the
two must produce the same parameters, EMA and moments to float tolerance
(the only reorder is clip's global-norm sum: tree-reduce vs concat-reduce).
Hardware A/B (timing) lives in scripts/probe_opt_flat.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.optim import make_optimizer
    from yolo_scratch_tpu.train.state import create_train_state

    import pathlib

    cfg = str(pathlib.Path(__file__).parent.parent
              / "yolo_scratch_tpu/configs/yolo11_crater.yaml")
    model = build_yolo11(cfg, ch=1, nc=5, scale="n")
    sample = np.zeros((1, 64, 64, 1), np.float32)

    def mk(flat_opt):
        return create_train_state(
            model, jax.random.PRNGKey(0), sample, make_optimizer(1e-3),
            use_ema=True, flat_opt=flat_opt,
        )

    return model, mk


def _fake_grads(params, seed=0):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.RandomState(seed)
    g = [jnp.asarray(rng.randn(*l.shape).astype(np.float32) * 1e-3)
         for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, g)


def test_flat_matches_per_leaf(tiny_setup):
    from yolo_scratch_tpu.train.state import ema_as_tree

    _, mk = tiny_setup
    s_leaf, s_flat = mk(False), mk(True)
    for step in range(3):
        grads = _fake_grads(s_leaf.params, seed=step)
        s_leaf = s_leaf.apply_gradients(grads)
        s_flat = s_flat.apply_gradients(grads)

    p_leaf = jax.tree_util.tree_leaves(s_leaf.params)
    p_flat = jax.tree_util.tree_leaves(s_flat.params)
    for a, b in zip(p_leaf, p_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)

    e_leaf = jax.tree_util.tree_leaves(s_leaf.ema_params)
    e_flat = jax.tree_util.tree_leaves(
        ema_as_tree(s_flat.ema_params, s_flat.params))
    for a, b in zip(e_leaf, e_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_opt_state_pytree_compatible(tiny_setup):
    """flat chain state == optax.flatten state (checkpoint interop)."""
    import optax

    from yolo_scratch_tpu.train.optim import make_optimizer

    _, mk = tiny_setup
    s_flat = mk(True)
    from jax.flatten_util import ravel_pytree

    flat_p, _ = ravel_pytree(s_flat.params)
    wrapped = make_optimizer(1e-3, flatten=True)
    st_wrapped = wrapped.init(s_flat.params)
    same = jax.tree_util.tree_structure(s_flat.opt_state) == \
        jax.tree_util.tree_structure(st_wrapped)
    assert same, "flat chain state and optax.flatten state must match"


def test_ema_format_drift_restore(tmp_path, tiny_setup):
    """Resume converts EMA storage format both directions."""
    from yolo_scratch_tpu.train.checkpoints import CheckpointManager
    from yolo_scratch_tpu.train.state import ema_as_tree

    _, mk = tiny_setup
    for save_flat, load_flat in ((True, False), (False, True)):
        d = tmp_path / f"ck_{save_flat}"
        mgr = CheckpointManager(str(d), async_save=False)
        src = mk(save_flat)
        mgr.save_epoch(src, 0, {}, {"loss": 1.0}, float("inf"), 0.0)
        mgr.wait()
        dst = mk(load_flat)
        restored, start, _, _ = mgr.try_resume(dst)
        assert start == 1
        a = jax.tree_util.tree_leaves(
            ema_as_tree(restored.ema_params, restored.params))
        b = jax.tree_util.tree_leaves(
            ema_as_tree(src.ema_params, src.params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))
