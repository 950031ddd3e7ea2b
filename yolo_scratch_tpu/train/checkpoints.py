"""Checkpointing: orbax-backed last/best policy with resume.

Parity target: reference saves a dict {epoch, model_state_dict,
optimizer_state_dict, train_metrics, val_metrics, best_loss, best_mAP50}
as ``last.pt`` every epoch and ``best.pt`` gated on mAP50 (else val-loss)
(``train_yolo11_cuda.py:628-653``); resume restores model+optimizer+epoch+
bests (``:576-587``). Same policy here over the TrainState pytree.

Reference ``.pt`` checkpoints import through
``yolo_scratch_tpu.utils.torch_import.load_reference_checkpoint``.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _meta_dumps(meta: Dict[str, Any]) -> str:
    """``json.dumps`` with non-finite floats as null. The stdlib emits
    ``Infinity``/``NaN`` (e.g. ``best_loss`` = inf on every mAP-gated
    run), which python reads back but strict JSON parsers (jq,
    ``JSON.parse``, Go/Rust tooling) reject — and checkpoint meta is an
    interchange file. Readers treat null as "never set" (see
    ``try_resume`` / Trainer patience restore)."""
    import math

    def clean(o):
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        if isinstance(o, float) and not math.isfinite(o):
            return None
        return o

    return json.dumps(clean(meta))


def _tree_leaves(tree):
    return [] if tree is None else jax.tree_util.tree_leaves(tree)


def _tree_mismatch(got, want) -> Optional[str]:
    """First structural/shape difference between two pytrees as a short
    human-readable string, or None when they match."""
    if got is None:
        # an empty target (e.g. a BN-free model's batch_stats) matches a
        # checkpoint that stored nothing for the key
        return None if not _tree_leaves(want) else "missing in checkpoint"
    got_paths = {
        jax.tree_util.keystr(kp): np.shape(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(got)[0]
    }
    want_paths = {
        jax.tree_util.keystr(kp): np.shape(leaf)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    for path, shape in want_paths.items():
        if path not in got_paths:
            return f"checkpoint lacks {path}"
        if got_paths[path] != shape:
            return f"{path}: checkpoint {got_paths[path]} vs model {shape}"
    for path in got_paths:
        if path not in want_paths:
            return f"checkpoint has extra {path}"
    return None


class CheckpointManager:
    """Saves ``last`` every epoch and ``best`` on improvement.

    Uses orbax's StandardCheckpointer when available, with a plain
    npz+json fallback (1-core CI environments)."""

    def __init__(self, save_dir: str, use_orbax: bool = True, async_save: bool = True):
        """``async_save``: orbax writes in the background; completion is
        awaited lazily before the *next* save (or restore) touching the same
        checkpointer, so the epoch's checkpoint IO overlaps the next epoch's
        compute instead of stalling the loop."""
        self.dir = Path(save_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.async_save = async_save
        self._orbax = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp.StandardCheckpointer()
            except Exception:
                self._orbax = None

    # -- low-level ---------------------------------------------------------

    @staticmethod
    def _is_writer() -> bool:
        """Multi-host: the train state is REPLICATED across processes
        (dp-only parallelism), so process 0's copy is the whole state.
        Plain-file writes (meta json, npz fallback) happen on process 0
        only; orbax saves are COLLECTIVE — its multihost protocol
        barriers all processes (``sync_global_processes``) and writes
        from the primary — so every process must call ``save``. Every
        process may read (shared filesystem; the reference's resume
        semantics, ``train_yolo11_cuda.py:576-587``)."""
        import jax

        return jax.process_index() == 0

    def wait(self) -> None:
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    def _save_tree(self, name: str, tree: Dict[str, Any]) -> None:
        path = (self.dir / name).resolve()
        if self._orbax is not None:
            # collective on multi-host: all processes call; orbax writes
            # from the primary process only
            self.wait()  # previous async save must land before overwriting
            self._orbax.save(path, _to_numpy_tree(tree), force=True)
            if not self.async_save:
                self._orbax.wait_until_finished()
        elif self._is_writer():
            flat, treedef = jax.tree_util.tree_flatten(_to_numpy_tree(tree))
            np.savez(str(path) + ".npz", *flat)
            (self.dir / (name + ".treedef.json")).write_text(str(treedef))

    def _restore_tree(self, name: str, target: Dict[str, Any]) -> Dict[str, Any]:
        path = (self.dir / name).resolve()
        if self._orbax is not None:
            self.wait()
        if self._orbax is not None and path.is_dir():
            return self._orbax.restore(path, target=_to_numpy_tree(target))
        npz = np.load(str(path) + ".npz", allow_pickle=False)
        flat = [npz[k] for k in npz.files]
        treedef = jax.tree_util.tree_structure(target)
        return jax.tree_util.tree_unflatten(treedef, flat)

    # -- policy ------------------------------------------------------------

    def save_epoch(
        self,
        state,
        epoch: int,
        train_metrics: Dict[str, float],
        val_metrics: Dict[str, float],
        best_loss: float,
        best_map50: float,
        extra_meta: Optional[Dict[str, Any]] = None,
    ) -> Tuple[float, float, bool]:
        """Save ``last``; maybe save ``best``. Returns
        (best_loss, best_map50, saved_best).

        ``extra_meta``: merged into the meta json (e.g. the Trainer's
        early-stopping counters) — kept out of the array tree so old
        checkpoints stay restorable and new ones restore under old code."""
        tree = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params if state.ema_params is not None else {},
            "step": state.step,
        }
        meta = {
            "epoch": epoch,
            "train_metrics": train_metrics,
            "val_metrics": val_metrics,
            "best_loss": best_loss,
            "best_mAP50": best_map50,
        }
        if extra_meta:
            meta.update(extra_meta)
        writer = self._is_writer()
        self._save_tree("last", tree)
        if writer:
            (self.dir / "last.meta.json").write_text(_meta_dumps(meta))

        saved_best = False
        if "mAP50" in val_metrics:
            if val_metrics["mAP50"] > best_map50:
                best_map50 = float(val_metrics["mAP50"])
                meta["best_mAP50"] = best_map50
                self._save_tree("best", tree)
                if writer:
                    (self.dir / "best.meta.json").write_text(_meta_dumps(meta))
                saved_best = True
        elif val_metrics.get("loss", float("inf")) < best_loss:
            best_loss = float(val_metrics["loss"])
            meta["best_loss"] = best_loss
            self._save_tree("best", tree)
            if writer:
                (self.dir / "best.meta.json").write_text(_meta_dumps(meta))
            saved_best = True
        return best_loss, best_map50, saved_best

    def load_meta(self, name: str = "last") -> Optional[Dict[str, Any]]:
        """The checkpoint's meta json (epoch, metrics, bests, any
        ``extra_meta`` from ``save_epoch``), or None when absent."""
        meta_path = self.dir / f"{name}.meta.json"
        if not meta_path.exists():
            return None
        return json.loads(meta_path.read_text())

    def peek_raw(self, name: str = "best") -> Optional[Dict[str, Any]]:
        """Restore the checkpoint as a raw tree (no target) for shape
        inspection — lets CLIs auto-detect model dims (nc, in-channels)
        before building the model. Returns None when unsupported (npz
        fallback stores no tree structure)."""
        path = (self.dir / name).resolve()
        if self._orbax is None or not path.is_dir():
            return None
        self.wait()
        try:
            return self._orbax.restore(path)
        except Exception:
            return None

    def try_resume(self, state, name: str = "last"):
        """Restore (state, start_epoch, best_loss, best_map50) if a
        checkpoint exists, else (state, 0, inf, 0.0)."""
        meta_path = self.dir / f"{name}.meta.json"
        if not meta_path.exists():
            return state, 0, float("inf"), 0.0
        meta = json.loads(meta_path.read_text())
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "ema_params": state.ema_params if state.ema_params is not None else {},
            "step": state.step,
        }
        try:
            tree = self._restore_tree(name, target)
            opt_state = tree["opt_state"]
            restore_err = None
        except Exception as err:
            restore_err = err
        if restore_err is not None:
            # Restore-with-target failed. The benign cause is optimizer-
            # format drift (e.g. optax.flatten changed the opt_state
            # structure): salvage weights/stats/step from the raw tree and
            # keep a FRESH optimizer state (eval paths never read opt_state;
            # a true training resume restarts its moments). But only after
            # VALIDATING that the salvaged weights match the target
            # architecture — a wrong --scale/--nc or a missing-EMA mismatch
            # must surface here, not as an opaque flax error later.
            raw = self.peek_raw(name)
            if raw is None:
                # not salvageable: surface the original restore failure
                # (a bare ``raise`` here is outside the except block and
                # would itself raise "No active exception to reraise")
                raise restore_err
            for key in ("params", "batch_stats"):
                mismatch = _tree_mismatch(raw.get(key), target[key])
                if mismatch:
                    raise ValueError(
                        f"checkpoint '{name}': {key} do not match the model "
                        f"being restored into ({mismatch}). Wrong --cfg/"
                        "--scale/--nc/--ch for this checkpoint?"
                    ) from restore_err
            if state.ema_params is not None and not _tree_leaves(raw.get("ema_params")):
                raise ValueError(
                    f"checkpoint '{name}' stores no EMA parameters (trained "
                    "without EMA) — drop --ema, or resume without requesting "
                    "EMA weights."
                ) from restore_err
            import warnings

            warnings.warn(
                f"checkpoint '{name}': opt_state structure mismatch — "
                "restored weights/stats only, optimizer state reset",
                stacklevel=2,
            )
            tree = raw
            opt_state = state.opt_state
        else:
            # orbax restore-with-target accepts mismatched LEAF SHAPES when
            # the tree structure lines up (verified: an nc=5 checkpoint
            # restores "successfully" into an nc=80 target), so the
            # architecture check must run on the happy path too.
            for key in ("params", "batch_stats"):
                mismatch = _tree_mismatch(tree.get(key), target[key])
                if mismatch:
                    raise ValueError(
                        f"checkpoint '{name}': {key} do not match the model "
                        f"being restored into ({mismatch}). Wrong --cfg/"
                        "--scale/--nc/--ch for this checkpoint?"
                    )
            if state.ema_params is not None and not _tree_leaves(tree.get("ema_params")):
                raise ValueError(
                    f"checkpoint '{name}' stores no EMA parameters (trained "
                    "without EMA) — drop --ema, or resume without requesting "
                    "EMA weights."
                )
        ema = tree["ema_params"] if state.ema_params is not None else None
        if ema is not None and isinstance(ema, dict) != isinstance(state.ema_params, dict):
            # EMA storage-format drift: per-leaf tree checkpoint into a
            # flat-EMA state (ravel), or flat checkpoint into a per-leaf
            # state (unravel via the params template) — see TrainState.flat_opt
            from jax.flatten_util import ravel_pytree

            if isinstance(ema, dict):
                ema, _ = ravel_pytree(ema)
            else:
                _, unravel = ravel_pytree(state.params)
                ema = unravel(jax.numpy.asarray(ema))
        state = state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=opt_state,
            ema_params=ema,
            step=jax.numpy.asarray(tree["step"]),
        )
        # null = non-finite sanitized at write time (_meta_dumps): restore
        # the "never set" sentinels
        best_loss = meta.get("best_loss")
        best_map50 = meta.get("best_mAP50")
        return (
            state,
            int(meta["epoch"]) + 1,
            float("inf") if best_loss is None else float(best_loss),
            0.0 if best_map50 is None else float(best_map50),
        )
