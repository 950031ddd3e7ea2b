"""Import reference (PyTorch) YOLO11 weights into our flax variable tree.

The reference checkpoints store ``model_state_dict`` with Ultralytics-style
keys like ``model.23.cv2.0.2.bias`` (``train_yolo11_cuda.py:628-636``). Our
flax params use the mirrored paths ``model_23 / cv2_0_2 / bias`` (the graph
builder names layer i ``model_{i}`` and joins numeric indices with
underscores), so conversion is a pure path rewrite plus layout transposes:

* conv weights   (O, I, kh, kw) -> (kh, kw, I, O)   (NHWC kernels)
* BN weight/bias -> scale/bias in ``params``;
  running_mean/var -> mean/var in ``batch_stats``.
* the DFL frozen-arange conv (``yolo11_modules.py:185-188``) has no
  counterpart here (pure softmax-expectation) and is dropped.

Used both for loading real reference checkpoints and for golden-parity tests
that transplant a live torch model's weights.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _merge_numeric_tokens(key: str) -> list[str]:
    """'model.23.cv2.0.2.bias' -> ['model_23', 'cv2_0_2', 'bias']."""
    out: list[str] = []
    for tok in key.split("."):
        if tok.isdigit() and out:
            out[-1] = f"{out[-1]}_{tok}"
        else:
            out.append(tok)
    return out


def _insert(tree: Dict[str, Any], path: list[str], value) -> None:
    node = tree
    for tok in path[:-1]:
        node = node.setdefault(tok, {})
    node[path[-1]] = value


def convert_reference_state_dict(
    state_dict: Mapping[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torch ``state_dict`` -> (params, batch_stats) nested dicts of np arrays."""
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    for key, tensor in state_dict.items():
        tokens = _merge_numeric_tokens(key)
        if "dfl" in key.split("."):
            continue
        leaf = tokens[-1]
        if leaf == "num_batches_tracked":
            continue
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        parent = tokens[:-1]

        if parent and parent[-1] == "bn":
            if leaf == "weight":
                _insert(params, parent + ["scale"], arr)
            elif leaf == "bias":
                _insert(params, parent + ["bias"], arr)
            elif leaf == "running_mean":
                _insert(batch_stats, parent + ["mean"], arr)
            elif leaf == "running_var":
                _insert(batch_stats, parent + ["var"], arr)
            else:
                raise ValueError(f"unexpected BN leaf in {key}")
        elif leaf == "weight":
            if arr.ndim != 4:
                raise ValueError(f"unexpected weight rank {arr.ndim} at {key}")
            _insert(params, parent + ["kernel"], arr.transpose(2, 3, 1, 0))
        elif leaf == "bias":
            _insert(params, parent + ["bias"], arr)
        else:
            raise ValueError(f"unhandled torch key {key}")

    return params, batch_stats


def merge_pretrained(init_tree, loaded_tree, strict: bool = False):
    """Overlay loaded weights onto an init tree, skipping missing keys and
    shape mismatches when ``strict`` is False — the reference's partial
    pretrained load (``models/yolo11_model.py:273-286`` uses
    ``load_state_dict(..., strict=False)`` to tolerate first/last-layer
    size changes, e.g. different nc or input channels).

    Returns (merged_tree, skipped: list of path strings)."""
    skipped: list[str] = []

    def walk(init_node, loaded_node, path):
        if not isinstance(init_node, dict):
            loaded = np.asarray(loaded_node)
            if loaded.shape != np.asarray(init_node).shape:
                if strict:
                    raise ValueError(f"shape mismatch at {path}: {loaded.shape}")
                skipped.append(path)
                return init_node
            return loaded
        out = {}
        for k, v in init_node.items():
            if isinstance(loaded_node, dict) and k in loaded_node:
                out[k] = walk(v, loaded_node[k], f"{path}/{k}")
            else:
                if strict:
                    raise KeyError(f"missing {path}/{k} in pretrained tree")
                skipped.append(f"{path}/{k}")
                out[k] = v
        return out

    return walk(init_tree, loaded_tree, ""), skipped


def load_reference_checkpoint(path: str):
    """Load a reference ``last.pt``/``best.pt`` into (params, batch_stats).

    Checkpoint dict layout per ``train_yolo11_cuda.py:628-636`` /
    ``models/yolo11_model.py:273-286``.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt.get("model", ckpt))
    return convert_reference_state_dict(sd)
