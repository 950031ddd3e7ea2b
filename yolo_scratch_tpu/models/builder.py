"""YAML model-graph builder.

Accepts the reference's Ultralytics-style YAML dialect — rows of
``[from, repeats, module, args]`` with a ``scales`` table — and compiles it
into a static flax module graph. Parity target: reference
``models/yolo11_model.py:73-170`` (parse_model), with two deliberate fixes:

* module/arg strings resolve through a **registry whitelist**, never
  ``eval()`` (reference ``:110-118``);
* Detect strides are derived **arithmetically** from the topology (Conv s=2
  doubles, Upsample halves) instead of a dummy 640x640 forward pass
  (reference ``_compute_strides``, ``:194-229``).

Quirk preserved for parity: the reference ignores the scales table's
``max_channels`` entry entirely (its ``parse_model`` never clamps), so wide
scales (m/l/x) are wider than stock Ultralytics. We match the reference.
"""

from __future__ import annotations

import ast
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import yaml
from flax import linen as nn

from yolo_scratch_tpu.nn import modules as M


def make_divisible(x: float, divisor: int = 8) -> int:
    """Reference ``yolo11_model.py:172-175``."""
    return int(math.ceil(x / divisor) * divisor)


# Registry whitelist: YAML module-name -> (kind tag). Arg handling per kind
# happens in parse_model_config.
_MODULE_KINDS = {
    "Conv": "conv",
    "Bottleneck": "bottleneck",
    "C2f": "c2f",
    "C3k2": "c3k2",
    "SPPF": "sppf",
    "C2PSA": "c2psa",
    "nn.Upsample": "upsample",
    "Upsample": "upsample",
    "Concat": "concat",
    "Detect": "detect",
}

_CHANNEL_KINDS = {"conv", "bottleneck", "sppf", "c2f", "c3k2", "c2psa"}


def _resolve_arg(a: Any, names: Dict[str, Any]) -> Any:
    """Whitelisted stand-in for the reference's ``eval(a)`` on string args."""
    if isinstance(a, str):
        if a in names:
            return names[a]
        try:
            return ast.literal_eval(a)
        except (ValueError, SyntaxError):
            return a
    return a


def parse_model_config(
    d: Dict[str, Any], ch: int, nc: int | None = None, scale: str | None = None, verbose: bool = False
) -> Dict[str, Any]:
    """Parse a model YAML dict into a static layer plan.

    Returns a dict with:
      ``layers``: list of per-layer specs
        (index, from, kind, kwargs-dict, save: bool)
      ``nc``, ``ch``, ``scale``, ``strides`` (Detect strides), ``save`` set.
    """
    d = dict(d)
    nc = int(nc if nc is not None else d.get("nc", 80))
    scale = scale or d.get("scale")
    if scale is None or scale not in d.get("scales", {}):
        scale = next(iter(d["scales"].keys()))
    gd, gw = float(d["scales"][scale][0]), float(d["scales"][scale][1])

    names = {"nc": nc, "None": None}

    ch_list: List[int] = [int(ch)]
    stride_list: List[float] = [1.0]  # stride of the *input* to layer 0
    layers: List[Tuple] = []
    save: set[int] = set()
    detect_strides: Tuple[float, ...] = ()
    detect_index = -1

    rows = list(d["backbone"]) + list(d["head"])
    for i, (f, n, mname, args) in enumerate(rows):
        kind = _MODULE_KINDS.get(str(mname))
        if kind is None:
            raise ValueError(f"Unknown module {mname!r} in YAML row {i} (whitelist: {sorted(_MODULE_KINDS)})")
        args = [_resolve_arg(a, names) for a in args]
        n = max(round(n * gd), 1) if n > 1 else n

        f_idx = f if isinstance(f, int) else list(f)
        in_ch = ch_list[f_idx] if isinstance(f_idx, int) else [ch_list[x] for x in f_idx]
        in_stride = stride_list[f_idx] if isinstance(f_idx, int) else stride_list[f_idx[0]]

        def _take(rest, spec, row_kind):
            """Map positional YAML args to named kwargs per ``spec``
            [(name, default), ...]; reject extras loudly (the reference's
            ``eval``-based parser forwards everything positionally, so a row
            it accepts must either work here or fail with a clear error)."""
            if len(rest) > len(spec):
                raise ValueError(
                    f"{row_kind} row {i}: {len(rest)} extra args {rest!r}, "
                    f"supported: {[s[0] for s in spec]}"
                )
            out = {nm: default for nm, default in spec}
            for (nm, _), val in zip(spec, rest):
                out[nm] = val
            return out

        kwargs: Dict[str, Any] = {}
        out_stride = in_stride
        if kind in _CHANNEL_KINDS:
            c1, c2 = in_ch, args[0]
            if c2 != nc:
                c2 = make_divisible(c2 * gw, 8)
            rest = args[1:]
            if kind == "conv":
                # reference Conv(c1, c2, k=1, s=1, p=None, g=1, d=1)
                kwargs = {"c2": c2, **_take(rest, [("k", 1), ("s", 1), ("p", None),
                                                   ("g", 1), ("d", 1)], "Conv")}
                out_stride = in_stride * kwargs["s"]
            elif kind == "bottleneck":
                # reference Bottleneck(c1, c2, shortcut=True, g=1, k=(3,3), e=0.5)
                kwargs = {"c2": c2, **_take(rest, [("shortcut", True), ("g", 1),
                                                   ("k", (3, 3)), ("e", 0.5)], "Bottleneck")}
                kwargs["k"] = tuple(kwargs["k"]) if isinstance(kwargs["k"], (list, tuple)) else (kwargs["k"], kwargs["k"])
            elif kind == "sppf":
                kwargs = {"c2": c2, **_take(rest, [("k", 5)], "SPPF")}
            elif kind == "c2f":
                # reference C2f(c1, c2, n, shortcut=False, g=1, e=0.5)
                kwargs = {"c2": c2, "n": n,
                          **_take(rest, [("shortcut", False), ("g", 1), ("e", 0.5)], "C2f")}
                n = 1
            elif kind == "c3k2":
                # reference C3k2(c1, c2, n, c3k=False, e=0.5, g=1, shortcut=True)
                kwargs = {"c2": c2, "n": n,
                          **_take(rest, [("c3k", False), ("e", 0.5), ("g", 1),
                                         ("shortcut", True)], "C3k2")}
                n = 1
            elif kind == "c2psa":
                # reference C2PSA(c1, c2, n, e=0.5)
                kwargs = {"c2": c2, "n": n, **_take(rest, [("e", 0.5)], "C2PSA")}
                n = 1
            out_ch = c2
        elif kind == "upsample":
            # reference rows: [None, 2, 'nearest'] -> nn.Upsample(size,
            # scale_factor, mode). Only 2x nearest is compiled; reject the
            # rest loudly instead of silently upsampling wrong.
            up = _take(args, [("size", None), ("scale", 2), ("mode", "nearest")], "Upsample")
            if up["size"] is not None or int(up["scale"]) != 2 or up["mode"] != "nearest":
                raise ValueError(
                    f"Upsample row {i}: only scale_factor=2 mode='nearest' is "
                    f"supported, got {args!r}"
                )
            out_ch = in_ch
            out_stride = in_stride / 2.0
            kwargs = {}
        elif kind == "concat":
            # reference Concat(dimension=1) == NCHW channels == NHWC axis -1
            cat = _take(args, [("dim", 1)], "Concat")
            if int(cat["dim"]) != 1:
                raise ValueError(f"Concat row {i}: only channel concat (dim=1) supported, got {args!r}")
            out_ch = sum(in_ch)
            out_stride = in_stride
            kwargs = {}
        elif kind == "detect":
            out_ch = sum(in_ch)  # unused downstream
            detect_strides = tuple(float(stride_list[x]) for x in f_idx)
            detect_index = i
            kwargs = {"nc": nc, "ch": tuple(in_ch), "strides": detect_strides}
        else:  # pragma: no cover
            raise AssertionError(kind)

        if n > 1 and kind not in ("c2f", "c3k2", "c2psa"):
            raise ValueError(f"repeats>1 unsupported for {kind} (row {i})")

        for x in ([f_idx] if isinstance(f_idx, int) else f_idx):
            if x != -1:
                save.add(x % i)
        layers.append((i, f_idx, kind, kwargs))

        if i == 0:
            ch_list, stride_list = [], []
        ch_list.append(out_ch)
        stride_list.append(out_stride)

        if verbose:
            print(f"{i:>3} {str(f_idx):>18} {kind:<10} {kwargs}")

    return {
        "layers": layers,
        "save": sorted(save),
        "nc": nc,
        "ch": int(ch),
        "scale": scale,
        "strides": detect_strides,
        "detect_index": detect_index,
    }


def _freeze(obj):
    """Recursively convert to hashable tuples for linen dataclass fields."""
    if isinstance(obj, dict):
        return tuple((k, _freeze(v)) for k, v in sorted(obj.items()))
    if isinstance(obj, (list, tuple)):
        return tuple(_freeze(v) for v in obj)
    return obj


def _thaw_kwargs(frozen) -> Dict[str, Any]:
    return {k: (list(v) if isinstance(v, tuple) and k not in ("ch", "strides", "k") else v) for k, v in frozen}


class YOLOModel(nn.Module):
    """A YAML-compiled detection model.

    ``__call__`` runs the savelist-routed static graph (the jit-traced
    equivalent of reference ``_forward_once``, ``yolo11_model.py:60-71``) and
    returns the Detect head's raw per-scale NHWC maps. Use
    :func:`yolo_scratch_tpu.nn.detect_decode` (or :meth:`decode`) for the
    inference-path box/cls decode.
    """

    layer_specs: Tuple  # frozen output of parse_model_config
    save_set: Tuple[int, ...]
    nc: int
    in_ch: int
    strides: Tuple[float, ...]
    reg_max: int = 16

    @classmethod
    def from_config(cls, cfg: Dict[str, Any] | str, ch: int = 3, nc: int | None = None,
                    scale: str | None = None, verbose: bool = False) -> "YOLOModel":
        if isinstance(cfg, str):
            with open(cfg) as fh:
                cfg = yaml.safe_load(fh)
        plan = parse_model_config(cfg, ch=ch, nc=nc, scale=scale, verbose=verbose)
        return cls(
            layer_specs=_freeze(plan["layers"]),
            save_set=tuple(plan["save"]),
            nc=plan["nc"],
            in_ch=plan["ch"],
            strides=plan["strides"],
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        y: List[Any] = []
        out = x
        for (i, f, kind, fkwargs) in self.layer_specs:
            kw = dict(fkwargs)
            if isinstance(f, tuple):
                inp = [out if j == -1 else y[j] for j in f]
            elif f != -1:
                inp = y[f]
            else:
                inp = out

            name = f"model_{i}"
            if kind == "conv":
                out = M.ConvBNAct(
                    c2=kw["c2"], k=kw["k"], s=kw["s"], p=kw.get("p"), g=kw.get("g", 1),
                    d=kw.get("d", 1), name=name,
                )(inp, train)
            elif kind == "bottleneck":
                out = M.Bottleneck(
                    c2=kw["c2"], shortcut=kw.get("shortcut", True), g=kw.get("g", 1),
                    k=tuple(kw.get("k", (3, 3))), e=kw.get("e", 0.5), name=name,
                )(inp, train)
            elif kind == "c2f":
                out = M.C2f(
                    c2=kw["c2"], n=kw["n"], shortcut=kw.get("shortcut", False),
                    g=kw.get("g", 1), e=kw.get("e", 0.5), name=name,
                )(inp, train)
            elif kind == "c3k2":
                out = M.C3k2(
                    c2=kw["c2"], n=kw["n"], c3k=kw.get("c3k", False), e=kw.get("e", 0.5),
                    g=kw.get("g", 1), shortcut=kw.get("shortcut", True), name=name,
                )(inp, train)
            elif kind == "sppf":
                out = M.SPPF(c2=kw["c2"], k=kw.get("k", 5), name=name)(inp, train)
            elif kind == "c2psa":
                out = M.C2PSA(c2=kw["c2"], n=kw["n"], e=kw.get("e", 0.5), name=name)(inp, train)
            elif kind == "upsample":
                out = M.upsample2x(inp)
            elif kind == "concat":
                out = jnp.concatenate(inp, axis=-1)
            elif kind == "detect":
                out = M.Detect(
                    nc=kw["nc"], ch=kw["ch"], strides=kw["strides"], reg_max=self.reg_max, name=name
                )(inp, train)
            else:  # pragma: no cover
                raise AssertionError(kind)
            y.append(out if i in self.save_set else None)
        return out

    def decode(self, feats, xywh: bool = True):
        """Raw Detect maps -> (B, A, 4+nc) pixel boxes + sigmoid scores."""
        return M.detect_decode(feats, self.nc, self.strides, self.reg_max, xywh=xywh)


def build_yolo11(cfg, ch: int = 1, nc: int = 5, scale: str | None = None, verbose: bool = False) -> YOLOModel:
    """API-parity constructor (reference ``build_yolo11``, ``yolo11_model.py:258-288``).

    Returns the (uninitialized) flax module; call ``.init(key, dummy, train)``
    for variables. Pretrained loading lives in
    ``yolo_scratch_tpu.train.checkpoints`` (orbax) and
    ``yolo_scratch_tpu.utils.torch_import`` (reference .pt importer).
    """
    return YOLOModel.from_config(cfg, ch=ch, nc=nc, scale=scale, verbose=verbose)


def dims_from_params(params) -> "tuple[int, int]":
    """Read (in_channels, nc) off a builder-model params tree.

    The stem conv kernel is ``model_0/conv/kernel`` (HWIO: in-channels at
    dim 2) and the Detect head's per-scale class projection is
    ``model_N/cv3_0_2/kernel`` (1x1, out-dim = nc) for the highest N.
    Lets CLIs serve a checkpoint without being told --nc/--ch
    (reference builds hardcode ch=1 nc=5, ``train_yolo11_cuda.py:554``).
    """
    ch = int(params["model_0"]["conv"]["kernel"].shape[2])
    detect = max(
        (k for k in params if "cv3_0_2" in params[k]),
        key=lambda k: int(k.split("_")[1]),
    )
    nc = int(params[detect]["cv3_0_2"]["kernel"].shape[-1])
    return ch, nc
