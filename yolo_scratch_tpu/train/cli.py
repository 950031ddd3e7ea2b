"""Training CLI — flag-parity with the reference trainer.

Reference argparse surface (``train_yolo11_cuda.py:455-471``): --data --cfg
--scale --epochs --batch --imgsz --device --workers --lr --weight-decay
--val-split --save-dir --resume --max-val-batches --val-conf. All accepted
here (``--device``/``--workers`` are informational: JAX picks devices; the
loader threads replace worker processes), plus TPU-native extras
(--mesh, --ema, --max-gt, --dataset, --bf16).

Run: ``python -m yolo_scratch_tpu.train.cli --data synthetic --epochs 2``.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def resolve_train_precision(arg):
    """CLI ``--train-precision`` -> ``TrainerConfig.train_matmul_precision``.

    Flag absent (None) -> the TrainerConfig default ('high', the parity
    mode of the round-5 frontier, H2H640_frontier.json). Explicit
    'default' -> None = the platform's fast bf16-pass f32 matmuls (known
    −0.032 mAP50-95 at 640 — an A/B setting, not a recommendation).
    """
    from yolo_scratch_tpu.train.trainer import TrainerConfig

    if arg is None:
        return TrainerConfig.train_matmul_precision
    return None if arg == "default" else arg


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train YOLO (TPU-native)")
    p.add_argument("--data", type=str, default="synthetic",
                   help="crater data dir, COCO dir, or 'synthetic'")
    p.add_argument("--dataset", type=str, default="auto",
                   choices=["auto", "crater", "coco", "synthetic"])
    p.add_argument("--cfg", type=str,
                   default=str(Path(__file__).parent.parent / "configs/yolo11_crater.yaml"))
    p.add_argument("--model", type=str, default="yolo11", choices=["yolo11", "yolox"],
                   help="model family: YAML-built YOLO11 (v8/TAL loss) or YOLOX (SimOTA)")
    p.add_argument("--scale", type=str, default="s",
                   choices=["n", "s", "m", "l", "x", "nano", "tiny"])
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--device", type=str, default="tpu", help="informational; JAX selects devices")
    p.add_argument("--workers", type=int, default=4,
                   help="loader prefetch depth AND per-batch decode threads "
                        "(reference num_workers analog; decode releases the GIL)")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight-decay", type=float, default=5e-4)
    p.add_argument("--val-split", type=float, default=0.2)
    p.add_argument("--save-dir", type=str, default="runs/train")
    p.add_argument("--pretrained", type=str, default=None,
                   help="warm-start weights: orbax checkpoint dir or "
                        "reference .pt (partial load, strict=False — "
                        "mismatched nc/ch heads keep their init)")
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--no-resume", dest="resume", action="store_false")
    p.add_argument("--max-val-batches", type=int, default=None)
    p.add_argument("--val-conf", type=float, default=0.25)
    # TPU-native extras
    p.add_argument("--max-gt", type=int, default=100, help="static per-image GT capacity")
    p.add_argument("--ema", action="store_true", help="track EMA weights")
    p.add_argument("--mesh", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--multiscale", action="store_true",
                   help="multi-scale training over bucketed sizes {0.75, 0.875, 1, 1.125}*imgsz")
    p.add_argument("--bf16", action="store_true",
                   help="mixed-precision training (bf16 compute, f32 master weights)")
    p.add_argument("--train-precision", type=str, default=None,
                   choices=["default", "high", "highest"],
                   help="matmul precision for the train step (unset = "
                        "'high', the measured-parity default: +0.001 "
                        "mAP50-95 vs the f32 reference at 640/60ep, "
                        "645 img/s @ B=128 — H2H640_frontier.json). "
                        "'default' = the platform's fast bf16-pass f32 "
                        "matmuls (780 img/s, known -0.032); 'highest' = "
                        "full f32 passes (483 img/s, +0.003). For "
                        "throughput prefer --bf16 (1,222 img/s, -0.010)")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing (activation recompute)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="accumulate gradients over k microbatches per step "
                        "(--batch must be divisible by k); one microbatch's "
                        "activation memory at k-fold effective batch")
    p.add_argument("--bn-mode", type=str, default="sync", choices=["sync", "local"],
                   help="BatchNorm under --mesh: global-batch sync-BN or DDP per-replica")
    p.add_argument("--augment", action="store_true",
                   help="device-side augmentation (hflip + color jitter)")
    p.add_argument("--mosaic", type=float, default=0.0,
                   help="mosaic probability (implies --augment)")
    p.add_argument("--mixup", type=float, default=0.0,
                   help="mixup probability, applied after mosaic "
                        "(YOLOX recipe; implies --augment)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host pod training: jax.distributed.initialize "
                        "(auto TPU topology, or --coordinator/--nproc/--pid), "
                        "global dp mesh over every process's chips, per-process "
                        "data sharding")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port (omit on TPU pods)")
    p.add_argument("--nproc", type=int, default=None)
    p.add_argument("--pid", type=int, default=None)
    p.add_argument("--final-epochs", type=int, default=0,
                   help="last-N-epochs no-aug phase (YOLOX recipe: mosaic off"
                        " + L1 loss on; paper uses 15)")
    p.add_argument("--patience", type=int, default=0,
                   help="early stop after N epochs of val fitness (mAP50, "
                        "-val-loss fallback) below its running best; exact "
                        "plateaus refresh the clock; 0 = off")
    p.add_argument("--seed", type=int, default=42)
    return p


def make_datasets(args):
    from yolo_scratch_tpu.data.coco import CocoDataset
    from yolo_scratch_tpu.data.crater import CraterDataset
    from yolo_scratch_tpu.data.synthetic import SyntheticDataset

    kind = args.dataset
    if kind == "auto":
        if args.data == "synthetic":
            kind = "synthetic"
        elif list(Path(args.data).glob("altitude*")):
            kind = "crater"
        else:
            kind = "coco"

    if kind == "synthetic":
        ds = SyntheticDataset(n=64, img_size=args.imgsz, channels=1, num_classes=5)
        return ds, 1, 5
    if kind == "crater":
        ds = CraterDataset(args.data, img_size=args.imgsz)
        return ds, 1, 5
    root = Path(args.data)
    anns = sorted(root.glob("annotations/instances*.json")) or sorted(root.glob("*.json"))
    if not anns:
        raise FileNotFoundError(f"no COCO annotations under {root}")
    img_dir = root / "images" if (root / "images").is_dir() else root
    sub = [d for d in img_dir.iterdir() if d.is_dir()]
    ds = CocoDataset(str(anns[0]), str(sub[0] if sub else img_dir), img_size=args.imgsz)
    return ds, 3, len(ds.class_names) or 80


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.grad_accum < 1 or args.batch % args.grad_accum:
        raise SystemExit(
            f"--batch {args.batch} must be a positive multiple of "
            f"--grad-accum {args.grad_accum}")

    from yolo_scratch_tpu.data.loader import Loader
    from yolo_scratch_tpu.models.builder import build_yolo11
    from yolo_scratch_tpu.train.trainer import Trainer, TrainerConfig

    if args.multihost:
        import jax as _jax

        from yolo_scratch_tpu.parallel import distributed as D

        D.initialize(args.coordinator, args.nproc, args.pid)
        D.barrier()  # establish the collective context before heavy compiles
        print(f"multihost: process {_jax.process_index()}/{_jax.process_count()}, "
              f"{len(_jax.devices())} global devices")

    ds, ch, nc = make_datasets(args)
    n = len(ds)
    # seeded split (reference :494-505 uses torch.randperm(seed=42); same
    # semantics with a numpy PRNG)
    idx = np.random.RandomState(args.seed).permutation(n)
    n_val = int(n * args.val_split)
    train_idx, val_idx = idx[: n - n_val], idx[n - n_val :]
    if args.multihost:
        import jax as _jax

        # per-process slice, trimmed so every process steps the same number
        # of batches (the jitted step is a collective)
        pid, np_ = _jax.process_index(), _jax.process_count()
        k_t, k_v = len(train_idx) // np_, len(val_idx) // np_
        if k_t == 0:
            raise ValueError(f"{len(train_idx)} train samples < {np_} processes")
        train_idx = train_idx[pid::np_][:k_t]
        val_idx = val_idx[pid::np_][:k_v]
    print(f"Train samples: {len(train_idx)}, Val samples: {len(val_idx)}")

    ms_sizes = None
    if args.multiscale:
        # bucketed static shapes; each bucket divisible by 32 (P5 stride)
        ms_sizes = sorted({max(32, int(args.imgsz * f) // 32 * 32) for f in (0.75, 0.875, 1.0, 1.125)})
        print(f"multi-scale buckets: {ms_sizes}")
    train_loader = Loader(ds, args.batch, max_gt=args.max_gt, shuffle=True,
                          seed=args.seed, indices=train_idx, prefetch=args.workers,
                          workers=args.workers,
                          multiscale_sizes=ms_sizes)
    val_loader = (
        Loader(ds, args.batch, max_gt=args.max_gt, indices=val_idx, prefetch=args.workers,
               workers=args.workers)
        if len(val_idx)
        else None
    )

    import jax

    if args.model == "yolox":
        from yolo_scratch_tpu.models.yolox import YOLOXModel

        yx_scale = {"n": "nano", "x": "x"}.get(args.scale, args.scale)
        model = YOLOXModel.from_scale(yx_scale, nc=nc)
        print(f"Building YOLOX-{yx_scale} nc={nc} ch={ch} strides={model.strides}")
    else:
        model = build_yolo11(args.cfg, ch=ch, nc=nc, scale=args.scale)
        print(f"Building {Path(args.cfg).name} scale={args.scale} nc={nc} ch={ch} "
              f"strides={model.strides}")

    mesh = None
    if args.multihost:
        from yolo_scratch_tpu.parallel.distributed import make_global_mesh

        mesh = make_global_mesh()
    elif args.mesh and args.mesh > 1:
        from yolo_scratch_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)

    aug_cfg = None
    if args.augment or args.mosaic > 0 or args.mixup > 0:
        from yolo_scratch_tpu.data.augment import AugmentConfig

        aug_cfg = AugmentConfig(mosaic_p=args.mosaic, mixup_p=args.mixup)

    cfg = TrainerConfig(
        epochs=args.epochs,
        lr=args.lr,
        weight_decay=args.weight_decay,
        val_conf=args.val_conf,
        max_val_batches=args.max_val_batches,
        save_dir=args.save_dir,
        use_ema=args.ema,
        eval_with_ema=args.ema,
        augment=aug_cfg,
        mixed_precision=args.bf16,
        remat=args.remat,
        grad_accum=args.grad_accum,
        train_matmul_precision=resolve_train_precision(args.train_precision),
        bn_mode=args.bn_mode,
        pretrained=args.pretrained,
        final_epochs=args.final_epochs,
        patience=args.patience,
    )
    trainer = Trainer(model, train_loader, val_loader, cfg, mesh=mesh, seed=args.seed,
                      model_kind=args.model)

    total = sum(int(np.asarray(x).size) for x in jax.tree_util.tree_leaves(trainer.state.params))
    print(f"Total parameters: {total:,} ({total / 1e6:.2f}M)")

    return trainer.fit(resume=args.resume)


def cli(argv=None):
    """Console-script entry: run main() and discard its return value.

    setuptools entry points pass main()'s return to sys.exit(); main()
    returns a result object for programmatic use, which would make every
    successful run exit with status 1. This wrapper keeps exit status 0.
    """
    main(argv)


if __name__ == "__main__":
    cli()
