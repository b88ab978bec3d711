"""Command line driver.

The reference exposes ``./dsvt-ai-trt -s`` (build+serialize engine) and
``./dsvt-ai-trt -d`` (deserialize + infer the bundled frames)
(src/dsvt-ai-trt.cpp:1788-1816).  Equivalents here:

  python -m dsvt_ai_trt_tpu.cli build  --weights dsvt.wts --engine dsvt.engine
  python -m dsvt_ai_trt_tpu.cli infer  --weights dsvt.wts --data data/bin --out outputs/
  python -m dsvt_ai_trt_tpu.cli bench  --weights dsvt.wts --data data/bin
  python -m dsvt_ai_trt_tpu.cli convert --checkpoint ckpt.pth --out dsvt.npz
  python -m dsvt_ai_trt_tpu.cli stats  --data data/bin     (capacity headroom)
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

from .config import DSVTConfig, DEFAULT_CONFIG


def _load_cfg(args) -> DSVTConfig:
    import dataclasses
    cfg = DEFAULT_CONFIG
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = DSVTConfig.from_json(f.read())
    overrides = {}
    if getattr(args, "precision", None):
        overrides["precision"] = args.precision
    if getattr(args, "parity_atan", False):
        overrides["parity_atan"] = True
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    cfg.validate()
    return cfg


def _load_params(args, cfg: DSVTConfig):
    from . import weights
    if args.weights and os.path.exists(args.weights):
        raw = weights.load_checkpoint(args.weights)
        return weights.prepare_params(raw, cfg)
    logging.warning("weights %r not found: using random weights (seed 0)",
                    args.weights)
    return weights.random_params(cfg, seed=0)


def cmd_build(args):
    from .runtime.compile import build_engine, enable_persistent_cache
    cfg = _load_cfg(args)
    enable_persistent_cache()
    params = _load_params(args, cfg)
    build_engine(params, cfg, args.engine, with_nms=not args.host_nms)
    print(f"engine written to {args.engine}")


def cmd_infer(args):
    from .runtime.compile import Engine, enable_persistent_cache
    from .runtime.infer import run_frames
    from .io.pointcloud import frame_paths
    cfg = _load_cfg(args)
    enable_persistent_cache()
    params = _load_params(args, cfg)
    paths = frame_paths(args.data)
    if args.frames:
        paths = paths[: args.frames]
    if args.scan_batch:
        from .runtime.infer import run_frames_scan
        run_frames_scan(params, cfg, paths, args.out,
                        batch=args.scan_batch, host_nms=args.host_nms)
        return
    engine = Engine(params, cfg, args.engine,
                    with_nms=not args.host_nms).warmup()
    run_frames(engine, paths, args.out, host_nms=args.host_nms,
               pipeline_depth=args.pipeline_depth)


def cmd_bench(args):
    from .runtime.compile import Engine, enable_persistent_cache
    from .runtime.infer import benchmark
    from .io.pointcloud import frame_paths
    cfg = _load_cfg(args)
    enable_persistent_cache()
    params = _load_params(args, cfg)
    engine = Engine(params, cfg, args.engine, with_nms=not args.host_nms)
    paths = frame_paths(args.data)
    if args.frames:
        paths = paths[: args.frames]
    result = benchmark(engine, paths, iters=args.iters)
    print(json.dumps(result))


def cmd_convert(args):
    from . import weights
    raw = weights.load_checkpoint(args.checkpoint)
    if args.out.endswith(".wts"):
        weights.save_wts(raw, args.out)
    else:
        weights.save_npz(raw, args.out)
    print(f"wrote {len(raw)} tensors to {args.out}")


def cmd_eval(args):
    """Compare two output directories box-by-box (order-insensitive)."""
    from .io.output import load_txt
    from .eval import match_boxes, parity_ok
    import glob
    ref_files = {os.path.basename(p): p
                 for p in glob.glob(os.path.join(args.ref, "*.txt"))}
    agg = {"frames": 0, "matched": 0, "pred": 0, "ref": 0}
    all_ok = True
    for pred_path in sorted(glob.glob(os.path.join(args.pred, "*.txt"))):
        name = os.path.basename(pred_path)
        if name not in ref_files:
            continue
        _, pred = load_txt(pred_path)
        _, ref = load_txt(ref_files[name])
        # txt rows are (x,y,z,l,w,h,rt,id,score) == box layout
        stats = match_boxes(pred, ref, iou_threshold=args.iou)
        stats["frame"] = name
        if args.gate is not None:
            stats["parity_ok"] = parity_ok(pred, ref, args.iou,
                                           args.gate, args.gate)
            all_ok = all_ok and stats["parity_ok"]
        print(json.dumps(stats))
        agg["frames"] += 1
        agg["matched"] += stats["n_match"]
        agg["pred"] += stats["n_pred"]
        agg["ref"] += stats["n_ref"]
    agg["precision"] = agg["matched"] / max(agg["pred"], 1)
    agg["recall"] = agg["matched"] / max(agg["ref"], 1)
    print(json.dumps(agg))
    if args.gate is not None and not all_ok:
        raise SystemExit(1)


def cmd_train(args):
    """Train on synthetic planted-object scenes (the reference has no
    training path at all — its README says retrain upstream; here the loss,
    step, target assigner, and checkpointing are first-class, and the
    trained weights export straight back to .wts via weights.unfold_params)."""
    import jax
    import numpy as np
    from . import weights
    from .data import synthetic_batch
    from .parallel.training import (make_train_step, save_train_state,
                                    load_train_state)
    from .runtime.compile import enable_persistent_cache

    cfg = _load_cfg(args)
    enable_persistent_cache()
    params = _load_params(args, cfg)
    optimizer, train_step = make_train_step(cfg)
    opt_state = optimizer.init(params)
    step0 = 0
    if args.resume:
        resume = args.resume
        if not os.path.exists(resume) and os.path.exists(resume + ".npz"):
            resume = resume + ".npz"
        if not os.path.exists(resume):
            raise SystemExit(f"--resume {args.resume}: checkpoint not found")
        params, opt_state, step0 = load_train_state(resume, params, opt_state)
        logging.info("resumed from %s at step %d", resume, step0)
    train_jit = jax.jit(train_step)

    rng = np.random.default_rng(args.seed)
    first = last = None
    for step in range(step0, step0 + args.steps):
        pts, ns, targets = synthetic_batch(rng, cfg, args.batch)
        params, opt_state, loss = train_jit(params, opt_state, pts, ns, targets)
        loss = float(loss)
        first = loss if first is None else first
        last = loss
        logging.info("step %d loss %.4f", step, loss)
        if args.ckpt and (step + 1) % args.ckpt_every == 0:
            save_train_state(args.ckpt, params, opt_state, step + 1)
    if args.ckpt:
        written = save_train_state(args.ckpt, params, opt_state,
                                   step0 + args.steps)
        print(f"checkpoint -> {written}")
    if args.export_wts:
        weights.save_wts(weights.unfold_params(jax.device_get(params), cfg),
                         args.export_wts)
        print(f"trained weights -> {args.export_wts}")
    print(json.dumps({"steps": args.steps, "loss_first": first, "loss_last": last}))


def cmd_stats(args):
    """Occupancy vs the static caps — padding-headroom validation
    (SURVEY §5 metrics row), plus suggested right-sized caps.

    Every set/pillar op costs time proportional to its CAP (static shapes),
    so oversized caps are pure waste: right-sizing the Waymo-density caps
    to measured occupancy took that path from 81 to 48 ms/frame."""
    import jax
    from .io.pointcloud import frame_paths, load_bin
    from .ops.voxelize import voxelize
    from .ops.windows import window_partition, set_partition
    cfg = _load_cfg(args)
    peak = {"points": 0, "kept_points": 0, "pillars": 0, "sets": 0}
    for path in frame_paths(args.data):
        pts, n = load_bin(path, cfg.max_points)
        vox = voxelize(pts, n, cfg)
        counts = {"points": int(n), "kept_points": int(vox.point_count),
                  "pillars": int(vox.pillar_count)}
        for i, spec in enumerate(cfg.window_specs):
            wp = window_partition(vox.coords, vox.pillar_valid, spec, cfg)
            sp = set_partition(wp, vox.pillar_valid, spec, cfg)
            counts[f"sets_{i}"] = int(sp.set_count)
            peak["sets"] = max(peak["sets"], int(sp.set_count))
        for k in ("points", "kept_points", "pillars"):
            peak[k] = max(peak[k], counts[k])
        caps = {"points": cfg.max_points, "kept_points": cfg.max_kept_points,
                "pillars": cfg.max_pillars,
                **{f"sets_{i}": cfg.max_sets for i in range(len(cfg.window_specs))}}
        usage = {k: f"{counts[k]}/{caps[k]}" for k in counts}
        print(os.path.basename(path), json.dumps(usage))

    def rounded(v, headroom=1.3, mult=256):
        return max(mult, int(-(-v * headroom // mult)) * mult)

    suggestion = {
        "max_points": rounded(peak["points"], 1.1, 1024),
        "max_kept_points": rounded(peak["kept_points"], 1.2, 1024),
        "max_pillars": rounded(peak["pillars"]),
        "max_sets": rounded(peak["sets"]),
    }
    print("suggested_caps (peak x headroom, static-shape cost scales with "
          "caps):", json.dumps(suggestion))


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    ap = argparse.ArgumentParser(prog="dsvt-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p, data=False):
        p.add_argument("--weights", default="dsvt.wts")
        p.add_argument("--config", default=None, help="DSVTConfig json")
        p.add_argument("--precision", choices=["fp32", "mixed", "bf16"], default=None)
        p.add_argument("--parity-atan", action="store_true")
        p.add_argument("--engine", default=None)
        p.add_argument("--host-nms", action="store_true",
                       help="run NMS on the host (reference deployment shape)")
        if data:
            p.add_argument("--data", default="/root/reference/data/bin")
            p.add_argument("--frames", type=int, default=0)

    p = sub.add_parser("build", help="AOT-compile + serialize the engine (-s)")
    common(p)
    p.set_defaults(fn=cmd_build)

    p = sub.add_parser("infer", help="run frames, write result txts (-d)")
    common(p, data=True)
    p.add_argument("--out", default="outputs")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="frames in flight before each readback (0 = fully "
                        "synchronous; 2 hides the host round trip)")
    p.add_argument("--scan-batch", type=int, default=0,
                   help="throughput mode: N frames per lax.scan dispatch "
                        "(bench.py's headline path; 0 = per-frame stream)")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("bench", help="steady-state ms/frame")
    common(p, data=True)
    p.add_argument("--iters", type=int, default=5)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("convert", help="torch/.wts checkpoint -> .npz/.wts")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser("stats", help="per-frame occupancy vs static caps")
    common(p, data=True)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("train", help="train on synthetic planted scenes")
    common(p)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", default="train_state.npz")
    p.add_argument("--ckpt-every", type=int, default=10)
    p.add_argument("--resume", default=None)
    p.add_argument("--export-wts", default=None)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="order-insensitive box comparison of two output dirs")
    p.add_argument("--pred", required=True)
    p.add_argument("--ref", required=True)
    p.add_argument("--iou", type=float, default=0.5)
    p.add_argument("--gate", type=float, default=None, metavar="MIN",
                   help="exit 1 unless every frame reaches this "
                        "recall AND precision (CI parity gate)")
    p.set_defaults(fn=cmd_eval)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
